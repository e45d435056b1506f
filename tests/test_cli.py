"""CLI entry points — argv surface parity with reference scan.py /
clean.py (flags, defaults, exit codes; reference scan.py:36-126,
clean.py:36-133, arg-validation cases mirroring test_core.py
TestEndToEnd).

Behavior tests run main() in-process (build_session getOrCreate reuses
the test session); one subprocess test per module pins the
``python -m photo_dedup_spark.{scan,clean}`` wiring itself.
"""

import json
import os
import subprocess
import sys

import pytest

from photo_dedup_spark.clean import main as clean_main
from photo_dedup_spark.scan import main as scan_main


@pytest.fixture(scope="module")
def files_parquet(spark, files_df, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("cli") / "files.parquet")
    files_df.write.mode("overwrite").parquet(p)
    return p


class TestScanCli:
    def test_scan_writes_report(self, spark, files_parquet, tmp_path, capsys):
        out = str(tmp_path / "report")
        # exact mode: fast, and the corpus plants real exact duplicates
        scan_main(["--dir", files_parquet, "--output", out, "--no-pixel"])
        assert "scan complete" in capsys.readouterr().out
        with open(os.path.join(out, "duplicates_data.json")) as f:
            doc = json.load(f)
        assert doc["source"] == files_parquet
        assert doc["summary"]["duplicate_groups"] > 0
        assert os.path.exists(os.path.join(out, "duplicates_report.txt"))

    def test_invalid_threshold_exits_1(self, files_parquet, capsys):
        # config validation (InvalidParameterError analog): exit 1,
        # ERROR on stderr — mirrors reference test_core.py bad-arg cases
        with pytest.raises(SystemExit) as e:
            scan_main(["--dir", files_parquet, "--jaccard-threshold", "1.5"])
        assert e.value.code == 1
        assert "ERROR" in capsys.readouterr().err

    def test_missing_source_exits_1(self, tmp_path, capsys):
        with pytest.raises(SystemExit) as e:
            scan_main(["--dir", str(tmp_path / "nope.parquet")])
        assert e.value.code == 1

    def test_bad_mode_rejected_by_argparse(self, files_parquet):
        with pytest.raises(SystemExit) as e:
            scan_main(["--dir", files_parquet, "--image-match", "fuzzy"])
        assert e.value.code == 2

    def test_module_invocation_help(self):
        out = subprocess.run(
            [sys.executable, "-m", "photo_dedup_spark.scan", "--help"],
            capture_output=True,
            text=True,
        )
        assert out.returncode == 0
        for flag in ("--no-pixel", "--strict-verify", "--image-match", "--output"):
            assert flag in out.stdout


class TestCleanCli:
    @pytest.fixture(scope="class")
    def report_dir(self, spark, files_parquet, tmp_path_factory):
        out = str(tmp_path_factory.mktemp("cli-clean") / "report")
        scan_main(["--dir", files_parquet, "--output", out, "--no-pixel"])
        return out

    def test_source_mismatch_exits_1_force_passes(self, report_dir, capsys):
        with pytest.raises(SystemExit) as e:
            clean_main(["--dir", "someone/else.parquet", "--report", report_dir, "--dry-run"])
        assert e.value.code == 1
        assert "ERROR" in capsys.readouterr().err
        clean_main(
            ["--dir", "someone/else.parquet", "--report", report_dir, "--dry-run", "--force"]
        )
        assert "dry-run" in capsys.readouterr().out

    def test_dry_run_writes_nothing(self, files_parquet, report_dir, capsys):
        clean_main(["--dir", files_parquet, "--report", report_dir, "--dry-run"])
        assert "dry-run" in capsys.readouterr().out
        assert not os.path.exists(os.path.join(report_dir, "_duplicates_backup"))

    def test_clean_then_undo_lifecycle(self, files_parquet, report_dir, capsys):
        from photo_dedup_spark.sources import eventlog

        clean_main(["--dir", files_parquet, "--report", report_dir, "--yes"])
        assert "logged" in capsys.readouterr().out
        log_dir = os.path.join(report_dir, "_duplicates_backup")
        assert eventlog._read_meta(log_dir)["status"] == "complete"

        clean_main(["--dir", files_parquet, "--report", report_dir, "--undo"])
        assert "undone" in capsys.readouterr().out
        assert eventlog._read_meta(log_dir)["status"] == "undone"

        # double undo refused (exit 1) — cleaner.py undo guards
        with pytest.raises(SystemExit) as e:
            clean_main(["--dir", files_parquet, "--report", report_dir, "--undo"])
        assert e.value.code == 1

    def test_no_rename_skips_phase_b(self, files_parquet, report_dir, capsys):
        clean_main(
            ["--dir", files_parquet, "--report", report_dir, "--dry-run", "--no-rename"]
        )
        out = capsys.readouterr().out
        assert "'move'" in out
        assert "'rename'" not in out and "'rename_stage'" not in out

    def test_module_invocation_help(self):
        out = subprocess.run(
            [sys.executable, "-m", "photo_dedup_spark.clean", "--help"],
            capture_output=True,
            text=True,
        )
        assert out.returncode == 0
        for flag in ("--undo", "--force", "--dry-run", "--date-rename-scope", "--backup"):
            assert flag in out.stdout
