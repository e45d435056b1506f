"""clean/undo entry-point flows (reference TestEndToEnd analogs,
/root/reference/tests/test_core.py:341-995): dry-run zero side
effects, report validation ordering, log guards, undo state machine."""

import os

import pytest
from pyspark.sql import functions as F

from photo_dedup_spark.clean import CleanResult, clean, undo
from photo_dedup_spark.operators.groups import (
    build_report_groups,
    keep_selection,
    summary_aggregates,
)
from photo_dedup_spark.sources.eventlog import EventLogError
from photo_dedup_spark.sources.report import InvalidReportError, write_report

MEMBER_SCHEMA = "doc_id long, cluster_id long, path string, n_chars long"


@pytest.fixture()
def report_dir(spark, cfg, tmp_path):
    rows = [
        (1, 1, "d/111.py", 100),
        (2, 1, "x/2021-05-01_trip.py", 90),
        (3, 2, "d/photo (2).txt", 50),
        (4, 2, "d/2020-02-02_event.txt", 40),
    ]
    sel = keep_selection(spark.createDataFrame(rows, MEMBER_SCHEMA))
    groups = build_report_groups(sel)
    summary = summary_aggregates(sel, total_files=4)
    out = str(tmp_path / "report")
    write_report(groups, summary, out, cfg, source="tableA")
    return out


class TestClean:
    def test_dry_run_zero_side_effects(self, spark, report_dir, tmp_path):
        log_dir = str(tmp_path / "log")
        res = clean(spark, report_dir, log_dir, source="tableA", dry_run=True)
        assert isinstance(res, CleanResult)
        assert res.log_meta is None
        assert not os.path.exists(log_dir)  # nothing written at all
        assert res.summary["actions"].get("move", 0) == 2
        assert res.summary["actions"].get("rename", 0) == 2

    def test_clean_writes_complete_log(self, spark, report_dir, tmp_path):
        log_dir = str(tmp_path / "log")
        res = clean(spark, report_dir, log_dir, source="tableA")
        assert res.log_meta["status"] == "complete"
        plan_rows = res.plan.orderBy("seq").collect()
        # moves strictly precede renames
        actions = [r.action for r in plan_rows]
        assert actions == sorted(actions, key=lambda a: {"move": 0, "rename": 2}[a])

    def test_source_mismatch_rejected_unless_forced(
        self, spark, report_dir, tmp_path
    ):
        with pytest.raises(InvalidReportError):
            clean(spark, report_dir, str(tmp_path / "l1"), source="tableB")
        res = clean(
            spark, report_dir, str(tmp_path / "l2"), source="tableB", force=True
        )
        assert res.log_meta["status"] == "complete"

    def test_refuses_in_progress_log(self, spark, report_dir, tmp_path):
        from photo_dedup_spark.sources.eventlog import write_events

        log_dir = str(tmp_path / "log")
        bad = spark.createDataFrame(
            [(1, "move", "a.py", "b.py", 1)],
            "seq long, action string, src string, dst string, cluster_id long",
        )
        write_events(bad, log_dir, status="in_progress")
        with pytest.raises(EventLogError, match="in_progress"):
            clean(spark, report_dir, log_dir, source="tableA")

    def test_date_scope_requires_timestamps(self, spark, report_dir, tmp_path):
        with pytest.raises(ValueError, match="timestamps"):
            clean(
                spark,
                report_dir,
                str(tmp_path / "log"),
                date_scope="kept-only",
            )

    def test_phase_c_rows_from_timestamps(self, spark, report_dir, tmp_path):
        ts = spark.createDataFrame(
            [
                ("d/111.py", "2021-01-05 10:00:00"),
                ("x/2021-05-01_trip.py", "2021-01-01 10:00:00"),
                ("d/photo (2).txt", "2020-02-02 09:00:00"),
                ("d/2020-02-02_event.txt", "2020-02-02 09:00:00"),
            ],
            "path string, commit_ts string",
        ).withColumn("commit_ts", F.col("commit_ts").cast("timestamp"))
        res = clean(
            spark,
            report_dir,
            str(tmp_path / "log"),
            source="tableA",
            date_scope="kept-only",
            timestamps=ts,
        )
        # keep of cluster 1 is d/111.py (meaningless stem) → date-renamed
        # to the group-earliest date; its ts drifts > 1 s → set_mtime too
        by_action = {}
        for r in res.plan.collect():
            by_action.setdefault(r.action, []).append(r)
        date_renames = {r.src: r.dst for r in by_action.get("date_rename", [])}
        assert date_renames.get("d/111.py") == "d/20210101.py"
        assert any(r.src == "d/111.py" for r in by_action.get("set_mtime", []))


class TestUndoFlow:
    def test_undo_reverses_and_marks_undone(self, spark, report_dir, tmp_path):
        log_dir = str(tmp_path / "log")
        res = clean(spark, report_dir, log_dir, source="tableA")
        inv = undo(spark, log_dir).orderBy("seq").collect()
        fwd = {r.seq: (r.src, r.dst) for r in res.plan.collect()}
        n = len(fwd)
        for r in inv:
            assert (r.dst, r.src) == fwd[n + 1 - r.seq]
        # second undo refuses: state machine is terminal
        with pytest.raises(EventLogError, match="undone"):
            undo(spark, log_dir)
