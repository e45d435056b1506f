"""Deployment-form test: ``spark-submit --py-files`` end-to-end.

The north rule's deployment is ``spark-submit --py-files`` on a
multi-executor cluster.  This test builds the real artifact
(tools/make_pyfiles.py), copies the thin driver (tools/submit_job.py)
to a temp dir, and runs an actual ``spark-submit --master local[4]``
FROM that temp dir with the repo stripped from PYTHONPATH — so every
``photo_dedup_spark`` import, driver-side and executor-side (the
pandas-UDF signature stage runs in worker Python processes), must
resolve from the zip.  A passing run is evidence the artifact is
complete, not just that the tree is.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
import pyspark

REPO = Path(__file__).resolve().parent.parent
SPARK_SUBMIT = Path(pyspark.__file__).parent / "bin" / "spark-submit"


def _write_input(path: Path, n_bases: int = 30) -> int:
    """Tiny deterministic corpus with planted exact + near dups, written
    with pyarrow (no Spark needed to stage the input)."""
    sys.path.insert(0, str(REPO))
    try:
        from photo_dedup_spark.corpus import corpus_to_tuples, generate_corpus
    finally:
        sys.path.pop(0)
    files, _ = corpus_to_tuples(generate_corpus(n_bases=n_bases, seed=7))
    cols = list(zip(*files))
    table = pa.table(
        {
            "repo": list(cols[0]),
            "path": list(cols[1]),
            "commit": list(cols[2]),
            "lang": list(cols[3]),
            "content": list(cols[4]),
        }
    )
    pq.write_table(table, path)
    # the pipeline count-and-drops null-content rows (planted edge row)
    return sum(1 for c in cols[4] if c is not None)


class TestMakePyfiles:
    def test_zip_is_deterministic_and_complete(self, tmp_path):
        sys.path.insert(0, str(REPO / "tools"))
        try:
            from make_pyfiles import build_zip
        finally:
            sys.path.pop(0)
        z1 = build_zip(REPO, tmp_path / "a.zip")
        z2 = build_zip(REPO, tmp_path / "b.zip")
        assert z1.read_bytes() == z2.read_bytes(), "artifact not reproducible"
        names = set(zipfile.ZipFile(z1).namelist())
        on_disk = {
            str(p.relative_to(REPO))
            for p in (REPO / "photo_dedup_spark").rglob("*.py")
            if "__pycache__" not in p.parts
        }
        assert names == on_disk, names ^ on_disk


class TestSparkSubmit:
    def test_py_files_end_to_end(self, tmp_path):
        sys.path.insert(0, str(REPO / "tools"))
        try:
            from make_pyfiles import build_zip
        finally:
            sys.path.pop(0)
        zip_path = build_zip(REPO, tmp_path / "photo_dedup_spark.zip")
        driver = tmp_path / "submit_job.py"
        shutil.copyfile(REPO / "tools" / "submit_job.py", driver)
        inp = tmp_path / "input.parquet"
        n_files = _write_input(inp)
        out = tmp_path / "out"
        out.mkdir()

        env = dict(os.environ)
        env.pop("PYTHONPATH", None)  # the zip must be the only source
        env["PYSPARK_PYTHON"] = sys.executable
        env["PYSPARK_DRIVER_PYTHON"] = sys.executable
        proc = subprocess.run(
            [
                str(SPARK_SUBMIT),
                "--master",
                "local[4]",
                "--conf",
                "spark.ui.enabled=false",
                "--py-files",
                str(zip_path),
                str(driver),
                "--input",
                str(inp),
                "--output",
                str(out),
            ],
            cwd=tmp_path,  # repo not on sys.path via cwd either
            env=env,
            capture_output=True,
            text=True,
            timeout=600,
        )
        assert proc.returncode == 0, proc.stderr[-4000:]

        table = pq.read_table(out / "assignments")
        assert table.num_rows == n_files
        cols = set(table.column_names)
        assert {"doc_id", "cluster_id", "is_keep", "rn"} <= cols
        df = table.to_pandas()
        sizes = df.groupby("cluster_id").size()
        assert (sizes >= 2).any(), "planted dup groups not clustered"
        # exactly one keep per cluster — the keep-window contract
        keeps = df.groupby("cluster_id")["is_keep"].sum()
        assert (keeps == 1).all()

        metrics = json.loads((out / "metrics.json").read_text())
        assert metrics["wall_s"] > 0
