#!/usr/bin/env python
"""Benchmark harness.

Default: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

--scaling: run the flagship pipeline twice in fresh JVMs at local[8]
and local[32] on the same input and write BENCH/SCALING.md with
throughput at both plus efficiency = (T8/T32)/4 — the sandbox
substitution for the north rule's N vs 4N executor criterion
(BASELINE.md "Sandbox substitution").
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def run_bench(sf_dir: str, cpus: int) -> dict:
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    from photo_dedup_spark.session import build_session
    import __spark_entry__ as entry_mod

    spark = build_session(app_name=f"bench-{cpus}")
    spark.sparkContext.setLogLevel("WARN")

    headline = [
        "near_dup_clusters",   # flagship end-to-end pipeline
        "exact_dup_groups",
        "keep_selection",
        "dup_summary",
        "token_stats",
        "quality_counts",
        "fingerprints",
        "pricing_summary",
        "top_customers",
        "embedding_topk",
    ]
    qmap = entry_mod.queries()
    timings: dict[str, float] = {}
    n_files = (
        spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    )
    t_all = time.monotonic()
    for name in headline:
        t0 = time.monotonic()
        df = qmap[name](spark, sf_dir)
        n = df.count()  # materialize fully
        timings[name] = round(time.monotonic() - t0, 3)
        print(f"  {name}: {timings[name]}s ({n} rows)", file=sys.stderr)
    total = round(time.monotonic() - t_all, 3)

    pipeline_s = timings["near_dup_clusters"]
    result = {
        "metric": "headline query wall time (flagship near-dup pipeline + operator queries)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_of(sf_dir),
        "cpus": cpus,
        "docs": n_files,
        "pipeline_files_per_sec": round(n_files / pipeline_s, 1) if pipeline_s else None,
    }
    spark.stop()
    return result


def run_scaling(sf_dir: str) -> None:
    """Fresh-JVM runs at local[8] vs local[32]; report efficiency."""
    results = {}
    for cpus in (8, 32):
        out = subprocess.run(
            [sys.executable, __file__, "--single-pipeline"],
            env={**os.environ, "SPARK_GRAFT_CPUS": str(cpus), "SPARK_GRAFT_SF_DIR": sf_dir},
            capture_output=True,
            text=True,
            check=True,
        )
        results[cpus] = json.loads(out.stdout.strip().splitlines()[-1])
        print(f"local[{cpus}]: {results[cpus]}", file=sys.stderr)
    w8, w32 = results[8]["wall_s"], results[32]["wall_s"]
    eff = (w8 / w32) / 4
    docs = results[32]["docs"]
    lines = [
        "# BENCH — scaling (local[8] vs local[32], same input)",
        "",
        f"Input: `{sf_dir}/documents.parquet` ({docs} docs), flagship near-dup pipeline",
        "(exact keys → MinHash/SimHash → LSH → verify → CC → keep-window).",
        "Fresh JVM per run; shuffle partitions scale with cores; all other config identical.",
        "",
        "| parallelism | wall (s) | throughput (files/s) |",
        "|---|---|---|",
        f"| local[8]  | {w8:.2f} | {docs / w8:.1f} |",
        f"| local[32] | {w32:.2f} | {docs / w32:.1f} |",
        "",
        f"**Scaling efficiency (T8/T32)/4 = {eff:.3f}** (target ≥ 0.8 per BASELINE.md).",
    ]
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/SCALING.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({"scaling_efficiency": round(eff, 3), "wall_8": w8, "wall_32": w32}))


def run_single_pipeline(sf_dir: str, cpus: int) -> None:
    """One flagship-pipeline run (used by --scaling subprocesses)."""
    from photo_dedup_spark.session import build_session
    import __spark_entry__ as entry_mod

    spark = build_session(app_name=f"scale-{cpus}")
    spark.sparkContext.setLogLevel("WARN")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    t0 = time.monotonic()
    n = entry_mod.queries()["near_dup_clusters"](spark, sf_dir).count()
    wall = round(time.monotonic() - t0, 3)
    spark.stop()
    print(json.dumps({"wall_s": wall, "rows": n, "docs": docs, "cpus": cpus}))


if __name__ == "__main__":
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if "--scaling" in sys.argv:
        run_scaling(sf_dir)
    elif "--single-pipeline" in sys.argv:
        run_single_pipeline(sf_dir, cpus)
    else:
        print(json.dumps(run_bench(sf_dir, cpus)))
