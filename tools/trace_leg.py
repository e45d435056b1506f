"""One warm + one traced flagship run at a given parallelism.

Diagnostic companion to bench.py --scaling-paired: prints the per-stage
wall marks (SPARK_GRAFT_STAGE_TIMING) for a single leg so 2-vs-8
non-scaling residue can be attributed stage by stage.  Run under
taskset to pin the whole tree (JVM + python workers) to the leg's
cores, e.g.:

    taskset -c 0-1 env SPARK_GRAFT_CPUS=2 python tools/trace_leg.py \
        /tmp/spark_graft_bench/bench_corpus_120000_18

Output: one JSON line {"cpus", "warm_wall_s", "traced_wall_s",
"stages": {...}, "rows"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    corpus = sys.argv[1]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    warmups = int(os.environ.get("SPARK_GRAFT_LEG_WARMUPS", "1"))
    from photo_dedup_spark.session import build_session
    from photo_dedup_spark.pipeline import run_pipeline
    import __spark_entry__ as entry_mod
    from bench import _drop_cached_blocks

    spark = build_session(app_name=f"trace-leg-{cpus}")
    spark.sparkContext.setLogLevel("WARN")

    def one_run() -> tuple[float, int]:
        t0 = time.monotonic()
        res = run_pipeline(
            spark,
            spark.read.parquet(corpus),
            entry_mod.ENTRY_CONFIG,
            mode="hybrid",
            collect_metrics=False,
        )
        n = res.assignments.count()
        return round(time.monotonic() - t0, 3), n

    walls = []
    for _ in range(1 + warmups):  # cold + warm discards
        w, _n = one_run()
        walls.append(w)
        _drop_cached_blocks(spark)

    # traced run: eager checkpoints at each mark so stage walls are real
    os.environ["SPARK_GRAFT_STAGE_TIMING"] = "1"
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stderr(buf):
        tw, n = one_run()
    stages = {}
    for line in buf.getvalue().splitlines():
        if line.startswith("[stage-timing]"):
            k, _, v = line[len("[stage-timing]") :].partition(":")
            stages[k.strip()] = float(v.strip().rstrip("s"))
    print(
        json.dumps(
            {
                "cpus": cpus,
                "warmup_walls_s": walls,
                "traced_wall_s": tw,
                "stages": stages,
                "rows": n,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
