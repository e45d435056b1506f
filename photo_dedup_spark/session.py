"""SparkSession builder with the engine's execution defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from photo_dedup_spark.config import DEFAULT_CONFIG, DedupConfig


def build_session(
    app_name: str = "photo-dedup-spark",
    master: str | None = None,
    config: DedupConfig = DEFAULT_CONFIG,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Create a SparkSession tuned for the dedup pipeline.

    - AQE on (runtime re-plan + skew-join mitigation on top of our
      explicit salting),
    - Arrow on, batch size capped so `content` batches stay bounded,
    - shuffle partitions scaled with core count.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    # 4 task waves per core, not 1: with shuffle partitions == cores a
    # stage is gated by its single slowest task (GC pause, content
    # skew), which hits the wide leg hardest — local[8] gets 4
    # self-balancing waves from the same count while local[32] got one.
    # Measured at 468k files/local[32]: signature stage 103s -> 87.5s.
    # parallelismFirst=false + a 16 MiB advisory keeps AQE from
    # coalescing the big-stage partitions back down to one wave while
    # still collapsing genuinely tiny shuffles.
    shuffle = max(config.shuffle_partitions, 4 * cpus)
    # Scan-side wave balancing, same rule as the shuffle side: the
    # default split planning packs small inputs into ~totalSize/128MiB
    # partitions, which left the keys scan (parquet → normalize+sha)
    # running as a SINGLE 8-task wave at local[8] and 8 tasks on 32
    # cores at local[32] — the stage is gated by its slowest task and
    # the wide leg idles.  minPartitionNum is a *minimum* split count:
    # small inputs split into ≥ 4 waves per core while the 128 MiB
    # maxPartitionBytes cap still bounds per-task memory on real
    # multi-TB inputs (where totalSize/128MiB ≫ this floor anyway).
    min_scan_parts = 4 * cpus
    # glibc maps-then-unmaps every allocation at/above 128 KiB; numpy
    # kernel temps in the signature stage sit right at that threshold,
    # so each of the 32 python workers paid mmap+page-zeroing kernel
    # time per chunk — serializing in the kernel across workers (the
    # system-time bursts in BENCH/SCALING.md's forensics).  Raise the
    # threshold so worker allocators keep and reuse those arenas; the
    # daemon-forked workers inherit this environment in local mode.
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(64 * 1024 * 1024))
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(64 * 1024 * 1024))
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.files.minPartitionNum", str(min_scan_parts))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(config.arrow_max_records),
        )
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # local mode: driver == executor JVM, so this is the entire
        # memory budget (checkpoints + shuffle + broadcast build)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        # long-lived JVMs recompile codegen'd stages across many jobs;
        # the 240 MB default code cache forces flush/recompile churn on
        # a multi-run driver (measured run-to-run wall oscillation in
        # BENCH/SCALING.md's plateau series) — reserve well past peak
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get(
                "SPARK_GRAFT_DRIVER_JAVA_OPTS", "-XX:ReservedCodeCacheSize=1g"
            ),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
