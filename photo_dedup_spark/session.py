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
    shuffle = max(config.shuffle_partitions, cpus)
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
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
