"""spark-submit driver for the dedup+cluster pipeline.

The north rule's deployment form: ``spark-submit --py-files
dist/photo_dedup_spark.zip tools/submit_job.py ...`` on a
multi-executor cluster.  This script is intentionally THIN — all
engine logic lives in the zip; this file only parses arguments, reads
the input table, runs the pipeline, and writes results.  Master,
executor count/size, and driver memory belong to the submit command
line (``--master yarn --num-executors N``), never to this script.

Input: a parquet (or Iceberg, via --format iceberg) table with the
input_hint schema ``(repo, path, commit, lang, content)``.
Output: ``<output>/assignments/`` parquet ``(doc_id, repo, path, lang,
n_chars, cluster_id, rn, is_keep)`` plus ``<output>/metrics.json``.

Local smoke (what tests/test_submit.py runs):
    python tools/make_pyfiles.py
    spark-submit --master 'local[4]' \
        --py-files dist/photo_dedup_spark.zip tools/submit_job.py \
        --input /tmp/in.parquet --output /tmp/out
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def parse_args(argv: list[str]) -> argparse.Namespace:
    ap = argparse.ArgumentParser(description="distributed dedup+cluster job")
    ap.add_argument("--input", required=True, help="input table path")
    ap.add_argument(
        "--format",
        default="parquet",
        choices=["parquet", "iceberg"],
        help="input source format (iceberg requires a configured catalog)",
    )
    ap.add_argument("--output", required=True, help="output directory")
    ap.add_argument(
        "--mode",
        default="hybrid",
        choices=["exact", "similar", "hybrid"],
        help="match mode (reference scanner.py:852-867 image_match triple)",
    )
    ap.add_argument("--strict-verify", action="store_true")
    ap.add_argument(
        "--cores-hint",
        type=int,
        default=None,
        help="total executor cores for shuffle sizing "
        "(default: sparkContext.defaultParallelism)",
    )
    return ap.parse_args(argv)


def main(argv: list[str]) -> int:
    args = parse_args(argv)
    # Imports resolve from the --py-files zip on executors AND on the
    # driver (spark-submit prepends py-files to the driver's sys.path).
    from photo_dedup_spark.config import DEFAULT_CONFIG
    from photo_dedup_spark.pipeline import run_pipeline
    from photo_dedup_spark.session import build_submit_session
    from photo_dedup_spark.sources.io import hygiene_filter, read_files

    spark = build_submit_session(
        app_name="photo-dedup-spark-submit", cores_hint=args.cores_hint
    )
    t0 = time.monotonic()
    # read_files decides parquet vs iceberg by source shape and fails
    # fast with a typed error; --format iceberg forces the table leg.
    source = args.input
    if args.format == "iceberg" and "/" in source:
        raise SystemExit(f"--format iceberg needs a table identifier: {source!r}")
    files = hygiene_filter(read_files(spark, source))
    result = run_pipeline(
        spark,
        files,
        DEFAULT_CONFIG,
        mode=args.mode,
        strict_verify=args.strict_verify,
    )
    result.assignments.write.mode("overwrite").parquet(
        f"{args.output}/assignments"
    )
    metrics = dict(result.metrics)
    metrics["wall_s"] = round(time.monotonic() - t0, 3)
    # metrics.json is written with the driver's LOCAL filesystem, so it
    # only lands next to the assignments when --output is a local path.
    # For hdfs:// / s3a:// outputs the metrics go to stdout instead of
    # crashing after the assignments write succeeded.
    local_out = args.output.removeprefix("file:")
    if "://" in local_out:
        print(json.dumps(metrics, sort_keys=True, default=str))
    else:
        metrics_path = local_out.rstrip("/") + "/metrics.json"
        with open(metrics_path, "w") as fh:
            json.dump(metrics, fh, indent=2, sort_keys=True, default=str)
    print(json.dumps({"wall_s": metrics["wall_s"], "output": args.output}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
