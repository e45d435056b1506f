"""Table sources/sinks (reference scan layer, SURVEY.md §2.1).

The reference walks a filesystem (os.walk, scanner.py:77-131); our
input is a table.  Iceberg is the contract's catalog format
(input_hint); the sandbox has no Iceberg runtime, so ``read_files``
tries the Iceberg source and falls back to parquet — the DataFrame
contract downstream is identical either way.

Path-hygiene filters (S1/S2/P2: skip-dirs, dot-files, depth) become
predicates that push down to the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SKIP_DIRS = (".git", "__pycache__", "_duplicates_backup")  # utils.py:7-8


def read_files(spark: SparkSession, source: str) -> DataFrame:
    """Load the (repo, path, commit, lang, content) table.

    *source* may be an Iceberg table identifier or a parquet path.
    """
    try:
        if not source.endswith(".parquet") and "/" not in source:
            return spark.read.format("iceberg").load(source)
    except Exception:
        pass
    return spark.read.parquet(source)


def hygiene_filter(df: DataFrame, recursive: bool = True) -> DataFrame:
    """S1/S2/P2: prune skip-dir subtrees and dot-prefixed components
    (scanner.py:107-113,123); recursive=False keeps only depth-0 paths
    (scanner.py:122-129).  Pure predicates — Catalyst pushes them into
    the scan."""
    p = F.col("path")
    cond = ~p.startswith(".")
    cond &= ~p.rlike(r"(^|/)\.")  # dot-file or dot-dir component
    for d in SKIP_DIRS:
        cond &= ~p.rlike(rf"(^|/){d}(/|$)".replace(".", r"\."))
    if not recursive:
        cond &= ~p.contains("/")
    return df.where(cond)
