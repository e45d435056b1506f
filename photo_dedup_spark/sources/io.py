"""Table sources/sinks (reference scan layer, SURVEY.md §2.1).

The reference walks a filesystem (os.walk, scanner.py:77-131); our
input is a table.  Iceberg is the contract's catalog format
(input_hint); ``read_files`` picks the source kind by shape (table
identifier vs parquet path) and FAILS FAST with a typed error when the
chosen kind can't be read — misconfiguration is never silently
reinterpreted as a different format (scanner.py:48-74 contract).

Path-hygiene filters (S1/S2/P2: skip-dirs, dot-files, depth) become
predicates that push down to the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SKIP_DIRS = (".git", "__pycache__", "_duplicates_backup")  # utils.py:7-8


class SourceError(ValueError):
    """Typed fail-fast for unreadable/missing sources — the analog of
    ``validate_scan_args`` raising DirectoryNotFoundError /
    PermissionError (reference scanner.py:48-74).  Never silently
    reinterpret one source kind as another."""


def read_files(spark: SparkSession, source: str) -> DataFrame:
    """Load the (repo, path, commit, lang, content) table.

    *source* may be an Iceberg table identifier (no '/' and no
    .parquet suffix) or a parquet path.  The source KIND is decided by
    shape first; a failure to load is raised as :class:`SourceError`,
    never swallowed into a different-format retry (S3 fail-fast
    contract, scanner.py:48-74)."""
    is_table_ident = "/" not in source and not source.endswith(".parquet")
    try:
        if is_table_ident:
            return spark.read.format("iceberg").load(source)
        return spark.read.parquet(source)
    except Exception as e:
        kind = "iceberg table" if is_table_ident else "parquet path"
        raise SourceError(f"cannot read {kind} {source!r}: {e}") from e


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
