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


_PATH_FORMATS = {
    ".parquet": "parquet",
    ".orc": "orc",
    ".jsonl": "json",  # newline-delimited JSON, one doc per line
    ".json": "json",
}


def _source_kind(source: str) -> str:
    """Decide the source KIND from shape alone (never from a failed
    read): a path-looking string dispatches on its extension, anything
    else is an Iceberg table identifier."""
    for suffix, fmt in _PATH_FORMATS.items():
        if source.endswith(suffix):
            return fmt
    if "/" in source:
        return "parquet"  # extensionless directory: the parquet default
    return "iceberg"


def read_files(spark: SparkSession, source: str) -> DataFrame:
    """Load the (repo, path, commit, lang, content) table.

    *source* may be an Iceberg table identifier (no '/', no known file
    extension) or a path in any of the engine's file formats
    (parquet / ORC / JSONL — ``_PATH_FORMATS``).  The source KIND is
    decided by SHAPE first; a failure to load is raised as
    :class:`SourceError`, never swallowed into a different-format
    retry (S3 fail-fast contract, scanner.py:48-74).  JSON reads are
    FAILFAST with the contract schema so a malformed line is a typed
    error, not a silently-corrupt row (mirrors load_json_report's
    strictness, cleaner.py:176-189)."""
    kind = _source_kind(source)
    try:
        if kind == "iceberg":
            return spark.read.format("iceberg").load(source)
        if kind == "json":
            return spark.read.schema(
                "repo string, path string, commit string, lang string, "
                "content string"
            ).option("mode", "FAILFAST").json(source)
        return spark.read.format(kind).load(source)
    except Exception as e:
        label = "iceberg table" if kind == "iceberg" else f"{kind} path"
        raise SourceError(f"cannot read {label} {source!r}: {e}") from e


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
