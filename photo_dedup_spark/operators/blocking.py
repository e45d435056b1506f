"""Cheap-to-expensive staged blocking (the reference's prefilters).

P1 size-blocking: "different size ⇒ not duplicate" — the reference only
hashes files whose byte size collides (/root/reference/photo_dedup/
scanner.py:134-161, esp. 142-144).  J2 partial-key blocking: only
(size, partial-hash) collisions get a full hash (scanner.py:482-521),
proven by call-count tests (tests/test_core.py:1590-1620).

J7 strict-verify re-split: within an exact group, members are
byte-compared against representatives and split on mismatch
(scanner.py:645-695).  Because we carry full content, the sha256 raw
key is a perfect byte-equality proxy: the re-split is a within-cluster
groupBy — O(n), no pairwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def size_block(df: DataFrame, size_col: str = "n_chars") -> DataFrame:
    """Keep only rows whose size collides with another row (P1).

    Implemented as hot-key semi-join: the aggregated hot-size side is
    tiny (distinct sizes with count>1) and broadcasts.
    """
    hot = (
        df.groupBy(size_col)
        .agg(F.count("*").alias("n"))
        .where(F.col("n") > 1)
        .select(size_col)
    )
    return df.join(F.broadcast(hot), size_col, "left_semi")


def key_block(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Generic composite-key blocking (J2): keep rows whose key tuple
    collides (e.g. (n_chars, partial_key) before the full key)."""
    hot = (
        df.groupBy(*key_cols)
        .agg(F.count("*").alias("n"))
        .where(F.col("n") > 1)
        .drop("n")
    )
    return df.join(F.broadcast(hot), key_cols, "left_semi")


def strict_resplit(
    clustered: DataFrame,
    cluster_col: str = "cluster_id",
    exact_col: str = "exact_key",
) -> DataFrame:
    """J7: composite cluster key (cluster_id, raw sha256) — splits any
    cluster whose members are not byte-identical into exact subgroups,
    mirroring the reference's ``h``, ``h::verify2`` suffix keys
    (scanner.py:686-691).  Used only in strict/exact-only mode; the
    near-dup pipeline intentionally keeps non-identical members in one
    cluster."""
    return clustered.withColumn(
        "strict_cluster_id",
        F.concat_ws("::", F.col(cluster_col).cast("string"), F.col(exact_col)),
    )
