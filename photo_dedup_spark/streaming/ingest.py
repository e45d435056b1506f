"""Structured-Streaming ingest tier: incremental exact dedup and
session-window rollups.

The reference is a one-shot batch tool (`scan.py` walks a directory,
hashes, reports — reference scanner.py:236's whole lifecycle is a
single process).  A web-scale corpus is not one-shot: new repo
snapshots arrive continuously, and re-running the full batch pipeline
per arrival is O(corpus) per increment.  This module is the
incremental leg: the same exact-dup key semantics as the batch
pipeline (sha2-256 over content — functions/keys.py), expressed as a
streaming plan so Spark's state store carries seen-keys forward and
each micro-batch costs O(increment).

Scale notes (the parts that matter at 10^12 files):

* ``dedup_stream`` uses ``dropDuplicatesWithinWatermark`` when a
  watermark column is given — state is bounded by the watermark delay
  instead of growing with the corpus.  UNBOUNDED dedup state (no
  watermark) is refused rather than silently accepted: at web scale
  an unbounded seen-keys map is a guaranteed OOM; the caller must
  either provide an event-time column or run the batch pipeline.
* For exact-once-across-history semantics (dedup against EVERYTHING
  ever seen, not a time window), the scalable design is a compacted
  key ledger: ``foreachBatch`` + a left-anti join of the micro-batch
  against a bucketed keys table, appending novel keys — the join is
  co-located when the ledger is bucketed by key.  ``ledger_batch``
  implements the per-batch step (pure DataFrame ops, testable in
  batch); wiring it into ``foreachBatch`` is one line at the caller.
* ``session_stream`` uses the built-in ``session_window`` with a
  watermark so closed sessions emit exactly once and state is
  evicted.  Boundary caveat vs operators/temporal.sessionize: the
  batch operator starts a new session when the gap STRICTLY exceeds
  the threshold (gap > g), while Spark's session window spans
  [first_ts, last_ts + g) — an event at exactly last_ts + g starts a
  new session (gap >= g).  Identical for all non-boundary gaps;
  callers needing the exact batch rule at the boundary should use
  the batch operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_content_key(df: DataFrame, content_col: str = "content") -> DataFrame:
    """The streaming twin of the batch exact-key stage: sha2-256 over
    raw content (reference hasher.py:54-66's full-hash semantics, same
    expression as functions/keys.py so batch and stream agree
    bit-for-bit)."""
    return df.withColumn("content_sha", F.sha2(F.col(content_col), 256))


def dedup_stream(
    stream: DataFrame,
    key_cols: tuple[str, ...] = ("content_sha",),
    watermark_col: str | None = None,
    delay: str = "10 minutes",
) -> DataFrame:
    """Incremental exact dedup: keep the first row per key within the
    watermark horizon.

    Requires ``watermark_col`` on a streaming input — unbounded
    seen-keys state is a scale bug, not a default (module docstring).
    On a BATCH input (tests, backfills) it degrades to plain
    ``dropDuplicates`` — same semantics, no state store.
    """
    if not stream.isStreaming:
        return stream.dropDuplicates(list(key_cols))
    if watermark_col is None:
        raise ValueError(
            "streaming dedup without a watermark is unbounded state; "
            "pass watermark_col (or use the batch pipeline + ledger_batch)"
        )
    wm = stream.withWatermark(watermark_col, delay)
    return wm.dropDuplicatesWithinWatermark(list(key_cols))


def ledger_batch(
    batch: DataFrame, ledger: DataFrame, key_cols: tuple[str, ...] = ("content_sha",)
) -> DataFrame:
    """One micro-batch step of dedup-against-all-history: rows of
    ``batch`` whose key is NOT in ``ledger`` (first occurrence within
    the batch wins, ordered by the remaining columns' natural min —
    deterministic, not arrival-order).

    Both sides shuffle only on the key; with the ledger bucketed by
    the same key the exchange on its side disappears.  The caller
    appends the returned rows' keys to the ledger (foreachBatch).
    """
    keys = list(key_cols)
    first_per_key = batch.groupBy(*keys).agg(
        F.min(F.struct(*[c for c in batch.columns if c not in keys])).alias("_row")
    )
    flat = first_per_key.select(
        *keys, *[F.col(f"_row.{c}").alias(c) for c in batch.columns if c not in keys]
    )
    return flat.join(ledger.select(*keys).distinct(), keys, "left_anti")


def session_stream(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    gap: str = "30 minutes",
    delay: str = "10 minutes",
) -> DataFrame:
    """Streaming gap-sessionization: one output row per closed session
    with its span and event count.  Built-in ``session_window`` —
    state merges as events arrive, closes when the watermark passes
    the gap, emits exactly once.  Works identically on batch inputs
    (no watermark needed there, Spark ignores it)."""
    src = events.withWatermark(ts_col, delay) if events.isStreaming else events
    return (
        src.groupBy(F.col(key_col), F.session_window(F.col(ts_col), gap))
        .agg(F.count("*").alias("n_events"))
        .select(
            key_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )
