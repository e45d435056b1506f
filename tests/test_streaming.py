"""Tests for the Structured-Streaming ingest tier (streaming/ingest.py).

Batch-mode tests pin the semantics (dedup fallback, ledger step,
session rollup); the streaming tests drive real micro-batches through
the parquet file source with availableNow triggers — deterministic
and self-terminating — and check watermark-driven behavior: bounded
dedup state and append-mode session emission after the watermark
passes.
"""

import datetime as dt
import os
import time

import pytest

from photo_dedup_spark.streaming.ingest import (
    dedup_stream,
    ledger_batch,
    session_stream,
    with_content_key,
)


def _ts(s: int):
    return dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(seconds=s)


SCHEMA = "repo string, path string, content string, ts timestamp"


class TestBatchSemantics:
    def test_content_key_matches_batch_pipeline(self, spark):
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [("r", "a", "hello", _ts(0)), ("r", "b", "hello", _ts(1))], SCHEMA
        )
        out = with_content_key(df)
        shas = [r.content_sha for r in out.collect()]
        ref = df.select(F.sha2("content", 256).alias("s")).collect()[0].s
        assert shas == [ref, ref] and len(ref) == 64

    def test_dedup_batch_fallback(self, spark):
        df = with_content_key(
            spark.createDataFrame(
                [("r", "a", "x", _ts(0)), ("r", "b", "x", _ts(1)), ("r", "c", "y", _ts(2))],
                SCHEMA,
            )
        )
        assert dedup_stream(df).count() == 2

    def test_streaming_dedup_requires_watermark(self, spark, tmp_path):
        src = str(tmp_path / "src")
        spark.createDataFrame([("r", "a", "x", _ts(0))], SCHEMA).write.parquet(src)
        stream = with_content_key(
            spark.readStream.schema(SCHEMA).parquet(src)
        )
        with pytest.raises(ValueError, match="unbounded state"):
            dedup_stream(stream)

    def test_ledger_batch_novel_keys_only(self, spark):
        batch = with_content_key(
            spark.createDataFrame(
                [
                    ("r", "b", "x", _ts(5)),   # dup of "a" within batch
                    ("r", "a", "x", _ts(0)),   # min-struct winner for key x
                    ("r", "c", "seen", _ts(1)),  # already in ledger
                    ("r", "d", "new", _ts(2)),
                ],
                SCHEMA,
            )
        )
        from pyspark.sql import functions as F

        ledger = spark.createDataFrame(
            [("seen",)], "content string"
        ).select(F.sha2("content", 256).alias("content_sha"))
        out = ledger_batch(batch, ledger)
        got = {(r.path, r.content) for r in out.collect()}
        assert got == {("a", "x"), ("d", "new")}

    def test_session_stream_on_batch(self, spark):
        ev = spark.createDataFrame(
            [
                ("u1", "e1", _ts(0)),
                ("u1", "e2", _ts(100)),
                ("u1", "e3", _ts(2000)),  # > 30 min? no — 30 min gap below is 1800s
                ("u2", "e4", _ts(50)),
            ],
            "user string, eid string, ts timestamp",
        )
        out = session_stream(ev, "user", "ts", gap="30 minutes").collect()
        by_user = {}
        for r in out:
            by_user.setdefault(r.user, []).append(r.n_events)
        # u1: e1+e2 within 100s, e3 at +2000s > 1800s gap → two sessions
        assert sorted(by_user["u1"]) == [1, 2]
        assert by_user["u2"] == [1]


class TestStreamingEndToEnd:
    def _write_file(self, spark, path, rows, schema=SCHEMA, mtime=None):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(path)
        if mtime is not None:
            for f in os.listdir(path):
                full = os.path.join(path, f)
                os.utime(full, (mtime, mtime))

    def test_streaming_dedup_within_watermark(self, spark, tmp_path):
        src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
        self._write_file(
            spark,
            src,
            [
                ("r", "a", "x", _ts(0)),
                ("r", "b", "x", _ts(30)),   # dup key within horizon → dropped
                ("r", "c", "y", _ts(60)),
            ],
        )
        stream = with_content_key(spark.readStream.schema(SCHEMA).parquet(src))
        out = dedup_stream(stream, watermark_col="ts", delay="10 minutes")
        q = (
            out.writeStream.format("memory")
            .queryName("dedup_sink")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.sql("select * from dedup_sink").collect()
        assert sorted(r.path for r in rows) == ["a", "c"]

    def test_session_emission_after_watermark_passes(self, spark, tmp_path):
        src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
        now = time.time()
        # file 1: two early sessions for u1 (gap 40 min between them)
        self._write_file(
            spark,
            src,
            [("u1", "e1", _ts(0)), ("u1", "e2", _ts(60)), ("u1", "e3", _ts(3000))],
            schema="user string, eid string, ts timestamp",
            mtime=now - 100,
        )
        # file 2: a far-future event advances the watermark past both
        self._write_file(
            spark,
            src,
            [("u2", "e9", _ts(100_000))],
            schema="user string, eid string, ts timestamp",
            mtime=now,
        )
        stream = spark.readStream.schema(
            "user string, eid string, ts timestamp"
        ).option("maxFilesPerTrigger", 1).parquet(src)
        out = session_stream(stream, "user", "ts", gap="30 minutes", delay="1 minute")
        q = (
            out.writeStream.format("memory")
            .queryName("sess_sink")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        rows = spark.sql("select * from sess_sink").collect()
        got = {(r.user, r.n_events) for r in rows}
        # u1's two closed sessions emitted once the watermark passed;
        # u2's session is still open (no later event) → not emitted
        assert got == {("u1", 2), ("u1", 1)}

    def test_restart_recovers_state_and_emits_exactly_once(self, spark, tmp_path):
        """Kill-and-resume from a real checkpointLocation (r4 VERDICT
        next-round #5 — the streaming analog of the batch resume guard,
        reference cleaner.py:694-705 / plans/checkpoint.py):

          run 1 processes two files and stops (availableNow);
          new files arrive; run 2 restarts from the SAME checkpoint.

        Asserts across the restart: (a) exactly-once — run 2 re-emits
        NONE of run 1's closed sessions; (b) state recovery — a session
        left OPEN by run 1 absorbs a run-2 event and emits ONCE with
        events from BOTH runs; (c) source-offset recovery — run 1's
        files are not re-read (no duplicate sessions anywhere)."""
        sch = "user string, eid string, ts timestamp"
        src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
        sink_dir = str(tmp_path / "out")
        now = time.time()
        gap, delay = "30 minutes", "1 minute"  # 1800 s / 60 s

        def run() -> list:
            # fault-tolerant FILE sink — the memory sink refuses
            # checkpoint recovery, and recovery is the point here
            stream = (
                spark.readStream.schema(sch)
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            out = session_stream(stream, "user", "ts", gap=gap, delay=delay)
            q = (
                out.writeStream.format("parquet")
                .option("path", sink_dir)
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)
            return [
                (r.user, int(r.session_start.timestamp()) % 100_000, r.n_events)
                for r in spark.read.parquet(sink_dir).collect()
            ]

        base = int(_ts(0).timestamp())
        # run 1, file A: u1 session α (t=0,60) + u1 session β opener (t=9000)
        self._write_file(
            spark,
            src,
            [("u1", "e1", _ts(0)), ("u1", "e2", _ts(60)), ("u1", "e3", _ts(9000))],
            schema=sch,
            mtime=now - 100,
        )
        # run 1, file B: u9 advances the watermark to 9940 — closes α
        # (ends 1860), leaves β (ends 10800) and u9's own session open
        self._write_file(
            spark, src, [("u9", "e4", _ts(10_000))], schema=sch, mtime=now - 50
        )
        rows1 = run()
        assert sorted(rows1) == [("u1", base % 100_000, 2)]  # α only; β, u9 open

        # ---- the stream is now STOPPED; new files arrive ----
        # file C: u1 extends β (gap 900 < 1800 ⇒ same session, if state
        # survived the restart); file D closes everything
        self._write_file(
            spark, src, [("u1", "e5", _ts(9900))], schema=sch, mtime=now
        )
        self._write_file(
            spark, src, [("u8", "e6", _ts(100_000))], schema=sch, mtime=now + 50
        )
        rows2 = run()
        # β spans BOTH runs (9000 from run 1 + 9900 from run 2 ⇒ n=2):
        # state recovered; α appears exactly ONCE in the total output
        # (not re-emitted on restart, run 1's files not re-read); u9
        # emits once; u8's session is still open → absent
        assert sorted(rows2) == sorted(
            [
                ("u1", base % 100_000, 2),  # α, from run 1 only
                ("u1", (base + 9000) % 100_000, 2),  # β, stitched across runs
                ("u9", (base + 10_000) % 100_000, 1),
            ]
        )
