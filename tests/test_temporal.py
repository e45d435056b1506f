"""Unit tests for operators/temporal.py (sessionize, asof_join).

The reference has no temporal semantics; these operators extend the
window tier (SURVEY.md §2 W1-W4) to event-stream shapes.  Oracle
parity at sf0.001/sf0.01 is covered by test_oracle_parity.py via the
session_stats / asof_clicks driver queries; here we pin the edge
semantics those corpora don't exercise: exact-gap boundaries, ties,
unmatched left rows, and an empty right side.
"""

import datetime as dt

import pytest

from photo_dedup_spark.operators.temporal import asof_join, sessionize


def _ts(s: int, us: int = 0):
    return dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(seconds=s, microseconds=us)


@pytest.fixture(scope="module")
def ev(spark):
    rows = [
        # user 1: gaps 10s, exactly 30s (NOT > gap), 31s (new session)
        (1, 1, _ts(0)),
        (2, 1, _ts(10)),
        (3, 1, _ts(40)),
        (4, 1, _ts(71)),
        # user 2: single event
        (5, 2, _ts(5)),
    ]
    return spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")


class TestSessionize:
    def test_gap_boundary_is_strict(self, ev):
        got = {
            r.event_id: r.session_idx
            for r in sessionize(ev, "user_id", "ts", 30, ("event_id",)).collect()
        }
        # 0->10s gap=10 same session; 10->40 gap=30 NOT > 30 → same;
        # 40->71 gap=31 > 30 → new session
        assert got == {1: 0, 2: 0, 3: 0, 4: 1, 5: 0}

    def test_identical_timestamps_use_tiebreaker(self, spark):
        df = spark.createDataFrame(
            [(1, 1, _ts(0)), (2, 1, _ts(0)), (3, 1, _ts(100))],
            "event_id long, user_id long, ts timestamp",
        )
        got = {
            r.event_id: r.session_idx
            for r in sessionize(df, "user_id", "ts", 30, ("event_id",)).collect()
        }
        assert got == {1: 0, 2: 0, 3: 1}

    def test_original_columns_preserved(self, ev):
        out = sessionize(ev, "user_id", "ts", 30, ("event_id",))
        assert set(out.columns) == {"event_id", "user_id", "ts", "session_idx"}


class TestAsofJoin:
    def _run(self, spark, left_rows, right_rows):
        left = spark.createDataFrame(
            left_rows, "event_id long, user_id long, ts timestamp"
        )
        right = spark.createDataFrame(
            right_rows, "c_event_id long, user_id long, ts timestamp"
        )
        out = asof_join(
            left, right, on="user_id", left_ts="ts", right_ts="ts",
            right_vals={"c_event_id": "click_id"},
            left_tie="event_id", right_tie="c_event_id",
        )
        return {r.event_id: (r.click_id, r.asof_gap_us) for r in out.collect()}

    def test_latest_preceding_row_wins(self, spark):
        got = self._run(
            spark,
            [(100, 1, _ts(50))],
            [(10, 1, _ts(10)), (11, 1, _ts(49)), (12, 1, _ts(51))],
        )
        assert got == {100: (11, 1_000_000)}

    def test_equal_timestamp_right_row_is_visible(self, spark):
        got = self._run(spark, [(100, 1, _ts(50))], [(10, 1, _ts(50))])
        assert got == {100: (10, 0)}

    def test_unmatched_left_rows_get_nulls(self, spark):
        got = self._run(
            spark,
            [(100, 1, _ts(5)), (101, 2, _ts(5))],
            [(10, 1, _ts(10))],
        )
        assert got == {100: (None, None), 101: (None, None)}

    def test_empty_right_side(self, spark):
        got = self._run(spark, [(100, 1, _ts(5))], [])
        assert got == {100: (None, None)}

    def test_left_columns_pass_through(self, spark):
        left = spark.createDataFrame(
            [(100, 1, _ts(50), "hello")],
            "event_id long, user_id long, ts timestamp, note string",
        )
        right = spark.createDataFrame(
            [(10, 1, _ts(10))], "c_event_id long, user_id long, ts timestamp"
        )
        out = asof_join(
            left, right, on="user_id", left_ts="ts", right_ts="ts",
            right_vals={"c_event_id": "click_id"},
        ).collect()
        assert out[0].note == "hello" and out[0].click_id == 10
