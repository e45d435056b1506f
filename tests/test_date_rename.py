"""Phase-C analog: date-rename + mtime plan (reference TestPhaseC,
/root/reference/tests/test_core.py:1001-1386)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from photo_dedup_spark.operators.plan import date_rename_plan

SCHEMA = "cluster_id long, path string, is_keep boolean, commit_ts timestamp"


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def members(spark):
    rows = [
        # cluster 1: meaningless keep name + older delete member
        (1, "pics/12345.jpg", True, _ts("2021-05-03 10:00:00")),
        (1, "pics/999.jpg", False, _ts("2021-05-01 09:00:00")),
        # cluster 2: meaningful keep name → no date rename
        (2, "pics/2020-01-02_trip.jpg", True, _ts("2022-01-01 00:00:00")),
        (2, "pics/777.jpg", False, _ts("2022-01-01 00:00:00")),
        # cluster 3: another meaningless keep in same dir, same earliest
        # date as cluster 1 → conflict suffix
        (3, "pics/54321.jpg", True, _ts("2021-05-01 18:00:00")),
    ]
    return spark.createDataFrame(rows, SCHEMA)


class TestDateRename:
    def test_kept_only_scope_and_earliest_date(self, members):
        # kept-only (the default, cleaner.py:56-57) touches ONLY
        # keep-files of real dup groups: the singleton cluster 3 is not
        # in scope, and moved-away deletes never are
        plan = date_rename_plan(members).collect()
        renames = {r.src: r.dst for r in plan if r.action == "date_rename"}
        # keep of cluster 1 renamed to the GROUP-earliest date (May 1,
        # from the delete member), not its own ts (May 3)
        assert renames == {"pics/12345.jpg": "pics/20210501.jpg"}

    def test_meaningful_names_untouched(self, members):
        plan = date_rename_plan(members).collect()
        srcs = {r.src for r in plan if r.action == "date_rename"}
        assert "pics/2020-01-02_trip.jpg" not in srcs

    def test_mtime_drift_rows(self, members):
        plan = date_rename_plan(members).collect()
        mt = {r.src: r.dst for r in plan if r.action == "set_mtime"}
        # cluster 1 keep drifts 2 days from group earliest → set_mtime,
        # addressed at its POST-date-rename path (cleaner.py:1048-1063
        # touches the new name; the old path no longer exists when the
        # phase-5 row replays)
        assert "pics/20210501.jpg" in mt
        assert "pics/12345.jpg" not in mt
        assert mt["pics/20210501.jpg"].startswith("2021-05-01")
        # cluster 2 keep matches earliest exactly → no row
        assert "pics/2020-01-02_trip.jpg" not in mt

    def test_all_files_scope(self, members):
        # all-files widens scope to every SURVIVING file — singletons
        # (the reference walk's "unrelated files") join in, but
        # moved-away delete-members never do (Phase C walks the target
        # tree excluding the backup dir, cleaner.py:967-981)
        plan = date_rename_plan(members, scope="all-files").collect()
        renames = {r.src: r.dst for r in plan if r.action == "date_rename"}
        assert set(renames) == {"pics/12345.jpg", "pics/54321.jpg"}
        assert "pics/999.jpg" not in renames
        # same dir + same date stem → deterministic conflict suffix (W3)
        assert sorted(renames.values()) == [
            "pics/20210501.jpg",
            "pics/20210501_1.jpg",
        ]

    def test_invalid_scope_rejected(self, members):
        # cleaner.py:579-586 / test_core.py:1304
        with pytest.raises(ValueError, match="invalid scope"):
            date_rename_plan(members, scope="everything")
