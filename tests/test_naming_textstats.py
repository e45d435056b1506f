"""Naming truth table + text-stats operators (reference TestNaming /
TestIsMeaningless, /root/reference/tests/test_core.py:165-264)."""

import pytest
from pyspark.sql import functions as F

from photo_dedup_spark.functions.naming import (
    is_meaningless,
    readability_score,
    valid_ymd_prefix,
)
from photo_dedup_spark.functions import textstats as ts


def _score_names(spark, names):
    df = spark.createDataFrame([(n,) for n in names], "name string")
    rows = df.select(
        "name",
        is_meaningless(F.col("name")).alias("m"),
        readability_score(F.col("name")).alias("s"),
        valid_ymd_prefix(F.col("name")).alias("d"),
    ).collect()
    return {r.name: r for r in rows}


class TestIsMeaningless:
    """Truth table per naming.py:31-79, incl. the CJK / non-ASCII-ratio
    leg (naming.py:69-77) — mirrors reference test_core.py:165-264."""

    TABLE = {
        "12345.jpg": True,             # pure short number
        "1609753382985.jpeg": True,    # unix timestamp
        "2021-03-05_trip.jpg": False,  # date prefix
        "IMG_4321.jpg": False,         # camera prefix
        "img_4321.jpg": False,         # camera prefix is case-insensitive
        "family_dinner.jpg": False,    # descriptive alpha
        "photo (3).jpg": False,        # copy marker stripped, alpha remains
        "___.jpg": False,              # no alpha/CJK but ASCII ⇒ NOT meaningless
        "123_456.txt": False,          # digits+underscore, ASCII ⇒ NOT meaningless
        "报告.txt": False,             # CJK is descriptive
        "ファイル.txt": False,         # kana counts for the CJK leg
        "①②③.txt": True,              # >50% non-ASCII, no alpha/CJK
        "١٢٣.jpg": True,               # unicode digits are a pure number (\\d)
        "a•••.txt": False,             # alpha present
    }

    def test_table(self, spark):
        got = _score_names(spark, list(self.TABLE))
        for name, expect in self.TABLE.items():
            assert got[name].m is expect, f"{name}: {got[name].m} != {expect}"


class TestReadabilityScore:
    """Ordering invariants (test_core.py:165-220 analogs)."""

    def test_date_beats_timestamp(self, spark):
        got = _score_names(spark, ["2021-03-05_trip.jpg", "1609753382985.jpg"])
        assert got["2021-03-05_trip.jpg"].s > got["1609753382985.jpg"].s

    def test_copy_suffix_penalized(self, spark):
        got = _score_names(spark, ["dinner.jpg", "dinner (2).jpg"])
        assert got["dinner.jpg"].s > got["dinner (2).jpg"].s

    def test_descriptive_beats_short_number(self, spark):
        got = _score_names(spark, ["beach_day.jpg", "42.jpg"])
        assert got["beach_day.jpg"].s > got["42.jpg"].s

    def test_camera_bonus_stacks_with_descriptive(self, spark):
        # reference naming.py:125-131: IMG_x gets +3 (camera) AND +2
        # (descriptive alpha) — the legs stack
        got = _score_names(spark, ["IMG_x.jpg", "zz.jpg"])
        # +300 +200 −5·len vs +200 −2·len (×100 scale)
        assert got["IMG_x.jpg"].s == 300 + 200 - 5
        assert got["zz.jpg"].s == 200 - 2

    def test_datetime_bonus_requires_valid_date(self, spark):
        got = _score_names(
            spark,
            ["20210305_123456.jpg", "20211305_123456.jpg", "20210305_256161.jpg"],
        )
        # valid date+time: +1000 +500 −15·len
        assert got["20210305_123456.jpg"].s == 1000 + 500 - 15
        # month 13: no date, no datetime bonus
        assert got["20211305_123456.jpg"].s < 0
        # valid date, hour 25 invalid: +1000 only
        assert got["20210305_256161.jpg"].s == 1000 - 15

    def test_date_prefix_extraction_validates_ranges(self, spark):
        got = _score_names(
            spark, ["2021-13-05_x.jpg", "2021-12-31_x.jpg", "1899-01-01_x.jpg"]
        )
        assert got["2021-13-05_x.jpg"].d == ""     # month 13 invalid
        assert got["2021-12-31_x.jpg"].d == "2021-12-31"
        assert got["1899-01-01_x.jpg"].d == ""     # year < 1900


class TestTextStats:
    def test_token_counts(self, spark):
        df = spark.createDataFrame(
            [("a b  c",), ("",), ("   ",), ("one one one",)], "text string"
        )
        rows = df.select(
            ts.token_count(F.col("text")).alias("n"),
            ts.distinct_token_count(F.col("text")).alias("d"),
        ).collect()
        assert [(r.n, r.d) for r in rows] == [(3, 3), (0, 0), (0, 0), (3, 1)]

    def test_quality_counts(self, spark):
        df = spark.createDataFrame([("Ab1!\nx",)], "text string")
        r = df.select(*ts.quality_counts(F.col("text"))).collect()[0]
        assert r.q_len == 6
        assert r.q_tokens == 2
        assert r.q_punct == 1   # '!'
        assert r.q_digits == 1
        assert r.q_upper == 1
        assert r.q_lines == 2

    def test_lang_id(self, spark):
        df = spark.createDataFrame(
            [
                ("the cat and the dog is here",),
                ("der hund und die katze ist",),
                ("xyzzy qwerty",),
            ],
            "text string",
        )
        out = df.select(
            *ts.lang_id_cols(F.col("text"))
        ).withColumn(
            "pred", ts.lang_id_pred(["hits_en", "hits_de", "hits_es", "hits_fr"])
        )
        assert [r.pred for r in out.collect()] == ["en", "de", "und"]

    def test_fingerprint_order_invariant(self, spark):
        df = spark.createDataFrame(
            [("b a c",), ("c b a",), ("a a b c",), ("a d",)], "text string"
        )
        fps = [
            r.f
            for r in df.select(
                ts.token_set_fingerprint(F.col("text")).alias("f")
            ).collect()
        ]
        assert fps[0] == fps[1] == fps[2]
        assert fps[3] != fps[0]


class TestWinnowFingerprints:
    """Property gates for the true-winnowing query (T13): the MOSS
    guarantee — any shared token run of length >= w + k - 1 (= 6 here)
    yields a shared fingerprint hash — plus short-doc degrade."""

    def _fps(self, spark, tmp_path, texts):
        import __spark_entry__ as m

        df = spark.createDataFrame(
            [(i, t, "s") for i, t in enumerate(texts)],
            "doc_id long, text string, source string",
        )
        sf = str(tmp_path / "sf")
        df.write.mode("overwrite").parquet(f"{sf}/documents.parquet")
        out = m.q_winnow_fingerprints(spark, sf)
        res = {}
        for r in out.collect():
            res.setdefault(r.doc_id, set()).add(r.fp_hash)
        return res

    def test_shared_run_shares_fingerprint(self, spark, tmp_path):
        shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens = w+k-1
        a = "one two three " + shared + " four five six"
        b = "seven eight " + shared + " nine ten eleven twelve"
        res = self._fps(spark, tmp_path, [a, b])
        assert res[0] & res[1], "shared 6-token run must share a fingerprint"

    def test_disjoint_docs_share_nothing(self, spark, tmp_path):
        res = self._fps(
            spark,
            tmp_path,
            ["aa bb cc dd ee ff gg", "hh ii jj kk ll mm nn"],
        )
        assert not (res[0] & res[1])

    def test_short_doc_degrades_to_single_min(self, spark, tmp_path):
        # 4 tokens -> 2 grams < w: exactly one fingerprint, not zero
        res = self._fps(spark, tmp_path, ["a b c d"])
        assert len(res[0]) == 1
