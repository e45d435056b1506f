"""Filename quality scoring — Spark column expressions + SQL twins.

Reproduces the reference's naming module semantics
(/root/reference/photo_dedup/naming.py):

  F1 ``is_meaningless``      (naming.py:31-79)
  F2 ``readability_score``   (naming.py:82-144)
  F4 ``_extract_valid_ymd_prefix`` (naming.py:16-28)
  A4/F3 best-name argmax     (naming.py:147-177) — window in groups.py

Every predicate is a pure column expression (regex subset common to
Java regex and RE2) with a DuckDB SQL twin so the DuckDB oracle can
replay the exact same scoring.  The reference's safety rule — the
keep-file's extension is NEVER changed (naming.py:7-9, 173-174) — is
enforced in the plan builder, not here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# regex fragments (shared subset: no lookaround, no backrefs)
_COPY_SUFFIX = r" \([0-9]+\)$"          # " (1)" copy suffix (naming.py:34)
_DATE_PREFIX = r"^(19[0-9]{2}|20[0-9]{2})[-_]?(0[1-9]|1[0-2])[-_]?(0[1-9]|[12][0-9]|3[01])"
_TIME_SUFFIX = r"[-_]([01][0-9]|2[0-3])[0-5][0-9][0-5][0-9]"  # _HHMMSS (naming.py:109)
_CAMERA_PREFIX = r"^(IMG|DSC|DCIM|PANO|VID|MOV|Screenshot)"   # naming.py:55
_PURE_NUMBER = r"^[0-9]{1,13}$"
_UNIX_TS = r"^[0-9]{10,13}$"
_SHORT_NUMBER = r"^[0-9]{1,9}$"
_HAS_ALPHA = r"[A-Za-z]"


def _stem(name: Column) -> Column:
    """basename without extension; copy-suffix ' (N)' stripped first
    (naming.py:37-38)."""
    base = F.element_at(F.split(name, "/"), -1)
    no_ext = F.regexp_replace(base, r"\.[A-Za-z0-9]+$", "")
    return F.regexp_replace(no_ext, _COPY_SUFFIX, "")


def stem_sql(expr: str) -> str:
    base = f"list_extract(string_split({expr}, '/'), -1)"
    no_ext = f"regexp_replace({base}, '\\.[A-Za-z0-9]+$', '')"
    return f"regexp_replace({no_ext}, ' \\([0-9]+\\)$', '')"


def has_copy_suffix(name: Column) -> Column:
    base = F.element_at(F.split(name, "/"), -1)
    no_ext = F.regexp_replace(base, r"\.[A-Za-z0-9]+$", "")
    return no_ext.rlike(_COPY_SUFFIX)


def has_copy_suffix_sql(expr: str) -> str:
    base = f"list_extract(string_split({expr}, '/'), -1)"
    no_ext = f"regexp_replace({base}, '\\.[A-Za-z0-9]+$', '')"
    return f"regexp_matches({no_ext}, ' \\([0-9]+\\)$')"


def is_meaningless(name: Column) -> Column:
    """F1 truth table (naming.py:31-79), column-expression rendition:
    empty ⇒ true; date-prefix ⇒ false; camera-prefix ⇒ false;
    1-13-digit pure number ⇒ true; no-alpha ⇒ true; else false.
    (The reference's CJK/non-ASCII leg is folded into the no-alpha leg —
    our corpus payload is source paths, documented deviation.)"""
    s = _stem(name)
    return (
        F.when(F.length(s) == 0, F.lit(True))
        .when(s.rlike(_DATE_PREFIX), F.lit(False))
        .when(s.rlike(_CAMERA_PREFIX), F.lit(False))
        .when(s.rlike(_PURE_NUMBER), F.lit(True))
        .when(~s.rlike(_HAS_ALPHA), F.lit(True))
        .otherwise(F.lit(False))
    )


def is_meaningless_sql(expr: str) -> str:
    s = stem_sql(expr)
    return (
        f"(case when length({s}) = 0 then true "
        f"when regexp_matches({s}, '{_DATE_PREFIX}') then false "
        f"when regexp_matches({s}, '{_CAMERA_PREFIX}') then false "
        f"when regexp_matches({s}, '{_PURE_NUMBER}') then true "
        f"when not regexp_matches({s}, '{_HAS_ALPHA}') then true "
        f"else false end)"
    )


def readability_score(name: Column) -> Column:
    """F2 additive score (naming.py:82-144):
    −20 copy-suffix; +10 date prefix; +5 _HHMMSS; +3 camera prefix;
    +2 has alpha (descriptive); −10 unix-timestamp stem; −5 short pure
    number; −0.01·len(stem).  Returned ×100 as an integer column so the
    DuckDB oracle comparison is float-free."""
    s = _stem(name)
    score = F.lit(0)
    score += F.when(has_copy_suffix(name), F.lit(-2000)).otherwise(F.lit(0))
    score += F.when(s.rlike(_DATE_PREFIX), F.lit(1000)).otherwise(F.lit(0))
    score += F.when(s.rlike(_TIME_SUFFIX), F.lit(500)).otherwise(F.lit(0))
    score += F.when(s.rlike(_CAMERA_PREFIX), F.lit(300)).otherwise(F.lit(0))
    score += F.when(
        s.rlike(_HAS_ALPHA) & ~s.rlike(_CAMERA_PREFIX), F.lit(200)
    ).otherwise(F.lit(0))
    score += F.when(s.rlike(_UNIX_TS), F.lit(-1000)).otherwise(
        F.when(s.rlike(_SHORT_NUMBER), F.lit(-500)).otherwise(F.lit(0))
    )
    score += -F.length(s)  # −0.01·len, ×100
    return score.alias("readability_score")


def readability_score_sql(expr: str) -> str:
    s = stem_sql(expr)
    return (
        f"((case when {has_copy_suffix_sql(expr)} then -2000 else 0 end)"
        f" + (case when regexp_matches({s}, '{_DATE_PREFIX}') then 1000 else 0 end)"
        f" + (case when regexp_matches({s}, '{_TIME_SUFFIX}') then 500 else 0 end)"
        f" + (case when regexp_matches({s}, '{_CAMERA_PREFIX}') then 300 else 0 end)"
        f" + (case when regexp_matches({s}, '{_HAS_ALPHA}') and not regexp_matches({s}, '{_CAMERA_PREFIX}') then 200 else 0 end)"
        f" + (case when regexp_matches({s}, '{_UNIX_TS}') then -1000 "
        f"      when regexp_matches({s}, '{_SHORT_NUMBER}') then -500 else 0 end)"
        f" - length({s}))"
    )


def valid_ymd_prefix(name: Column) -> Column:
    """F4: extract a validated YYYY[-_]MM[-_]DD prefix, '' if absent
    (naming.py:16-28; range-validated by the regex itself)."""
    return F.regexp_extract(_stem(name), _DATE_PREFIX, 0)


def valid_ymd_prefix_sql(expr: str) -> str:
    return f"coalesce(regexp_extract({stem_sql(expr)}, '{_DATE_PREFIX}', 0), '')"
