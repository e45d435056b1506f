"""Filename quality scoring — Spark column expressions + SQL twins.

Reproduces the reference's naming module semantics
(/root/reference/photo_dedup/naming.py), truth-table exact:

  F1 ``is_meaningless``      (naming.py:31-79), incl. the CJK /
     non-ASCII-ratio leg (naming.py:69-77): stems with no alpha and no
     CJK are meaningless only when >50% of chars are non-ASCII —
     ``123_456`` is NOT meaningless.
  F2 ``readability_score``   (naming.py:82-144): the ``+2 descriptive``
     leg fires on alpha OR CJK and stacks with the camera bonus; the
     ``+5 HHMMSS`` leg requires a full validated date-time prefix.
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

# regex fragments (shared subset: no lookaround, no backrefs in predicates)
_COPY_MARKER = r"\([0-9]+\)"            # "(N)" copy marker, ANYWHERE (naming.py:100-102 re.search)
_COPY_STRIP = r"\s*\([0-9]+\)"          # strip rule (naming.py:48 re.sub, unanchored)
_DATE_PREFIX = r"^(19[0-9]{2}|20[0-9]{2})[-_]?(0[1-9]|1[0-2])[-_]?(0[1-9]|[12][0-9]|3[01])"
# full datetime prefix: validated YMD + [_-]HHMMSS with valid ranges (naming.py:110-122)
_DATETIME_PREFIX = (
    r"^(19[0-9]{2}|20[0-9]{2})[-_]?(0[1-9]|1[0-2])[-_]?(0[1-9]|[12][0-9]|3[01])"
    r"[_-]([01][0-9]|2[0-3])[0-5][0-9][0-5][0-9]"
)
_CAMERA_PREFIX = r"(?i)^(IMG|DSC|DCIM|PANO|VID|MOV|Screenshot)"   # naming.py:55, re.IGNORECASE
_CAMERA_PREFIX_SQL = r"^(IMG|DSC|DCIM|PANO|VID|MOV|Screenshot)"
# Python's \d is Unicode-aware (reference naming.py:65 matches e.g.
# arabic-indic digits) — mirror with \p{Nd}, supported by both Java
# regex (Spark) and RE2 (DuckDB)
_PURE_NUMBER = r"^\p{Nd}{1,13}$"
_UNIX_TS = r"^\p{Nd}{10,13}$"
_SHORT_NUMBER = r"^\p{Nd}{1,9}$"
_HAS_ALPHA = r"[A-Za-z]"
# is_meaningless CJK leg: unified + hiragana + katakana (naming.py:71)
_HAS_CJK = r"[一-鿿぀-ゟ゠-ヿ]"
# descriptive-text leg: alpha OR CJK-unified ONLY — kana does not count
# (naming.py:129 ``[a-zA-Z一-鿿]``)
_DESCRIPTIVE = r"[A-Za-z一-鿿]"
_ASCII_ONLY = r"[\x00-\x7f]"


def _basename(name: Column) -> Column:
    return F.element_at(F.split(name, "/"), -1)


def _path_stem(base: Column) -> Column:
    """``Path(filename).stem``: strip after the LAST dot, but only when
    at least one char precedes it ('.hidden' keeps its name)."""
    return F.regexp_replace(base, r"^(.+)\.[^.]*$", "$1")


def _stem(name: Column) -> Column:
    """clean stem: basename → Path.stem → strip ALL copy markers →
    trim (naming.py:46-48)."""
    return F.trim(F.regexp_replace(_path_stem(_basename(name)), _COPY_STRIP, ""))


def _basename_sql(expr: str) -> str:
    return f"list_extract(string_split({expr}, '/'), -1)"


def _path_stem_sql(base: str) -> str:
    return f"regexp_replace({base}, '^(.+)\\.[^.]*$', '\\1')"


def stem_sql(expr: str) -> str:
    return (
        f"trim(regexp_replace({_path_stem_sql(_basename_sql(expr))},"
        f" '\\s*\\([0-9]+\\)', '', 'g'))"
    )


def has_copy_marker(name: Column) -> Column:
    """re.search(r'\\(\\d+\\)', stem) — anywhere in the raw stem
    (naming.py:100-102)."""
    return _path_stem(_basename(name)).rlike(_COPY_MARKER)


def has_copy_marker_sql(expr: str) -> str:
    return f"regexp_matches({_path_stem_sql(_basename_sql(expr))}, '\\([0-9]+\\)')"


def _non_ascii_count(s: Column) -> Column:
    # stripping the ASCII chars leaves exactly the non-ASCII ones
    return F.length(F.regexp_replace(s, _ASCII_ONLY, ""))


def _non_ascii_count_sql(s: str) -> str:
    return f"length(regexp_replace({s}, '[\\x00-\\x7f]', '', 'g'))"


def is_meaningless(name: Column) -> Column:
    """F1 truth table (naming.py:31-79), column-expression rendition:
    empty ⇒ true; validated date-prefix ⇒ false; camera-prefix ⇒ false;
    1-13-digit pure number ⇒ true; alpha or CJK ⇒ false; else
    meaningless iff >50% of the stem is non-ASCII (naming.py:69-77 —
    '123_456' is NOT meaningless)."""
    s = _stem(name)
    na = _non_ascii_count(s)
    return (
        F.when(F.length(s) == 0, F.lit(True))
        .when(s.rlike(_DATE_PREFIX), F.lit(False))
        .when(s.rlike(_CAMERA_PREFIX), F.lit(False))
        .when(s.rlike(_PURE_NUMBER), F.lit(True))
        .when(s.rlike(_HAS_ALPHA) | s.rlike(_HAS_CJK), F.lit(False))
        .otherwise((na > 0) & (na * 2 > F.length(s)))
    )


def is_meaningless_sql(expr: str) -> str:
    s = stem_sql(expr)
    na = _non_ascii_count_sql(s)
    return (
        f"(case when length({s}) = 0 then true "
        f"when regexp_matches({s}, '{_DATE_PREFIX}') then false "
        f"when regexp_matches({s}, '{_CAMERA_PREFIX_SQL}', 'i') then false "
        f"when regexp_matches({s}, '{_PURE_NUMBER}') then true "
        f"when regexp_matches({s}, '{_HAS_ALPHA}') "
        f"  or regexp_matches({s}, '{_HAS_CJK}') then false "
        f"else ({na} > 0 and {na} * 2 > length({s})) end)"
    )


def readability_score(name: Column) -> Column:
    """F2 additive score (naming.py:82-144):
    −20 copy-marker anywhere in the raw stem; +10 validated date
    prefix; +5 validated full date-time prefix (stacks with +10); +3
    camera prefix; +2 descriptive alpha/CJK (stacks with camera); −10
    unix-timestamp stem; −5 short pure number; −0.01·len(clean stem).
    Returned ×100 as an integer column so the DuckDB oracle comparison
    is float-free."""
    s = _stem(name)
    score = F.lit(0)
    score += F.when(has_copy_marker(name), F.lit(-2000)).otherwise(F.lit(0))
    score += F.when(s.rlike(_DATE_PREFIX), F.lit(1000)).otherwise(F.lit(0))
    score += F.when(s.rlike(_DATETIME_PREFIX), F.lit(500)).otherwise(F.lit(0))
    score += F.when(s.rlike(_CAMERA_PREFIX), F.lit(300)).otherwise(F.lit(0))
    score += F.when(s.rlike(_DESCRIPTIVE), F.lit(200)).otherwise(F.lit(0))
    score += F.when(s.rlike(_UNIX_TS), F.lit(-1000)).otherwise(
        F.when(s.rlike(_SHORT_NUMBER), F.lit(-500)).otherwise(F.lit(0))
    )
    score += -F.length(s)  # −0.01·len, ×100
    return score.alias("readability_score")


def readability_score_sql(expr: str) -> str:
    s = stem_sql(expr)
    return (
        f"((case when {has_copy_marker_sql(expr)} then -2000 else 0 end)"
        f" + (case when regexp_matches({s}, '{_DATE_PREFIX}') then 1000 else 0 end)"
        f" + (case when regexp_matches({s}, '{_DATETIME_PREFIX}') then 500 else 0 end)"
        f" + (case when regexp_matches({s}, '{_CAMERA_PREFIX_SQL}', 'i') then 300 else 0 end)"
        f" + (case when regexp_matches({s}, '{_DESCRIPTIVE}') then 200 else 0 end)"
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
