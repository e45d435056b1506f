"""Content normalization — the code analog of pixel normalization.

The reference hashes *pixels after EXIF-orientation normalization* so
that metadata-only differences collapse to one key
(/root/reference/photo_dedup/hasher.py:95-154).  For source code the
analogous invariance is line-ending / trailing-whitespace normalization:

    1. CRLF and lone CR  -> LF
    2. trailing spaces/tabs before each newline -> stripped
    3. trailing whitespace at end of content    -> stripped

The SAME normalization is defined three ways, kept in lockstep:
  * :func:`normalize_col`   — Spark Column expression (pure built-ins,
    whole-stage-codegen'd; no UDF needed for this step),
  * :data:`NORMALIZE_SQL`   — DuckDB SQL template (the oracle side),
  * :func:`normalize_py`    — plain Python (sequential oracle + tests).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# NOTE regex dialects: Spark uses Java regex, DuckDB uses RE2.  The
# patterns below are restricted to the common subset (no lookaround,
# no backrefs) so both engines agree byte-for-byte.
_TRAILING_WS_LINE = "[ \t]+\n"
_TRAILING_WS_EOF = "[ \t\n]+$"


def normalize_col(c: Column) -> Column:
    """Spark-side normalization as a Column expression."""
    c = F.replace(c, F.lit("\r\n"), F.lit("\n"))
    c = F.replace(c, F.lit("\r"), F.lit("\n"))
    c = F.regexp_replace(c, _TRAILING_WS_LINE, "\n")
    c = F.regexp_replace(c, _TRAILING_WS_EOF, "")
    return c


def normalize_sql(expr: str) -> str:
    """DuckDB SQL rendering of the same normalization (oracle side)."""
    s = f"replace(replace({expr}, chr(13) || chr(10), chr(10)), chr(13), chr(10))"
    s = f"regexp_replace({s}, '[ \\t]+\\n', chr(10), 'g')"
    s = f"regexp_replace({s}, '[ \\t\\n]+$', '')"
    return s


_PY_TRAIL_LINE = re.compile(r"[ \t]+\n")
_PY_TRAIL_EOF = re.compile(r"[ \t\n]+$")


def normalize_py(text: str) -> str:
    """Pure-Python rendition (sequential oracle, property tests)."""
    t = text.replace("\r\n", "\n").replace("\r", "\n")
    t = _PY_TRAIL_LINE.sub("\n", t)
    t = _PY_TRAIL_EOF.sub("", t)
    return t
