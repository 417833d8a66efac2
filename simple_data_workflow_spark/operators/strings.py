"""String / column-name normalization operators.

Reference parity: ``clean_text`` (src/tasks.py:40-47),
``sanitize_col_names`` (src/tasks.py:50-56), ``_column_wrangler``
(src/tasks.py:111-121): trim, collapse internal whitespace to ``_``,
lowercase — applied to scalar strings, lists of names, and all column
names of a DataFrame respectively.
"""

from __future__ import annotations

import re
from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# the reference collapses runs of SPACES only (re.sub(' +', ...)); tabs
# and newlines inside the string survive untouched — parity-exact
_SPACES = re.compile(r" +")


def clean_text(text: str) -> str:
    """Normalize a scalar string, exactly as the reference does
    (src/tasks.py:40-47): Python ``strip()`` (all whitespace at the
    ends), collapse internal SPACE runs — only spaces — to ``_``,
    lowercase."""
    return _SPACES.sub("_", str(text).strip()).lower()


def sanitize_col_names(names: Iterable[str]) -> list[str]:
    """Apply ``clean_text`` over a list of names (plan-build-time metadata op).

    Mirrors the reference quirk that a bare string argument is iterated
    character-by-character (src/tasks.py:55-56) — callers pass lists.
    """
    return [clean_text(n) for n in names]


def clean_text_col(col: Column | str) -> Column:
    """Column-level ``clean_text``: runs JVM-side inside codegen.

    Matches the scalar form exactly: ends stripped of ALL whitespace
    (Python ``strip()``; Spark's ``trim`` strips spaces only, hence the
    regexp), internal SPACE runs → ``_``, lowercase."""
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(c, r"^\s+|\s+$", "")
    return F.lower(F.regexp_replace(stripped, " +", "_"))


def column_wrangler(df: DataFrame) -> DataFrame:
    """Rename every column per ``clean_text`` — a zero-cost metadata-only
    projection (no shuffle, no data movement)."""
    return df.toDF(*sanitize_col_names(df.columns))
