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

_WS = re.compile(r"\s+")


def clean_text(text: str) -> str:
    """Normalize a scalar string: trim → collapse whitespace to '_' → lower."""
    return _WS.sub("_", str(text).strip()).lower()


def sanitize_col_names(names: Iterable[str]) -> list[str]:
    """Apply ``clean_text`` over a list of names (plan-build-time metadata op).

    Mirrors the reference quirk that a bare string argument is iterated
    character-by-character (src/tasks.py:55-56) — callers pass lists.
    """
    return [clean_text(n) for n in names]


def clean_text_col(col: Column | str) -> Column:
    """Column-level ``clean_text``: runs JVM-side inside codegen."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.regexp_replace(F.trim(c), r"\s+", "_"))


def column_wrangler(df: DataFrame) -> DataFrame:
    """Rename every column per ``clean_text`` — a zero-cost metadata-only
    projection (no shuffle, no data movement)."""
    return df.toDF(*sanitize_col_names(df.columns))
