"""Column-reference helper for names containing dots.

The reference's fixtures carry pandas-style dotted names (``state.abb``,
F2 — reference test_tasks.py:64-76) which survive name sanitation
(no whitespace). ``F.col("state.abb")`` parses the dot as struct field
access; quoting with backticks resolves the literal name.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def qcol(name: str) -> Column:
    """Column by literal name — backtick-quoted when it contains dots."""
    if "." in name:
        return F.col(f"`{name}`")
    return F.col(name)
