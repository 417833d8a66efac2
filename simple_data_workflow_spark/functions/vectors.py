"""Vector column functions — dot product / norm / cosine over array<float>.

Built on `F.zip_with` + `F.aggregate` so the arithmetic runs JVM-side
inside codegen (no Python UDF in the hot path). Elements are cast to
double *before* accumulation and the fold is sequential left-to-right,
which makes the result bit-deterministic and engine-portable (the
DuckDB oracle computes the same left-to-right double sum).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2_normalize(a: Column) -> Column:
    """Pre-normalizing once turns cosine into a plain dot product — at
    100 TB you normalize at ingest and never recompute norms per pair."""
    n = norm(a)
    return F.transform(a, lambda x: x.cast("double") / n)
