"""Vector column functions — dot product / norm / cosine over array<float>.

Built on `F.zip_with` + `F.aggregate` so the arithmetic runs JVM-side
inside codegen (no Python UDF in the hot path). Elements are cast to
double *before* accumulation and the fold is sequential left-to-right,
which makes the result bit-deterministic and engine-portable (the
DuckDB oracle computes the same left-to-right double sum).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """dot/(|a||b|); NULL for zero vectors (nullif guards ANSI mode)."""
    return dot(a, b) / F.nullif(norm(a) * norm(b), F.lit(0.0))


def l2_normalize(a: Column) -> Column:
    """Pre-normalizing once turns cosine into a plain dot product — at
    100 TB you normalize at ingest and never recompute norms per pair."""
    n = norm(a)
    return F.transform(a, lambda x: x.cast("double") / n)


# ---------------------------------------------------------------------------
# Vectorized (Arrow/numpy) variants — the perf path.
#
# Spark's higher-order array functions (zip_with/aggregate) are evaluated
# INTERPRETED per element (they do not participate in whole-stage codegen),
# so a 64-dim dot via fold costs ~100 boxed ops per row. The Arrow-batched
# pandas_udf below does the same math as one BLAS matrix op per batch —
# use it in pair-scoring hot paths; keep the fold forms where bit-exact
# sequential accumulation is required for cross-engine oracle parity.
# ---------------------------------------------------------------------------


def _stack(series: "pd.Series") -> "np.ndarray":
    return np.stack([np.asarray(v, dtype=np.float64) for v in series.values])


def cosine_pd():
    """Arrow-batched cosine over two array columns (batch BLAS)."""

    @pandas_udf("double")
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        from simple_data_workflow_spark.blasctl import pin_worker_blas

        pin_worker_blas()
        A, B = _stack(a), _stack(b)
        num = np.einsum("ij,ij->i", A, B)
        den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
        return pd.Series(num / den)

    return _cos


def hyperplane_bucket_pd(planes):
    """Arrow-batched sign-bit LSH bucket id for a plane matrix."""
    P = np.asarray(planes, dtype=np.float64)
    powers = (1 << np.arange(P.shape[0])).astype(np.int64)

    @pandas_udf("long")
    def _bucket(v: pd.Series) -> pd.Series:
        from simple_data_workflow_spark.blasctl import pin_worker_blas

        pin_worker_blas()
        V = _stack(v)
        bits = (V @ P.T) > 0
        return pd.Series((bits @ powers).astype("int64"))

    return _bucket


def nearest_centroids_pd(centroids, n_assign: int):
    """Arrow-batched n-nearest-centroid assignment (squared-L2 via the
    |v|²−2v·c+|c|² expansion, one matrix product per batch)."""
    C = np.asarray(centroids, dtype=np.float64)
    c2 = (C**2).sum(axis=1)

    @pandas_udf("array<int>")
    def _assign(v: pd.Series) -> pd.Series:
        from simple_data_workflow_spark.blasctl import pin_worker_blas

        pin_worker_blas()
        V = _stack(v)
        d2 = (V**2).sum(axis=1, keepdims=True) - 2.0 * (V @ C.T) + c2
        idx = np.argsort(d2, axis=1, kind="stable")[:, :n_assign]
        return pd.Series([row.astype("int32") for row in idx])

    return _assign
