"""Elementwise transforms + Gelman standardization.

Reference parity: ``transform_data`` (src/tasks.py:476-521) — natural
log / arcsinh over selected columns with a zero-guard for log — and
``gelman_standardize_data`` (src/tasks.py:524-556) — numeric columns
→ (x − mean) / (2·stddev_samp), boolean columns mean-centered only.

Scale notes: the standardization statistics come from ONE global
aggregate collected as a single tiny row and re-injected as literals —
NOT an empty-frame window (``avg(x) OVER ()`` forces every row into
one partition; a literal-broadcast keeps the transform embarrassingly
parallel at 100 TB).
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, NumericType

from simple_data_workflow_spark.operators.categorical import CategoryRegistry

_FUNCS = {"log": F.log, "arcsinh": F.asinh, "asinh": F.asinh}

_SCALE = 1_000_000.0


def exact_moments(df: DataFrame, col) -> tuple[int, float, float]:
    """(n, mean, stddev_samp) of a double column computed from exact
    scaled-integer DECIMAL sums — order-insensitive and bit-reproducible
    across engines (a parallel double sum is not; a fractional
    double→DECIMAL cast rounds differently per engine, an integral one is
    exact), so standardized outputs can be hash-compared against a DuckDB
    oracle using the same formula:
    mean = Σx/n, sd = sqrt((Σx² − n·mean²)/(n−1))."""
    c = F.col(col) if isinstance(col, str) else col
    row = df.agg(
        F.count(c).alias("n"),
        (F.sum(F.round(c * F.lit(_SCALE)).cast("decimal(38,0)")).cast("double") / F.lit(_SCALE)).alias("s1"),
        (F.sum(F.round(c * c * F.lit(_SCALE)).cast("decimal(38,0)")).cast("double") / F.lit(_SCALE)).alias("s2"),
    ).first()
    n, s1, s2 = row["n"], row["s1"], row["s2"]
    mu = s1 / n
    sd = math.sqrt((s2 - n * mu * mu) / (n - 1)) if n > 1 else float("nan")
    return n, mu, sd


def transform_data(df: DataFrame, cols: Sequence[str], func: str = "arcsinh") -> DataFrame:
    """Apply log/arcsinh to ``cols`` (reference src/tasks.py:476-521).

    - ``log`` raises ValueError if any selected value == 0 (the reference
      checks zeros only; negatives are allowed through and become NULL/NaN
      — quirk preserved, src/tasks.py:510-511);
    - transformed integer columns are coerced to double (the reference's
      nullable-int → Float64 coercion, :512-520).
    """
    if func not in _FUNCS:
        raise ValueError(f"func must be one of {sorted(_FUNCS)}, got {func!r}")
    cols = list(cols)
    if func == "log" and cols:
        # one aggregate pass; short-circuits via max() — no full scan of values to driver
        zero_flags = df.agg(
            *[F.max(F.when(F.col(c) == 0, 1).otherwise(0)).alias(c) for c in cols]
        ).first()
        bad = [c for c in cols if zero_flags[c] == 1]
        if bad:
            raise ValueError(f"Cannot take log of x=0; columns with zeros: {bad}")
    fn = _FUNCS[func]
    return df.select(
        *[
            fn(F.col(c).cast("double")).alias(c) if c in cols else F.col(c)
            for c in df.columns
        ]
    )


def gelman_standardize_data(
    df: DataFrame, registry: CategoryRegistry | None = None
) -> DataFrame:
    """Gelman (2008) standardization (reference src/tasks.py:524-556).

    numeric → (x − mean) / (2 · stddev_samp)   [ddof=1, = Spark stddev_samp]
    boolean → x − mean(x)  (mean-centered, not rescaled)
    everything else unchanged.
    """
    numeric = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, NumericType)
        and not (registry and registry.is_cat(f.name))
    ]
    boolean = [f.name for f in df.schema.fields if isinstance(f.dataType, BooleanType)]
    if not numeric and not boolean:
        return df

    aggs = []
    for c in numeric:
        aggs += [F.avg(c).alias(f"__mu_{c}"), F.stddev_samp(c).alias(f"__sd_{c}")]
    for c in boolean:
        aggs.append(F.avg(F.col(c).cast("double")).alias(f"__mu_{c}"))
    stats = df.agg(*aggs).first()

    out = []
    for field in df.schema.fields:
        c = field.name
        if c in numeric:
            mu, sd = stats[f"__mu_{c}"], stats[f"__sd_{c}"]
            expr = (F.col(c).cast("double") - F.lit(mu)) / (F.lit(2.0) * F.lit(sd))
            out.append(expr.alias(c))
        elif c in boolean:
            out.append((F.col(c).cast("double") - F.lit(stats[f"__mu_{c}"])).alias(c))
        else:
            out.append(F.col(c))
    return df.select(*out)
