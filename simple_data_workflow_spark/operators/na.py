"""NA imputation engine — strategies cc / fi / fii / gm / mice.

Reference parity: ``wrangle_na`` (src/tasks.py:313-473).

- **cc** complete-case drop (:382-383) — row identity is preserved via an
  explicit ``row_id`` column when present (Spark has no index,
  SURVEY.md §1.3).
- **fi** fill-in (:398-421): float → column mean, int → column median
  (exact, not approx), category/bool → column mode with pandas
  tie-breaking (most frequent, ties → smallest value).
- **fii** = fi + one boolean indicator column per observed row-wise NA
  pattern (bitstring over columns; all-zeros pattern dropped, :386-396).
- **gm** "grand model" = fii + feature × NA-indicator interaction columns
  with patsy-compatible names (:424-441).
- **mice** chained-equations multiple imputation (:444-473) — implemented
  in ``simple_data_workflow_spark.operators.mice``.

Scale notes: all fill statistics for every column come from ONE
aggregate pass (single tiny collected row re-injected as literals);
modes are per-column groupBy top-1 on bounded-cardinality categorical
columns. NA-pattern discovery is a distinct over a synthesized pattern
string — bounded by 2^k patterns but practically tiny; a hard cap
guards pathological inputs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from simple_data_workflow_spark.functions.cols import qcol
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    FloatType,
    IntegralType,
    NumericType,
    StringType,
)

MAX_NA_PATTERNS = 512


def _has_na(df: DataFrame, cols: list[str]) -> bool:
    """Early-return check (reference src/tasks.py:372-379): one agg pass."""
    if not cols:
        return False
    row = df.agg(
        *[F.max(F.when(qcol(c).isNull(), 1).otherwise(0)).alias(c) for c in cols]
    ).first()
    return any(row[c] == 1 for c in cols)


def _fill_values(df: DataFrame, cols: list[str]) -> dict[str, object]:
    """Per-column fill statistic, one aggregate pass for mean/median and one
    bounded groupBy per categorical/bool column for mode."""
    by_type: dict[str, str] = {}
    for f in df.schema.fields:
        if f.name not in cols:
            continue
        if isinstance(f.dataType, (FloatType, DoubleType)):
            by_type[f.name] = "mean"
        elif isinstance(f.dataType, IntegralType):
            by_type[f.name] = "median"
        elif isinstance(f.dataType, (StringType, BooleanType)):
            by_type[f.name] = "mode"

    aggs = []
    for c, kind in by_type.items():
        if kind == "mean":
            aggs.append(F.avg(qcol(c)).alias(c))
        elif kind == "median":
            # exact median (pandas interpolates the middle pair) — percentile,
            # not percentile_approx: correctness first, and a single-pass
            # exact percentile over a numeric column is still fully distributed
            aggs.append(F.percentile(qcol(c), F.lit(0.5)).alias(c))
    fills: dict[str, object] = {}
    if aggs:
        row = df.agg(*aggs).first()
        for c, kind in by_type.items():
            if kind in ("mean", "median"):
                v = row[c]
                if kind == "median":
                    # pandas fillna on Int64 with x.5 keeps the float value;
                    # match by keeping the double only when non-integral
                    v = int(v) if v is not None and float(v).is_integer() else v
                fills[c] = v
    for c, kind in by_type.items():
        if kind == "mode":
            # pandas .mode()[0]: most frequent, ties broken by smallest value
            top = (
                df.where(qcol(c).isNotNull())
                .groupBy(qcol(c).alias("__mode_v"))
                .count()
                .orderBy(F.col("count").desc(), F.col("__mode_v").asc())
                .first()
            )
            if top is not None:
                fills[c] = top[0]
    return fills


def _pattern_col(cols: list[str]):
    return F.concat(
        *[F.when(qcol(c).isNull(), F.lit("1")).otherwise(F.lit("0")) for c in cols]
    )


def na_indicator_columns(df: DataFrame, cols: list[str]) -> tuple[DataFrame, list[str]]:
    """fii indicators: one boolean column per observed NA pattern
    (``na_1000`` style; bit order = column order; all-zeros dropped)."""
    pat = _pattern_col(cols)
    observed = [r[0] for r in df.select(pat.alias("p")).distinct().limit(MAX_NA_PATTERNS + 1).collect()]
    if len(observed) > MAX_NA_PATTERNS:
        raise ValueError(f">{MAX_NA_PATTERNS} distinct NA patterns; cap exceeded")
    patterns = sorted(p for p in observed if "1" in p)
    names = [f"na_{p}" for p in patterns]
    out = df.withColumn("__pat", pat)
    for p, name in zip(patterns, names):
        out = out.withColumn(name, F.col("__pat") == F.lit(p))
    return out.drop("__pat"), names


def _interaction_name(feat: str, level, ind: str) -> str:
    """patsy dmatrix naming for Q('feat')[level]:Q('na_x')[T.True] terms
    (golden pinned at reference test_tasks.py:431-459)."""
    return f'Q("{feat}")[{level}]:Q("{ind}")[T.True]'


def wrangle_na(
    df: DataFrame,
    strategy: str = "cc",
    cols: Sequence[str] | None = None,
    **kwargs,
) -> DataFrame:
    """Dispatch over the five reference strategies (src/tasks.py:313-473)."""
    cols = list(cols) if cols else list(df.columns)
    if strategy == "mice":
        from simple_data_workflow_spark.operators.mice import mice_impute

        return mice_impute(df, cols=cols, **kwargs)
    if not _has_na(df, cols):
        return df
    if strategy == "cc":
        return df.na.drop(subset=cols)
    if strategy == "fi":
        return df.fillna(_fill_values(df, cols))
    if strategy == "fii":
        out, _ = na_indicator_columns(df, cols)
        return out.fillna(_fill_values(out, cols))
    if strategy == "gm":
        out, ind_names = na_indicator_columns(df, cols)
        out = out.fillna(_fill_values(out, cols))
        # full interaction set: every (feature level/value) × (NA indicator)
        feats = [c for c in cols if c in out.columns]
        inter = []
        cat_feats = [
            c for c in feats if isinstance(out.schema[c].dataType, (StringType, BooleanType))
        ]
        levels_by_feat: dict[str, list] = {}
        if cat_feats:
            # one pass for all categorical features' level sets
            row = out.agg(
                *[F.array_sort(F.collect_set(qcol(c))).alias(c) for c in cat_feats]
            ).first()
            levels_by_feat = {c: sorted(row[c] or [], key=str) for c in cat_feats}
        for feat in feats:
            dtype = out.schema[feat].dataType
            for ind in ind_names:
                if isinstance(dtype, (StringType, BooleanType)):
                    # categorical feature: one interaction per level
                    for lv in levels_by_feat[feat]:
                        name = _interaction_name(feat, lv, ind)
                        inter.append(
                            (
                                (qcol(feat) == F.lit(lv)) & F.col(ind)
                            ).cast("double").alias(name)
                        )
                elif isinstance(dtype, NumericType):
                    name = f'Q("{feat}"):Q("{ind}")[T.True]'
                    inter.append(
                        (qcol(feat).cast("double") * F.col(ind).cast("double")).alias(name)
                    )
        return out.select("*", *inter)
    raise ValueError(f"unknown strategy {strategy!r}")
