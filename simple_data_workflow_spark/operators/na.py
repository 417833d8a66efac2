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

import itertools
from collections import defaultdict
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
    mode_cols = [c for c, kind in by_type.items() if kind == "mode"]
    fills.update(_mode_values(df, mode_cols))
    return fills


def _mode_values(df: DataFrame, mode_cols: list[str]) -> dict[str, object]:
    """pandas ``.mode()[0]`` per column (most frequent, ties → smallest
    value) for ALL mode columns in ONE pass: melt to (col, value) pairs,
    one hash aggregate, per-column window top-1. One shuffle regardless
    of how many categorical/bool columns the frame has (vs one groupBy
    job per column). String ordering gives the pandas tie-break for both
    strings and booleans ('false' < 'true' matches False < True)."""
    if not mode_cols:
        return {}
    from pyspark.sql.window import Window

    is_bool = {
        c: isinstance(df.schema[c].dataType, BooleanType) for c in mode_cols
    }
    melted = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("__c"), qcol(c).cast("string").alias("__v")
                    )
                    for c in mode_cols
                ]
            )
        ).alias("kv")
    ).select("kv.__c", "kv.__v").where(F.col("__v").isNotNull())
    w = Window.partitionBy("__c").orderBy(F.desc("count"), F.asc("__v"))
    top = (
        melted.groupBy("__c", "__v")
        .count()
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .collect()
    )
    out: dict[str, object] = {}
    for r in top:
        out[r["__c"]] = r["__v"] == "true" if is_bool[r["__c"]] else r["__v"]
    return out


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


def _patsy_pick_subterms(
    cat_factors: list[str], used: set[frozenset]
) -> list[dict[str, bool]]:
    """Patsy's redundancy-resolution algorithm for one term (public patsy
    ``redundancy.py`` semantics; the reference builds its gm design matrix
    via ``dmatrix`` so the golden at reference test_tasks.py:431-459 pins
    exactly this expansion).

    A term's categorical factor set is expanded into its subsets (sorted
    by size, then factor order); subsets already emitted by earlier terms
    in the same numeric bucket are dropped; the remaining subterms are
    greedily merged — a pair differing by exactly one reduced-coded
    factor collapses into one subterm with that factor full-coded.
    Returns subterms as ``{factor: full_coded?}`` dicts; ``used`` is
    mutated with the subsets this term now covers.
    """
    fresh: list[dict[str, bool]] = []
    for r in range(len(cat_factors) + 1):
        for s in itertools.combinations(cat_factors, r):
            if frozenset(s) not in used:
                used.add(frozenset(s))
                fresh.append({f: False for f in s})
    changed = True
    while changed:
        changed = False
        for i, short in enumerate(fresh):
            short_items = set(short.items())
            for j, long_ in enumerate(fresh):
                if i == j or len(long_) != len(short) + 1:
                    continue
                diff = set(long_.items()) - short_items
                if len(diff) == 1 and short_items <= set(long_.items()):
                    (f, expanded), = diff
                    if not expanded:
                        merged = dict(short)
                        merged[f] = True
                        fresh[i] = merged
                        fresh.pop(j)
                        changed = True
                        break
            if changed:
                break
    return fresh


def _gm_interaction_columns(
    out: DataFrame, feats: list[str], ind_names: list[str]
) -> list:
    """The gm interaction column set with patsy-exact names and values.

    The reference's formula is ``sum(Q(feat):Q(ind)) - 1`` over
    ``itertools.product(features, na_indicators)`` (src/tasks.py:433-437);
    patsy assigns full vs treatment (``[T.lv]``) codings per factor via
    the per-numeric-bucket redundancy algorithm above. Level sets for all
    categorical factors (string/bool features AND the boolean indicators)
    come from ONE aggregate pass, collected as a single tiny row.
    """
    cat_feats = [
        c for c in feats if isinstance(out.schema[c].dataType, (StringType, BooleanType))
    ]
    all_cat = cat_feats + list(ind_names)
    levels_by_factor: dict[str, list] = {}
    if all_cat:
        row = out.agg(
            *[F.array_sort(F.collect_set(qcol(c))).alias(c) for c in all_cat]
        ).first()
        levels_by_factor = {c: list(row[c] or []) for c in all_cat}

    used_by_bucket: dict[frozenset, set] = defaultdict(set)
    cols = []
    for feat in feats:
        is_cat = feat in cat_feats
        if not is_cat and not isinstance(out.schema[feat].dataType, NumericType):
            continue
        for ind in ind_names:
            numeric = () if is_cat else (feat,)
            cats = ([feat] if is_cat else []) + [ind]
            subterms = _patsy_pick_subterms(cats, used_by_bucket[frozenset(numeric)])
            for sub in subterms:
                sub_factors = [f for f in cats if f in sub]
                level_choices = [
                    levels_by_factor[f] if sub[f] else levels_by_factor[f][1:]
                    for f in sub_factors
                ]
                for combo in itertools.product(*level_choices):
                    parts = [f'Q("{nf}")' for nf in numeric]
                    expr = F.lit(1.0)
                    for nf in numeric:
                        expr = expr * qcol(nf).cast("double")
                    for f, lv in zip(sub_factors, combo):
                        tag = str(lv) if sub[f] else f"T.{lv}"
                        parts.append(f'Q("{f}")[{tag}]')
                        expr = expr * (qcol(f) == F.lit(lv)).cast("double")
                    cols.append(expr.alias(":".join(parts)))
    return cols


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
        feats = [c for c in cols if c in out.columns]
        inter = _gm_interaction_columns(out, feats, ind_names)
        return out.select("*", *inter)
    raise ValueError(f"unknown strategy {strategy!r}")
