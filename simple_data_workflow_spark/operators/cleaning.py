"""Cleaning pipeline: sentinel→NULL, typing, composed clean_data.

Reference parity: ``_replace_na`` (src/tasks.py:100-108),
``_obj_wrangler`` (src/tasks.py:124-131), ``_check_model_assumptions``
(src/tasks.py:235-240), ``clean_data`` composition (src/tasks.py:243-272).

Spark-first notes: the reference materializes a full pandas frame per
stage; here every stage contributes expressions to one lazy plan and
Catalyst collapses the whole chain into a single projection over the
scan (projection collapsing — strictly better than the reference's
per-step materialization, SURVEY.md §4.2).
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from simple_data_workflow_spark.functions.cols import qcol
from pyspark.sql.types import NumericType, StringType

from simple_data_workflow_spark.operators.categorical import (
    CategoryRegistry,
    factor_wrangler,
)
from simple_data_workflow_spark.operators.strings import column_wrangler


def replace_na(
    df: DataFrame,
    na_values: Sequence[object] | None,
    subset: Iterable[str] | None = None,
) -> DataFrame:
    """Rewrite a user list of sentinel values to NULL across columns.

    String sentinels apply to string columns; numeric sentinels to numeric
    columns (avoids silent cross-type coercion). Pure projection — stays
    inside whole-stage codegen, no shuffle.
    """
    if not na_values:
        return df
    cols = set(subset) if subset is not None else set(df.columns)
    str_sentinels = [v for v in na_values if isinstance(v, str)]
    num_sentinels = [v for v in na_values if isinstance(v, (int, float)) and not isinstance(v, bool)]
    out = []
    for field in df.schema.fields:
        c = qcol(field.name)
        if field.name in cols:
            if isinstance(field.dataType, StringType) and str_sentinels:
                c = F.when(c.isin(str_sentinels), F.lit(None)).otherwise(c)
            elif isinstance(field.dataType, NumericType) and num_sentinels:
                c = F.when(c.isin(num_sentinels), F.lit(None)).otherwise(c)
        out.append(c.alias(field.name))
    return df.select(*out)


def obj_wrangler(df: DataFrame) -> DataFrame:
    """Reference casts object→string (src/tasks.py:124-131). Spark columns
    are born typed, so this is a no-op identity stage kept for pipeline
    shape parity; non-atomic columns could be stringified here if needed."""
    return df


def check_model_assumptions(df: DataFrame) -> DataFrame:
    """Documented user extension hook (identity, src/tasks.py:235-240)."""
    return df


def clean_data(
    df: DataFrame,
    na_values: Sequence[object] | None = None,
    cat_cols: Sequence[str] | None = None,
    ordered_cols: Sequence[str] | None = None,
    categories: dict[str, list] | None = None,
    str_to_cat: bool = True,
    dummy_to_bool: bool = True,
    assumptions_hook: Callable[[DataFrame], DataFrame] = check_model_assumptions,
) -> tuple[DataFrame, CategoryRegistry]:
    """Composed cleaning pipeline (reference ``.pipe`` chain, src/tasks.py:261-271).

    convert_dtypes ≈ parquet/inferred schema (already typed) →
    replace_na → column_wrangler → obj_wrangler → factor_wrangler →
    assumptions hook. Returns the cleaned frame plus the category
    registry (Spark has no CategoricalDtype; the registry carries
    levels + orderedness for encode/standardize stages).
    """
    df = replace_na(df, na_values)
    df = column_wrangler(df)
    df = obj_wrangler(df)
    df, registry = factor_wrangler(
        df,
        cat_cols=cat_cols,
        ordered_cols=ordered_cols,
        categories=categories,
        str_to_cat=str_to_cat,
        dummy_to_bool=dummy_to_bool,
    )
    return assumptions_hook(df), registry


class ValidationError(ValueError):
    """Raised by :func:`validate` when a rule is violated."""


def validate(
    df: DataFrame,
    not_null: Sequence[str] | None = None,
    unique: Sequence[str] | None = None,
    ranges: dict[str, tuple[float, float]] | None = None,
) -> DataFrame:
    """Concrete model-assumptions stage (the reference ships an identity
    placeholder hook, src/tasks.py:235-240; this is the real validator to
    plug into ``clean_data(assumptions_hook=...)``).

    All rules check in ONE aggregate pass (violation counts, not row
    collections); raises ``ValidationError`` naming every violated rule.
    Returns ``df`` unchanged on success, so it composes as a pipeline
    stage.
    """
    not_null = list(not_null or [])
    ranges = dict(ranges or {})
    aggs = []
    for c in not_null:
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"null__{c}"))
    for c, (lo, hi) in ranges.items():
        aggs.append(
            F.sum(
                F.when((F.col(c) < lo) | (F.col(c) > hi), 1).otherwise(0)
            ).alias(f"range__{c}")
        )
    if unique:
        aggs.append(F.count(F.lit(1)).alias("__total"))
        aggs.append(F.count_distinct(*[F.col(c) for c in unique]).alias("__distinct"))
    problems = []
    if aggs:
        row = df.agg(*aggs).first()
        for c in not_null:
            n = row[f"null__{c}"] or 0
            if n:
                problems.append(f"{c}: {n} NULLs")
        for c in ranges:
            n = row[f"range__{c}"] or 0
            if n:
                problems.append(f"{c}: {n} values outside {ranges[c]}")
        if unique and row["__total"] != row["__distinct"]:
            problems.append(
                f"key {tuple(unique)}: {row['__total'] - row['__distinct']} duplicate rows"
            )
    if problems:
        raise ValidationError("; ".join(problems))
    return df
