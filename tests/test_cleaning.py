"""replace_na + clean_data composition (reference src/tasks.py:100-108, 243-272)."""

from pyspark.sql import functions as F

from simple_data_workflow_spark.operators.cleaning import clean_data, replace_na


def test_replace_na_strings_and_numbers(spark):
    df = spark.createDataFrame(
        [("n/a", 1.0), ("x", -999.0), ("NULL", 2.0)], ["s", "v"]
    )
    out = replace_na(df, ["n/a", "NULL", -999])
    rows = out.collect()
    assert rows[0]["s"] is None
    assert rows[1]["v"] is None
    assert rows[2]["s"] is None
    assert rows[1]["s"] == "x"


def test_replace_na_subset_only(spark):
    df = spark.createDataFrame([("n/a", "n/a")], ["a", "b"])
    out = replace_na(df, ["n/a"], subset=["a"]).first()
    assert out["a"] is None and out["b"] == "n/a"


def test_clean_data_composition(spark):
    df = spark.createDataFrame(
        [(" A ", 0, "n/a"), ("b", 1, "ok"), ("b", 1, "ok")],
        ["  Raw COL ", "war", "status"],
    )
    out, registry = clean_data(df, na_values=["n/a"])
    assert out.columns == ["raw_col", "war", "status"]
    assert dict(out.dtypes)["war"] == "boolean"  # dummy → bool
    assert registry.is_cat("status")  # str_to_cat default
    assert out.where(F.col("status").isNull()).count() == 1


def test_validate_passes_and_composes(spark):
    from simple_data_workflow_spark.operators.cleaning import validate

    df = spark.createDataFrame([(1, 5.0), (2, 7.0)], "id long, v double")
    out = validate(df, not_null=["id", "v"], unique=["id"], ranges={"v": (0, 10)})
    assert out is df


def test_validate_reports_all_violations(spark):
    import pytest

    from simple_data_workflow_spark.operators.cleaning import ValidationError, validate

    df = spark.createDataFrame(
        [(1, 5.0), (1, None), (2, 99.0)], "id long, v double"
    )
    with pytest.raises(ValidationError) as exc:
        validate(df, not_null=["v"], unique=["id"], ranges={"v": (0, 10)})
    msg = str(exc.value)
    assert "v: 1 NULLs" in msg and "outside" in msg and "duplicate" in msg


def test_validate_as_pipeline_hook(spark):
    """validate plugs into clean_data's assumptions stage (the reference's
    placeholder hook made concrete)."""
    import functools

    import pytest

    from simple_data_workflow_spark.operators.cleaning import (
        ValidationError,
        clean_data,
        validate,
    )

    df = spark.createDataFrame([(1, -5.0), (2, 7.0)], "id long, v double")
    hook = functools.partial(validate, not_null=["id"], ranges={"v": (0, 10)})
    with pytest.raises(ValidationError):
        clean_data(df, str_to_cat=False, dummy_to_bool=False, assumptions_hook=hook)
