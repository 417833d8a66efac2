"""Transforms + Gelman — goldens from reference test_tasks.py:473-641 (F6, F7)."""

import math

import pytest
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from simple_data_workflow_spark.operators.transforms import (
    exact_moments,
    gelman_standardize_data,
    transform_data,
)


def test_asinh_golden(spark):
    df = spark.createDataFrame(
        [(1.1, 1, "Do"), (2.2, 9, "not"), (3.3, 8, "select"), (4.4, 4, "me")],
        ["float_x", "int_x", "empty_x"],
    )
    out = transform_data(df, ["float_x", "int_x"], func="arcsinh")
    rows = out.collect()
    assert rows[0]["float_x"] == pytest.approx(math.asinh(1.1))
    assert rows[1]["int_x"] == pytest.approx(math.asinh(9))
    assert rows[0]["empty_x"] == "Do"  # unselected column unchanged
    assert dict(out.dtypes)["int_x"] == "double"  # int → double coercion


def test_log_na_propagates(spark):
    schema = StructType([StructField("nan_x", DoubleType())])
    df = spark.createDataFrame([(1.1,), (None,), (3.3,)], schema)
    out = transform_data(df, ["nan_x"], func="log")
    vals = [r["nan_x"] for r in out.collect()]
    assert vals[0] == pytest.approx(math.log(1.1))
    assert vals[1] is None


def test_log_zero_raises(spark):
    df = spark.createDataFrame([(0.0,), (1.1,)], ["zero_x"])
    with pytest.raises(ValueError, match="log"):
        transform_data(df, ["zero_x"], func="log")


def test_gelman_golden_f7(spark):
    schema = StructType(
        [
            StructField("row_id", LongType()),
            StructField("float_x", DoubleType()),
            StructField("int_x", LongType()),
            StructField("bool_x", BooleanType()),
            StructField("string_x", StringType()),
        ]
    )
    df = spark.createDataFrame(
        [
            (0, 2.2, 2, False, "a"),
            (1, 3.3, 3, False, "b"),
            (2, 1.1, 1, True, "c"),
            (3, 5.5, 4, True, "d"),
            (4, None, 5, False, "e"),
        ],
        schema,
    )
    out = gelman_standardize_data(df.drop("row_id")).collect()
    # bool: mean-centered only (F7 golden: [-0.4,-0.4,0.6-0.0?...])
    bools = [r["bool_x"] for r in out]
    assert bools == pytest.approx([-0.4, -0.4, 0.6, 0.6, -0.4])
    # numeric: (x - mean) / (2*stddev_samp); NA preserved
    import statistics

    vals = [2.2, 3.3, 1.1, 5.5]
    mu, sd = statistics.mean(vals), statistics.stdev(vals)
    floats = [r["float_x"] for r in out]
    assert floats[0] == pytest.approx((2.2 - mu) / (2 * sd))
    assert floats[4] is None
    # strings untouched
    assert [r["string_x"] for r in out] == ["a", "b", "c", "d", "e"]


def test_exact_moments_matches_stats(spark):
    import statistics

    vals = [1.25, 2.5, 3.75, 10.0, 7.125]
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    # small-magnitude values need a fine s2 scale (default 1 is sized for
    # money-scale columns where x² would overflow a scaled long partial)
    n, mu, sd = exact_moments(df, "x", s2_scale=1e6)
    assert n == 5
    assert mu == pytest.approx(statistics.mean(vals))
    assert sd == pytest.approx(statistics.stdev(vals))


def test_profile_columns_one_pass(spark):
    from simple_data_workflow_spark.operators.profiling import profile_columns

    df = spark.createDataFrame(
        [(1, None, 1.5), (2, "b", None), (2, "c", 2.5)],
        "k long, s string, v double",
    )
    out = {r["col_name"]: r.asDict() for r in profile_columns(df).collect()}
    assert out["k"]["n_rows"] == 3 and out["k"]["n_nulls"] == 0
    assert out["k"]["n_distinct"] == 2
    assert (out["k"]["min_value"], out["k"]["max_value"]) == ("1", "2")
    assert out["s"]["n_nulls"] == 1 and out["s"]["n_distinct"] == 2
    assert out["v"]["n_nulls"] == 1
    assert (out["v"]["min_value"], out["v"]["max_value"]) == ("1.5", "2.5")
    # approx mode still produces a sane profile (HLL, no Expand)
    approx = {r["col_name"]: r["n_distinct"] for r in profile_columns(df, exact=False).collect()}
    assert approx["k"] >= 1


def _final_plan(df):
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def test_scd2_build_single_exchange_plan(spark):
    """The SCD2 build's one-shuffle claim, pinned: dedupe lag-compare
    and lead() chaining must share one hash exchange (a row_number over
    (key, ts) would silently re-introduce a second one)."""
    import datetime as dt

    from simple_data_workflow_spark.operators.cdc import scd2_build

    log = spark.createDataFrame(
        [(i % 7, dt.datetime(2024, 1 + i % 11, 1), i, f"s{i}") for i in range(200)],
        "id long, ts timestamp, seq long, v string",
    )
    out = scd2_build(log, "id", "ts", tie_break="seq")
    out.count()
    plan = _final_plan(out)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("Window") == 2  # dedupe pass + chain pass, no re-sort between


def test_funnel_single_data_exchange_plan(spark):
    """funnel_conversion's collapsed shape, pinned: one hash exchange of
    the event stream (the windows + per-user agg share it) plus the
    single-row rollup — never the 3-aggregate + 2-join chain again."""
    from simple_data_workflow_spark.plans.relational import funnel_conversion

    out = funnel_conversion(spark, "/root/testdata/sf0.001")
    out.count()
    plan = _final_plan(out)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan
