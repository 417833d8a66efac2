"""Incremental materialized aggregate views over tablelog tables."""

import pytest
from pyspark.sql import functions as F

from simple_data_workflow_spark.sources.matview import refresh_aggregate_view
from simple_data_workflow_spark.sources.tablelog import (
    table_commit,
    table_read,
)


def _full_agg(spark, src):
    return {
        (r["g"],): (r["cnt"], r["sum_v"], r["min_v"], r["max_v"])
        for r in table_read(spark, src)
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("v").alias("sum_v"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
        )
        .collect()
    }


def _view(spark, path):
    return {
        (r["g"],): (r["cnt"], r["sum_v"], r["min_v"], r["max_v"])
        for r in table_read(spark, path).collect()
    }


def test_refresh_matches_full_aggregate_across_appends(spark, tmp_path):
    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    table_commit(
        spark.range(0, 100).selectExpr("id % 5 as g", "id * 1.0 as v"), src
    )
    refresh_aggregate_view(
        spark, src, view, ["g"], sum_cols=["v"], min_cols=["v"], max_cols=["v"]
    )
    assert _view(spark, view) == _full_agg(spark, src)
    # two more appends, one refresh folding both
    table_commit(spark.range(100, 150).selectExpr("id % 5 as g", "id * 1.0 as v"), src)
    table_commit(spark.range(150, 160).selectExpr("id % 5 as g", "id * 1.0 as v"), src)
    v = refresh_aggregate_view(
        spark, src, view, ["g"], sum_cols=["v"], min_cols=["v"], max_cols=["v"]
    )
    assert _view(spark, view) == _full_agg(spark, src)
    # no new source data: refresh is a version no-op (exactly-once)
    assert refresh_aggregate_view(
        spark, src, view, ["g"], sum_cols=["v"], min_cols=["v"], max_cols=["v"]
    ) == v
    assert _view(spark, view) == _full_agg(spark, src)


def test_refresh_reads_only_new_data(spark, tmp_path):
    """Proof of incrementality: after the cursor advances, physically
    delete the consumed source data files — the next refresh (new
    appends only) must still succeed and stay correct."""
    import os

    src = str(tmp_path / "src2")
    view = str(tmp_path / "view2")
    table_commit(spark.range(0, 60).selectExpr("id % 3 as g", "id * 1.0 as v"), src)
    refresh_aggregate_view(spark, src, view, ["g"], sum_cols=["v"])
    consumed = [f for f in os.listdir(f"{src}/data") if f.endswith(".parquet")]
    for f in consumed:
        os.unlink(f"{src}/data/{f}")
    table_commit(spark.range(60, 90).selectExpr("id % 3 as g", "id * 1.0 as v"), src)
    refresh_aggregate_view(spark, src, view, ["g"], sum_cols=["v"])
    got = {r["g"]: (r["cnt"], r["sum_v"]) for r in table_read(spark, view).collect()}
    want = {g: (30, float(sum(i for i in range(90) if i % 3 == g)))
            for g in range(3)}
    assert got == want


def test_refresh_rejects_source_rewrites(spark, tmp_path):
    """DML on the source would double-count under blind folding — the
    refresh must surface table_changes' rewrite error instead."""
    from simple_data_workflow_spark.sources.tablelog import table_delete_where

    src = str(tmp_path / "src3")
    view = str(tmp_path / "view3")
    table_commit(spark.range(0, 50).selectExpr("id % 2 as g", "id * 1.0 as v"), src)
    refresh_aggregate_view(spark, src, view, ["g"], sum_cols=["v"])
    table_delete_where(spark, src, "v < 10")
    with pytest.raises(ValueError, match="allow_rewrites"):
        refresh_aggregate_view(spark, src, view, ["g"], sum_cols=["v"])
