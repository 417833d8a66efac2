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


def test_cursor_survives_compaction_and_history_truncation(spark, tmp_path):
    """The round-7 hazard: refresh → compact → truncate_history leaves
    only maintenance entries on the view, and before round 8 the
    truncation checkpoint did not carry ``src_version`` — the cursor
    reset to -1 and the next refresh silently re-folded the ENTIRE
    source into state that already contained it. Now the cursor rides
    through checkpoints, so the refresh after truncation folds only
    the genuinely-new append."""
    from simple_data_workflow_spark.sources.tablelog import (
        table_compact,
        table_truncate_history,
    )

    src = str(tmp_path / "src4")
    view = str(tmp_path / "view4")
    table_commit(spark.range(0, 80).selectExpr("id % 4 as g", "id * 1.0 as v"), src)
    refresh_aggregate_view(
        spark, src, view, ["g"], sum_cols=["v"], min_cols=["v"], max_cols=["v"]
    )
    table_compact(spark, view, num_files=1)
    removed = table_truncate_history(spark, view, keep_last=1)
    assert removed >= 1  # the cursor-bearing refresh entry is GONE
    table_commit(spark.range(80, 120).selectExpr("id % 4 as g", "id * 1.0 as v"), src)
    refresh_aggregate_view(
        spark, src, view, ["g"], sum_cols=["v"], min_cols=["v"], max_cols=["v"]
    )
    assert _view(spark, view) == _full_agg(spark, src)


def test_refresh_raises_when_cursor_genuinely_lost(spark, tmp_path):
    """A view-shaped table WITH aggregate rows but WITHOUT any
    src_version anywhere (legacy layout / foreign table) must refuse
    to refresh — folding the whole source into existing state is the
    double-count the cursor design exists to prevent."""
    from simple_data_workflow_spark.sources.matview import ViewCursorLost

    src = str(tmp_path / "src5")
    view = str(tmp_path / "view5")
    table_commit(spark.range(0, 20).selectExpr("id % 2 as g", "id * 1.0 as v"), src)
    # hand-built "view" state with no cursor marker
    table_commit(
        spark.createDataFrame(
            [(0, 10, 90.0, 0.0, 18.0)], "g long, cnt long, sum_v double, "
            "min_v double, max_v double"
        ),
        view,
    )
    with pytest.raises(ViewCursorLost):
        refresh_aggregate_view(spark, src, view, ["g"], sum_cols=["v"],
                               min_cols=["v"], max_cols=["v"])


def test_refresh_folds_source_dml_exactly(spark, tmp_path):
    """Round 8: DML on the source no longer dead-ends the view — the
    row-level change feed surfaces delete preimages and the refresh
    folds them with negative sign, matching the full recompute for the
    invertible aggregates (count/sum)."""
    from simple_data_workflow_spark.sources.tablelog import (
        table_delete_where,
        table_update_where,
    )

    src = str(tmp_path / "src3")
    view = str(tmp_path / "view3")
    table_commit(spark.range(0, 50).selectExpr("id % 2 as g", "id * 1.0 as v"), src)
    refresh_aggregate_view(spark, src, view, ["g"], sum_cols=["v"])
    table_delete_where(spark, src, "v < 10")
    table_update_where(spark, src, {"v": "v + 100"}, "v >= 40")
    table_commit(spark.range(50, 60).selectExpr("id % 2 as g", "id * 1.0 as v"), src)
    refresh_aggregate_view(spark, src, view, ["g"], sum_cols=["v"])
    got = {r["g"]: (r["cnt"], r["sum_v"]) for r in table_read(spark, view).collect()}
    want = {
        r["g"]: (r["cnt"], r["sum_v"])
        for r in table_read(spark, src)
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("v").alias("sum_v"))
        .collect()
    }
    assert got == want and got


def test_refresh_dml_deleting_whole_group_drops_it(spark, tmp_path):
    """A group whose rows are all deleted must vanish from the view,
    exactly as it is absent from the full recompute."""
    from simple_data_workflow_spark.sources.tablelog import table_delete_where

    src = str(tmp_path / "src6")
    view = str(tmp_path / "view6")
    table_commit(spark.range(0, 30).selectExpr("id % 3 as g", "id * 1.0 as v"), src)
    refresh_aggregate_view(spark, src, view, ["g"], sum_cols=["v"])
    table_delete_where(spark, src, "g = 1")
    refresh_aggregate_view(spark, src, view, ["g"], sum_cols=["v"])
    got = {r["g"] for r in table_read(spark, view).collect()}
    assert got == {0, 2}


def test_refresh_minmax_under_deletes_partial_recompute(spark, tmp_path):
    """min/max are not invertible under deletes — the refresh must
    partially RECOMPUTE the delete-affected groups from the source
    (bounded by a semi-join on their keys) while untouched groups fold
    incrementally, and the result must equal the full recompute. The
    deletes here remove each group's current MIN and one whole group,
    the two shapes signed folding cannot handle."""
    from simple_data_workflow_spark.sources.tablelog import table_delete_where

    src = str(tmp_path / "src7")
    view = str(tmp_path / "view7")
    table_commit(spark.range(0, 40).selectExpr("id % 4 as g", "id * 1.0 as v"), src)
    refresh_aggregate_view(
        spark, src, view, ["g"], sum_cols=["v"], min_cols=["v"], max_cols=["v"]
    )
    # delete the minima of groups 0 and 1, and ALL of group 2
    table_delete_where(spark, src, "v < 8 OR g = 2")
    # also an append in the same pending range: folds together
    table_commit(spark.range(40, 60).selectExpr("id % 4 as g", "id * 1.0 as v"), src)
    refresh_aggregate_view(
        spark, src, view, ["g"], sum_cols=["v"], min_cols=["v"], max_cols=["v"]
    )
    assert _view(spark, view) == _full_agg(spark, src)
    got_groups = {k[0] for k in _view(spark, view)}
    assert got_groups == {0, 1, 2, 3}  # group 2 re-created by the append


def test_refresh_minmax_fully_deleted_group_vanishes(spark, tmp_path):
    """A min/max view group whose source rows are all deleted (and not
    re-inserted) must vanish from the view after the refresh."""
    from simple_data_workflow_spark.sources.tablelog import table_delete_where

    src = str(tmp_path / "src8")
    view = str(tmp_path / "view8")
    table_commit(spark.range(0, 30).selectExpr("id % 3 as g", "id * 1.0 as v"), src)
    refresh_aggregate_view(spark, src, view, ["g"], min_cols=["v"], max_cols=["v"])
    table_delete_where(spark, src, "g = 1")
    refresh_aggregate_view(spark, src, view, ["g"], min_cols=["v"], max_cols=["v"])
    got = {r["g"] for r in table_read(spark, view).collect()}
    assert got == {0, 2}
