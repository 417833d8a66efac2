"""GROUPED_AGG UDAF surface: the weighted-median UDAF must agree
exactly with its window-cumsum SQL formulation — the documented rewrite
for groups too large to materialize in one pandas batch (the registered
driver query uses the UDAF only in its designed regime: many small
groups, ``plans/relational.py::weighted_median_price``)."""

from pyspark.sql import functions as F


def _window_weighted_median(df, grp, val, wgt):
    from pyspark.sql.window import Window

    w_cum = (
        Window.partitionBy(grp)
        .orderBy(val, "rid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy(grp)
    cw = df.withColumn("cum", F.sum(wgt).over(w_cum)).withColumn(
        "tot", F.sum(wgt).over(w_tot)
    )
    return (
        cw.where(F.col("cum") >= F.col("tot") / 2.0)
        .groupBy(grp)
        .agg(F.min(val).alias("wm"))
    )


def test_udaf_matches_window_formulation_including_giant_group(spark):
    from simple_data_workflow_spark.functions.aggregates import weighted_median_udaf

    # one giant group + many small ones: the UDAF is only *deployed* on
    # the small-group regime, but its semantics must hold on both
    df = spark.range(0, 20_000).selectExpr(
        "id as rid",
        "CASE WHEN id < 10000 THEN 'giant' ELSE concat('g', id % 500) END AS grp",
        "cast(hash(id) % 1000 as double) as val",
        "cast(1 + pmod(hash(id, 7), 5) as double) as wgt",
    )
    wm = weighted_median_udaf()
    got = {
        r["grp"]: r["wm"]
        for r in df.groupBy("grp").agg(wm("val", "wgt").alias("wm")).collect()
    }
    want = {
        r["grp"]: r["wm"]
        for r in _window_weighted_median(df, "grp", "val", "wgt").collect()
    }
    assert got == want and len(got) == 501


def test_udaf_single_row_and_tied_weights(spark):
    from simple_data_workflow_spark.functions.aggregates import weighted_median_udaf

    df = spark.createDataFrame(
        [("a", 5.0, 1.0), ("b", 1.0, 1.0), ("b", 2.0, 1.0)],
        "grp string, val double, wgt double",
    )
    wm = weighted_median_udaf()
    got = {
        r["grp"]: r["wm"]
        for r in df.groupBy("grp").agg(wm("val", "wgt").alias("wm")).collect()
    }
    # lower weighted median: first value whose cumulative weight
    # reaches half the total (b: cum(1.0)=1 >= 2/2)
    assert got == {"a": 5.0, "b": 1.0}
