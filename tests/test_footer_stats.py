"""Commit-time stats: the parquet-footer harvest must record EXACTLY
what the distributed aggregate records (round-13 optimization — the
one-aggregate second read of every staged byte became a metadata-sized
driver-side footer pass; guide §1.2/§6).

Parity is the safety property: pruning evidence that differed between
the two paths could prune (or keep) different file sets depending on
which path a deployment takes.
"""

from __future__ import annotations

import datetime
import tempfile
from decimal import Decimal

from pyspark.sql import functions as F

import simple_data_workflow_spark.sources.tablelog as tl


def _mixed_df(spark):
    rows = []
    for i in range(2000):
        rows.append(
            (
                i,
                float(i) * 1.5 if i % 7 else float("nan"),
                f"s{i:04d}" if i % 5 else ("x" * 80),  # >64-char strings drop
                datetime.date(2024, 1 + (i % 12), 1 + (i % 28)),
                datetime.datetime(2024, 3, 1, 12, 0, 0)
                + datetime.timedelta(minutes=i),
                None if i % 3 == 0 else i * 10,
                Decimal("1234.5678") + i,
                "A" if i % 2 else "B",
            )
        )
    df = spark.createDataFrame(
        rows,
        "id long, x double, s string, d date, ts timestamp, n long, "
        "dec decimal(20,6), part string",
    )
    return df.withColumn("allnull", F.lit(None).cast("double"))


def test_footer_harvest_matches_spark_aggregate(spark):
    t = tempfile.mkdtemp() + "/t"
    files = tl._stage_data_files(_mixed_df(spark).repartition(4), t)
    for pby in (
        None,
        ["part"],
        ["bucket(4, id)", "days(ts)"],
        ["truncate(2, s)"],
        ["months(d)"],
        ["hours(ts)"],
    ):
        a = tl._footer_harvest(t, files, pby, None)
        b = tl._collect_stats_spark(spark, t, files, partition_cols=pby)
        assert a is not None, f"footer harvest unexpectedly fell back: {pby}"
        assert a == b, f"stats divergence for partition_by={pby}"


def test_footer_harvest_falls_back_on_nonlocal_scheme():
    assert tl._local_fs_path("s3://bucket/x.parquet") is None
    assert tl._local_fs_path("/tmp/x.parquet") == "/tmp/x.parquet"
    assert tl._local_fs_path("file:///tmp/x.parquet") == "/tmp/x.parquet"


def test_commit_stats_prune_after_footer_harvest(spark, tmp_path):
    """End-to-end: a committed table's stats (footer-harvested) still
    drive file pruning in table_scan."""
    t = str(tmp_path / "t")
    df = spark.range(0, 1000).selectExpr("id", "id % 10 as k")
    tl.table_commit(df.repartitionByRange(4, "id"), t)
    pruned = tl.table_scan(spark, t, filters=[("id", "<", 10)])
    assert pruned.count() == 10
    # range clustering means the id<10 filter proves 3 of 4 files out
    state = tl._resolve_state(spark, t, None)
    kept = tl._stats_prune(state["stats"], state["files"], [("id", "<", 10)])
    assert len(kept) < len(state["files"])
