"""MERGE upsert + SCD2 emulation."""

import datetime as dt

from simple_data_workflow_spark.operators.cdc import merge_upsert, scd2_apply


def test_merge_upsert(spark):
    target = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id long, v string")
    updates = spark.createDataFrame([(2, "B"), (4, "D")], "id long, v string")
    out = {r["id"]: r["v"] for r in merge_upsert(target, updates, "id").collect()}
    assert out == {1: "a", 2: "B", 3: "c", 4: "D"}


def test_merge_upsert_dup_updates_deterministic(spark):
    target = spark.createDataFrame([(1, "a")], "id long, v string")
    updates = spark.createDataFrame([(1, "x"), (1, "z"), (1, "y")], "id long, v string")
    out = merge_upsert(target, updates, "id").collect()
    assert len(out) == 1 and out[0]["v"] == "z"  # desc sort of attrs → 'z'


def test_scd2_apply(spark):
    t0 = dt.datetime(2024, 1, 1)
    t1 = dt.datetime(2024, 6, 1)
    dim = spark.createDataFrame(
        [
            (1, t0, None, True, "NYC"),
            (2, t0, None, True, "LA"),
            (3, dt.datetime(2023, 1, 1), t0, False, "SF-old"),
            (3, t0, None, True, "SF"),
        ],
        "id long, valid_from timestamp, valid_to timestamp, is_current boolean, city string",
    )
    changes = spark.createDataFrame([(1, t1, "BOS")], "id long, ts timestamp, city string")
    out = scd2_apply(dim, changes, key="id", ts_col="ts")
    rows = sorted(
        ((r["id"], r["city"], r["is_current"], r["valid_to"]) for r in out.collect())
    )
    # id=1: old row closed at t1, new BOS row open
    assert (1, "NYC", False, t1) in rows
    assert (1, "BOS", True, None) in rows
    # untouched keys: open row stays open, history stays closed
    assert (2, "LA", True, None) in rows
    assert (3, "SF", True, None) in rows
    assert (3, "SF-old", False, t0) in rows
    assert len(rows) == 5
