"""MERGE upsert + SCD2 emulation."""

import datetime as dt

from pyspark.sql import functions as F

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


def test_scd2_build_chains_versions(spark):
    t = lambda m: dt.datetime(2024, m, 1)  # noqa: E731
    log = spark.createDataFrame(
        [
            (1, t(1), 10, "bronze"),
            (1, t(3), 11, "silver"),
            (1, t(3), 12, "gold"),  # same-instant: larger tie-break wins
            (2, t(2), 20, "bronze"),
        ],
        "id long, ts timestamp, seq long, tier string",
    )
    from simple_data_workflow_spark.operators.cdc import scd2_build

    out = {
        (r["id"], r["valid_from"]): (r["valid_to"], r["is_current"], r["tier"])
        for r in scd2_build(log, "id", "ts", tie_break="seq").collect()
    }
    assert out == {
        (1, t(1)): (t(3), False, "bronze"),
        (1, t(3)): (None, True, "gold"),
        (2, t(2)): (None, True, "bronze"),
    }


def test_temporal_join_picks_version_at_ts(spark):
    t = lambda m: dt.datetime(2024, m, 1)  # noqa: E731
    dim = spark.createDataFrame(
        [
            (1, t(1), t(3), False, "bronze"),
            (1, t(3), None, True, "gold"),
        ],
        "id long, valid_from timestamp, valid_to timestamp, is_current boolean, tier string",
    )
    facts = spark.createDataFrame(
        [
            (100, 1, t(2)),             # inside the closed interval
            (101, 1, t(3)),             # boundary: start inclusive
            (102, 1, t(5)),             # open row
            (103, 1, dt.datetime(2023, 12, 1)),  # before history
            (104, 9, t(2)),             # unknown key
        ],
        "fact_id long, id long, ts timestamp",
    )
    from simple_data_workflow_spark.operators.cdc import temporal_join

    inner = {
        r["fact_id"]: r["tier"]
        for r in temporal_join(facts, dim, "id", "ts").collect()
    }
    assert inner == {100: "bronze", 101: "gold", 102: "gold"}
    left = temporal_join(facts, dim, "id", "ts", how="left").collect()
    assert len(left) == 5  # unmatched facts survive with NULL dim cols
    assert {r["fact_id"] for r in left if r["tier"] is None} == {103, 104}


def test_incremental_agg_matches_recompute(spark):
    from simple_data_workflow_spark.operators.cdc import incremental_agg_apply

    base = spark.createDataFrame(
        [("a", 10), ("a", 20), ("b", 5), ("c", 7)], "g string, v long"
    )
    state = base.groupBy("g").agg(
        F.sum("v").alias("sum_val"), F.count(F.lit(1)).alias("n_rows")
    )
    # I into new group d; U of a 20→25; D of c 7 (group c disappears);
    # move b 5 from b to a = D(b) + I(a)
    cdc = spark.createDataFrame(
        [
            ("d", "I", None, 3),
            ("a", "U", 20, 25),
            ("c", "D", 7, None),
            ("b", "D", 5, None),
            ("a", "I", None, 5),
        ],
        "g string, op string, old_val long, new_val long",
    )
    out = {
        r["g"]: (r["sum_val"], r["n_rows"])
        for r in incremental_agg_apply(state, cdc, ["g"]).collect()
    }
    # recompute: a = 10+25+5 (n=3), d = 3 (n=1); b and c gone
    assert out == {"a": (40, 3), "d": (3, 1)}


def test_merge_upsert_key_only_updates(spark):
    """A batch carrying ONLY the key column must still merge (dedupe by
    distinct) instead of failing analysis on an order-less window."""
    from simple_data_workflow_spark.operators.cdc import merge_upsert

    target = spark.createDataFrame([(1,), (2,)], "id long")
    updates = spark.createDataFrame([(2,), (2,), (3,)], "id long")
    got = {r["id"] for r in merge_upsert(target, updates, "id").collect()}
    assert got == {1, 2, 3}
