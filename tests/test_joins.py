"""As-of join operator (union+window technique)."""

import datetime as dt

from simple_data_workflow_spark.operators.joins import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_basic(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01T10:00")),
            (2, "u1", _ts("2024-01-01T12:00")),
            (3, "u2", _ts("2024-01-01T09:00")),
        ],
        "id long, key string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01T09:30"), 100, 1.0),
            ("u1", _ts("2024-01-01T11:00"), 101, 2.0),
            ("u2", _ts("2024-01-01T11:00"), 102, 3.0),
        ],
        "key string, rts timestamp, rid long, val double",
    )
    out = asof_join(
        left, right, on="key", left_ts="ts", right_ts="rts",
        right_payload=["val"], right_tiebreak="rid",
    )
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["val"] == 1.0  # 10:00 sees the 09:30 row
    assert rows[2]["val"] == 2.0  # 12:00 sees the 11:00 row
    assert rows[3]["val"] is None  # 09:00 precedes every u2 row
    assert rows[1]["rts_asof"] == _ts("2024-01-01T09:30")


def test_asof_equal_ts_and_tiebreak(spark):
    left = spark.createDataFrame(
        [(1, "u1", _ts("2024-01-01T10:00"))], "id long, key string, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01T10:00"), 1, 10.0),
            ("u1", _ts("2024-01-01T10:00"), 2, 20.0),
        ],
        "key string, rts timestamp, rid long, val double",
    )
    out = asof_join(
        left, right, on="key", left_ts="ts", right_ts="rts",
        right_payload=["val"], right_tiebreak="rid",
    ).first()
    # a right row AT the left timestamp is visible; highest tiebreak wins
    assert out["val"] == 20.0


def test_asof_forward(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01T10:00")),
            (2, "u1", _ts("2024-01-01T12:00")),
            (3, "u2", _ts("2024-01-01T12:00")),
        ],
        "id long, key string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01T09:30"), 100, 1.0),
            ("u1", _ts("2024-01-01T11:00"), 101, 2.0),
            ("u2", _ts("2024-01-01T11:00"), 102, 3.0),
        ],
        "key string, rts timestamp, rid long, val double",
    )
    out = asof_join(
        left, right, on="key", left_ts="ts", right_ts="rts",
        right_payload=["val"], right_tiebreak="rid", direction="forward",
    )
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["val"] == 2.0  # 10:00 sees the NEXT row at 11:00
    assert rows[2]["val"] is None  # nothing after 12:00 for u1
    assert rows[3]["val"] is None  # u2's only row precedes 12:00
    # a right row AT the left instant matches in forward direction too
    at = asof_join(
        left.where("id = 2"),
        right.where("rid = 101").withColumn("rts", F_lit_ts("2024-01-01T12:00")),
        on="key", left_ts="ts", right_ts="rts",
        right_payload=["val"], direction="forward",
    ).first()
    assert at["val"] == 2.0


def F_lit_ts(s):
    from pyspark.sql import functions as F

    return F.lit(_ts(s))


def test_asof_tolerance(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01T10:00")),
            (2, "u1", _ts("2024-01-01T12:00")),
        ],
        "id long, key string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u1", _ts("2024-01-01T09:30"), 100, 1.0)],
        "key string, rts timestamp, rid long, val double",
    )
    out = asof_join(
        left, right, on="key", left_ts="ts", right_ts="rts",
        right_payload=["val"], tolerance_s=3600,
    )
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["val"] == 1.0  # 30 min stale — within the hour bound
    assert rows[2]["val"] is None  # 2.5 h stale — nulled by tolerance
    assert rows[2]["rts_asof"] is None


def test_asof_tolerance_date_right(spark):
    """tolerance_s with a DATE-typed right ts: DATE cannot cast to double
    directly — the shared epoch helper must hop via TIMESTAMP."""
    import datetime as dt

    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-02T00:00")),
            (2, "u1", _ts("2024-01-10T00:00")),
        ],
        "id long, key string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u1", dt.date(2024, 1, 1), 1.0)],
        "key string, rts date, val double",
    )
    out = asof_join(
        left, right, on="key", left_ts="ts", right_ts="rts",
        right_payload=["val"], tolerance_s=2 * 86400,
    )
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["val"] == 1.0  # 1 day stale — within 2-day bound
    assert rows[2]["val"] is None  # 9 days stale — nulled


def test_asof_tolerance_both_ntz(spark):
    """tolerance_s with BOTH sides TIMESTAMP_NTZ: the unioned __ts stays
    NTZ (no coercion partner), which cannot cast to double directly."""
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01T10:00")),
            (2, "u1", _ts("2024-01-01T12:00")),
        ],
        "id long, key string, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [("u1", _ts("2024-01-01T09:30"), 1.0)],
        "key string, rts timestamp_ntz, val double",
    )
    out = asof_join(
        left, right, on="key", left_ts="ts", right_ts="rts",
        right_payload=["val"], tolerance_s=3600,
    )
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["val"] == 1.0
    assert rows[2]["val"] is None


def test_asof_tolerance_both_date(spark):
    """tolerance_s with BOTH sides DATE: unioned __ts stays DATE."""
    import datetime as dt

    left = spark.createDataFrame(
        [
            (1, "u1", dt.date(2024, 1, 2)),
            (2, "u1", dt.date(2024, 1, 10)),
        ],
        "id long, key string, d date",
    )
    right = spark.createDataFrame(
        [("u1", dt.date(2024, 1, 1), 1.0)],
        "key string, rd date, val double",
    )
    out = asof_join(
        left, right, on="key", left_ts="d", right_ts="rd",
        right_payload=["val"], tolerance_s=2 * 86400,
    )
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["val"] == 1.0
    assert rows[2]["val"] is None


def test_salted_join_equals_plain_join(spark):
    from simple_data_workflow_spark.operators.joins import salted_join

    left = spark.createDataFrame(
        [(i, "hot" if i % 3 else f"k{i}") for i in range(60)], "id long, key string"
    )
    right = spark.createDataFrame(
        [("hot", 1.0), ("k0", 2.0), ("k3", 3.0)], "key string, val double"
    )
    got = salted_join(left, right, "key", n_salts=4).select("id", "key", "val")
    want = left.join(right, "key").select("id", "key", "val")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_lakehouse_gated(spark):
    import pytest as _pytest

    from simple_data_workflow_spark.sources.lakehouse import read_table

    with _pytest.raises((NotImplementedError, Exception)):
        read_table(spark, "delta", "/tmp/nope")
    with _pytest.raises(ValueError):
        read_table(spark, "parquet-not-lakehouse", "/tmp/nope")


def test_interval_join_matches_naive(spark):
    import random

    from simple_data_workflow_spark.operators.joins import interval_join

    rng = random.Random(3)
    base = dt.datetime(2024, 1, 1)
    points = [
        (i, base + dt.timedelta(seconds=rng.randint(0, 7200))) for i in range(300)
    ]
    intervals = []
    for j in range(40):
        s = base + dt.timedelta(seconds=rng.randint(0, 7000))
        intervals.append((j, s, s + dt.timedelta(seconds=rng.randint(60, 900))))
    pts = spark.createDataFrame(points, "pid long, ts timestamp")
    ivs = spark.createDataFrame(intervals, "iid long, start timestamp, end timestamp")
    got = {
        (r["pid"], r["iid"])
        for r in interval_join(pts, ivs, "ts", "start", "end", chunk_seconds=300).collect()
    }
    naive = {
        (p, i)
        for p, t in points
        for i, s, e in intervals
        if s <= t < e
    }
    assert got == naive and len(got) > 0


def test_interval_overlap_join_matches_naive(spark):
    import random

    from simple_data_workflow_spark.operators.joins import interval_overlap_join

    rng = random.Random(7)
    base = dt.datetime(2024, 1, 1)

    def mk(n, max_len):
        out = []
        for j in range(n):
            s = base + dt.timedelta(seconds=rng.randint(0, 7000))
            out.append((j, s, s + dt.timedelta(seconds=rng.randint(0, max_len))))
        return out

    a = mk(60, 900)   # includes zero-length (empty) intervals
    b = mk(80, 400)
    da = spark.createDataFrame(a, "aid long, a_start timestamp, a_end timestamp")
    db = spark.createDataFrame(b, "bid long, b_start timestamp, b_end timestamp")
    got = {
        (r["aid"], r["bid"])
        for r in interval_overlap_join(
            da, db, "a_start", "a_end", "b_start", "b_end", chunk_seconds=300
        ).collect()
    }
    naive = {
        (i, j)
        for i, s1, e1 in a
        for j, s2, e2 in b
        if max(s1, s2) < min(e1, e2)  # non-empty intersection, half-open
    }
    assert got == naive and len(got) > 0
    # no duplicate pairs despite multi-chunk intersections
    rows = interval_overlap_join(
        da, db, "a_start", "a_end", "b_start", "b_end", chunk_seconds=60
    ).count()
    assert rows == len(naive)


def test_interval_join_boundaries(spark):
    from simple_data_workflow_spark.operators.joins import interval_join

    s = dt.datetime(2024, 1, 1, 10, 0, 0)
    e = dt.datetime(2024, 1, 1, 10, 5, 0, 200_000)  # sub-second end past a chunk cut
    ivs = spark.createDataFrame([(1, s, e)], "iid long, start timestamp, end timestamp")
    pts = spark.createDataFrame(
        [
            (1, s),                                          # == start: included
            (2, e),                                          # == end: excluded
            (3, dt.datetime(2024, 1, 1, 10, 5, 0, 100_000)), # inside, past chunk cut
            (4, s - dt.timedelta(microseconds=1)),           # just before
        ],
        "pid long, ts timestamp",
    )
    got = sorted(
        r["pid"] for r in interval_join(pts, ivs, "ts", "start", "end", chunk_seconds=300).collect()
    )
    assert got == [1, 3]
