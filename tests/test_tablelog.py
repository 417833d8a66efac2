"""Transaction-log table format: atomic commits, time travel, vacuum."""

from simple_data_workflow_spark.sources.tablelog import (
    table_commit,
    table_history,
    table_read,
    table_vacuum,
)


def test_append_overwrite_time_travel(spark, tmp_path):
    t = str(tmp_path / "t")
    v0 = table_commit(spark.range(0, 10).selectExpr("id", "id*2 as v"), t)
    v1 = table_commit(spark.range(10, 15).selectExpr("id", "id*2 as v"), t)
    v2 = table_commit(
        spark.range(100, 103).selectExpr("id", "id*2 as v"), t, mode="overwrite"
    )
    assert (v0, v1, v2) == (0, 1, 2)
    # latest = post-overwrite snapshot
    assert {r["id"] for r in table_read(spark, t).collect()} == {100, 101, 102}
    # time travel: v1 = both appends, v0 = first alone
    assert table_read(spark, t, version=1).count() == 15
    assert table_read(spark, t, version=0).count() == 10
    hist = table_history(spark, t)
    assert [h["version"] for h in hist] == [0, 1, 2]
    assert [h["action"] for h in hist] == ["append", "append", "overwrite"]


def test_unreferenced_staging_invisible_and_vacuumed(spark, tmp_path):
    t = str(tmp_path / "t2")
    table_commit(spark.range(0, 5).selectExpr("id"), t)
    # simulate a writer dying after staging data but before the log
    # commit: stage a parquet file directly into data/
    spark.range(90, 99).selectExpr("id").write.parquet(f"{t}/data/orphan")
    import os

    os.rename(
        f"{t}/data/orphan/" + next(
            f for f in os.listdir(f"{t}/data/orphan") if f.endswith(".parquet")
        ),
        f"{t}/data/deadbeef.parquet",
    )
    # invisible to reads (log never referenced it)
    assert table_read(spark, t).count() == 5
    removed = table_vacuum(spark, t)
    assert removed >= 1
    assert table_read(spark, t).count() == 5  # referenced files untouched


def test_commit_race_retries_to_next_slot(spark, tmp_path):
    t = str(tmp_path / "t3")
    table_commit(spark.range(0, 3).selectExpr("id"), t)
    # occupy the next slot to force the optimistic-concurrency retry
    import json
    import os

    os.makedirs(f"{t}/_log", exist_ok=True)
    with open(f"{t}/_log/00000001.json", "w") as f:
        json.dump({"action": "append", "files": [], "schema": "struct<id:bigint>"}, f)
    v = table_commit(spark.range(3, 6).selectExpr("id"), t)
    assert v == 2  # lost the race for slot 1, won slot 2
    assert table_read(spark, t).count() == 6


def test_table_merge_upsert_atomic_snapshot(spark, tmp_path):
    from simple_data_workflow_spark.sources.tablelog import table_merge_upsert

    t = str(tmp_path / "t4")
    table_commit(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"), t
    )
    v = table_merge_upsert(
        spark, t, spark.createDataFrame([(2, "B"), (3, "C")], "id long, v string"), "id"
    )
    assert {(r["id"], r["v"]) for r in table_read(spark, t).collect()} == {
        (1, "a"), (2, "B"), (3, "C"),
    }
    # pre-merge snapshot still readable (time travel across the merge)
    assert {(r["id"], r["v"]) for r in table_read(spark, t, version=v - 1).collect()} == {
        (1, "a"), (2, "b"),
    }


def test_append_schema_drift_rejected(spark, tmp_path):
    import pytest

    from simple_data_workflow_spark.sources.tablelog import table_commit

    t = str(tmp_path / "t5")
    table_commit(spark.createDataFrame([(1, "a")], "id long, v string"), t)
    with pytest.raises(TypeError, match="schema drift"):
        table_commit(spark.createDataFrame([(2,)], "id long"), t)
    # an explicit overwrite with the new schema is the sanctioned path
    v = table_commit(
        spark.createDataFrame([(2,)], "id long"), t, mode="overwrite"
    )
    assert v == 1


def test_table_compact_atomic(spark, tmp_path):
    from simple_data_workflow_spark.sources.tablelog import (
        table_compact,
        table_vacuum,
    )

    t = str(tmp_path / "t6")
    for i in range(5):  # 5 fragmented commits
        table_commit(
            spark.range(i * 10, (i + 1) * 10).selectExpr("id").repartition(4), t
        )
    pre_files = len(
        [f for f in __import__("os").listdir(f"{t}/data") if f.endswith(".parquet")]
    )
    v = table_compact(spark, t, target_file_mb=128)
    assert table_read(spark, t).count() == 50
    # pre-compaction snapshot still time-travelable until vacuum
    assert table_read(spark, t, version=v - 1).count() == 50
    hist = table_history(spark, t)
    assert hist[-1]["action"] == "overwrite" and hist[-1]["n_files"] < pre_files
    table_vacuum(spark, t)
    assert table_read(spark, t).count() == 50


def test_table_delete_where(spark, tmp_path):
    from simple_data_workflow_spark.sources.tablelog import table_delete_where

    t = str(tmp_path / "t7")
    table_commit(spark.range(0, 100).selectExpr("id", "id % 3 as g"), t)
    v = table_delete_where(spark, t, "g = 1")
    assert table_read(spark, t).count() == 67
    assert table_read(spark, t).where("g = 1").count() == 0
    # pre-delete snapshot intact (GDPR note: physical removal needs
    # log truncation + vacuum; logical deletion is immediate)
    assert table_read(spark, t, version=v - 1).count() == 100


def test_truncate_history_then_vacuum_reclaims(spark, tmp_path):
    import os

    from simple_data_workflow_spark.sources.tablelog import (
        table_truncate_history,
        table_vacuum,
    )

    t = str(tmp_path / "t8")
    for i in range(4):
        table_commit(spark.range(i * 10, (i + 1) * 10).selectExpr("id"), t)
    table_commit(spark.range(500, 505).selectExpr("id"), t, mode="overwrite")
    pre = len([f for f in os.listdir(f"{t}/data") if f.endswith(".parquet")])
    assert table_vacuum(spark, t) == 0  # everything still referenced
    removed_log = table_truncate_history(spark, t, keep_last=1)
    assert removed_log == 4
    reclaimed = table_vacuum(spark, t)
    assert reclaimed > 0 and reclaimed <= pre
    assert {r["id"] for r in table_read(spark, t).collect()} == set(range(500, 505))


def test_truncate_keeps_append_snapshot_self_contained(spark, tmp_path):
    from simple_data_workflow_spark.sources.tablelog import (
        table_truncate_history,
        table_vacuum,
    )

    t = str(tmp_path / "t9")
    table_commit(spark.range(0, 10).selectExpr("id"), t)
    table_commit(spark.range(10, 20).selectExpr("id"), t)  # append depends on v0
    table_truncate_history(spark, t, keep_last=1)
    table_vacuum(spark, t)
    # the kept append was rewritten self-contained: full 20 rows survive
    assert table_read(spark, t).count() == 20


def test_table_update_where(spark, tmp_path):
    from simple_data_workflow_spark.sources.tablelog import table_update_where

    t = str(tmp_path / "t10")
    table_commit(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0)],
            "id long, g string, v double",
        ),
        t,
    )
    v = table_update_where(spark, t, {"v": "v * 2"}, "g = 'a'")
    got = {r["id"]: r["v"] for r in table_read(spark, t).collect()}
    assert got == {1: 20.0, 2: 20.0, 3: 60.0}
    # pre-update snapshot auditable
    assert {r["id"]: r["v"] for r in table_read(spark, t, version=v - 1).collect()} == {
        1: 10.0, 2: 20.0, 3: 30.0,
    }
