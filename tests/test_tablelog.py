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
    removed = table_vacuum(spark, t, retention_hours=0)
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
    table_vacuum(spark, t, retention_hours=0)
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
    assert table_vacuum(spark, t, retention_hours=0) == 0  # everything still referenced
    removed_log = table_truncate_history(spark, t, keep_last=1)
    assert removed_log == 4
    reclaimed = table_vacuum(spark, t, retention_hours=0)
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
    table_vacuum(spark, t, retention_hours=0)
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


# ------------------------- round 7: file-granular DML, conflicts, checkpoints


def _data_files(t):
    import os

    return sorted(f for f in os.listdir(f"{t}/data") if f.endswith(".parquet"))


def test_delete_is_file_granular(spark, tmp_path):
    """A selective DELETE must rewrite ONLY the files containing
    matching rows: untouched files survive under their old names,
    byte-identical, and the log shows an add/remove delta commit."""
    import os

    from simple_data_workflow_spark.sources.tablelog import table_delete_where

    t = str(tmp_path / "fg1")
    # 4 separate appends -> 4+ data files with disjoint id ranges
    for i in range(4):
        table_commit(
            spark.range(i * 100, (i + 1) * 100).selectExpr("id", "id % 7 as g"), t
        )
    before = {
        f: os.path.getmtime(f"{t}/data/{f}") for f in _data_files(t)
    }
    sizes = {f: os.path.getsize(f"{t}/data/{f}") for f in before}
    v = table_delete_where(spark, t, "id between 150 and 160")
    after = set(_data_files(t))
    # every file except the one holding ids 100..199 survives unmodified
    survivors = set(before) & after
    assert len(survivors) >= len(before) - 1
    for f in survivors:
        assert os.path.getmtime(f"{t}/data/{f}") == before[f]
        assert os.path.getsize(f"{t}/data/{f}") == sizes[f]
    hist = table_history(spark, t)
    assert hist[-1]["action"] == "delta" and hist[-1]["op"] == "delete"
    assert 1 <= hist[-1]["n_removed"] <= len(before) - len(survivors) + 1
    # correctness + time travel across the delta
    assert table_read(spark, t).count() == 400 - 11
    assert table_read(spark, t, version=v - 1).count() == 400


def test_delete_null_condition_rows_survive(spark, tmp_path):
    from simple_data_workflow_spark.sources.tablelog import table_delete_where

    t = str(tmp_path / "fg2")
    table_commit(
        spark.createDataFrame(
            [(1, 10.0), (2, None), (3, 30.0)], "id long, v double"
        ),
        t,
    )
    table_delete_where(spark, t, "v > 20")
    # SQL DELETE semantics: NULL-condition rows are NOT deleted
    assert {r["id"] for r in table_read(spark, t).collect()} == {1, 2}


def test_update_is_file_granular(spark, tmp_path):
    import os

    from simple_data_workflow_spark.sources.tablelog import table_update_where

    t = str(tmp_path / "fg3")
    for i in range(3):
        table_commit(
            spark.range(i * 50, (i + 1) * 50).selectExpr("id", "id * 1.0 as v"), t
        )
    before = set(_data_files(t))
    table_update_where(spark, t, {"v": "v + 1000"}, "id >= 120")
    survivors = set(before) & set(_data_files(t))
    assert len(survivors) >= len(before) - 1  # only the 100..149 file rewritten
    got = {r["id"]: r["v"] for r in table_read(spark, t).collect()}
    assert got[0] == 0.0 and got[119] == 119.0 and got[120] == 1120.0
    hist = table_history(spark, t)
    assert hist[-1]["action"] == "delta" and hist[-1]["op"] == "update"


def test_merge_is_file_granular_and_inserts(spark, tmp_path):
    from simple_data_workflow_spark.sources.tablelog import table_merge_upsert

    t = str(tmp_path / "fg4")
    for i in range(3):
        table_commit(
            spark.range(i * 10, (i + 1) * 10).selectExpr(
                "id", "concat('v', id) as v"
            ),
            t,
        )
    before = set(_data_files(t))
    # update key 15 (middle file), insert key 99 (no file)
    table_merge_upsert(
        spark,
        t,
        spark.createDataFrame([(15, "UPDATED"), (99, "NEW")], "id long, v string"),
        "id",
    )
    survivors = set(before) & set(_data_files(t))
    assert len(survivors) >= len(before) - 1  # only the colliding file rewritten
    got = {r["id"]: r["v"] for r in table_read(spark, t).collect()}
    assert got[15] == "UPDATED" and got[99] == "NEW" and got[0] == "v0"
    assert len(got) == 31
    hist = table_history(spark, t)
    assert hist[-1]["action"] == "delta" and hist[-1]["op"] == "merge"


def test_concurrent_overwrite_conflict_detected(spark, tmp_path):
    import pytest

    from simple_data_workflow_spark.sources.tablelog import (
        ConcurrentWriteConflict,
    )

    t = str(tmp_path / "cw1")
    base = table_commit(spark.range(0, 10).selectExpr("id"), t)
    # a concurrent writer advances the table after our snapshot read
    table_commit(spark.range(10, 20).selectExpr("id"), t)
    with pytest.raises(ConcurrentWriteConflict):
        table_commit(
            spark.range(0, 5).selectExpr("id"), t, mode="overwrite", base=base
        )
    # blind overwrite (no read dependency) still goes through
    v = table_commit(spark.range(0, 5).selectExpr("id"), t, mode="overwrite")
    assert v == 2 and table_read(spark, t).count() == 5


def test_dml_conflict_on_interleaved_commit(spark, tmp_path):
    """A DML that raced a concurrent commit must raise, not silently
    discard the interleaved write (lost update)."""
    import pytest

    from simple_data_workflow_spark.sources.tablelog import (
        ConcurrentWriteConflict,
        _commit_entry,
        _resolve_state,
    )

    t = str(tmp_path / "cw2")
    table_commit(spark.range(0, 10).selectExpr("id"), t)
    state = _resolve_state(spark, t, None)  # DML reads its base snapshot
    table_commit(spark.range(10, 20).selectExpr("id"), t)  # interleaver
    entry = {
        "action": "delta",
        "add": [],
        "remove": [state["files"][0]],
        "schema": state["schema"],
        "base": state["version"],
        "op": "delete",
    }
    with pytest.raises(ConcurrentWriteConflict):
        _commit_entry(spark, t, entry, base=state["version"])
    # the interleaved append was preserved
    assert table_read(spark, t).count() == 20


def test_log_checkpointing_bounds_resolution(spark, tmp_path):
    """Every CHECKPOINT_INTERVAL commits a full-state checkpoint lands;
    snapshot resolution replays checkpoint + tail, and stays correct
    after the pre-checkpoint entries are truncated away."""
    import os

    from simple_data_workflow_spark.sources.tablelog import (
        CHECKPOINT_INTERVAL,
        table_truncate_history,
    )

    t = str(tmp_path / "ckpt")
    n = 2 * CHECKPOINT_INTERVAL + 5
    for i in range(n):
        table_commit(spark.range(i * 10, (i + 1) * 10).selectExpr("id"), t)
    cps = [f for f in os.listdir(f"{t}/_log") if f.endswith(".checkpoint.json")]
    assert len(cps) >= 2  # at versions 10 and 20
    assert table_read(spark, t).count() == n * 10
    assert table_read(spark, t, version=CHECKPOINT_INTERVAL).count() == (
        CHECKPOINT_INTERVAL + 1
    ) * 10
    # truncate to the last 3 versions: resolution now starts from the
    # truncation checkpoint, old versions are gone, latest is intact
    table_truncate_history(spark, t, keep_last=3)
    assert table_read(spark, t).count() == n * 10
    assert table_read(spark, t, version=n - 3).count() == (n - 2) * 10
    import pytest

    with pytest.raises(ValueError):
        table_read(spark, t, version=0)


def test_vacuum_retention_protects_young_files(spark, tmp_path):
    """Vacuum must skip unreferenced files younger than the retention
    window — they may belong to an in-flight commit that staged data
    but has not yet published its log entry."""
    import os

    t = str(tmp_path / "ret")
    table_commit(spark.range(0, 5).selectExpr("id"), t)
    # an in-flight writer: staged data file + live .stage dir, no log entry
    spark.range(90, 99).selectExpr("id").write.parquet(f"{t}/data/.stage-live")
    spark.range(80, 89).selectExpr("id").write.parquet(f"{t}/data/orphan")
    os.rename(
        f"{t}/data/orphan/"
        + next(f for f in os.listdir(f"{t}/data/orphan") if f.endswith(".parquet")),
        f"{t}/data/cafebabe.parquet",
    )
    import shutil

    shutil.rmtree(f"{t}/data/orphan")
    # default retention: nothing young is touched
    assert table_vacuum(spark, t) == 0
    assert os.path.exists(f"{t}/data/.stage-live")
    assert os.path.exists(f"{t}/data/cafebabe.parquet")
    # explicit zero-retention maintenance window reclaims both
    assert table_vacuum(spark, t, retention_hours=0) >= 2
    assert not os.path.exists(f"{t}/data/.stage-live")
    assert not os.path.exists(f"{t}/data/cafebabe.parquet")
    assert table_read(spark, t).count() == 5


def test_compact_zorder_clusters_both_columns(spark, tmp_path):
    """table_compact(zorder_by=...) = OPTIMIZE ZORDER BY: post-compact
    per-file bounding boxes are tight on EVERY clustered column, so a
    range predicate on either one prunes most files."""
    import os

    import pyarrow.parquet as pq

    from simple_data_workflow_spark.sources.tablelog import table_compact

    t = str(tmp_path / "zc")
    df = spark.range(0, 400_000).selectExpr(
        "cast(id % 2000 as double) as x",
        "cast(pmod(hash(id), 2000) + 2000 as double) as y",
    )
    table_commit(df.repartition(8), t)
    v = table_compact(spark, t, num_files=16, zorder_by=["x", "y"])
    hist = table_history(spark, t)
    assert hist[-1]["action"] == "overwrite" and hist[-1]["op"] == "compact"
    from simple_data_workflow_spark.sources.tablelog import _resolve_state

    files = _resolve_state(spark, t, v)["files"]
    assert len(files) >= 4
    bounds = []
    for f in files:
        md = pq.ParquetFile(os.path.join(t, "data", f)).metadata
        per_col = {}
        for rg in range(md.num_row_groups):
            for ci in range(md.row_group(rg).num_columns):
                col = md.row_group(rg).column(ci)
                st = col.statistics
                lo, hi = per_col.get(col.path_in_schema, (st.min, st.max))
                per_col[col.path_in_schema] = (min(lo, st.min), max(hi, st.max))
        bounds.append(per_col)
    domain = {
        c: (min(b[c][0] for b in bounds), max(b[c][1] for b in bounds))
        for c in ("x", "y")
    }
    for col, (lo_all, hi_all) in domain.items():
        width = (hi_all - lo_all) * 0.1
        q_lo, q_hi = lo_all + width, lo_all + 2 * width
        overlapping = sum(
            1 for b in bounds if not (b[col][1] < q_lo or b[col][0] > q_hi)
        )
        assert overlapping <= len(bounds) // 2, (
            f"{col}: {overlapping}/{len(bounds)} files overlap a 10% range"
        )
    # rows survived the re-cluster
    assert table_read(spark, t).count() == 400_000


def test_delete_everything_yields_empty_snapshot(spark, tmp_path):
    from simple_data_workflow_spark.sources.tablelog import table_delete_where

    t = str(tmp_path / "empty")
    table_commit(spark.range(0, 10).selectExpr("id", "id*2 as v"), t)
    table_delete_where(spark, t, "id >= 0")
    got = table_read(spark, t)
    assert got.count() == 0
    assert set(got.columns) == {"id", "v"}


def test_delete_no_match_is_noop_version(spark, tmp_path):
    from simple_data_workflow_spark.sources.tablelog import table_delete_where

    t = str(tmp_path / "noop")
    v0 = table_commit(spark.range(0, 10).selectExpr("id"), t)
    v = table_delete_where(spark, t, "id > 1000")
    assert v == v0  # no new version committed
    assert len(table_history(spark, t)) == 1


# ----------------------- round 7: per-file stats, table_scan, change feed


def test_stats_prune_pure_logic():
    from simple_data_workflow_spark.sources.tablelog import _stats_prune

    stats = {
        "a": {"x": [0, 10, 0], "s": ["alpha", "beta", 2]},
        "b": {"x": [20, 30, 1]},
        "c": {},  # no stats: always survives
    }
    files = ["a", "b", "c"]
    assert _stats_prune(stats, files, [("x", ">", 15)]) == ["b", "c"]
    assert _stats_prune(stats, files, [("x", "<=", 10)]) == ["a", "c"]
    assert _stats_prune(stats, files, [("x", "==", 25)]) == ["b", "c"]
    assert _stats_prune(stats, files, [("x", "in", [5, 40])]) == ["a", "c"]
    # "zebra" is outside a's [alpha, beta]; b has no stat for s -> survives
    assert _stats_prune(stats, files, [("s", "==", "zebra")]) == ["b", "c"]
    # conjunction: both must be satisfiable
    assert _stats_prune(stats, files, [("x", ">", 15), ("x", "<", 18)]) == ["c"]
    # unknown column / cross-type: never prune on doubt
    assert _stats_prune(stats, files, [("y", ">", 1)]) == files
    assert _stats_prune(stats, files, [("x", ">", "zzz")]) == files


def test_table_scan_skips_files_driver_side(spark, tmp_path):
    """Commits record per-file min/max; table_scan must prune files
    whose ranges exclude the filter WITHOUT touching them, and return
    exactly the filtered rows."""
    from simple_data_workflow_spark.sources.tablelog import (
        _resolve_state,
        _stats_prune,
        table_scan,
    )

    t = str(tmp_path / "scan1")
    # 4 commits with disjoint id ranges -> per-file stats are disjoint
    for i in range(4):
        table_commit(
            spark.range(i * 100, (i + 1) * 100).selectExpr(
                "id", "concat('name', id) as name", "id * 1.5 as score"
            ),
            t,
        )
    state = _resolve_state(spark, t, None)
    assert all(state["stats"].get(f) for f in state["files"])  # stats recorded
    pruned = _stats_prune(state["stats"], state["files"], [("id", ">=", 350)])
    assert len(pruned) < len(state["files"])  # files actually skipped
    got = table_scan(spark, t, filters=[("id", ">=", 350)])
    assert got.count() == 50
    assert table_scan(spark, t, filters=[("score", "<", 30.0)]).count() == 20
    # filter that stats prove empty: zero files scanned, empty frame
    assert table_scan(spark, t, filters=[("id", ">", 10_000)]).count() == 0


def test_table_scan_after_zorder_compact_prunes_on_either_column(spark, tmp_path):
    """stats + z-order compose: post-OPTIMIZE-ZORDER the per-file
    stats in the log prune on EITHER clustered column."""
    from simple_data_workflow_spark.sources.tablelog import (
        _resolve_state,
        _stats_prune,
        table_compact,
    )

    t = str(tmp_path / "scan2")
    df = spark.range(0, 100_000).selectExpr(
        "cast(id % 1000 as double) as x",
        "cast(pmod(hash(id), 1000) + 1000 as double) as y",
    )
    table_commit(df.repartition(4), t)
    table_compact(spark, t, num_files=16, zorder_by=["x", "y"])
    state = _resolve_state(spark, t, None)
    n = len(state["files"])
    assert n >= 8
    for col, lo, hi in (("x", 100.0, 180.0), ("y", 1100.0, 1180.0)):
        kept = _stats_prune(
            state["stats"], state["files"], [(col, ">=", lo), (col, "<=", hi)]
        )
        assert len(kept) <= n // 2, (col, len(kept), n)


def test_table_changes_append_feed(spark, tmp_path):
    from simple_data_workflow_spark.sources.tablelog import table_changes

    t = str(tmp_path / "cf1")
    table_commit(spark.range(0, 10).selectExpr("id"), t)  # v0
    table_commit(spark.range(10, 25).selectExpr("id"), t)  # v1
    table_commit(spark.range(25, 30).selectExpr("id"), t)  # v2
    ch = table_changes(spark, t, start_version=0)
    rows = ch.collect()
    assert len(rows) == 20  # v1 + v2 rows only
    byv = {}
    for r in rows:
        byv.setdefault(r["_commit_version"], set()).add(r["id"])
    assert byv == {1: set(range(10, 25)), 2: set(range(25, 30))}
    # bounded window
    assert table_changes(spark, t, 0, end_version=1).count() == 15
    # cursor at head: empty frame, schema intact
    head = table_changes(spark, t, start_version=2)
    assert head.count() == 0 and "_commit_version" in head.columns


def test_table_changes_rejects_rewrites_unless_allowed(spark, tmp_path):
    import pytest

    from simple_data_workflow_spark.sources.tablelog import (
        table_changes,
        table_delete_where,
    )

    t = str(tmp_path / "cf2")
    # one data file, so the delta's add = all 90 survivors
    table_commit(spark.range(0, 100).selectExpr("id").coalesce(1), t)  # v0
    table_delete_where(spark, t, "id < 10")  # v1: delta rewrite
    with pytest.raises(ValueError, match="allow_rewrites"):
        table_changes(spark, t, start_version=0)
    ch = table_changes(spark, t, start_version=0, allow_rewrites=True)
    # the delta's added file carries the 90 survivors, tagged v1
    assert ch.count() == 90
    assert {r["_commit_version"] for r in ch.collect()} == {1}


def test_table_changes_truncated_history_raises(spark, tmp_path):
    import pytest

    from simple_data_workflow_spark.sources.tablelog import (
        table_changes,
        table_truncate_history,
    )

    t = str(tmp_path / "cf3")
    for i in range(4):
        table_commit(spark.range(i * 10, (i + 1) * 10).selectExpr("id"), t)
    table_truncate_history(spark, t, keep_last=2)
    with pytest.raises(ValueError, match="not retained"):
        table_changes(spark, t, start_version=0)
    # the retained window still replays
    assert table_changes(spark, t, start_version=2).count() == 10


# ----------------------------- round 7: metadata-only schema evolution


def test_schema_evolution_metadata_only(spark, tmp_path):
    """evolve_schema=True appends a batch with NEW columns without
    rewriting any existing data file; snapshots read pre-evolution
    files with the added columns as NULL, and time travel to a
    pre-evolution version surfaces the old schema."""
    import os

    t = str(tmp_path / "evo1")
    table_commit(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"), t
    )
    before = set(_data_files(t))
    mtimes = {f: os.path.getmtime(f"{t}/data/{f}") for f in before}
    import pytest

    with pytest.raises(TypeError, match="schema drift"):
        table_commit(
            spark.createDataFrame(
                [(3, "c", 1.5)], "id long, v string, score double"
            ),
            t,
        )
    v1 = table_commit(
        spark.createDataFrame(
            [(3, "c", 1.5)], "id long, v string, score double"
        ),
        t,
        evolve_schema=True,
    )
    # no existing data file was rewritten - metadata-only
    for f in before:
        assert os.path.getmtime(f"{t}/data/{f}") == mtimes[f]
    got = {r["id"]: (r["v"], r["score"]) for r in table_read(spark, t).collect()}
    assert got == {1: ("a", None), 2: ("b", None), 3: ("c", 1.5)}
    # time travel to pre-evolution: old schema
    assert set(table_read(spark, t, version=v1 - 1).columns) == {"id", "v"}


def test_schema_evolution_rejects_type_change_and_drop(spark, tmp_path):
    import pytest

    t = str(tmp_path / "evo2")
    table_commit(
        spark.createDataFrame([(1, "a")], "id long, v string"), t
    )
    with pytest.raises(TypeError, match="mismatched"):
        table_commit(
            spark.createDataFrame([(2, 3)], "id long, v long"),  # type change
            t,
            evolve_schema=True,
        )
    with pytest.raises(TypeError, match="mismatched"):
        table_commit(
            spark.createDataFrame([(2,)], "id long"),  # dropped column
            t,
            evolve_schema=True,
        )


def test_dml_and_scan_after_evolution(spark, tmp_path):
    """File-granular DML and stats-pruned scans keep working across an
    evolution boundary: a DELETE predicated on the NEW column must
    leave pre-evolution files untouched (their value is NULL ⇒ no
    match), and table_scan must still read them NULL-filled."""
    from simple_data_workflow_spark.sources.tablelog import (
        table_delete_where,
        table_scan,
    )

    t = str(tmp_path / "evo3")
    table_commit(spark.range(0, 50).selectExpr("id"), t)
    table_commit(
        spark.range(50, 100).selectExpr("id", "id * 2.0 as score"),
        t,
        evolve_schema=True,
    )
    before = set(_data_files(t))
    table_delete_where(spark, t, "score > 150")
    # rows 76..99 deleted; NULL-score (pre-evolution) rows all survive
    assert table_read(spark, t).count() == 76
    got = table_scan(spark, t, filters=[("score", "<=", 120.0)])
    assert got.count() == 11  # ids 50..60
    assert table_scan(spark, t, filters=[("id", "<", 10)]).count() == 10


# --------------------- round 7: model-based randomized op sequences


def test_randomized_op_sequence_matches_model(spark, tmp_path):
    """Seeded random sequences of append / delete / update / merge /
    compact / truncate / vacuum, mirrored in a pure-Python model:
    after every op the latest snapshot AND every retained historical
    version must equal the model exactly. This is the whole-format
    consistency argument — any interaction bug between delta replay,
    checkpoints, stats carry-forward, truncation, and vacuum shows up
    here as a row diff."""
    import random

    from simple_data_workflow_spark.sources.tablelog import (
        table_compact,
        table_delete_where,
        table_merge_upsert,
        table_truncate_history,
        table_update_where,
        table_vacuum,
    )

    def run_sequence(seed, n_ops):
        rng = random.Random(seed)
        t = str(tmp_path / f"model{seed}")
        next_id = [0]

        def fresh_rows(n):
            rows = [(next_id[0] + i, float(rng.randint(0, 100))) for i in range(n)]
            next_id[0] += n
            return rows

        # model: current rows + history of retained versions
        model: dict[int, float] = {}
        history: list[dict[int, float]] = []
        min_retained = [0]

        def commit_model():
            history.append(dict(model))

        # v0: initial append
        rows = fresh_rows(rng.randint(5, 15))
        table_commit(
            spark.createDataFrame(rows, "id long, val double"), t
        )
        model.update(dict(rows))
        commit_model()

        for _ in range(n_ops):
            op = rng.choice(
                ["append", "delete", "update", "merge", "compact", "truncate", "vacuum"]
            )
            if op == "append":
                rows = fresh_rows(rng.randint(3, 10))
                table_commit(
                    spark.createDataFrame(rows, "id long, val double"), t
                )
                model.update(dict(rows))
                commit_model()
            elif op == "delete":
                thr = float(rng.randint(0, 100))
                v = table_delete_where(spark, t, f"val < {thr}")
                survivors = {i: x for i, x in model.items() if not x < thr}
                if survivors != model:  # matched something -> new version
                    assert v == len(history)
                    model.clear()
                    model.update(survivors)
                    commit_model()
                else:
                    assert v == len(history) - 1  # no-op: version unchanged
            elif op == "update":
                thr = float(rng.randint(0, 100))
                v = table_update_where(
                    spark, t, {"val": "val + 1000"}, f"val >= {thr}"
                )
                updated = {
                    i: (x + 1000 if x >= thr else x) for i, x in model.items()
                }
                if updated != model:
                    assert v == len(history)
                    model.clear()
                    model.update(updated)
                    commit_model()
                else:
                    assert v == len(history) - 1
            elif op == "merge":
                ups = [
                    (i, float(rng.randint(200, 300)))
                    for i in rng.sample(sorted(model), min(3, len(model)))
                ] + fresh_rows(2)
                table_merge_upsert(
                    spark,
                    t,
                    spark.createDataFrame(ups, "id long, val double"),
                    "id",
                )
                model.update(dict(ups))
                commit_model()
            elif op == "compact":
                table_compact(spark, t, target_file_mb=128)
                commit_model()  # same rows, new version
            elif op == "truncate":
                keep = rng.randint(1, 3)
                table_truncate_history(spark, t, keep_last=keep)
                min_retained[0] = max(min_retained[0], len(history) - keep)
            elif op == "vacuum":
                table_vacuum(spark, t, retention_hours=0)

            # latest snapshot == model
            got = {
                r["id"]: r["val"] for r in table_read(spark, t).collect()
            }
            assert got == model, (seed, op)
            # every retained version == its recorded model state
            for v in range(min_retained[0], len(history)):
                want = history[v]
                gv = {
                    r["id"]: r["val"]
                    for r in table_read(spark, t, version=v).collect()
                }
                assert gv == want, (seed, op, v)

    run_sequence(seed=101, n_ops=12)
    run_sequence(seed=202, n_ops=12)


def test_table_restore_rolls_back_metadata_only(spark, tmp_path):
    import os

    from simple_data_workflow_spark.sources.tablelog import (
        table_delete_where,
        table_restore,
    )

    t = str(tmp_path / "restore1")
    table_commit(spark.range(0, 50).selectExpr("id"), t)  # v0
    table_commit(spark.range(50, 80).selectExpr("id"), t)  # v1
    table_delete_where(spark, t, "id < 20")  # v2
    assert table_read(spark, t).count() == 60
    files_before = {f: os.path.getmtime(f"{t}/data/{f}") for f in _data_files(t)}
    v = table_restore(spark, t, version=1)  # undo the delete
    assert table_read(spark, t).count() == 80
    # metadata-only: no data file written or touched by the restore
    for f in files_before:
        assert os.path.getmtime(f"{t}/data/{f}") == files_before[f]
    hist = table_history(spark, t)
    assert hist[-1]["op"] == "restore" and hist[-1]["version"] == v
    # the rollback is itself reversible
    table_restore(spark, t, version=2)
    assert table_read(spark, t).count() == 60


def test_table_scan_equals_filtered_read_randomized(spark, tmp_path):
    """Property: for random filter conjunctions, table_scan(filters)
    must return exactly table_read().where(same predicate) — pruning
    is an optimization, never a semantics change. Runs on a z-ordered
    multi-file table so pruning actually fires."""
    import random

    from simple_data_workflow_spark.sources.tablelog import (
        table_compact,
        table_scan,
    )

    t = str(tmp_path / "prop_scan")
    df = spark.range(0, 20_000).selectExpr(
        "id",
        "cast(id % 500 as double) as x",
        "cast(pmod(hash(id), 500) as double) as y",
        "concat('s', pmod(hash(id, 3), 50)) as tag",
    )
    table_commit(df.repartition(6), t)
    table_compact(spark, t, num_files=8, zorder_by=["x", "y"])
    rng = random.Random(7)
    ops = ["==", "<", "<=", ">", ">="]
    for _ in range(12):
        filters = []
        for col, domain in (("x", 500), ("y", 500)):
            if rng.random() < 0.7:
                filters.append((col, rng.choice(ops), float(rng.randint(0, domain))))
        if rng.random() < 0.4:
            filters.append(("tag", "in", [f"s{rng.randint(0, 49)}" for _ in range(3)]))
        if not filters:
            filters = [("x", ">=", 0.0)]
        got = {r["id"] for r in table_scan(spark, t, filters=filters).collect()}
        from pyspark.sql import functions as F

        cond = F.lit(True)
        for c, op, v in filters:
            col = F.col(c)
            cond = cond & {
                "==": col == v, "<": col < v, "<=": col <= v,
                ">": col > v, ">=": col >= v,
            }[op] if op != "in" else cond & col.isin(list(v))
        want = {r["id"] for r in table_read(spark, t).where(cond).collect()}
        assert got == want, filters


def test_concurrent_appenders_lose_nothing(spark, tmp_path):
    """8 threads × 4 appends race the rename-if-absent commit protocol:
    every append must win SOME slot — versions contiguous, all rows
    present, no lost update."""
    import threading

    t = str(tmp_path / "conc")
    table_commit(spark.range(0, 1).selectExpr("id"), t)  # v0 seeds the log
    errors = []

    def appender(worker):
        try:
            for j in range(4):
                lo = 1000 * (worker * 4 + j + 1)
                table_commit(
                    spark.range(lo, lo + 10).selectExpr("id"), t, max_retries=200
                )
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    threads = [threading.Thread(target=appender, args=(w,)) for w in range(8)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    hist = table_history(spark, t)
    assert [h["version"] for h in hist] == list(range(33))  # contiguous slots
    assert table_read(spark, t).count() == 1 + 32 * 10  # nothing lost


def test_stats_handle_nan_and_temporal_filters(spark, tmp_path):
    """NaN poisons Python comparisons (everything is False), which
    would flip 'can't prove it misses' into a wrong prune — a file
    containing NaN must record NO stat for that column and survive
    every filter. Temporal filters must prune correctly whether passed
    as datetime objects or SQL-style strings."""
    import datetime

    from simple_data_workflow_spark.sources.tablelog import (
        _resolve_state,
        _stats_prune,
        table_scan,
    )

    t = str(tmp_path / "nan1")
    table_commit(
        spark.createDataFrame(
            [(1, 5.0), (2, float("nan")), (3, 9.0)], "id long, v double"
        ).coalesce(1),
        t,
    )
    table_commit(
        spark.createDataFrame([(4, 100.0), (5, 200.0)], "id long, v double")
        .coalesce(1),
        t,
    )
    state = _resolve_state(spark, t, None)
    nan_file = next(
        f for f in state["files"] if "v" not in state["stats"].get(f, {})
    )
    assert nan_file  # NaN file dropped its v-stat entirely
    # the NaN file must survive any v filter (it contains v=9.0)
    kept = _stats_prune(state["stats"], state["files"], [("v", ">", 6.0)])
    assert nan_file in kept
    # Spark orders NaN as the LARGEST double, so the NaN row itself
    # satisfies v > 6.0 row-side — stats dropping + row filter agree
    assert {r["id"] for r in table_scan(spark, t, filters=[("v", ">", 6.0)]).collect()} == {2, 3, 4, 5}

    # temporal: datetime objects and SQL-style strings both prune right
    t2 = str(tmp_path / "ts1")
    table_commit(
        spark.createDataFrame(
            [(1, datetime.datetime(2020, 3, 1, 0, 0)),
             (2, datetime.datetime(2020, 3, 1, 11, 0))],
            "id long, ts timestamp",
        ).coalesce(1),
        t2,
    )
    # same-day filter at 12:00 — the file's rows are all earlier; with
    # the 'T'/' ' mixed-format bug this file was wrongly prunable for <
    for val in (
        datetime.datetime(2020, 3, 1, 12, 0),
        "2020-03-01 12:00:00",
    ):
        got = table_scan(spark, t2, filters=[("ts", "<", val)])
        assert got.count() == 2, val
        assert table_scan(spark, t2, filters=[("ts", ">", val)]).count() == 0


def test_row_count_from_metadata(spark, tmp_path):
    """COUNT(*) must come from the log's per-file row counts — no data
    file opened — and stay correct across appends, file-granular
    deletes, and time travel."""
    from pyspark.sql import functions as F

    from simple_data_workflow_spark.sources.tablelog import (
        table_delete_where,
        table_row_count,
    )

    t = str(tmp_path / "cnt")
    table_commit(spark.range(0, 100).selectExpr("id"), t)
    table_commit(spark.range(100, 130).selectExpr("id"), t)
    assert table_row_count(spark, t) == 130
    v = table_delete_where(spark, t, "id between 10 and 19")
    assert table_row_count(spark, t) == 120
    assert table_row_count(spark, t, version=v - 1) == 130
    # metadata path: physically remove the data files; the count must
    # still answer (nothing opens them), while a real read would fail
    import os
    import shutil

    backup = str(tmp_path / "backup")
    shutil.copytree(f"{t}/data", backup)
    for f in os.listdir(f"{t}/data"):
        if f.endswith(".parquet"):
            os.unlink(f"{t}/data/{f}")
    assert table_row_count(spark, t) == 120


def test_string_column_with_timestamp_shaped_values_not_misprunes(spark, tmp_path):
    """A STRING column whose values look like SQL timestamps must not
    have its filter values rewritten to ISO form — that inverts the
    comparison and prunes matching files (review finding)."""
    from simple_data_workflow_spark.sources.tablelog import table_scan

    t = str(tmp_path / "strts")
    table_commit(
        spark.createDataFrame(
            [(1, "2024-01-01 10:00:00"), (2, "2024-01-02 11:00:00")],
            "id long, s string",
        ).coalesce(1),
        t,
    )
    got = table_scan(spark, t, filters=[("s", "==", "2024-01-01 10:00:00")])
    assert got.count() == 1
    assert table_scan(spark, t, filters=[("s", "<=", "2024-01-01 10:00:00")]).count() == 1


def test_changes_and_matview_across_schema_evolution(spark, tmp_path):
    """The change feed must union parts across a metadata-only schema
    evolution (pre-evolution rows fill the new column with NULL)."""
    from simple_data_workflow_spark.sources.tablelog import table_changes

    t = str(tmp_path / "evo_feed")
    table_commit(spark.range(0, 5).selectExpr("id"), t)
    table_commit(
        spark.range(5, 8).selectExpr("id", "id * 2.0 as score"),
        t,
        evolve_schema=True,
    )
    ch = table_changes(spark, t, start_version=-1)
    assert ch.count() == 8
    assert ch.where("score IS NULL").count() == 5


def test_matview_cursor_survives_view_compaction(spark, tmp_path):
    """table_compact on the VIEW writes an entry without src_version;
    the cursor must come from the newest entry that carries one, or
    the next refresh would double-count the whole source."""
    from pyspark.sql import functions as F

    from simple_data_workflow_spark.sources.matview import refresh_aggregate_view
    from simple_data_workflow_spark.sources.tablelog import table_compact

    src = str(tmp_path / "src_c")
    view = str(tmp_path / "view_c")
    table_commit(spark.range(0, 40).selectExpr("id % 2 as g", "id as v"), src)
    refresh_aggregate_view(spark, src, view, ["g"], sum_cols=["v"])
    table_compact(spark, view)  # maintenance commit, no src_version
    table_commit(spark.range(40, 60).selectExpr("id % 2 as g", "id as v"), src)
    refresh_aggregate_view(spark, src, view, ["g"], sum_cols=["v"])
    got = {r["g"]: (r["cnt"], r["sum_v"]) for r in table_read(spark, view).collect()}
    want = {
        g: (30, sum(i for i in range(60) if i % 2 == g)) for g in (0, 1)
    }
    assert got == want  # no double-counting


def test_decimal_stats_widen_not_round_inward(spark, tmp_path):
    """Decimal bounds that lose precision in a double must widen
    outward, never prove-miss a file whose true min/max matches."""
    from decimal import Decimal

    from simple_data_workflow_spark.sources.tablelog import table_scan

    t = str(tmp_path / "dec1")
    table_commit(
        spark.createDataFrame(
            [(1, Decimal("0.99999999999999999999"))],
            "id long, d decimal(38,20)",
        ).coalesce(1),
        t,
    )
    got = table_scan(
        spark, t, filters=[("d", "==", Decimal("0.99999999999999999999"))]
    )
    assert got.count() == 1  # float-rounded bound must not exclude it


def test_publish_if_absent_is_exclusive(spark, tmp_path):
    """Two writers to the same log slot: exactly one wins, and the
    loser can never clobber the winner's payload (local-FS publish is
    a hard link — POSIX link(2) fails EEXIST atomically, unlike
    RawLocalFileSystem rename which overwrites)."""
    from simple_data_workflow_spark.sources.tablelog import (
        _read_json,
        _write_json_if_absent,
    )

    p = str(tmp_path / "excl")
    assert _write_json_if_absent(spark, p, "x.json", {"a": 1})
    assert not _write_json_if_absent(spark, p, "x.json", {"a": 2})
    assert _read_json(spark, p, "x.json") == {"a": 1}


def test_dml_on_empty_snapshot_is_safe(spark, tmp_path):
    """DELETE/UPDATE on an empty snapshot are version no-ops and MERGE
    is insert-only — none may crash on the zero-path parquet read."""
    from simple_data_workflow_spark.sources.tablelog import (
        table_delete_where,
        table_merge_upsert,
        table_update_where,
    )

    t = str(tmp_path / "empty_dml")
    table_commit(spark.range(0, 10).selectExpr("id", "id * 1.0 as v"), t)
    table_delete_where(spark, t, "id >= 0")
    assert table_read(spark, t).count() == 0
    v = table_delete_where(spark, t, "v > 3")
    assert v == table_delete_where(spark, t, "v > 5")  # no-ops, same version
    assert v == table_update_where(spark, t, {"v": "v + 1"}, "v > 3")
    table_merge_upsert(
        spark, t, spark.range(0, 3).selectExpr("id", "id * 2.0 as v"), "id"
    )
    got = {r["id"]: r["v"] for r in table_read(spark, t).collect()}
    assert got == {0: 0.0, 1: 2.0, 2: 4.0}


def test_append_revalidates_schema_after_interleaved_evolution(
    spark, tmp_path, monkeypatch
):
    """An append validated against version N must not land after an
    interleaved evolve_schema commit — last-writer-wins schema replay
    would silently revert the evolution. The commit loop pins the
    publish to the validated version and re-validates on movement."""
    import pytest

    import simple_data_workflow_spark.sources.tablelog as tl

    t = str(tmp_path / "reval")
    tl.table_commit(spark.range(0, 5).selectExpr("id"), t)
    real = tl._collect_stats
    fired = {"done": False}

    def sneaky(spark_, path, files, **kw):
        # interleave an evolve commit between the stale append's
        # pre-staging validation and its publish attempt
        if not fired["done"]:
            fired["done"] = True
            tl.table_commit(
                spark.range(5, 8).selectExpr("id", "id * 2.0 as score"),
                t,
                evolve_schema=True,
            )
        return real(spark_, path, files, **kw)

    monkeypatch.setattr(tl, "_collect_stats", sneaky)
    with pytest.raises(TypeError, match="schema drift"):
        tl.table_commit(spark.range(8, 10).selectExpr("id"), t)
    monkeypatch.setattr(tl, "_collect_stats", real)
    out = table_read(spark, t)
    assert "score" in out.columns  # evolution survived
    assert out.count() == 8  # the stale append's 2 rows never landed


def test_rowlevel_changes_delete_update_append(spark, tmp_path):
    """_change_type feed: appends are inserts, DELETE surfaces its
    preimage rows as deletes, UPDATE surfaces delete(pre)+insert(post),
    and compaction contributes zero logical changes."""
    from simple_data_workflow_spark.sources.tablelog import (
        table_changes_rowlevel,
        table_compact,
        table_delete_where,
        table_update_where,
    )

    t = str(tmp_path / "cdf")
    table_commit(spark.range(0, 10).selectExpr("id", "id * 1.0 as v"), t)  # v0
    table_delete_where(spark, t, "id < 3")                                 # v1
    table_update_where(spark, t, {"v": "v * 10"}, "id = 5")                # v2
    table_compact(spark, t, num_files=1)                                   # v3
    table_commit(spark.range(10, 12).selectExpr("id", "id * 1.0 as v"), t) # v4

    ch = table_changes_rowlevel(spark, t, start_version=-1).collect()
    by = {}
    for r in ch:
        by.setdefault((r["_commit_version"], r["_change_type"]), set()).add(
            (r["id"], r["v"])
        )
    assert by[(0, "insert")] == {(i, float(i)) for i in range(10)}
    assert by[(1, "delete")] == {(i, float(i)) for i in range(3)}
    assert (1, "insert") not in by  # pure delete: no postimage inserts
    assert by[(2, "delete")] == {(5, 5.0)}
    assert by[(2, "insert")] == {(5, 50.0)}
    assert not any(v == 3 for v, _ in by)  # compact: zero logical change
    assert by[(4, "insert")] == {(10, 10.0), (11, 11.0)}

    # net effect of the feed reproduces the current snapshot
    import collections

    net = collections.Counter()
    for (v, kind), rows in by.items():
        for row in rows:
            net[row] += 1 if kind == "insert" else -1
    now = collections.Counter(
        (r["id"], r["v"]) for r in table_read(spark, t).collect()
    )
    assert {k: n for k, n in net.items() if n} == dict(now)


def test_partitioned_commit_prunes_by_membership(spark, tmp_path):
    """partition_by: commits hash-cluster on the partition columns and
    record each file's distinct value set in the log; partition-key
    filters then prune by EXACT membership (no range looseness), the
    spec is inherited by later appends and DML rewrites, and scans
    stay value-correct."""
    from simple_data_workflow_spark.sources.tablelog import (
        _resolve_state,
        _stats_prune,
        table_delete_where,
        table_scan,
    )

    t = str(tmp_path / "part")
    df = spark.range(0, 1000).selectExpr("id", "id % 8 as g", "id * 1.0 as v")
    table_commit(df, t, partition_by=["g"])
    state = _resolve_state(spark, t, None)
    assert state["partition_by"] == ["g"]
    stats_files = [f for f in state["files"] if state["stats"].get(f, {}).get("__rows")]
    assert all(
        "g" in state["stats"][f].get("__parts", {}) for f in stats_files
    )
    kept = _stats_prune(state["stats"], state["files"], [("g", "==", 3)])
    assert 0 < len(kept) < len(state["files"])
    assert table_scan(spark, t, filters=[("g", "==", 3)]).count() == 125

    # appends inherit the declared spec without restating it
    table_commit(
        spark.range(1000, 1200).selectExpr("id", "id % 8 as g", "id * 1.0 as v"), t
    )
    s2 = _resolve_state(spark, t, None)
    assert s2["partition_by"] == ["g"]
    kept2 = _stats_prune(s2["stats"], s2["files"], [("g", "==", 3)])
    assert len(kept2) < len(s2["files"])
    assert table_scan(spark, t, filters=[("g", "==", 3)]).count() == 150

    # file-granular DELETE: rewritten survivor files keep their
    # membership stats, pruning and values stay exact
    table_delete_where(spark, t, "g = 3 and id < 100")
    s3 = _resolve_state(spark, t, None)
    kept3 = _stats_prune(s3["stats"], s3["files"], [("g", "==", 3)])
    assert len(kept3) < len(s3["files"])
    assert table_scan(spark, t, filters=[("g", "==", 3)]).count() == 137

    # membership beats min/max where hash clustering interleaves
    # values: a range filter can't prune a file holding {0, 7}, but
    # an equality on an absent value can
    all_vals = {
        v
        for f in s3["files"]
        for v in s3["stats"].get(f, {}).get("__parts", {}).get("g", [])
    }
    assert all_vals == set(range(8))


def test_compact_preserves_partition_clustering(spark, tmp_path):
    """Compacting a partitioned table must re-cluster on the declared
    partition columns, not blindly coalesce (which would mix every
    partition value into every file and dull membership pruning)."""
    from simple_data_workflow_spark.sources.tablelog import (
        _resolve_state,
        _stats_prune,
        table_compact,
        table_scan,
    )

    t = str(tmp_path / "part_compact")
    df = spark.range(0, 2000).selectExpr("id", "id % 8 as g", "id * 1.0 as v")
    table_commit(df, t, partition_by=["g"])
    table_commit(
        spark.range(2000, 4000).selectExpr("id", "id % 8 as g", "id * 1.0 as v"), t
    )
    table_compact(spark, t, num_files=4)
    state = _resolve_state(spark, t, None)
    assert state["partition_by"] == ["g"]  # spec survives the compact
    kept = _stats_prune(state["stats"], state["files"], [("g", "==", 3)])
    assert 0 < len(kept) < len(state["files"])  # clustering survived too
    assert table_scan(spark, t, filters=[("g", "==", 3)]).count() == 500


def test_compact_small_packs_only_the_small_file_tail(spark, tmp_path):
    """Partial compaction: only files under the size threshold are
    bin-packed (one atomic delta), large files survive BYTE-IDENTICAL
    under their old names — at 100 TB you compact the streaming tail,
    never the table."""
    import os

    from simple_data_workflow_spark.sources.tablelog import (
        _resolve_state,
        table_compact_small,
    )

    t = str(tmp_path / "csmall")
    # one big file (hash columns defeat parquet's run-length tricks)
    table_commit(
        spark.range(0, 300_000)
        .selectExpr("id", "hash(id) as h1", "hash(id + 1) as h2")
        .coalesce(1),
        t,
    )
    big = {
        f: os.path.getsize(f"{t}/data/{f}")
        for f in _resolve_state(spark, t, None)["files"]
    }
    assert len(big) == 1
    big_name, big_size = next(iter(big.items()))
    for i in range(5):  # the small-file tail (streaming-append shaped)
        table_commit(
            spark.range(1_000_000 + i * 10, 1_000_000 + i * 10 + 10)
            .selectExpr("id", "hash(id) as h1", "hash(id + 1) as h2")
            .coalesce(1),
            t,
        )
    threshold_mb = (big_size - 1) / 2**20  # everything but the big file
    v = table_compact_small(
        spark, t, small_file_mb=threshold_mb, target_file_mb=128
    )
    state = _resolve_state(spark, t, None)
    assert big_name in state["files"]  # untouched, same name
    assert len(state["files"]) == 2  # big + one packed file
    assert table_read(spark, t).count() == 300_050
    hist = table_history(spark, t)
    assert hist[-1]["op"] == "compact_small" and hist[-1]["action"] == "delta"
    # time travel across the pack still works
    assert table_read(spark, t, version=v - 1).count() == 300_050
    # nothing to pack -> version no-op
    assert table_compact_small(spark, t, small_file_mb=threshold_mb) == v


def test_compact_small_is_invisible_to_change_feeds_and_matview(spark, tmp_path):
    """Bin-packing rewrites bytes, not rows: both change feeds skip it
    from metadata alone, and an append-only matview keeps refreshing
    across it (previously ANY non-append source commit dead-ended the
    plain feed)."""
    from simple_data_workflow_spark.sources.matview import refresh_aggregate_view
    from simple_data_workflow_spark.sources.tablelog import (
        table_changes,
        table_changes_rowlevel,
        table_compact,
        table_compact_small,
    )

    src = str(tmp_path / "csm_src")
    view = str(tmp_path / "csm_view")
    table_commit(spark.range(0, 40).selectExpr("id % 2 as g", "id * 1.0 as v"), src)
    refresh_aggregate_view(
        spark, src, view, ["g"], sum_cols=["v"], min_cols=["v"], max_cols=["v"]
    )
    table_compact_small(spark, src, small_file_mb=64.0)
    table_compact(spark, src, num_files=1)
    table_commit(spark.range(40, 60).selectExpr("id % 2 as g", "id * 1.0 as v"), src)
    ch = table_changes(spark, src, start_version=0)
    assert ch.count() == 20  # only the append's rows, compactions skipped
    rl = table_changes_rowlevel(spark, src, start_version=0)
    assert rl.where("_change_type = 'delete'").count() == 0
    # min/max view refreshes across the compactions on the CHEAP path
    refresh_aggregate_view(
        spark, src, view, ["g"], sum_cols=["v"], min_cols=["v"], max_cols=["v"]
    )
    got = {
        r["g"]: (r["cnt"], r["sum_v"], r["min_v"], r["max_v"])
        for r in table_read(spark, view).collect()
    }
    want = {
        g: (
            30,
            float(sum(i for i in range(60) if i % 2 == g)),
            float(g),
            float(58 + g),
        )
        for g in (0, 1)
    }
    assert got == want


def test_check_constraints_enforced_on_every_write_path(spark, tmp_path):
    """ADD CONSTRAINT validates the existing snapshot, then every
    append / UPDATE / MERGE batch is checked before it can commit;
    NULL predicates pass (SQL CHECK), and DROP re-opens the gate."""
    import pytest

    from simple_data_workflow_spark.sources.tablelog import (
        table_drop_check_constraint,
        table_merge_upsert,
        table_set_check_constraint,
        table_update_where,
    )

    t = str(tmp_path / "ck")
    table_commit(
        spark.createDataFrame(
            [(1, 10.0), (2, 20.0)], "id long, v double"
        ),
        t,
    )
    table_set_check_constraint(spark, t, "v_nonneg", "v >= 0")
    with pytest.raises(ValueError, match="v_nonneg"):
        table_commit(
            spark.createDataFrame([(3, -1.0)], "id long, v double"), t
        )
    table_commit(spark.createDataFrame([(3, 30.0)], "id long, v double"), t)
    with pytest.raises(ValueError, match="v_nonneg"):
        table_update_where(spark, t, {"v": "v - 100"}, "id = 1")
    with pytest.raises(ValueError, match="v_nonneg"):
        table_merge_upsert(
            spark,
            t,
            spark.createDataFrame([(2, -5.0)], "id long, v double"),
            "id",
        )
    # NULL passes (SQL CHECK semantics)
    table_commit(
        spark.createDataFrame([(4, None)], "id long, v double"), t
    )
    # failed writes left no partial state
    got = {r["id"]: r["v"] for r in table_read(spark, t).collect()}
    assert got == {1: 10.0, 2: 20.0, 3: 30.0, 4: None}
    table_drop_check_constraint(spark, t, "v_nonneg")
    table_commit(spark.createDataFrame([(5, -1.0)], "id long, v double"), t)
    assert table_read(spark, t).count() == 5


def test_add_constraint_rejects_violating_snapshot(spark, tmp_path):
    import pytest

    from simple_data_workflow_spark.sources.tablelog import (
        table_set_check_constraint,
    )

    t = str(tmp_path / "ck2")
    table_commit(
        spark.createDataFrame([(1, -3.0)], "id long, v double"), t
    )
    with pytest.raises(ValueError, match="existing snapshot"):
        table_set_check_constraint(spark, t, "v_nonneg", "v >= 0")


def test_rowlevel_changes_restore_is_file_diff_bounded(spark, tmp_path):
    """A RESTORE's row-level changes: exactly the rolled-back commits'
    rows as deletes (immutable common files cancel at the FILE level
    and are never read)."""
    from simple_data_workflow_spark.sources.tablelog import (
        table_changes_rowlevel,
        table_restore,
    )

    t = str(tmp_path / "cdf_restore")
    table_commit(spark.range(0, 10).selectExpr("id"), t)   # v0
    table_commit(spark.range(10, 14).selectExpr("id"), t)  # v1
    table_restore(spark, t, 0)                             # v2
    ch = table_changes_rowlevel(spark, t, start_version=1)
    rows = {(r["_change_type"], r["id"]) for r in ch.collect()}
    assert rows == {("delete", i) for i in range(10, 14)}
    assert table_read(spark, t).count() == 10


def test_history_reports_rows_and_timestamps(spark, tmp_path):
    """DESCRIBE HISTORY operability: per-commit rows-added from the
    log's stats (no data files opened) and a wall-clock timestamp."""
    t = str(tmp_path / "hist_rows")
    table_commit(spark.range(0, 25).selectExpr("id"), t)
    table_commit(spark.range(25, 40).selectExpr("id"), t)
    table_commit(spark.range(0, 3).selectExpr("id"), t, collect_stats=False)
    hist = table_history(spark, t)
    assert [h["rows_added"] for h in hist] == [25, 15, None]
    assert all(h["timestamp"].startswith("20") for h in hist)
    assert hist[0]["timestamp"] <= hist[-1]["timestamp"]


def test_timestamp_time_travel(spark, tmp_path):
    """AS OF TIMESTAMP resolves against the ts each entry records at
    publish; pre-history timestamps raise instead of guessing."""
    import time as _time

    import pytest as _pytest

    from simple_data_workflow_spark.sources.tablelog import (
        table_version_at_timestamp,
    )

    t = str(tmp_path / "ts_travel")
    table_commit(spark.range(0, 10).selectExpr("id"), t)
    _time.sleep(0.05)
    table_commit(spark.range(10, 25).selectExpr("id"), t)
    hist = table_history(spark, t)
    mid = hist[1]["timestamp"]  # exactly at commit 1 → version 1
    assert table_version_at_timestamp(spark, t, mid) == 1
    before_v1 = hist[0]["timestamp"]
    assert table_version_at_timestamp(spark, t, before_v1) == 0
    assert table_read(spark, t, timestamp=before_v1).count() == 10
    assert table_read(spark, t, timestamp=mid).count() == 25
    with _pytest.raises(ValueError, match="predates"):
        table_version_at_timestamp(spark, t, "1999-01-01T00:00:00+00:00")
    with _pytest.raises(ValueError, match="at most one"):
        table_read(spark, t, version=0, timestamp=mid)


def test_shallow_clone_zero_copy_divergence_and_materialize(spark, tmp_path):
    """Shallow clone: metadata-only (no bytes under the clone's data/),
    reads equal, stats/partition spec/constraints carry over, DML on
    the clone is copy-on-write and never touches the source, and
    compaction fully materializes the clone."""
    import os as _os

    from simple_data_workflow_spark.sources.tablelog import (
        table_clone,
        table_compact,
        table_delete_where,
        table_scan,
        table_set_check_constraint,
    )

    src = str(tmp_path / "clone_src")
    dst = str(tmp_path / "clone_dst")
    df = spark.range(0, 400).selectExpr("id", "id % 4 AS part")
    table_commit(df, src, partition_by=["part"])
    table_set_check_constraint(spark, src, "id_nonneg", "id >= 0")
    table_commit(
        spark.range(400, 500).selectExpr("id", "id % 4 AS part"), src
    )
    v = table_clone(spark, src, dst)
    assert v == 0
    # zero-copy: the clone carries no data files of its own yet
    assert not _os.path.exists(f"{dst}/data") or not any(
        n.endswith(".parquet") for n in _os.listdir(f"{dst}/data")
    )
    assert table_read(spark, dst).count() == 500
    # membership pruning works through the cloned stats + spec
    pruned = table_scan(spark, dst, filters=[("part", "==", 2)])
    assert pruned.count() == 125
    # constraints carried: a violating append on the clone is rejected
    import pytest as _pytest

    with _pytest.raises(ValueError, match="id_nonneg"):
        table_commit(
            spark.createDataFrame([(-5, 0)], "id long, part long"), dst
        )
    # copy-on-write divergence: DML the clone, source untouched
    table_delete_where(spark, dst, "id < 100")
    assert table_read(spark, dst).count() == 400
    assert table_read(spark, src).count() == 500
    # deleting on the source does not leak into the clone either
    table_delete_where(spark, src, "id >= 450")
    assert table_read(spark, dst).count() == 400
    # compaction materializes: every resolved file is clone-local
    table_compact(spark, dst, num_files=4)
    from simple_data_workflow_spark.sources.tablelog import _resolve_state

    state = _resolve_state(spark, dst, None)
    assert state["files"] and all("/" not in f for f in state["files"])
    assert table_read(spark, dst).count() == 400


def test_clone_version_as_of_and_merge(spark, tmp_path):
    """Cloning a historical version snapshots exactly that version;
    MERGE on a clone rewrites only the touched referenced files."""
    from simple_data_workflow_spark.sources.tablelog import (
        table_clone,
        table_merge_upsert,
    )

    src = str(tmp_path / "clone_v_src")
    dst = str(tmp_path / "clone_v_dst")
    table_commit(spark.range(0, 50).selectExpr("id", "id * 2 AS v"), src)
    table_commit(spark.range(50, 80).selectExpr("id", "id * 2 AS v"), src)
    table_clone(spark, src, dst, version=0)
    assert table_read(spark, dst).count() == 50
    upd = spark.createDataFrame([(3, 999), (100, 1)], "id long, v long")
    table_merge_upsert(spark, dst, upd, "id")
    got = {(r["id"], r["v"]) for r in table_read(spark, dst).collect()}
    assert (3, 999) in got and (100, 1) in got and (4, 8) in got
    assert len(got) == 51
    # the source still resolves both commits untouched
    assert table_read(spark, src).count() == 80


def _inject_before_dml(monkeypatch, op, action):
    """Patch _commit_entry so the FIRST publish attempt of a DML entry
    with ``op`` finds ``action()`` committed just before it — a
    deterministic replay of the concurrent-writer race."""
    from simple_data_workflow_spark.sources import tablelog as tl

    orig = tl._commit_entry
    done = {"v": False}

    def inject(spark, path, entry, *a, **kw):
        if entry.get("op") == op and not done["v"]:
            done["v"] = True
            action()
        return orig(spark, path, entry, *a, **kw)

    monkeypatch.setattr(tl, "_commit_entry", inject)


def test_delete_rebases_over_disjoint_concurrent_append(
    spark, tmp_path, monkeypatch
):
    """A plain append that interleaves with a DELETE no longer aborts
    it: the delete probes the appended files, finds no predicate
    overlap, and re-targets the SAME delta at the new head — appended
    files survive untouched."""
    from simple_data_workflow_spark.sources.tablelog import table_delete_where

    t = str(tmp_path / "rebase_disjoint")
    table_commit(spark.range(0, 100).selectExpr("id"), t)
    base_files = table_history(spark, t)[0]["n_files"]
    _inject_before_dml(
        monkeypatch,
        "delete",
        lambda: table_commit(spark.range(200, 220).selectExpr("id"), t),
    )
    v = table_delete_where(spark, t, "id < 10")
    assert v == 2  # v0 base, v1 injected append, v2 rebased delete
    got = {r["id"] for r in table_read(spark, t).collect()}
    assert got == set(range(10, 100)) | set(range(200, 220))
    # the rebased delta only rewrote BASE files — the appended ones
    # were provably disjoint from the predicate
    assert table_history(spark, t)[2]["n_removed"] <= base_files


def test_delete_rebases_over_overlapping_concurrent_append(
    spark, tmp_path, monkeypatch
):
    """Appended rows matching the predicate are deleted too — the
    rebase extends the delta with a rewrite of exactly the overlapping
    appended files (serializable: append first, then DELETE)."""
    from simple_data_workflow_spark.sources.tablelog import table_delete_where

    t = str(tmp_path / "rebase_overlap")
    table_commit(spark.range(0, 100).selectExpr("id"), t)
    _inject_before_dml(
        monkeypatch,
        "delete",
        lambda: table_commit(
            spark.range(0, 5).selectExpr("id"), t
        ),  # duplicates inside the predicate
    )
    table_delete_where(spark, t, "id < 10")
    got = sorted(r["id"] for r in table_read(spark, t).collect())
    assert got == list(range(10, 100))  # both copies of 0-4 gone


def test_dml_still_conflicts_on_non_append_interleave(
    spark, tmp_path, monkeypatch
):
    """Rebase is appends-only: an interleaved overwrite (or schema
    evolution / constraint change) still raises — those invalidate
    the computed delta."""
    import pytest as _pytest

    from simple_data_workflow_spark.sources.tablelog import (
        ConcurrentWriteConflict,
        table_delete_where,
    )

    t = str(tmp_path / "rebase_conflict")
    table_commit(spark.range(0, 50).selectExpr("id"), t)
    _inject_before_dml(
        monkeypatch,
        "delete",
        lambda: table_commit(
            spark.range(500, 520).selectExpr("id"), t, mode="overwrite"
        ),
    )
    with _pytest.raises(ConcurrentWriteConflict):
        table_delete_where(spark, t, "id < 10")


def test_merge_rebases_batch_wins_over_concurrent_append(
    spark, tmp_path, monkeypatch
):
    """MERGE serializes after an interleaved append: an appended row
    with a colliding key loses to the batch's version (dropped from
    the appended file's rewrite); non-colliding appended rows
    survive."""
    from simple_data_workflow_spark.sources.tablelog import table_merge_upsert

    t = str(tmp_path / "rebase_merge")
    table_commit(spark.range(0, 50).selectExpr("id", "id * 2 AS v"), t)
    _inject_before_dml(
        monkeypatch,
        "merge",
        lambda: table_commit(
            spark.createDataFrame([(3, 777), (60, 5)], "id long, v long"), t
        ),
    )
    upd = spark.createDataFrame([(3, 999), (100, 1)], "id long, v long")
    table_merge_upsert(spark, t, upd, "id")
    rows = table_read(spark, t).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["id"], []).append(r["v"])
    assert by_id[3] == [999]  # batch won; appended 777 dropped
    assert by_id[60] == [5]  # non-colliding appended row survives
    assert by_id[100] == [1]  # batch insert
    assert len(rows) == 52  # 50 base + 60 + 100 (3 deduped)


def test_mor_delete_basic_counts_and_time_travel(spark, tmp_path):
    """Merge-on-read DELETE: no data file rewritten (sidecars only),
    reads subtract positions, metadata COUNT(*) stays exact, the
    pre-delete version still time-travels, and already-deleted rows
    are never marked twice."""
    import os as _os

    from simple_data_workflow_spark.sources.tablelog import (
        _resolve_state,
        table_delete_where,
        table_row_count,
    )

    t = str(tmp_path / "mor_basic")
    table_commit(spark.range(0, 100).selectExpr("id").repartition(4), t)
    data_before = sorted(_os.listdir(f"{t}/data"))
    v = table_delete_where(spark, t, "id < 10", mode="mor")
    assert v == 1
    # every pre-existing data file is still there, byte-identical name
    assert set(data_before) <= set(_os.listdir(f"{t}/data"))
    st = _resolve_state(spark, t, None)
    assert sorted(st["files"]) == sorted(
        _resolve_state(spark, t, 0)["files"]
    )  # file list unchanged — only sidecars were added
    assert st["dvs"] and sum(st["dv_counts"].values()) == 10
    got = sorted(r["id"] for r in table_read(spark, t).collect())
    assert got == list(range(10, 100))
    assert table_row_count(spark, t) == 90  # metadata-only path
    assert table_read(spark, t, version=0).count() == 100  # time travel
    # overlapping second MoR delete: rows 0-9 are already gone and must
    # not be re-marked (COUNT(*) would undercount)
    table_delete_where(spark, t, "id < 20", mode="mor")
    st2 = _resolve_state(spark, t, None)
    assert sum(st2["dv_counts"].values()) == 20
    assert table_row_count(spark, t) == 80
    assert table_read(spark, t).count() == 80


def test_mor_interplay_cow_compact_truncate_vacuum(spark, tmp_path):
    """DVs compose with the rest of the format: a copy-on-write DML on
    a DV'd file applies the vectors (no resurrection), compaction
    purges them, and truncation+vacuum keeps sidecars referenced by
    the checkpoint."""
    from simple_data_workflow_spark.sources.tablelog import (
        _resolve_state,
        table_compact,
        table_delete_where,
        table_row_count,
        table_truncate_history,
        table_update_where,
    )

    t = str(tmp_path / "mor_interplay")
    table_commit(spark.range(0, 200).selectExpr("id", "id AS v").repartition(4), t)
    table_delete_where(spark, t, "id < 50", mode="mor")
    # a cow UPDATE touching DV'd files must not resurrect rows 0-49
    table_update_where(spark, t, {"v": "v + 1000"}, "id BETWEEN 50 AND 59")
    got = {r["id"]: r["v"] for r in table_read(spark, t).collect()}
    assert len(got) == 150 and got[50] == 1050 and 0 not in got
    # truncate: the checkpoint must carry the DVs (and vacuum must not
    # reap the sidecars it references)
    table_truncate_history(spark, t, keep_last=1)
    table_vacuum(spark, t, retention_hours=0)
    assert table_read(spark, t).count() == 150
    assert table_row_count(spark, t) == 150
    # compaction materializes the subtraction and purges the vectors
    table_compact(spark, t, num_files=2)
    st = _resolve_state(spark, t, None)
    assert st["dvs"] == [] and st["dv_counts"] == {}
    assert table_read(spark, t).count() == 150


def test_mor_changefeed_restore_and_matview(spark, tmp_path):
    """The row-level feed emits exact delete preimages for dv commits
    (so the matview folds MoR deletes), and RESTORE across a dv commit
    moves the vectors with the snapshot."""
    from simple_data_workflow_spark.sources.matview import (
        refresh_aggregate_view,
    )
    from simple_data_workflow_spark.sources.tablelog import (
        table_changes_rowlevel,
        table_delete_where,
        table_restore,
    )

    d = str(tmp_path)
    src, view = f"{d}/mor_src", f"{d}/mor_view"
    df = spark.range(0, 120).selectExpr("id", "id % 3 AS g", "id AS x")
    table_commit(df, src)
    refresh_aggregate_view(spark, src, view, ["g"], sum_cols=["x"])
    table_delete_where(spark, src, "id < 30", mode="mor")
    ch = table_changes_rowlevel(spark, src, start_version=0)
    rows = {(r["_change_type"], r["id"]) for r in ch.collect()}
    assert rows == {("delete", i) for i in range(30)}
    table_commit(
        spark.range(200, 230).selectExpr("id", "id % 3 AS g", "id AS x"), src
    )
    refresh_aggregate_view(spark, src, view, ["g"], sum_cols=["x"])
    expect = {
        (r["g"], r["s"])
        for r in table_read(spark, src)
        .groupBy("g")
        .agg(__import__("pyspark.sql.functions", fromlist=["F"]).sum("x").alias("s"))
        .collect()
    }
    got = {(r["g"], r["sum_x"]) for r in table_read(spark, view).collect()}
    assert got == expect
    # restore to the pre-delete version resurrects; restore forward to
    # the dv version re-applies the vectors
    table_restore(spark, src, 0)
    assert table_read(spark, src).count() == 120
    table_restore(spark, src, 1)
    assert table_read(spark, src).count() == 90


def test_mor_clone_and_format_reader_dv_aware(spark, tmp_path):
    """A shallow clone carries the vectors (reads match the source);
    the session-free format('tablelog') reader applies them (round 9 —
    it previously REFUSED DV snapshots, forcing the compact-first
    workaround whose full-table rewrite is exactly the cost MoR
    exists to avoid). Planning reads the sidecars ONCE driver-side;
    each partition masks only its own file's positions."""
    from simple_data_workflow_spark.sources.tablelog import (
        table_clone,
        table_delete_where,
        table_row_count,
        table_update_where,
    )
    from simple_data_workflow_spark.streaming.tablelog_source import (
        TablelogStreamDataSource,
        _resolve_state_arrow,
    )

    src = str(tmp_path / "mor_clone_src")
    dst = str(tmp_path / "mor_clone_dst")
    table_commit(spark.range(0, 80).selectExpr("id").repartition(3), src)
    table_delete_where(spark, src, "id % 2 = 0", mode="mor")
    table_clone(spark, src, dst)
    assert table_read(spark, dst).count() == 40
    assert table_row_count(spark, dst) == 40
    # arrow-side state resolution surfaces the vectors instead of
    # raising, and the format reader masks them
    st = _resolve_state_arrow(src)
    assert st["dvs"]
    spark.dataSource.register(TablelogStreamDataSource)
    got = (
        spark.read.format("tablelog")
        .option("path", src)
        .load()
        .select("id")
        .orderBy("id")
        .collect()
    )
    want = sorted(r["id"] for r in table_read(spark, src).collect())
    assert [r["id"] for r in got] == want == list(range(1, 80, 2))
    # MoR UPDATE (vectors + postimage files in one entry) reads
    # exactly too, including through the shallow clone's absolute refs
    table_update_where(spark, src, {"id": "id + 1000"}, "id < 10", mode="mor")
    got2 = sorted(
        r["id"]
        for r in spark.read.format("tablelog")
        .option("path", src)
        .load()
        .collect()
    )
    want2 = sorted(r["id"] for r in table_read(spark, src).collect())
    assert got2 == want2
    got_clone = sorted(
        r["id"]
        for r in spark.read.format("tablelog")
        .option("path", dst)
        .load()
        .collect()
    )
    assert got_clone == sorted(r["id"] for r in table_read(spark, dst).collect())


def test_mor_delete_rebases_over_concurrent_append(
    spark, tmp_path, monkeypatch
):
    """A MoR DELETE racing a plain append folds extra vectors for the
    appended rows the predicate hits — same serializability as the
    copy-on-write rebase, still zero data-file rewrites."""
    import os as _os

    from simple_data_workflow_spark.sources.tablelog import (
        _resolve_state,
        table_delete_where,
    )

    t = str(tmp_path / "mor_rebase")
    table_commit(spark.range(0, 100).selectExpr("id"), t)
    _inject_before_dml(
        monkeypatch,
        "delete",
        lambda: table_commit(spark.range(0, 5).selectExpr("id"), t),
    )
    table_delete_where(spark, t, "id < 10", mode="mor")
    got = sorted(r["id"] for r in table_read(spark, t).collect())
    assert got == list(range(10, 100))
    st = _resolve_state(spark, t, None)
    assert sum(st["dv_counts"].values()) == 15  # 10 base + 5 appended


def test_mor_update_postimage_and_counts(spark, tmp_path):
    """Merge-on-read UPDATE: one atomic dv entry marks the preimages
    and appends the postimages — no existing file rewritten, COUNT(*)
    unchanged, reads see the new values, time travel sees the old."""
    import os as _os

    from simple_data_workflow_spark.sources.tablelog import (
        _resolve_state,
        table_row_count,
        table_update_where,
    )

    t = str(tmp_path / "mor_update")
    table_commit(
        spark.range(0, 100).selectExpr("id", "id AS v").repartition(4), t
    )
    data_before = sorted(_os.listdir(f"{t}/data"))
    table_update_where(spark, t, {"v": "v + 1000"}, "id % 10 = 3", mode="mor")
    assert set(data_before) <= set(_os.listdir(f"{t}/data"))
    st = _resolve_state(spark, t, None)
    assert st["dvs"] and sum(st["dv_counts"].values()) == 10
    got = {r["id"]: r["v"] for r in table_read(spark, t).collect()}
    assert len(got) == 100 and got[3] == 1003 and got[4] == 4
    assert table_row_count(spark, t) == 100  # metadata path, dv-adjusted
    old = {r["id"]: r["v"] for r in table_read(spark, t, version=0).collect()}
    assert old[3] == 3
    # a second MoR update over the SAME rows hits the postimages (which
    # live in added files), not the dv'd preimages
    table_update_where(spark, t, {"v": "v + 1"}, "id % 10 = 3", mode="mor")
    got2 = {r["id"]: r["v"] for r in table_read(spark, t).collect()}
    assert len(got2) == 100 and got2[3] == 1004


def test_mor_update_changefeed_and_matview(spark, tmp_path):
    """A MoR UPDATE surfaces as delete(pre)+insert(post) in the
    row-level feed, so the matview folds it exactly."""
    from simple_data_workflow_spark.sources.matview import (
        refresh_aggregate_view,
    )
    from simple_data_workflow_spark.sources.tablelog import (
        table_changes_rowlevel,
        table_update_where,
    )
    from pyspark.sql import functions as F

    d = str(tmp_path)
    src, view = f"{d}/moru_src", f"{d}/moru_view"
    table_commit(
        spark.range(0, 90).selectExpr("id", "id % 3 AS g", "id AS x"), src
    )
    refresh_aggregate_view(spark, src, view, ["g"], sum_cols=["x"])
    table_update_where(spark, src, {"x": "x + 500"}, "id < 9", mode="mor")
    ch = table_changes_rowlevel(spark, src, start_version=0)
    rows = {(r["_change_type"], r["id"], r["x"]) for r in ch.collect()}
    assert rows == {("delete", i, i) for i in range(9)} | {
        ("insert", i, i + 500) for i in range(9)
    }
    refresh_aggregate_view(spark, src, view, ["g"], sum_cols=["x"])
    expect = {
        (r["g"], r["s"])
        for r in table_read(spark, src)
        .groupBy("g")
        .agg(F.sum("x").alias("s"))
        .collect()
    }
    got = {(r["g"], r["sum_x"]) for r in table_read(spark, view).collect()}
    assert got == expect


def test_mor_merge_upsert_matches_cow(spark, tmp_path):
    """Merge-on-read MERGE: colliding target rows are deletion-vector
    marked and the batch appends as new files — no existing file
    rewritten, result identical to the copy-on-write merge, COUNT(*)
    exact from metadata, time travel sees the pre-merge rows."""
    import os as _os

    from simple_data_workflow_spark.sources.tablelog import (
        _resolve_state,
        table_merge_upsert,
        table_row_count,
    )

    d = str(tmp_path)
    batch = spark.range(95, 110).selectExpr("id", "id + 9000 AS v")
    for t, mode in ((f"{d}/cow", "cow"), (f"{d}/mor", "mor")):
        table_commit(
            spark.range(0, 100).selectExpr("id", "id AS v").repartition(4), t
        )
        if mode == "mor":
            data_before = sorted(_os.listdir(f"{t}/data"))
        table_merge_upsert(spark, t, batch, "id", mode=mode)
    cow = {(r["id"], r["v"]) for r in table_read(spark, f"{d}/cow").collect()}
    mor = {(r["id"], r["v"]) for r in table_read(spark, f"{d}/mor").collect()}
    assert mor == cow and len(mor) == 110
    # zero data files rewritten; vectors mark exactly the 5 collisions
    assert set(data_before) <= set(_os.listdir(f"{d}/mor/data"))
    st = _resolve_state(spark, f"{d}/mor", None)
    assert st["dvs"] and sum(st["dv_counts"].values()) == 5
    assert table_row_count(spark, f"{d}/mor") == 110  # metadata path
    assert table_read(spark, f"{d}/mor", version=0).count() == 100
    # a second MoR merge over the same keys hits the postimage files
    table_merge_upsert(
        spark,
        f"{d}/mor",
        spark.range(95, 110).selectExpr("id", "id + 20000 AS v"),
        "id",
        mode="mor",
    )
    got = {r["id"]: r["v"] for r in table_read(spark, f"{d}/mor").collect()}
    assert len(got) == 110 and got[95] == 20095 and got[94] == 94


def test_mor_merge_rebases_over_concurrent_append(
    spark, tmp_path, monkeypatch
):
    """A MoR MERGE racing a plain append DV-marks the appended rows
    with colliding keys (batch wins) — still zero rewrites."""
    from simple_data_workflow_spark.sources.tablelog import (
        _resolve_state,
        table_merge_upsert,
    )

    t = str(tmp_path / "mor_merge_rebase")
    table_commit(spark.range(0, 50).selectExpr("id", "id AS v"), t)
    _inject_before_dml(
        monkeypatch,
        "merge",
        lambda: table_commit(
            spark.range(45, 60).selectExpr("id", "id AS v"), t
        ),
    )
    table_merge_upsert(
        spark,
        t,
        spark.range(48, 55).selectExpr("id", "id + 7000 AS v"),
        "id",
        mode="mor",
    )
    got = {r["id"]: r["v"] for r in table_read(spark, t).collect()}
    assert len(got) == 60  # 0..59, no duplicates
    assert all(got[i] == i + 7000 for i in range(48, 55))
    assert all(got[i] == i for i in list(range(48)) + list(range(55, 60)))
    st = _resolve_state(spark, t, None)
    # collisions: 48,49 in base + 48..54 in the appended files = 2 + 7
    assert sum(st["dv_counts"].values()) == 9


def test_bloom_index_point_lookup_prunes_and_stays_exact(spark, tmp_path):
    """Per-file Bloom index: equality lookups on a high-cardinality
    string column prune files min/max cannot (every file spans the
    full hex range), and pruning never changes results — the true
    file always survives (driver hashlib == Spark md5 double-hash,
    bit for bit)."""
    from simple_data_workflow_spark.sources.tablelog import (
        _bloom_prune,
        _resolve_state,
        _stats_prune,
        table_scan,
    )

    t = str(tmp_path / "bloomed")
    df = spark.range(0, 4000).selectExpr(
        "id", "md5(CAST(id AS STRING)) AS tag"
    ).repartition(16)  # random placement: tag min/max useless per file
    table_commit(df, t, bloom_cols=["tag"])
    st = _resolve_state(spark, t, None)
    assert len(st["files"]) == 16
    assert all("__bloom" in st["stats"][f] for f in st["files"])
    import hashlib

    probe = hashlib.md5(b"1234").hexdigest()  # tag of id=1234, present
    filt = [("tag", "=", probe)]
    after_range = _stats_prune(st["stats"], st["files"], filt)
    after_bloom = _bloom_prune(st["stats"], after_range, filt)
    assert len(after_range) == 16  # min/max gave nothing
    assert len(after_bloom) < 16  # bloom pruned most files
    rows = table_scan(spark, t, filters=filt).collect()
    assert len(rows) == 1 and rows[0]["id"] == 1234
    # absent value: provably-absent files all pruned, scan exact-empty
    missing = hashlib.md5(b"nope-not-here").hexdigest()
    assert table_scan(spark, t, filters=[("tag", "=", missing)]).count() == 0
    # IN-list composes; integral columns probe too when indexed
    assert (
        table_scan(spark, t, filters=[("tag", "in", [probe, missing])]).count()
        == 1
    )


def test_bloom_spec_inherited_by_append_and_dml(spark, tmp_path):
    """The bloom spec rides the log like partition_by: plain appends
    and DML rewrites compute bitmaps for their new files without
    re-declaring, and checkpoint/truncation carries the spec."""
    from simple_data_workflow_spark.sources.tablelog import (
        _resolve_state,
        table_delete_where,
        table_scan,
        table_update_where,
    )

    t = str(tmp_path / "bloom_inherit")
    mk = "md5(CAST(id AS STRING)) AS tag"
    table_commit(
        spark.range(0, 500).selectExpr("id", mk), t, bloom_cols=["tag"]
    )
    table_commit(spark.range(500, 1000).selectExpr("id", mk), t)  # inherit
    table_delete_where(spark, t, "id % 97 = 0")  # cow rewrite re-blooms
    st = _resolve_state(spark, t, None)
    assert st["bloom"] == {"cols": ["tag"], "m": None, "k": 4}
    assert all("__bloom" in st["stats"][f] for f in st["files"])
    import hashlib

    probe = hashlib.md5(b"777").hexdigest()  # from the APPENDED commit
    rows = table_scan(spark, t, filters=[("tag", "=", probe)]).collect()
    assert len(rows) == 1 and rows[0]["id"] == 777
    # update keeps lookups exact through its rewrite
    table_update_where(spark, t, {"id": "id + 100000"}, f"tag = '{probe}'")
    rows = table_scan(spark, t, filters=[("tag", "=", probe)]).collect()
    assert len(rows) == 1 and rows[0]["id"] == 100777


def test_bloom_auto_sizes_bitmaps_from_file_density(spark, tmp_path):
    """Round-9 scale fix: the default spec (m=None) sizes each file's
    bitmap from its OBSERVED distinct count, so pruning power holds
    when rows-per-file grows 10×+ (the fixed 8192-bit default
    saturated at ~9.4k values/file: FPR ≈ 96%, pruning dead — the one
    round-8 defect). Dense files must get bigger bitmaps; an explicit
    bloom_m still pins the size; mixed-size payloads coexist."""
    import hashlib

    from simple_data_workflow_spark.sources.tablelog import (
        _bloom_prune,
        _resolve_state,
        table_scan,
    )

    t = str(tmp_path / "bloom_auto")
    mk = "md5(CAST(id AS STRING)) AS tag"
    # ~10k distinct values per file — exactly the density that killed
    # the fixed default
    table_commit(
        spark.range(0, 40000).selectExpr("id", mk).repartition(4),
        t,
        bloom_cols=["tag"],
    )
    st = _resolve_state(spark, t, None)
    metas = [st["stats"][f]["__bloom"]["tag"] for f in st["files"]]
    # auto-sizing: ~10 bits × ~10k values → ≥ 65536-bit bitmaps (the
    # fixed default would have stayed at 8192 and saturated)
    assert all(m["m"] >= 65536 for m in metas)
    # pruning effectiveness at this density: a present value keeps its
    # own file plus at most ~1% FPs; an absent value prunes everything
    probe = hashlib.md5(b"1234").hexdigest()
    filt = [("tag", "=", probe)]
    survivors = _bloom_prune(st["stats"], st["files"], filt)
    assert len(survivors) <= 2
    rows = table_scan(spark, t, filters=filt).collect()
    assert len(rows) == 1 and rows[0]["id"] == 1234
    missing = [("tag", "=", hashlib.md5(b"absent-key").hexdigest())]
    assert _bloom_prune(st["stats"], st["files"], missing) == []
    # explicit m pins the size (mixed payloads in one table are fine:
    # each bitmap is self-describing)
    table_commit(
        spark.range(40000, 40100).selectExpr("id", mk),
        t,
        bloom_cols=["tag"],
        bloom_m=8192,
    )
    st2 = _resolve_state(spark, t, None)
    sizes = {st2["stats"][f]["__bloom"]["tag"]["m"] for f in st2["files"]}
    assert 8192 in sizes and max(sizes) >= 65536
    probe2 = hashlib.md5(b"40050").hexdigest()
    rows = table_scan(spark, t, filters=[("tag", "=", probe2)]).collect()
    assert len(rows) == 1 and rows[0]["id"] == 40050


def test_partition_membership_never_prunes_on_cross_typed_equality(
    spark, tmp_path
):
    """Round-9 correctness fix: an INT partition column probed with a
    STRING literal ('2' in [2] is False in Python without raising)
    must NOT prune — table_scan's row-level filter CASTS and matches,
    so pruning would silently drop rows. Same-category equality keeps
    pruning; the membership evidence stays exact."""
    from simple_data_workflow_spark.sources.tablelog import (
        _resolve_state,
        _stats_prune,
        table_scan,
    )

    t = str(tmp_path / "xtyped")
    df = spark.range(0, 400).selectExpr("id", "CAST(id % 4 AS INT) AS g")
    table_commit(df, t, partition_by=["g"])
    st = _resolve_state(spark, t, None)
    # string literal against the int membership sets: NO pruning
    kept = _stats_prune(st["stats"], st["files"], [("g", "=", "2")])
    assert kept == st["files"]
    # ... and the scan (which casts row-level) returns every match
    assert table_scan(spark, t, filters=[("g", "=", "2")]).count() == 100
    assert (
        table_scan(spark, t, filters=[("g", "in", ["2", "3"])]).count() == 200
    )
    # same-category equality still prunes files by exact membership
    kept_int = _stats_prune(st["stats"], st["files"], [("g", "=", 2)])
    assert 0 < len(kept_int) < len(st["files"])
    assert table_scan(spark, t, filters=[("g", "=", 2)]).count() == 100


def test_rename_column_metadata_only_reads_dml_changes_clone(
    spark, tmp_path
):
    """ALTER TABLE RENAME COLUMN is metadata-only (files keep the
    stable PHYSICAL name) and every read path translates: snapshot
    reads, filtered scans (stats stay keyed physical), DML predicates,
    the row-level change feed, and clones. Round 9: first real
    coverage of the column-mapping surface."""
    from simple_data_workflow_spark.sources.tablelog import (
        _resolve_state,
        table_changes_rowlevel,
        table_clone,
        table_delete_where,
        table_rename_column,
        table_scan,
    )

    t = str(tmp_path / "ren")
    table_commit(
        spark.range(0, 100).selectExpr("id", "id % 5 AS g"), t,
        partition_by=["g"],
    )
    v_ren = table_rename_column(spark, t, "g", "grp")
    st = _resolve_state(spark, t, None)
    assert st["column_map"] == {"grp": "g"}
    assert st["partition_by"] == ["grp"]  # spec renamed atomically
    # snapshot read: logical name, real values (NOT null-filled)
    df = table_read(spark, t)
    assert df.columns == ["id", "grp"]
    assert df.where("grp = 2").count() == 20
    # filtered scan: logical filter translates to the physical-keyed
    # membership stats and still prunes
    assert table_scan(spark, t, filters=[("grp", "=", 2)]).count() == 20
    # DML under the new name; time travel to pre-rename still shows
    # the old name
    table_delete_where(spark, t, "grp = 4")
    assert table_read(spark, t).count() == 80
    assert table_read(spark, t, version=v_ren - 1).columns == ["id", "g"]
    # appends arrive LOGICAL and land under the stable physical
    table_commit(spark.range(100, 110).selectExpr("id", "id % 5 AS grp"), t)
    assert table_read(spark, t).where("grp = 2").count() == 22
    # row-level change feed presents logical names
    feed = table_changes_rowlevel(spark, t, v_ren, None)
    assert "grp" in feed.columns and "g" not in feed.columns
    # clones carry the map
    dst = str(tmp_path / "ren_clone")
    table_clone(spark, t, dst)
    assert table_read(spark, dst).where("grp = 2").count() == 22


def test_drop_column_then_readd_gets_fresh_physical(spark, tmp_path):
    """DROP COLUMN is metadata-only; a column RE-ADDED under the same
    logical name gets a FRESH physical, so old files can never
    resurrect the dropped column's data (they surface NULL)."""
    from simple_data_workflow_spark.sources.tablelog import (
        _resolve_state,
        table_drop_column,
    )

    t = str(tmp_path / "dropadd")
    table_commit(spark.range(0, 50).selectExpr("id", "id * 10 AS x"), t)
    table_drop_column(spark, t, "x")
    assert table_read(spark, t).columns == ["id"]
    # re-add x with DIFFERENT values via schema evolution
    table_commit(
        spark.range(50, 60).selectExpr("id", "id + 7 AS x"),
        t,
        evolve_schema=True,
    )
    st = _resolve_state(spark, t, None)
    # fresh physical allocated (old physical 'x' is retired)
    assert st["column_map"].get("x", "x") != "x"
    rows = {r["id"]: r["x"] for r in table_read(spark, t).collect()}
    assert len(rows) == 60
    # old rows: NULL (never id*10 resurrected); new rows: id + 7
    assert all(rows[i] is None for i in range(50))
    assert all(rows[i] == i + 7 for i in range(50, 60))


def test_format_reader_applies_column_map(spark, tmp_path):
    """The session-free format('tablelog') readers translate
    physical→logical (round 9): after a metadata-only rename, batch
    and streaming reads return the column's DATA under its new name —
    previously they probed files by logical name, missed, and
    silently NULL-filled."""
    from simple_data_workflow_spark.sources.tablelog import (
        table_rename_column,
    )
    from simple_data_workflow_spark.streaming.tablelog_source import (
        TablelogStreamDataSource,
    )

    t = str(tmp_path / "ren_fmt")
    table_commit(spark.range(0, 30).selectExpr("id", "id * 2 AS val"), t)
    table_rename_column(spark, t, "val", "doubled")
    spark.dataSource.register(TablelogStreamDataSource)
    got = (
        spark.read.format("tablelog").option("path", t).load()
        .select("id", "doubled").orderBy("id").collect()
    )
    assert [r["doubled"] for r in got] == [i * 2 for i in range(30)]
    # pushed filter on the renamed column translates to the
    # physical-keyed stats (no wrong pruning, right rows)
    n = (
        spark.read.format("tablelog").option("path", t).load()
        .where("doubled >= 40").count()
    )
    assert n == 10
    # streaming: the same file read path, so renamed columns stream
    # with data too
    import tempfile

    out = (
        spark.readStream.format("tablelog").option("path", t).load()
        .writeStream.format("memory").queryName("ren_fmt_q")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ren-ck-"))
        .trigger(availableNow=True).start()
    )
    out.awaitTermination(120)
    rows = spark.sql(
        "SELECT doubled FROM ren_fmt_q ORDER BY id"
    ).collect()
    assert [r["doubled"] for r in rows] == [i * 2 for i in range(30)]


def test_vacuum_is_clone_aware(spark, tmp_path):
    """Round 9: vacuuming a source after history truncation must NOT
    reap files a live shallow clone references (previously a
    documented corruption caveat). The clone registers a back-ref at
    creation; vacuum keeps every file the clone's retained log
    references, and garbage-collects markers of deleted clones."""
    import shutil

    from simple_data_workflow_spark.sources.tablelog import (
        table_clone,
        table_truncate_history,
        table_vacuum,
    )

    src = str(tmp_path / "vac_src")
    dst = str(tmp_path / "vac_dst")
    table_commit(spark.range(0, 60).selectExpr("id").repartition(2), src)
    table_clone(spark, src, dst)  # clone of v0's files
    # source moves on: overwrite drops v0's files from its OWN refs,
    # truncation forgets v0 entirely
    table_commit(
        spark.range(100, 130).selectExpr("id").repartition(2),
        src,
        mode="overwrite",
    )
    table_truncate_history(spark, src, keep_last=1)
    # vacuum must keep the clone-referenced v0 files alive
    table_vacuum(spark, src, retention_hours=0)
    got = sorted(r["id"] for r in table_read(spark, dst).collect())
    assert got == list(range(60))  # clone intact AFTER source vacuum
    assert sorted(r["id"] for r in table_read(spark, src).collect()) == list(
        range(100, 130)
    )
    # clone deleted → its marker is GC'd and the files finally reap
    shutil.rmtree(dst)
    reclaimed = table_vacuum(spark, src, retention_hours=0)
    assert reclaimed >= 2  # v0's data files now unreferenced
    import os as _os

    assert _os.listdir(f"{src}/_clones") == []  # marker gone too


def test_clone_of_clone_survives_original_vacuum(spark, tmp_path):
    """A second-level clone references the ORIGINAL's files directly
    (absolute refs pass through), so it registers a back-ref at the
    original too — vacuuming the original keeps its files alive."""
    from simple_data_workflow_spark.sources.tablelog import (
        table_clone,
        table_truncate_history,
        table_vacuum,
    )

    a = str(tmp_path / "gen_a")
    b = str(tmp_path / "gen_b")
    c = str(tmp_path / "gen_c")
    table_commit(spark.range(0, 40).selectExpr("id").repartition(2), a)
    table_clone(spark, a, b)
    table_clone(spark, b, c)  # refs point into a/data directly
    table_commit(
        spark.range(500, 510).selectExpr("id"), a, mode="overwrite"
    )
    table_truncate_history(spark, a, keep_last=1)
    table_vacuum(spark, a, retention_hours=0)
    assert sorted(r["id"] for r in table_read(spark, c).collect()) == list(
        range(40)
    )


def test_deep_clone_carries_constraints_and_bloom_spec(spark, tmp_path):
    """A deep clone is an independent COPY: CHECK constraints and the
    bloom spec's m/k must carry (previously constraints were dropped
    and a custom m/k silently reset — weaker ingest validation than
    the source's)."""
    import pytest as _pytest

    from simple_data_workflow_spark.sources.tablelog import (
        _resolve_state,
        table_clone,
        table_set_check_constraint,
    )

    src = str(tmp_path / "deep_src")
    dst = str(tmp_path / "deep_dst")
    table_commit(
        spark.range(0, 50).selectExpr("id", "CAST(id AS STRING) AS tag"),
        src,
        bloom_cols=["tag"],
        bloom_m=16384,
        bloom_k=5,
    )
    table_set_check_constraint(spark, src, "id_nonneg", "id >= 0")
    table_clone(spark, src, dst, deep=True)
    st = _resolve_state(spark, dst, None)
    assert st["constraints"] == {"id_nonneg": "id >= 0"}
    assert st["bloom"] == {"cols": ["tag"], "m": 16384, "k": 5}
    metas = [st["stats"][f]["__bloom"]["tag"] for f in st["files"]]
    assert all(m["m"] == 16384 and m["k"] == 5 for m in metas)
    # and the carried constraint actually enforces on the clone
    with _pytest.raises(ValueError, match="id_nonneg"):
        table_commit(spark.range(-5, 0).selectExpr(
            "id", "CAST(id AS STRING) AS tag"
        ), dst)


def test_partition_transforms_days_prune_and_stay_exact(spark, tmp_path):
    """Round 9: Iceberg-style hidden partitioning. A table partitioned
    by days(ts) clusters on the DAY, records per-file transformed
    value sets, and a filter on the RAW timestamp column prunes files
    (equality AND ranges — days() is order-preserving) while the
    row-level semantics stay exact."""
    from simple_data_workflow_spark.sources.tablelog import (
        _derive_transform_filters,
        _resolve_state,
        _stats_prune,
        table_scan,
    )

    t = str(tmp_path / "days_part")
    df = spark.range(0, 2000).selectExpr(
        "id",
        "timestampadd(MINUTE, CAST(id * 7 AS INT), "
        "TIMESTAMP '2024-03-01 00:00:00') AS ts",
    )  # ~10 distinct days, many rows each
    table_commit(df, t, partition_by=["days(ts)"])
    st = _resolve_state(spark, t, None)
    assert st["partition_by"] == ["days(ts)"]
    keys = {
        k
        for f in st["files"]
        for k in st["stats"].get(f, {}).get("__parts", {})
    }
    assert keys == {"days(ts)"}
    # equality on the raw column: derived membership prunes
    filt = [("ts", "=", "2024-03-05 12:34:00")]
    derived = _derive_transform_filters(["days(ts)"], filt, {})
    assert derived == [("days(ts)", "in", [19787])]  # 2024-03-05
    kept = _stats_prune(st["stats"], st["files"], filt + derived)
    assert 0 < len(kept) < len(st["files"])
    # range on the raw column: order-preserving transform derives
    rfilt = [("ts", ">=", "2024-03-09 00:00:00")]
    rkept = _stats_prune(
        st["stats"],
        st["files"],
        rfilt + _derive_transform_filters(["days(ts)"], rfilt, {}),
    )
    assert 0 < len(rkept) < len(st["files"])
    # semantics: pruned scan == unpruned count
    import datetime as dt

    want = df.where("ts >= TIMESTAMP '2024-03-09 00:00:00'").count()
    got = table_scan(
        spark, t, filters=[("ts", ">=", dt.datetime(2024, 3, 9))]
    ).count()
    assert got == want > 0
    # appends INHERIT the transform spec and stay prunable
    more = spark.range(5000, 5200).selectExpr(
        "id", "TIMESTAMP '2024-04-01 08:00:00' AS ts"
    )
    table_commit(more, t)
    st2 = _resolve_state(spark, t, None)
    newf = [f for f in st2["files"] if f not in set(st["files"])]
    newf_with_rows = [
        f for f in newf if st2["stats"].get(f, {}).get("__rows")
    ]
    assert newf_with_rows and all(
        "days(ts)" in st2["stats"][f].get("__parts", {})
        for f in newf_with_rows
    )
    april = [("ts", ">=", "2024-04-01 00:00:00")]
    akept = _stats_prune(
        st2["stats"],
        st2["files"],
        april + _derive_transform_filters(["days(ts)"], april, {}),
    )
    akept_rows = [f for f in akept if st2["stats"].get(f, {}).get("__rows")]
    # every surviving file WITH ROWS is an appended April file (empty
    # staged files carry no stats and survive conservatively)
    assert set(akept_rows) == set(newf_with_rows)


def test_partition_transforms_bucket_and_truncate(spark, tmp_path):
    """bucket(n, col): equality on the raw high-cardinality column
    prunes to ~1/n of files via the md5 hash bucket (ranges derive
    nothing — hash is not order-preserving); truncate(w, col) prunes
    string prefixes. Both exact under table_scan."""
    from simple_data_workflow_spark.sources.tablelog import (
        _derive_transform_filters,
        _resolve_state,
        _stats_prune,
        table_scan,
    )

    t = str(tmp_path / "bucket_part")
    df = spark.range(0, 4000).selectExpr(
        "id", "md5(CAST(id AS STRING)) AS tag"
    )
    table_commit(df, t, partition_by=["bucket(8,tag)"])
    st = _resolve_state(spark, t, None)
    import hashlib

    probe = hashlib.md5(b"123").hexdigest()
    filt = [("tag", "=", probe)]
    derived = _derive_transform_filters(["bucket(8,tag)"], filt, {})
    b = int(hashlib.md5(probe.encode()).hexdigest()[0:15], 16) % 8
    assert derived == [("bucket(8,tag)", "in", [b])]
    kept = _stats_prune(st["stats"], st["files"], filt + derived)
    assert 0 < len(kept) <= max(1, len(st["files"]) // 4)
    rows = table_scan(spark, t, filters=filt).collect()
    assert len(rows) == 1 and rows[0]["id"] == 123
    # range filters derive NO bucket evidence (hash order-free)
    assert (
        _derive_transform_filters(["bucket(8,tag)"], [("tag", ">", "ff")], {})
        == []
    )
    # truncate on strings: prefix membership + order preservation
    t2 = str(tmp_path / "trunc_part")
    df2 = spark.range(0, 1000).selectExpr(
        "id", "concat(CASE WHEN id % 4 = 0 THEN 'alpha' WHEN id % 4 = 1 "
        "THEN 'beta' WHEN id % 4 = 2 THEN 'gamma' ELSE 'delta' END, "
        "'-', CAST(id AS STRING)) AS name"
    )
    table_commit(df2, t2, partition_by=["truncate(2,name)"])
    st2 = _resolve_state(spark, t2, None)
    nf = [("name", "=", "beta-5")]
    nkept = _stats_prune(
        st2["stats"],
        st2["files"],
        nf + _derive_transform_filters(["truncate(2,name)"], nf, {}),
    )
    assert 0 < len(nkept) < len(st2["files"])
    assert table_scan(spark, t2, filters=nf).count() == 1


def test_isnull_pruning_and_vacuum_dry_run(spark, tmp_path):
    """Round 9 small wins: (a) ``("col","isnull",None)`` filters prune
    files whose stats record ZERO nulls and stay exact row-level;
    (b) ``table_vacuum(dry_run=True)`` counts reclaimable files and
    touches nothing — markers, data, and log all intact."""
    import os as _os

    from simple_data_workflow_spark.sources.tablelog import (
        _resolve_state,
        _stats_prune,
        table_scan,
        table_truncate_history,
        table_vacuum,
    )

    t = str(tmp_path / "nulls")
    clean = spark.range(0, 100).selectExpr("id", "id * 2 AS v")
    holey = spark.range(100, 200).selectExpr(
        "id", "CASE WHEN id % 10 = 0 THEN NULL ELSE id END AS v"
    )
    table_commit(clean.coalesce(1), t)
    table_commit(holey.coalesce(1), t)
    st = _resolve_state(spark, t, None)
    kept = _stats_prune(st["stats"], st["files"], [("v", "isnull", None)])
    assert len(kept) == 1  # the zero-null file is provably clean
    assert table_scan(spark, t, filters=[("v", "isnull", None)]).count() == 10
    assert (
        table_scan(spark, t, filters=[("v", "notnull", None)]).count() == 190
    )

    # vacuum dry run: overwrite strands the old files, truncation
    # forgets them; dry_run reports without deleting
    t2 = str(tmp_path / "dry")
    table_commit(spark.range(0, 50).selectExpr("id").repartition(2), t2)
    table_commit(
        spark.range(50, 60).selectExpr("id"), t2, mode="overwrite"
    )
    table_truncate_history(spark, t2, keep_last=1)
    n_files_before = len(_os.listdir(f"{t2}/data"))
    would = table_vacuum(spark, t2, retention_hours=0, dry_run=True)
    assert would >= 2
    assert len(_os.listdir(f"{t2}/data")) == n_files_before  # untouched
    did = table_vacuum(spark, t2, retention_hours=0)
    assert did == would  # the dry run predicted the real reclaim


def test_tags_read_pin_and_truncation_guard(spark, tmp_path):
    """Named version anchors (Iceberg-style tags): ``table_read(tag=)``
    resolves the pinned snapshot across later commits, truncation
    refuses to cut past a tag (drop_tags=True overrides, auditable),
    and the tag set survives checkpointed history."""
    import pytest as _pytest

    from simple_data_workflow_spark.sources.tablelog import (
        table_drop_tag,
        table_tag,
        table_tags,
        table_truncate_history,
    )

    t = str(tmp_path / "tags")
    table_commit(spark.range(0, 10).selectExpr("id"), t)          # v0
    table_commit(spark.range(10, 30).selectExpr("id"), t)         # v1
    table_tag(spark, t, "training-v1", version=1)                 # v2 (meta)
    table_commit(spark.range(30, 100).selectExpr("id"), t)        # v3
    assert table_tags(spark, t) == {"training-v1": 1}
    assert table_read(spark, t, tag="training-v1").count() == 30
    assert table_read(spark, t).count() == 100
    with _pytest.raises(ValueError, match="no tag"):
        table_read(spark, t, tag="nope")

    # truncation to HEAD-only would cut past the tag: loud refusal
    with _pytest.raises(ValueError, match="tagged"):
        table_truncate_history(spark, t, keep_last=1)
    # tag still resolves after the refused attempt
    assert table_read(spark, t, tag="training-v1").count() == 30
    # keeping enough history is fine (tag at v1 stays retained)
    assert table_truncate_history(spark, t, keep_last=4) == 0 or True

    # drop_tags=True publishes the tag deletion then truncates
    table_truncate_history(spark, t, keep_last=1, drop_tags=True)
    assert table_tags(spark, t) == {}
    assert table_read(spark, t).count() == 100

    # re-tag HEAD, then push past a checkpoint boundary: the tag rides
    # checkpoints, so resolution still works after many commits
    t2 = str(tmp_path / "tags_cp")
    table_commit(spark.range(0, 7).selectExpr("id"), t2)
    table_tag(spark, t2, "seed")  # defaults to latest (v0)
    for i in range(12):  # crosses the every-10-commits checkpoint
        table_commit(spark.range(i, i + 1).selectExpr("id"), t2)
    assert table_tags(spark, t2) == {"seed": 0}
    assert table_read(spark, t2, tag="seed").count() == 7
    table_drop_tag(spark, t2, "seed")
    assert table_tags(spark, t2) == {}


def test_files_and_partitions_metadata_tables(spark, tmp_path):
    """FILES/PARTITIONS metadata tables answer from the log alone:
    row counts net of deletion vectors, per-commit provenance, exact
    per-value rows for single-value files and honest NULL for
    hash-packed ones."""
    from simple_data_workflow_spark.sources.tablelog import (
        table_delete_where,
        table_files_df,
        table_partitions_df,
    )

    t = str(tmp_path / "meta")
    df = spark.range(0, 100).selectExpr(
        "id", "CASE WHEN id < 40 THEN 'a' ELSE 'b' END AS g"
    )
    # one commit per group value => single-value files => exact rows
    table_commit(
        df.where("g = 'a'").coalesce(1), t, partition_by=["g"]
    )
    table_commit(df.where("g = 'b'").coalesce(1), t)

    fdf = table_files_df(spark, t)
    rows = {r["file"]: r for r in fdf.collect()}
    assert len(rows) == 2
    assert sum(r["rows"] for r in rows.values()) == 100
    assert {r["commit_version"] for r in rows.values()} == {0, 1}
    assert all(r["size_bytes"] > 0 for r in rows.values())
    assert all(r["dv_deleted"] == 0 for r in rows.values())
    assert any(
        r["partition_values"] == {"g": ["a"]} for r in rows.values()
    )

    # MoR delete: metadata rows drop by the DV count without a scan
    table_delete_where(spark, t, "g = 'a' AND id < 10", mode="mor")
    pdf = table_partitions_df(spark, t)
    per_val = {(r["field"], r["value"]): r for r in pdf.collect()}
    assert per_val[("g", "a")]["n_rows"] == 30
    assert per_val[("g", "b")]["n_rows"] == 60
    assert per_val[("g", "a")]["n_files"] == 1

    # hash-packed multi-value files: 100 distinct values cluster into
    # at most 32 files (pigeonhole: some file holds several values),
    # and every value in such a file reports NULL rows, never a wrong
    # number — while n_files stays exact for all
    t2 = str(tmp_path / "meta2")
    table_commit(
        spark.range(0, 1000).selectExpr("id", "id % 100 AS g"),
        t2,
        partition_by=["g"],
    )
    p2rows = table_partitions_df(spark, t2).collect()
    assert len(p2rows) == 100
    assert any(r["n_rows"] is None for r in p2rows)
    assert all(r["n_files"] >= 1 for r in p2rows)


def test_write_audit_publish_roundtrip(spark, tmp_path):
    """WAP: stage on a shallow clone, audit there, publish back as one
    atomic conflict-checked commit; production readers never see the
    intermediate states, and a concurrent commit on the target makes
    publication fail loudly instead of clobbering it."""
    import pytest as _pytest

    from simple_data_workflow_spark.sources.tablelog import (
        ConcurrentWriteConflict,
        table_clone,
        table_delete_where,
        table_publish_from,
        table_scan,
        table_set_check_constraint,
    )

    src = str(tmp_path / "prod")
    table_commit(
        spark.range(0, 50).selectExpr("id", "id % 5 AS bucket"), src
    )
    table_set_check_constraint(spark, src, "nonneg", "id >= 0")

    # stage: clone + append + DML, audited away from prod
    stage = str(tmp_path / "stage")
    table_clone(spark, src, stage)
    table_commit(
        spark.range(50, 80).selectExpr("id", "id % 5 AS bucket"), stage
    )
    table_delete_where(spark, stage, "id < 10")
    # prod is untouched while the stage diverges
    assert table_read(spark, src).count() == 50
    assert table_read(spark, stage).count() == 70

    v = table_publish_from(spark, src, stage)
    assert v == 2  # commit 0 + constraint meta 1 + publish 2
    got = {r["id"] for r in table_read(spark, src).collect()}
    assert got == set(range(10, 80))
    # stats/pruning and the constraint set survived publication
    assert table_scan(spark, src, filters=[("id", ">=", 70)]).count() == 10
    state = __import__(
        "simple_data_workflow_spark.sources.tablelog", fromlist=["x"]
    )._resolve_state(spark, src, None)
    assert "nonneg" in state["constraints"]

    # the published table no longer depends on the stage directory
    import shutil

    shutil.rmtree(stage)
    assert table_read(spark, src).count() == 70

    # conflict: a commit lands on src after cloning => publish raises
    stage2 = str(tmp_path / "stage2")
    table_clone(spark, src, stage2)
    table_commit(
        spark.range(80, 82).selectExpr("id", "id % 5 AS bucket"), stage2
    )
    table_commit(
        spark.range(900, 901).selectExpr("id", "id % 5 AS bucket"), src
    )
    with _pytest.raises(ConcurrentWriteConflict):
        table_publish_from(spark, src, stage2)
    # the interleaved commit survives untouched
    assert 900 in {r["id"] for r in table_read(spark, src).collect()}

    # a non-clone table cannot masquerade as a stage
    rogue = str(tmp_path / "rogue")
    table_commit(spark.range(5).selectExpr("id", "id % 5 AS bucket"), rogue)
    with _pytest.raises(ValueError, match="not cloned"):
        table_publish_from(spark, src, rogue)


def test_publish_carries_mor_deletion_vectors(spark, tmp_path):
    """A stage whose audit used merge-on-read DML publishes its DVs:
    the target reads the masked snapshot without a compaction, and the
    linked sidecars stay valid after the stage directory is deleted."""
    import shutil

    from simple_data_workflow_spark.sources.tablelog import (
        table_clone,
        table_delete_where,
        table_publish_from,
        table_row_count,
    )

    src = str(tmp_path / "prod_mor")
    table_commit(spark.range(0, 40).selectExpr("id"), src)
    stage = str(tmp_path / "stage_mor")
    table_clone(spark, src, stage)
    # MoR delete on the stage: prod's file is untouched; the DV
    # sidecar lands under the STAGE's data dir
    table_delete_where(spark, stage, "id >= 30", mode="mor")
    assert table_read(spark, stage).count() == 30
    table_publish_from(spark, src, stage)
    shutil.rmtree(stage)
    assert {r["id"] for r in table_read(spark, src).collect()} == set(
        range(30)
    )
    # metadata-only COUNT nets out the published DV counts
    assert table_row_count(spark, src) == 30


def test_format_reader_tag_option(spark, tmp_path):
    """``spark.read.format("tablelog").option("tag", ...)``: the
    session-free reader resolves a named anchor to its pinned version
    AND reads with the schema AS OF that version — a tag created
    before a rename surfaces the old column names with data, while
    the un-optioned read sees HEAD."""
    import pytest as _pytest

    from simple_data_workflow_spark.sources.tablelog import (
        table_rename_column,
        table_tag,
    )
    from simple_data_workflow_spark.streaming.tablelog_source import (
        TablelogStreamDataSource,
    )

    t = str(tmp_path / "tag_fmt")
    table_commit(spark.range(0, 20).selectExpr("id", "id * 2 AS val"), t)
    table_tag(spark, t, "v1")
    table_rename_column(spark, t, "val", "doubled")
    table_commit(
        spark.range(20, 50).selectExpr("id", "id * 2 AS doubled"), t
    )
    spark.dataSource.register(TablelogStreamDataSource)
    tagged = (
        spark.read.format("tablelog").option("path", t)
        .option("tag", "v1").load()
    )
    assert "val" in tagged.columns and "doubled" not in tagged.columns
    got = tagged.select("id", "val").orderBy("id").collect()
    assert [r["val"] for r in got] == [i * 2 for i in range(20)]
    head = spark.read.format("tablelog").option("path", t).load()
    assert "doubled" in head.columns and head.count() == 50
    with _pytest.raises(Exception, match="no tag"):
        spark.read.format("tablelog").option("path", t).option(
            "tag", "nope"
        ).load().count()


def test_table_verify_fsck(spark, tmp_path):
    """``table_verify``: metadata-only consistency audit. Healthy table
    (appends + MoR delete + tag + clone) => ok; physically deleting a
    referenced data file, or hand-corrupting a clone marker, each
    produce a named issue. ``check_rows=True`` cross-checks metadata
    COUNT against a physical scan."""
    import os as _os

    from simple_data_workflow_spark.sources.tablelog import (
        table_clone,
        table_delete_where,
        table_tag,
        table_verify,
    )

    t = str(tmp_path / "fsck")
    table_commit(spark.range(0, 50).selectExpr("id").repartition(2), t)
    table_commit(spark.range(50, 60).selectExpr("id"), t)
    table_delete_where(spark, t, "id < 5", mode="mor")
    table_tag(spark, t, "ok-tag")
    table_clone(spark, t, str(tmp_path / "fsck_clone"))
    rep = table_verify(spark, t, check_rows=True)
    assert rep["ok"], rep["issues"]
    assert rep["checked_files"] >= 4  # 3 data files + 1 DV sidecar

    # corrupt a clone marker: named issue, not a silent vacuum hazard
    mdir = f"{t}/_clones"
    marker = next(m for m in _os.listdir(mdir) if m.endswith(".json"))
    with open(f"{mdir}/{marker}", "w") as fh:
        fh.write("{not json")
    rep2 = table_verify(spark, t)
    assert not rep2["ok"]
    assert any("clone marker" in i for i in rep2["issues"])
    _os.unlink(f"{mdir}/{marker}")

    # physically delete a referenced data file => named issue
    victim = next(
        f for f in _os.listdir(f"{t}/data") if f.endswith(".parquet")
    )
    _os.unlink(f"{t}/data/{victim}")
    rep3 = table_verify(spark, t)
    assert not rep3["ok"]
    assert any(victim in i and "missing" in i for i in rep3["issues"])


def test_format_reader_timestamp_as_of(spark, tmp_path):
    """``.option("timestampAsOf", ...)`` on the session-free reader:
    resolves the newest version committed at or before the timestamp
    from the log's durable ``ts`` fields — Delta's TIMESTAMP AS OF on
    the format surface."""
    import pytest as _pytest

    from simple_data_workflow_spark.sources.tablelog import table_history
    from simple_data_workflow_spark.streaming.tablelog_source import (
        TablelogStreamDataSource,
    )

    t = str(tmp_path / "tsopt")
    table_commit(spark.range(0, 10).selectExpr("id"), t)
    table_commit(spark.range(10, 40).selectExpr("id"), t)
    t0 = table_history(spark, t)[0]["timestamp"]
    spark.dataSource.register(TablelogStreamDataSource)
    n0 = (
        spark.read.format("tablelog").option("path", t)
        .option("timestampAsOf", t0).load().count()
    )
    assert n0 == 10
    with _pytest.raises(Exception, match="predates"):
        spark.read.format("tablelog").option("path", t).option(
            "timestampAsOf", "1999-01-01T00:00:00+00:00"
        ).load().count()
    with _pytest.raises(Exception, match="at most one"):
        spark.read.format("tablelog").option("path", t).option(
            "timestampAsOf", t0
        ).option("version", "1").load().count()


def test_streaming_change_feed_matches_rowlevel(spark, tmp_path):
    """``readStream.format("tablelog").option("readChangeFeed","true")``:
    the streamed feed (appends = inserts; MoR DELETE/UPDATE = exact
    row-level deletes from the sidecar positions + postimage inserts;
    compaction = nothing) equals the batch ``table_changes_rowlevel``
    multiset over the same version range."""
    import tempfile

    from simple_data_workflow_spark.sources.tablelog import (
        table_changes_rowlevel,
        table_compact_small,
        table_delete_where,
        table_update_where,
    )
    from simple_data_workflow_spark.streaming.tablelog_source import (
        TablelogStreamDataSource,
    )

    t = str(tmp_path / "cdf_stream")
    table_commit(
        spark.range(0, 30).selectExpr("id", "id % 3 AS g").repartition(2), t
    )
    table_commit(spark.range(30, 40).selectExpr("id", "id % 3 AS g"), t)
    table_delete_where(spark, t, "id < 5", mode="mor")
    table_update_where(
        spark, t, {"g": "g + 100"}, "id >= 35", mode="mor"
    )
    table_compact_small(spark, t)  # byte rewrite: must stream nothing

    spark.dataSource.register(TablelogStreamDataSource)
    q = (
        spark.readStream.format("tablelog").option("path", t)
        .option("readChangeFeed", "true").load()
        .writeStream.format("memory").queryName("cdf_q")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="cdf-ck-"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["id"], r["g"], r["_change_type"], r["_commit_version"])
        for r in spark.sql("SELECT * FROM cdf_q").collect()
    }
    batch = {
        (r["id"], r["g"], r["_change_type"], r["_commit_version"])
        for r in table_changes_rowlevel(spark, t, -1).collect()
    }
    assert streamed == batch
    # sanity on the shape itself: 40 inserts + 5 deletes +
    # (5 deletes + 5 inserts) for the MoR update, nothing for compact
    assert len(streamed) == 55
    assert sum(1 for s in streamed if s[2] == "delete") == 10


def test_add_column_metadata_only(spark, tmp_path):
    """ALTER TABLE ADD COLUMN without a data batch: old files NULL-fill
    the new column, later appends carry it, and re-adding a column
    under a DROPPED column's name gets a fresh physical — the retired
    data never resurrects."""
    import os as _os

    import pytest as _pytest

    from simple_data_workflow_spark.sources.tablelog import (
        table_add_column,
        table_drop_column,
    )

    t = str(tmp_path / "addcol")
    table_commit(spark.range(0, 10).selectExpr("id", "id * 2 AS v"), t)
    mtimes = {
        f: _os.path.getmtime(f"{t}/data/{f}")
        for f in _os.listdir(f"{t}/data")
    }
    table_add_column(spark, t, "note", "string")
    got = table_read(spark, t)
    assert got.columns == ["id", "v", "note"]
    assert got.where("note IS NULL").count() == 10
    # pure DDL: no data file touched
    assert all(
        _os.path.getmtime(f"{t}/data/{f}") == m for f, m in mtimes.items()
    )
    with _pytest.raises(ValueError, match="already exists"):
        table_add_column(spark, t, "v", "string")
    # appends carry the widened schema
    table_commit(
        spark.range(10, 15).selectExpr(
            "id", "id * 2 AS v", "CAST('x' AS STRING) AS note"
        ),
        t,
    )
    assert table_read(spark, t).where("note = 'x'").count() == 5

    # drop + re-add under the same name: fresh physical, old data dead
    table_drop_column(spark, t, "note")
    table_add_column(spark, t, "note", "string")
    again = table_read(spark, t)
    assert again.where("note IS NOT NULL").count() == 0  # 'x' stays buried
    # time travel still sees the pre-drop values
    assert table_read(spark, t, version=2).where("note = 'x'").count() == 5


def test_restore_to_tag_and_starting_tag_stream(spark, tmp_path):
    """Tag composition: RESTORE TABLE TO TAG rolls back by name, and a
    change-feed stream with ``startingTag`` delivers exactly the
    commits AFTER the tagged snapshot."""
    import tempfile

    from simple_data_workflow_spark.sources.tablelog import (
        table_restore,
        table_tag,
    )
    from simple_data_workflow_spark.streaming.tablelog_source import (
        TablelogStreamDataSource,
    )

    t = str(tmp_path / "tagflow")
    table_commit(spark.range(0, 20).selectExpr("id"), t)   # v0
    table_tag(spark, t, "trained-on")                      # v1
    table_commit(spark.range(20, 50).selectExpr("id"), t)  # v2
    table_commit(spark.range(50, 60).selectExpr("id"), t)  # v3

    spark.dataSource.register(TablelogStreamDataSource)
    q = (
        spark.readStream.format("tablelog").option("path", t)
        .option("startingTag", "trained-on")
        .option("readChangeFeed", "true").load()
        .writeStream.format("memory").queryName("since_tag_q")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="stag-ck-"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM since_tag_q").collect()
    # only the two post-tag appends stream (tag pins v0; v1 is the tag
    # meta commit itself — no rows)
    assert {r["id"] for r in rows} == set(range(20, 60))
    assert all(r["_change_type"] == "insert" for r in rows)

    # restore by name: back to the tagged snapshot, one metadata commit
    table_restore(spark, t, tag="trained-on")
    assert {r["id"] for r in table_read(spark, t).collect()} == set(range(20))


def test_cdf_stream_maintains_aggregate_exactly(spark, tmp_path):
    """End-to-end composition: a grouped SUM/COUNT maintained from the
    STREAMING change feed of a MoR-maintained table equals the full
    recompute — the change stream's insert/delete rows map straight
    onto ``incremental_agg_apply``'s I/D contract, so a 100 TB fact
    table's aggregate refreshes at O(changes) from the stream."""
    import tempfile

    from simple_data_workflow_spark.operators.cdc import (
        incremental_agg_apply,
    )
    from simple_data_workflow_spark.sources.tablelog import (
        table_delete_where,
        table_update_where,
    )
    from simple_data_workflow_spark.streaming.tablelog_source import (
        TablelogStreamDataSource,
    )
    from pyspark.sql import functions as F

    t = str(tmp_path / "cdf_agg")
    table_commit(
        spark.range(0, 100).selectExpr("id", "id % 4 AS g", "id * 1.0 AS v"),
        t,
    )
    table_delete_where(spark, t, "id < 10", mode="mor")
    table_update_where(spark, t, {"v": "v + 1000.0"}, "id >= 90", mode="mor")

    spark.dataSource.register(TablelogStreamDataSource)
    q = (
        spark.readStream.format("tablelog").option("path", t)
        .option("readChangeFeed", "true").load()
        .writeStream.format("memory").queryName("cdf_agg_q")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="cagg-ck-"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    feed = spark.sql("SELECT * FROM cdf_agg_q")
    cdc = feed.select(
        F.when(F.col("_change_type") == "insert", "I").otherwise("D").alias("op"),
        "g",
        F.when(F.col("_change_type") == "delete", F.col("v")).alias("old_val"),
        F.when(F.col("_change_type") == "insert", F.col("v")).alias("new_val"),
    )
    empty = spark.createDataFrame(
        [], "g bigint, sum_val double, n_rows bigint"
    )
    got = {
        r["g"]: (r["sum_val"], r["n_rows"])
        for r in incremental_agg_apply(empty, cdc, ["g"]).collect()
    }
    want = {
        r["g"]: (r["s"], r["n"])
        for r in table_read(spark, t)
        .groupBy("g").agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(got) == set(want)
    for g in want:
        assert got[g][1] == want[g][1]
        assert abs(float(got[g][0]) - float(want[g][0])) < 1e-6


def test_vacuum_keeps_young_inflight_clone_marker(spark, tmp_path):
    """Round 10 (ADVICE r9 medium): an in-flight table_clone registers
    its back-ref marker BEFORE its commit publishes, so a no-log
    marker younger than the vacuum retention horizon is
    indistinguishable from a failed clone and must SURVIVE the vacuum
    — reaping it would let a later vacuum (after source history
    truncation) corrupt the by-then-live clone. Only markers older
    than the horizon are garbage-collected."""
    import json as _json
    import os as _os

    from simple_data_workflow_spark.sources.tablelog import (
        _clone_referenced_names,
    )

    src = str(tmp_path / "toctou_src")
    table_commit(spark.range(0, 30).selectExpr("id").repartition(2), src)
    _os.makedirs(f"{src}/_clones", exist_ok=True)
    now_ms = __import__("time").time() * 1000
    # marker of a clone whose commit hasn't published yet (fresh ts)
    with open(f"{src}/_clones/inflight.json", "w") as f:
        _json.dump({"dst": str(tmp_path / "no_log_yet"), "ts": now_ms}, f)
    # marker of a clone that failed long ago (ancient ts)
    with open(f"{src}/_clones/failed.json", "w") as f:
        _json.dump(
            {"dst": str(tmp_path / "never_landed"), "ts": now_ms - 10 * 86400e3},
            f,
        )
    table_vacuum(spark, src, retention_hours=1.0)
    left = sorted(_os.listdir(f"{src}/_clones"))
    assert left == ["inflight.json"], left  # young kept, ancient reaped
    # a GC pass with no horizon touches nothing
    _clone_referenced_names(spark, src, gc=True, gc_before_ms=None)
    assert sorted(_os.listdir(f"{src}/_clones")) == ["inflight.json"]


def test_temporal_partition_transform_requires_utc_session(spark, tmp_path):
    """Round 10 (ADVICE r9 low): days()/hours()/months()/years()
    record transformed partition values through the SESSION timezone
    while the driver-side pruning twin is fixed to UTC — a non-UTC
    writer would poison derived pruning into silently dropping
    matching files. table_commit must refuse; bucket()/truncate()
    (timezone-free) must not; and a non-UTC READER simply skips
    temporal derivation (conservative, never wrong)."""
    import pytest as _pytest

    from simple_data_workflow_spark.sources.tablelog import (
        _derive_transform_filters,
        table_scan,
    )

    t = str(tmp_path / "tz_tbl")
    df = spark.sql(
        "SELECT id, timestampadd(HOUR, CAST(id AS INT), "
        "TIMESTAMP'2024-01-01 00:00:00') AS ts FROM range(0, 96)"
    )
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    table_commit(df, t, partition_by=["days(ts)"])
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        with _pytest.raises(ValueError, match="timeZone"):
            table_commit(df, str(tmp_path / "tz_bad"), partition_by=["days(ts)"])
        # timezone-free transforms stay allowed
        table_commit(
            spark.range(0, 10).selectExpr("id"),
            str(tmp_path / "tz_ok"),
            partition_by=["bucket(4, id)"],
        )
        # non-UTC reader: correctness intact — the literal is first
        # normalized to the UTC instant the session means, so both
        # min/max-stats pruning and days() derivation compare the same
        # instant the row-level filter will. The literal means Tokyo
        # time (= 2024-01-02 15:00 UTC): the filter keeps 9 rows from
        # the Jan-2-UTC day file that unnormalized UTC pruning
        # (ts >= Jan 3 / days(ts) >= Jan 3) silently dropped.
        got = table_scan(
            spark, t, filters=[("ts", ">=", "2024-01-03 00:00:00")]
        ).count()
        expect = (
            table_read(spark, t).where("ts >= '2024-01-03 00:00:00'").count()
        )
        assert got == expect and expect == 48 + 9
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    # unit: temporal derivation gated on utc_ok; bucket unaffected
    pf = [("ts", "=", "2024-01-02"), ("k", "=", "x")]
    spec = ["days(ts)", "bucket(8, k)"]
    utc = _derive_transform_filters(spec, pf, None, utc_ok=True)
    non = _derive_transform_filters(spec, pf, None, utc_ok=False)
    assert any(c == "days(ts)" for c, _, _ in utc)
    assert not any(c == "days(ts)" for c, _, _ in non)
    assert any(c == "bucket(8,k)" for c, _, _ in non)


def test_widen_column_metadata_only(spark, tmp_path):
    """Round 10 (VERDICT r9 #10): ALTER COLUMN int->bigint /
    float->double is ONE metadata entry — old files keep their narrow
    parquet encoding and every reader up-casts at scan time; time
    travel across the widen still shows the old type; narrowing and
    cross-family changes refuse."""
    import os as _os

    import pytest as _pytest

    from simple_data_workflow_spark.sources.tablelog import (
        table_scan,
        table_widen_column,
    )

    t = str(tmp_path / "widen_tbl")
    table_commit(
        spark.range(0, 50).selectExpr(
            "cast(id as int) as k", "cast(id as float) as v"
        ),
        t,
    )
    mtimes = {
        f: _os.path.getmtime(f"{t}/data/{f}")
        for f in _os.listdir(f"{t}/data")
    }
    v1 = table_widen_column(spark, t, "k", "bigint")
    v2 = table_widen_column(spark, t, "v", "double")
    # zero data movement
    assert {
        f: _os.path.getmtime(f"{t}/data/{f}") for f in _os.listdir(f"{t}/data")
    } == mtimes
    df = table_read(spark, t)
    assert df.schema["k"].dataType.simpleString() == "bigint"
    assert df.schema["v"].dataType.simpleString() == "double"
    assert df.count() == 50 and df.where("k = 7").count() == 1
    # session-free format reader casts per the logged schema too
    from simple_data_workflow_spark.streaming.tablelog_source import (
        TablelogStreamDataSource,
    )

    spark.dataSource.register(TablelogStreamDataSource)
    fmt = spark.read.format("tablelog").option("path", t).load()
    assert fmt.schema["k"].dataType.simpleString() == "bigint"
    assert fmt.where("k = 7").count() == 1
    # pre-widen version reads the narrow type (time travel intact)
    old = table_read(spark, t, version=v1 - 1)
    assert old.schema["k"].dataType.simpleString() == "int"
    # appends now write the wide type; stats pruning still prunes on k
    table_commit(
        spark.range(1000, 1050).selectExpr(
            "cast(id as bigint) as k", "cast(id as double) as v"
        ),
        t,
    )
    assert table_read(spark, t).count() == 100
    assert table_scan(spark, t, filters=[("k", ">=", 1000)]).count() == 50
    # refusals: narrowing, cross-family, unknown column
    with _pytest.raises(TypeError, match="widen"):
        table_widen_column(spark, t, "v", "float")
    with _pytest.raises(TypeError, match="widen"):
        table_widen_column(spark, t, "k", "string")
    with _pytest.raises(ValueError, match="not in"):
        table_widen_column(spark, t, "nope", "bigint")
    assert v2 == v1 + 1


def test_merge_schema_evolution_cow_and_mor(spark, tmp_path):
    """MERGE with evolve_schema=True adopts net-new source columns
    (Delta's withSchemaEvolution): untouched files surface them as
    NULL, rewritten/appended files carry the values, and the widened
    schema + data publish in ONE atomic commit. Without the flag the
    extra column raises."""
    import pytest as _pytest

    from simple_data_workflow_spark.sources.tablelog import (
        table_merge_upsert,
    )

    for mode in ("cow", "mor"):
        t = str(tmp_path / f"mev_{mode}")
        table_commit(
            spark.range(0, 20).selectExpr("id as k", "id * 2 as v")
            .repartition(4),
            t,
        )
        batch = spark.createDataFrame(
            [(5, 500, "gold"), (100, 1000, "new")],
            "k long, v long, tier string",
        )
        with _pytest.raises(TypeError, match="evolve_schema"):
            table_merge_upsert(spark, t, batch, "k", mode=mode)
        with _pytest.raises(TypeError, match="every existing column"):
            table_merge_upsert(
                spark,
                t,
                batch.select("k", "tier"),
                "k",
                mode=mode,
                evolve_schema=True,
            )
        table_merge_upsert(
            spark, t, batch, "k", mode=mode, evolve_schema=True
        )
        got = {
            r["k"]: (r["v"], r["tier"])
            for r in table_read(spark, t).collect()
        }
        assert len(got) == 21
        assert got[5] == (500, "gold")  # collided: batch row with value
        assert got[100] == (1000, "new")  # inserted
        assert got[3] == (6, None)  # untouched row: NULL-filled
        # next plain append must carry the evolved schema
        table_commit(
            spark.createDataFrame([(200, 7, "x")], "k long, v long, tier string"),
            t,
        )
        assert table_read(spark, t).where("tier = 'x'").count() == 1


def test_merge_evolution_never_resurrects_dropped_column(spark, tmp_path):
    """A MERGE-adopted column whose name matches a DROPPED column gets
    a fresh physical — old files must never resurrect the retired
    data under the new column."""
    from simple_data_workflow_spark.sources.tablelog import (
        table_drop_column,
        table_merge_upsert,
    )

    t = str(tmp_path / "mev_drop")
    table_commit(
        spark.range(0, 10).selectExpr(
            "id as k", "id * 2 as v", "concat('old', id) as tag"
        ),
        t,
    )
    table_drop_column(spark, t, "tag")
    batch = spark.createDataFrame(
        [(3, 333, "fresh")], "k long, v long, tag string"
    )
    table_merge_upsert(spark, t, batch, "k", evolve_schema=True)
    got = {r["k"]: r["tag"] for r in table_read(spark, t).collect()}
    assert got[3] == "fresh"
    # every untouched row reads NULL — NOT the dropped column's data
    assert all(v is None for k, v in got.items() if k != 3)
