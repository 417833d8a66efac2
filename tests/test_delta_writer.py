"""Jar-free Delta Lake WRITE interop (round 10): the writer must emit
spec-conformant ``_delta_log`` trees (delta.io PROTOCOL.md) that this
repo's own jar-free reader — pinned against hand-written fixtures in
``test_delta_reader.py`` — replays to exactly the written rows, with
partition columns absent from the data files, percent-encoded paths,
per-file stats, checkpoints, and optimistic-concurrency commits."""

import glob
import json
import os

import pytest

from simple_data_workflow_spark.sources import delta_writer as dw
from simple_data_workflow_spark.sources.delta_reader import delta_read
from simple_data_workflow_spark.sources.delta_writer import (
    DeltaConcurrentWrite,
    DeltaSchemaMismatch,
    delta_checkpoint,
    delta_write,
)


def _rows(df, *cols):
    return {tuple(r[c] for c in cols) for r in df.collect()}


def test_create_append_overwrite_roundtrip_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "dw")
    d0 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, tag string")
    assert delta_write(d0, root, mode="error") == 0
    with pytest.raises(ValueError, match="already exists"):
        delta_write(d0, root, mode="error")

    # append with REORDERED columns: canonicalized to the table order
    d1 = spark.createDataFrame([("c", 3)], "tag string, id long")
    assert delta_write(d1, root, mode="append") == 1
    assert _rows(delta_read(spark, root), "id", "tag") == {
        (1, "a"), (2, "b"), (3, "c"),
    }
    assert _rows(delta_read(spark, root, 0), "id", "tag") == {
        (1, "a"), (2, "b"),
    }

    d2 = spark.createDataFrame([(9, "z")], "id long, tag string")
    assert delta_write(d2, root, mode="overwrite") == 2
    assert _rows(delta_read(spark, root), "id", "tag") == {(9, "z")}
    # pre-overwrite snapshot still time-travels
    assert _rows(delta_read(spark, root, 1), "id", "tag") == {
        (1, "a"), (2, "b"), (3, "c"),
    }
    # log is spec-shaped: v0 carries protocol+metaData, v2 removes
    with open(f"{root}/_delta_log/{0:020d}.json") as f:
        kinds = [next(iter(json.loads(l))) for l in f if l.strip()]
    assert "protocol" in kinds and "metaData" in kinds and "add" in kinds
    with open(f"{root}/_delta_log/{2:020d}.json") as f:
        kinds = [next(iter(json.loads(l))) for l in f if l.strip()]
    assert "remove" in kinds


def test_partitioned_layout_nulls_and_stats(spark, tmp_path):
    """Partition columns live only in the log (Hive-style dirs, NULL ⇄
    __HIVE_DEFAULT_PARTITION__); every add carries footer-derived
    stats JSON."""
    root = str(tmp_path / "dwp")
    df = spark.createDataFrame(
        [(1, 10.0, "US"), (2, 20.0, "US"), (3, 30.0, None)],
        "id long, v double, region string",
    )
    delta_write(df, root, mode="error", partition_by=["region"])
    got = delta_read(spark, root)
    assert _rows(got, "id", "v", "region") == {
        (1, 10.0, "US"), (2, 20.0, "US"), (3, 30.0, None),
    }
    # NULL partition dir per spec; partition col absent from data files
    null_files = glob.glob(
        f"{root}/region=__HIVE_DEFAULT_PARTITION__/*.parquet"
    )
    assert null_files
    raw = spark.read.parquet(null_files[0])
    assert "region" not in raw.columns and "id" in raw.columns

    with open(f"{root}/_delta_log/{0:020d}.json") as f:
        adds = [
            json.loads(l)["add"] for l in f if l.strip() and '"add"' in l
        ]
    assert adds
    total = 0
    for a in adds:
        assert set(a["partitionValues"]) == {"region"}
        st = json.loads(a["stats"])
        total += st["numRecords"]
        assert "id" in st["minValues"] and "id" in st["maxValues"]
        assert "region" not in st["minValues"]
    assert total == 3
    # append inherits the partition spec without restating it
    delta_write(
        spark.createDataFrame([(4, 40.0, "EU")], "id long, v double, region string"),
        root,
        mode="append",
    )
    assert _rows(delta_read(spark, root), "id", "region") == {
        (1, "US"), (2, "US"), (3, None), (4, "EU"),
    }


def test_schema_gates(spark, tmp_path):
    root = str(tmp_path / "dws")
    delta_write(
        spark.createDataFrame([(1, "a")], "id long, tag string"), root,
        mode="error",
    )
    with pytest.raises(DeltaSchemaMismatch, match="append schema"):
        delta_write(
            spark.createDataFrame([(2,)], "id long"), root, mode="append"
        )
    wider = spark.createDataFrame(
        [(2, "b", 1.5)], "id long, tag string, w double"
    )
    with pytest.raises(DeltaSchemaMismatch, match="overwrite_schema"):
        delta_write(wider, root, mode="overwrite")
    delta_write(wider, root, mode="overwrite", overwrite_schema=True)
    got = delta_read(spark, root)
    assert _rows(got, "id", "tag", "w") == {(2, "b", 1.5)}
    # the old narrow snapshot still reads with its own schema
    assert delta_read(spark, root, 0).columns == ["id", "tag"]


def test_checkpoint_bounds_replay(spark, tmp_path):
    """After delta_checkpoint, the pre-checkpoint JSON commits can be
    cleaned away and the snapshot still resolves (checkpoint seed +
    trailing commits); appends continue past the checkpoint."""
    root = str(tmp_path / "dwc")
    delta_write(
        spark.createDataFrame([(1, "US")], "id long, region string"),
        root, mode="error", partition_by=["region"],
    )
    for i, reg in [(2, "EU"), (3, None)]:
        delta_write(
            spark.createDataFrame([(i, reg)], "id long, region string"),
            root, mode="append",
        )
    assert delta_checkpoint(spark, root) == 2
    assert os.path.exists(
        f"{root}/_delta_log/{2:020d}.checkpoint.parquet"
    )
    with open(f"{root}/_delta_log/_last_checkpoint") as f:
        assert json.load(f)["version"] == 2
    # metadata log cleanup: drop every pre-checkpoint commit file
    for v in (0, 1, 2):
        os.remove(f"{root}/_delta_log/{v:020d}.json")
    assert _rows(delta_read(spark, root), "id", "region") == {
        (1, "US"), (2, "EU"), (3, None),
    }
    assert delta_write(
        spark.createDataFrame([(4, "AS")], "id long, region string"),
        root, mode="append",
    ) == 3
    assert _rows(delta_read(spark, root), "id", "region") == {
        (1, "US"), (2, "EU"), (3, None), (4, "AS"),
    }


def test_concurrency_append_retries_overwrite_raises(
    spark, tmp_path, monkeypatch
):
    root = str(tmp_path / "dwx")
    delta_write(
        spark.createDataFrame([(1,)], "id long"), root, mode="error"
    )
    real = dw._publish_if_absent
    lost = {"n": 0}

    def lose_first(spark_, path, name, body):
        if lost["n"] == 0:
            lost["n"] += 1
            return False
        return real(spark_, path, name, body)

    monkeypatch.setattr(dw, "_publish_if_absent", lose_first)
    v = delta_write(
        spark.createDataFrame([(2,)], "id long"), root, mode="append"
    )
    assert v == 1 and lost["n"] == 1  # lost once, landed on retry
    monkeypatch.setattr(dw, "_publish_if_absent", lambda *a: False)
    with pytest.raises(DeltaConcurrentWrite):
        delta_write(
            spark.createDataFrame([(3,)], "id long"), root,
            mode="overwrite",
        )
    monkeypatch.setattr(dw, "_publish_if_absent", real)
    assert _rows(delta_read(spark, root), "id") == {(1,), (2,)}


def test_lakehouse_front_door_write_fallback(spark, tmp_path):
    from simple_data_workflow_spark.sources import lakehouse

    root = str(tmp_path / "dwl")
    df = spark.createDataFrame([(1, 2.0)], "id long, v double")
    lakehouse.write_table(df, "delta", root, mode="overwrite")
    got = lakehouse.read_table(spark, "delta", root)
    assert _rows(got, "id", "v") == {(1, 2.0)}


def test_txn_action_idempotent_writes_and_checkpoint(spark, tmp_path):
    """The spec's (txnAppId, txnVersion) idempotent-write contract:
    a write re-offering a committed txn version is a NO-OP; higher
    versions land; a DIFFERENT app with the same version lands; the
    dedup evidence survives classic checkpointing (txn actions are
    carried) even after the pre-checkpoint commits are deleted."""
    import glob as _glob
    import os as _os

    from simple_data_workflow_spark.sources.delta_reader import delta_read
    from simple_data_workflow_spark.sources.delta_writer import (
        delta_checkpoint,
        delta_last_txn_version,
        delta_write,
    )

    root = str(tmp_path / "dtxn")
    one = spark.createDataFrame([(1, 1.0)], "id long, v double")
    two = spark.createDataFrame([(2, 2.0)], "id long, v double")
    delta_write(one, root, mode="append", txn=("appA", 0))
    assert delta_last_txn_version(spark, root, "appA") == 0
    # replay of batch 0: table unchanged
    delta_write(two, root, mode="append", txn=("appA", 0))
    assert delta_read(spark, root).count() == 1
    # next batch lands
    delta_write(two, root, mode="append", txn=("appA", 1))
    assert delta_read(spark, root).count() == 2
    # same version, different app: NOT a replay
    delta_write(
        spark.createDataFrame([(3, 3.0)], "id long, v double"),
        root,
        mode="append",
        txn=("appB", 1),
    )
    assert delta_read(spark, root).count() == 3
    # checkpoint carries the txn high-water marks
    delta_checkpoint(spark, root)
    for f in _glob.glob(f"{root}/_delta_log/*.json"):
        _os.remove(f)
    assert delta_last_txn_version(spark, root, "appA") == 1
    delta_write(two, root, mode="append", txn=("appA", 1))  # still a no-op
    assert delta_read(spark, root).count() == 3


def test_streaming_delta_append_sink_exactly_once(spark, tmp_path):
    """foreachBatch → jar-free delta_write with txn actions: batches
    land exactly once; a FRESH checkpoint dir (new appId) re-offering
    batch id 0 still lands because the txn scope differs — the
    fresh-restart hazard the (appId, version) pair exists to close."""
    from simple_data_workflow_spark.sources.delta_reader import delta_read
    from simple_data_workflow_spark.streaming.sinks import (
        streaming_delta_append_sink,
    )

    import glob as _glob
    import shutil as _shutil

    src = tmp_path / "src"
    src.mkdir()
    table = str(tmp_path / "dst")

    def write_batch(name, rows):
        # the parquet file source lists FLAT files — stage the part
        # file up out of its write directory
        spark.createDataFrame(rows, "id long, v double").coalesce(
            1
        ).write.mode("overwrite").parquet(str(src / name))
        part = _glob.glob(str(src / name / "part-*.parquet"))[0]
        _shutil.move(part, str(src / f"{name}.parquet"))
        _shutil.rmtree(str(src / name))

    write_batch("b0", [(1, 1.0), (2, 2.0)])
    stream = (
        spark.readStream.format("parquet")
        .schema("id long, v double")
        .option("maxFilesPerTrigger", 1)
        .load(str(src))
    )
    q = streaming_delta_append_sink(stream, table, str(tmp_path / "ck1"))
    q.processAllAvailable()
    write_batch("b1", [(3, 3.0)])
    q.processAllAvailable()
    q.stop()
    got = {(r["id"], r["v"]) for r in delta_read(spark, table).collect()}
    assert got == {(1, 1.0), (2, 2.0), (3, 3.0)}

    # restart with the SAME checkpoint: committed offsets are not
    # re-offered, and even a re-offered batch would hit the txn no-op
    stream2 = (
        spark.readStream.format("parquet")
        .schema("id long, v double")
        .option("maxFilesPerTrigger", 1)
        .load(str(src))
    )
    q2 = streaming_delta_append_sink(stream2, table, str(tmp_path / "ck1"))
    q2.processAllAvailable()
    q2.stop()
    assert delta_read(spark, table).count() == 3

    # FRESH checkpoint: batch ids restart at 0 under a NEW appId, so
    # the data lands again (append semantics, different txn scope)
    stream3 = (
        spark.readStream.format("parquet")
        .schema("id long, v double")
        .option("maxFilesPerTrigger", 1)
        .load(str(src))
    )
    q3 = streaming_delta_append_sink(stream3, table, str(tmp_path / "ck2"))
    q3.processAllAvailable()
    q3.stop()
    assert delta_read(spark, table).count() == 6


def test_delta_delete_and_update_cow(spark, tmp_path):
    """Jar-free CoW DML: only files containing matches rewrite
    (unaffected files stay byte-identical under their names), the
    commit is remove+add, no-match DML is a metadata no-op, and the
    pre-DML snapshot stays time-travelable."""
    import glob as _glob
    import os as _os

    from simple_data_workflow_spark.sources.delta_reader import delta_read
    from simple_data_workflow_spark.sources.delta_writer import (
        delta_delete,
        delta_update,
        delta_write,
    )

    root = str(tmp_path / "dml")
    delta_write(
        spark.createDataFrame(
            [(1, 10.0, "US"), (2, 20.0, "US")], "id long, v double, region string"
        ),
        root,
        mode="error",
        partition_by=["region"],
    )
    delta_write(
        spark.createDataFrame([(3, 30.0, "EU")], "id long, v double, region string"),
        root,
        mode="append",
    )
    eu_files = set(_glob.glob(f"{root}/region=EU/*.parquet"))
    assert eu_files
    eu_bytes = {f: _os.path.getsize(f) for f in eu_files}

    v = delta_delete(spark, root, "v >= 20.0 AND region = 'US'")
    got = {(r["id"], r["v"], r["region"]) for r in delta_read(spark, root).collect()}
    assert got == {(1, 10.0, "US"), (3, 30.0, "EU")}
    # the EU file group was untouched — byte-identical under its name
    assert {f: _os.path.getsize(f) for f in eu_files} == eu_bytes
    # pre-delete snapshot still reads complete
    assert delta_read(spark, root, v - 1).count() == 3

    # predicate on a partition column alone works too
    delta_update(spark, root, {"v": "v * 10"}, "region = 'EU'")
    got = {(r["id"], r["v"]) for r in delta_read(spark, root).collect()}
    assert got == {(1, 10.0), (3, 300.0)}

    # no-match DML: version does not advance
    before = delta_delete(spark, root, "v > 1e9")
    assert delta_delete(spark, root, "v > 1e9") == before

    # delete everything in a file: the file is removed with no add
    delta_delete(spark, root, "region = 'EU'")
    got = {(r["id"], r["v"]) for r in delta_read(spark, root).collect()}
    assert got == {(1, 10.0)}


def test_delta_merge_upsert(spark, tmp_path):
    """Delete-insert MERGE: matched target rows replace, new keys
    insert, both in ONE commit; unaffected files stay byte-identical;
    empty-table merge degenerates to create."""
    import glob as _glob
    import os as _os

    from simple_data_workflow_spark.sources.delta_writer import (
        delta_merge_upsert,
    )

    root = str(tmp_path / "dmrg")
    delta_write(
        spark.createDataFrame(
            [(1, 10.0, "US"), (2, 20.0, "EU")], "id long, v double, region string"
        ),
        root,
        mode="error",
        partition_by=["region"],
    )
    eu = {f: _os.path.getsize(f) for f in _glob.glob(f"{root}/region=EU/*.parquet")}
    src = spark.createDataFrame(
        [(1, 11.0, "US"), (9, 90.0, "AS")], "id long, v double, region string"
    )
    v = delta_merge_upsert(spark, root, src, on=["id"])
    got = _rows(delta_read(spark, root), "id", "v", "region")
    assert got == {(1, 11.0, "US"), (2, 20.0, "EU"), (9, 90.0, "AS")}
    # EU file group had no matched keys: untouched
    assert {f: _os.path.getsize(f) for f in eu} == eu
    # one atomic commit: remove + adds in the same version file
    with open(f"{root}/_delta_log/{v:020d}.json") as f:
        kinds = [next(iter(json.loads(l))) for l in f if l.strip()]
    assert "remove" in kinds and "add" in kinds
    # pre-merge snapshot intact
    assert _rows(delta_read(spark, root, v - 1), "id", "v") == {
        (1, 10.0), (2, 20.0),
    }
    # schema gate
    with pytest.raises(DeltaSchemaMismatch, match="merge source"):
        delta_merge_upsert(
            spark, root, spark.createDataFrame([(1,)], "id long"), on=["id"]
        )
    # merge into an absent table = create
    root2 = str(tmp_path / "dmrg2")
    delta_merge_upsert(spark, root2, src, on=["id"])
    assert _rows(delta_read(spark, root2), "id") == {(1,), (9,)}


def test_delete_keeps_null_predicate_rows(spark, tmp_path):
    """DELETE removes only predicate-TRUE rows: under three-valued
    logic NOT(NULL)=NULL, so a bare NOT(pred) rewrite would silently
    drop rows whose predicate evaluates to NULL from any affected
    file (ADVICE r10 high)."""
    from simple_data_workflow_spark.sources.delta_writer import delta_delete

    root = str(tmp_path / "dnull")
    # one file holding a TRUE match (v=20) AND a NULL-predicate row
    delta_write(
        spark.createDataFrame(
            [(1, 10.0), (2, 20.0), (3, None)], "id long, v double"
        ).coalesce(1),
        root,
        mode="error",
    )
    delta_delete(spark, root, "v >= 20.0")
    got = _rows(delta_read(spark, root), "id", "v")
    assert got == {(1, 10.0), (3, None)}  # NULL row survives


def test_file_stats_omit_columns_with_unserializable_extremes(spark, tmp_path):
    """If any value contributing to a column's min/max is dropped by
    serialization (>64-char strings, NaN), the column must be absent
    from minValues/maxValues entirely — a partial bound is
    tighter-than-true and makes stats-based skipping prune files that
    contain matches (ADVICE r10 medium)."""
    root = str(tmp_path / "dstats")
    long_min = "a" * 80  # the TRUE min, unserializable
    delta_write(
        spark.createDataFrame(
            [(1, long_min, 1.0), (2, "zzz", float("nan")), (3, "mmm", 2.0)],
            "id long, s string, x double",
        ).coalesce(1),
        root,
        mode="error",
    )
    with open(f"{root}/_delta_log/{0:020d}.json") as f:
        stats = [
            json.loads(json.loads(l)["add"]["stats"])
            for l in f
            if l.strip() and "add" in json.loads(l)
        ]
    assert len(stats) == 1
    st = stats[0]
    # 's' min is a dropped long string; 'x' carries a NaN → both whole
    # columns omitted from bounds (not partially aggregated)
    assert "s" not in st["minValues"] and "s" not in st["maxValues"]
    assert "x" not in st["minValues"] and "x" not in st["maxValues"]
    # the clean column keeps its true bounds; null counts unaffected
    assert st["minValues"]["id"] == 1 and st["maxValues"]["id"] == 3
    assert st["numRecords"] == 3


def test_overwrite_lost_race_cleans_staged_files(spark, tmp_path, monkeypatch):
    """A lost overwrite race must delete its already-renamed staged
    data files before raising — otherwise retried overwrites
    accumulate unreferenced parquet that vacuum can't see
    (ADVICE r10 low)."""
    root = str(tmp_path / "drace")
    delta_write(spark.createDataFrame([(1,)], "id long"), root, mode="error")
    files_before = set(glob.glob(f"{root}/**/*.parquet", recursive=True))
    monkeypatch.setattr(dw, "_publish_if_absent", lambda *a: False)
    with pytest.raises(DeltaConcurrentWrite):
        delta_write(
            spark.createDataFrame([(2,)], "id long"), root, mode="overwrite"
        )
    files_after = set(glob.glob(f"{root}/**/*.parquet", recursive=True))
    assert files_after == files_before  # no orphans left behind


def _mapped_fixture(spark, root, mode):
    """A column-mapped table: logical (id long, payload struct<score>,
    region string partition) over physical col-a / col-b<col-x> /
    col-p — the reader-test shape (name mode), or a flat physical
    (p-1, p-2, p-4) layout with field ids (id mode)."""
    import shutil

    def one_file(df, dest):
        tmp = dest + ".__tmp__"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        shutil.move(part, dest)
        shutil.rmtree(tmp)

    if mode == "name":
        one_file(
            spark.createDataFrame(
                [(1, (1.5,)), (2, (2.5,))],
                "`col-a` long, `col-b` struct<`col-x`: double>",
            ),
            f"{root}/col-p=US/a.parquet",
        )
        one_file(
            spark.createDataFrame(
                [(3, (3.5,))], "`col-a` long, `col-b` struct<`col-x`: double>"
            ),
            f"{root}/col-p=EU/b.parquet",
        )
        fields = [
            {"name": "id", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.id": 1,
                          "delta.columnMapping.physicalName": "col-a"}},
            {"name": "payload",
             "type": {"type": "struct", "fields": [
                 {"name": "score", "type": "double", "nullable": True,
                  "metadata": {"delta.columnMapping.id": 3,
                               "delta.columnMapping.physicalName": "col-x"}}]},
             "nullable": True,
             "metadata": {"delta.columnMapping.id": 2,
                          "delta.columnMapping.physicalName": "col-b"}},
            {"name": "region", "type": "string", "nullable": True,
             "metadata": {"delta.columnMapping.id": 4,
                          "delta.columnMapping.physicalName": "col-p"}},
        ]
        adds = [
            {"path": "col-p=US/a.parquet", "partitionValues": {"col-p": "US"}},
            {"path": "col-p=EU/b.parquet", "partitionValues": {"col-p": "EU"}},
        ]
        part_cols = ["region"]
    else:  # id mode, flat
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
        one_file(
            spark.createDataFrame(
                [(1, 1.5), (2, 2.5), (3, 3.5)], "a long, b double"
            ).select(
                F.col("a").alias("p-1", metadata={"parquet.field.id": 1}),
                F.col("b").alias("p-2", metadata={"parquet.field.id": 2}),
            ),
            f"{root}/a.parquet",
        )
        fields = [
            {"name": "id", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.id": 1,
                          "delta.columnMapping.physicalName": "p-1"}},
            {"name": "score", "type": "double", "nullable": True,
             "metadata": {"delta.columnMapping.id": 2,
                          "delta.columnMapping.physicalName": "p-2"}},
        ]
        adds = [{"path": "a.parquet", "partitionValues": {}}]
        part_cols = []
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {
            "id": f"cm-dml-{mode}",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps({"type": "struct", "fields": fields}),
            "partitionColumns": part_cols,
            "configuration": {"delta.columnMapping.mode": mode},
            "createdTime": 1,
        }},
    ] + [
        {"add": {**a, "size": 1, "modificationTime": 1, "dataChange": True}}
        for a in adds
    ]
    os.makedirs(f"{root}/_delta_log", exist_ok=True)
    with open(f"{root}/_delta_log/{0:020d}.json", "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")


def test_dml_on_name_mapped_table(spark, tmp_path):
    """Round 11 (VERDICT r10 #5): CoW DML on a NAME-mode column-mapped
    table — predicates and SET expressions speak logical names, the
    rewritten files carry PHYSICAL names at every nesting level, and
    partitionValues stay keyed by physical name."""
    import pyarrow.parquet as pq

    from simple_data_workflow_spark.sources.delta_writer import (
        delta_delete,
        delta_update,
    )

    root = str(tmp_path / "cmdml")
    _mapped_fixture(spark, root, "name")
    delta_delete(spark, root, "id = 2")
    got = {
        (r["id"], r["payload"]["score"], r["region"])
        for r in delta_read(spark, root).collect()
    }
    assert got == {(1, 1.5, "US"), (3, 3.5, "EU")}
    # the rewritten US file is physical-named (col-a, col-b<col-x>)
    with open(f"{root}/_delta_log/{1:020d}.json") as f:
        acts = [json.loads(l) for l in f if l.strip()]
    new_adds = [a["add"] for a in acts if "add" in a]
    assert new_adds and all(
        a["partitionValues"].get("col-p") == "US" for a in new_adds
    )
    newf = f"{root}/" + new_adds[0]["path"].replace("%3D", "=")
    import urllib.parse as up

    sch = pq.ParquetFile(up.unquote(newf)).schema_arrow
    names = {f.name for f in sch}
    assert names == {"col-a", "col-b"}
    assert sch.field("col-b").type.field(0).name == "col-x"
    # UPDATE through logical names on the other partition
    delta_update(spark, root, {"id": "id + 10"}, "region = 'EU'")
    got = {(r["id"], r["region"]) for r in delta_read(spark, root).collect()}
    assert got == {(1, "US"), (13, "EU")}


def test_dml_on_id_mapped_table(spark, tmp_path):
    """Round 11: CoW DML on an ID-mode table — rewritten files keep
    physical names AND stamp parquet.field.id so by-id resolution
    still works."""
    import pyarrow.parquet as pq

    from simple_data_workflow_spark.sources.delta_writer import (
        delta_delete,
    )

    root = str(tmp_path / "idml")
    _mapped_fixture(spark, root, "id")
    delta_delete(spark, root, "score >= 2.5 AND id <> 3")
    got = {(r["id"], r["score"]) for r in delta_read(spark, root).collect()}
    assert got == {(1, 1.5), (3, 3.5)}
    with open(f"{root}/_delta_log/{1:020d}.json") as f:
        acts = [json.loads(l) for l in f if l.strip()]
    new_add = next(a["add"] for a in acts if "add" in a)
    sch = pq.ParquetFile(f"{root}/{new_add['path']}").schema_arrow
    ids = {f.name: int(f.metadata[b"PARQUET:field_id"]) for f in sch}
    assert ids == {"p-1": 1, "p-2": 2}


def test_dml_across_many_partitions_single_scan_plan(spark, tmp_path):
    """Round 11 (VERDICT r10 #10): a predicate touching MANY partition
    values must not grow the plan one union leg per value — the
    snapshot view is one scan + one broadcast mapping join, so the
    analyzed plan's parquet-scan count stays 1 regardless of how many
    partitions the DML touches."""
    from simple_data_workflow_spark.sources.delta_writer import delta_delete

    root = str(tmp_path / "manyp")
    df = spark.createDataFrame(
        [(i, float(i), f"r{i % 20}") for i in range(200)],
        "id long, v double, region string",
    )
    delta_write(df, root, mode="error", partition_by=["region"])
    # touches ALL 20 partition values
    delta_delete(spark, root, "id % 2 = 0")
    got = delta_read(spark, root)
    assert got.count() == 100
    assert {r["id"] % 2 for r in got.collect()} == {1}
    # partition pruning still works on the result table (ids in r3 are
    # 3, 23, 43, ... — all odd, so all 10 survive; r4's are all even,
    # so none do)
    assert delta_read(spark, root).where("region = 'r3'").count() == 10
    assert delta_read(spark, root).where("region = 'r4'").count() == 0


def test_delta_optimize_compacts_and_materializes_dvs(spark, tmp_path):
    """Round 11: OPTIMIZE coalesces small files per partition group
    with dataChange=false (streaming tailers skip it), materializes
    deletion vectors (masked rows rewrite, DV drops), leaves the
    logical snapshot identical, and keeps pre-OPTIMIZE versions
    time-travelable."""
    from simple_data_workflow_spark.sources.delta_reader import (
        delta_snapshot_files,
    )
    from simple_data_workflow_spark.sources.delta_writer import (
        delta_delete,
        delta_optimize,
        delta_vacuum,
    )

    root = str(tmp_path / "dopt")
    delta_write(
        spark.createDataFrame(
            [(i, float(i), "A" if i < 20 else "B") for i in range(40)],
            "id long, v double, g string",
        ).repartition(8),
        root,
        mode="error",
        partition_by=["g"],
    )
    delta_delete(spark, root, "id % 10 = 0", strategy="dv")
    before = _rows(delta_read(spark, root), "id", "v", "g")
    files_before, dvs_before, _s, _p = delta_snapshot_files(spark, root)
    assert dvs_before  # the DV delete landed as descriptors

    v = delta_optimize(spark, root, small_file_bytes=64 * 1024 * 1024)
    assert v is not None
    after = _rows(delta_read(spark, root), "id", "v", "g")
    assert after == before  # logical snapshot identical
    files_after, dvs_after, _s2, _p2 = delta_snapshot_files(spark, root)
    assert not dvs_after  # DVs materialized away
    assert len(files_after) < len(files_before)  # actually compacted
    assert len(files_after) == 2  # one file per partition group
    # the commit is dataChange=false end to end
    with open(f"{root}/_delta_log/{v:020d}.json") as f:
        acts = [json.loads(l) for l in f if l.strip()]
    assert all(
        a["add"]["dataChange"] is False for a in acts if "add" in a
    )
    assert all(
        a["remove"]["dataChange"] is False for a in acts if "remove" in a
    )
    # pre-OPTIMIZE version still reads complete
    assert len(_rows(delta_read(spark, root, v - 1), "id")) == 36
    # nothing left to compact: no-op
    assert delta_optimize(spark, root) is None

    # vacuum: retention 0 deletes the unreferenced originals + sidecar
    deleted = delta_vacuum(spark, root, retention_hours=0)
    assert deleted and any(d.endswith(".bin") for d in deleted)
    assert _rows(delta_read(spark, root), "id", "v", "g") == before
    # live files untouched; re-vacuum is a no-op
    assert delta_vacuum(spark, root, retention_hours=0) == []


def test_deltalog_stream_skips_optimize_commits(spark, tmp_path):
    """The deltalog stream must treat OPTIMIZE's dataChange=false
    remove+add as the byte-level no-op it is."""
    from simple_data_workflow_spark.sources.delta_writer import (
        delta_optimize,
    )
    from simple_data_workflow_spark.streaming.delta_source import (
        DeltaLogStreamDataSource,
    )

    root = str(tmp_path / "doptstream")
    delta_write(
        spark.createDataFrame(
            [(i, float(i)) for i in range(10)], "id long, v double"
        ).repartition(4),
        root,
        mode="error",
    )
    assert delta_optimize(spark, root) is not None
    spark.dataSource.register(DeltaLogStreamDataSource)
    out, ckpt = str(tmp_path / "o"), str(tmp_path / "c")
    q = (
        spark.readStream.format("deltalog")
        .option("path", root)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 10  # v0 only; the OPTIMIZE commit emitted 0
    assert {r["_commit_version"] for r in got.collect()} == {0}


def test_delta_cleanup_log_respects_checkpoint_and_retention(spark, tmp_path):
    """Log cleanup deletes only commits covered by a checkpoint and
    past retention; the table still reads from the checkpoint seed, and
    a checkpoint-less table is never touched."""
    from simple_data_workflow_spark.sources.delta_writer import (
        delta_cleanup_log,
    )

    root = str(tmp_path / "dlclean")
    delta_write(spark.createDataFrame([(1,)], "id long"), root, mode="error")
    delta_write(spark.createDataFrame([(2,)], "id long"), root, mode="append")
    # no checkpoint yet: nothing may delete
    assert delta_cleanup_log(spark, root, retention_hours=0) == []
    delta_checkpoint(spark, root)  # at v1
    delta_write(spark.createDataFrame([(3,)], "id long"), root, mode="append")
    deleted = delta_cleanup_log(spark, root, retention_hours=0)
    assert deleted == [0, 1]  # covered by the checkpoint
    # v2 (after the checkpoint) survives; table reads complete
    assert os.path.exists(f"{root}/_delta_log/{2:020d}.json")
    assert _rows(delta_read(spark, root), "id") == {(1,), (2,), (3,)}
    # retention respected: fresh commits survive a long horizon
    assert delta_cleanup_log(spark, root, retention_hours=1) == []


def test_delta_update_dv_strategy(spark, tmp_path):
    """Merge-on-read UPDATE: one commit DV-masks the old row versions
    and appends new files with the updated versions — original data
    files stay byte-identical; a later CoW edit consumes the DV-masked
    view."""
    import glob

    from simple_data_workflow_spark.sources.delta_writer import (
        delta_update,
        delta_write,
    )

    root = str(tmp_path / "dvu")
    df = spark.createDataFrame(
        [(i, f"n{i}", float(i)) for i in range(1, 11)],
        "id int, name string, val double",
    )
    delta_write(df, root, mode="error")
    before = set(glob.glob(f"{root}/part-*.parquet"))
    v = delta_update(spark, root, {"val": "val * 2"}, "id <= 3", strategy="dv")
    with open(f"{root}/_delta_log/{v:020d}.json") as f:
        txt = f.read()
    assert '"operation": "UPDATE"' in txt and "deletionVector" in txt
    # originals untouched, new files appended
    after = set(glob.glob(f"{root}/part-*.parquet"))
    assert before <= after and len(after) > len(before)
    got = {r["id"]: r["val"] for r in delta_read(spark, root).collect()}
    assert got == {i: float(i) * (2 if i <= 3 else 1) for i in range(1, 11)}
    # no-match UPDATE is a metadata no-op
    assert delta_update(spark, root, {"val": "0"}, "id = 99", strategy="dv") == v
    # stacked CoW UPDATE sees the DV-masked view
    delta_update(
        spark, root, {"name": "concat(name, '_x')"}, "id = 1", strategy="rewrite"
    )
    got = {r["id"]: (r["name"], r["val"]) for r in delta_read(spark, root).collect()}
    assert got[1] == ("n1_x", 2.0) and got[2] == ("n2", 4.0)


def test_delta_merge_dv_strategy(spark, tmp_path):
    """Merge-on-read MERGE on a partitioned table: matched target rows
    die by DV, every source row lands under its partition; a source
    with NO matched keys still inserts (always-commit)."""
    from simple_data_workflow_spark.sources.delta_writer import (
        delta_merge_upsert,
        delta_write,
    )

    root = str(tmp_path / "dvm")
    df = spark.createDataFrame(
        [(i, "A" if i % 2 else "B", float(i)) for i in range(1, 9)],
        "id int, grp string, val double",
    )
    delta_write(df, root, mode="error", partition_by=["grp"])
    src = spark.createDataFrame(
        [(2, "B", 777.0), (50, "A", 888.0)], "id int, grp string, val double"
    )
    delta_merge_upsert(spark, root, src, ["id"], strategy="dv")
    got = {r["id"]: (r["grp"], r["val"]) for r in delta_read(spark, root).collect()}
    exp = {i: ("A" if i % 2 else "B", float(i)) for i in range(1, 9)}
    exp[2] = ("B", 777.0)
    exp[50] = ("A", 888.0)
    assert got == exp
    # zero-match merge still inserts
    src2 = spark.createDataFrame([(60, "B", 1.0)], "id int, grp string, val double")
    delta_merge_upsert(spark, root, src2, ["id"], strategy="dv")
    assert delta_read(spark, root).where("id = 60").count() == 1


def test_delta_update_auto_strategy(spark, tmp_path):
    """auto UPDATE mirrors auto DELETE: a wide sparse edit (many files,
    few rows each) writes DVs; a dense edit rewrites (no DV)."""
    import glob

    from pyspark.sql import functions as F

    from simple_data_workflow_spark.sources.delta_writer import (
        delta_update,
        delta_write,
    )

    root = str(tmp_path / "dva")
    big = (
        spark.range(0, 20000)
        .select(
            F.col("id").cast("int").alias("id"),
            (F.col("id") * 1.0).alias("val"),
        )
        .repartition(16)
    )
    delta_write(big, root, mode="error")
    delta_update(spark, root, {"val": "val + 0.5"}, "id % 500 = 13")
    last = sorted(glob.glob(f"{root}/_delta_log/*.json"))[-1]
    assert "deletionVector" in open(last).read()
    chk = delta_read(spark, root).where("id % 500 = 13").select("val").collect()
    assert len(chk) == 40 and all(r["val"] % 1 == 0.5 for r in chk)
    assert delta_read(spark, root).count() == 20000
    # dense: every row matches → rewrite, no DV
    delta_update(spark, root, {"val": "val + 1"}, "id >= 0")
    last = sorted(glob.glob(f"{root}/_delta_log/*.json"))[-1]
    assert "deletionVector" not in open(last).read()
    tot = delta_read(spark, root).agg(F.sum("val")).collect()[0][0]
    assert abs(tot - (sum(range(20000)) + 20000 + 40 * 0.5)) < 1e-6


def test_dv_update_on_name_mapped_table(spark, tmp_path):
    """DV UPDATE on a column-mapped table: the appended updated-row
    files carry PHYSICAL names like any other data file."""
    import glob

    import pyarrow.parquet as pq

    from simple_data_workflow_spark.sources.delta_writer import delta_update

    root = str(tmp_path / "dvcm")
    _mapped_fixture(spark, root, "name")
    v = delta_update(
        spark, root, {"id": "id + 100"}, "region = 'EU'", strategy="dv"
    )
    got = {(r["id"], r["region"]) for r in delta_read(spark, root).collect()}
    assert got == {(1, "US"), (2, "US"), (103, "EU")}
    with open(f"{root}/_delta_log/{v:020d}.json") as f:
        acts = [json.loads(l) for l in f if l.strip()]
    new_adds = [
        a["add"] for a in acts if "add" in a and "deletionVector" not in a["add"]
    ]
    assert new_adds
    import urllib.parse as up

    sch = pq.ParquetFile(
        f"{root}/" + up.unquote(new_adds[0]["path"])
    ).schema_arrow
    assert {f.name for f in sch} == {"col-a", "col-b"}


def test_delta_restore_flips_file_set_back(spark, tmp_path):
    """RESTORE TO VERSION: one commit re-references the target
    version's files (DV descriptors included), history preserved, and
    a restore can move forward again to a later version."""
    from simple_data_workflow_spark.sources.delta_writer import (
        delta_delete,
        delta_restore,
        delta_update,
        delta_write,
    )

    root = str(tmp_path / "rst")
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "id int, val double"
    )
    delta_write(df, root, mode="error")  # v0
    delta_delete(spark, root, "id >= 7", strategy="dv")  # v1
    delta_update(spark, root, {"val": "val * 10"}, "id = 1")  # v2
    v = delta_restore(spark, root, 0)
    assert v == 3  # the restore is a NEW commit
    got = {r["id"]: r["val"] for r in delta_read(spark, root).collect()}
    assert got == {i: float(i) for i in range(10)}
    # forward restore re-applies v1's deletion vector
    delta_restore(spark, root, 1)
    got = {r["id"]: r["val"] for r in delta_read(spark, root).collect()}
    assert got == {i: float(i) for i in range(7)}
    # idempotent: restoring to the state we're already in is a no-op
    cur = delta_restore(spark, root, 1)
    assert delta_restore(spark, root, 1) == cur
    with pytest.raises(ValueError, match="newer than"):
        delta_restore(spark, root, 99)


def test_delta_write_merge_schema_append(spark, tmp_path):
    """mergeSchema append: new columns join the table schema (old rows
    read NULL), missing source columns read NULL, type changes
    refuse, and plain appends still refuse without the flag."""
    from simple_data_workflow_spark.sources.delta_writer import (
        DeltaSchemaMismatch,
        delta_write,
    )

    root = str(tmp_path / "ms")
    delta_write(
        spark.createDataFrame([(1, 1.0)], "id int, val double"),
        root,
        mode="error",
    )
    with pytest.raises(DeltaSchemaMismatch, match="merge_schema"):
        delta_write(
            spark.createDataFrame(
                [(2, 2.0, "x")], "id int, val double, tag string"
            ),
            root,
            mode="append",
        )
    delta_write(
        spark.createDataFrame(
            [(2, 2.0, "x")], "id int, val double, tag string"
        ),
        root,
        mode="append",
        merge_schema=True,
    )
    got = delta_read(spark, root)
    assert got.columns == ["id", "val", "tag"]
    rows = {r["id"]: r["tag"] for r in got.collect()}
    assert rows == {1: None, 2: "x"}
    with pytest.raises(DeltaSchemaMismatch, match="type"):
        delta_write(
            spark.createDataFrame(
                [("s", 3.0, "y")], "id string, val double, tag string"
            ),
            root,
            mode="append",
            merge_schema=True,
        )


def test_dml_on_id_mapped_table_with_nested_struct(spark, tmp_path):
    """The pre-continuation refusal, lifted: CoW DML on an id-mapped
    table with a NESTED struct column — the staged rewrite carries
    physical names AND parquet.field.id at every nesting level (the
    cast target type transports nested metadata into the footers)."""
    import shutil

    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    from simple_data_workflow_spark.sources.delta_writer import delta_update

    root = str(tmp_path / "idnest")

    def one_file(df, dest):
        tmp = dest + ".__tmp__"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        shutil.move(part, dest)
        shutil.rmtree(tmp)

    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    from pyspark.sql import types as T

    nested_t = T.StructType(
        [T.StructField("p-3", T.DoubleType(), True, {"parquet.field.id": 3})]
    )
    src = spark.createDataFrame(
        [(1, (1.5,)), (2, (2.5,)), (3, (3.5,))],
        "a long, b struct<x: double>",
    )
    # cast+alias, NOT .to(): .to() drops metadata on no-op columns
    one_file(
        src.select(
            F.col("a")
            .cast("long")
            .alias("p-1", metadata={"parquet.field.id": 1}),
            F.col("b")
            .cast(nested_t)
            .alias("p-2", metadata={"parquet.field.id": 2}),
        ),
        f"{root}/a.parquet",
    )
    fields = [
        {"name": "id", "type": "long", "nullable": True,
         "metadata": {"delta.columnMapping.id": 1,
                      "delta.columnMapping.physicalName": "p-1"}},
        {"name": "payload",
         "type": {"type": "struct", "fields": [
             {"name": "score", "type": "double", "nullable": True,
              "metadata": {"delta.columnMapping.id": 3,
                           "delta.columnMapping.physicalName": "p-3"}}]},
         "nullable": True,
         "metadata": {"delta.columnMapping.id": 2,
                      "delta.columnMapping.physicalName": "p-2"}},
    ]
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {
            "id": "idnest",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps({"type": "struct", "fields": fields}),
            "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "id"},
            "createdTime": 1,
        }},
        {"add": {"path": "a.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 1, "dataChange": True}},
    ]
    os.makedirs(f"{root}/_delta_log", exist_ok=True)
    with open(f"{root}/_delta_log/{0:020d}.json", "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
    # sanity: the fixture file really carries nested ids
    sch0 = pq.ParquetFile(f"{root}/a.parquet").schema_arrow
    assert int(sch0.field("p-2").type.field(0).metadata[b"PARQUET:field_id"]) == 3

    v = delta_update(
        spark, root, {"payload": "named_struct('score', payload.score * 10)"},
        "id = 2", strategy="rewrite",
    )
    got = {
        (r["id"], r["payload"]["score"])
        for r in delta_read(spark, root).collect()
    }
    assert got == {(1, 1.5), (2, 25.0), (3, 3.5)}
    with open(f"{root}/_delta_log/{v:020d}.json") as f:
        acts = [json.loads(l) for l in f if l.strip()]
    new_add = next(a["add"] for a in acts if "add" in a)
    import urllib.parse as up

    sch = pq.ParquetFile(
        f"{root}/" + up.unquote(new_add["path"])
    ).schema_arrow
    assert {fl.name for fl in sch} == {"p-1", "p-2"}
    assert int(sch.field("p-1").metadata[b"PARQUET:field_id"]) == 1
    assert int(sch.field("p-2").metadata[b"PARQUET:field_id"]) == 2
    nested = sch.field("p-2").type.field(0)
    assert nested.name == "p-3"
    assert int(nested.metadata[b"PARQUET:field_id"]) == 3


def test_delta_optimize_zorder(spark, tmp_path):
    """OPTIMIZE ZORDER: every file rewrites clustered on the Morton
    curve over 2 columns, data identical, commit is dataChange=false,
    and the re-clustered files give filters=... evidence on BOTH
    z-ordered columns (tight min/max per file)."""
    from pyspark.sql import functions as F

    from simple_data_workflow_spark.sources.delta_writer import (
        delta_optimize,
        delta_write,
    )

    root = str(tmp_path / "zord")
    df = spark.range(0, 4000).select(
        F.col("id").cast("long"),
        (F.col("id") % 64).cast("long").alias("x"),
        ((F.col("id") * 7) % 64).cast("long").alias("y"),
    )
    # written scattered: neither x nor y clusters → no skipping evidence
    delta_write(df.repartition(8), root, mode="error")
    before = {tuple(r) for r in delta_read(spark, root).collect()}
    # small target size → several z-ordered output files to prune over
    v = delta_optimize(spark, root, small_file_bytes=8 * 1024, zorder_by=["x", "y"])
    assert v is not None
    after = {tuple(r) for r in delta_read(spark, root).collect()}
    assert after == before
    with open(f"{root}/_delta_log/{v:020d}.json") as f:
        txt = f.read()
    assert '"zOrderBy": "[\\"x\\", \\"y\\"]"' in txt
    assert '"dataChange": false' in txt
    # after z-ordering, a point filter on EITHER column prunes files
    full_n = len(delta_read(spark, root).inputFiles())
    for col in ("x", "y"):
        flt = delta_read(spark, root, filters=[(col, "==", 3)])
        assert flt.count() == delta_read(spark, root).where(
            f"{col} = 3"
        ).count()
        assert len(flt.inputFiles()) < full_n, col
    with pytest.raises(ValueError, match="partition columns"):
        root2 = str(tmp_path / "zp")
        delta_write(
            df.withColumn("g", (F.col("id") % 2).cast("string")),
            root2,
            mode="error",
            partition_by=["g"],
        )
        delta_optimize(spark, root2, zorder_by=["g", "x"])


def test_predicate_prune_filters_soundness():
    """Round 12 (VERDICT r11 #2): the DML probe's SQL→skipping-filter
    extraction emits only conjuncts the predicate IMPLIES — OR poisons
    everything, unparseable conjuncts drop silently, BETWEEN's inner
    AND is not a split point, literals type through the schema."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from simple_data_workflow_spark.sources.delta_writer import (
        _predicate_prune_filters as P,
    )

    sch = StructType(
        [
            StructField("id", LongType()),
            StructField("v", DoubleType()),
            StructField("s", StringType()),
        ]
    )
    assert P("id = 5", sch) == [("id", "==", 5)]
    assert P("5 < id", sch) == [("id", ">", 5)]
    assert P("id BETWEEN 3 AND 7 AND s IN ('a','b')", sch) == [
        ("id", ">=", 3),
        ("id", "<=", 7),
        ("s", "in", ["a", "b"]),
    ]
    # OR at the top level: NOTHING is implied
    assert P("id = 5 OR v > 2", sch) == []
    # ...but an OR inside a paren conjunct only poisons itself
    assert P("(id = 5 OR v > 2) AND s = 'a'", sch) == [("s", "==", "a")]
    # unparseable conjuncts (arithmetic, NOT, unknown cols) drop
    assert P("id % 3 = 0", sch) == []
    assert P("NOT id = 5 AND v = 1", sch) == [("v", "==", 1.0)]
    assert P("nope = 3", sch) == []
    # whole-predicate parens unwrap; escaped quotes survive
    assert P("(id = 5 AND s = 'x''y')", sch) == [
        ("id", "==", 5),
        ("s", "==", "x'y"),
    ]


def test_delete_stats_prune_fast_paths(spark, tmp_path):
    """Round 12: an auto-strategy DELETE whose predicate the log stats
    PROVE matches nothing is a metadata no-op (no probe scan, version
    unchanged); a selective predicate still deletes correctly."""
    from simple_data_workflow_spark.sources.delta_reader import delta_read
    from simple_data_workflow_spark.sources.delta_writer import (
        delta_delete,
        delta_write,
    )

    root = str(tmp_path / "prune")
    delta_write(
        spark.createDataFrame(
            [(i, float(i)) for i in range(100)], "id long, v double"
        ).repartition(4),
        root,
        mode="error",
    )
    import glob as _glob

    v0 = max(
        int(os.path.basename(p).split(".")[0])
        for p in _glob.glob(f"{root}/_delta_log/*.json")
    )
    # provably-empty predicate: stats say no file can hold id = 10^6
    assert delta_delete(spark, root, "id = 1000000") == v0
    assert delta_read(spark, root).count() == 100
    # selective predicate still works through the pruned probe
    delta_delete(spark, root, "id >= 90")
    got = {r["id"] for r in delta_read(spark, root).collect()}
    assert got == set(range(90))


def test_merge_schema_append_survives_commit_race(spark, tmp_path, monkeypatch):
    """Round 12 (ADVICE r11): a merge_schema append that loses the
    commit race recomputes the merged schema against the RACER's
    metaData and retries instead of raising — and the republished
    metaData unions the racer's columns rather than clobbering them."""
    from simple_data_workflow_spark.sources import delta_writer as dw
    from simple_data_workflow_spark.sources.delta_reader import delta_read

    root = str(tmp_path / "msrace")
    dw.delta_write(
        spark.createDataFrame([(1, 1.0)], "id long, v double"),
        root,
        mode="error",
    )

    real_publish = dw._publish_if_absent
    state = {"raced": False}

    def racing_publish(spark_, path_, name_, content_):
        if not state["raced"]:
            state["raced"] = True
            # the RACER lands first WITH ITS OWN new column (mergeSchema)
            dw.delta_write(
                spark.createDataFrame(
                    [(2, 2.0, "x")], "id long, v double, racer_col string"
                ),
                root,
                mode="append",
                merge_schema=True,
            )
        return real_publish(spark_, path_, name_, content_)

    monkeypatch.setattr(dw, "_publish_if_absent", racing_publish)
    # our append carries a DIFFERENT new column; first publish attempt
    # loses to the racer, the retry must merge against the racer's schema
    dw.delta_write(
        spark.createDataFrame(
            [(3, 3.0, 7)], "id long, v double, my_col long"
        ),
        root,
        mode="append",
        merge_schema=True,
    )
    monkeypatch.setattr(dw, "_publish_if_absent", real_publish)
    got = delta_read(spark, root)
    assert set(got.columns) == {"id", "v", "racer_col", "my_col"}
    rows = {
        (r["id"], r["v"], r["racer_col"], r["my_col"])
        for r in got.collect()
    }
    assert rows == {
        (1, 1.0, None, None),
        (2, 2.0, "x", None),
        (3, 3.0, None, 7),
    }


def test_delta_change_data_feed_roundtrip(spark, tmp_path):
    """Round 12 (VERDICT r11 #4): jar-free Delta CDF. Enabling
    delta.enableChangeDataFeed upgrades the protocol; DELETE/UPDATE/
    MERGE emit _change_data parquet + cdc actions (both rewrite and
    deletion-vector strategies); delta_table_changes reads back exact
    I/U/D pre/postimages; appends derive as inserts; a non-CDF removal
    range raises like Delta's own table_changes."""
    import glob as _glob

    import pytest as _pytest

    from simple_data_workflow_spark.sources.delta_reader import (
        delta_read,
        delta_table_changes,
    )
    from simple_data_workflow_spark.sources.delta_writer import (
        delta_delete,
        delta_merge_upsert,
        delta_set_properties,
        delta_update,
        delta_write,
    )

    root = str(tmp_path / "cdf")
    delta_write(
        spark.createDataFrame(
            [(i, float(i)) for i in range(10)], "id long, v double"
        ).coalesce(1),
        root,
        mode="error",
    )  # v0
    delta_set_properties(
        spark, root, {"delta.enableChangeDataFeed": "true"}
    )  # v1
    with open(f"{root}/_delta_log/{1:020d}.json") as f:
        acts = [json.loads(x) for x in f if x.strip()]
    proto = next((a["protocol"] for a in acts if "protocol" in a), None)
    assert proto is not None and proto["minWriterVersion"] >= 4

    delta_delete(spark, root, "id >= 8", strategy="rewrite")  # v2
    delta_update(
        spark, root, {"v": "v * 10.0"}, "id = 1", strategy="rewrite"
    )  # v3
    delta_merge_upsert(
        spark,
        root,
        spark.createDataFrame([(2, 222.0), (50, 50.0)], "id long, v double"),
        ["id"],
        strategy="rewrite",
    )  # v4
    assert _glob.glob(f"{root}/_change_data/*.parquet")

    ch = delta_table_changes(spark, root, 2, 4)
    got = {
        (r["id"], r["v"], r["_change_type"], r["_commit_version"])
        for r in ch.collect()
    }
    assert got == {
        (8, 8.0, "delete", 2),
        (9, 9.0, "delete", 2),
        (1, 1.0, "update_preimage", 3),
        (1, 10.0, "update_postimage", 3),
        (2, 2.0, "delete", 4),
        (2, 222.0, "insert", 4),
        (50, 50.0, "insert", 4),
    }
    # the appends (v0) derive as inserts
    ch0 = delta_table_changes(spark, root, 0, 0)
    assert {(r["id"], r["_change_type"]) for r in ch0.collect()} == {
        (i, "insert") for i in range(10)
    }
    # DV-strategy DML also emits CDF
    delta_delete(spark, root, "id = 3", strategy="dv")  # v5
    ch5 = delta_table_changes(spark, root, 5, 5)
    assert {(r["id"], r["_change_type"]) for r in ch5.collect()} == {
        (3, "delete")
    }
    delta_update(spark, root, {"v": "v + 0.5"}, "id = 4", strategy="dv")  # v6
    ch6 = delta_table_changes(spark, root, 6, 6)
    assert {(r["id"], r["v"], r["_change_type"]) for r in ch6.collect()} == {
        (4, 4.0, "update_preimage"),
        (4, 4.5, "update_postimage"),
    }
    # table state agrees with the replayed changes
    rows = {(r["id"], r["v"]) for r in delta_read(spark, root).collect()}
    assert rows == {
        (0, 0.0), (1, 10.0), (2, 222.0), (4, 4.5),
        (5, 5.0), (6, 6.0), (7, 7.0), (50, 50.0),
    }

    # a pre-CDF removal range raises
    root2 = str(tmp_path / "nocdf")
    delta_write(
        spark.createDataFrame([(1, 1.0), (2, 2.0)], "id long, v double"),
        root2,
        mode="error",
    )
    delta_delete(spark, root2, "id = 1", strategy="rewrite")
    with _pytest.raises(ValueError, match="without change data"):
        delta_table_changes(spark, root2, 0, 1).collect()


def test_lakehouse_table_changes_front_door(spark, tmp_path):
    """Round 12: the lakehouse front door exposes the change feed —
    delta routes to delta_table_changes; an unknown format raises."""
    import pytest as _pytest

    from simple_data_workflow_spark.sources import lakehouse
    from simple_data_workflow_spark.sources.delta_writer import (
        delta_delete,
        delta_set_properties,
        delta_write,
    )

    root = str(tmp_path / "fdcdf")
    delta_write(
        spark.createDataFrame([(1, 1.0), (2, 2.0)], "id long, v double"),
        root,
        mode="error",
    )
    delta_set_properties(spark, root, {"delta.enableChangeDataFeed": "true"})
    delta_delete(spark, root, "id = 1")
    ch = lakehouse.table_changes(spark, "delta", root, 2, 2)
    assert {(r["id"], r["_change_type"]) for r in ch.collect()} == {
        (1, "delete")
    }
    with _pytest.raises(ValueError, match="unknown"):
        lakehouse.table_changes(spark, "not-a-format", root)


def test_cdf_derives_overwrite_and_restore(spark, tmp_path):
    """Round 12 continuation: CDF spec derivation — an OVERWRITE commit
    on a CDF-enabled table (remove+add, no cdc) derives delete rows
    from the removed files' pre-commit LIVE state (DVs applied) and
    insert rows from the adds; a DV-carrying file's already-dead rows
    never resurrect as deletes."""
    from simple_data_workflow_spark.sources.delta_reader import (
        delta_table_changes,
    )
    from simple_data_workflow_spark.sources.delta_writer import (
        delta_delete,
        delta_set_properties,
        delta_write,
    )

    root = str(tmp_path / "cdfow")
    delta_write(
        spark.createDataFrame(
            [(i, float(i)) for i in range(6)], "id long, v double"
        ).coalesce(1),
        root,
        mode="error",
    )  # v0
    delta_set_properties(spark, root, {"delta.enableChangeDataFeed": "true"})
    delta_delete(spark, root, "id = 5", strategy="dv")  # v2: DV masks id=5
    delta_write(
        spark.createDataFrame([(100, 1.0)], "id long, v double"),
        root,
        mode="overwrite",
    )  # v3: remove all + add, NO cdc
    ch = delta_table_changes(spark, root, 3, 3)
    got = {(r["id"], r["_change_type"]) for r in ch.collect()}
    # deletes = the LIVE rows before the overwrite (id 5 was already
    # dead via its DV — it must NOT reappear as a delete)
    assert got == {(i, "delete") for i in range(5)} | {(100, "insert")}


def test_delta_check_constraints(spark, tmp_path):
    """Round 12 continuation: CHECK constraints — ADD CONSTRAINT
    validates existing rows and upgrades the protocol; violating
    appends/overwrites/UPDATEs (both strategies)/MERGE inserts refuse
    with DeltaConstraintViolation; NULL evaluates as a violation
    (Delta's rule, stricter than SQL CHECK); DROP lifts the gate."""
    import pytest as _pytest

    from simple_data_workflow_spark.sources.delta_reader import delta_read
    from simple_data_workflow_spark.sources.delta_writer import (
        DeltaConstraintViolation,
        _replay_full,
        delta_add_constraint,
        delta_drop_constraint,
        delta_merge_upsert,
        delta_update,
        delta_write,
    )

    root = str(tmp_path / "chk")
    delta_write(
        spark.createDataFrame([(1, 10.0), (2, 20.0)], "id long, v double"),
        root,
        mode="error",
    )
    # existing data violates -> refuse, nothing committed
    with _pytest.raises(DeltaConstraintViolation, match="v_big"):
        delta_add_constraint(spark, root, "v_big", "v > 15.0")
    delta_add_constraint(spark, root, "v_pos", "v > 0.0")
    with _pytest.raises(ValueError, match="already exists"):
        delta_add_constraint(spark, root, "V_POS", "v > 1.0")
    # legacy protocol bumped to writer version 3
    _a, _m, proto, _v, _t = _replay_full(spark, root)
    assert int(proto["minWriterVersion"]) >= 3

    # violating append refuses; clean append passes
    with _pytest.raises(DeltaConstraintViolation, match="v_pos"):
        delta_write(
            spark.createDataFrame([(3, -1.0)], "id long, v double"),
            root, mode="append",
        )
    # NULL is a violation too
    with _pytest.raises(DeltaConstraintViolation, match="v_pos"):
        delta_write(
            spark.createDataFrame([(3, None)], "id long, v double"),
            root, mode="append",
        )
    delta_write(
        spark.createDataFrame([(3, 30.0)], "id long, v double"),
        root, mode="append",
    )

    # UPDATE that would break the constraint refuses on BOTH engines
    for strat in ("rewrite", "dv"):
        with _pytest.raises(DeltaConstraintViolation, match="v_pos"):
            delta_update(spark, root, {"v": "v - 100.0"}, "id = 1", strategy=strat)
    # MERGE whose insert rows violate refuses
    with _pytest.raises(DeltaConstraintViolation, match="v_pos"):
        delta_merge_upsert(
            spark,
            root,
            spark.createDataFrame([(9, -9.0)], "id long, v double"),
            ["id"],
            strategy="rewrite",
        )
    # table unchanged by all refused writes
    assert {(r["id"], r["v"]) for r in delta_read(spark, root).collect()} == {
        (1, 10.0), (2, 20.0), (3, 30.0)
    }
    # legal UPDATE still works under the constraint
    delta_update(spark, root, {"v": "v + 1.0"}, "id = 2", strategy="rewrite")
    assert {(r["id"], r["v"]) for r in delta_read(spark, root).collect()} == {
        (1, 10.0), (2, 21.0), (3, 30.0)
    }

    # DROP lifts the gate
    delta_drop_constraint(spark, root, "v_pos")
    with _pytest.raises(ValueError, match="no constraint"):
        delta_drop_constraint(spark, root, "v_pos")
    delta_write(
        spark.createDataFrame([(4, -4.0)], "id long, v double"),
        root, mode="append",
    )
    assert delta_read(spark, root).count() == 4


def test_delta_shallow_clone(spark, tmp_path):
    """Round 12 continuation: shallow CLONE — the clone reads the
    source snapshot through absolute-path add actions (DV descriptors
    re-anchored as storageType 'p'), version pinning works, writes on
    the clone never touch the source, and vacuum on the clone cannot
    reap source data files."""
    import glob as _glob

    import pytest as _pytest

    from simple_data_workflow_spark.sources.delta_reader import delta_read
    from simple_data_workflow_spark.sources.delta_writer import (
        delta_clone,
        delta_delete,
        delta_update,
        delta_vacuum,
        delta_write,
    )

    src = str(tmp_path / "src")
    delta_write(
        spark.createDataFrame(
            [(i, float(i)) for i in range(10)], "id long, v double"
        ).repartition(4),
        src,
        mode="error",
    )
    delta_delete(spark, src, "id >= 8", strategy="dv")  # v1 + a DV sidecar
    delta_write(
        spark.createDataFrame([(100, 100.0)], "id long, v double"),
        src, mode="append",
    )  # v2

    dst = str(tmp_path / "dst")
    assert delta_clone(spark, src, dst) == 0
    want = {(i, float(i)) for i in range(8)} | {(100, 100.0)}
    assert {(r["id"], r["v"]) for r in delta_read(spark, dst).collect()} == want

    # version-pinned clone: pre-append snapshot (v1, DV applied)
    dst1 = str(tmp_path / "dst_v1")
    delta_clone(spark, src, dst1, version=1)
    assert {(r["id"], r["v"]) for r in delta_read(spark, dst1).collect()} == {
        (i, float(i)) for i in range(8)
    }
    # clone onto an existing table refuses
    with _pytest.raises(ValueError, match="already exists"):
        delta_clone(spark, src, dst)

    # divergence: update + append on the clone; source unchanged
    delta_update(spark, dst, {"v": "v + 0.5"}, "id = 0", strategy="rewrite")
    delta_write(
        spark.createDataFrame([(200, 200.0)], "id long, v double"),
        dst, mode="append",
    )
    got_dst = {(r["id"], r["v"]) for r in delta_read(spark, dst).collect()}
    assert (0, 0.5) in got_dst and (200, 200.0) in got_dst
    assert {(r["id"], r["v"]) for r in delta_read(spark, src).collect()} == want

    # vacuum on the clone reaps only clone-root orphans — the source's
    # data files all survive
    src_before = set(_glob.glob(f"{src}/**/*.parquet", recursive=True))
    delta_vacuum(spark, dst, retention_hours=0)
    assert set(_glob.glob(f"{src}/**/*.parquet", recursive=True)) == src_before
    assert {(r["id"], r["v"]) for r in delta_read(spark, src).collect()} == want
    assert {(r["id"], r["v"]) for r in delta_read(spark, dst).collect()} == got_dst


def test_path_encoding_partition_values_delta(spark, tmp_path):
    """Round 12 continuation: partition values with URI-special chars
    (space, %) — `_metadata.file_path` percent-encodes them while the
    log records decoded paths, so every scan/metadata path comparison
    must normalize. Pins DV delete, DV-masked read, rewrite UPDATE,
    and CDF across a `NOT SPECIFIED`-style partition."""
    from simple_data_workflow_spark.sources.delta_reader import delta_read
    from simple_data_workflow_spark.sources.delta_writer import (
        delta_delete,
        delta_update,
        delta_write,
    )

    root = str(tmp_path / "enc")
    df = spark.createDataFrame(
        [(i, float(i), "NOT SPECIFIED" if i % 2 else "100% sure")
         for i in range(40)],
        "id long, v double, prio string",
    )
    delta_write(df.repartition(4), root, mode="error", partition_by=["prio"])
    # DV delete inside the encoded partitions
    delta_delete(spark, root, "id < 10", strategy="dv")
    got = {(r["id"], r["prio"]) for r in delta_read(spark, root).collect()}
    assert got == {(i, "NOT SPECIFIED" if i % 2 else "100% sure")
                   for i in range(10, 40)}
    # rewrite UPDATE must find the encoded files
    delta_update(spark, root, {"v": "v + 1000.0"}, "id >= 30", strategy="rewrite")
    vs = {r["id"]: r["v"] for r in delta_read(spark, root).collect()}
    assert vs[30] == 1030.0 and vs[29] == 29.0 and len(vs) == 30
    # DV UPDATE too (dv strategy appends new rows + masks old)
    delta_update(spark, root, {"v": "v - 7.0"}, "id = 15", strategy="dv")
    vs = {r["id"]: r["v"] for r in delta_read(spark, root).collect()}
    assert vs[15] == 8.0 and len(vs) == 30


def test_delta_v2_checkpoint_roundtrip(spark, tmp_path):
    """Round 12 continuation: V2 checkpoints — manifest + sidecar
    layout writes, the protocol upgrades with the v2Checkpoint reader
    feature, replay works from the manifest ALONE (pre-checkpoint JSON
    commits deleted), DV descriptors and feature lists survive, and
    classic checkpoints now persist feature-carrying protocols too."""
    import glob as _glob
    import os as _os

    from simple_data_workflow_spark.sources.delta_reader import delta_read
    from simple_data_workflow_spark.sources.delta_writer import (
        _replay_full,
        delta_add_constraint,
        delta_checkpoint,
        delta_delete,
        delta_write,
    )

    root = str(tmp_path / "v2cp")
    delta_write(
        spark.createDataFrame(
            [(i, float(i)) for i in range(20)], "id long, v double"
        ).repartition(4),
        root,
        mode="error",
    )
    delta_delete(spark, root, "id >= 15", strategy="dv")   # v1, DV + features
    delta_add_constraint(spark, root, "v_lo", "v < 1000.0")  # v2
    want = {(i, float(i)) for i in range(15)}

    v = delta_checkpoint(spark, root, format="v2")
    # protocol upgrade commit happened (v2Checkpoint feature)
    _a, _m, proto, cur_v, _t = _replay_full(spark, root)
    assert "v2Checkpoint" in set(proto.get("readerFeatures") or [])
    assert v == cur_v
    # manifest + sidecar exist on disk
    assert _glob.glob(f"{root}/_delta_log/*.checkpoint.*-*.parquet")
    assert _glob.glob(f"{root}/_delta_log/_sidecars/*.parquet")

    # replay from the checkpoint ALONE: delete all pre-checkpoint JSON
    for j in _glob.glob(f"{root}/_delta_log/0*.json"):
        if int(_os.path.basename(j)[:-5]) <= v:
            _os.remove(j)
    assert {(r["id"], r["v"]) for r in delta_read(spark, root).collect()} == want
    # features + constraint survived the checkpoint
    _a2, m2, p2, _v2, _t2 = _replay_full(spark, root)
    assert "deletionVectors" in set(p2.get("readerFeatures") or [])
    assert "delta.constraints.v_lo" in (m2.get("configuration") or {})
    # and writes on the checkpoint-seeded table still work + enforce
    import pytest as _pytest

    from simple_data_workflow_spark.sources.delta_writer import (
        DeltaConstraintViolation,
    )

    with _pytest.raises(DeltaConstraintViolation):
        delta_write(
            spark.createDataFrame([(99, 9999.0)], "id long, v double"),
            root, mode="append",
        )
    delta_write(
        spark.createDataFrame([(99, 99.0)], "id long, v double"),
        root, mode="append",
    )
    assert delta_read(spark, root).count() == 16


def test_delta_classic_checkpoint_preserves_features(spark, tmp_path):
    """A classic checkpoint of a DV table persists the feature-carrying
    protocol (previously the features lists were silently dropped by
    the checkpoint schema)."""
    import glob as _glob
    import os as _os

    from simple_data_workflow_spark.sources.delta_reader import delta_read
    from simple_data_workflow_spark.sources.delta_writer import (
        _replay_full,
        delta_checkpoint,
        delta_delete,
        delta_write,
    )

    root = str(tmp_path / "ccp")
    delta_write(
        spark.createDataFrame(
            [(i, float(i)) for i in range(10)], "id long, v double"
        ).repartition(2),
        root,
        mode="error",
    )
    delta_delete(spark, root, "id >= 8", strategy="dv")
    v = delta_checkpoint(spark, root)
    for j in _glob.glob(f"{root}/_delta_log/0*.json"):
        if int(_os.path.basename(j)[:-5]) <= v:
            _os.remove(j)
    _a, _m, proto, _v, _t = _replay_full(spark, root)
    assert "deletionVectors" in set(proto.get("readerFeatures") or [])
    assert {r["id"] for r in delta_read(spark, root).collect()} == set(range(8))


def test_delta_column_mapping_ddl(spark, tmp_path):
    """Round 12 continuation: column-mapping DDL — enable mapping on a
    plain table (physicalName = current name, so pre-mapping files
    stay readable), RENAME/DROP/ADD COLUMN metadata-only, DML under
    the renamed schema, refusals (no-mapping rename, partition-column
    drop, constraint-referenced rename)."""
    import pytest as _pytest

    from simple_data_workflow_spark.sources.delta_reader import delta_read
    from simple_data_workflow_spark.sources.delta_writer import (
        _replay_full,
        delta_add_column,
        delta_add_constraint,
        delta_delete,
        delta_drop_column,
        delta_drop_constraint,
        delta_enable_column_mapping,
        delta_rename_column,
        delta_write,
    )

    root = str(tmp_path / "cmddl")
    delta_write(
        spark.createDataFrame(
            [(1, 10.0, "a"), (2, 20.0, "b")], "id long, v double, tag string"
        ),
        root,
        mode="error",
        partition_by=["tag"],
    )
    # rename before mapping refuses
    with _pytest.raises(ValueError, match="column mapping"):
        delta_rename_column(spark, root, "v", "value")

    delta_enable_column_mapping(spark, root)
    assert delta_enable_column_mapping(spark, root) >= 0  # idempotent
    _a, meta, proto, _v, _t = _replay_full(spark, root)
    assert (
        int(proto.get("minReaderVersion", 1)) >= 2
        or "columnMapping" in set(proto.get("readerFeatures") or [])
    )
    # pre-mapping files still read
    assert {(r["id"], r["v"]) for r in delta_read(spark, root).collect()} == {
        (1, 10.0), (2, 20.0)
    }

    # RENAME: logical name moves, data files untouched
    delta_rename_column(spark, root, "v", "value")
    got = delta_read(spark, root)
    assert "value" in got.columns and "v" not in got.columns
    assert {(r["id"], r["value"]) for r in got.collect()} == {(1, 10.0), (2, 20.0)}
    # renamed partition column too
    delta_rename_column(spark, root, "tag", "label")
    assert {(r["id"], r["label"]) for r in delta_read(spark, root).collect()} == {
        (1, "a"), (2, "b")
    }
    # appends + DML under the renamed schema
    delta_write(
        spark.createDataFrame([(3, 30.0, "c")], "id long, value double, label string"),
        root, mode="append",
    )
    delta_delete(spark, root, "value >= 30.0", strategy="rewrite")
    assert delta_read(spark, root).count() == 2

    # constraint-referenced rename refuses; dropping the constraint lifts
    delta_add_constraint(spark, root, "val_pos", "value > 0.0")
    with _pytest.raises(ValueError, match="val_pos"):
        delta_rename_column(spark, root, "value", "v2")
    with _pytest.raises(ValueError, match="val_pos"):
        delta_drop_column(spark, root, "value")
    delta_drop_constraint(spark, root, "val_pos")

    # ADD COLUMN: existing rows read NULL; new writes carry it
    delta_add_column(spark, root, "score", "double")
    assert {r["score"] for r in delta_read(spark, root).collect()} == {None}
    delta_write(
        spark.createDataFrame(
            [(9, 90.0, "z", 0.5)],
            "id long, value double, label string, score double",
        ),
        root, mode="append",
    )
    assert (9, 0.5) in {
        (r["id"], r["score"]) for r in delta_read(spark, root).collect()
    }

    # DROP: partition column refuses; a data column drops metadata-only
    with _pytest.raises(ValueError, match="partition"):
        delta_drop_column(spark, root, "label")
    delta_drop_column(spark, root, "score")
    assert "score" not in delta_read(spark, root).columns


def test_optimize_on_mapped_tables(spark, tmp_path):
    """Round 13 (VERDICT r12 #3): OPTIMIZE compacts column-mapped
    tables — name AND id mode — restaging through ``_stage_physical``
    so compacted files keep PHYSICAL names (and parquet.field.id in id
    mode) and partition dirs stay physically named."""
    import glob as _glob
    import urllib.parse as up

    import pyarrow.parquet as pq

    from simple_data_workflow_spark.sources.delta_writer import (
        delta_optimize,
        delta_write,
    )

    # --- name mode (partitioned, nested struct) ---
    root = str(tmp_path / "optname")
    _mapped_fixture(spark, root, "name")
    delta_write(
        spark.createDataFrame(
            [(10, (10.5,), "US"), (30, (30.5,), "EU")],
            "id long, payload struct<score: double>, region string",
        ),
        root,
        mode="append",
        partition_by=["region"],
    )
    v = delta_optimize(spark, root, small_file_bytes=1024 * 1024)
    assert v is not None
    got = {
        (r["id"], r["payload"]["score"], r["region"])
        for r in delta_read(spark, root).collect()
    }
    assert got == {
        (1, 1.5, "US"), (2, 2.5, "US"), (3, 3.5, "EU"),
        (10, 10.5, "US"), (30, 30.5, "EU"),
    }
    with open(f"{root}/_delta_log/{v:020d}.json") as f:
        acts = [json.loads(line) for line in f if line.strip()]
    new_adds = [a["add"] for a in acts if "add" in a]
    assert new_adds and all(
        "col-p" in a["partitionValues"] for a in new_adds
    )
    newf = up.unquote(f"{root}/{new_adds[0]['path']}")
    sch = pq.ParquetFile(newf).schema_arrow
    assert {f.name for f in sch} == {"col-a", "col-b"}

    # --- id mode (flat) ---
    root2 = str(tmp_path / "optid")
    _mapped_fixture(spark, root2, "id")
    delta_write(
        spark.createDataFrame([(9, 9.5)], "id long, score double"),
        root2,
        mode="append",
    )
    v2 = delta_optimize(spark, root2, small_file_bytes=1024 * 1024)
    assert v2 is not None
    got2 = {(r["id"], r["score"]) for r in delta_read(spark, root2).collect()}
    assert got2 == {(1, 1.5), (2, 2.5), (3, 3.5), (9, 9.5)}
    with open(f"{root2}/_delta_log/{v2:020d}.json") as f:
        acts2 = [json.loads(line) for line in f if line.strip()]
    add2 = [a["add"] for a in acts2 if "add" in a][0]
    sch2 = pq.ParquetFile(up.unquote(f"{root2}/{add2['path']}")).schema_arrow
    assert {f.name for f in sch2} == {"p-1", "p-2"}
    assert sch2.field("p-1").metadata[b"PARQUET:field_id"] == b"1"


def test_cdf_on_mapped_tables(spark, tmp_path):
    """Round 13 (VERDICT r12 #3): change data feed works with BOTH
    column-mapping modes — change files store data columns exactly like
    data files (physical names; field ids in id mode) and
    ``table_changes`` reads them back under logical names."""
    from simple_data_workflow_spark.sources.delta_reader import (
        delta_table_changes,
    )
    from simple_data_workflow_spark.sources.delta_writer import (
        delta_delete,
        delta_set_properties,
        delta_update,
    )

    # --- name mode ---
    root = str(tmp_path / "cdfname")
    _mapped_fixture(spark, root, "name")
    delta_set_properties(spark, root, {"delta.enableChangeDataFeed": "true"})
    delta_delete(spark, root, "id = 2")
    ch = delta_table_changes(spark, root, starting_version=2)
    rows = {
        (r["id"], r["payload"]["score"], r["region"], r["_change_type"])
        for r in ch.collect()
    }
    assert rows == {(2, 2.5, "US", "delete")}

    # --- id mode ---
    root2 = str(tmp_path / "cdfid")
    _mapped_fixture(spark, root2, "id")
    delta_set_properties(spark, root2, {"delta.enableChangeDataFeed": "true"})
    delta_update(spark, root2, {"score": "score + 100.0"}, "id = 3")
    ch2 = delta_table_changes(spark, root2, starting_version=2)
    rows2 = {
        (r["id"], r["score"], r["_change_type"]) for r in ch2.collect()
    }
    assert rows2 == {
        (3, 3.5, "update_preimage"),
        (3, 103.5, "update_postimage"),
    }


def test_v2_checkpoint_upgrade_carries_legacy_implied_features(
    spark, tmp_path
):
    """ADVICE r12 (medium): upgrading a LEGACY protocol to table
    features (reader 3 / writer 7, e.g. for a v2 checkpoint) must list
    every feature the old minReader/minWriter versions implied — a
    constraint-carrying (writer 3) + CDF-enabled (writer 4) table that
    lands at writer 7 without checkConstraints/changeDataFeed in
    writerFeatures would make real engines refuse it or silently stop
    enforcing."""
    from simple_data_workflow_spark.sources.delta_writer import (
        DeltaConstraintViolation,
        _replay_full,
        delta_add_constraint,
        delta_checkpoint,
        delta_set_properties,
    )

    root = str(tmp_path / "legacyfeat")
    delta_write(
        spark.createDataFrame([(1, 10.0), (2, 20.0)], "id long, v double"),
        root,
        mode="error",
    )
    delta_add_constraint(spark, root, "v_pos", "v > 0")       # → writer 3
    delta_set_properties(
        spark, root, {"delta.enableChangeDataFeed": "true"}
    )                                                         # → writer 4
    delta_checkpoint(spark, root, format="v2")                # → 3 / 7
    _a, _m, proto, _v, _t = _replay_full(spark, root)
    assert proto["minReaderVersion"] == 3
    assert proto["minWriterVersion"] == 7
    wf = set(proto["writerFeatures"])
    assert {
        "appendOnly",
        "invariants",
        "checkConstraints",
        "changeDataFeed",
        "v2Checkpoint",
    } <= wf
    # the features still ENFORCE after the upgrade
    with pytest.raises(DeltaConstraintViolation):
        delta_write(
            spark.createDataFrame([(3, -1.0)], "id long, v double"),
            root,
            mode="append",
        )


def test_constraint_validation_pins_nondeterministic_rows(spark, tmp_path):
    """ADVICE r12 (low): with a non-deterministic source the rows that
    PASS constraint validation must be the rows COMMITTED —
    _enforce_constraints localCheckpoint-pins the input before
    validating, so rand() cannot produce different rows at staging.
    And a constraint that no longer resolves after overwrite_schema
    raises a clean refusal, not a raw AnalysisException."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from simple_data_workflow_spark.sources.delta_writer import (
        delta_add_constraint,
    )

    root = str(tmp_path / "ndconstraint")
    delta_write(
        spark.createDataFrame([(1, 0.5)], "id long, v double"),
        root,
        mode="error",
    )
    delta_add_constraint(spark, root, "v_small", "v < 1.0")
    # rand() < 1.0 always passes, but the STAGED rows must equal the
    # VALIDATED rows — commit and read back: every row satisfies
    nd = spark.range(200).select(
        F.col("id"), (F.rand(seed=7) * 0.99).alias("v")
    )
    delta_write(nd, root, mode="append")
    vals = [r["v"] for r in delta_read(spark, root).collect()]
    assert len(vals) == 201 and all(v < 1.0 for v in vals)
    # overwrite_schema dropping the constrained column: clean refusal
    with _pytest.raises(ValueError, match="v_small"):
        delta_write(
            spark.createDataFrame([(1,)], "id long"),
            root,
            mode="overwrite",
            overwrite_schema=True,
        )


def test_clone_preserves_scheme_in_absolute_uris(spark, tmp_path):
    """ADVICE r12 (low): cloning a table whose resolved source paths
    are scheme'd URIs must not percent-encode the ':' — only the path
    component quotes, so the clone's add paths stay readable."""
    from simple_data_workflow_spark.sources.delta_writer import (
        _replay_full,
        delta_clone,
    )

    import json as _json
    import urllib.parse as _up

    src_root = str(tmp_path / "clonesrc")
    delta_write(
        spark.createDataFrame([(1, "x"), (2, "y")], "id long, s string"),
        src_root,
        mode="error",
    )
    # rewrite the source log so its add paths are scheme'd ABSOLUTE
    # URIs (the shape real cross-store tables and clones-of-clones
    # carry) — the quoting bug encoded ':' and broke exactly this
    log0 = f"{src_root}/_delta_log/{0:020d}.json"
    lines = []
    for line in open(log0):
        if not line.strip():
            continue
        act = _json.loads(line)
        if "add" in act:
            dec = _up.unquote(act["add"]["path"])
            act["add"]["path"] = "file://" + _up.quote(f"{src_root}/{dec}")
        lines.append(_json.dumps(act))
    with open(log0, "w") as f:
        f.write("\n".join(lines) + "\n")
    assert {(r["id"], r["s"]) for r in delta_read(spark, src_root).collect()} == {
        (1, "x"),
        (2, "y"),
    }
    dst = str(tmp_path / "clonedst")
    delta_clone(spark, src_root, dst)
    adds, _m, _p, _v, _t = _replay_full(spark, dst)
    # clone-of-clone exercises the absolute-URI re-quote path too
    for rel in adds:
        assert "%3A" not in rel and "%3a" not in rel, rel
    got = {(r["id"], r["s"]) for r in delta_read(spark, dst).collect()}
    assert got == {(1, "x"), (2, "y")}
    dst2 = str(tmp_path / "clonedst2")
    delta_clone(spark, dst, dst2)
    got2 = {(r["id"], r["s"]) for r in delta_read(spark, dst2).collect()}
    assert got2 == {(1, "x"), (2, "y")}


def test_optimize_after_column_mapping_ddl(spark, tmp_path):
    """Round 13 (VERDICT r12 #3 'done' shape): OPTIMIZE on a table that
    went through the column-mapping DDL lifecycle — enable mapping →
    RENAME COLUMN → post-rename append — compacts correctly: the
    rewritten files stage under PHYSICAL names (the pre-rename
    spelling), and the read returns the same rows under logical
    names."""
    import glob as _glob

    from simple_data_workflow_spark.sources.delta_writer import (
        delta_enable_column_mapping,
        delta_optimize,
        delta_rename_column,
    )

    root = str(tmp_path / "optddl")
    delta_write(
        spark.createDataFrame(
            [(i, float(i)) for i in range(6)], "id long, amount double"
        ),
        root,
        mode="error",
    )
    delta_enable_column_mapping(spark, root)
    delta_rename_column(spark, root, "amount", "price")
    delta_write(
        spark.createDataFrame([(100, 100.5)], "id long, price double"),
        root,
        mode="append",
    )
    before = {
        (r["id"], r["price"]) for r in delta_read(spark, root).collect()
    }
    v = delta_optimize(spark, root, small_file_bytes=1024 * 1024)
    assert v is not None
    after = {
        (r["id"], r["price"]) for r in delta_read(spark, root).collect()
    }
    assert after == before == {(i, float(i)) for i in range(6)} | {(100, 100.5)}
    # the compacted file carries the PHYSICAL column name (the
    # pre-rename spelling 'amount' — physicalName never moves)
    import json as _json
    import urllib.parse as _up

    import pyarrow.parquet as pq

    with open(f"{root}/_delta_log/{v:020d}.json") as f:
        acts = [_json.loads(line) for line in f if line.strip()]
    add = [a["add"] for a in acts if "add" in a][0]
    sch = pq.ParquetFile(_up.unquote(f"{root}/{add['path']}")).schema_arrow
    assert "amount" in {fl.name for fl in sch}
    assert "price" not in {fl.name for fl in sch}


def test_writer_feature_gate_and_append_only(spark, tmp_path):
    """Round 13: PROTOCOL.md's writer rule — a writer must support
    EVERY listed writer feature before committing anything. Unknown
    features (rowTracking et al.) refuse writes AND checkpoints;
    ``delta.appendOnly = true`` refuses data-removing commits while
    appends and OPTIMIZE stay allowed; GENERATED-column schemas refuse."""
    import json as _json

    import pytest as _pytest

    from simple_data_workflow_spark.sources.delta_writer import (
        delta_checkpoint,
        delta_delete,
        delta_optimize,
        delta_set_properties,
    )

    # append-only enforcement
    root = str(tmp_path / "appendonly")
    delta_write(
        spark.createDataFrame([(1, 1.0), (2, 2.0)], "id long, v double"),
        root,
        mode="error",
    )
    delta_set_properties(spark, root, {"delta.appendOnly": "true"})
    delta_write(
        spark.createDataFrame([(3, 3.0)], "id long, v double"),
        root,
        mode="append",
    )  # appends stay allowed
    with _pytest.raises(ValueError, match="append-only"):
        delta_delete(spark, root, "id = 1")
    with _pytest.raises(ValueError, match="append-only"):
        delta_write(
            spark.createDataFrame([(9, 9.0)], "id long, v double"),
            root,
            mode="overwrite",
        )
    # OPTIMIZE (dataChange=false) is not a data-removing commit
    delta_optimize(spark, root, small_file_bytes=1024 * 1024)
    assert {r["id"] for r in delta_read(spark, root).collect()} == {1, 2, 3}

    # unknown writer feature refuses write + checkpoint
    root2 = str(tmp_path / "rowtracking")
    delta_write(
        spark.createDataFrame([(1, 1.0)], "id long, v double"),
        root2,
        mode="error",
    )
    with open(f"{root2}/_delta_log/{1:020d}.json", "w") as f:
        f.write(
            _json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 1,
                        "minWriterVersion": 7,
                        "writerFeatures": ["appendOnly", "rowTracking"],
                    }
                }
            )
            + "\n"
        )
    with _pytest.raises(NotImplementedError, match="rowTracking"):
        delta_write(
            spark.createDataFrame([(2, 2.0)], "id long, v double"),
            root2,
            mode="append",
        )
    with _pytest.raises(NotImplementedError, match="rowTracking"):
        delta_checkpoint(spark, root2)
    # reads stay fine (writer features never gate reads)
    assert delta_read(spark, root2).count() == 1

    # GENERATED column schema refuses writes
    root3 = str(tmp_path / "gencol")
    delta_write(
        spark.createDataFrame([(1, 1.0)], "id long, v double"),
        root3,
        mode="error",
    )
    meta_path = f"{root3}/_delta_log/{0:020d}.json"
    out = []
    for line in open(meta_path):
        act = _json.loads(line)
        if "metaData" in act:
            sch = _json.loads(act["metaData"]["schemaString"])
            sch["fields"][1]["metadata"] = {
                "delta.generationExpression": "id * 2"
            }
            act["metaData"]["schemaString"] = _json.dumps(sch)
        out.append(_json.dumps(act))
    # republish the mutated metaData as a new commit
    meta_line = next(a for a in out if "metaData" in _json.loads(a))
    with open(f"{root3}/_delta_log/{1:020d}.json", "w") as f:
        f.write(meta_line + "\n")
    with _pytest.raises(NotImplementedError, match="GENERATED"):
        delta_write(
            spark.createDataFrame([(2, 2.0)], "id long, v double"),
            root3,
            mode="append",
        )


def test_domain_metadata_preserved_through_checkpoint(spark, tmp_path):
    """Round 13: domainMetadata actions (the writer feature backing
    e.g. clustering state) are PRESERVED — replay tracks the latest
    per domain, checkpoints carry them (classic and v2), and the
    feature is writable instead of refused."""
    import glob as _glob
    import json as _json
    import os as _os

    from simple_data_workflow_spark.sources.delta_state import (
        replay_snapshot,
    )
    from simple_data_workflow_spark.sources.delta_writer import (
        delta_checkpoint,
    )

    for fmt in ("classic", "v2"):
        root = str(tmp_path / f"dm_{fmt}")
        delta_write(
            spark.createDataFrame([(1, 1.0)], "id long, v double"),
            root,
            mode="error",
        )
        # a foreign writer recorded domain metadata + the feature
        with open(f"{root}/_delta_log/{1:020d}.json", "w") as f:
            f.write(
                _json.dumps(
                    {
                        "protocol": {
                            "minReaderVersion": 1,
                            "minWriterVersion": 7,
                            "writerFeatures": [
                                "appendOnly", "invariants", "domainMetadata"
                            ],
                        }
                    }
                )
                + "\n"
                + _json.dumps(
                    {
                        "domainMetadata": {
                            "domain": "delta.clustering",
                            "configuration": "{\"clusteringColumns\":[]}",
                            "removed": False,
                        }
                    }
                )
                + "\n"
            )
        # writes still allowed (feature preserved, not refused)
        delta_write(
            spark.createDataFrame([(2, 2.0)], "id long, v double"),
            root,
            mode="append",
        )
        delta_checkpoint(spark, root, format=fmt)
        # drop every pre-checkpoint commit: the checkpoint is the truth
        for p in sorted(_glob.glob(f"{root}/_delta_log/*.json"))[:-1]:
            _os.remove(p)
        snap = replay_snapshot(spark, root)
        assert "delta.clustering" in snap.domains
        assert snap.domains["delta.clustering"]["configuration"] == (
            "{\"clusteringColumns\":[]}"
        )
        assert delta_read(spark, root).count() == 2
