"""Jar-free Iceberg WRITE interop (round 10): create/append/overwrite
through ``sources.iceberg_writer``, round-tripped through the jar-free
reader (``sources.iceberg_reader``). The writer emits the spec's v1
metadata chain — parquet data files with ``PARQUET:field_id`` footers,
Avro manifests + manifest lists written by the REFERENCE
``org.apache.avro`` implementation, versioned ``*.metadata.json`` — so
these tests pin conformance to the PUBLIC spec, not to a runtime."""

import glob
import json
import os

import pytest

from simple_data_workflow_spark.sources.iceberg_reader import (
    iceberg_read,
    load_table_metadata,
)
from simple_data_workflow_spark.sources.iceberg_writer import (
    IcebergSchemaMismatch,
    iceberg_write,
)


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_iceberg_write_create_and_roundtrip(spark, tmp_path):
    root = str(tmp_path / "iw")
    df = spark.createDataFrame(
        [(1, 1.5, "a"), (2, 2.5, "b"), (3, 3.5, None)],
        "id long, v double, tag string",
    )
    snap = iceberg_write(df, root, mode="error")
    back = iceberg_read(spark, root)
    assert back.columns == ["id", "v", "tag"]
    assert _rows(back) == _rows(df)
    # metadata chain is spec-shaped: v2 by default (what real runtimes
    # write) + schema ids + one sequence-numbered snapshot
    meta = load_table_metadata(spark, root)
    assert meta["format-version"] == 2
    assert meta["last-sequence-number"] == 1
    assert meta["snapshots"][0]["sequence-number"] == 1
    assert meta["current-snapshot-id"] == snap
    ids = [f["id"] for f in meta["schema"]["fields"]]
    assert ids == [1, 2, 3]
    # creating again refuses
    with pytest.raises(ValueError, match="already exists"):
        iceberg_write(df, root, mode="error")


def test_iceberg_write_data_files_carry_field_ids(spark, tmp_path):
    """Real Iceberg readers resolve parquet columns by FIELD ID — the
    staged data files must carry them in the footers (including nested
    struct fields), or interop is name-matching luck."""
    import pyarrow.parquet as pq

    root = str(tmp_path / "iwf")
    df = spark.createDataFrame(
        [(1, (2.0,))], "id long, payload struct<score: double>"
    )
    iceberg_write(df, root, mode="error")
    f = glob.glob(f"{root}/data/*.parquet")[0]
    arrow = pq.ParquetFile(f).schema_arrow
    got = {
        fld.name: int((fld.metadata or {}).get(b"PARQUET:field_id", -1))
        for fld in arrow
    }
    assert got["id"] == 1
    assert got["payload"] == 2
    nested = arrow.field("payload").type.field(0)
    assert int((nested.metadata or {}).get(b"PARQUET:field_id")) == 3


def test_iceberg_write_append_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "iwa")
    d1 = spark.createDataFrame([(1, 1.0)], "id long, v double")
    d2 = spark.createDataFrame([(2, 2.0)], "id long, v double")
    s1 = iceberg_write(d1, root, mode="error")
    s2 = iceberg_write(d2, root, mode="append")
    assert _rows(iceberg_read(spark, root)) == {(1, 1.0), (2, 2.0)}
    assert _rows(iceberg_read(spark, root, snapshot_id=s1)) == {(1, 1.0)}
    assert _rows(iceberg_read(spark, root, snapshot_id=s2)) == {
        (1, 1.0),
        (2, 2.0),
    }
    # appends REUSE the prior manifest in the new manifest list
    meta = load_table_metadata(spark, root)
    assert len(meta["snapshots"]) == 2
    # schema drift on append refuses
    with pytest.raises(IcebergSchemaMismatch, match="schema"):
        iceberg_write(
            spark.createDataFrame([(1, "x")], "id long, v string"),
            root,
            mode="append",
        )


def test_iceberg_write_overwrite_keeps_history(spark, tmp_path):
    root = str(tmp_path / "iwo")
    s1 = iceberg_write(
        spark.createDataFrame([(1, 1.0)], "id long, v double"), root, "error"
    )
    s2 = iceberg_write(
        spark.createDataFrame([(9, 9.0)], "id long, v double"),
        root,
        "overwrite",
    )
    assert _rows(iceberg_read(spark, root)) == {(9, 9.0)}
    assert _rows(iceberg_read(spark, root, snapshot_id=s1)) == {(1, 1.0)}
    meta = load_table_metadata(spark, root)
    assert meta["current-snapshot-id"] == s2
    snap2 = [s for s in meta["snapshots"] if s["snapshot-id"] == s2][0]
    assert snap2["summary"]["operation"] == "overwrite"
    assert snap2["parent-snapshot-id"] == s1


def test_iceberg_write_identity_partitioned(spark, tmp_path):
    """Identity partitioning: Hive-layout dirs, per-file partition
    values in the manifest's typed partition record, and — per spec,
    unlike Delta — the partition column stays IN the data files."""
    import pyarrow.parquet as pq

    root = str(tmp_path / "iwp")
    df = spark.createDataFrame(
        [(1, "US"), (2, "US"), (3, "EU"), (4, None)],
        "id long, region string",
    )
    iceberg_write(df, root, mode="error", partition_by=["region"])
    back = iceberg_read(spark, root)
    assert _rows(back) == {(1, "US"), (2, "US"), (3, "EU"), (4, None)}
    meta = load_table_metadata(spark, root)
    assert meta["partition-spec"] == [
        {
            "name": "region",
            "transform": "identity",
            "source-id": 2,
            "field-id": 1000,
        }
    ]
    # partition column is physically present in the data files
    f = glob.glob(f"{root}/data/region=US/*.parquet")
    assert f, "expected Hive-layout partition dirs under data/"
    assert "region" in {c.name for c in pq.ParquetFile(f[0]).schema_arrow}
    # append inherits the table's partition spec
    iceberg_write(
        spark.createDataFrame([(5, "AP")], "id long, region string"),
        root,
        mode="append",
    )
    assert (3, "EU") in _rows(iceberg_read(spark, root))
    assert (5, "AP") in _rows(iceberg_read(spark, root))


def test_iceberg_lakehouse_front_door(spark, tmp_path):
    from simple_data_workflow_spark.sources import lakehouse

    root = str(tmp_path / "iwl")
    df = spark.createDataFrame([(1, 2.0)], "id long, v double")
    lakehouse.write_table(df, "iceberg", root, mode="overwrite")
    got = lakehouse.read_table(spark, "iceberg", root)
    assert _rows(got) == {(1, 2.0)}


def test_iceberg_position_deletes_applied(spark, tmp_path):
    """v2 row-level POSITION deletes: a delete manifest's parquet
    (file_path, pos) rows mask exactly those rows out of their target
    data files; equality deletes still refuse. The fixture extends a
    writer-built table with a hand-built v2 snapshot (manifest list
    with content fields, delete manifest, delete parquet)."""
    import json as _json

    from simple_data_workflow_spark.sources.iceberg_reader import (
        IcebergFeatureUnsupported,
        load_table_metadata,
    )
    from simple_data_workflow_spark.sources.iceberg_writer import (
        _write_avro,
        iceberg_write,
    )

    root = str(tmp_path / "ipd")
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "id long, v double"
    )
    iceberg_write(df.coalesce(1), root, mode="error")
    meta = load_table_metadata(spark, root)
    snap0 = meta["snapshots"][0]
    data_file = glob.glob(f"{root}/data/*.parquet")[0]

    # position-delete parquet: drop rows at positions 1, 3, 7
    dele = spark.createDataFrame(
        [(data_file, 1), (data_file, 3), (data_file, 7)],
        "file_path string, pos long",
    )
    dpath = f"{root}/data/pos-deletes.parquet"
    tmp = dpath + ".__tmp__"
    dele.coalesce(1).write.parquet(tmp)
    import shutil as _shutil

    part = glob.glob(f"{tmp}/part-*.parquet")[0]
    _shutil.move(part, dpath)
    _shutil.rmtree(tmp)

    entry_schema = _json.dumps(
        {
            "type": "record",
            "name": "manifest_entry",
            "fields": [
                {"name": "status", "type": "int", "field-id": 0},
                {
                    "name": "data_file",
                    "type": {
                        "type": "record",
                        "name": "r2",
                        "fields": [
                            {"name": "content", "type": "int", "field-id": 134},
                            {"name": "file_path", "type": "string", "field-id": 100},
                            {"name": "file_format", "type": "string", "field-id": 101},
                            {"name": "record_count", "type": "long", "field-id": 103},
                            {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
                        ],
                    },
                    "field-id": 2,
                },
            ],
        }
    )
    dmanifest = f"{root}/metadata/delete-m0.avro"
    dlen = _write_avro(
        spark,
        dmanifest,
        entry_schema,
        [
            {
                "status": 1,
                "data_file": {
                    "content": 1,
                    "file_path": dpath,
                    "file_format": "PARQUET",
                    "record_count": 3,
                    "file_size_in_bytes": 100,
                },
            }
        ],
        meta={"content": "deletes"},
    )
    mlist_schema = _json.dumps(
        {
            "type": "record",
            "name": "manifest_file",
            "fields": [
                {"name": "manifest_path", "type": "string", "field-id": 500},
                {"name": "manifest_length", "type": "long", "field-id": 501},
                {"name": "partition_spec_id", "type": "int", "field-id": 502},
                {"name": "content", "type": "int", "field-id": 517},
                {"name": "added_snapshot_id", "type": ["null", "long"],
                 "default": None, "field-id": 503},
            ],
        }
    )
    # the original snapshot's (only) data manifest rides along
    from simple_data_workflow_spark.sources.iceberg_reader import (
        _avro_records,
        _get,
        _j2py,
    )

    old = list(_avro_records(spark, snap0["manifest-list"]))
    data_manifest = _j2py(_get(old[0], "manifest_path"))
    data_len = int(_get(old[0], "manifest_length"))
    mlist2 = f"{root}/metadata/snap-777-1-x.avro"
    _write_avro(
        spark,
        mlist2,
        mlist_schema,
        [
            {"manifest_path": data_manifest, "manifest_length": data_len,
             "partition_spec_id": 0, "content": 0, "added_snapshot_id": 777},
            {"manifest_path": dmanifest, "manifest_length": dlen,
             "partition_spec_id": 0, "content": 1, "added_snapshot_id": 777},
        ],
    )
    meta2 = dict(meta)
    meta2["format-version"] = 2
    meta2["last-sequence-number"] = 2
    meta2["snapshots"] = meta["snapshots"] + [
        {
            "snapshot-id": 777,
            "timestamp-ms": snap0["timestamp-ms"] + 1,
            "summary": {"operation": "delete"},
            "manifest-list": mlist2,
            "schema-id": 0,
            "sequence-number": 2,
        }
    ]
    meta2["current-snapshot-id"] = 777
    import os as _os

    with open(f"{root}/metadata/v2.metadata.json", "w") as f:
        _json.dump(meta2, f)
    # the writer created version-hint.text through Hadoop's checksummed
    # local FS; a plain-Python overwrite must drop the stale .crc
    crc = f"{root}/metadata/.version-hint.text.crc"
    if _os.path.exists(crc):
        _os.remove(crc)
    with open(f"{root}/metadata/version-hint.text", "w") as f:
        f.write("2")

    got = {r["id"] for r in iceberg_read(spark, root).collect()}
    assert got == {0, 2, 4, 5, 6, 8, 9}
    # snapshot_id time travel to the pre-delete snapshot: complete
    pre = iceberg_read(spark, root, snapshot_id=snap0["snapshot-id"])
    assert pre.count() == 10
    # the raw-file resolver refuses a delete-carrying snapshot
    from simple_data_workflow_spark.sources.iceberg_reader import (
        iceberg_snapshot_files,
    )

    with pytest.raises(IcebergFeatureUnsupported, match="delete"):
        iceberg_snapshot_files(spark, root)

    # equality deletes without equality_ids refuse (supported equality
    # deletes are pinned in test_iceberg_reader.py)
    eman = f"{root}/metadata/eq-m0.avro"
    elen = _write_avro(
        spark, eman, entry_schema,
        [{"status": 1, "data_file": {"content": 2, "file_path": dpath,
          "file_format": "PARQUET", "record_count": 1,
          "file_size_in_bytes": 10}}],
    )
    mlist3 = f"{root}/metadata/snap-778-1-x.avro"
    _write_avro(
        spark, mlist3, mlist_schema,
        [{"manifest_path": eman, "manifest_length": elen,
          "partition_spec_id": 0, "content": 1, "added_snapshot_id": 778}],
    )
    meta3 = dict(meta2)
    meta3["snapshots"] = meta2["snapshots"] + [
        {"snapshot-id": 778, "timestamp-ms": snap0["timestamp-ms"] + 2,
         "summary": {"operation": "delete"}, "manifest-list": mlist3,
         "schema-id": 0}
    ]
    meta3["current-snapshot-id"] = 778
    with open(f"{root}/metadata/v3.metadata.json", "w") as f:
        _json.dump(meta3, f)
    with open(f"{root}/metadata/version-hint.text", "w") as f:
        f.write("3")
    if _os.path.exists(crc):
        _os.remove(crc)
    with pytest.raises(IcebergFeatureUnsupported, match="equality_ids"):
        iceberg_read(spark, root).collect()


def test_iceberg_v1_explicit_and_append_adopts_version(spark, tmp_path):
    """format_version=1 still emits the old layout; appends adopt the
    table's version regardless of the argument default."""
    root = str(tmp_path / "iw1")
    df = spark.createDataFrame([(1, 1.0)], "id long, v double")
    iceberg_write(df, root, mode="error", format_version=1)
    meta = load_table_metadata(spark, root)
    assert meta["format-version"] == 1 and "last-sequence-number" not in meta
    iceberg_write(df, root, mode="append")  # adopts v1
    meta = load_table_metadata(spark, root)
    assert meta["format-version"] == 1
    assert iceberg_read(spark, root).count() == 2


def test_iceberg_delete_position_dml(spark, tmp_path):
    """Jar-free merge-on-read DELETE: a position-delete snapshot is
    published (no data-file rewrites), the read applies it, the
    pre-delete snapshot stays time-travelable, no-match DELETE is a
    metadata no-op, stacked deletes compose, and v1 tables refuse."""
    from simple_data_workflow_spark.sources.iceberg_reader import (
        IcebergFeatureUnsupported,
        load_table_metadata as _ltm,
    )
    from simple_data_workflow_spark.sources.iceberg_writer import (
        iceberg_delete,
    )

    root = str(tmp_path / "idml")
    df = spark.createDataFrame(
        [(i, float(i), "US" if i % 2 else "EU") for i in range(1, 11)],
        "id long, v double, region string",
    )
    snap0 = iceberg_write(df, root, mode="error")
    data_before = sorted(glob.glob(f"{root}/data/*.parquet"))

    snap1 = iceberg_delete(spark, root, "v >= 8.0 OR region = 'EU'")
    got = {r["id"] for r in iceberg_read(spark, root).collect()}
    assert got == {1, 3, 5, 7}
    # data files untouched (merge-on-read, not copy-on-write)
    assert all(os.path.exists(f) for f in data_before)
    # pre-delete snapshot still reads complete
    assert iceberg_read(spark, root, snap0).count() == 10
    meta = _ltm(spark, root)
    assert meta["last-sequence-number"] == 2
    assert meta["snapshots"][-1]["summary"]["operation"] == "delete"

    # no-match DELETE: metadata no-op, same snapshot id
    assert iceberg_delete(spark, root, "v > 1e9") == snap1

    # stacked second delete composes with the first
    iceberg_delete(spark, root, "id = 3")
    got = {r["id"] for r in iceberg_read(spark, root).collect()}
    assert got == {1, 5, 7}

    # append AFTER deletes: new rows land, old deletes stay applied
    iceberg_write(
        spark.createDataFrame([(100, 100.0, "AS")], "id long, v double, region string"),
        root,
        mode="append",
    )
    got = {r["id"] for r in iceberg_read(spark, root).collect()}
    assert got == {1, 5, 7, 100}

    # v1 tables have no row-level deletes
    root1 = str(tmp_path / "idml1")
    iceberg_write(df, root1, mode="error", format_version=1)
    with pytest.raises(IcebergFeatureUnsupported, match="format-version 2"):
        iceberg_delete(spark, root1, "id = 1")


def test_iceberg_delete_file_carries_reserved_field_ids(spark, tmp_path):
    """Spec: position-delete files stamp file_path/pos with the
    reserved ids 2147483546/2147483545 so real readers resolve them."""
    import pyarrow.parquet as pq

    from simple_data_workflow_spark.sources.iceberg_writer import (
        iceberg_delete,
    )

    root = str(tmp_path / "idfid")
    iceberg_write(
        spark.createDataFrame([(1, 1.0), (2, 2.0)], "id long, v double"),
        root,
        mode="error",
    )
    iceberg_delete(spark, root, "id = 2")
    dfiles = [f for f in glob.glob(f"{root}/data/delete-*.parquet")]
    assert len(dfiles) == 1
    sch = pq.ParquetFile(dfiles[0]).schema_arrow
    ids = {f.name: int(f.metadata[b"PARQUET:field_id"]) for f in sch}
    assert ids == {"file_path": 2147483546, "pos": 2147483545}


def test_iceberg_equality_delete_write(spark, tmp_path):
    """Round 11: equality-delete WRITE — the CDC-writer shape. Costs
    ∝ key rows (no table scan); re-inserts at a later sequence
    survive (the reader's strictly-smaller rule); NULL keys match
    NULL-safe; the delete file stamps the table's field ids."""
    import pyarrow.parquet as pq

    from simple_data_workflow_spark.sources.iceberg_reader import (
        load_table_metadata as _ltm,
    )
    from simple_data_workflow_spark.sources.iceberg_writer import (
        iceberg_equality_delete,
    )

    root = str(tmp_path / "ieqw")
    iceberg_write(
        spark.createDataFrame(
            [(1, 1.0), (2, 2.0), (None, 9.0)], "id long, v double"
        ),
        root,
        mode="error",
    )
    iceberg_equality_delete(
        spark, root, spark.createDataFrame([(2,), (None,)], "id long")
    )
    got = {(r["id"], r["v"]) for r in iceberg_read(spark, root).collect()}
    assert got == {(1, 1.0)}  # id=2 and NULL-id rows dead
    # re-insert id=2 at a higher sequence: survives the older delete
    iceberg_write(
        spark.createDataFrame([(2, 22.0)], "id long, v double"),
        root,
        mode="append",
    )
    got = {(r["id"], r["v"]) for r in iceberg_read(spark, root).collect()}
    assert got == {(1, 1.0), (2, 22.0)}
    # the delete file carries the table's field id for `id`
    dfiles = glob.glob(f"{root}/data/eqdelete-*.parquet")
    assert len(dfiles) == 1
    sch = pq.ParquetFile(dfiles[0]).schema_arrow
    assert int(sch.field("id").metadata[b"PARQUET:field_id"]) == 1
    meta = _ltm(spark, root)
    assert meta["snapshots"][-2]["summary"]["operation"] == "delete"
    # schema gates
    with pytest.raises(ValueError, match="not in the table schema"):
        iceberg_equality_delete(
            spark, root, spark.createDataFrame([(1,)], "zz long")
        )
    from simple_data_workflow_spark.sources.iceberg_writer import (
        IcebergSchemaMismatch,
    )

    with pytest.raises(IcebergSchemaMismatch):
        iceberg_equality_delete(
            spark, root, spark.createDataFrame([("x",)], "id string")
        )


def test_iceberg_expire_snapshots(spark, tmp_path):
    """Snapshot expiration: old snapshots drop from metadata and the
    files ONLY they referenced delete; shared files survive; the
    current snapshot still reads; expired ids stop time-traveling."""
    from simple_data_workflow_spark.sources.iceberg_writer import (
        iceberg_delete,
        iceberg_expire_snapshots,
    )

    root = str(tmp_path / "iexp")
    s1 = iceberg_write(
        spark.createDataFrame([(1, 1.0), (2, 2.0)], "id long, v double"),
        root,
        mode="error",
    )
    s2 = iceberg_write(
        spark.createDataFrame([(3, 3.0)], "id long, v double"),
        root,
        mode="append",
    )
    # overwrite: s1/s2's data files become exclusive to them
    s3 = iceberg_write(
        spark.createDataFrame([(9, 9.0)], "id long, v double"),
        root,
        mode="overwrite",
    )
    iceberg_delete(spark, root, "id = 9")  # s4: MoR delete snapshot
    n_before = len(glob.glob(f"{root}/data/*.parquet"))
    expired = iceberg_expire_snapshots(spark, root, keep_last=2)
    assert set(expired) == {s1, s2}
    # current snapshot reads the same
    assert iceberg_read(spark, root).count() == 0  # 9 deleted
    # pre-overwrite data files are gone; s3/s4 files survive
    n_after = len(glob.glob(f"{root}/data/*.parquet"))
    assert n_after < n_before
    with pytest.raises(ValueError, match="not in table"):
        iceberg_read(spark, root, s1)
    meta = load_table_metadata(spark, root)
    assert {int(s["snapshot-id"]) for s in meta["snapshots"]} >= {s3}
    assert s1 not in {int(s["snapshot-id"]) for s in meta["snapshots"]}
    # nothing more to expire under the same policy
    assert iceberg_expire_snapshots(spark, root, keep_last=2) == []


def test_iceberg_update_mor(spark, tmp_path):
    """UPDATE publishes ONE snapshot carrying a position-delete file
    for the old row versions AND new data files with the updated rows
    (merge-on-read — no data-file rewrite); NULL-predicate rows stay
    untouched (UPDATE applies only where the predicate is TRUE)."""
    from simple_data_workflow_spark.sources.iceberg_writer import (
        iceberg_update,
    )

    root = str(tmp_path / "iu")
    df = spark.createDataFrame(
        [(1, 10.0, "a"), (2, None, "b"), (3, 30.0, "c"), (4, 40.0, "d")],
        "id int, val double, name string",
    )
    iceberg_write(df, root, mode="error")
    files_before = sorted(glob.glob(f"{root}/data/part-*.parquet"))
    n_snaps = len(load_table_metadata(spark, root)["snapshots"])
    sid = iceberg_update(
        spark, root, {"val": "val * 2", "name": "upper(name)"}, "val >= 30"
    )
    meta = load_table_metadata(spark, root)
    # exactly ONE new snapshot (deletes + adds are atomic), op overwrite
    assert len(meta["snapshots"]) == n_snaps + 1
    assert meta["snapshots"][-1]["summary"]["operation"] == "overwrite"
    assert meta["current-snapshot-id"] == sid
    # original data files are untouched (merge-on-read): still present,
    # alongside the NEW files holding the updated row versions
    files_after = set(glob.glob(f"{root}/data/part-*.parquet"))
    assert set(files_before) <= files_after
    assert len(files_after) > len(files_before)
    got = _rows(iceberg_read(spark, root))
    assert got == {
        (1, 10.0, "a"),
        (2, None, "b"),  # NULL predicate → not updated, not dropped
        (3, 60.0, "C"),
        (4, 80.0, "D"),
    }
    # no-match UPDATE is a metadata no-op
    assert iceberg_update(spark, root, {"val": "0.0"}, "id = 999") == sid


def test_iceberg_update_partitioned_and_time_travel(spark, tmp_path):
    from simple_data_workflow_spark.sources.iceberg_writer import (
        iceberg_update,
    )

    root = str(tmp_path / "iup")
    df = spark.createDataFrame(
        [(i, "A" if i % 2 else "B", float(i)) for i in range(1, 9)],
        "id int, grp string, val double",
    )
    s0 = iceberg_write(df, root, mode="error", partition_by=["grp"])
    iceberg_update(spark, root, {"val": "val + 100"}, "grp = 'A'")
    got = {r["id"]: r["val"] for r in iceberg_read(spark, root).collect()}
    assert got == {i: float(i) + (100 if i % 2 else 0) for i in range(1, 9)}
    # updated rows land under their Hive partition directories
    assert glob.glob(f"{root}/data/grp=A/*.parquet")
    # the pre-update snapshot is still time-travelable
    old = {r["id"]: r["val"] for r in iceberg_read(spark, root, s0).collect()}
    assert old == {i: float(i) for i in range(1, 9)}


def test_iceberg_merge_upsert_semantics(spark, tmp_path):
    """Delete-insert MERGE: matched target rows drop via a position
    delete, every source row lands; NULL keys never match; a merge into
    an absent table degenerates to create."""
    from simple_data_workflow_spark.sources.iceberg_writer import (
        iceberg_merge_upsert,
    )

    root = str(tmp_path / "im")
    target = spark.createDataFrame(
        [(1, "t1"), (2, "t2"), (None, "tnull")], "id int, name string"
    )
    iceberg_write(target, root, mode="error")
    source = spark.createDataFrame(
        [(2, "s2"), (9, "s9"), (None, "snull")], "id int, name string"
    )
    iceberg_merge_upsert(spark, root, source, ["id"])
    got = _rows(iceberg_read(spark, root))
    # target NULL-key row SURVIVES (join semantics) alongside the
    # source NULL-key row; id=2 is replaced
    assert got == {
        (1, "t1"),
        (None, "tnull"),
        (2, "s2"),
        (9, "s9"),
        (None, "snull"),
    }
    # degenerate: absent table → create
    root2 = str(tmp_path / "im2")
    iceberg_merge_upsert(spark, root2, source, ["id"])
    assert _rows(iceberg_read(spark, root2)) == _rows(source)
    # schema mismatch refuses
    with pytest.raises(IcebergSchemaMismatch):
        iceberg_merge_upsert(
            spark,
            root,
            spark.createDataFrame([(1,)], "id int"),
            ["id"],
        )


def test_iceberg_update_does_not_resurrect_eq_deleted_rows(spark, tmp_path):
    """UPDATE matches against the LIVE view: a row killed by an
    equality delete must not come back as an updated copy."""
    from simple_data_workflow_spark.sources.iceberg_writer import (
        iceberg_equality_delete,
        iceberg_update,
    )

    root = str(tmp_path / "ieq")
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 6)], "id int, val double"
    )
    iceberg_write(df, root, mode="error")
    iceberg_equality_delete(
        spark, root, spark.createDataFrame([(2,), (3,)], "id int")
    )
    iceberg_update(spark, root, {"val": "val * 10"}, "id <= 4")
    got = _rows(iceberg_read(spark, root))
    assert got == {(1, 10.0), (4, 40.0), (5, 5.0)}


def test_iceberg_dml_requires_v2(spark, tmp_path):
    from simple_data_workflow_spark.sources.iceberg_reader import (
        IcebergFeatureUnsupported,
    )
    from simple_data_workflow_spark.sources.iceberg_writer import (
        iceberg_merge_upsert,
        iceberg_update,
    )

    root = str(tmp_path / "iv1")
    df = spark.createDataFrame([(1, 1.0)], "id int, val double")
    iceberg_write(df, root, mode="error", format_version=1)
    with pytest.raises(IcebergFeatureUnsupported, match="format-version 2"):
        iceberg_update(spark, root, {"val": "0.0"}, "id = 1")
    with pytest.raises(IcebergFeatureUnsupported, match="format-version 2"):
        iceberg_merge_upsert(spark, root, df, ["id"])


def test_iceberg_schema_evolution_add_rename_drop(spark, tmp_path):
    """Metadata-only schema evolution (spec 'Schema Evolution'): ADD
    gets a fresh id past last-column-id and old files read NULL; RENAME
    keeps the id and pre-rename files resolve BY FIELD ID (the reader
    detects the rename from the schema history and switches the scan);
    DROP leaves files untouched. Appends and row-level DML keep working
    across every step."""
    from simple_data_workflow_spark.sources.iceberg_reader import (
        load_table_metadata,
    )
    from simple_data_workflow_spark.sources.iceberg_writer import (
        iceberg_add_column,
        iceberg_delete,
        iceberg_drop_column,
        iceberg_rename_column,
        iceberg_update,
    )

    root = str(tmp_path / "sev")
    df = spark.createDataFrame(
        [(i, f"n{i}", float(i)) for i in range(1, 6)],
        "id int, name string, val double",
    )
    iceberg_write(df, root, mode="error")
    # ADD: fresh id, old rows NULL, append carries the column
    iceberg_add_column(spark, root, "tag", "string")
    meta = load_table_metadata(spark, root)
    assert meta["last-column-id"] == 4
    got = iceberg_read(spark, root)
    assert got.columns == ["id", "name", "val", "tag"]
    assert got.where("tag IS NULL").count() == 5
    iceberg_write(
        spark.createDataFrame(
            [(6, "n6", 6.0, "x")], "id int, name string, val double, tag string"
        ),
        root,
        mode="append",
    )
    tags = {r["id"]: r["tag"] for r in iceberg_read(spark, root).collect()}
    assert tags == {1: None, 2: None, 3: None, 4: None, 5: None, 6: "x"}
    # RENAME: id stays, pre-rename files resolve by field id
    iceberg_rename_column(spark, root, "val", "score")
    vals = {r["id"]: r["score"] for r in iceberg_read(spark, root).collect()}
    assert vals == {i: float(i) for i in range(1, 7)}
    # append under the new name; mixed-name file sets still read
    iceberg_write(
        spark.createDataFrame(
            [(7, "n7", 7.0, None)],
            "id int, name string, score double, tag string",
        ),
        root,
        mode="append",
    )
    # DML against the renamed table (lineage scan switches to by-id too)
    iceberg_update(spark, root, {"score": "score + 100"}, "id <= 2")
    iceberg_delete(spark, root, "id = 5")
    vals = {r["id"]: r["score"] for r in iceberg_read(spark, root).collect()}
    assert vals == {1: 101.0, 2: 102.0, 3: 3.0, 4: 4.0, 6: 6.0, 7: 7.0}
    # DROP: metadata-only, files untouched
    iceberg_drop_column(spark, root, "tag")
    got = iceberg_read(spark, root)
    assert got.columns == ["id", "name", "score"] and got.count() == 6
    # guards
    with pytest.raises(ValueError, match="no column"):
        iceberg_drop_column(spark, root, "nope")
    with pytest.raises(ValueError, match="already exists"):
        iceberg_rename_column(spark, root, "id", "name")
    with pytest.raises(ValueError, match="already exists"):
        iceberg_add_column(spark, root, "id", "string")


def test_iceberg_rename_partition_column_follows_spec(spark, tmp_path):
    """Renaming an identity-partition source column renames the
    partition-spec field too, and appends under the new name work."""
    from simple_data_workflow_spark.sources.iceberg_reader import (
        load_table_metadata,
    )
    from simple_data_workflow_spark.sources.iceberg_writer import (
        iceberg_rename_column,
    )

    root = str(tmp_path / "sevp")
    iceberg_write(
        spark.createDataFrame([(1, "A"), (2, "B")], "id int, grp string"),
        root,
        mode="error",
        partition_by=["grp"],
    )
    iceberg_rename_column(spark, root, "grp", "bucket")
    meta = load_table_metadata(spark, root)
    assert meta["partition-spec"][0]["name"] == "bucket"
    got = {(r["id"], r["bucket"]) for r in iceberg_read(spark, root).collect()}
    assert got == {(1, "A"), (2, "B")}
    iceberg_write(
        spark.createDataFrame([(3, "C")], "id int, bucket string"),
        root,
        mode="append",
    )
    assert iceberg_read(spark, root).count() == 3
    with pytest.raises(ValueError, match="partition source"):
        from simple_data_workflow_spark.sources.iceberg_writer import (
            iceberg_drop_column,
        )

        iceberg_drop_column(spark, root, "bucket")


def test_iceberg_compact_rewrites_files_and_drops_deletes(spark, tmp_path):
    """Compaction (rewrite-data-files): the live view rewrites into
    fresh files, the REPLACE snapshot references no delete files, data
    is unchanged, and older snapshots still time-travel."""
    from simple_data_workflow_spark.sources.iceberg_reader import (
        _snapshot_files_and_deletes,
        load_table_metadata,
    )
    from simple_data_workflow_spark.sources.iceberg_writer import (
        iceberg_compact,
        iceberg_delete,
        iceberg_update,
    )

    root = str(tmp_path / "icmp")
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(60)], "id int, val double"
    )
    iceberg_write(df.repartition(6), root, mode="error")
    iceberg_delete(spark, root, "id % 10 = 0")
    iceberg_update(spark, root, {"val": "val + 1000"}, "id > 50")
    before = {r["id"]: r["val"] for r in iceberg_read(spark, root).collect()}
    s_pre = load_table_metadata(spark, root)["current-snapshot-id"]
    sid = iceberg_compact(spark, root)
    after = {r["id"]: r["val"] for r in iceberg_read(spark, root).collect()}
    assert before == after
    data, dels, _schema = _snapshot_files_and_deletes(spark, root)
    assert not dels
    meta = load_table_metadata(spark, root)
    snap = [s for s in meta["snapshots"] if s["snapshot-id"] == sid][0]
    assert snap["summary"]["operation"] == "replace"
    # pre-compaction snapshot unchanged, deletes still applied there
    old = {r["id"]: r["val"] for r in iceberg_read(spark, root, s_pre).collect()}
    assert old == before


def test_iceberg_rollback_metadata_only(spark, tmp_path):
    """Rollback moves current-snapshot-id back without rewriting
    anything; later writes parent off the restored snapshot and
    sequence numbers stay monotonic."""
    from simple_data_workflow_spark.sources.iceberg_reader import (
        load_table_metadata,
    )
    from simple_data_workflow_spark.sources.iceberg_writer import (
        iceberg_delete,
        iceberg_rollback,
    )

    root = str(tmp_path / "irb")
    s1 = iceberg_write(
        spark.createDataFrame(
            [(i, float(i)) for i in range(6)], "id int, val double"
        ),
        root,
        mode="error",
    )
    iceberg_write(
        spark.createDataFrame([(9, 9.0)], "id int, val double"),
        root,
        mode="append",
    )
    iceberg_delete(spark, root, "id = 0")
    pre_seq = load_table_metadata(spark, root)["last-sequence-number"]
    assert iceberg_rollback(spark, root, s1) == s1
    meta = load_table_metadata(spark, root)
    assert meta["current-snapshot-id"] == s1
    assert meta["last-sequence-number"] == pre_seq  # never rewinds
    assert {r["id"] for r in iceberg_read(spark, root).collect()} == set(
        range(6)
    )
    s4 = iceberg_write(
        spark.createDataFrame([(77, 77.0)], "id int, val double"),
        root,
        mode="append",
    )
    meta = load_table_metadata(spark, root)
    snap4 = [s for s in meta["snapshots"] if s["snapshot-id"] == s4][0]
    assert snap4["parent-snapshot-id"] == s1
    assert snap4["sequence-number"] == pre_seq + 1
    with pytest.raises(ValueError, match="not in table"):
        iceberg_rollback(spark, root, 12345)


def test_iceberg_wap_stage_and_cherry_pick(spark, tmp_path):
    """Write-audit-publish: a stage_only append lands in the log but
    current does not move; the staged snapshot audits via snapshot-id
    time travel; cherry-pick publishes it metadata-only; a staged
    snapshot whose parent is no longer current refuses (fast-forward
    would drop commits)."""
    from simple_data_workflow_spark.sources.iceberg_reader import (
        load_table_metadata,
    )
    from simple_data_workflow_spark.sources.iceberg_writer import (
        iceberg_cherry_pick,
        iceberg_snapshot_at_timestamp,
    )

    root = str(tmp_path / "wap")
    s0 = iceberg_write(
        spark.createDataFrame([(1, 1.0), (2, 2.0)], "id int, v double"),
        root,
        mode="error",
    )
    staged = iceberg_write(
        spark.createDataFrame([(9, 9.0)], "id int, v double"),
        root,
        mode="append",
        stage_only=True,
    )
    # current unchanged; the staged snapshot audits via time travel
    assert load_table_metadata(spark, root)["current-snapshot-id"] == s0
    assert {r["id"] for r in iceberg_read(spark, root).collect()} == {1, 2}
    assert {r["id"] for r in iceberg_read(spark, root, staged).collect()} == {
        1,
        2,
        9,
    }
    # publish
    assert iceberg_cherry_pick(spark, root, staged) == staged
    assert {r["id"] for r in iceberg_read(spark, root).collect()} == {1, 2, 9}
    # a second staged snapshot parented off s0 can no longer publish
    # (current moved) — refuse rather than silently drop the 9-row
    meta = load_table_metadata(spark, root)
    stale = iceberg_write(
        spark.createDataFrame([(7, 7.0)], "id int, v double"),
        root,
        mode="append",
        stage_only=True,
    )
    # move current again via a plain append
    iceberg_write(
        spark.createDataFrame([(8, 8.0)], "id int, v double"),
        root,
        mode="append",
    )
    with pytest.raises(ValueError, match="parent"):
        iceberg_cherry_pick(spark, root, stale)
    # timestamp time travel resolves the newest snapshot <= ts
    cur = load_table_metadata(spark, root)
    last = max(int(s["timestamp-ms"]) for s in cur["snapshots"])
    sid = iceberg_snapshot_at_timestamp(spark, root, last)
    assert sid == cur["current-snapshot-id"]
    with pytest.raises(ValueError, match="no snapshot"):
        iceberg_snapshot_at_timestamp(spark, root, 1)


def test_iceberg_dml_lost_race_retries_against_new_state(spark, tmp_path):
    """A row-level DML that loses the metadata-version race must
    re-resolve and republish on top of the interloper's commit — both
    edits survive."""
    from simple_data_workflow_spark.sources.iceberg_writer import (
        iceberg_delete,
        iceberg_update,
        _publish_metadata_if_absent,
    )
    import simple_data_workflow_spark.sources.iceberg_writer as iw

    root = str(tmp_path / "irace")
    iceberg_write(
        spark.createDataFrame(
            [(i, float(i)) for i in range(10)], "id int, val double"
        ),
        root,
        mode="error",
    )

    raced = {"done": False}
    orig = iw._publish_metadata_if_absent

    def interfere(spark_, path_, version_, body_):
        if not raced["done"]:
            raced["done"] = True
            # an interloper DELETE lands first at this version
            iw._publish_metadata_if_absent = orig
            try:
                iceberg_delete(spark_, path_, "id = 9")
            finally:
                iw._publish_metadata_if_absent = interfere
        return orig(spark_, path_, version_, body_)

    iw._publish_metadata_if_absent = interfere
    try:
        iceberg_update(spark, root, {"val": "val + 100"}, "id <= 1")
    finally:
        iw._publish_metadata_if_absent = orig
    got = {r["id"]: r["val"] for r in iceberg_read(spark, root).collect()}
    # the interloper's delete AND the racing update both survive
    assert 9 not in got
    assert got[0] == 100.0 and got[1] == 101.0 and got[5] == 5.0


def test_iceberg_cherry_pick_first_staged_snapshot(spark, tmp_path):
    """Round 12 (ADVICE r11): a WAP snapshot staged as a NEW table's
    FIRST snapshot (no parent, current = -1) publishes — 'no parent'
    and 'no current snapshot' normalize to the same sentinel instead
    of always refusing."""
    from simple_data_workflow_spark.sources.iceberg_reader import (
        load_table_metadata,
    )
    from simple_data_workflow_spark.sources.iceberg_writer import (
        iceberg_cherry_pick,
    )

    root = str(tmp_path / "wapfirst")
    staged = iceberg_write(
        spark.createDataFrame([(1, 1.0), (2, 2.0)], "id int, v double"),
        root,
        mode="error",
        stage_only=True,
    )
    meta = load_table_metadata(spark, root)
    assert meta.get("current-snapshot-id") in (None, -1)
    assert iceberg_cherry_pick(spark, root, staged) == staged
    assert {r["id"] for r in iceberg_read(spark, root).collect()} == {1, 2}


def test_puffin_dv_blob_roundtrip():
    """Puffin codec: build → footer index → blob fetch → positions;
    corrupt CRC raises instead of un-deleting rows."""
    import numpy as np
    import pytest as _pytest

    from simple_data_workflow_spark.sources import puffin

    a = np.array([0, 5, 7, 2**33 + 1], dtype=np.int64)
    b = np.array([3], dtype=np.int64)
    raw, descs = puffin.build_dv_file(
        [("data/f1.parquet", a), ("data/f2.parquet", b)], 42, 7
    )
    foot = puffin.read_footer(raw)
    assert [bl["properties"]["referenced-data-file"] for bl in foot["blobs"]] == [
        "data/f1.parquet",
        "data/f2.parquet",
    ]
    off, ln = puffin.find_dv_blob(raw, "data/f1.parquet")
    assert (off, ln) == (descs[0]["offset"], descs[0]["length"])
    got = puffin.read_dv_blob(raw, off, ln)
    assert got.tolist() == a.tolist()
    off2, ln2 = puffin.find_dv_blob(raw, "data/f2.parquet")
    assert puffin.read_dv_blob(raw, off2, ln2).tolist() == [3]
    bad = bytearray(raw)
    bad[off + 6] ^= 0xFF
    with _pytest.raises(ValueError, match="checksum|magic"):
        puffin.read_dv_blob(bytes(bad), off, ln)


def test_iceberg_v3_deletion_vector_roundtrip(spark, tmp_path):
    """Round 12 (VERDICT r11 #3): format-version 3 — upgrade is
    metadata-only; DELETE/UPDATE/MERGE write Puffin deletion vectors
    (never new position-delete files); stacked DVs supersede (union);
    the reader applies DVs from the manifest's content_offset/size;
    time travel to pre-DV snapshots still works; v4 refuses."""
    import glob as _glob

    import pytest as _pytest

    from simple_data_workflow_spark.sources.iceberg_reader import (
        load_table_metadata,
    )
    from simple_data_workflow_spark.sources.iceberg_writer import (
        iceberg_delete,
        iceberg_merge_upsert,
        iceberg_update,
        iceberg_upgrade_format,
    )

    root = str(tmp_path / "v3dv")
    iceberg_write(
        spark.createDataFrame(
            [(i, float(i)) for i in range(40)], "id int, v double"
        ).repartition(4),
        root,
        mode="error",
    )
    s0 = load_table_metadata(spark, root)["current-snapshot-id"]
    assert iceberg_upgrade_format(spark, root, 3) == 3
    assert load_table_metadata(spark, root)["format-version"] == 3

    # DELETE on a v3 table routes to deletion vectors
    iceberg_delete(spark, root, "id % 4 = 0")
    puffins = _glob.glob(f"{root}/data/dv-*.puffin")
    assert puffins, "v3 delete must write a Puffin DV file"
    got = {r["id"] for r in iceberg_read(spark, root).collect()}
    assert got == {i for i in range(40) if i % 4 != 0}
    # no NEW parquet position-delete file was written for this commit
    assert not _glob.glob(f"{root}/data/delete-*.parquet")

    # stacked delete: the new DV must UNION the old one's positions
    iceberg_delete(spark, root, "id = 1")
    got = {r["id"] for r in iceberg_read(spark, root).collect()}
    assert got == {i for i in range(40) if i % 4 != 0 and i != 1}

    # time travel to the pre-delete snapshot: all 40 rows
    assert iceberg_read(spark, root, s0).count() == 40

    # UPDATE on v3: DV + new data files in one snapshot
    iceberg_update(spark, root, {"v": "v + 100.0"}, "id = 2")
    rows = {(r["id"], r["v"]) for r in iceberg_read(spark, root).collect()}
    assert (2, 102.0) in rows
    assert len(rows) == len(got)

    # MERGE on v3: matched rows DV-mask, source rows land
    iceberg_merge_upsert(
        spark,
        root,
        spark.createDataFrame([(3, 333.0), (1000, 1.0)], "id int, v double"),
        ["id"],
    )
    rows = {(r["id"], r["v"]) for r in iceberg_read(spark, root).collect()}
    assert (3, 333.0) in rows and (1000, 1.0) in rows

    # v4 refuses loudly
    import json as _json

    metas = sorted(_glob.glob(f"{root}/metadata/v*.metadata.json"))
    m = _json.load(open(metas[-1]))
    m["format-version"] = 4
    nxt = f"{root}/metadata/v{len(metas) + 1}.metadata.json"
    with open(nxt, "w") as f:
        _json.dump(m, f)
    import os as _os

    crc = f"{root}/metadata/.version-hint.text.crc"
    if _os.path.exists(crc):
        _os.remove(crc)  # hand-edit invalidates Hadoop's checksum sidecar
    with open(f"{root}/metadata/version-hint.text", "w") as f:
        f.write(str(len(metas) + 1))
    with _pytest.raises(NotImplementedError, match="format-version 4"):
        iceberg_read(spark, root)


def test_iceberg_refs_branch_tag_lifecycle(spark, tmp_path):
    """Round 12 continuation: named references — create a tag and a
    branch, read through them (ref= on iceberg_read AND the lakehouse
    front door), move a branch with if_exists='replace', refuse
    duplicate creates / 'main' writes / unknown refs, and drop."""
    from simple_data_workflow_spark.sources import lakehouse
    from simple_data_workflow_spark.sources.iceberg_reader import (
        iceberg_refs_table,
    )
    from simple_data_workflow_spark.sources.iceberg_writer import (
        iceberg_drop_ref,
        iceberg_refs,
        iceberg_set_ref,
    )

    root = str(tmp_path / "refs")
    s1 = iceberg_write(
        spark.createDataFrame([(1, 1.0), (2, 2.0)], "id int, v double"),
        root,
        mode="error",
    )
    assert iceberg_set_ref(spark, root, "v1.0", ref_type="tag") == s1
    s2 = iceberg_write(
        spark.createDataFrame([(3, 3.0)], "id int, v double"),
        root,
        mode="append",
    )
    assert iceberg_set_ref(spark, root, "dev", snapshot_id=s1) == s1

    # ref reads: tag/branch pin s1, main sees s2's rows
    assert {r["id"] for r in iceberg_read(spark, root, ref="v1.0").collect()} == {1, 2}
    assert {r["id"] for r in iceberg_read(spark, root, ref="dev").collect()} == {1, 2}
    assert {r["id"] for r in iceberg_read(spark, root, ref="main").collect()} == {1, 2, 3}
    assert {
        r["id"]
        for r in lakehouse.read_table(spark, "iceberg", root, ref="v1.0").collect()
    } == {1, 2}

    # refs survive a subsequent write (metadata rebuild must carry them)
    iceberg_write(
        spark.createDataFrame([(4, 4.0)], "id int, v double"),
        root,
        mode="append",
    )
    assert set(iceberg_refs(spark, root)) == {"main", "v1.0", "dev"}
    tbl = {
        (r["name"], r["type"], r["snapshot_id"])
        for r in iceberg_refs_table(spark, root).collect()
    }
    assert ("v1.0", "tag", s1) in tbl and ("dev", "branch", s1) in tbl

    # move the branch; duplicate create refuses; main is reserved
    assert iceberg_set_ref(spark, root, "dev", snapshot_id=s2, if_exists="replace") == s2
    with pytest.raises(ValueError, match="already exists"):
        iceberg_set_ref(spark, root, "dev", snapshot_id=s1)
    with pytest.raises(ValueError, match="main"):
        iceberg_set_ref(spark, root, "main", snapshot_id=s1)
    with pytest.raises(ValueError, match="no ref named"):
        iceberg_read(spark, root, ref="nope")
    with pytest.raises(ValueError, match="not both"):
        iceberg_read(spark, root, snapshot_id=s1, ref="dev")
    with pytest.raises(ValueError, match="Iceberg feature"):
        lakehouse.read_table(spark, "delta", root, ref="dev")

    iceberg_drop_ref(spark, root, "dev")
    assert set(iceberg_refs(spark, root)) == {"main", "v1.0"}
    with pytest.raises(ValueError, match="no ref named"):
        iceberg_drop_ref(spark, root, "dev")


def test_iceberg_refs_pin_snapshots_and_fast_forward(spark, tmp_path):
    """Refs protect their snapshots from expiry, and fast-forward
    publishes a staged branch onto main only when the move is a true
    fast-forward."""
    from simple_data_workflow_spark.sources.iceberg_reader import (
        load_table_metadata,
    )
    from simple_data_workflow_spark.sources.iceberg_writer import (
        iceberg_expire_snapshots,
        iceberg_fast_forward,
        iceberg_set_ref,
    )

    root = str(tmp_path / "ffwd")
    s1 = iceberg_write(
        spark.createDataFrame([(1, 1.0)], "id int, v double"),
        root,
        mode="error",
    )
    iceberg_set_ref(spark, root, "keepme", snapshot_id=s1, ref_type="tag")
    iceberg_write(
        spark.createDataFrame([(2, 2.0)], "id int, v double"),
        root, mode="append",
    )
    s3 = iceberg_write(
        spark.createDataFrame([(3, 3.0)], "id int, v double"),
        root, mode="append",
    )
    # expire everything except current — the tagged s1 must survive
    expired = iceberg_expire_snapshots(spark, root, keep_last=1)
    kept = {
        int(s["snapshot-id"])
        for s in load_table_metadata(spark, root)["snapshots"]
    }
    assert s1 in kept and s3 in kept and s1 not in expired
    assert {r["id"] for r in iceberg_read(spark, root, ref="keepme").collect()} == {1}

    # stage an audit commit (parents off current), branch it, publish
    # main by fast-forward; a backwards move refuses
    staged = iceberg_write(
        spark.createDataFrame([(9, 9.0)], "id int, v double"),
        root, mode="append", stage_only=True,
    )
    iceberg_set_ref(spark, root, "audit", snapshot_id=staged)
    assert {r["id"] for r in iceberg_read(spark, root, ref="audit").collect()} == {1, 2, 3, 9}
    assert {r["id"] for r in iceberg_read(spark, root).collect()} == {1, 2, 3}
    assert iceberg_fast_forward(spark, root, "main", "audit") == staged
    assert {r["id"] for r in iceberg_read(spark, root).collect()} == {1, 2, 3, 9}
    # backwards (main is now AT the branch head; moving a ref pointing
    # nowhere on main's ancestry refuses)
    iceberg_set_ref(spark, root, "old", snapshot_id=s3)
    with pytest.raises(ValueError, match="not.*ancestor|ancestor"):
        iceberg_fast_forward(spark, root, "main", "old")


def test_iceberg_history_and_partitions_tables(spark, tmp_path):
    """history (ancestry-aware after rollback) and partitions (per-
    partition record/file counts from the manifests, no data scan)
    metadata-table views."""
    import json as _json

    from simple_data_workflow_spark.sources.iceberg_reader import (
        iceberg_history_table,
        iceberg_partitions_table,
    )
    from simple_data_workflow_spark.sources.iceberg_writer import (
        iceberg_rollback,
    )

    root = str(tmp_path / "metatbl")
    s1 = iceberg_write(
        spark.createDataFrame(
            [(1, "a"), (2, "a"), (3, "b")], "id int, part string"
        ).coalesce(1),
        root,
        mode="error",
        partition_by=["part"],
    )
    s2 = iceberg_write(
        spark.createDataFrame([(4, "b")], "id int, part string").coalesce(1),
        root,
        mode="append",
    )
    parts = {
        _json.loads(r["partition"])["part"]: (r["record_count"], r["file_count"])
        for r in iceberg_partitions_table(spark, root).collect()
    }
    assert parts == {"a": (2, 1), "b": (2, 2)}

    s3 = iceberg_write(
        spark.createDataFrame([(9, "c")], "id int, part string").coalesce(1),
        root,
        mode="append",
    )
    iceberg_rollback(spark, root, s2)
    hist = {
        r["snapshot_id"]: (r["parent_id"], r["is_current_ancestor"])
        for r in iceberg_history_table(spark, root).collect()
    }
    # s3 is rolled past: present, NOT a current ancestor
    assert hist[s1] == (None, True)
    assert hist[s2] == (s1, True)
    assert hist[s3] == (s2, False)
    # partitions view follows the rollback (c's file is not live)
    parts2 = {
        _json.loads(r["partition"])["part"]
        for r in iceberg_partitions_table(spark, root).collect()
    }
    assert parts2 == {"a", "b"}


def test_iceberg_partition_evolution(spark, tmp_path):
    """Round 12 continuation: partition evolution — a new default spec
    appends metadata-only (no data rewrites), later writes lay out and
    stamp by the new spec, reads spanning both layouts stay correct
    AND prune by whichever spec each file carries, DML works across
    layouts, and field-ids reuse per the same-field-same-id rule."""
    from simple_data_workflow_spark.sources.iceberg_reader import (
        load_table_metadata,
    )
    from simple_data_workflow_spark.sources.iceberg_writer import (
        iceberg_delete,
        iceberg_update_spec,
    )

    root = str(tmp_path / "specevo")
    iceberg_write(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20)], "id int, cat string, bucket int"
        ).coalesce(1),
        root,
        mode="error",
        partition_by=["cat"],
    )
    new_id = iceberg_update_spec(spark, root, ["bucket"])
    assert new_id == 1
    meta = load_table_metadata(spark, root)
    assert int(meta["default-spec-id"]) == 1
    assert len(meta["partition-specs"]) == 2
    # same-field-same-id: re-adding cat later reuses its field-id
    fid_cat = meta["partition-specs"][0]["fields"][0]["field-id"]

    iceberg_write(
        spark.createDataFrame(
            [(3, "a", 10), (4, "c", 30)], "id int, cat string, bucket int"
        ).coalesce(1),
        root,
        mode="append",
    )
    # both layouts read together
    got = {r["id"] for r in iceberg_read(spark, root).collect()}
    assert got == {1, 2, 3, 4}
    # spec history survives the append's metadata rebuild
    meta = load_table_metadata(spark, root)
    assert len(meta["partition-specs"]) == 2
    assert int(meta["default-spec-id"]) == 1
    # pruning works against BOTH specs' identity columns (conservative
    # across files that lack the column)
    assert {
        r["id"]
        for r in iceberg_read(spark, root, filters=[("cat", "=", "a")]).collect()
    } == {1, 3}
    assert {
        r["id"]
        for r in iceberg_read(
            spark, root, filters=[("bucket", "=", 30)]
        ).collect()
    } == {4}
    # DML across layouts
    iceberg_delete(spark, root, "id = 2")
    assert {r["id"] for r in iceberg_read(spark, root).collect()} == {1, 3, 4}

    # evolving BACK to cat reuses the original partition field-id
    third = iceberg_update_spec(spark, root, ["cat"])
    meta = load_table_metadata(spark, root)
    spec3 = next(
        s for s in meta["partition-specs"] if int(s["spec-id"]) == third
    )
    assert spec3["fields"][0]["field-id"] == fid_cat
    # no-op update returns the existing default without a new spec
    assert iceberg_update_spec(spark, root, ["cat"]) == third


def test_path_encoding_partition_values_iceberg(spark, tmp_path, monkeypatch):
    """Partition values with URI-special chars: position deletes must
    stage for AND mask rows in percent-encoded paths, on BOTH the
    packed-mask path and the large-set anti-join path."""
    import simple_data_workflow_spark.sources.iceberg_reader as ir
    from simple_data_workflow_spark.sources.iceberg_writer import (
        iceberg_delete,
    )

    root = str(tmp_path / "enc")
    df = spark.createDataFrame(
        [(i, float(i), "NOT SPECIFIED" if i % 2 else "a b c")
         for i in range(40)],
        "id int, v double, prio string",
    )
    iceberg_write(df.repartition(2), root, mode="error", partition_by=["prio"])
    iceberg_delete(spark, root, "id < 10")
    want = set(range(10, 40))
    assert {r["id"] for r in iceberg_read(spark, root).collect()} == want
    # force the anti-join path (mask max 0) — same result
    monkeypatch.setattr(ir, "_POS_DELETE_MASK_MAX", 0)
    assert {r["id"] for r in iceberg_read(spark, root).collect()} == want
    # identity pruning on the encoded value still works
    assert {
        r["id"]
        for r in iceberg_read(
            spark, root, filters=[("prio", "=", "a b c")]
        ).collect()
    } == {i for i in range(10, 40) if i % 2 == 0}
    # stacked DML: the live-lineage scan must MASK the first delete's
    # rows in the encoded partitions (an unmasked scan would let the
    # UPDATE resurrect them as new rows)
    from simple_data_workflow_spark.sources.iceberg_writer import (
        iceberg_update,
    )

    iceberg_delete(spark, root, "id >= 35")
    iceberg_update(spark, root, {"v": "v + 100.0"}, "id >= 30")
    got = {(r["id"], r["v"]) for r in iceberg_read(spark, root).collect()}
    assert got == {
        (i, float(i) + (100.0 if i >= 30 else 0.0)) for i in range(10, 35)
    }


def test_iceberg_manifests_table(spark, tmp_path):
    """manifests metadata view: one row per manifest of the CURRENT
    snapshot, spec ids stamped (evolution-aware), delete manifests
    flagged content=1."""
    from simple_data_workflow_spark.sources.iceberg_reader import (
        iceberg_manifests_table,
    )
    from simple_data_workflow_spark.sources.iceberg_writer import (
        iceberg_delete,
        iceberg_update_spec,
    )

    root = str(tmp_path / "mft")
    iceberg_write(
        spark.createDataFrame([(1, "a"), (2, "b")], "id int, part string")
        .coalesce(1),
        root,
        mode="error",
        partition_by=["part"],
    )
    iceberg_update_spec(spark, root, [])
    iceberg_write(
        spark.createDataFrame([(3, "c")], "id int, part string").coalesce(1),
        root,
        mode="append",
    )
    iceberg_delete(spark, root, "id = 1")
    rows = iceberg_manifests_table(spark, root).collect()
    assert len(rows) >= 3  # two data manifests + one delete manifest
    by_content = {}
    for r in rows:
        by_content.setdefault(r["content"], []).append(r)
    assert 1 in by_content  # the position-delete manifest
    # the post-evolution data manifest is stamped with the NEW spec id
    assert {r["partition_spec_id"] for r in by_content[0]} == {0, 1}
    assert all(r["length"] > 0 for r in rows)


def test_v3_native_write_row_lineage_and_defaults(spark, tmp_path):
    """Round 13 (VERDICT r12 #4): format-version 3 tables create
    NATIVELY (no upgrade hop) with row-lineage metadata — ``next-row-id``
    advances by added rows, snapshots carry ``first-row-id``, manifest
    lists carry ``first_row_id`` — and v3 COLUMN DEFAULTS apply on
    read: files written before the field existed read
    ``initial-default``; files that carry the column keep their values
    (explicit NULLs included)."""
    from simple_data_workflow_spark.sources.iceberg_reader import (
        iceberg_read,
        load_table_metadata,
    )
    from simple_data_workflow_spark.sources.iceberg_writer import (
        iceberg_add_column,
        iceberg_dv_delete,
        iceberg_write,
    )

    root = str(tmp_path / "v3native")
    sid = iceberg_write(
        spark.createDataFrame(
            [(i, float(i)) for i in range(10)], "id long, v double"
        ),
        root,
        mode="error",
        format_version=3,
    )
    meta = load_table_metadata(spark, root)
    assert int(meta["format-version"]) == 3
    assert int(meta["next-row-id"]) == 10
    snap = next(s for s in meta["snapshots"] if s["snapshot-id"] == sid)
    assert snap["first-row-id"] == 0
    # append advances the lineage high-water mark
    iceberg_write(
        spark.createDataFrame([(100, 1.0), (101, 2.0)], "id long, v double"),
        root,
        mode="append",
    )
    meta = load_table_metadata(spark, root)
    assert int(meta["next-row-id"]) == 12
    # DV DML works on the natively-created v3 table
    iceberg_dv_delete(spark, root, "id % 3 = 0")
    # column default: pre-existing rows read it, new explicit values win
    iceberg_add_column(spark, root, "note", "string", default="n/a")
    iceberg_write(
        spark.createDataFrame(
            [(200, 3.0, "real"), (201, 4.0, None)],
            "id long, v double, note string",
        ),
        root,
        mode="append",
    )
    rows = {r["id"]: r["note"] for r in iceberg_read(spark, root).collect()}
    assert rows[200] == "real"
    assert rows[201] is None  # explicit NULL stays NULL
    assert rows[1] == "n/a" and rows[100] == "n/a"  # default fills
    assert 3 not in rows and 9 not in rows  # DV delete applied
    # defaults on a v1/v2 table refuse; non-primitive defaults refuse
    root2 = str(tmp_path / "v2nodefault")
    iceberg_write(
        spark.createDataFrame([(1, 1.0)], "id long, v double"),
        root2,
        mode="error",
        format_version=2,
    )
    import pytest as _pytest

    from simple_data_workflow_spark.sources.iceberg_writer import (
        IcebergFeatureUnsupported,
    )

    with _pytest.raises(IcebergFeatureUnsupported):
        iceberg_add_column(spark, root2, "note", "string", default="x")
