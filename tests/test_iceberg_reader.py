"""Jar-free Iceberg read interop (round 10): fixtures below are
hand-built spec-conformant tables (iceberg.apache.org/spec —
``metadata/*.metadata.json`` + Avro manifest lists + Avro manifests,
written through the REFERENCE ``org.apache.avro`` implementation that
ships on Spark's classpath), so these tests pin the reader against the
public protocol, not against an Iceberg runtime."""

import glob
import json
import os
import shutil

import pytest

from simple_data_workflow_spark.sources.iceberg_reader import (
    IcebergFeatureUnsupported,
    iceberg_read,
    iceberg_snapshot_files,
)

# Avro subset schemas for fixtures: real manifests carry many more
# (optional) fields; GenericDatumReader reads with the file's own
# writer schema, and the reader accesses fields BY NAME, so a subset
# fixture exercises exactly the same code path.
_MANIFEST_ENTRY_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int"},
            {
                "name": "data_file",
                "type": {
                    "type": "record",
                    "name": "r2",
                    "fields": [
                        {"name": "content", "type": ["null", "int"], "default": None},
                        {"name": "file_path", "type": "string"},
                        {"name": "file_format", "type": "string"},
                        {"name": "record_count", "type": "long"},
                    ],
                },
            },
        ],
    }
)

_MANIFEST_FILE_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "manifest_file",
        "fields": [
            {"name": "manifest_path", "type": "string"},
            {"name": "manifest_length", "type": "long"},
            {"name": "content", "type": ["null", "int"], "default": None},
        ],
    }
)


def _avro_write(spark, path: str, schema_json: str, records: list[dict]) -> None:
    """Write an Avro OCF through the reference Java implementation."""
    jvm = spark._jvm
    schema = jvm.org.apache.avro.Schema.Parser().parse(schema_json)

    def build(sch, d):
        rec = jvm.org.apache.avro.generic.GenericData.Record(sch)
        for f in sch.getFields():
            name = f.name()
            v = d.get(name)
            fsch = f.schema()
            # unwrap [null, X] unions
            if fsch.getType().getName() == "union":
                branches = list(fsch.getTypes())
                fsch = next(
                    b for b in branches if b.getType().getName() != "null"
                )
                if v is None:
                    rec.put(name, None)
                    continue
            if fsch.getType().getName() == "record":
                rec.put(name, build(fsch, v))
            elif fsch.getType().getName() == "long":
                rec.put(name, jvm.java.lang.Long(int(v)))
            else:
                rec.put(name, v)
        return rec

    os.makedirs(os.path.dirname(path), exist_ok=True)
    w = jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    fw = jvm.org.apache.avro.file.DataFileWriter(w)
    fw.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(1))
    fw.create(schema, jvm.java.io.File(path))
    for r in records:
        fw.append(build(schema, r))
    fw.close()


def _write_parquet_file(spark, df, dest: str) -> None:
    tmp = dest + ".__tmp__"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(f"{tmp}/part-*.parquet")[0]
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    shutil.move(part, dest)
    shutil.rmtree(tmp)


_SCHEMA_V2 = {
    "schema-id": 0,
    "type": "struct",
    "fields": [
        {"id": 1, "name": "id", "required": False, "type": "long"},
        {"id": 2, "name": "v", "required": False, "type": "double"},
    ],
}


def _table_metadata(root, snapshots, current, format_version=2, schemas=None):
    meta = {
        "format-version": format_version,
        "table-uuid": "99999999-8888-7777-6666-555555555555",
        "location": root,
        "last-column-id": 2,
        "snapshots": snapshots,
        "current-snapshot-id": current,
    }
    if format_version == 1:
        meta["schema"] = schemas or {
            "type": "struct",
            "fields": _SCHEMA_V2["fields"],
        }
    else:
        meta["schemas"] = schemas or [_SCHEMA_V2]
        meta["current-schema-id"] = 0
    return meta


def _write_metadata(root, version, meta):
    os.makedirs(f"{root}/metadata", exist_ok=True)
    with open(f"{root}/metadata/v{version}.metadata.json", "w") as f:
        json.dump(meta, f)
    with open(f"{root}/metadata/version-hint.text", "w") as f:
        f.write(str(version))


def _data_entry(path, rows, status=1, content=0):
    return {
        "status": status,
        "data_file": {
            "content": content,
            "file_path": path,
            "file_format": "PARQUET",
            "record_count": rows,
        },
    }


def _build_v2_table(spark, root):
    """Two snapshots: snap 100 = {f0}, snap 200 = {f0, f1} with a
    DELETED-status tombstone entry recording history."""
    for i, rows in enumerate([[(1, 1.0), (2, 2.0)], [(3, 3.0)], [(9, 9.9)]]):
        _write_parquet_file(
            spark,
            spark.createDataFrame(rows, "id long, v double"),
            f"{root}/data/f{i}.parquet",
        )
    _avro_write(
        spark, f"{root}/metadata/m0.avro", _MANIFEST_ENTRY_SCHEMA,
        [_data_entry(f"{root}/data/f0.parquet", 2)],
    )
    _avro_write(
        spark, f"{root}/metadata/m1.avro", _MANIFEST_ENTRY_SCHEMA,
        [
            _data_entry(f"{root}/data/f1.parquet", 1),
            # DELETED entry: f2 was removed in this snapshot — history
            # bookkeeping, must NOT be read
            _data_entry(f"{root}/data/f2.parquet", 1, status=2),
        ],
    )
    _avro_write(
        spark, f"{root}/metadata/ml-100.avro", _MANIFEST_FILE_SCHEMA,
        [{"manifest_path": f"{root}/metadata/m0.avro", "manifest_length": 100}],
    )
    _avro_write(
        spark, f"{root}/metadata/ml-200.avro", _MANIFEST_FILE_SCHEMA,
        [
            {"manifest_path": f"{root}/metadata/m0.avro", "manifest_length": 100},
            {"manifest_path": f"{root}/metadata/m1.avro", "manifest_length": 100},
        ],
    )
    snaps = [
        {"snapshot-id": 100, "manifest-list": f"{root}/metadata/ml-100.avro"},
        {"snapshot-id": 200, "manifest-list": f"{root}/metadata/ml-200.avro"},
    ]
    _write_metadata(root, 2, _table_metadata(root, snaps, 200))


def test_iceberg_read_current_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "ice")
    _build_v2_table(spark, root)
    got = {(r["id"], r["v"]) for r in iceberg_read(spark, root).collect()}
    assert got == {(1, 1.0), (2, 2.0), (3, 3.0)}  # f2's DELETED entry excluded
    old = {(r["id"], r["v"]) for r in iceberg_read(spark, root, 100).collect()}
    assert old == {(1, 1.0), (2, 2.0)}
    with pytest.raises(ValueError, match="snapshot 777"):
        iceberg_read(spark, root, 777)
    files, schema = iceberg_snapshot_files(spark, root)
    assert [os.path.basename(f) for f in files] == ["f0.parquet", "f1.parquet"]
    assert [f.name for f in schema.fields] == ["id", "v"]
    # lakehouse front door falls back here when the jar is absent
    from simple_data_workflow_spark.sources import lakehouse

    via = {
        (r["id"], r["v"])
        for r in lakehouse.read_table(spark, "iceberg", root).collect()
    }
    assert via == got


def test_iceberg_v1_inline_manifests_and_single_schema(spark, tmp_path):
    root = str(tmp_path / "ice1")
    _write_parquet_file(
        spark,
        spark.createDataFrame([(5, 5.0)], "id long, v double"),
        f"{root}/data/a.parquet",
    )
    _avro_write(
        spark, f"{root}/metadata/m.avro", _MANIFEST_ENTRY_SCHEMA,
        [_data_entry(f"{root}/data/a.parquet", 1)],
    )
    snaps = [{"snapshot-id": 1, "manifests": [f"{root}/metadata/m.avro"]}]
    _write_metadata(root, 1, _table_metadata(root, snaps, 1, format_version=1))
    got = {(r["id"], r["v"]) for r in iceberg_read(spark, root).collect()}
    assert got == {(5, 5.0)}


def test_iceberg_refusals(spark, tmp_path):
    # v3 reads since round 12 (deletion vectors) — the version refusal
    # moved to v4+
    root = str(tmp_path / "ice4")
    _write_metadata(root, 3, _table_metadata(root, [], -1, format_version=2) | {
        "format-version": 4,
    })
    with pytest.raises(IcebergFeatureUnsupported, match="format-version 4"):
        iceberg_read(spark, root)

    # round 13: PRIMITIVE v3 column defaults APPLY on read (pinned in
    # test_v3_native_write_row_lineage_and_defaults); a default on a
    # NON-primitive field still refuses — struct-literal synthesis is
    # out of scope for the jar-free reader
    import copy as _copy

    root3d = str(tmp_path / "ice3default")
    meta3 = _copy.deepcopy(
        _table_metadata(root3d, [], -1, format_version=2)
    ) | {
        "format-version": 3,
    }
    for s in meta3.get("schemas") or []:
        if s.get("fields"):
            s["fields"][0] = dict(s["fields"][0]) | {
                "type": {
                    "type": "struct",
                    "fields": [
                        {"id": 99, "name": "x", "required": False,
                         "type": "long"},
                    ],
                },
                "initial-default": {"99": 42},
            }
    _write_metadata(root3d, 3, meta3)
    with pytest.raises(IcebergFeatureUnsupported, match="non-primitive"):
        iceberg_read(spark, root3d)

    # EQUALITY delete file WITHOUT equality_ids: the match columns are
    # unknowable, so the read must refuse (supported equality deletes
    # are pinned in test_iceberg_equality_deletes below)
    root2 = str(tmp_path / "icedel")
    _write_parquet_file(
        spark,
        spark.createDataFrame([(1, 1.0)], "id long, v double"),
        f"{root2}/data/a.parquet",
    )
    _avro_write(
        spark, f"{root2}/metadata/m.avro", _MANIFEST_ENTRY_SCHEMA,
        [_data_entry(f"{root2}/data/a.parquet", 1)],
    )
    _avro_write(
        spark, f"{root2}/metadata/md.avro", _MANIFEST_ENTRY_SCHEMA,
        [_data_entry(f"{root2}/data/eq.parquet", 1, content=2)],
    )
    _avro_write(
        spark, f"{root2}/metadata/ml.avro", _MANIFEST_FILE_SCHEMA,
        [
            {"manifest_path": f"{root2}/metadata/m.avro",
             "manifest_length": 1, "content": 0},
            {"manifest_path": f"{root2}/metadata/md.avro",
             "manifest_length": 1, "content": 1},
        ],
    )
    snaps = [{"snapshot-id": 1, "manifest-list": f"{root2}/metadata/ml.avro"}]
    _write_metadata(root2, 1, _table_metadata(root2, snaps, 1))
    with pytest.raises(IcebergFeatureUnsupported, match="equality_ids"):
        iceberg_read(spark, root2)

    # a delete manifest whose entry lacks data_file.content is
    # MALFORMED v2 metadata: position-vs-equality cannot be guessed
    root3 = str(tmp_path / "icedf")
    _write_parquet_file(
        spark,
        spark.createDataFrame([(1, 1.0)], "id long, v double"),
        f"{root3}/data/a.parquet",
    )
    _avro_write(
        spark, f"{root3}/metadata/m.avro", _MANIFEST_ENTRY_SCHEMA,
        [_data_entry(f"{root3}/data/a.parquet", 1)],
    )
    _avro_write(
        spark, f"{root3}/metadata/md.avro", _MANIFEST_ENTRY_SCHEMA,
        [_data_entry(f"{root3}/data/pd.parquet", 1)],  # content absent
    )
    _avro_write(
        spark, f"{root3}/metadata/ml.avro", _MANIFEST_FILE_SCHEMA,
        [
            {"manifest_path": f"{root3}/metadata/m.avro",
             "manifest_length": 1, "content": 0},
            {"manifest_path": f"{root3}/metadata/md.avro",
             "manifest_length": 1, "content": 1},
        ],
    )
    snaps = [{"snapshot-id": 1, "manifest-list": f"{root3}/metadata/ml.avro"}]
    _write_metadata(root3, 1, _table_metadata(root3, snaps, 1))
    with pytest.raises(IcebergFeatureUnsupported, match="malformed"):
        iceberg_read(spark, root3)


def test_iceberg_field_id_rename_guard(spark, tmp_path):
    """A renamed column keeps its field-id: parquet footers say
    (old_name → id 2) while the table declares a DIFFERENT column
    under that name (id 3). By-name reading would silently misread —
    the probe detects the contradiction and the scan switches to
    FIELD-ID resolution (the spec's rule): the file's id-2 column
    belongs to no current field and is ignored, and the table's
    ``old_v`` (id 3) reads NULL because the file predates it."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "iceren")
    os.makedirs(f"{root}/data", exist_ok=True)
    # file written under the ORIGINAL names with Iceberg field-ids:
    # id=1 for column "id", id=2 for column "old_v"
    t = pa.table(
        {
            "id": pa.array([1], pa.int64()),
            "old_v": pa.array([1.0], pa.float64()),
        }
    )
    t = t.cast(
        pa.schema(
            [
                pa.field("id", pa.int64(), metadata={b"PARQUET:field_id": b"1"}),
                pa.field("old_v", pa.float64(), metadata={b"PARQUET:field_id": b"2"}),
            ]
        )
    )
    pq.write_table(t, f"{root}/data/a.parquet")
    _avro_write(
        spark, f"{root}/metadata/m.avro", _MANIFEST_ENTRY_SCHEMA,
        [_data_entry(f"{root}/data/a.parquet", 1)],
    )
    snaps = [{"snapshot-id": 1, "manifests": [f"{root}/metadata/m.avro"]}]
    # table schema RENAMED field 2 to "v" but also declares a column
    # named "old_v" under a DIFFERENT id (the misread scenario)
    schema = {
        "schema-id": 0,
        "type": "struct",
        "fields": [
            {"id": 1, "name": "id", "required": False, "type": "long"},
            {"id": 3, "name": "old_v", "required": False, "type": "double"},
        ],
    }
    _write_metadata(
        root, 1,
        _table_metadata(root, snaps, 1, format_version=2, schemas=[schema]),
    )
    got = [tuple(r) for r in iceberg_read(spark, root).collect()]
    assert got == [(1, None)]


def test_iceberg_empty_table_and_schema_types(spark, tmp_path):
    root = str(tmp_path / "iceempty")
    schema = {
        "schema-id": 0,
        "type": "struct",
        "fields": [
            {"id": 1, "name": "s", "required": True, "type": "string"},
            {"id": 2, "name": "d", "required": False, "type": "decimal(10, 2)"},
            {"id": 3, "name": "ts", "required": False, "type": "timestamptz"},
            {
                "id": 4,
                "name": "tags",
                "required": False,
                "type": {
                    "type": "list",
                    "element-id": 5,
                    "element": "string",
                    "element-required": False,
                },
            },
        ],
    }
    _write_metadata(
        root, 1,
        _table_metadata(root, [], -1, format_version=2, schemas=[schema]),
    )
    df = iceberg_read(spark, root)
    assert df.count() == 0
    assert dict((f.name, f.dataType.simpleString()) for f in df.schema.fields) == {
        "s": "string",
        "d": "decimal(10,2)",
        "ts": "timestamp",
        "tags": "array<string>",
    }


# round 11: v2 equality deletes — sequence-ordered anti-joins
_MANIFEST_ENTRY_SCHEMA_SEQ = json.dumps(
    {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int"},
            {
                "name": "sequence_number",
                "type": ["null", "long"],
                "default": None,
            },
            {
                "name": "data_file",
                "type": {
                    "type": "record",
                    "name": "r2",
                    "fields": [
                        {"name": "content", "type": ["null", "int"], "default": None},
                        {"name": "file_path", "type": "string"},
                        {"name": "file_format", "type": "string"},
                        {"name": "record_count", "type": "long"},
                        {
                            "name": "equality_ids",
                            "type": ["null", {"type": "array", "items": "int"}],
                            "default": None,
                        },
                    ],
                },
            },
        ],
    }
)

_MANIFEST_FILE_SCHEMA_SEQ = json.dumps(
    {
        "type": "record",
        "name": "manifest_file",
        "fields": [
            {"name": "manifest_path", "type": "string"},
            {"name": "manifest_length", "type": "long"},
            {"name": "content", "type": ["null", "int"], "default": None},
            {
                "name": "sequence_number",
                "type": ["null", "long"],
                "default": None,
            },
        ],
    }
)


def _avro_write_json(spark, path, schema_json, rows):
    """Union-typed numeric fields (sequence_number) can't cross py4j as
    boxed Longs (py4j unboxes them back to Python ints → Integer → Avro
    union resolution fails); the writer module's JSON-decoder path fixes
    widths from the schema."""
    import os as _os

    from simple_data_workflow_spark.sources.iceberg_writer import (
        _write_avro,
    )

    _os.makedirs(_os.path.dirname(path), exist_ok=True)
    _write_avro(spark, path, schema_json, rows)


def _seq_entry(path, rows, seq=None, content=0, equality_ids=None):
    e = _data_entry(path, rows, content=content)
    e["sequence_number"] = seq
    if equality_ids is not None:
        e["data_file"]["equality_ids"] = equality_ids
    return e


def test_iceberg_equality_deletes(spark, tmp_path):
    """Spec scan planning: an equality delete at data sequence number s
    removes matching rows (NULL-safe, on the equality_ids columns) from
    data files with sequence number STRICTLY below s — files written at
    or after s keep their rows, so re-inserted keys survive."""
    root = str(tmp_path / "iceeq")
    # f0 at seq 1; f1 at seq 3 (re-inserts id=2 after the delete)
    _write_parquet_file(
        spark,
        spark.createDataFrame(
            [(1, 1.0), (2, 2.0), (None, 9.0)], "id long, v double"
        ),
        f"{root}/data/f0.parquet",
    )
    _write_parquet_file(
        spark,
        spark.createDataFrame([(2, 22.0), (4, 4.0)], "id long, v double"),
        f"{root}/data/f1.parquet",
    )
    # equality delete at seq 2 on field id 1 (= column "id"): id=2 and
    # the NULL id (null-safe match)
    _write_parquet_file(
        spark,
        spark.createDataFrame([(2,), (None,)], "id long"),
        f"{root}/data/eq0.parquet",
    )
    _avro_write_json(
        spark, f"{root}/metadata/m0.avro", _MANIFEST_ENTRY_SCHEMA_SEQ,
        [_seq_entry(f"{root}/data/f0.parquet", 3, seq=1)],
    )
    _avro_write_json(
        spark, f"{root}/metadata/m1.avro", _MANIFEST_ENTRY_SCHEMA_SEQ,
        [_seq_entry(f"{root}/data/f1.parquet", 2, seq=3)],
    )
    _avro_write_json(
        spark, f"{root}/metadata/md.avro", _MANIFEST_ENTRY_SCHEMA_SEQ,
        [
            _seq_entry(
                f"{root}/data/eq0.parquet", 2, seq=2, content=2,
                equality_ids=[1],
            )
        ],
    )
    _avro_write_json(
        spark, f"{root}/metadata/ml.avro", _MANIFEST_FILE_SCHEMA_SEQ,
        [
            {"manifest_path": f"{root}/metadata/m0.avro",
             "manifest_length": 1, "content": 0, "sequence_number": 1},
            {"manifest_path": f"{root}/metadata/m1.avro",
             "manifest_length": 1, "content": 0, "sequence_number": 3},
            {"manifest_path": f"{root}/metadata/md.avro",
             "manifest_length": 1, "content": 1, "sequence_number": 2},
        ],
    )
    snaps = [{"snapshot-id": 1, "manifest-list": f"{root}/metadata/ml.avro",
              "sequence-number": 3}]
    _write_metadata(root, 1, _table_metadata(root, snaps, 1))
    got = {(r["id"], r["v"]) for r in iceberg_read(spark, root).collect()}
    # f0 (seq 1 < 2): id=2 and NULL-id rows deleted; f1 (seq 3 >= 2):
    # untouched, including the re-inserted id=2
    assert got == {(1, 1.0), (2, 22.0), (4, 4.0)}
    # iceberg_snapshot_files still refuses delete-carrying snapshots
    with pytest.raises(IcebergFeatureUnsupported, match="row-level"):
        iceberg_snapshot_files(spark, root)


def test_iceberg_entry_seq_inherited_from_manifest_list(spark, tmp_path):
    """A null manifest-entry sequence_number on an ADDED entry inherits
    the manifest-list entry's (spec sequence-number inheritance) — the
    equality delete must still order correctly."""
    root = str(tmp_path / "iceinh")
    _write_parquet_file(
        spark,
        spark.createDataFrame([(1, 1.0), (2, 2.0)], "id long, v double"),
        f"{root}/data/f0.parquet",
    )
    _write_parquet_file(
        spark,
        spark.createDataFrame([(2,)], "id long"),
        f"{root}/data/eq0.parquet",
    )
    _avro_write_json(
        spark, f"{root}/metadata/m0.avro", _MANIFEST_ENTRY_SCHEMA_SEQ,
        [_seq_entry(f"{root}/data/f0.parquet", 2, seq=None)],  # inherit 1
    )
    _avro_write_json(
        spark, f"{root}/metadata/md.avro", _MANIFEST_ENTRY_SCHEMA_SEQ,
        [
            _seq_entry(
                f"{root}/data/eq0.parquet", 1, seq=None, content=2,
                equality_ids=[1],
            )
        ],
    )
    _avro_write_json(
        spark, f"{root}/metadata/ml.avro", _MANIFEST_FILE_SCHEMA_SEQ,
        [
            {"manifest_path": f"{root}/metadata/m0.avro",
             "manifest_length": 1, "content": 0, "sequence_number": 1},
            {"manifest_path": f"{root}/metadata/md.avro",
             "manifest_length": 1, "content": 1, "sequence_number": 2},
        ],
    )
    snaps = [{"snapshot-id": 1, "manifest-list": f"{root}/metadata/ml.avro",
              "sequence-number": 2}]
    _write_metadata(root, 1, _table_metadata(root, snaps, 1))
    got = {(r["id"], r["v"]) for r in iceberg_read(spark, root).collect()}
    assert got == {(1, 1.0)}  # id=2 deleted: file seq 1 < delete seq 2


def test_iceberg_position_delete_antijoin_path(spark, tmp_path, monkeypatch):
    """Above _POS_DELETE_MASK_MAX the reader must not collect positions
    at all — the distributed anti-join on (file_path, row_index) must
    produce the exact same rows as the broadcast-mask path."""
    import simple_data_workflow_spark.sources.iceberg_reader as ir

    root = str(tmp_path / "icepda")
    _write_parquet_file(
        spark,
        spark.createDataFrame(
            [(i, float(i)) for i in range(20)], "id long, v double"
        ),
        f"{root}/data/f0.parquet",
    )
    _write_parquet_file(
        spark,
        spark.createDataFrame(
            [(f"{root}/data/f0.parquet", p) for p in range(0, 20, 3)],
            "file_path string, pos long",
        ),
        f"{root}/data/pd0.parquet",
    )
    _avro_write(
        spark, f"{root}/metadata/m0.avro", _MANIFEST_ENTRY_SCHEMA,
        [_data_entry(f"{root}/data/f0.parquet", 20)],
    )
    _avro_write(
        spark, f"{root}/metadata/md.avro", _MANIFEST_ENTRY_SCHEMA,
        [_data_entry(f"{root}/data/pd0.parquet", 7, content=1)],
    )
    _avro_write(
        spark, f"{root}/metadata/ml.avro", _MANIFEST_FILE_SCHEMA,
        [
            {"manifest_path": f"{root}/metadata/m0.avro",
             "manifest_length": 1, "content": 0},
            {"manifest_path": f"{root}/metadata/md.avro",
             "manifest_length": 1, "content": 1},
        ],
    )
    snaps = [{"snapshot-id": 1, "manifest-list": f"{root}/metadata/ml.avro"}]
    _write_metadata(root, 1, _table_metadata(root, snaps, 1))
    want = {(i, float(i)) for i in range(20) if i % 3 != 0}
    via_mask = {(r["id"], r["v"]) for r in iceberg_read(spark, root).collect()}
    assert via_mask == want
    monkeypatch.setattr(ir, "_POS_DELETE_MASK_MAX", 0)  # force anti-join
    via_join = {(r["id"], r["v"]) for r in iceberg_read(spark, root).collect()}
    assert via_join == want


def test_iceberg_read_filters_prune_identity_partitions(spark, tmp_path):
    """Scan planning: a data file's manifest partition record proves
    misses for identity-partition filters — pruned files never
    schedule; the row filter keeps results equal to a filtered scan,
    and stacked position deletes still apply on the survivors."""
    from pyspark.sql import functions as F

    from simple_data_workflow_spark.sources.iceberg_writer import (
        iceberg_delete,
        iceberg_write,
    )

    root = str(tmp_path / "iskip")
    df = spark.range(0, 3000).select(
        F.col("id").cast("long"),
        (F.col("id") % 3).cast("string").alias("g"),
    )
    iceberg_write(df, root, mode="error", partition_by=["g"])
    full_n = len(iceberg_read(spark, root).inputFiles())
    flt = iceberg_read(spark, root, filters=[("g", "in", ["0", "2"])])
    assert {r["g"] for r in flt.collect()} == {"0", "2"}
    assert len(flt.inputFiles()) < full_n
    iceberg_delete(spark, root, "g = '0' and id < 30")
    f2 = iceberg_read(spark, root, filters=[("g", "==", "0")])
    assert f2.count() == 1000 - 10
    # cross-typed filter value never prunes wrongly (conservative)
    f3 = iceberg_read(spark, root, filters=[("g", "==", 0)])
    assert len(f3.inputFiles()) == len(iceberg_read(spark, root).inputFiles())


def test_iceberg_table_changes_changelog(spark, tmp_path):
    """Round 12 continuation: the jar-free changelog — appends emit
    inserts; a position-delete snapshot emits exactly the dying rows;
    an UPDATE snapshot emits delete+insert; compaction (replace)
    emits nothing; v3 DV snapshots emit only the NEWLY-dead rows;
    equality deletes emit the matching parent-live rows."""
    from simple_data_workflow_spark.sources.iceberg_reader import (
        iceberg_table_changes,
        load_table_metadata,
    )
    from simple_data_workflow_spark.sources.iceberg_writer import (
        iceberg_compact,
        iceberg_delete,
        iceberg_equality_delete,
        iceberg_update,
        iceberg_upgrade_format,
        iceberg_write,
    )

    root = str(tmp_path / "chlog")
    iceberg_write(
        spark.createDataFrame(
            [(i, float(i)) for i in range(8)], "id int, v double"
        ).coalesce(1),
        root,
        mode="error",
    )
    iceberg_write(
        spark.createDataFrame([(100, 1.0)], "id int, v double"),
        root,
        mode="append",
    )
    iceberg_delete(spark, root, "id IN (2, 3)")  # v2 position deletes
    iceberg_update(spark, root, {"v": "v + 50.0"}, "id = 4")
    sid_before_compact = load_table_metadata(spark, root)[
        "current-snapshot-id"
    ]
    iceberg_compact(spark, root)  # replace: no changes
    iceberg_equality_delete(
        spark, root, spark.createDataFrame([(100,)], "id int")
    )
    iceberg_upgrade_format(spark, root, 3)
    iceberg_delete(spark, root, "id = 5")  # v3 DV
    iceberg_delete(spark, root, "id = 6")  # stacked DV: only NEW dead

    ch = iceberg_table_changes(spark, root)
    got = sorted(
        (r["_change_ordinal"], r["_change_type"], r["id"], r["v"])
        for r in ch.collect()
    )
    expect = sorted(
        [(0, "insert", i, float(i)) for i in range(8)]
        + [(1, "insert", 100, 1.0)]
        + [(2, "delete", 2, 2.0), (2, "delete", 3, 3.0)]
        + [(3, "delete", 4, 4.0), (3, "insert", 4, 54.0)]
        # ordinal 4 = compaction (nothing)
        + [(5, "delete", 100, 1.0)]
        + [(6, "delete", 5, 5.0)]
        + [(7, "delete", 6, 6.0)]
    )
    assert got == expect
    # ranged read: only the last two snapshots
    snaps = load_table_metadata(spark, root)["snapshots"]
    ordered = sorted(snaps, key=lambda s: int(s.get("sequence-number") or 0))
    frm = int(ordered[-3]["snapshot-id"])
    ranged = iceberg_table_changes(spark, root, from_snapshot=frm)
    assert {(r["_change_type"], r["id"]) for r in ranged.collect()} == {
        ("delete", 5),
        ("delete", 6),
    }


def _lz4_literal_frame(payload: bytes) -> bytes:
    """A spec-valid LZ4 frame encoding ``payload``: one literals-only
    sequence per block (every byte a literal is legal LZ4), plus one
    hand-crafted match block exercised separately in the test."""
    def lit_block(data: bytes) -> bytes:
        n = len(data)
        if n >= 15:
            ext = b""
            rest = n - 15
            while rest >= 255:
                ext += b"\xff"
                rest -= 255
            ext += bytes([rest])
            tok = bytes([0xF0]) + ext
        else:
            tok = bytes([n << 4])
        return tok + data
    blk = lit_block(payload)
    out = b"\x04\x22\x4d\x18"          # frame magic
    out += bytes([0x60, 0x40])          # FLG: v1, block-independent; BD
    out += b"\x00"                      # header checksum (skipped)
    out += len(blk).to_bytes(4, "little") + blk
    out += b"\x00\x00\x00\x00"          # EndMark
    return out


def test_puffin_lz4_footer(tmp_path):
    """Round 13 (VERDICT r12 #7): Puffin footers whose payload is
    LZ4-frame-compressed (flag bit 0) decode through the pure-Python
    frame decoder — including match sequences and the literals-only
    tail — instead of refusing."""
    import json as _json
    import struct as _struct
    import zlib as _zlib

    import numpy as np

    from simple_data_workflow_spark.sources.delta_dv import dv_serialize
    from simple_data_workflow_spark.sources.puffin import (
        MAGIC,
        find_dv_blob,
        lz4_frame_decompress,
        read_dv_blob,
        read_footer,
    )

    # block decoder: literals + a match (offset 4, len 4 → "abcdabcd")
    seq = bytes([0x40]) + b"abcd" + b"\x04\x00" + bytes([0x10]) + b"Z"
    frame = (
        b"\x04\x22\x4d\x18" + bytes([0x60, 0x40]) + b"\x00"
        + len(seq).to_bytes(4, "little") + seq + b"\x00\x00\x00\x00"
    )
    assert lz4_frame_decompress(frame) == b"abcdabcdZ"

    # a Puffin file with an LZ4-compressed footer
    positions = np.array([1, 5, 9], dtype=np.int64)
    vec = dv_serialize(positions)
    buf = bytearray(MAGIC)
    offset = len(buf)
    buf += _struct.pack(">i", len(vec)) + vec
    buf += _struct.pack(">I", _zlib.crc32(vec) & 0xFFFFFFFF)
    length = len(buf) - offset
    footer = _json.dumps(
        {
            "blobs": [
                {
                    "type": "deletion-vector-v1",
                    "fields": [],
                    "offset": offset,
                    "length": length,
                    "properties": {"referenced-data-file": "f1.parquet"},
                }
            ]
        }
    ).encode()
    comp = _lz4_literal_frame(footer)
    buf += MAGIC + comp
    buf += _struct.pack("<i", len(comp))
    buf += _struct.pack("<i", 1)  # flags: footer payload compressed
    buf += MAGIC
    raw = bytes(buf)
    assert read_footer(raw)["blobs"][0]["offset"] == offset
    off, ln = find_dv_blob(raw, "f1.parquet")
    got = read_dv_blob(raw, off, ln)
    assert list(got) == [1, 5, 9]


def test_iceberg_orc_data_files(spark, tmp_path):
    """Round 13 (VERDICT r12 #7): ORC DATA files scan alongside parquet
    — the manifest's file_format routes each file to the right Spark
    scan, equality deletes apply across both formats, and position
    deletes targeting an ORC file refuse loudly (no row-index there)."""
    import glob as _glob
    import os as _os

    from simple_data_workflow_spark.sources.iceberg_reader import (
        iceberg_read,
        load_table_metadata,
    )
    from simple_data_workflow_spark.sources.iceberg_writer import (
        _publish_dml_snapshot,
        iceberg_equality_delete,
        iceberg_write,
    )

    root = str(tmp_path / "orcmix")
    iceberg_write(
        spark.createDataFrame(
            [(1, "pq"), (2, "pq"), (3, "pq")], "id long, src string"
        ),
        root,
        mode="error",
    )
    orc_dir = str(tmp_path / "orcstage")
    spark.createDataFrame(
        [(10, "orc"), (11, "orc")], "id long, src string"
    ).coalesce(1).write.orc(orc_dir)
    orc_file = _glob.glob(f"{orc_dir}/part-*.orc")[0]
    meta = load_table_metadata(spark, root)
    _publish_dml_snapshot(
        spark,
        root,
        meta,
        [
            {
                "path": orc_file,
                "record_count": 2,
                "size": _os.path.getsize(orc_file),
                "partition_values": {},
                "file_format": "ORC",
            }
        ],
        [],
        "append",
        [],
    )
    got = {(r["id"], r["src"]) for r in iceberg_read(spark, root).collect()}
    assert got == {(1, "pq"), (2, "pq"), (3, "pq"), (10, "orc"), (11, "orc")}
    # equality delete applies to BOTH formats (strictly-smaller seq rule)
    iceberg_equality_delete(
        spark, root, spark.createDataFrame([(2,), (10,)], "id long")
    )
    got2 = {(r["id"], r["src"]) for r in iceberg_read(spark, root).collect()}
    assert got2 == {(1, "pq"), (3, "pq"), (11, "orc")}


def test_iceberg_uuid_and_fixed_types(spark, tmp_path):
    """Round 13: ``fixed[n]`` columns read as BINARY and TOP-LEVEL
    ``uuid`` columns read as the canonical lowercase-hex string (the
    presentation real engines give); ``time`` still refuses."""
    import uuid as _uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    from simple_data_workflow_spark.sources.iceberg_reader import (
        IcebergFeatureUnsupported,
        iceberg_read,
    )

    root = str(tmp_path / "iceuuid")
    u1, u2 = _uuid.uuid4(), _uuid.uuid4()
    t = pa.table(
        {
            "id": pa.array([1, 2], pa.int64()),
            "u": pa.array([u1.bytes, u2.bytes], pa.binary()),
            "fx": pa.array([b"\x01\x02\x03\x04", b"\xff\xfe\xfd\xfc"], pa.binary()),
        }
    )
    import os as _os

    _os.makedirs(f"{root}/data", exist_ok=True)
    pq.write_table(t, f"{root}/data/a.parquet")
    fields = [
        {"id": 1, "name": "id", "required": False, "type": "long"},
        {"id": 2, "name": "u", "required": False, "type": "uuid"},
        {"id": 3, "name": "fx", "required": False, "type": "fixed[4]"},
    ]
    meta = {
        "format-version": 2,
        "table-uuid": str(_uuid.uuid4()),
        "location": root,
        "last-updated-ms": 1,
        "last-column-id": 3,
        "last-sequence-number": 1,
        "schema": {"type": "struct", "schema-id": 0, "fields": fields},
        "schemas": [{"type": "struct", "schema-id": 0, "fields": fields}],
        "current-schema-id": 0,
        "partition-spec": [],
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-spec-id": 0,
        "last-partition-id": 999,
        "properties": {},
        "current-snapshot-id": 1,
        "snapshots": [
            {
                "snapshot-id": 1,
                "timestamp-ms": 1,
                "sequence-number": 1,
                "summary": {"operation": "append"},
                "manifests": [],
                "manifest-list": "",
            }
        ],
    }
    # v1-style inline manifests list (empty manifest-list string wins
    # the else branch)
    meta["snapshots"][0].pop("manifest-list")
    meta["snapshots"][0]["manifests"] = []
    from simple_data_workflow_spark.sources.iceberg_writer import (
        _manifest_entry_schema_json,
        _write_avro,
    )

    _write_avro(
        spark,
        f"{root}/metadata/m.avro",
        _manifest_entry_schema_json([], 2),
        [
            {
                "status": 1,
                "snapshot_id": 1,
                "sequence_number": None,
                "file_sequence_number": None,
                "data_file": {
                    "content": 0,
                    "file_path": f"{root}/data/a.parquet",
                    "file_format": "PARQUET",
                    "partition": {},
                    "record_count": 2,
                    "file_size_in_bytes": 100,
                    "equality_ids": None,
                },
            }
        ],
        meta={"format-version": "2"},
    )
    import json as _json

    from simple_data_workflow_spark.sources.iceberg_writer import (
        _manifest_file_schema_json,
    )

    _write_avro(
        spark,
        f"{root}/metadata/ml.avro",
        _manifest_file_schema_json(2),
        [
            {
                "manifest_path": f"{root}/metadata/m.avro",
                "manifest_length": 100,
                "partition_spec_id": 0,
                "content": 0,
                "sequence_number": 1,
                "min_sequence_number": 1,
                "added_snapshot_id": 1,
                "added_data_files_count": 1,
                "existing_data_files_count": 0,
                "deleted_data_files_count": 0,
            }
        ],
        meta={"format-version": "2"},
    )
    meta["snapshots"][0]["manifest-list"] = f"{root}/metadata/ml.avro"
    with open(f"{root}/metadata/v1.metadata.json", "w") as f:
        _json.dump(meta, f)
    got = {(r["id"], r["u"], bytes(r["fx"])) for r in iceberg_read(spark, root).collect()}
    assert got == {
        (1, str(u1), b"\x01\x02\x03\x04"),
        (2, str(u2), b"\xff\xfe\xfd\xfc"),
    }
    # time still refuses
    fields_t = [dict(fields[0]), {"id": 2, "name": "t", "required": False, "type": "time"}]
    meta2 = dict(meta)
    meta2["schema"] = {"type": "struct", "schema-id": 0, "fields": fields_t}
    meta2["schemas"] = [meta2["schema"]]
    root2 = str(tmp_path / "icetime")
    _os.makedirs(f"{root2}/metadata", exist_ok=True)
    meta2["location"] = root2
    with open(f"{root2}/metadata/v1.metadata.json", "w") as f:
        _json.dump(meta2, f)
    import pytest as _pytest

    with _pytest.raises(IcebergFeatureUnsupported, match="time"):
        iceberg_read(spark, root2)
