"""Jar-free Delta Lake read interop (round 10, VERDICT r9 #3): the
fixtures below are hand-written spec-conformant ``_delta_log`` trees
(delta.io PROTOCOL.md — JSON-line commits, checkpoint parquet,
URL-encoded relative paths, partitionValues), so these tests pin the
reader against the PUBLIC protocol, not against a Delta runtime."""

import glob
import json
import os
import shutil

import pytest

from simple_data_workflow_spark.sources.delta_reader import (
    DeltaFeatureUnsupported,
    delta_read,
    delta_snapshot_files,
)


def _write_parquet_file(spark, df, dest: str) -> None:
    """One-file parquet at an exact path (Delta names files itself)."""
    tmp = dest + ".__tmp__"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(f"{tmp}/part-*.parquet")[0]
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    shutil.move(part, dest)
    shutil.rmtree(tmp)


def _commit(root: str, version: int, actions: list[dict]) -> None:
    os.makedirs(f"{root}/_delta_log", exist_ok=True)
    with open(f"{root}/_delta_log/{version:020d}.json", "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")


_SCHEMA_STRING = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "double", "nullable": True, "metadata": {}},
        ],
    }
)


def _meta(partition_cols=(), schema_string=_SCHEMA_STRING, conf=None):
    return {
        "metaData": {
            "id": "11111111-2222-3333-4444-555555555555",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema_string,
            "partitionColumns": list(partition_cols),
            "configuration": conf or {},
            "createdTime": 1700000000000,
        }
    }


_PROTO = {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}


def _add(path, pv=None):
    return {
        "add": {
            "path": path,
            "partitionValues": pv or {},
            "size": 1000,
            "modificationTime": 1700000000000,
            "dataChange": True,
        }
    }


def _remove(path):
    return {
        "remove": {
            "path": path,
            "deletionTimestamp": 1700000001000,
            "dataChange": True,
        }
    }


def test_delta_read_latest_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "dl")
    _write_parquet_file(
        spark,
        spark.createDataFrame([(1, 1.0), (2, 2.0)], "id long, v double"),
        f"{root}/f0.parquet",
    )
    _write_parquet_file(
        spark,
        spark.createDataFrame([(3, 3.0)], "id long, v double"),
        f"{root}/f1.parquet",
    )
    _write_parquet_file(
        spark,
        spark.createDataFrame([(4, 4.0)], "id long, v double"),
        f"{root}/f2.parquet",
    )
    _commit(root, 0, [_PROTO, _meta(), _add("f0.parquet"), _add("f1.parquet")])
    # v1: compaction-style swap — f1 out, f2 in
    _commit(root, 1, [_remove("f1.parquet"), _add("f2.parquet")])

    latest = {(r["id"], r["v"]) for r in delta_read(spark, root).collect()}
    assert latest == {(1, 1.0), (2, 2.0), (4, 4.0)}
    v0 = {(r["id"], r["v"]) for r in delta_read(spark, root, 0).collect()}
    assert v0 == {(1, 1.0), (2, 2.0), (3, 3.0)}
    with pytest.raises(ValueError, match="version 7"):
        delta_read(spark, root, 7)
    # lakehouse front door falls back here when the jar is absent
    from simple_data_workflow_spark.sources import lakehouse

    got = {
        (r["id"], r["v"])
        for r in lakehouse.read_table(spark, "delta", root).collect()
    }
    assert got == latest


def test_delta_read_partitioned_urlencoded_and_null(spark, tmp_path):
    """Partition columns are NOT in the data files — the reader must
    inject them from partitionValues, cast to the schema type, decode
    URL-encoded paths, and map __HIVE_DEFAULT_PARTITION__ to NULL."""
    root = str(tmp_path / "dlp")
    schema = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "id", "type": "long", "nullable": True, "metadata": {}},
                {"name": "part id", "type": "integer", "nullable": True, "metadata": {}},
            ],
        }
    )
    _write_parquet_file(
        spark, spark.createDataFrame([(1,), (2,)], "id long"),
        f"{root}/part id=10/a.parquet",
    )
    _write_parquet_file(
        spark, spark.createDataFrame([(3,)], "id long"),
        f"{root}/part id=__HIVE_DEFAULT_PARTITION__/b.parquet",
    )
    _commit(
        root,
        0,
        [
            _PROTO,
            _meta(partition_cols=["part id"], schema_string=schema),
            _add("part%20id=10/a.parquet", {"part id": "10"}),
            _add(
                "part%20id=__HIVE_DEFAULT_PARTITION__/b.parquet",
                {"part id": "__HIVE_DEFAULT_PARTITION__"},
            ),
        ],
    )
    df = delta_read(spark, root)
    assert df.schema["part id"].dataType.simpleString() == "int"
    got = {(r["id"], r["part id"]) for r in df.collect()}
    assert got == {(1, 10), (2, 10), (3, None)}


def test_delta_read_checkpoint_seed_plus_trailing_commits(spark, tmp_path):
    """Snapshot = newest checkpoint <= target + later JSON commits; the
    pre-checkpoint commit files may be vacuumed away entirely."""
    root = str(tmp_path / "dlc")
    for i, rows in enumerate([[(1, 1.0)], [(2, 2.0)], [(3, 3.0)]]):
        _write_parquet_file(
            spark,
            spark.createDataFrame(rows, "id long, v double"),
            f"{root}/f{i}.parquet",
        )
    # checkpoint at version 1: live set {f0, f1} (f9 was removed at v1
    # — removes are tombstones and stay OUT of the live set)
    meta_struct = _meta()["metaData"]
    proto_struct = _PROTO["protocol"]
    cp_rows = [
        {"add": {"path": "f0.parquet", "partitionValues": {},
                 "size": 1000, "modificationTime": 1, "dataChange": True},
         "metaData": None, "protocol": None},
        {"add": {"path": "f1.parquet", "partitionValues": {},
                 "size": 1000, "modificationTime": 1, "dataChange": True},
         "metaData": None, "protocol": None},
        {"add": None, "metaData": meta_struct, "protocol": None},
        {"add": None, "metaData": None, "protocol": proto_struct},
    ]
    cp_schema = (
        "add struct<path:string, partitionValues:map<string,string>, "
        "size:long, modificationTime:long, dataChange:boolean>, "
        "metaData struct<id:string, format:struct<provider:string, "
        "options:map<string,string>>, schemaString:string, "
        "partitionColumns:array<string>, "
        "configuration:map<string,string>, createdTime:long>, "
        "protocol struct<minReaderVersion:int, minWriterVersion:int>"
    )
    os.makedirs(f"{root}/_delta_log", exist_ok=True)
    _write_parquet_file(
        spark,
        spark.createDataFrame(cp_rows, cp_schema),
        f"{root}/_delta_log/{1:020d}.checkpoint.parquet",
    )
    with open(f"{root}/_delta_log/_last_checkpoint", "w") as f:
        json.dump({"version": 1, "size": 4}, f)
    # trailing commit v2 adds f2
    _commit(root, 2, [_add("f2.parquet")])

    got = {(r["id"], r["v"]) for r in delta_read(spark, root).collect()}
    assert got == {(1, 1.0), (2, 2.0), (3, 3.0)}
    files, dvs, schema, parts = delta_snapshot_files(spark, root)
    assert dvs == {}
    assert {os.path.basename(f) for f in files} == {
        "f0.parquet", "f1.parquet", "f2.parquet"
    }
    assert parts == []


def test_delta_reader_refuses_v3_features_and_column_mapping(
    spark, tmp_path
):
    """Column-mapped tables must refuse LOUDLY — reading their files
    directly returns wrong rows, which is worse than an error. A v3
    protocol whose only reader feature is deletionVectors is READABLE
    since the DV decoder landed (test_delta_dv.py covers the DVs
    themselves); an unknown reader feature still refuses."""
    root = str(tmp_path / "dldv")
    _write_parquet_file(
        spark,
        spark.createDataFrame([(1, 1.0)], "id long, v double"),
        f"{root}/f0.parquet",
    )
    _commit(
        root,
        0,
        [
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": ["deletionVectors"],
                    "writerFeatures": ["deletionVectors"],
                }
            },
            _meta(),
            _add("f0.parquet"),
        ],
    )
    assert [(r["id"], r["v"]) for r in delta_read(spark, root).collect()] == [
        (1, 1.0)
    ]

    root2 = str(tmp_path / "dlcm")
    _write_parquet_file(
        spark,
        spark.createDataFrame([(1, 1.0)], "id long, v double"),
        f"{root2}/f0.parquet",
    )
    _commit(
        root2,
        0,
        [
            _PROTO,
            _meta(conf={"delta.columnMapping.mode": "id"}),
            _add("f0.parquet"),
        ],
    )
    # id mode resolves by parquet field-id; a schemaString that carries
    # NO delta.columnMapping.id metadata cannot be honored by-id, so it
    # refuses (valid id-mode tables are supported — own test below)
    with pytest.raises(DeltaFeatureUnsupported, match="'id'"):
        delta_read(spark, root2).collect()

    # a CORRUPT per-file deletion vector must still fail loudly (a
    # malformed storage type can't be decoded — never silently ignored)
    root3 = str(tmp_path / "dldv2")
    _write_parquet_file(
        spark,
        spark.createDataFrame([(1, 1.0)], "id long, v double"),
        f"{root3}/f0.parquet",
    )
    add_dv = _add("f0.parquet")
    add_dv["add"]["deletionVector"] = {
        "storageType": "z", "pathOrInlineDv": "x", "offset": 1,
        "sizeInBytes": 40, "cardinality": 1,
    }
    _commit(root3, 0, [_PROTO, _meta(), add_dv])
    with pytest.raises(ValueError, match="storageType"):
        delta_read(spark, root3)


def test_delta_read_schema_evolution_latest_metadata_wins(spark, tmp_path):
    """A later metaData action redefines the schema; pre-evolution
    files surface the new column as NULL (parquet read by name)."""
    root = str(tmp_path / "dlse")
    _write_parquet_file(
        spark,
        spark.createDataFrame([(1, 1.0)], "id long, v double"),
        f"{root}/f0.parquet",
    )
    _write_parquet_file(
        spark,
        spark.createDataFrame([(2, 2.0, "x")], "id long, v double, tag string"),
        f"{root}/f1.parquet",
    )
    wider = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "id", "type": "long", "nullable": True, "metadata": {}},
                {"name": "v", "type": "double", "nullable": True, "metadata": {}},
                {"name": "tag", "type": "string", "nullable": True, "metadata": {}},
            ],
        }
    )
    _commit(root, 0, [_PROTO, _meta(), _add("f0.parquet")])
    _commit(
        root, 1, [_meta(schema_string=wider), _add("f1.parquet")]
    )
    got = {
        (r["id"], r["v"], r["tag"]) for r in delta_read(spark, root).collect()
    }
    assert got == {(1, 1.0, None), (2, 2.0, "x")}


def test_delta_read_column_mapping_name_mode(spark, tmp_path):
    """Name-mode column mapping: data files carry PHYSICAL column
    names (col-<uuid> style), the schemaString's field metadata maps
    them to logical names at every nesting level, and partitionValues
    keys by physical name. The reader must translate everywhere —
    the silent-NULL failure a plain by-name scan would produce."""
    root = str(tmp_path / "dlcmn")
    # physical layout: col-a (long), col-b struct<col-x: double>,
    # partitioned by col-p (string)
    _write_parquet_file(
        spark,
        spark.createDataFrame(
            [(1, (1.5,)), (2, (2.5,))],
            "`col-a` long, `col-b` struct<`col-x`: double>",
        ),
        f"{root}/col-p=US/a.parquet",
    )
    _write_parquet_file(
        spark,
        spark.createDataFrame(
            [(3, (3.5,))], "`col-a` long, `col-b` struct<`col-x`: double>"
        ),
        f"{root}/col-p=__HIVE_DEFAULT_PARTITION__/b.parquet",
    )
    schema = json.dumps(
        {
            "type": "struct",
            "fields": [
                {
                    "name": "id",
                    "type": "long",
                    "nullable": True,
                    "metadata": {
                        "delta.columnMapping.id": 1,
                        "delta.columnMapping.physicalName": "col-a",
                    },
                },
                {
                    "name": "payload",
                    "type": {
                        "type": "struct",
                        "fields": [
                            {
                                "name": "score",
                                "type": "double",
                                "nullable": True,
                                "metadata": {
                                    "delta.columnMapping.id": 3,
                                    "delta.columnMapping.physicalName": "col-x",
                                },
                            }
                        ],
                    },
                    "nullable": True,
                    "metadata": {
                        "delta.columnMapping.id": 2,
                        "delta.columnMapping.physicalName": "col-b",
                    },
                },
                {
                    "name": "region",
                    "type": "string",
                    "nullable": True,
                    "metadata": {
                        "delta.columnMapping.id": 4,
                        "delta.columnMapping.physicalName": "col-p",
                    },
                },
            ],
        }
    )
    _commit(
        root,
        0,
        [
            {
                "protocol": {
                    "minReaderVersion": 2,
                    "minWriterVersion": 5,
                }
            },
            {
                "metaData": {
                    "id": "cm-test",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": schema,
                    "partitionColumns": ["region"],
                    "configuration": {"delta.columnMapping.mode": "name"},
                    "createdTime": 1,
                }
            },
            _add("col-p=US/a.parquet", {"col-p": "US"}),
            _add(
                "col-p=__HIVE_DEFAULT_PARTITION__/b.parquet",
                {"col-p": "__HIVE_DEFAULT_PARTITION__"},
            ),
        ],
    )
    df = delta_read(spark, root)
    assert df.columns == ["id", "payload", "region"]
    assert df.schema["payload"].dataType.fieldNames() == ["score"]
    got = {
        (r["id"], r["payload"]["score"], r["region"]) for r in df.collect()
    }
    assert got == {(1, 1.5, "US"), (2, 2.5, "US"), (3, 3.5, None)}


def test_delta_read_column_mapping_id_mode(spark, tmp_path):
    """Id-mode column mapping resolves parquet columns by FIELD ID, not
    name. The fixture is adversarial: the files' physical names are
    SWAPPED relative to the logical schema (physical 'col-b' carries
    field-id 1 = logical 'a'; physical 'col-a' carries field-id 2 =
    logical 'b'), so any by-name resolution — logical or physical —
    reads the wrong column, and only honoring the spec's by-id rule
    produces these values. Also covers a nested struct field and a
    partition column keyed by physical name with a NULL partition."""
    from pyspark.sql import types as T

    root = str(tmp_path / "dlcmi")
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    file_schema = T.StructType(
        [
            T.StructField("col-b", T.LongType(), True, {"parquet.field.id": 1}),
            T.StructField("col-a", T.LongType(), True, {"parquet.field.id": 2}),
            T.StructField(
                "col-s",
                T.StructType(
                    [
                        T.StructField(
                            "col-x",
                            T.DoubleType(),
                            True,
                            {"parquet.field.id": 4},
                        )
                    ]
                ),
                True,
                {"parquet.field.id": 3},
            ),
        ]
    )
    _write_parquet_file(
        spark,
        spark.createDataFrame([(10, 20, (1.5,)), (11, 21, (2.5,))], file_schema),
        f"{root}/col-p=US/a.parquet",
    )
    _write_parquet_file(
        spark,
        spark.createDataFrame([(12, 22, (3.5,))], file_schema),
        f"{root}/col-p=__HIVE_DEFAULT_PARTITION__/b.parquet",
    )

    def fld(name, typ, fid, phys):
        return {
            "name": name,
            "type": typ,
            "nullable": True,
            "metadata": {
                "delta.columnMapping.id": fid,
                "delta.columnMapping.physicalName": phys,
            },
        }

    schema = json.dumps(
        {
            "type": "struct",
            "fields": [
                fld("a", "long", 1, "col-b"),
                fld("b", "long", 2, "col-a"),
                fld(
                    "payload",
                    {
                        "type": "struct",
                        "fields": [fld("score", "double", 4, "col-x")],
                    },
                    3,
                    "col-s",
                ),
                fld("region", "string", 5, "col-p"),
            ],
        }
    )
    _commit(
        root,
        0,
        [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            {
                "metaData": {
                    "id": "cm-id-test",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": schema,
                    "partitionColumns": ["region"],
                    "configuration": {"delta.columnMapping.mode": "id"},
                    "createdTime": 1,
                }
            },
            _add("col-p=US/a.parquet", {"col-p": "US"}),
            _add(
                "col-p=__HIVE_DEFAULT_PARTITION__/b.parquet",
                {"col-p": "__HIVE_DEFAULT_PARTITION__"},
            ),
        ],
    )
    df = delta_read(spark, root)
    assert df.columns == ["a", "b", "payload", "region"]
    got = {
        (r["a"], r["b"], r["payload"]["score"], r["region"])
        for r in df.collect()
    }
    assert got == {
        (10, 20, 1.5, "US"),
        (11, 21, 2.5, "US"),
        (12, 22, 3.5, None),
    }


def test_delta_reader_refuses_unknown_reader_feature(spark, tmp_path):
    """Reader features are a WHITELIST: an unknown feature (e.g. a
    future type-widening layout) could make the log replay silently
    wrong, so anything unrecognized refuses. (v2Checkpoint graduated
    off this list in round 12 — the manifest+sidecar replay is
    implemented.)"""
    root = str(tmp_path / "dlvf")
    _write_parquet_file(
        spark,
        spark.createDataFrame([(1, 1.0)], "id long, v double"),
        f"{root}/f0.parquet",
    )
    _commit(
        root,
        0,
        [
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": ["typeWidening"],
                    "writerFeatures": ["typeWidening"],
                }
            },
            _meta(),
            _add("f0.parquet"),
        ],
    )
    with pytest.raises(DeltaFeatureUnsupported, match="typeWidening"):
        delta_read(spark, root)


def test_delta_timestamp_as_of_and_history(spark, tmp_path):
    """timestampAsOf resolution (commitInfo.timestamp preferred, file
    mtime fallback) and the DESCRIBE HISTORY-shaped commit listing."""
    import json as _json

    from simple_data_workflow_spark.sources.delta_reader import (
        delta_history,
        delta_version_at_timestamp,
    )

    root = str(tmp_path / "dts")
    _write_parquet_file(
        spark,
        spark.createDataFrame([(1, 1.0)], "id long, v double"),
        f"{root}/f0.parquet",
    )
    _write_parquet_file(
        spark,
        spark.createDataFrame([(2, 2.0)], "id long, v double"),
        f"{root}/f1.parquet",
    )

    def info(ts, op):
        return {"commitInfo": {"timestamp": ts, "operation": op}}

    _commit(root, 0, [info(1000, "WRITE"), _PROTO, _meta(), _add("f0.parquet")])
    _commit(root, 1, [info(2000, "WRITE"), _add("f1.parquet")])

    assert delta_version_at_timestamp(spark, root, 1500) == 0
    assert delta_version_at_timestamp(spark, root, 2000) == 1
    assert delta_version_at_timestamp(spark, root, 99999) == 1
    with pytest.raises(ValueError, match="no Delta commit"):
        delta_version_at_timestamp(spark, root, 500)
    v0 = delta_version_at_timestamp(spark, root, 1500)
    assert delta_read(spark, root, v0).count() == 1

    hist = {r["version"]: r for r in delta_history(spark, root).collect()}
    assert hist[0]["timestamp"] == 1000 and hist[0]["operation"] == "WRITE"
    assert hist[1]["timestamp"] == 2000
    assert _json.loads(hist[1]["operation_parameters"]) == {}


def test_delta_read_filters_skip_files(spark, tmp_path):
    """Driver-side data skipping: add-action min/max stats and exact
    partitionValues PROVE misses, so pruned files are never scheduled;
    the result still equals a filtered full scan (row filter applied
    on survivors)."""
    from pyspark.sql import functions as F

    from simple_data_workflow_spark.sources.delta_writer import delta_write

    root = str(tmp_path / "skip")
    df = spark.range(0, 4000).select(
        F.col("id").cast("long"),
        (F.col("id") % 4).cast("string").alias("g"),
        (F.col("id") * 1.0).alias("v"),
    )
    delta_write(df.repartitionByRange(8, "id"), root, mode="error")
    flt = delta_read(spark, root, filters=[("id", "<", 500)])
    assert {r["id"] for r in flt.collect()} == set(range(500))
    assert len(flt.inputFiles()) < len(delta_read(spark, root).inputFiles())
    # partition-value skipping on a partitioned table
    root2 = str(tmp_path / "skipp")
    delta_write(df, root2, mode="error", partition_by=["g"])
    f2 = delta_read(spark, root2, filters=[("g", "==", "2"), ("id", ">=", 0)])
    assert {r["g"] for r in f2.collect()} == {"2"}
    assert f2.count() == 1000
    assert len(f2.inputFiles()) < len(delta_read(spark, root2).inputFiles())
    # isnull evidence: zero-null files prune
    f3 = delta_read(spark, root, filters=[("v", "isnull", None)])
    assert f3.count() == 0 and len(f3.inputFiles()) == 0


def test_in_commit_timestamp_resolution(spark, tmp_path):
    """Round 13: tables with the inCommitTimestamp feature (2024+
    runtimes) resolve timestampAsOf by commitInfo.inCommitTimestamp —
    the spec says it IS the commit timestamp, monotonic, preferred over
    wall-clock `timestamp`. (Writes to such tables refuse — the writer
    gate — but READS must honor the stamps.)"""
    import json as _json

    from simple_data_workflow_spark.sources.delta_reader import (
        delta_history,
        delta_version_at_timestamp,
    )
    from simple_data_workflow_spark.sources.delta_writer import delta_write

    root = str(tmp_path / "ict")
    delta_write(
        spark.createDataFrame([(1,)], "id long"), root, mode="error"
    )
    delta_write(
        spark.createDataFrame([(2,)], "id long"), root, mode="append"
    )
    # stamp ICTs that DISAGREE with the wall-clock timestamps
    for v, ict in ((0, 1_000_000), (1, 2_000_000)):
        p = f"{root}/_delta_log/{v:020d}.json"
        out = []
        for line in open(p):
            act = _json.loads(line)
            if "commitInfo" in act:
                act["commitInfo"]["inCommitTimestamp"] = ict
            out.append(_json.dumps(act))
        with open(p, "w") as f:
            f.write("\n".join(out) + "\n")
    assert delta_version_at_timestamp(spark, root, 1_500_000) == 0
    assert delta_version_at_timestamp(spark, root, 2_000_000) == 1
    hist = {r["version"]: r["timestamp"] for r in delta_history(spark, root).collect()}
    assert hist == {0: 1_000_000, 1: 2_000_000}
