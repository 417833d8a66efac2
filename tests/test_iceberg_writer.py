"""Jar-free Iceberg WRITE interop (round 10): create/append/overwrite
through ``sources.iceberg_writer``, round-tripped through the jar-free
reader (``sources.iceberg_reader``). The writer emits the spec's v1
metadata chain — parquet data files with ``PARQUET:field_id`` footers,
Avro manifests + manifest lists written by the REFERENCE
``org.apache.avro`` implementation, versioned ``*.metadata.json`` — so
these tests pin conformance to the PUBLIC spec, not to a runtime."""

import glob
import json

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
    # metadata chain is spec-shaped: v1 + schema ids + one snapshot
    meta = load_table_metadata(spark, root)
    assert meta["format-version"] == 1
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
