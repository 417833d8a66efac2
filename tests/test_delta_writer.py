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
