"""Delta deletion-vector decoding (round 10, ``sources.delta_dv``) +
its application in the jar-free reader. Fixtures are built with the
module's own spec-following serializers (delta.io PROTOCOL.md §
"Deletion Vectors" / RoaringFormatSpec); the Z85 codec is additionally
pinned against the ZeroMQ spec's published test vector, so encode and
decode cannot be wrong in the same direction."""

import json
import os

import numpy as np
import pytest

from simple_data_workflow_spark.sources import delta_dv as dv
from simple_data_workflow_spark.sources.delta_reader import delta_read
from simple_data_workflow_spark.sources.delta_writer import (
    delta_checkpoint,
    delta_write,
)


def test_z85_spec_vector_and_roundtrip():
    # ZeroMQ Z85 spec (rfc.zeromq.org/spec/32): this exact 8-byte
    # sequence encodes to "HelloWorld"
    data = bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
    assert dv.z85_encode(data) == "HelloWorld"
    assert dv.z85_decode("HelloWorld") == data
    rng = np.random.default_rng(3)
    blob = rng.integers(0, 256, 64, dtype=np.uint8).tobytes()
    assert dv.z85_decode(dv.z85_encode(blob)) == blob
    with pytest.raises(ValueError, match="multiple of 4"):
        dv.z85_encode(b"abc")
    with pytest.raises(ValueError, match="invalid Z85"):
        dv.z85_decode('"""""')


def test_roaring_roundtrip_array_bitmap_and_64bit_keys():
    # array containers, a dense >4096 bitmap container, and values
    # spanning several 32-bit keys (the RoaringBitmapArray dimension)
    positions = sorted(
        {1, 5, 65535, 65536, 70000}
        | set(range(200_000, 205_000))            # dense: bitmap container
        | {(3 << 32) + 7, (3 << 32) + 8, (40 << 32) + 123}
    )
    data = dv.dv_serialize(positions)
    got = dv.dv_deserialize(data)
    assert got.tolist() == positions
    with pytest.raises(ValueError, match="magic"):
        dv.dv_deserialize(b"\x00\x00\x00\x00" + data[4:])


def test_roaring_run_container_decodes():
    """The serializer never emits run containers, so hand-craft one
    (cookie 12347 + run bitset) to pin the decode path."""
    import struct

    # one container, key 0, cardinality 25: runs [5..14], [100..114]
    payload = struct.pack("<i", ((1 - 1) << 16) | 12347)
    payload += b"\x01"                      # run bitset: container 0 is runs
    payload += struct.pack("<HH", 0, 25 - 1)
    payload += struct.pack("<H", 2)         # 2 runs
    payload += struct.pack("<HH", 5, 9)     # start 5, length 9 → 5..14
    payload += struct.pack("<HH", 100, 14)  # 100..114
    data = struct.pack("<i", dv.DV_MAGIC) + struct.pack("<q", 1)
    data += struct.pack("<i", 0) + payload
    got = dv.dv_deserialize(data).tolist()
    assert got == list(range(5, 15)) + list(range(100, 115))


def _attach_dv(root, version, rel_path, positions, inline=False):
    """Commit version N+1 replacing `rel_path`'s add with one carrying
    a deletion vector (the MoR DELETE shape a Delta runtime writes)."""
    blob = dv.dv_serialize(positions)
    if inline:
        pad = (-len(blob)) % 4
        desc = {
            "storageType": "i",
            "pathOrInlineDv": dv.z85_encode(blob + b"\x00" * pad),
            "sizeInBytes": len(blob),
            "cardinality": len(positions),
        }
    else:
        fbytes, spans = dv.dv_file_bytes([blob])
        import uuid as _uuid

        u = _uuid.uuid4()
        name = f"deletion_vector_{u}.bin"
        with open(f"{root}/{name}", "wb") as f:
            f.write(fbytes)
        desc = {
            "storageType": "u",
            "pathOrInlineDv": dv.z85_encode(u.bytes),
            "offset": spans[0][0],
            "sizeInBytes": spans[0][1],
            "cardinality": len(positions),
        }
    actions = [
        {"remove": {"path": rel_path, "deletionTimestamp": 1, "dataChange": True}},
        {
            "add": {
                "path": rel_path,
                "partitionValues": {},
                "size": 1,
                "modificationTime": 1,
                "dataChange": True,
                "deletionVector": desc,
            }
        },
    ]
    with open(f"{root}/_delta_log/{version:020d}.json", "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")


def _file_rel(root):
    """The single data file's log-relative path."""
    with open(f"{root}/_delta_log/{0:020d}.json") as f:
        for line in f:
            a = json.loads(line)
            if "add" in a:
                return a["add"]["path"]
    raise AssertionError("no add in v0")


def test_delta_read_applies_uuid_and_inline_dvs(spark, tmp_path):
    for inline in (False, True):
        root = str(tmp_path / f"dv{int(inline)}")
        df = spark.createDataFrame(
            [(i, float(i)) for i in range(10)], "id long, v double"
        )
        delta_write(df.coalesce(1), root, mode="error")
        rel = _file_rel(root)
        # parquet preserves the coalesced row order → position i == id i
        _attach_dv(root, 1, rel, [1, 3, 7], inline=inline)
        got = {r["id"] for r in delta_read(spark, root).collect()}
        assert got == {0, 2, 4, 5, 6, 8, 9}
        # pre-DV snapshot still reads complete
        assert len(delta_read(spark, root, 0).collect()) == 10
        # checkpointing carries the DV descriptor VERBATIM: after the
        # pre-checkpoint JSON commits are vacuumed away, the replay
        # must still apply the deletions (dropping the descriptor
        # would silently un-delete)
        delta_checkpoint(spark, root)
        for n in os.listdir(f"{root}/_delta_log"):
            if n.endswith(".json") and n[:1] == "0":
                os.remove(f"{root}/_delta_log/{n}")
        got_cp = {r["id"] for r in delta_read(spark, root).collect()}
        assert got_cp == {0, 2, 4, 5, 6, 8, 9}


def test_delta_dv_corruption_raises(spark, tmp_path):
    root = str(tmp_path / "dvbad")
    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], "id long, v double")
    delta_write(df.coalesce(1), root, mode="error")
    rel = _file_rel(root)
    _attach_dv(root, 1, rel, [0])
    # flip a byte inside the sidecar payload → CRC must catch it
    name = [n for n in os.listdir(root) if n.startswith("deletion_vector_")][0]
    with open(f"{root}/{name}", "r+b") as f:
        f.seek(9)
        b = f.read(1)
        f.seek(9)
        f.write(bytes([b[0] ^ 0xFF]))
    with pytest.raises(ValueError, match="checksum|magic"):
        delta_read(spark, root).collect()


def test_dv_cardinality_mismatch_raises(spark, tmp_path):
    root = str(tmp_path / "dvcard")
    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], "id long, v double")
    delta_write(df.coalesce(1), root, mode="error")
    rel = _file_rel(root)
    blob = dv.dv_serialize([0, 1])
    pad = (-len(blob)) % 4
    desc = {
        "storageType": "i",
        "pathOrInlineDv": dv.z85_encode(blob + b"\x00" * pad),
        "sizeInBytes": len(blob),
        "cardinality": 5,  # wrong on purpose
    }
    with open(f"{root}/_delta_log/{1:020d}.json", "w") as f:
        f.write(
            json.dumps(
                {
                    "add": {
                        "path": rel,
                        "partitionValues": {},
                        "size": 1,
                        "modificationTime": 1,
                        "dataChange": True,
                        "deletionVector": desc,
                    }
                }
            )
            + "\n"
        )
    with pytest.raises(ValueError, match="cardinality"):
        delta_read(spark, root).collect()


def test_dv_sidecar_crc_full_unsigned_32bit():
    """The sidecar checksum is the FULL unsigned 32-bit CRC-32 (4-byte
    big-endian), not a sign-masked 31-bit value: ~half of real
    runtimes' sidecars have the top CRC bit set and a 31-bit compare
    would spuriously reject them (ADVICE r10 medium)."""
    import struct
    import zlib

    # find a payload whose CRC32 has the top bit set
    blob = pos = None
    for i in range(512):
        cand = dv.dv_serialize([i, i + 7])
        if zlib.crc32(cand) & 0x80000000:
            blob, pos = cand, [i, i + 7]
            break
    assert blob is not None
    raw, spans = dv.dv_file_bytes([blob])
    offset, size = spans[0]
    (stored,) = struct.unpack_from(">I", raw, offset + 4 + size)
    assert stored == zlib.crc32(blob) & 0xFFFFFFFF  # full 32 bits kept
    got = dv.read_dv_positions(
        lambda p: raw,
        "/tmp",
        {
            "storageType": "p",
            "pathOrInlineDv": "x",
            "offset": offset,
            "sizeInBytes": size,
            "cardinality": 2,
        },
    )
    assert list(got) == pos


def test_dml_on_dv_table_rewrites_masked_rows(spark, tmp_path):
    """Round 11: CoW DML on a DV-carrying table (refusal lifted) — the
    rewrite reads the DV-MASKED view, so rows the DV already deleted
    stay deleted, and the affected file's remove drops its DV."""
    from simple_data_workflow_spark.sources.delta_writer import (
        delta_delete,
        delta_update,
    )

    root = str(tmp_path / "dvdml")
    delta_write(
        spark.createDataFrame(
            [(i, float(i)) for i in range(10)], "id long, v double"
        ).coalesce(1),
        root,
        mode="error",
    )
    rel = _file_rel(root)
    _attach_dv(root, 1, rel, [1, 3, 7])
    delta_delete(spark, root, "id >= 8")
    got = {r["id"] for r in delta_read(spark, root).collect()}
    assert got == {0, 2, 4, 5, 6}  # DV deletions survive the rewrite
    # the rewritten snapshot carries no DV descriptors anymore
    from simple_data_workflow_spark.sources.delta_reader import (
        delta_snapshot_files,
    )

    _files, dvs, _sch, _pc = delta_snapshot_files(spark, root)
    assert not dvs
    delta_update(spark, root, {"v": "v + 100.0"}, "id = 0")
    got = {(r["id"], r["v"]) for r in delta_read(spark, root).collect()}
    assert got == {(0, 100.0), (2, 2.0), (4, 4.0), (5, 5.0), (6, 6.0)}


def test_delta_delete_writes_deletion_vectors(spark, tmp_path):
    """Round 11 (VERDICT r10 #6): delta_delete(strategy='dv') publishes
    a roaring sidecar + remove/re-add actions instead of rewriting
    files; both this repo's reader and the front door apply it, stacked
    DV deletes merge positions, and the protocol upgrades to
    readerVersion 3 with the deletionVectors feature."""
    import glob as _glob

    from simple_data_workflow_spark.sources import lakehouse
    from simple_data_workflow_spark.sources.delta_reader import (
        delta_snapshot_files,
    )
    from simple_data_workflow_spark.sources.delta_writer import delta_delete

    root = str(tmp_path / "dvw")
    delta_write(
        spark.createDataFrame(
            [(i, float(i)) for i in range(20)], "id long, v double"
        ).coalesce(1),
        root,
        mode="error",
    )
    data_files = sorted(_glob.glob(f"{root}/*.parquet"))
    sizes = {f: os.path.getsize(f) for f in data_files}

    v = delta_delete(spark, root, "id % 3 = 0", strategy="dv")
    # data files byte-identical (merge-on-read), sidecar exists
    assert {f: os.path.getsize(f) for f in data_files} == sizes
    assert _glob.glob(f"{root}/deletion_vector_*.bin")
    got = {r["id"] for r in delta_read(spark, root).collect()}
    assert got == {i for i in range(20) if i % 3 != 0}
    # pre-delete snapshot intact; front door agrees
    assert delta_read(spark, root, v - 1).count() == 20
    front = {r["id"] for r in lakehouse.read_table(spark, "delta", root).collect()}
    assert front == got
    # protocol upgraded with the feature
    with open(f"{root}/_delta_log/{v:020d}.json") as f:
        acts = [json.loads(l) for l in f if l.strip()]
    proto = next(a["protocol"] for a in acts if "protocol" in a)
    assert proto["minReaderVersion"] == 3
    assert "deletionVectors" in proto["readerFeatures"]

    # stacked DV delete merges with the existing positions
    delta_delete(spark, root, "id = 1", strategy="dv")
    got = {r["id"] for r in delta_read(spark, root).collect()}
    assert got == {i for i in range(20) if i % 3 != 0 and i != 1}
    _files, dvs, _s, _p = delta_snapshot_files(spark, root)
    assert len(dvs) == 1
    assert dvs[list(dvs)[0]]["cardinality"] == 8  # 7 multiples of 3 + id 1

    # no-match DV delete: metadata no-op
    before = delta_delete(spark, root, "id > 1000", strategy="dv")
    assert delta_delete(spark, root, "id > 1000", strategy="dv") == before

    # CoW DML on the DV-carrying table still composes (round-11 lift):
    # the rewrite consumes the DV-masked view
    from simple_data_workflow_spark.sources.delta_writer import delta_update

    delta_update(spark, root, {"v": "v * 0.0"}, "id = 2")
    got = {(r["id"], r["v"]) for r in delta_read(spark, root).collect()}
    assert (2, 0.0) in got and len(got) == 12


def test_delta_delete_auto_strategy_picks_dv_when_wide_and_sparse(
    spark, tmp_path
):
    """auto: a WIDE + SPARSE delete (many files, few matched rows per
    file) writes DVs; a WIDE + DENSE delete rewrites (the files should
    shrink); a narrow delete keeps the copy-on-write path."""
    from simple_data_workflow_spark.sources.delta_reader import (
        delta_snapshot_files,
    )
    from simple_data_workflow_spark.sources.delta_writer import delta_delete

    root = str(tmp_path / "dvauto")
    # ~16 files, a few rows each
    delta_write(
        spark.createDataFrame(
            [(i, float(i)) for i in range(160)], "id long, v double"
        ).repartition(16),
        root,
        mode="error",
    )
    delta_delete(spark, root, "id % 10 = 0")  # wide (16 files), 10% → DV
    _files, dvs, _s, _p = delta_snapshot_files(spark, root)
    assert dvs  # auto picked the merge-on-read path
    got = {r["id"] for r in delta_read(spark, root).collect()}
    assert got == {i for i in range(160) if i % 10 != 0}

    # wide but DENSE: rewrite, no new DV debt (old DVs materialize
    # into the rewritten files)
    delta_delete(spark, root, "id < 150")
    _files, dvs, _s, _p = delta_snapshot_files(spark, root)
    assert not dvs
    got = {r["id"] for r in delta_read(spark, root).collect()}
    # 150 fell to the FIRST delete (150 % 10 == 0)
    assert got == {151, 152, 153, 154, 155, 156, 157, 158, 159}
    # narrow delete on a fresh table: rewrite path, no DVs
    root2 = str(tmp_path / "dvauto2")
    delta_write(
        spark.createDataFrame(
            [(i, float(i)) for i in range(16)], "id long, v double"
        ).coalesce(1),
        root2,
        mode="error",
    )
    delta_delete(spark, root2, "id = 3")
    _files2, dvs2, _s2, _p2 = delta_snapshot_files(spark, root2)
    assert not dvs2
    assert delta_read(spark, root2).count() == 15


def test_dv_dml_executor_side_sidecars(spark, tmp_path, monkeypatch):
    """Round 12 (VERDICT r11 #1): above ``_DV_EXEC_SIDECAR_MIN`` matched
    rows, ``_dv_dml`` serializes and writes the roaring sidecars from
    the EXECUTORS (one sidecar per affected file via applyInPandas) and
    the driver collects only descriptor rows — matched positions never
    reach the driver. Forced here by dropping the threshold; results
    must be indistinguishable from the packed-driver path, including
    merging with a pre-existing DV and time travel."""
    import glob as _glob

    from simple_data_workflow_spark.sources import delta_writer as dw
    from simple_data_workflow_spark.sources.delta_reader import (
        delta_snapshot_files,
    )
    from simple_data_workflow_spark.sources.delta_writer import (
        delta_delete,
        delta_update,
    )

    root = str(tmp_path / "dvexec")
    delta_write(
        spark.createDataFrame(
            [(i, float(i)) for i in range(400)], "id long, v double"
        ).repartition(4),
        root,
        mode="error",
    )
    # a packed-path DV first, so the executor path must MERGE with it
    delta_delete(spark, root, "id = 7", strategy="dv")
    assert len(_glob.glob(f"{root}/deletion_vector_*.bin")) == 1

    monkeypatch.setattr(dw, "_DV_EXEC_SIDECAR_MIN", 10)
    delta_delete(spark, root, "id % 3 = 0", strategy="dv")  # 134 matches
    # one NEW sidecar per affected file (4 files), not one shared
    files, dvs, _s, _p = delta_snapshot_files(spark, root)
    assert len(dvs) == 4
    assert len(_glob.glob(f"{root}/deletion_vector_*.bin")) >= 1 + 4
    paths = {d["pathOrInlineDv"] for d in dvs.values()}
    assert len(paths) == 4  # per-file uuids, no shared sidecar
    got = {r["id"] for r in delta_read(spark, root).collect()}
    assert got == {i for i in range(400) if i % 3 != 0 and i != 7}
    assert sum(d["cardinality"] for d in dvs.values()) == 134 + 1

    # UPDATE through the executor path: dead rows + re-staged rows in
    # one commit, stacked on the existing per-file DVs
    delta_update(spark, root, {"v": "v + 1000.0"}, "id % 3 = 1", strategy="dv")
    rows = {(r["id"], r["v"]) for r in delta_read(spark, root).collect()}
    expect = {
        (i, float(i) + (1000.0 if i % 3 == 1 else 0.0))
        for i in range(400)
        if i % 3 != 0 and i != 7
    }
    assert rows == expect
    # time travel: pre-update snapshot still reads through its own DVs
    v_now = max(
        int(os.path.basename(p).split(".")[0])
        for p in _glob.glob(f"{root}/_delta_log/*.json")
    )
    prev = {r["id"] for r in delta_read(spark, root, v_now - 1).collect()}
    assert prev == got


def test_dv_dml_executor_sidecars_scheme_root(spark, tmp_path, monkeypatch):
    """Round 13 (VERDICT r12 #2): the executor sidecar path gates on
    matched-row COUNT only — a scheme'd root (the object-store
    posture) writes its sidecars worker-side through ``pyarrow.fs``
    instead of falling back to the packed driver transfer.
    ``file://`` stands in for the scheme'd case reachable in this
    sandbox; the remote-scheme branch differs only in taking
    ``pyarrow.fs.FileSystem.from_uri`` instead of a local ``open``."""
    from simple_data_workflow_spark.sources import delta_writer as dw
    from simple_data_workflow_spark.sources.delta_reader import (
        delta_snapshot_files,
    )
    from simple_data_workflow_spark.sources.delta_writer import delta_delete

    root = "file://" + str(tmp_path / "dvexec_scheme")
    delta_write(
        spark.createDataFrame(
            [(i, float(i)) for i in range(300)], "id long, v double"
        ).repartition(3),
        root,
        mode="error",
    )
    monkeypatch.setattr(dw, "_DV_EXEC_SIDECAR_MIN", 10)
    delta_delete(spark, root, "id % 2 = 0", strategy="dv")  # 150 matches
    _files, dvs, _s, _p = delta_snapshot_files(spark, root)
    assert len(dvs) == 3
    # per-file sidecar uuids prove the EXECUTOR path ran (the packed
    # fallback would share one sidecar across all files)
    assert len({d["pathOrInlineDv"] for d in dvs.values()}) == 3
    got = {r["id"] for r in delta_read(spark, root).collect()}
    assert got == {i for i in range(300) if i % 2 == 1}
