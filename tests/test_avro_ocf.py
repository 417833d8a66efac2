"""Pure-Python Avro OCF reader (round 11, ``sources.avro_ocf``):
cross-pinned against files written by the REFERENCE org.apache.avro
implementation on Spark's classpath — the two decoders (this one and
the JVM one the batch Iceberg reader uses) cannot drift apart
silently."""

import json

import pytest

from simple_data_workflow_spark.sources.avro_ocf import (
    AvroOcfError,
    read_ocf,
    read_ocf_file,
)

_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "t",
        "fields": [
            {"name": "s", "type": "string"},
            {"name": "n", "type": ["null", "long"], "default": None},
            {"name": "x", "type": "double"},
            {"name": "b", "type": "boolean"},
            {"name": "arr", "type": {"type": "array", "items": "int"}},
            {
                "name": "nested",
                "type": {
                    "type": "record",
                    "name": "inner",
                    "fields": [
                        {"name": "k", "type": ["null", "string"], "default": None}
                    ],
                },
            },
            {"name": "m", "type": {"type": "map", "values": "long"}},
        ],
    }
)

_ROWS = [
    {
        "s": "hello",
        "n": -1234567890123,
        "x": 1.5,
        "b": True,
        "arr": [1, -2, 3],
        "nested": {"k": "v"},
        "m": {"a": 1, "b": 2},
    },
    {
        "s": "",
        "n": None,
        "x": -0.25,
        "b": False,
        "arr": [],
        "nested": {"k": None},
        "m": {},
    },
]


def _write_reference_ocf(spark, path, codec=None):
    """Write via the reference Java implementation (jsonDecoder path —
    the same writer the Iceberg modules use)."""
    jvm = spark._jvm
    schema = jvm.org.apache.avro.Schema.Parser().parse(_SCHEMA)
    reader = jvm.org.apache.avro.generic.GenericDatumReader(schema)

    def to_rec(d):
        dec = jvm.org.apache.avro.io.DecoderFactory.get().jsonDecoder(
            schema, json.dumps(d)
        )
        return reader.read(None, dec)

    w = jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    fw = jvm.org.apache.avro.file.DataFileWriter(w)
    if codec:
        fw.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(3))
    fw.create(schema, jvm.java.io.File(path))
    for r in _ROWS:
        # Avro JSON encoding wraps union values
        d = dict(r)
        if d["n"] is not None:
            d = {**d, "n": {"long": d["n"]}}
        nk = d["nested"]["k"]
        d["nested"] = {"k": {"string": nk} if nk is not None else None}
        fw.append(to_rec(d))
    fw.close()


@pytest.mark.parametrize("codec", [None, "deflate"])
def test_ocf_reader_matches_reference_writer(spark, tmp_path, codec):
    path = str(tmp_path / f"ref-{codec}.avro")
    _write_reference_ocf(spark, path, codec=codec)
    schema, records = read_ocf_file(path)
    assert schema["name"] == "t"
    assert records == _ROWS


def test_ocf_reader_reads_iceberg_manifests(spark, tmp_path):
    """The real target: a manifest list written by iceberg_writer
    decodes to the same entries the JVM reader sees."""
    from simple_data_workflow_spark.sources.iceberg_reader import (
        _avro_records,
        _get,
        _j2py,
        load_table_metadata,
    )
    from simple_data_workflow_spark.sources.iceberg_writer import (
        iceberg_write,
    )

    root = str(tmp_path / "ice")
    iceberg_write(
        spark.createDataFrame([(1, 1.0), (2, 2.0)], "id long, v double"),
        root,
        mode="error",
    )
    meta = load_table_metadata(spark, root)
    mlist = meta["snapshots"][0]["manifest-list"]
    _schema, recs = read_ocf_file(mlist)
    via_jvm = [
        (
            _j2py(_get(r, "manifest_path")),
            int(_get(r, "manifest_length")),
            int(_get(r, "sequence_number")),
        )
        for r in _avro_records(spark, mlist)
    ]
    via_py = [
        (r["manifest_path"], r["manifest_length"], r["sequence_number"])
        for r in recs
    ]
    assert via_py == via_jvm
    # ...and the manifest itself (nested data_file record, unions)
    _s2, entries = read_ocf_file(recs[0]["manifest_path"])
    assert all(e["status"] == 1 for e in entries)
    assert all(e["data_file"]["content"] == 0 for e in entries)
    assert sum(e["data_file"]["record_count"] for e in entries) == 2


def test_ocf_reader_rejects_garbage():
    with pytest.raises(AvroOcfError, match="magic"):
        read_ocf(b"NOPE" + b"\x00" * 64)
