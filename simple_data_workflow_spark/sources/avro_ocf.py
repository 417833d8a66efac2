"""Pure-Python Avro OBJECT CONTAINER FILE reader (round 11).

The Avro spec (avro.apache.org/docs — "Object Container Files" and
"Binary Encoding") is small enough to implement directly:

- OCF layout: magic ``Obj\\x01``, a file-metadata map (bytes values;
  carries ``avro.schema`` JSON and ``avro.codec``), a 16-byte sync
  marker, then data blocks of ``[record count: zigzag long]
  [serialized size: zigzag long][bytes][sync marker]``. Codecs:
  ``null`` and ``deflate`` (raw DEFLATE, zlib with -15 window bits).
- Binary encoding: zigzag-varint ints/longs, length-prefixed
  strings/bytes, little-endian float/double, 1-byte booleans, unions
  as ``[branch index][value]``, arrays/maps as blocks of
  ``[count][items]`` terminated by 0 (negative count = block-size
  form), records as field concatenation, enums as index, fixed as raw
  bytes.

Why it exists: ``sources.iceberg_reader`` decodes manifests through the
REFERENCE ``org.apache.avro`` jar on Spark's classpath — correct, but
only reachable where a JVM gateway exists. PySpark's Python Data Source
API plans streams in a JVM-less Python process, so the Iceberg
streaming source (``streaming/iceberg_source.py``) needs manifest
decoding in pure Python. Tests cross-pin this reader against OCFs
written by the reference Java implementation (both the writer module's
JSON-decoder path and ``DataFileWriter`` with the deflate codec), so
the two decoders cannot drift apart silently.
"""

from __future__ import annotations

import io
import json
import struct
import zlib

_MAGIC = b"Obj\x01"


class AvroOcfError(ValueError):
    """The bytes do not satisfy the Avro OCF spec."""


def _zigzag(buf: io.BufferedIOBase) -> int:
    shift, u = 0, 0
    while True:
        raw = buf.read(1)
        if not raw:
            raise AvroOcfError("truncated varint")
        b = raw[0]
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (u >> 1) ^ -(u & 1)


def _read_bytes(buf) -> bytes:
    n = _zigzag(buf)
    if n < 0:
        raise AvroOcfError("negative byte-length")
    out = buf.read(n)
    if len(out) != n:
        raise AvroOcfError("truncated bytes")
    return out


def _read_map_raw(buf) -> dict[str, bytes]:
    out: dict[str, bytes] = {}
    while True:
        n = _zigzag(buf)
        if n == 0:
            return out
        if n < 0:  # block-size form
            n = -n
            _zigzag(buf)  # byte size, unused
        for _ in range(n):
            k = _read_bytes(buf).decode("utf-8")
            out[k] = _read_bytes(buf)


def _decode(schema, buf, names: dict):
    """One datum per the writer ``schema`` node (parsed JSON)."""
    if isinstance(schema, str):
        if schema in names:
            return _decode(names[schema], buf, names)
        if schema == "null":
            return None
        if schema == "boolean":
            return buf.read(1)[0] != 0
        if schema in ("int", "long"):
            return _zigzag(buf)
        if schema == "float":
            return struct.unpack("<f", buf.read(4))[0]
        if schema == "double":
            return struct.unpack("<d", buf.read(8))[0]
        if schema == "bytes":
            return _read_bytes(buf)
        if schema == "string":
            return _read_bytes(buf).decode("utf-8")
        raise AvroOcfError(f"unknown Avro type {schema!r}")
    if isinstance(schema, list):  # union
        idx = _zigzag(buf)
        if not 0 <= idx < len(schema):
            raise AvroOcfError(f"union index {idx} out of range")
        return _decode(schema[idx], buf, names)
    t = schema.get("type")
    if t == "record":
        name = schema.get("name")
        if name:
            names[name] = schema
        out = {}
        for f in schema["fields"]:
            out[f["name"]] = _decode(f["type"], buf, names)
        return out
    if t == "array":
        items = []
        while True:
            n = _zigzag(buf)
            if n == 0:
                return items
            if n < 0:
                n = -n
                _zigzag(buf)  # block byte size
            for _ in range(n):
                items.append(_decode(schema["items"], buf, names))
    if t == "map":
        out = {}
        while True:
            n = _zigzag(buf)
            if n == 0:
                return out
            if n < 0:
                n = -n
                _zigzag(buf)
            for _ in range(n):
                k = _read_bytes(buf).decode("utf-8")
                out[k] = _decode(schema["values"], buf, names)
    if t == "enum":
        idx = _zigzag(buf)
        return schema["symbols"][idx]
    if t == "fixed":
        name = schema.get("name")
        if name:
            names[name] = schema
        return buf.read(int(schema["size"]))
    if t is not None:
        # {"type": "long", "logicalType": ...} wrapper forms
        return _decode(t, buf, names)
    raise AvroOcfError(f"unsupported Avro schema node {schema!r}")


def read_ocf(data: bytes) -> tuple[dict, list[dict]]:
    """Decode one OCF: ``(writer schema JSON, records)``."""
    buf = io.BytesIO(data)
    if buf.read(4) != _MAGIC:
        raise AvroOcfError("bad OCF magic")
    meta = _read_map_raw(buf)  # str keys, bytes values
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise AvroOcfError(f"unsupported OCF codec {codec!r}")
    sync = buf.read(16)
    records: list[dict] = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, io.SEEK_CUR)
        count = _zigzag(buf)
        size = _zigzag(buf)
        block = buf.read(size)
        if len(block) != size:
            raise AvroOcfError("truncated OCF block")
        if codec == "deflate":
            block = zlib.decompressobj(-15).decompress(block)
        bbuf = io.BytesIO(block)
        names: dict = {}
        for _ in range(count):
            records.append(_decode(schema, bbuf, names))
        if buf.read(16) != sync:
            raise AvroOcfError("OCF sync marker mismatch")
    return schema, records


def read_ocf_file(path: str) -> tuple[dict, list[dict]]:
    with open(path, "rb") as f:
        return read_ocf(f.read())
