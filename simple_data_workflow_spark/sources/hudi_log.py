"""Hudi merge-on-read LOG FILE codec (round 11) — pure Python, both
directions, jar-free.

The Hudi log-file format is publicly documented (hudi.apache.org
"Technical Specification" § Log File Format): a log file is a sequence
of LOG BLOCKS, each laid out as

    magic               6 bytes   ``#HUDI#``
    logblock length     8 bytes   big-endian long — bytes that follow,
                                  up to and including the trailing
                                  total-length field
    version             4 bytes   log block format version
    type                4 bytes   block type ordinal
    header length       8 bytes   + header map bytes
    content length      8 bytes   + content bytes
    footer length       8 bytes   + footer map bytes
    total block length  8 bytes   whole block incl. magic (reverse
                                  traversal support)

Header/footer maps serialize as ``[n: int4]`` then per entry
``[metadata-type ordinal: int4][value length: int4][utf-8 bytes]``.
Metadata types used here: INSTANT_TIME(0), TARGET_INSTANT_TIME(1),
SCHEMA(2), COMMAND_BLOCK_TYPE(3). Block type ordinals:
COMMAND_BLOCK(0), DELETE_BLOCK(1), CORRUPT_BLOCK(2),
AVRO_DATA_BLOCK(3), HFILE_DATA_BLOCK(4), PARQUET_DATA_BLOCK(5).

Content encodings implemented:

- AVRO_DATA_BLOCK: ``[format version: int4][record count: int4]`` then
  per record ``[size: int4][Avro binary record]``; the writer schema
  rides in the SCHEMA header entry. Records decode with the flat-record
  Avro BINARY codec below (zigzag varints, length-prefixed strings —
  the Avro spec's binary encoding) — nested record/array/map schemas
  refuse loudly rather than misread.
- DELETE_BLOCK: ``[version: int4][count: int4]`` then per key
  ``[size: int4][utf-8 record key]``. Delete blocks whose content does
  not satisfy this self-consistent framing (e.g. Kryo-serialized keys
  from some Hudi runtimes) refuse loudly — decoding them needs the
  runtime jar.
- COMMAND_BLOCK: rollback markers — parsed (TARGET_INSTANT_TIME header)
  so replay can skip rolled-back blocks.

Everything here is plain-bytes in/out, so the executor-side
``mapInPandas`` scan in ``hudi_reader`` can decode blocks where the
data lives — nothing data-sized crosses the driver.
"""

from __future__ import annotations

import io
import json
import struct

MAGIC = b"#HUDI#"

# block type ordinals
COMMAND_BLOCK = 0
DELETE_BLOCK = 1
CORRUPT_BLOCK = 2
AVRO_DATA_BLOCK = 3
HFILE_DATA_BLOCK = 4
PARQUET_DATA_BLOCK = 5

# header metadata-type ordinals
INSTANT_TIME = 0
TARGET_INSTANT_TIME = 1
SCHEMA = 2
COMMAND_BLOCK_TYPE = 3

LOG_FORMAT_VERSION = 1


class HudiLogCorrupt(ValueError):
    """The log bytes do not satisfy the documented framing."""


# ---------------------------------------------------------------------------
# header/footer maps
# ---------------------------------------------------------------------------


def _encode_meta(meta: dict[int, str]) -> bytes:
    out = struct.pack(">i", len(meta))
    for k in sorted(meta):
        v = meta[k].encode("utf-8")
        out += struct.pack(">ii", int(k), len(v)) + v
    return out


def _decode_meta(data: bytes) -> dict[int, str]:
    if not data:
        return {}
    (n,) = struct.unpack_from(">i", data, 0)
    pos, out = 4, {}
    for _ in range(n):
        k, ln = struct.unpack_from(">ii", data, pos)
        pos += 8
        out[k] = data[pos : pos + ln].decode("utf-8")
        pos += ln
    return out


# ---------------------------------------------------------------------------
# block framing
# ---------------------------------------------------------------------------


def encode_block(
    block_type: int, header: dict[int, str], content: bytes
) -> bytes:
    """One spec-shaped log block (empty footer)."""
    h = _encode_meta(header)
    f = _encode_meta({})
    body = struct.pack(">ii", LOG_FORMAT_VERSION, block_type)
    body += struct.pack(">q", len(h)) + h
    body += struct.pack(">q", len(content)) + content
    body += struct.pack(">q", len(f)) + f
    # logblock length counts everything after itself incl. the trailing
    # total-length; total length covers the whole block incl. magic
    total = len(MAGIC) + 8 + len(body) + 8
    return MAGIC + struct.pack(">q", len(body) + 8) + body + struct.pack(
        ">q", total
    )


def decode_blocks(data: bytes) -> list[dict]:
    """All blocks of one log file:
    ``{type, header, footer, content, version}`` dicts, in file order."""
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos : pos + 6] != MAGIC:
            raise HudiLogCorrupt(
                f"bad log magic at offset {pos}: {data[pos:pos+6]!r}"
            )
        pos += 6
        (blen,) = struct.unpack_from(">q", data, pos)
        pos += 8
        end = pos + blen
        if end > n:
            raise HudiLogCorrupt("log block length overruns the file")
        version, btype = struct.unpack_from(">ii", data, pos)
        p = pos + 8
        (hlen,) = struct.unpack_from(">q", data, p)
        p += 8
        header = _decode_meta(data[p : p + hlen])
        p += hlen
        (clen,) = struct.unpack_from(">q", data, p)
        p += 8
        content = data[p : p + clen]
        p += clen
        (flen,) = struct.unpack_from(">q", data, p)
        p += 8
        footer = _decode_meta(data[p : p + flen])
        p += flen
        (tlen,) = struct.unpack_from(">q", data, p)
        p += 8
        if p != end:
            raise HudiLogCorrupt("log block framing mismatch")
        if tlen != blen + 14:
            raise HudiLogCorrupt("log block total-length mismatch")
        out.append(
            {
                "type": btype,
                "version": version,
                "header": header,
                "footer": footer,
                "content": content,
            }
        )
        pos = end
    return out


# ---------------------------------------------------------------------------
# flat-record Avro BINARY codec (Avro spec § binary encoding)
# ---------------------------------------------------------------------------


def _zigzag_encode(v: int) -> bytes:
    u = (v << 1) ^ (v >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: io.BytesIO) -> int:
    shift, u = 0, 0
    while True:
        raw = buf.read(1)
        if not raw:
            raise HudiLogCorrupt("truncated varint in Avro binary")
        b = raw[0]
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (u >> 1) ^ -(u & 1)


def _flat_fields(schema: dict) -> list[tuple[str, str]]:
    """``[(name, primitive type)]`` — unions ``["null", prim]`` allowed;
    anything nested refuses."""
    if schema.get("type") != "record":
        raise HudiLogCorrupt("Avro data block schema is not a record")
    out = []
    for f in schema["fields"]:
        t = f["type"]
        if isinstance(t, list):
            branches = [b for b in t if b != "null"]
            if len(branches) != 1 or not isinstance(branches[0], str):
                raise HudiLogCorrupt(
                    f"field {f['name']!r}: only [null, primitive] unions "
                    "decode jar-free"
                )
            out.append((f["name"], f"?{branches[0]}"))
        elif isinstance(t, str):
            out.append((f["name"], t))
        else:
            raise HudiLogCorrupt(
                f"field {f['name']!r}: nested Avro type {t!r} needs the "
                "Hudi runtime to decode"
            )
    return out


_PRIM_READERS = {
    "string": lambda b: b.read(max(_zigzag_decode_i(b), 0)).decode("utf-8"),
    "bytes": lambda b: b.read(max(_zigzag_decode_i(b), 0)),
    "long": lambda b: _zigzag_decode(b),
    "int": lambda b: _zigzag_decode(b),
    "boolean": lambda b: b.read(1)[0] != 0,
    "float": lambda b: struct.unpack("<f", b.read(4))[0],
    "double": lambda b: struct.unpack("<d", b.read(8))[0],
    "null": lambda b: None,
}


def _zigzag_decode_i(buf) -> int:
    return _zigzag_decode(buf)


def decode_avro_records(schema_json: str, blobs: list[bytes]) -> list[dict]:
    """Decode flat Avro binary records with the writer schema."""
    fields = _flat_fields(json.loads(schema_json))
    out = []
    for blob in blobs:
        buf = io.BytesIO(blob)
        rec = {}
        for name, t in fields:
            if t.startswith("?"):
                idx = _zigzag_decode(buf)
                # union order is ["null", prim]
                rec[name] = (
                    None if idx == 0 else _PRIM_READERS[t[1:]](buf)
                )
            else:
                rec[name] = _PRIM_READERS[t](buf)
        out.append(rec)
    return out


def _encode_prim(t: str, v) -> bytes:
    if t == "string":
        b = v.encode("utf-8")
        return _zigzag_encode(len(b)) + b
    if t == "bytes":
        return _zigzag_encode(len(v)) + v
    if t in ("long", "int"):
        return _zigzag_encode(int(v))
    if t == "boolean":
        return b"\x01" if v else b"\x00"
    if t == "float":
        return struct.pack("<f", float(v))
    if t == "double":
        return struct.pack("<d", float(v))
    if t == "null":
        return b""
    raise HudiLogCorrupt(f"cannot encode Avro type {t!r}")


def encode_avro_records(schema_json: str, rows: list[dict]) -> list[bytes]:
    """Encode flat records as Avro binary (fixture/writer side)."""
    fields = _flat_fields(json.loads(schema_json))
    out = []
    for row in rows:
        buf = bytearray()
        for name, t in fields:
            v = row.get(name)
            if t.startswith("?"):
                if v is None:
                    buf += _zigzag_encode(0)
                else:
                    buf += _zigzag_encode(1) + _encode_prim(t[1:], v)
            else:
                buf += _encode_prim(t, v)
        out.append(bytes(buf))
    return out


# ---------------------------------------------------------------------------
# block content encodings
# ---------------------------------------------------------------------------

_DATA_BLOCK_CONTENT_VERSION = 3
_DELETE_BLOCK_CONTENT_VERSION = 1


def encode_avro_data_block(
    instant: str, schema_json: str, rows: list[dict]
) -> bytes:
    blobs = encode_avro_records(schema_json, rows)
    parts = [struct.pack(">ii", _DATA_BLOCK_CONTENT_VERSION, len(blobs))]
    for b in blobs:
        parts.append(struct.pack(">i", len(b)))
        parts.append(b)
    content = b"".join(parts)
    return encode_block(
        AVRO_DATA_BLOCK,
        {INSTANT_TIME: instant, SCHEMA: schema_json},
        content,
    )


def decode_avro_data_block(block: dict) -> list[dict]:
    schema_json = block["header"].get(SCHEMA)
    if not schema_json:
        raise HudiLogCorrupt("Avro data block without SCHEMA header")
    data = block["content"]
    _v, n = struct.unpack_from(">ii", data, 0)
    pos, blobs = 8, []
    for _ in range(n):
        (ln,) = struct.unpack_from(">i", data, pos)
        pos += 4
        blobs.append(data[pos : pos + ln])
        pos += ln
    if pos != len(data):
        raise HudiLogCorrupt("Avro data block content framing mismatch")
    return decode_avro_records(schema_json, blobs)


def encode_delete_block(instant: str, keys: list[str]) -> bytes:
    parts = [struct.pack(">ii", _DELETE_BLOCK_CONTENT_VERSION, len(keys))]
    for k in keys:
        b = k.encode("utf-8")
        parts.append(struct.pack(">i", len(b)))
        parts.append(b)
    return encode_block(DELETE_BLOCK, {INSTANT_TIME: instant}, b"".join(parts))


# ---------------------------------------------------------------------------
# Kryo-serialized delete keys (round 12, VERDICT r11 #5)
#
# Hudi runtime writers serialize DELETE_BLOCK keys through
# SerializationUtils (shaded Kryo, registrationRequired=false,
# references off): ``kryo.writeClassAndObject(out, HoodieKey[])``.
# The COMMON case is a fixed preamble + per-key tag + two strings:
#
# - class tag: varint 1 (``NAME``), varint nameId 0, then the array
#   class name ``[Lorg.apache.hudi.common.model.HoodieKey;`` as a Kryo
#   string — FIXED bytes for this payload shape;
# - array length + 1 as a varint (ObjectArraySerializer);
# - per element: varint 1 + varint nameId (1 — the element class is
#   named once, the first element carries the name string), then the
#   FieldSerializer fields in alphabetical order: ``partitionPath``,
#   ``recordKey`` — each a Kryo string (ASCII strings pack the chars
#   raw with bit 8 set on the LAST byte; non-ASCII/short strings use
#   a UTF8-length header: first byte has bit 8 set, bit 7 continues
#   the varint, value = char count + 1; 0x80 alone encodes null and
#   0x81 the empty string).
#
# Anything outside this shape (custom payload classes, DeleteRecord
# with ordering values, reference-tracking streams) still refuses
# loudly — decoding it by guesswork could resurrect or over-delete
# rows.
# ---------------------------------------------------------------------------

_KRYO_HOODIE_KEY_ARRAY = "[Lorg.apache.hudi.common.model.HoodieKey;"
_KRYO_HOODIE_KEY = "org.apache.hudi.common.model.HoodieKey"
_KRYO_DELETE_RECORD_ARRAY = "[Lorg.apache.hudi.common.model.DeleteRecord;"
_KRYO_DELETE_RECORD = "org.apache.hudi.common.model.DeleteRecord"
# Kryo's default registrations give String class id 1; writeClass
# emits registered ids + 2, so a String orderingValue tags as 3
_KRYO_STRING_TAG = 3


def _kryo_write_varint(v: int) -> bytes:
    out = bytearray()
    while True:
        if v & ~0x7F:
            out.append((v & 0x7F) | 0x80)
            v >>= 7
        else:
            out.append(v)
            return bytes(out)


def _kryo_read_varint(data: bytes, pos: int) -> tuple[int, int]:
    v, shift = 0, 0
    while True:
        if pos >= len(data):
            raise HudiLogCorrupt("Kryo varint truncated")
        b = data[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, pos
        shift += 7
        if shift > 35:
            raise HudiLogCorrupt("Kryo varint too long")


def _kryo_write_string(s: str | None) -> bytes:
    if s is None:
        return b"\x80"
    if s == "":
        return b"\x81"
    if len(s) > 1 and all(ord(c) < 128 for c in s):
        b = bytearray(s.encode("ascii"))
        b[-1] |= 0x80
        return bytes(b)
    # UTF8-length header: varint of (charCount + 1); first byte flags
    # 0x80 = "length follows", 0x40 = continuation
    n = len(s) + 1
    out = bytearray()
    if n >> 6 == 0:
        out.append(n | 0x80)
    elif n >> 13 == 0:
        out.append((n & 0x3F) | 0x40 | 0x80)
        out.append((n >> 6) & 0xFF)
    elif n >> 20 == 0:
        out.append((n & 0x3F) | 0x40 | 0x80)
        out.append(((n >> 6) & 0x7F) | 0x80)
        out.append((n >> 13) & 0xFF)
    else:
        raise ValueError("string too long for the Kryo codec")
    return bytes(out) + s.encode("utf-8")


def _kryo_read_string(data: bytes, pos: int) -> tuple[str | None, int]:
    if pos >= len(data):
        raise HudiLogCorrupt("Kryo string truncated")
    b = data[pos]
    if b & 0x80:
        # UTF8-length header
        n = b & 0x3F
        pos += 1
        if b & 0x40:
            if pos >= len(data):
                raise HudiLogCorrupt("Kryo string length truncated")
            b2 = data[pos]
            n |= (b2 & 0x7F) << 6
            pos += 1
            if b2 & 0x80:
                if pos >= len(data):
                    raise HudiLogCorrupt("Kryo string length truncated")
                b3 = data[pos]
                if b3 & 0x80:
                    raise HudiLogCorrupt(
                        "Kryo string longer than the codec supports"
                    )
                n |= (b3 & 0x7F) << 13
                pos += 1
        if n == 0:
            return None, pos
        if n == 1:
            return "", pos
        chars = n - 1
        # chars, not bytes: decode incrementally (ASCII-dominant keys
        # decode in one slice; multi-byte tails walk)
        raw = data[pos:]
        try:
            s = raw[:chars].decode("utf-8")
            if len(s) == chars:
                return s, pos + chars
        except UnicodeDecodeError:
            pass
        out, taken = [], 0
        while len(out) < chars:
            for w in (1, 2, 3, 4):
                try:
                    out.append(raw[taken : taken + w].decode("utf-8"))
                    taken += w
                    break
                except UnicodeDecodeError:
                    continue
            else:
                raise HudiLogCorrupt("Kryo UTF8 string undecodable")
        return "".join(out), pos + taken
    # ASCII mode: bytes until one with bit 8 set (inclusive)
    j = pos
    while j < len(data) and not data[j] & 0x80:
        j += 1
    if j >= len(data):
        raise HudiLogCorrupt("Kryo ASCII string unterminated")
    return (
        data[pos:j].decode("ascii") + chr(data[j] & 0x7F),
        j + 1,
    )


def encode_kryo_delete_payload(keys: list[tuple[str, str]]) -> bytes:
    """Serialize ``[(partitionPath, recordKey), ...]`` exactly as
    Hudi's SerializationUtils Kryo stream does for ``HoodieKey[]``
    (fixture builder; the decoder below is the product)."""
    out = bytearray()
    out += _kryo_write_varint(1)  # class tag: NAME
    out += _kryo_write_varint(0)  # nameId 0 (first named class)
    out += _kryo_write_string(_KRYO_HOODIE_KEY_ARRAY)
    out += _kryo_write_varint(len(keys) + 1)
    for i, (part, rec) in enumerate(keys):
        out += _kryo_write_varint(1)  # NAME tag
        out += _kryo_write_varint(1)  # nameId 1 = HoodieKey
        if i == 0:
            out += _kryo_write_string(_KRYO_HOODIE_KEY)
        out += _kryo_write_string(part)
        out += _kryo_write_string(rec)
    return bytes(out)


def encode_kryo_delete_records(
    keys: list[tuple[str, str]], ordering: list | None = None
) -> bytes:
    """Serialize ``[(partitionPath, recordKey), ...]`` as a Kryo
    ``DeleteRecord[]`` — the 1.x stock-payload delete shape
    (``OverwriteWithLatestAvroPayload`` / ``DefaultHoodieRecordPayload``
    tables): each element carries a nested ``HoodieKey`` plus an
    ``orderingValue`` (null, or a String at Kryo's default String
    registration). Fixture builder; the decoder below is the product."""
    out = bytearray()
    out += _kryo_write_varint(1)  # class tag: NAME
    out += _kryo_write_varint(0)  # nameId 0 (first named class)
    out += _kryo_write_string(_KRYO_DELETE_RECORD_ARRAY)
    out += _kryo_write_varint(len(keys) + 1)
    for i, (part, rec) in enumerate(keys):
        out += _kryo_write_varint(1)  # NAME tag (element class)
        out += _kryo_write_varint(1)  # nameId 1 = DeleteRecord
        if i == 0:
            out += _kryo_write_string(_KRYO_DELETE_RECORD)
        # FieldSerializer, alphabetical: hoodieKey, orderingValue
        out += _kryo_write_varint(1)  # NAME tag (field class)
        out += _kryo_write_varint(2)  # nameId 2 = HoodieKey
        if i == 0:
            out += _kryo_write_string(_KRYO_HOODIE_KEY)
        out += _kryo_write_string(part)
        out += _kryo_write_string(rec)
        ov = ordering[i] if ordering is not None else None
        if ov is None:
            out += _kryo_write_varint(0)  # null orderingValue
        else:
            out += _kryo_write_varint(_KRYO_STRING_TAG)
            out += _kryo_write_string(str(ov))
    return bytes(out)


def decode_kryo_delete_payload(data: bytes) -> list[str]:
    """Record keys from a Kryo-serialized delete payload — either the
    0.x/1.x ``HoodieKey[]`` shape or the 1.x stock-payload
    ``DeleteRecord[]`` shape (round 13, VERDICT r12 #10: both stock
    payload classes — OverwriteWithLatestAvroPayload and
    DefaultHoodieRecordPayload — are latest-wins, so a DeleteRecord's
    key set IS the delete; ordering values decode (null / String) and
    are not needed to decide which rows die under stock semantics).
    Anything else still refuses loudly."""
    names: list[str] = []

    def read_class(pos):
        tag, pos = _kryo_read_varint(data, pos)
        if tag == 0:
            return None, pos  # null reference
        if tag != 1:
            raise HudiLogCorrupt(
                f"Kryo delete payload: class tag {tag} — custom payload "
                "classes need the Hudi runtime to decode"
            )
        nid, pos = _kryo_read_varint(data, pos)
        if nid == len(names):
            nm, pos = _kryo_read_string(data, pos)
            names.append(nm)
        elif nid < len(names):
            nm = names[nid]
        else:
            raise HudiLogCorrupt(
                f"Kryo delete payload: forward nameId {nid}"
            )
        return nm, pos

    cls, pos = read_class(0)
    if cls not in (_KRYO_HOODIE_KEY_ARRAY, _KRYO_DELETE_RECORD_ARRAY):
        raise HudiLogCorrupt(
            f"Kryo delete payload: array class {cls!r} — custom payload "
            "classes need the Hudi runtime to decode"
        )
    delete_records = cls == _KRYO_DELETE_RECORD_ARRAY
    n1, pos = _kryo_read_varint(data, pos)
    keys: list[str] = []
    for _i in range(n1 - 1):
        ecls, pos = read_class(pos)
        if ecls is None:
            keys.append(None)  # null element (tolerate)
            continue
        if delete_records:
            if ecls != _KRYO_DELETE_RECORD:
                raise HudiLogCorrupt(
                    f"Kryo delete payload: element class {ecls!r} — "
                    "custom payload classes need the Hudi runtime"
                )
            kcls, pos = read_class(pos)
            if kcls != _KRYO_HOODIE_KEY:
                raise HudiLogCorrupt(
                    f"Kryo DeleteRecord: hoodieKey class {kcls!r}"
                )
            _part, pos = _kryo_read_string(data, pos)
            rec, pos = _kryo_read_string(data, pos)
            # orderingValue: null or a default-registered String; any
            # other Comparable type is runtime-specific → refuse
            tag, pos2 = _kryo_read_varint(data, pos)
            if tag == 0:
                pos = pos2
            elif tag == _KRYO_STRING_TAG:
                _ov, pos = _kryo_read_string(data, pos2)
            else:
                raise HudiLogCorrupt(
                    f"Kryo DeleteRecord: orderingValue class tag {tag} "
                    "— custom ordering types need the Hudi runtime"
                )
            keys.append(rec)
        else:
            if ecls != _KRYO_HOODIE_KEY:
                raise HudiLogCorrupt(
                    f"Kryo delete payload: element class {ecls!r} — "
                    "custom payload classes need the Hudi runtime"
                )
            _part, pos = _kryo_read_string(data, pos)
            rec, pos = _kryo_read_string(data, pos)
            keys.append(rec)
    if pos != len(data):
        raise HudiLogCorrupt("Kryo delete payload trailing bytes")
    return [k for k in keys if k is not None]


def decode_delete_block(block: dict) -> list[str]:
    data = block["content"]
    if data[:2] == b"\x01\x00":
        # a Kryo-serialized HoodieKey[] payload (runtime writers, both
        # 0.x and 1.x) — the framed layout below always starts with a
        # big-endian int32 version whose first byte is 0x00
        return decode_kryo_delete_payload(data)
    if len(data) < 8:
        raise HudiLogCorrupt("delete block too short")
    _v, n = struct.unpack_from(">ii", data, 0)
    pos, keys = 8, []
    for _ in range(n):
        if pos + 4 > len(data):
            raise HudiLogCorrupt(
                "delete block framing mismatch — possibly a "
                "runtime-serialized (Kryo) delete block, which needs the "
                "Hudi jar to decode"
            )
        (ln,) = struct.unpack_from(">i", data, pos)
        pos += 4
        if ln < 0 or pos + ln > len(data):
            raise HudiLogCorrupt(
                "delete block framing mismatch — possibly a "
                "runtime-serialized (Kryo) delete block, which needs the "
                "Hudi jar to decode"
            )
        keys.append(data[pos : pos + ln].decode("utf-8"))
        pos += ln
    if pos != len(data):
        raise HudiLogCorrupt("delete block trailing bytes")
    return keys


def encode_rollback_block(instant: str, target_instant: str) -> bytes:
    return encode_block(
        COMMAND_BLOCK,
        {
            INSTANT_TIME: instant,
            TARGET_INSTANT_TIME: target_instant,
            COMMAND_BLOCK_TYPE: "0",  # ROLLBACK_PREVIOUS_BLOCK
        },
        b"",
    )
