"""Delta Lake deletion-vector decoding for the jar-free reader
(round 10) — pure-Python, spec-only (delta.io PROTOCOL.md §"Deletion
Vectors" + the public RoaringFormatSpec).

A deletion vector marks row POSITIONS of a data file as deleted
without rewriting the file (merge-on-read). On disk it is a 64-bit
roaring bitmap ("RoaringBitmapArray": the value's high 32 bits key a
standard 32-bit roaring bitmap of the low 32), stored either inline in
the log (Z85 text) or in a ``.bin`` sidecar addressed by
``(storageType, pathOrInlineDv, offset, sizeInBytes)``:

- ``storageType "u"``: path derived from a Z85-encoded random UUID,
  optionally behind a random prefix — file name
  ``deletion_vector_<uuid>.bin`` relative to the table root;
- ``"p"``: absolute path; ``"i"``: the DV bytes themselves, Z85.

Sidecar layout: 1-byte format version (= 1), then each DV blob at its
``offset``: ``int32 big-endian size`` + data + ``int32 big-endian
CRC-32 of the data``. The data = ``int32 little-endian magic
1681511377`` + ``int64 LE bitmap count`` + per bitmap ``int32 LE key``
+ the 32-bit roaring "portable" serialization (cookie 12346/12347,
array / bitmap / run containers — all little-endian).

Everything here is DRIVER-side metadata work, ∝ deleted rows (the same
cost class as Delta's own broadcast of DVs to scan tasks), never ∝
table bytes. The serializers exist so tests can pin the reader against
spec-built fixtures; the reader is the product."""

from __future__ import annotations

import struct
import zlib

import numpy as np

_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}

DV_MAGIC = 1681511377  # PROTOCOL.md: little-endian magic before the bitmaps


def z85_encode(data: bytes) -> str:
    """ZeroMQ Z85 (the spec's encoding for DV uuids/inline payloads):
    every 4 bytes → 5 chars; length must be a multiple of 4."""
    if len(data) % 4:
        raise ValueError(f"Z85 input must be a multiple of 4 bytes, got {len(data)}")
    out = []
    for i in range(0, len(data), 4):
        v = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            v, r = divmod(v, 85)
            chunk.append(_Z85_CHARS[r])
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError(f"Z85 input must be a multiple of 5 chars, got {len(text)}")
    out = bytearray()
    for i in range(0, len(text), 5):
        v = 0
        for c in text[i : i + 5]:
            try:
                v = v * 85 + _Z85_INDEX[c]
            except KeyError:
                raise ValueError(f"invalid Z85 character {c!r}") from None
        out += v.to_bytes(4, "big")
    return bytes(out)


# ---------------------------------------------------------------------------
# 32-bit roaring bitmap, "portable" serialization (RoaringFormatSpec)
# ---------------------------------------------------------------------------

_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE = 12347
_NO_OFFSET_THRESHOLD = 4


def _roaring32_deserialize(buf: bytes, pos: int) -> tuple[np.ndarray, int]:
    """Decode one 32-bit roaring bitmap at ``pos``; returns (sorted
    uint32 values, next offset). Array, bitmap AND run containers."""
    (cookie32,) = struct.unpack_from("<i", buf, pos)
    cookie = cookie32 & 0xFFFF
    if cookie == _SERIAL_COOKIE:
        size = (cookie32 >> 16) + 1
        pos += 4
        runbits = buf[pos : pos + (size + 7) // 8]
        pos += (size + 7) // 8
        has_offsets = size >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (size,) = struct.unpack_from("<i", buf, pos + 4)
        pos += 8
        runbits = b"\x00" * ((size + 7) // 8)
        has_offsets = True
    else:
        raise ValueError(f"not a roaring bitmap: cookie {cookie}")
    keys = np.empty(size, dtype=np.uint32)
    cards = np.empty(size, dtype=np.int64)
    for i in range(size):
        k, cm1 = struct.unpack_from("<HH", buf, pos)
        keys[i], cards[i] = k, cm1 + 1
        pos += 4
    if has_offsets:
        pos += 4 * size  # offsets are redundant for sequential decode
    chunks = []
    for i in range(size):
        is_run = bool(runbits[i // 8] & (1 << (i % 8)))
        base = np.uint32(keys[i]) << np.uint32(16)
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            vals = []
            for _ in range(n_runs):
                start, length = struct.unpack_from("<HH", buf, pos)
                pos += 4
                vals.append(np.arange(start, start + length + 1, dtype=np.uint32))
            lows = np.concatenate(vals) if vals else np.empty(0, np.uint32)
        elif cards[i] > 4096:
            words = np.frombuffer(buf, dtype="<u8", count=1024, offset=pos)
            pos += 8192
            bits = np.unpackbits(
                words.view(np.uint8), bitorder="little"
            )
            lows = np.nonzero(bits)[0].astype(np.uint32)
        else:
            lows = np.frombuffer(
                buf, dtype="<u2", count=int(cards[i]), offset=pos
            ).astype(np.uint32)
            pos += 2 * int(cards[i])
        chunks.append(base | lows)
    values = (
        np.concatenate(chunks) if chunks else np.empty(0, np.uint32)
    )
    return values, pos


def _roaring32_serialize(values: np.ndarray) -> bytes:
    """Encode sorted uint32 values (array/bitmap containers; no run
    compression — valid per spec, runs are an optional optimization).
    Exists for spec-built test fixtures."""
    values = np.asarray(values, dtype=np.uint32)
    keys = (values >> np.uint32(16)).astype(np.uint16)
    out_keys = []
    containers = []
    for k in np.unique(keys):
        lows = (values[keys == k] & np.uint32(0xFFFF)).astype(np.uint16)
        out_keys.append((int(k), len(lows)))
        if len(lows) > 4096:
            words = np.zeros(1024, dtype="<u8")
            idx = lows.astype(np.int64)
            np.bitwise_or.at(
                words, idx // 64, (np.uint64(1) << (idx % 64).astype(np.uint64))
            )
            containers.append(words.tobytes())
        else:
            containers.append(lows.astype("<u2").tobytes())
    size = len(out_keys)
    buf = struct.pack("<ii", _SERIAL_COOKIE_NO_RUN, size)
    for k, card in out_keys:
        buf += struct.pack("<HH", k, card - 1)
    offset = len(buf) + 4 * size
    for c in containers:
        buf += struct.pack("<i", offset)
        offset += len(c)
    return buf + b"".join(containers)


# ---------------------------------------------------------------------------
# 64-bit RoaringBitmapArray (the DV payload)
# ---------------------------------------------------------------------------


def dv_deserialize(data: bytes) -> np.ndarray:
    """DV data bytes (magic + bitmap array) → sorted int64 positions."""
    (magic,) = struct.unpack_from("<i", data, 0)
    if magic != DV_MAGIC:
        raise ValueError(f"bad deletion-vector magic {magic} (want {DV_MAGIC})")
    (count,) = struct.unpack_from("<q", data, 4)
    pos = 12
    parts = []
    for _ in range(count):
        (key,) = struct.unpack_from("<i", data, pos)
        pos += 4
        lows, pos = _roaring32_deserialize(data, pos)
        parts.append((np.int64(key) << np.int64(32)) | lows.astype(np.int64))
    return (
        np.sort(np.concatenate(parts)) if parts else np.empty(0, np.int64)
    )


def dv_serialize(positions) -> bytes:
    """Sorted int64 positions → DV data bytes (fixture builder)."""
    positions = np.asarray(sorted(int(p) for p in positions), dtype=np.int64)
    highs = (positions >> np.int64(32)).astype(np.int64)
    out = struct.pack("<i", DV_MAGIC)
    uniq = np.unique(highs)
    out += struct.pack("<q", len(uniq))
    for h in uniq:
        lows = (positions[highs == h] & np.int64(0xFFFFFFFF)).astype(np.uint32)
        out += struct.pack("<i", int(h))
        out += _roaring32_serialize(lows)
    return out


# ---------------------------------------------------------------------------
# sidecar files + descriptor resolution
# ---------------------------------------------------------------------------


def dv_file_bytes(blobs: list[bytes]) -> tuple[bytes, list[tuple[int, int]]]:
    """Assemble a sidecar ``.bin``: version byte, then per blob
    ``int32 BE size + data + uint32 BE CRC32(data)`` (the full 32-bit
    checksum, matching Delta's implementation). Returns the file bytes
    and each blob's (offset, sizeInBytes) for its descriptor."""
    buf = bytearray(b"\x01")
    spans = []
    for b in blobs:
        offset = len(buf)
        buf += struct.pack(">i", len(b))
        buf += b
        buf += struct.pack(">I", zlib.crc32(b) & 0xFFFFFFFF)
        spans.append((offset, len(b)))
    return bytes(buf), spans


def dv_uuid_path(table_root: str, path_or_inline: str) -> str:
    """storageType "u": optional random prefix + 20-char Z85 uuid →
    ``<root>[/prefix]/deletion_vector_<uuid>.bin`` (PROTOCOL.md
    derived-path rule)."""
    prefix, z = path_or_inline[:-20], path_or_inline[-20:]
    raw = z85_decode(z)
    if len(raw) != 16:
        raise ValueError("DV uuid must decode to 16 bytes")
    import uuid as _uuid

    u = str(_uuid.UUID(bytes=raw))
    base = f"{table_root}/{prefix}" if prefix else table_root
    return f"{base.rstrip('/')}/deletion_vector_{u}.bin"


def read_dv_positions(
    read_bytes, table_root: str, desc: dict
) -> np.ndarray:
    """Resolve a ``deletionVector`` descriptor to its deleted row
    positions. ``read_bytes(path) -> bytes`` abstracts the filesystem
    (the delta reader passes its Hadoop-backed reader). Verifies size,
    CRC (sidecars), magic, and cardinality — a corrupt DV raises
    instead of silently un-deleting rows."""
    st = desc.get("storageType")
    size = int(desc.get("sizeInBytes"))
    if st == "i":
        data = z85_decode(desc["pathOrInlineDv"])[:size]
        if len(data) != size:
            raise ValueError("inline DV shorter than sizeInBytes")
    elif st in ("u", "p"):
        path = (
            dv_uuid_path(table_root, desc["pathOrInlineDv"])
            if st == "u"
            else desc["pathOrInlineDv"]
        )
        raw = read_bytes(path)
        if not raw or raw[0] != 1:
            raise ValueError(f"unsupported DV file version {raw[:1]!r} in {path}")
        offset = int(desc.get("offset") or 1)
        (stored_size,) = struct.unpack_from(">i", raw, offset)
        if stored_size != size:
            raise ValueError(
                f"DV size mismatch in {path}: descriptor {size}, file {stored_size}"
            )
        data = raw[offset + 4 : offset + 4 + size]
        # the full unsigned 32-bit CRC-32 (a signed read would reject
        # ~half of real runtimes' sidecars whose CRC has the top bit set)
        (crc,) = struct.unpack_from(">I", raw, offset + 4 + size)
        if zlib.crc32(data) & 0xFFFFFFFF != crc:
            raise ValueError(f"DV checksum mismatch in {path}")
    else:
        raise ValueError(f"unknown DV storageType {st!r}")
    positions = dv_deserialize(data)
    card = desc.get("cardinality")
    if card is not None and len(positions) != int(card):
        raise ValueError(
            f"DV cardinality mismatch: descriptor {card}, decoded {len(positions)}"
        )
    return positions
