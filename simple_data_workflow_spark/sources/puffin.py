"""Puffin file format — the Iceberg v3 sidecar for statistics and
DELETION VECTORS (public specs: iceberg.apache.org/puffin-spec and the
v3 table spec's "Position Delete Files" / deletion-vector rules;
reference behavior parity: the reference engine has no lakehouse
sidecars — this exists for SURVEY.md §2.2 row 1/2 interop coverage).

Layout (all offsets from file start):

- header: magic ``PFA1``
- blobs, back to back, each at the footer-recorded ``offset``
- footer: magic ``PFA1`` + UTF-8 JSON payload + payload size (4 bytes
  little-endian) + flags (4 bytes, bit 0 = payload LZ4-compressed) +
  magic ``PFA1``

The footer JSON's ``blobs`` array records per blob: ``type``,
``fields``, ``snapshot-id``, ``sequence-number``, ``offset``,
``length``, and free-form ``properties`` (DVs carry
``referenced-data-file``).

A ``deletion-vector-v1`` blob is byte-compatible with a Delta deletion
vector (the v3 spec adopted Delta's format):

- 4-byte BIG-endian length of (magic + vector)
- 4-byte magic (1681511377 little-endian — ``delta_dv.DV_MAGIC``)
- the vector: a 64-bit RoaringBitmapArray ("portable" serialization:
  8-byte LE bitmap count, then per bitmap a 4-byte LE high-32 key +
  standard 32-bit roaring portable bytes)
- 4-byte BIG-endian CRC-32 of (magic + vector)

so the roaring codec in :mod:`delta_dv` decodes/encodes both formats;
only the framing differs (Delta sidecars carry a leading version byte
and per-blob CRC in the same shape, Puffin frames with a JSON footer).

Everything here is DRIVER-side metadata work, ∝ deleted rows — the
same cost class as Iceberg's own DV broadcast to scan tasks.
"""

from __future__ import annotations

import json
import struct
import zlib

import numpy as np

MAGIC = b"PFA1"
DV_BLOB_TYPE = "deletion-vector-v1"


_LZ4_FRAME_MAGIC = b"\x04\x22\x4d\x18"


def _lz4_block_into(out: bytearray, src: bytes) -> None:
    """Decode one LZ4 BLOCK appending into ``out`` (public block spec:
    token nibbles = literal length / match length-4, little-endian
    2-byte match offsets, 255-terminated length extensions). Decoding
    into the shared buffer also serves LINKED blocks, whose matches may
    reach into previously-decoded frames."""
    i, n = 0, len(src)
    base = len(out)
    while i < n:
        token = src[i]
        i += 1
        lit = token >> 4
        if lit == 15:
            while True:
                b = src[i]
                i += 1
                lit += b
                if b != 255:
                    break
        if i + lit > n:
            raise ValueError("corrupt LZ4 block (literal overrun)")
        out += src[i : i + lit]
        i += lit
        if i >= n:
            break  # the last sequence is literals-only, per spec
        offset = src[i] | (src[i + 1] << 8)
        i += 2
        if offset == 0:
            raise ValueError("corrupt LZ4 block (zero match offset)")
        mlen = token & 0xF
        if mlen == 15:
            while True:
                b = src[i]
                i += 1
                mlen += b
                if b != 255:
                    break
        mlen += 4
        start = len(out) - offset
        if start < 0:
            raise ValueError("corrupt LZ4 block (offset beyond history)")
        if offset >= mlen:
            out += out[start : start + mlen]
        else:  # overlapping match: byte-wise (RLE-style) copy
            for _ in range(mlen):
                out.append(out[start])
                start += 1
    del base


def lz4_frame_decompress(raw: bytes) -> bytes:
    """Pure-Python LZ4 FRAME decoder (public frame spec v1.6.x) — no
    native lz4 dependency. Checksums (xxHash32) are SKIPPED, not
    verified (stdlib has no xxHash); framing errors still raise.
    Footer payloads are small, so Python-loop cost is irrelevant."""
    if raw[:4] != _LZ4_FRAME_MAGIC:
        raise ValueError("not an LZ4 frame (magic mismatch)")
    i = 4
    flg = raw[i]
    i += 2  # FLG + BD
    if flg >> 6 != 0b01:
        raise ValueError(f"unsupported LZ4 frame version {flg >> 6}")
    has_content_size = (flg >> 3) & 1
    has_block_checksum = (flg >> 4) & 1
    has_content_checksum = (flg >> 2) & 1
    has_dict_id = flg & 1
    if has_content_size:
        i += 8
    if has_dict_id:
        i += 4
    i += 1  # header checksum byte (xxHash32 — skipped)
    out = bytearray()
    while True:
        if i + 4 > len(raw):
            raise ValueError("truncated LZ4 frame (no end mark)")
        bsz = int.from_bytes(raw[i : i + 4], "little")
        i += 4
        if bsz == 0:
            break  # EndMark
        is_raw = bsz & 0x80000000
        bsz &= 0x7FFFFFFF
        block = raw[i : i + bsz]
        if len(block) != bsz:
            raise ValueError("truncated LZ4 block")
        i += bsz
        if has_block_checksum:
            i += 4
        if is_raw:
            out += block
        else:
            _lz4_block_into(out, block)
    if has_content_checksum:
        i += 4
    return bytes(out)


def read_footer(raw: bytes) -> dict:
    """Parse a Puffin file's footer JSON (blob index). LZ4-compressed
    footer payloads (flag bit 0 — what several 2026 runtimes emit)
    decode through the pure-Python frame decoder (round 13, VERDICT
    r12 #7)."""
    if len(raw) < 16 or raw[:4] != MAGIC or raw[-4:] != MAGIC:
        raise ValueError("not a Puffin file (magic mismatch)")
    flags = int.from_bytes(raw[-8:-4], "little")
    size = int.from_bytes(raw[-12:-8], "little")
    start = len(raw) - 12 - size
    if start < 4 or raw[start - 4 : start] != MAGIC:
        raise ValueError("Puffin footer magic mismatch")
    payload = raw[start : start + size]
    if flags & 0x1:
        payload = lz4_frame_decompress(payload)
    return json.loads(payload.decode("utf-8"))


def find_dv_blob(raw: bytes, referenced_data_file: str) -> tuple[int, int]:
    """(offset, length) of the deletion-vector blob for a data file,
    from the footer index — the fallback when a manifest entry omits
    ``content_offset``/``content_size_in_bytes``."""
    for b in read_footer(raw).get("blobs") or []:
        if b.get("type") == DV_BLOB_TYPE and (b.get("properties") or {}).get(
            "referenced-data-file"
        ) == referenced_data_file:
            return int(b["offset"]), int(b["length"])
    raise ValueError(
        f"no {DV_BLOB_TYPE} blob for {referenced_data_file!r} in the "
        "Puffin footer"
    )


def read_dv_blob(raw: bytes, offset: int, length: int) -> np.ndarray:
    """Decode one deletion-vector blob to its int64 row positions,
    verifying length, magic, and CRC (a corrupt DV raises instead of
    silently un-deleting rows)."""
    from simple_data_workflow_spark.sources.delta_dv import dv_deserialize

    blob = raw[offset : offset + length]
    if len(blob) != length:
        raise ValueError("Puffin DV blob truncated")
    (ln,) = struct.unpack_from(">i", blob, 0)
    if ln + 8 != length:
        raise ValueError(
            f"Puffin DV blob length mismatch: framed {ln} + 8 != {length}"
        )
    data = blob[4 : 4 + ln]
    (crc,) = struct.unpack_from(">I", blob, 4 + ln)
    if zlib.crc32(data) & 0xFFFFFFFF != crc:
        raise ValueError("Puffin DV blob checksum mismatch")
    return dv_deserialize(data)  # verifies the magic


def build_dv_file(
    dvs: list[tuple[str, np.ndarray]],
    snapshot_id: int,
    sequence_number: int,
) -> tuple[bytes, list[dict]]:
    """Assemble a Puffin file carrying one deletion-vector blob per
    (referenced data file, positions) pair. Returns the file bytes and
    per-blob descriptors ``{referenced, offset, length, cardinality}``
    for the manifest entries."""
    from simple_data_workflow_spark.sources.delta_dv import dv_serialize

    buf = bytearray(MAGIC)
    blobs_meta = []
    descs = []
    for ref, positions in dvs:
        vec = dv_serialize(positions)  # magic LE + 64-bit roaring
        offset = len(buf)
        buf += struct.pack(">i", len(vec))
        buf += vec
        buf += struct.pack(">I", zlib.crc32(vec) & 0xFFFFFFFF)
        length = len(buf) - offset
        blobs_meta.append(
            {
                "type": DV_BLOB_TYPE,
                "fields": [],
                "snapshot-id": int(snapshot_id),
                "sequence-number": int(sequence_number),
                "offset": offset,
                "length": length,
                "properties": {
                    "referenced-data-file": ref,
                    "cardinality": str(int(len(positions))),
                },
            }
        )
        descs.append(
            {
                "referenced": ref,
                "offset": offset,
                "length": length,
                "cardinality": int(len(positions)),
            }
        )
    payload = json.dumps({"blobs": blobs_meta}).encode("utf-8")
    buf += MAGIC
    buf += payload
    buf += struct.pack("<i", len(payload))
    buf += struct.pack("<i", 0)  # flags: uncompressed
    buf += MAGIC
    return bytes(buf), descs
