"""Streaming READS of jar-free Iceberg v2 tables (round 11).

``spark.readStream.format("iceberglog")`` over a table written by
``sources.iceberg_writer`` (or any spec-conformant v2 writer):
snapshot-driven microbatches via PySpark 4's Python Data Source API —
the Iceberg sibling of ``streaming/delta_source.py``. Offsets are DATA
SEQUENCE NUMBERS (v2's monotonic commit counter), so snapshot
expiration cannot shift the cursor the way a list index would.

Semantics:

- **Append snapshots stream exactly**: the batch for sequence ``s``
  reads the data files ADDED by that snapshot (manifest-list entries
  with ``sequence_number == s`` → manifests → ADDED entries with
  ``content=0``).
- **"replace" snapshots SKIP** — the spec defines the operation as
  adding/removing files WITHOUT changing table data (compaction), so
  there are no rows to stream (same treatment the deltalog source
  gives dataChange=false OPTIMIZE commits).
- **Other non-append snapshots (overwrite/delete) refuse by
  default**; ``.option("allowRewrites", "true")`` streams their ADDED
  data files as at-least-once inserts (row-level deletes carried by
  delete manifests do not retract already-streamed rows — the same
  boundary the deltalog source documents).
- Rows carry ``_snapshot_id``. ``.option("startingSequence", N)``
  anchors after sequence N; default replays every retained snapshot.
- **v1 tables refuse**: without sequence numbers there is no stable
  cursor (the jar-free writer emits v2 by default).

Planning runs in a JVM-less Python process, so manifests decode with
the pure-Python Avro OCF reader (``sources.avro_ocf`` — cross-pinned
against the reference Java implementation); workers read one parquet
file each via pyarrow. Everything driver-side is metadata-sized.
"""

from __future__ import annotations

import json
import os
import re
import urllib.parse
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import LongType, StructField, StructType

SNAPSHOT_COL = "_snapshot_id"


def _local(path: str) -> str:
    if "://" in path or path.startswith("file:"):
        return urllib.parse.urlparse(path).path
    return path


def _load_meta(path: str) -> dict:
    """Current table metadata, session-free (version-hint preferred,
    highest-versioned file otherwise) — the os/json twin of
    ``iceberg_reader.load_table_metadata``."""
    md = f"{_local(path)}/metadata"
    if not os.path.isdir(md):
        raise FileNotFoundError(f"no metadata/ directory under {path}")
    names = [n for n in os.listdir(md) if n.endswith(".metadata.json")]
    if not names:
        raise FileNotFoundError(f"no *.metadata.json under {md}")
    chosen = None
    hint = f"{md}/version-hint.text"
    if os.path.exists(hint):
        with open(hint) as f:
            v = int(f.read().strip())
        for cand in names:
            m = re.match(r"v?(\d+)\.metadata\.json", cand)
            if m and int(m.group(1)) == v:
                chosen = cand
                break
    if chosen is None:
        chosen = max(
            names,
            key=lambda n: int(re.match(r"v?(\d+)", n).group(1) or -1),
        )
    with open(f"{md}/{chosen}") as f:
        return json.load(f)


@dataclass
class _IceFilePartition(InputPartition):
    file_path: str
    snapshot_id: int


class IcebergStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        self._path = options.get("path")
        if not self._path:
            raise ValueError(
                "iceberglog source requires .option('path', ...)"
            )
        self._allow_rewrites = (
            str(options.get("allowrewrites", "false")).lower() == "true"
        )
        meta = _load_meta(self._path)
        if int(meta.get("format-version", 1)) < 2:
            raise NotImplementedError(
                "iceberglog streaming needs a format-version 2 table "
                "(sequence numbers are the stream cursor; v1 has none)"
            )
        if "startingsequence" in options:
            self._starting = int(options["startingsequence"])
        else:
            self._starting = 0  # replay every retained snapshot
        from pyspark.sql.pandas.types import to_arrow_schema

        data_fields = [f for f in schema.fields if f.name != SNAPSHOT_COL]
        self._arrow_schema = to_arrow_schema(StructType(data_fields))

    # -- offsets: {"seq": N} == all sequence numbers <= N consumed
    def initialOffset(self) -> dict:
        return {"seq": self._starting}

    def latestOffset(self) -> dict:
        meta = _load_meta(self._path)
        latest = int(meta.get("last-sequence-number", 0))
        return {"seq": max(latest, self._starting)}

    def _snapshots_between(self, meta: dict, lo: int, hi: int):
        snaps = [
            s
            for s in (meta.get("snapshots") or [])
            if lo < int(s.get("sequence-number", 0)) <= hi
        ]
        snaps.sort(key=lambda s: int(s.get("sequence-number", 0)))
        # a gap means the snapshot was expired past the cursor
        want = set(range(lo + 1, hi + 1))
        have = {int(s.get("sequence-number", 0)) for s in snaps}
        missing = sorted(want - have)
        if missing:
            raise ValueError(
                f"iceberglog stream needs sequence numbers {missing} but "
                "their snapshots were expired past the cursor"
            )
        return snaps

    def partitions(self, start: dict, end: dict):
        from simple_data_workflow_spark.sources.avro_ocf import (
            read_ocf_file,
        )

        lo, hi = start["seq"], end["seq"]
        meta = _load_meta(self._path)
        parts: list[_IceFilePartition] = []
        for snap in self._snapshots_between(meta, lo, hi):
            seq = int(snap.get("sequence-number", 0))
            sid = int(snap["snapshot-id"])
            op = (snap.get("summary") or {}).get("operation", "append")
            if op == "replace":
                # spec: "replace" = files added/removed WITHOUT changing
                # table data (compaction) — no rows to stream, skip it
                # (the same treatment the deltalog source gives
                # dataChange=false OPTIMIZE commits)
                continue
            if op != "append" and not self._allow_rewrites:
                raise ValueError(
                    f"snapshot {sid} (sequence {seq}) is a {op!r} — its "
                    "files may mix rewritten and carried-over rows; set "
                    ".option('allowRewrites', 'true') for at-least-once "
                    "semantics"
                )
            _schema, mlist = read_ocf_file(
                _local(str(snap["manifest-list"]))
            )
            for m in mlist:
                if int(m.get("sequence_number") or 0) != seq:
                    continue  # reused manifest from an older snapshot
                if int(m.get("content") or 0) != 0:
                    continue  # delete manifest: no insert rows
                _es, entries = read_ocf_file(
                    _local(str(m["manifest_path"]))
                )
                for e in entries:
                    if int(e.get("status") or 0) != 1:  # ADDED only
                        continue
                    df = e["data_file"]
                    if int(df.get("content") or 0) != 0:
                        continue
                    parts.append(
                        _IceFilePartition(
                            _local(str(df["file_path"])), sid
                        )
                    )
        return parts

    def read(self, partition: _IceFilePartition):
        import pyarrow as pa
        import pyarrow.parquet as pq

        tbl = pq.read_table(partition.file_path)
        cols = []
        for f in self._arrow_schema:
            if f.name in tbl.column_names:
                cols.append(tbl.column(f.name).cast(f.type))
            else:
                cols.append(pa.nulls(tbl.num_rows, f.type))
        out = pa.Table.from_arrays(cols, schema=self._arrow_schema)
        out = out.append_column(
            SNAPSHOT_COL,
            pa.repeat(
                pa.scalar(partition.snapshot_id, pa.int64()), out.num_rows
            ),
        )
        yield from out.to_batches()

    def commit(self, end: dict) -> None:
        pass

    def stop(self) -> None:
        pass


class IcebergLogStreamDataSource(DataSource):
    """``format("iceberglog")``: streaming reads of a spec-conformant
    Iceberg v2 table without the runtime jar. Register with
    ``spark.dataSource.register(IcebergLogStreamDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "iceberglog"

    def schema(self):
        path = self.options.get("path")
        if not path:
            raise ValueError(
                "iceberglog source requires .option('path', ...)"
            )
        meta = _load_meta(path)
        from simple_data_workflow_spark.sources.iceberg_reader import (
            _schema_and_ids,
        )

        schema, _ids = _schema_and_ids(meta)
        return schema.add(StructField(SNAPSHOT_COL, LongType()))

    def streamReader(self, schema: StructType) -> IcebergStreamReader:
        return IcebergStreamReader(schema, dict(self.options))
