"""Streaming READS of jar-free Hudi tables (round 11).

``spark.readStream.format("hudilog")``: timeline-instant-driven
microbatches over a table written by ``sources.hudi_writer`` (or any
classic-layout Hudi writer) — the Hudi sibling of the deltalog /
iceberglog sources, completing the streaming read matrix for all three
interop formats. Offsets are COMPLETED INSTANT TIMES (Hudi's own
incremental-query cursor).

This is a CHANGE-FEED source (Hudi incremental queries are):

- ``commit`` / ``deltacommit`` base files (inserts / bulk inserts /
  MoR new-key inserts) stream their rows with ``_change_type =
  'insert'``.
- MoR LOG files stream block-level: AVRO data blocks (upsert
  postimages) as ``_change_type = 'upsert'`` rows, DELETE blocks as
  ``_change_type = 'delete'`` rows carrying only the record key —
  exactly the per-instant change stream the log encodes. Blocks whose
  instant falls outside the batch (or never committed) are skipped, so
  a log file touched by several deltacommits streams each commit's
  blocks in that commit's batch.
- ``replacecommit`` (clustering / insert_overwrite / CoW upsert)
  refuses by default — its added files mix rewritten and carried-over
  rows; ``.option("allowRewrites", "true")`` streams them as
  at-least-once inserts.

Rows carry ``_instant`` and ``_hoodie_record_key`` (the merge handle
downstream upsert-appliers need). ``.option("startingInstant", t)``
anchors after instant ``t``. Planning is metadata-sized and session
-free (os listing + commit-JSON ``partitionToWriteStats``); workers
read one base parquet (pyarrow) or decode one log file
(``sources.hudi_log``).
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
from pyspark.sql.types import StringType, StructField, StructType

INSTANT_COL = "_instant"
CHANGE_COL = "_change_type"
KEY_COL = "_hoodie_record_key"


def _local(path: str) -> str:
    if "://" in path or path.startswith("file:"):
        return urllib.parse.urlparse(path).path
    return path


def _timeline_dirs(path: str) -> list[str]:
    hd = f"{_local(path)}/.hoodie"
    if not os.path.isdir(hd):
        raise FileNotFoundError(f"no .hoodie directory under {path}")
    dirs = [hd]
    if os.path.isdir(f"{hd}/timeline"):  # 1.x layout (round 12)
        dirs.append(f"{hd}/timeline")
    return dirs


def _completed_instants(path: str) -> list[tuple[str, str]]:
    """Sorted (instant, action) for completed commit/deltacommit/
    replacecommit actions — session-free, BOTH timeline layouts
    (classic bare names; 1.x completion-suffixed under
    ``.hoodie/timeline/``)."""
    out = []
    for d in _timeline_dirs(path):
        for n in os.listdir(d):
            m = re.match(
                r"^(\d+)(?:_\d+)?\.(commit|deltacommit|replacecommit)$", n
            )
            if m:
                out.append((m.group(1), m.group(2)))
    return sorted(set(out))


def _instant_file(path: str, instant: str, action: str) -> str:
    classic = f"{_local(path)}/.hoodie/{instant}.{action}"
    if os.path.exists(classic):
        return classic
    tl = f"{_local(path)}/.hoodie/timeline"
    if os.path.isdir(tl):
        for n in os.listdir(tl):
            m = re.match(r"^(\d+)(?:_\d+)?\.([a-z]+)$", n)
            if m and m.group(1) == instant and m.group(2) == action:
                return f"{tl}/{n}"
    raise FileNotFoundError(
        f"no completed {action} metadata for instant {instant} under "
        f"{path}/.hoodie"
    )


def _commit_files(path: str, instant: str, action: str) -> list[str]:
    """Relative paths the instant's ``partitionToWriteStats`` added."""
    with open(_instant_file(path, instant, action)) as f:
        meta = json.load(f)
    out = []
    for _part, stats in (meta.get("partitionToWriteStats") or {}).items():
        for st in stats:
            p = st.get("path")
            if p:
                out.append(p)
    return out


@dataclass
class _HudiPartition(InputPartition):
    file_path: str
    instant: str
    kind: str  # "base" | "log"
    #: log partitions: only blocks with these instants stream
    instants: tuple = ()


class HudiStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("hudilog source requires .option('path', ...)")
        self._allow_rewrites = (
            str(options.get("allowrewrites", "false")).lower() == "true"
        )
        self._starting = str(options.get("startinginstant", ""))
        from pyspark.sql.pandas.types import to_arrow_schema

        self._data_fields = [
            f
            for f in schema.fields
            if f.name not in (INSTANT_COL, CHANGE_COL, KEY_COL)
        ]
        self._arrow_schema = to_arrow_schema(StructType(self._data_fields))

    # -- offsets: {"instant": t} == all completed instants <= t consumed
    def initialOffset(self) -> dict:
        return {"instant": self._starting}

    def latestOffset(self) -> dict:
        instants = _completed_instants(self._path)
        latest = instants[-1][0] if instants else self._starting
        return {"instant": max(latest, self._starting)}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["instant"], end["instant"]
        batch = [
            (t, a) for t, a in _completed_instants(self._path) if lo < t <= hi
        ]
        batch_instants = tuple(t for t, _a in batch)
        root = _local(self._path)
        parts: list[_HudiPartition] = []
        log_files: dict[str, str] = {}  # path -> first instant touching it
        for t, action in batch:
            if action == "replacecommit" and not self._allow_rewrites:
                raise ValueError(
                    f"instant {t} is a replacecommit — its files mix "
                    "rewritten and carried-over rows; set "
                    ".option('allowRewrites', 'true') for at-least-once "
                    "semantics"
                )
            for rel in _commit_files(self._path, t, action):
                full = f"{root}/{rel}"
                name = rel.rsplit("/", 1)[-1]
                if ".log." in name:
                    # one partition per log FILE; block-level instant
                    # filtering in read() assigns rows to commits
                    log_files.setdefault(full, t)
                elif name.endswith(".parquet"):
                    parts.append(_HudiPartition(full, t, "base"))
        for full, t in sorted(log_files.items()):
            parts.append(
                _HudiPartition(full, t, "log", instants=batch_instants)
            )
        return parts

    def read(self, partition: _HudiPartition):
        import pyarrow as pa
        import pyarrow.parquet as pq

        if partition.kind == "base":
            tbl = pq.read_table(partition.file_path)
            key = (
                tbl.column(KEY_COL)
                if KEY_COL in tbl.column_names
                else pa.nulls(tbl.num_rows, pa.string())
            )
            cols = []
            for f in self._arrow_schema:
                if f.name in tbl.column_names:
                    cols.append(tbl.column(f.name).cast(f.type))
                else:
                    cols.append(pa.nulls(tbl.num_rows, f.type))
            out = pa.Table.from_arrays(cols, schema=self._arrow_schema)
            out = out.append_column(KEY_COL, key.cast(pa.string()))
            out = out.append_column(
                INSTANT_COL,
                pa.repeat(pa.scalar(partition.instant), out.num_rows),
            )
            out = out.append_column(
                CHANGE_COL, pa.repeat(pa.scalar("insert"), out.num_rows)
            )
            yield from out.to_batches()
            return

        from simple_data_workflow_spark.sources import hudi_log as hlog

        with open(partition.file_path, "rb") as f:
            data = f.read()
        want = set(partition.instants)
        rows: list[dict] = []
        kept = []
        for i, blk in enumerate(hlog.decode_blocks(data)):
            instant = blk["header"].get(hlog.INSTANT_TIME)
            if blk["type"] == hlog.COMMAND_BLOCK:
                target = blk["header"].get(hlog.TARGET_INSTANT_TIME)
                kept = [k for k in kept if k[0] != target]
                continue
            if instant not in want:
                continue
            kept.append((instant, blk))
        names = [f.name for f in self._arrow_schema]
        for instant, blk in kept:
            if blk["type"] == hlog.AVRO_DATA_BLOCK:
                for rec in hlog.decode_avro_data_block(blk):
                    row = {c: rec.get(c) for c in names}
                    row[KEY_COL] = rec.get(KEY_COL)
                    row[INSTANT_COL] = instant
                    row[CHANGE_COL] = "upsert"
                    rows.append(row)
            elif blk["type"] == hlog.DELETE_BLOCK:
                for key in hlog.decode_delete_block(blk):
                    row = {c: None for c in names}
                    row[KEY_COL] = key
                    row[INSTANT_COL] = instant
                    row[CHANGE_COL] = "delete"
                    rows.append(row)
            else:
                raise ValueError(
                    f"log block type {blk['type']} needs the Hudi runtime"
                )
        import pandas as pd

        from pyspark.sql.pandas.types import to_arrow_type

        full_schema = pa.schema(
            list(self._arrow_schema)
            + [
                pa.field(KEY_COL, pa.string()),
                pa.field(INSTANT_COL, pa.string()),
                pa.field(CHANGE_COL, pa.string()),
            ]
        )
        pdf = pd.DataFrame(
            rows, columns=[f.name for f in full_schema]
        )
        out = pa.Table.from_pandas(
            pdf, schema=full_schema, preserve_index=False
        )
        yield from out.to_batches()

    def commit(self, end: dict) -> None:
        pass

    def stop(self) -> None:
        pass


class HudiLogStreamDataSource(DataSource):
    """``format("hudilog")``: incremental change-feed reads of a
    classic-layout Hudi table without the runtime jar. Register with
    ``spark.dataSource.register(HudiLogStreamDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "hudilog"

    def schema(self):
        path = self.options.get("path")
        if not path:
            raise ValueError("hudilog source requires .option('path', ...)")
        # table schema from one live base file's footer (session-free)
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import from_arrow_schema

        root = _local(path)
        base = None
        for dirpath, dirnames, files in os.walk(root):
            dirnames[:] = [d for d in dirnames if d != ".hoodie"]
            for n in sorted(files):
                if n.endswith(".parquet"):
                    base = f"{dirpath}/{n}"
                    break
            if base:
                break
        if base is None:
            raise ValueError(
                f"hudilog source needs at least one base file under {path}"
            )
        arrow = pq.read_schema(base)
        keep = [f for f in arrow if not f.name.startswith("_hoodie_")]
        import pyarrow as pa

        schema = from_arrow_schema(pa.schema(keep))
        return StructType(
            list(schema.fields)
            + [
                StructField(KEY_COL, StringType()),
                StructField(INSTANT_COL, StringType()),
                StructField(CHANGE_COL, StringType()),
            ]
        )

    def streamReader(self, schema: StructType) -> HudiStreamReader:
        return HudiStreamReader(schema, dict(self.options))
