"""Structured Streaming SOURCE for the native transaction-log table
format — ``spark.readStream.format("tablelog")`` tails a
``sources.tablelog`` table commit-by-commit, via PySpark 4's Python
Data Source API.

Why this shape is scale-right:

- **Offsets are log versions** (`{"version": N}`), so micro-batch
  planning is one log-directory listing — no data is touched to decide
  what's new, and a restarted query replays the exact same version
  range from its checkpoint (deterministic offsets ⇒ the usual
  exactly-once-with-idempotent-sink contract holds).
- **One input partition per newly-added data file**: the batch's read
  parallelism equals the number of new files, each worker reads its
  file with Arrow (``pyarrow.parquet`` → ``RecordBatch`` — the
  zero-copy path into Spark), and a batch's cost is proportional to
  the NEW data, never the table.
- **Schema comes from the log**, so files predating a metadata-only
  schema evolution stream the added columns as NULL, same as batch
  ``table_read``.
- Non-append commits (DML deltas, overwrites) rewrite existing rows;
  by default the stream FAILS on them rather than silently re-emitting
  carried-over rows. ``allowRewrites=true`` opts into at-least-once
  change-feed semantics (every row of the added files, tagged with
  ``_commit_version`` — dedupe downstream on a key), matching batch
  ``tablelog.table_changes``.

Filesystem access uses ``pyarrow.fs.FileSystem.from_uri``, so the same
source code serves local paths and any URI Arrow can mount (s3://,
hdfs://) — the Python worker reading a partition has no JVM or
SparkSession, which is also why this module re-implements the few log
helpers it needs on pyarrow instead of importing ``sources.tablelog``.

Usage::

    from simple_data_workflow_spark.streaming.tablelog_source import (
        TablelogStreamDataSource,
    )
    spark.dataSource.register(TablelogStreamDataSource)
    stream = (
        spark.readStream.format("tablelog")
        .option("path", table_path)
        .load()
    )
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

VERSION_COL = "_commit_version"


def _fs_for(path: str):
    import pyarrow.fs as pafs

    try:
        fs, root = pafs.FileSystem.from_uri(path)
    except pafs.lib.ArrowInvalid:
        fs, root = pafs.LocalFileSystem(), path
    return fs, root


def _list_entry_versions(path: str) -> list[int]:
    import pyarrow.fs as pafs

    fs, root = _fs_for(path)
    sel = pafs.FileSelector(f"{root}/_log", allow_not_found=True)
    out = []
    for info in fs.get_file_info(sel):
        name = info.base_name
        if name.startswith(".") or name.endswith(".checkpoint.json"):
            continue
        if name.endswith(".json"):
            out.append(int(name[:-5]))
    return sorted(out)


def _read_entry(path: str, version: int) -> dict:
    fs, root = _fs_for(path)
    with fs.open_input_stream(f"{root}/_log/{version:08d}.json") as f:
        return json.loads(f.read().decode("utf-8"))


@dataclass
class _FilePartition(InputPartition):
    file_path: str
    version: int


class TablelogStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("tablelog source requires .option('path', ...)")
        self._allow_rewrites = (
            str(options.get("allowrewrites", "false")).lower() == "true"
        )
        # default: process the whole existing table, then tail
        self._starting = int(options.get("startingversion", -1))
        # arrow schema WITHOUT the version tag; built driver-side (the
        # worker in read() has no SparkSession) and pickled with self
        from pyspark.sql.pandas.types import to_arrow_schema

        data_fields = [f for f in schema.fields if f.name != VERSION_COL]
        self._arrow_schema = to_arrow_schema(StructType(data_fields))

    # -- offsets: {"version": N} == all versions <= N consumed
    def initialOffset(self) -> dict:
        return {"version": self._starting}

    def latestOffset(self) -> dict:
        versions = _list_entry_versions(self._path)
        latest = versions[-1] if versions else self._starting
        return {"version": max(latest, self._starting)}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["version"], end["version"]
        entries = set(_list_entry_versions(self._path))
        parts: list[_FilePartition] = []
        for v in range(lo + 1, hi + 1):
            if v not in entries:
                raise ValueError(
                    f"tablelog stream needs version {v} but it is not "
                    "retained (history truncated past the stream's cursor)"
                )
            e = _read_entry(self._path, v)
            if e["action"] != "append" and not self._allow_rewrites:
                raise ValueError(
                    f"version {v} is a {e.get('op', e['action'])!r} commit; "
                    "its files mix rewritten and carried-over rows — set "
                    ".option('allowRewrites', 'true') for at-least-once "
                    "change-feed semantics"
                )
            fs, root = _fs_for(self._path)
            for f in list(e.get("files", [])) + list(e.get("add", [])):
                parts.append(_FilePartition(f"{root}/data/{f}", v))
        return parts

    def read(self, partition: _FilePartition):
        # runs in a Python worker: pyarrow only, no SparkSession
        import pyarrow as pa
        import pyarrow.parquet as pq

        fs, _ = _fs_for(self._path)
        with fs.open_input_file(partition.file_path) as f:
            table = pq.read_table(f)
        cols = []
        for field in self._arrow_schema:
            if field.name in table.column_names:
                cols.append(table.column(field.name).cast(field.type))
            else:
                # file predates a schema evolution: column is NULL
                cols.append(pa.nulls(table.num_rows, field.type))
        cols.append(
            pa.array([partition.version] * table.num_rows, pa.int64())
        )
        out = pa.table(
            cols,
            schema=pa.schema(
                list(self._arrow_schema) + [pa.field(VERSION_COL, pa.int64())]
            ),
        )
        yield from out.to_batches()

    def commit(self, end: dict) -> None:
        pass  # offsets live in the query checkpoint; nothing to clean

    def stop(self) -> None:
        pass


class TablelogStreamDataSource(DataSource):
    """``format("tablelog")``: streaming reads of a native table-format
    path. Options: ``path`` (required), ``startingVersion`` (default
    -1 = everything), ``allowRewrites`` (default false)."""

    @classmethod
    def name(cls) -> str:
        return "tablelog"

    def schema(self):
        path = self.options.get("path")
        if not path:
            raise ValueError("tablelog source requires .option('path', ...)")
        versions = _list_entry_versions(path)
        if not versions:
            raise ValueError(f"no table log under {path}")
        schema_str = None
        for v in reversed(versions):
            schema_str = _read_entry(path, v).get("schema")
            if schema_str:
                break
        # this method runs in a session-free Python process, so return
        # the logged ``struct<...>`` STRING with the version tag
        # spliced in — Spark's engine-side type parser accepts it
        # (no _parse_datatype_string here: that needs a SparkSession)
        assert schema_str.startswith("struct<") and schema_str.endswith(">")
        return f"{schema_str[:-1]},{VERSION_COL}:bigint>"

    def streamReader(self, schema: StructType) -> TablelogStreamReader:
        return TablelogStreamReader(schema, dict(self.options))
