"""A minimal transaction-log table format on plain parquet — the
lakehouse pattern (Delta/Iceberg-style) without any external jars.

``sources.lakehouse`` gates the real formats behind their runtimes;
this module implements the core mechanism natively so the engine has
working ACID-ish tables, snapshot isolation, and time travel anywhere
plain parquet works:

- **Layout**: ``<path>/data/<uuid>.parquet`` immutable data files +
  ``<path>/_log/<%08d>.json`` commit entries. A data file is INVISIBLE
  until a commit references it, so a writer dying mid-stage leaves
  garbage bytes, never a torn table.
- **Commit = one atomic rename** of a staged log entry to the next
  version number. Rename-if-absent is the concurrency primitive
  (atomic on local FS/HDFS; on S3 use a coordinating layer — same
  caveat the real formats carry). Losing a race re-stages against the
  next version: optimistic concurrency, append wins are commutative.
- **Snapshot isolation**: a read resolves the log ONCE (replay:
  ``overwrite`` resets the file set, ``append`` extends it) and scans
  the resolved file list explicitly — concurrent commits cannot tear
  an in-flight read. ``version=`` gives time travel to any retained
  snapshot.
- **Vacuum** deletes data files no retained version references.

At 100 TB the log stays tiny (file lists, not data), reads are plain
parquet scans of the resolved files (pushdown/pruning intact), and the
per-commit cost is one rename — the same asymptotics that make the
real formats work.
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, jpath.getFileSystem(spark._jsc.hadoopConfiguration())


def _list_versions(spark: SparkSession, path: str) -> list[int]:
    jvm, fs = _fs(spark, path)
    log_dir = jvm.org.apache.hadoop.fs.Path(f"{path}/_log")
    if not fs.exists(log_dir):
        return []
    out = []
    for st in fs.listStatus(log_dir):
        name = st.getPath().getName()
        if name.endswith(".json") and not name.startswith("."):
            out.append(int(name[:-5]))
    return sorted(out)


def _read_entry(spark: SparkSession, path: str, version: int) -> dict:
    jvm, fs = _fs(spark, path)
    p = jvm.org.apache.hadoop.fs.Path(f"{path}/_log/{version:08d}.json")
    stream = fs.open(p)
    try:
        data = bytes(
            jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        )
    finally:
        stream.close()
    return json.loads(data.decode("utf-8"))


def table_commit(
    df: DataFrame,
    path: str,
    mode: str = "append",
    max_retries: int = 10,
) -> int:
    """Commit ``df`` as one atomic version; returns the version number.

    Data files stage under ``data/`` first (invisible), then the log
    entry is staged and renamed to the next version slot. A rename loss
    (concurrent writer took the slot) retries against the following
    slot — the already-staged data files are reused, so a retry costs
    one small rename, not a rewrite.
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be 'append' or 'overwrite', got {mode!r}")
    spark = df.sparkSession
    if mode == "append":
        versions = _list_versions(spark, path)
        if versions:
            prev = _read_entry(spark, path, versions[-1])["schema"]
            cur = df.schema.simpleString()
            if prev != cur:
                # a mismatched append would poison every later snapshot
                # read (parquet union of incompatible files). Evolve
                # explicitly: read_evolved_parquet + overwrite commit.
                raise TypeError(
                    f"append schema drift at {path}: table has {prev}, "
                    f"batch has {cur} — align the batch or commit an "
                    "explicit overwrite after widening"
                )
    jvm, fs = _fs(spark, path)
    staging = f"{path}/data/.stage-{uuid.uuid4().hex}"
    df.write.mode("overwrite").parquet(staging)
    files = []
    for st in fs.listStatus(jvm.org.apache.hadoop.fs.Path(staging)):
        name = st.getPath().getName()
        if not name.endswith(".parquet"):
            continue
        final = f"{uuid.uuid4().hex}.parquet"
        fs.rename(
            st.getPath(), jvm.org.apache.hadoop.fs.Path(f"{path}/data/{final}")
        )
        files.append(final)
    fs.delete(jvm.org.apache.hadoop.fs.Path(staging), True)
    entry = json.dumps(
        {"action": mode, "files": files, "schema": df.schema.simpleString()}
    ).encode("utf-8")
    log_dir = jvm.org.apache.hadoop.fs.Path(f"{path}/_log")
    fs.mkdirs(log_dir)
    for _ in range(max_retries):
        versions = _list_versions(spark, path)
        next_v = (versions[-1] + 1) if versions else 0
        tmp = jvm.org.apache.hadoop.fs.Path(
            f"{path}/_log/.tmp-{uuid.uuid4().hex}.json"
        )
        out = fs.create(tmp, False)
        try:
            out.write(entry)
        finally:
            out.close()
        target = jvm.org.apache.hadoop.fs.Path(f"{path}/_log/{next_v:08d}.json")
        # rename-if-absent: the loser of a concurrent race sees False
        # (target exists) and retries against the next slot
        if not fs.exists(target) and fs.rename(tmp, target):
            return next_v
        fs.delete(tmp, False)
    raise RuntimeError(f"commit lost {max_retries} races at {path}")


def _resolve_files(spark: SparkSession, path: str, version: int | None) -> list[str]:
    versions = _list_versions(spark, path)
    if not versions:
        raise FileNotFoundError(f"no table log under {path}")
    upto = versions[-1] if version is None else version
    if upto not in versions:
        raise ValueError(f"version {upto} not in retained log {versions}")
    files: list[str] = []
    for v in versions:
        if v > upto:
            break
        entry = _read_entry(spark, path, v)
        if entry["action"] == "overwrite":
            files = list(entry["files"])
        else:
            files.extend(entry["files"])
    return [f"{path}/data/{f}" for f in files]


def table_read(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Snapshot read (latest, or time travel to ``version``): resolves
    the log once and scans the resolved file list explicitly — a
    concurrent commit cannot tear the read."""
    return spark.read.parquet(*_resolve_files(spark, path, version))


def table_history(spark: SparkSession, path: str) -> list[dict]:
    """The commit log, oldest first: version, action, file count."""
    out = []
    for v in _list_versions(spark, path):
        e = _read_entry(spark, path, v)
        out.append({"version": v, "action": e["action"], "n_files": len(e["files"])})
    return out


def table_vacuum(spark: SparkSession, path: str) -> int:
    """Delete data files referenced by NO retained version (failed
    stagings, files dropped by overwrites whose history was truncated).
    Returns the number of files removed."""
    spark_versions = _list_versions(spark, path)
    referenced: set[str] = set()
    for v in spark_versions:
        referenced.update(_read_entry(spark, path, v)["files"])
    jvm, fs = _fs(spark, path)
    data_dir = jvm.org.apache.hadoop.fs.Path(f"{path}/data")
    removed = 0
    if not fs.exists(data_dir):
        return 0
    for st in fs.listStatus(data_dir):
        name = st.getPath().getName()
        if st.isDirectory() or name not in referenced:
            fs.delete(st.getPath(), True)
            removed += 1
    return removed


def table_merge_upsert(
    spark: SparkSession, path: str, updates: DataFrame, key: str
) -> int:
    """MERGE INTO on the table format: batch rows win on key collision,
    unmatched target rows survive, the result lands as ONE atomic
    overwrite commit — readers see the pre- or post-merge snapshot,
    never a mix. Returns the new version.

    Built from ``operators.cdc.merge_upsert`` over the latest snapshot;
    the optimistic-concurrency caveat of read-modify-write applies (two
    concurrent merges serialize by commit order, the later one not
    seeing the earlier's rows — serialize merge writers per table, as
    the real formats also require for overlapping keys).
    """
    from simple_data_workflow_spark.operators.cdc import merge_upsert

    current = table_read(spark, path)
    merged = merge_upsert(current, updates, key)
    return table_commit(merged, path, mode="overwrite")


def table_compact(
    spark: SparkSession, path: str, target_file_mb: int = 128
) -> int:
    """Compact the table's CURRENT snapshot into ~``target_file_mb``
    files as one atomic overwrite commit — the log-native sibling of
    ``sinks.compact_parquet`` (no rename dance: the old fragmented
    files simply stop being referenced, stay time-travelable until
    ``table_vacuum``, and a failure mid-compaction leaves the log
    untouched). Returns the new version."""
    jvm, fs = _fs(spark, path)
    total = 0
    for f in _resolve_files(spark, path, None):
        total += fs.getFileStatus(jvm.org.apache.hadoop.fs.Path(f)).getLen()
    n_files = max(1, round(total / (target_file_mb * 1024 * 1024)))
    snapshot = table_read(spark, path).coalesce(n_files)
    return table_commit(snapshot, path, mode="overwrite")


def table_delete_where(spark: SparkSession, path: str, condition: str) -> int:
    """DELETE FROM table WHERE condition — survivors of the current
    snapshot land as one atomic overwrite commit; the pre-delete
    snapshot stays time-travelable (and physically reclaimable only via
    log truncation + vacuum, which is the audit-friendly default).
    Returns the new version."""
    survivors = table_read(spark, path).where(f"NOT ({condition})")
    return table_commit(survivors, path, mode="overwrite")


def table_truncate_history(
    spark: SparkSession, path: str, keep_last: int = 1
) -> int:
    """Drop log entries older than the last ``keep_last`` versions —
    the retention knob that makes ``table_vacuum`` able to reclaim
    space (a data file is deletable only when NO retained version
    references it).

    The oldest KEPT version must stand alone, so if it is an append
    (its snapshot depends on earlier entries) it is first rewritten in
    place as a self-contained entry listing its full resolved file set
    — an O(log) metadata rewrite, no data movement. Returns the number
    of log entries removed.
    """
    versions = _list_versions(spark, path)
    if len(versions) <= keep_last:
        return 0
    cut = versions[-keep_last]
    # make the cut version self-contained before dropping its ancestors
    entry = _read_entry(spark, path, cut)
    if entry["action"] == "append":
        files = [f.rsplit("/", 1)[1] for f in _resolve_files(spark, path, cut)]
        jvm, fs = _fs(spark, path)
        tmp = jvm.org.apache.hadoop.fs.Path(
            f"{path}/_log/.tmp-{uuid.uuid4().hex}.json"
        )
        out = fs.create(tmp, False)
        try:
            out.write(
                json.dumps(
                    {"action": "overwrite", "files": files, "schema": entry["schema"]}
                ).encode("utf-8")
            )
        finally:
            out.close()
        target = jvm.org.apache.hadoop.fs.Path(f"{path}/_log/{cut:08d}.json")
        fs.delete(target, False)
        fs.rename(tmp, target)
    jvm, fs = _fs(spark, path)
    removed = 0
    for v in versions:
        if v < cut:
            fs.delete(
                jvm.org.apache.hadoop.fs.Path(f"{path}/_log/{v:08d}.json"), False
            )
            removed += 1
    return removed


def table_update_where(
    spark: SparkSession, path: str, set_exprs: dict, condition: str
) -> int:
    """UPDATE table SET col = expr, ... WHERE condition — rows matching
    ``condition`` get each ``set_exprs`` column replaced by its SQL
    expression (evaluated against the row), all others pass through;
    one atomic overwrite commit. Completes the DML triad with
    ``table_merge_upsert`` and ``table_delete_where``."""
    from pyspark.sql import functions as F

    snap = table_read(spark, path)
    updated = snap.select(
        *[
            F.when(F.expr(condition), F.expr(set_exprs[c])).otherwise(F.col(c)).alias(c)
            if c in set_exprs
            else F.col(c)
            for c in snap.columns
        ]
    )
    return table_commit(updated, path, mode="overwrite")
