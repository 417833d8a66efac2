"""Jar-free Apache Hudi COPY-ON-WRITE write interop (round 10).

Companion to ``sources.hudi_reader``: emits the public Hudi CoW layout
— data files named ``<fileId>_<writeToken>_<instant>.parquet`` carrying
the ``_hoodie_*`` meta columns, per-partition
``.hoodie_partition_metadata``, ``hoodie.properties``, and a classic
timeline where the COMPLETED ``<instant>.commit`` file (JSON
``partitionToWriteStats``) is the atomic publish point (written
if-absent — a lost instant race retries with a fresh instant for
appends and raises for overwrites).

Modes:

- ``error`` (create) / ``append``: each staged task file becomes a NEW
  file group (insert semantics — Hudi's ``bulk_insert`` shape; upserts
  into existing groups are the reader+MERGE flow's job).
- ``overwrite``: new file groups plus a ``replacecommit`` whose
  ``partitionToReplaceFileIds`` retires every prior live group —
  Hudi's own ``insert_overwrite_table`` mechanism, and older instants
  stay time-travelable exactly like the reader's ``as_of`` contract.

Deviations, documented: ``_hoodie_file_name`` is stamped with the file
group id rather than the final physical name (task file names are not
known until after the distributed write; CoW readers resolve files by
NAME CONVENTION + timeline, not by this informational column), and
``_hoodie_commit_seqno`` is ``<instant>_<monotonic id>``.

Scale posture: data movement is Spark's normal distributed parquet
write; instants are monotonically increasing timestamps; everything
after staging is metadata-sized and driver-side.
"""

from __future__ import annotations

import json
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from simple_data_workflow_spark.sources.delta_reader import _jfs
from simple_data_workflow_spark.sources.hudi_reader import (
    hudi_snapshot_files,
    load_table_properties,
)


class HudiConcurrentWrite(RuntimeError):
    """Another writer committed the instant this write targeted."""


_META_COLS = [
    "_hoodie_commit_time",
    "_hoodie_commit_seqno",
    "_hoodie_record_key",
    "_hoodie_partition_path",
    "_hoodie_file_name",
]


def _next_instant(spark: SparkSession, path: str) -> str:
    """Hudi instant time: ``yyyyMMddHHmmssSSS``; strictly greater than
    every existing timeline entry (same-millisecond writers bump)."""
    jvm, fs = _jfs(spark, path)
    existing = set()
    hd = jvm.org.apache.hadoop.fs.Path(f"{path}/.hoodie")
    if fs.exists(hd):
        import re

        for st in fs.listStatus(hd):
            m = re.match(r"^(\d+)\.", st.getPath().getName())
            if m:
                existing.add(m.group(1))
    t = time.strftime("%Y%m%d%H%M%S") + f"{int(time.time() * 1000) % 1000:03d}"
    while t in existing:
        t = str(int(t) + 1)
    return t


def _publish_instant_if_absent(
    spark: SparkSession, path: str, name: str, body: str
) -> bool:
    jvm, fs = _jfs(spark, path)
    hd = f"{path}/.hoodie"
    fs.mkdirs(jvm.org.apache.hadoop.fs.Path(hd))
    tmp = jvm.org.apache.hadoop.fs.Path(f"{hd}/.tmp-{uuid.uuid4().hex}")
    out = fs.create(tmp, False)
    try:
        out.write(body.encode("utf-8"))
    finally:
        out.close()
    target = jvm.org.apache.hadoop.fs.Path(f"{hd}/{name}")
    scheme = target.toUri().getScheme()
    if scheme in (None, "file"):
        t_nio = jvm.java.io.File(target.toUri().getPath()).toPath()
        s_nio = jvm.java.io.File(tmp.toUri().getPath()).toPath()
        try:
            jvm.java.nio.file.Files.createLink(t_nio, s_nio)
            won = True
        except Exception:
            won = False
        fs.delete(tmp, False)
        return won
    if fs.exists(target):
        fs.delete(tmp, False)
        return False
    won = fs.rename(tmp, target)
    if not won:
        fs.delete(tmp, False)
    return won


def hudi_write(
    df: DataFrame,
    path: str,
    mode: str = "error",
    record_key: str | list[str] = "id",
    partition_by: list[str] | None = None,
) -> str:
    """Write ``df`` as a spec-layout Hudi copy-on-write table without
    the Hudi jar; returns the committed instant time. See the module
    docstring for modes and documented deviations."""
    if mode not in ("error", "append", "overwrite"):
        raise ValueError(f"unsupported mode {mode!r}")
    spark = df.sparkSession
    keys = [record_key] if isinstance(record_key, str) else list(record_key)
    missing = [k for k in keys if k not in df.columns]
    if missing:
        raise ValueError(f"record key columns not in DataFrame: {missing}")
    try:
        props = load_table_properties(spark, path)
        exists = True
    except FileNotFoundError:
        props, exists = {}, False
    if exists and mode == "error":
        raise ValueError(f"Hudi table already exists at {path} (mode='error')")
    if exists:
        partition_by = [
            p
            for p in (
                props.get("hoodie.table.partition.fields", "") or ""
            ).split(",")
            if p
        ]
    partition_by = list(partition_by or [])

    instant = _next_instant(spark, path)
    # previous live groups (for overwrite retirement), resolved BEFORE
    # the new files land
    replaced: dict[str, set[str]] = {}
    if exists and mode == "overwrite":
        for part, fid in _live_groups(spark, path):
            replaced.setdefault(part, set()).add(fid)
    op = "INSERT" if mode != "overwrite" else "INSERT_OVERWRITE_TABLE"
    return _insert_batch(
        df, path, keys, partition_by, replaced, exists, instant, op
    )


def _live_groups(spark: SparkSession, path: str):
    """(partition relpath, fileId) of every live file group."""
    jvm, _ = _jfs(spark, path)
    root_local = jvm.org.apache.hadoop.fs.Path(path).toUri().getPath()
    for f in hudi_snapshot_files(spark, path):
        name = f.rsplit("/", 1)[1]
        fid = name.split("_", 1)[0]
        rel = f[len(root_local) + 1 :]
        part = rel.rsplit("/", 1)[0] if "/" in rel else ""
        yield part, fid


def _insert_batch(
    df: DataFrame,
    path: str,
    keys: list[str],
    partition_by: list[str],
    replaced: dict,
    exists: bool,
    instant: str,
    operation: str,
) -> str:
    """Enrich with meta columns, stage distributed, move into
    spec-named file groups, publish the timeline instant if-absent
    (``replacecommit`` when groups retire, ``commit`` otherwise)."""
    spark = df.sparkSession
    # ---- meta columns + staging --------------------------------------
    key_expr = F.concat_ws(",", *[F.col(k).cast("string") for k in keys])
    part_path_expr = (
        F.concat_ws(
            "/",
            *[
                F.concat(
                    F.lit(f"{c}="),
                    F.coalesce(
                        F.col(c).cast("string"),
                        F.lit("__HIVE_DEFAULT_PARTITION__"),
                    ),
                )
                for c in partition_by
            ],
        )
        if partition_by
        else F.lit("")
    )
    file_id = uuid.uuid4().hex  # one logical group id per write batch
    enriched = df.select(
        F.lit(instant).alias("_hoodie_commit_time"),
        F.concat(
            F.lit(instant + "_"), F.monotonically_increasing_id().cast("string")
        ).alias("_hoodie_commit_seqno"),
        key_expr.alias("_hoodie_record_key"),
        part_path_expr.alias("_hoodie_partition_path"),
        F.lit(file_id).alias("_hoodie_file_name"),
        *df.columns,
    )
    shadows = []
    for c in partition_by:
        sh = f"__hudipart_{c}"
        enriched = enriched.withColumn(sh, F.col(c))
        shadows.append(sh)
    staging = f"{path}/.staging-{uuid.uuid4().hex}"
    writer = enriched.write.mode("overwrite")
    if shadows:
        writer = writer.partitionBy(*shadows)
    writer.parquet(staging)

    jvm, fs = _jfs(spark, path)
    staging_local = jvm.org.apache.hadoop.fs.Path(staging).toUri().getPath()

    def walk(p):
        for st in fs.listStatus(jvm.org.apache.hadoop.fs.Path(p)):
            if st.isDirectory():
                yield from walk(str(st.getPath().toUri().getPath()))
            else:
                yield st

    write_stats: dict[str, list[dict]] = {}
    seq = 0
    for st in walk(staging):
        full = str(st.getPath().toUri().getPath())
        name = full.rsplit("/", 1)[1]
        if not name.endswith(".parquet"):
            continue
        rel = full[len(staging_local) + 1 :]
        segs = rel.split("/")
        clean = []
        for seg in segs[:-1]:
            k, _, v = seg.partition("=")
            if k.startswith("__hudipart_"):
                k = k[len("__hudipart_") :]
            clean.append(f"{k}={v}")
        part = "/".join(clean)
        fid = f"{file_id}-{seq}"
        seq += 1
        new_name = f"{fid}_0-{seq}-0_{instant}.parquet"
        dest_dir = f"{path}/{part}" if part else path
        fs.mkdirs(jvm.org.apache.hadoop.fs.Path(dest_dir))
        dest = f"{dest_dir}/{new_name}"
        if not fs.rename(
            jvm.org.apache.hadoop.fs.Path(full),
            jvm.org.apache.hadoop.fs.Path(dest),
        ):
            raise IOError(f"failed to move staged file into table: {rel}")
        # per-partition marker the Hudi reader stack expects
        pm = jvm.org.apache.hadoop.fs.Path(
            f"{dest_dir}/.hoodie_partition_metadata"
        )
        if not fs.exists(pm):
            out = fs.create(pm, False)
            try:
                out.write(
                    (
                        "#partition metadata\n"
                        f"commitTime={instant}\n"
                        f"partitionDepth={len(clean)}\n"
                    ).encode()
                )
            finally:
                out.close()
        write_stats.setdefault(part, []).append(
            {
                "fileId": fid,
                "path": f"{part}/{new_name}" if part else new_name,
                "fileSizeInBytes": int(st.getLen()),
            }
        )
    fs.delete(jvm.org.apache.hadoop.fs.Path(staging), True)

    if not exists:
        fs.mkdirs(jvm.org.apache.hadoop.fs.Path(f"{path}/.hoodie"))
        props_body = (
            "#Updated at write time\n"
            "hoodie.table.name=" + path.rstrip("/").rsplit("/", 1)[1] + "\n"
            "hoodie.table.type=COPY_ON_WRITE\n"
            "hoodie.table.version=6\n"
            "hoodie.table.recordkey.fields=" + ",".join(keys) + "\n"
            "hoodie.table.partition.fields=" + ",".join(partition_by) + "\n"
        )
        out = fs.create(
            jvm.org.apache.hadoop.fs.Path(f"{path}/.hoodie/hoodie.properties"),
            True,
        )
        try:
            out.write(props_body.encode())
        finally:
            out.close()

    meta = {
        "partitionToWriteStats": write_stats,
        "operationType": operation,
    }
    if replaced:
        meta["partitionToReplaceFileIds"] = {
            p: sorted(ids) for p, ids in replaced.items()
        }
        action = "replacecommit"
    else:
        action = "commit"
    if not _publish_instant_if_absent(
        spark, path, f"{instant}.{action}", json.dumps(meta, indent=2)
    ):
        raise HudiConcurrentWrite(
            f"instant {instant} at {path} was committed by another writer"
        )
    return instant


def hudi_upsert(
    spark: SparkSession,
    path: str,
    source: DataFrame,
) -> str:
    """UPSERT into an existing Hudi CoW table by its record key —
    delete-insert semantics published as ONE atomic ``replacecommit``:
    file groups containing matched keys retire
    (``partitionToReplaceFileIds``), their unmatched rows rewrite into
    new groups alongside every source row, and readers flip from the
    old groups to the new ones at the single timeline instant — the
    same mechanism Hudi's own clustering/insert_overwrite uses, so
    snapshot isolation and ``as_of`` time travel hold throughout.
    Record-key columns come from ``hoodie.properties``. Unmatched file
    groups are untouched (write volume ∝ affected groups)."""
    props = load_table_properties(spark, path)
    keys = [
        k
        for k in (props.get("hoodie.table.recordkey.fields", "") or "").split(",")
        if k
    ]
    if not keys:
        raise ValueError(
            "hoodie.table.recordkey.fields missing — cannot upsert "
            "without record keys"
        )
    partition_by = [
        p
        for p in (props.get("hoodie.table.partition.fields", "") or "").split(",")
        if p
    ]
    missing = [k for k in keys if k not in source.columns]
    if missing:
        raise ValueError(f"record key columns not in source: {missing}")

    files = hudi_snapshot_files(spark, path)
    jvm, _ = _jfs(spark, path)
    root_local = jvm.org.apache.hadoop.fs.Path(path).toUri().getPath()
    snap = (
        spark.read.parquet(*files)
        .withColumn("__file", F.col("_metadata.file_path"))
    )
    data_cols = [
        c for c in snap.columns if c not in _META_COLS and c != "__file"
    ]
    src = source.select(*data_cols).localCheckpoint(eager=True)
    key_df = src.select(*keys).distinct()
    hit = (
        snap.join(key_df, keys, "left_semi")
        .select("__file")
        .distinct()
        .collect()
    )
    if not hit:
        # nothing matched: a plain insert commit
        instant = _next_instant(spark, path)
        return _insert_batch(
            src, path, keys, partition_by, {}, True, instant, "UPSERT"
        )
    import urllib.parse as _up

    replaced: dict[str, set[str]] = {}
    hit_paths = sorted({r["__file"] for r in hit})
    for p_ in hit_paths:
        local = _up.urlparse(p_).path
        name = local.rsplit("/", 1)[1]
        fid = name.split("_", 1)[0]
        rel = local[len(root_local) + 1 :]
        part = rel.rsplit("/", 1)[0] if "/" in rel else ""
        replaced.setdefault(part, set()).add(fid)
    remainder = (
        snap.where(F.col("__file").isin(*hit_paths))
        .select(*data_cols)
        .join(key_df, keys, "left_anti")
    )
    batch = remainder.unionByName(src)
    instant = _next_instant(spark, path)
    return _insert_batch(
        batch, path, keys, partition_by, replaced, True, instant, "UPSERT"
    )
