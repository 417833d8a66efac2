"""Streaming sinks — incremental upsert into partitioned parquet.

The reference has no streaming surface at all (SURVEY.md §2.2); this
completes the engine's streaming story: sources and stateful
transforms live in ``streaming.events``, and this module lands their
output incrementally into a queryable parquet "serving table" without
requiring lakehouse jars (Delta/Iceberg are env-gated in
``sources.lakehouse``; plain parquet + partition-scoped merge is the
dependency-free equivalent of MERGE INTO for the
update-mode-aggregation shape).

Scale posture: per micro-batch work is proportional to the TOUCHED
partitions only — the batch's distinct partition values are collected
(bounded by partitions-per-trigger, not data), only those partitions
are re-read and merged, and dynamic partition overwrite replaces only
those directories. The target table can be arbitrarily large; an
update touching one hour of data re-reads and rewrites one partition.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _target_exists(spark: SparkSession, path: str) -> bool:
    """Explicit existence probe via the Hadoop FileSystem API.

    Existence is checked up front — NOT inferred from a read failure —
    so that a transient FS error or schema-drift AnalysisException during
    the merge propagates and fails the streaming query, instead of being
    mistaken for "first batch" and silently overwriting touched
    partitions with batch-only rows (which would drop existing keys and
    void the idempotent-upsert guarantee)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(jpath))


def merge_upsert_partitions(
    spark: SparkSession,
    target_path: str,
    batch_df: DataFrame,
    key_cols: Sequence[str],
    partition_col: str,
) -> None:
    """Merge ``batch_df`` into a partitioned parquet target: new keys
    insert, existing keys are replaced by the batch row (batch wins) —
    MERGE INTO semantics scoped to the partitions the batch touches.

    The merge is deterministic given (target, batch), so a replayed
    micro-batch (streaming retry) converges to the same table —
    idempotent, which is what ``foreachBatch`` needs for effective
    exactly-once on top of at-least-once delivery."""
    touched = [r[0] for r in batch_df.select(partition_col).distinct().collect()]
    if not touched:
        return
    batch_df = batch_df.localCheckpoint(eager=True)  # sever from the streaming plan
    if _target_exists(spark, target_path):
        # Any failure past this point (FS flake, schema drift breaking
        # unionByName/join analysis) propagates and fails the query —
        # never fall back to batch-only, which would drop existing keys.
        existing = spark.read.parquet(target_path).where(
            F.col(partition_col).isin(touched)
        )
        keep = existing.join(
            F.broadcast(batch_df.select(*key_cols).distinct()),
            list(key_cols),
            "left_anti",
        )
        merged = keep.unionByName(batch_df)
    else:  # first batch: target doesn't exist yet
        merged = batch_df
    (
        # per-write dynamic overwrite (only touched partitions replaced)
        # instead of mutating the shared session conf, which would leak
        # into unrelated partitioned overwrites later in the session
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(target_path)
    )


def streaming_upsert_sink(
    stream_df: DataFrame,
    target_path: str,
    checkpoint_dir: str,
    key_cols: Sequence[str],
    partition_col: str,
):
    """Update-mode streaming aggregation → incrementally-maintained
    parquet serving table via ``foreachBatch`` + partition-scoped merge.

    Update mode emits only the keys whose aggregate changed each
    trigger; the merge folds them into the target so the table always
    holds the LATEST value per key — a continuously materialized view
    of the aggregation, queryable by any batch reader mid-stream.
    Returns the started ``StreamingQuery``."""

    def fold(batch_df: DataFrame, _batch_id: int) -> None:
        merge_upsert_partitions(
            batch_df.sparkSession, target_path, batch_df, key_cols, partition_col
        )

    return (
        stream_df.writeStream.outputMode("update")
        .foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def _list_versions(spark: SparkSession, state_path: str) -> list[int]:
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(state_path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return []
    out = []
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if name.startswith("v="):
            out.append(int(name[2:]))
    return sorted(out)


def read_materialized_agg(spark: SparkSession, state_path: str) -> DataFrame:
    """Latest version of a :func:`streaming_incremental_agg` state table."""
    versions = _list_versions(spark, state_path)
    if not versions:
        raise FileNotFoundError(f"no materialized state under {state_path}")
    return spark.read.parquet(f"{state_path}/v={versions[-1]}")


def apply_incremental_batch(
    spark: SparkSession,
    state_path: str,
    batch_df: DataFrame,
    batch_id: int,
    group_cols: Sequence[str],
    val_col: str,
    keep_versions: int = 2,
) -> None:
    """Fold one append-only micro-batch into a versioned grouped
    SUM/COUNT state table via ``operators.cdc.incremental_agg_apply``.

    Idempotence (the foreachBatch exactly-once contract): each applied
    batch writes a NEW immutable version directory ``v=<batch_id>``; a
    replayed batch id that is <= the newest version is a no-op, so
    at-least-once delivery still converges to one application per
    batch. Readers always see a complete version (the newest fully
    written dir); ``keep_versions`` old versions are retained for
    readers in flight, older ones pruned.

    Per-batch cost: the batch aggregates map-side to one delta row per
    TOUCHED group, the merge joins state only against that delta set —
    O(|state|) scan + O(|touched|) shuffle, never a re-aggregation of
    history. This is the streaming materialized view pattern for
    grouped aggregates too large (or too late-arriving) for
    watermarked update-mode state.
    """
    from simple_data_workflow_spark.operators.cdc import incremental_agg_apply

    versions = _list_versions(spark, state_path)
    if versions and batch_id <= versions[-1]:
        return  # replayed batch — already folded
    cdc = batch_df.select(
        *group_cols,
        F.lit("I").alias("op"),
        F.lit(None).cast(batch_df.schema[val_col].dataType).alias("old_val"),
        F.col(val_col).alias("new_val"),
    )
    if versions:
        state = spark.read.parquet(f"{state_path}/v={versions[-1]}")
    else:
        state = cdc.sparkSession.createDataFrame(
            [],
            cdc.select(
                *group_cols,
                F.col("new_val").alias("sum_val"),
                F.lit(0).cast("long").alias("n_rows"),
            ).schema,
        )
    merged = incremental_agg_apply(state, cdc, list(group_cols))
    merged.write.mode("overwrite").parquet(f"{state_path}/v={batch_id}")
    # prune old versions, keeping the newest `keep_versions`
    jvm = spark._jvm
    fs = jvm.org.apache.hadoop.fs.Path(state_path).getFileSystem(
        spark._jsc.hadoopConfiguration()
    )
    for old in versions[:-keep_versions] if keep_versions else versions:
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{state_path}/v={old}"), True)


def streaming_incremental_agg(
    stream_df: DataFrame,
    state_path: str,
    checkpoint_dir: str,
    group_cols: Sequence[str],
    val_col: str,
):
    """Append-only stream → incrementally-maintained grouped SUM/COUNT
    parquet table (:func:`apply_incremental_batch` per micro-batch).
    Returns the started ``StreamingQuery``; read the current state with
    :func:`read_materialized_agg`."""

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        apply_incremental_batch(
            batch_df.sparkSession,
            state_path,
            batch_df.localCheckpoint(eager=True),
            batch_id,
            group_cols,
            val_col,
        )

    return (
        stream_df.writeStream.outputMode("append")
        .foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def streaming_table_append_sink(
    stream_df: DataFrame,
    table_path: str,
    checkpoint_dir: str,
):
    """Append-mode stream → transaction-log table via ``foreachBatch``
    + ``table_commit`` — the SESSION-FUL twin of
    ``writeStream.format("tablelog")`` that ENFORCES CHECK constraints
    (round 9, VERDICT r8 #7): ``table_commit`` evaluates the table's
    current constraint set against the whole micro-batch in one
    aggregate BEFORE any byte stages, so a violating batch fails the
    query atomically — the table never advances, nothing is torn
    (the Arrow sink runs session-free and cannot evaluate Spark SQL
    expressions; it documents this exact boundary). Exactly-once via
    the same ``stream_batch_id`` replay dedup the Arrow sink uses —
    a restarted query re-offering a committed batch is a no-op.
    Schema evolution and bloom/partition specs inherit from the table
    like any batch append.

    Replay dedup is scoped per query (round 10, ADVICE r9): the app id
    derives from ``checkpoint_dir`` — Delta's ``(txnAppId, txnVersion)``
    shape — so a pipeline restarted with a FRESH checkpoint (batch ids
    reset to 0) no longer collides with committed history and silently
    drops its first batches, and two queries can append to one table.
    A tiny high-water-mark file in the checkpoint dir carries the
    newest committed batch id OUTSIDE the table log, so even after
    ``table_truncate_history`` erases the in-log dedup evidence, a
    replayed old batch is still recognized and skipped."""
    import hashlib
    import json as _json

    from simple_data_workflow_spark.sources.tablelog import table_commit

    app_id = hashlib.md5(
        checkpoint_dir.rstrip("/").encode("utf-8")
    ).hexdigest()[:16]

    def _hwm_path(jvm):
        return jvm.org.apache.hadoop.fs.Path(f"{checkpoint_dir}/_tablelog_hwm")

    def _read_hwm(spark: SparkSession) -> int:
        jvm = spark._jvm
        fs = _hwm_path(jvm).getFileSystem(spark._jsc.hadoopConfiguration())
        if not fs.exists(_hwm_path(jvm)):
            return -1
        stream = fs.open(_hwm_path(jvm))
        try:
            data = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
        finally:
            stream.close()
        rec = _json.loads(data.decode("utf-8"))
        return int(rec["hwm"]) if rec.get("app_id") == app_id else -1

    def _write_hwm(spark: SparkSession, batch_id: int) -> None:
        jvm = spark._jvm
        fs = _hwm_path(jvm).getFileSystem(spark._jsc.hadoopConfiguration())
        out = fs.create(_hwm_path(jvm), True)  # overwrite: monotonic value
        try:
            out.write(
                _json.dumps({"app_id": app_id, "hwm": int(batch_id)}).encode()
            )
        finally:
            out.close()

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_id <= _read_hwm(spark):
            return  # committed before (hwm survives log truncation)
        table_commit(
            batch_df.localCheckpoint(eager=True),
            table_path,
            mode="append",
            stream_batch_id=batch_id,
            stream_app_id=app_id,
        )
        _write_hwm(spark, batch_id)

    return (
        stream_df.writeStream.outputMode("append")
        .foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def streaming_table_upsert_sink(
    stream_df: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    key_cols: Sequence[str],
):
    """Update-mode streaming aggregation → transaction-log table
    (``sources.tablelog``): every micro-batch lands as ONE atomic
    commit, so any concurrent batch reader sees a complete snapshot —
    the strictly-stronger sibling of ``streaming_upsert_sink``'s
    partition-scoped overwrite (which can expose a half-written
    partition set to a reader racing the merge). Each historical
    micro-batch also stays time-travelable. Single-key MERGE semantics
    via ``table_merge_upsert``; the merge serializes per table, which
    foreachBatch's sequential batch execution guarantees."""
    from simple_data_workflow_spark.sources.tablelog import (
        _list_log,
        table_commit,
        table_merge_upsert,
    )

    if len(list(key_cols)) != 1:
        raise ValueError("streaming_table_upsert_sink supports a single key column")
    key = list(key_cols)[0]

    def fold(batch_df: DataFrame, _batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df = batch_df.localCheckpoint(eager=True)
        if any(_list_log(spark, table_path)):
            table_merge_upsert(spark, table_path, batch_df, key)
        else:
            table_commit(batch_df, table_path, mode="append")

    return (
        stream_df.writeStream.outputMode("update")
        .foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def streaming_delta_append_sink(
    stream_df: DataFrame,
    table_path: str,
    checkpoint_dir: str,
):
    """Append-mode stream → spec-conformant DELTA table via
    ``foreachBatch`` + the jar-free ``sources.delta_writer`` (round 10
    second half) — the lakehouse-interop twin of
    ``streaming_table_append_sink``. Exactly-once lands on the Delta
    spec's OWN mechanism: every micro-batch commit carries a ``txn``
    action ``(appId, version=batch_id)`` (appId derived from the
    checkpoint dir, the same per-query scoping as the tablelog sink),
    and ``delta_write`` no-ops any batch whose ``txn`` high-water mark
    the log already records — so a restarted query re-offering a
    committed batch is skipped by the TABLE, not by sink-local state,
    exactly how Delta's streaming sink and foreachBatch idempotent
    writes behave. The dedup evidence survives checkpointing because
    ``delta_checkpoint`` carries ``txn`` actions. A real Delta runtime
    replaying this log sees the same appId/version pairs."""
    import hashlib

    from simple_data_workflow_spark.sources.delta_writer import delta_write

    app_id = "sdw-stream-" + hashlib.md5(
        checkpoint_dir.rstrip("/").encode("utf-8")
    ).hexdigest()[:16]

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        # append creates the table on first batch; NEVER overwrite —
        # a fresh-checkpoint restart against an existing table must
        # add data, not wipe it
        delta_write(
            batch_df.localCheckpoint(eager=True),
            table_path,
            mode="append",
            txn=(app_id, int(batch_id)),
        )

    return (
        stream_df.writeStream.outputMode("append")
        .foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
