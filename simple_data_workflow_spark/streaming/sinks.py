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
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
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
        merged.write.mode("overwrite")
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
