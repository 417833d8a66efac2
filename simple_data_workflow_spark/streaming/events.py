"""Structured Streaming over the events table.

The reference has no streaming surface (SURVEY.md §2.2) — this is the
engine extension: watermarked tumbling-window aggregation and a
stateful per-user sessionizer. Batch twins of these queries live in
``plans.relational`` (windowed_event_counts / sessionize_events) and
are oracle-checked; the streaming path is verified in tests by driving
a bounded parquet stream to completion with ``processAllAvailable``
and comparing against the batch result.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

def read_event_stream(spark: SparkSession, path: str, max_files: int = 1) -> DataFrame:
    """File-source stream (schema required for streaming reads). In
    production this is Kafka; the source swap does not change the plan
    below it.

    The schema is sniffed from a batch read of the same path rather than
    hardcoded: the testdata's ``ts`` encoding has drifted across
    generations (TIMESTAMP(NANOS)-as-long vs timestamp[us] NTZ), and a
    hardcoded LongType read of an NTZ file silently yields raw
    epoch-micros — wrong answers, no exception. Sniff + shared
    normalizer makes the stream's ``ts`` identical to the batch
    ``load_events`` output whatever the file says."""
    from ..sources.readers import normalize_events_ts

    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    schema = spark.read.parquet(path).schema
    if os.path.isfile(path):
        # FileStreamSource wants a directory; stage a symlink dir for the
        # single-file testdata case (a real deployment streams a dir/Kafka)
        stage = tempfile.mkdtemp(prefix="sdw-stream-")
        link = os.path.join(stage, os.path.basename(path))
        os.symlink(path, link)
        path = stage
    raw = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .load(path)
    )
    return normalize_events_ts(raw)


def windowed_counts_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour windows with late-data watermarking: counts +
    value totals per (window, event_type). With the watermark, state for
    closed windows is dropped — bounded memory on an unbounded stream."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


def run_stream_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append"):
    """Drive a bounded stream to completion into an in-memory sink
    (test/smoke harness; production sinks are kafka/parquet/foreachBatch)."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return q


def dedup_stream(
    events: DataFrame,
    keys: tuple[str, ...] = ("user_id", "event_type"),
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact deduplication — the streaming twin of
    ``llmdata.dedup.exact_dedup``: the first arrival per key wins, and
    ``dropDuplicatesWithinWatermark`` ages key state out once the event
    time watermark passes, so state stays bounded on an unbounded stream
    (a plain ``dropDuplicates`` would grow state forever)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def error_click_join_stream(
    events: DataFrame, gap: str = "5 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Stream-stream inner join: each click joined to error events of the
    same user within ``[error_ts, error_ts + gap)`` — the streaming
    sibling of ``operators.joins.interval_join``.

    Both sides carry watermarks AND the join condition bounds event time,
    which is what lets Spark expire buffered rows from join state; a
    stream-stream join without the time bound accumulates state forever.
    Both inputs can branch from one source stream."""
    errors = events.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("e_ts"),
    ).withWatermark("e_ts", watermark)
    clicks = events.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("c_ts"),
        "value",
    ).withWatermark("c_ts", watermark)
    cond = (
        (F.col("user_id") == F.col("e_user"))
        & (F.col("c_ts") >= F.col("e_ts"))
        & (F.col("c_ts") < F.col("e_ts") + F.expr(f"INTERVAL {gap}"))
    )
    return clicks.join(errors, cond).select(
        "click_id", "error_id", "user_id", "c_ts", "e_ts", "value"
    )


SESSION_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_sessions", LongType()),
        StructField("n_events", LongType()),
    ]
)

SESSION_STATE = StructType(
    [
        StructField("last_ts", DoubleType()),
        StructField("n_sessions", LongType()),
        StructField("n_events", LongType()),
    ]
)


def sessionize_stream(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    session counting with a gap threshold.

    State = (last event time, session count, event count) per user —
    O(users) memory regardless of stream length. Each micro-batch gets
    the user's new events as pandas batches (Arrow transfer); emits the
    running totals in update mode. The batch twin is
    plans.relational.sessionize_events (oracle-checked)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        ts_list = []
        for pdf in pdfs:
            ts_list.extend(
                (t.timestamp(), e) for t, e in zip(pdf["ts"], pdf["event_id"])
            )
        ts_list.sort()
        if state.exists:
            last_ts, n_sessions, n_events = state.get
        else:
            last_ts, n_sessions, n_events = None, 0, 0
        for t, _e in ts_list:
            if last_ts is None or t - last_ts > gap_s:
                n_sessions += 1
            last_ts = t
            n_events += 1
        state.update((last_ts, n_sessions, n_events))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_sessions": [n_sessions], "n_events": [n_events]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SESSION_OUTPUT,
        stateStructType=SESSION_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
