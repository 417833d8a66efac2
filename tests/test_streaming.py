"""Structured Streaming: bounded stream == batch twin on sf0.001."""


from simple_data_workflow_spark.plans.relational import windowed_event_counts
from simple_data_workflow_spark.streaming.events import (
    read_event_stream,
    run_stream_to_memory,
    windowed_counts_stream,
)

SF = "/root/testdata/sf0.001"


def test_stream_matches_batch(spark):
    stream = read_event_stream(spark, f"{SF}/events.parquet")
    agg = windowed_counts_stream(stream)
    run_stream_to_memory(agg, "win_counts", output_mode="complete")
    got = {
        (str(r["window_start"]), r["event_type"]): (r["n"], round(r["total_value"], 4))
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    batch = windowed_event_counts(spark, SF).collect()
    want = {
        (str(r["window_start"]), r["event_type"]): (r["n"], round(r["total_value"], 4))
        for r in batch
    }
    assert got == want


def test_stream_is_streaming(spark):
    stream = read_event_stream(spark, f"{SF}/events.parquet")
    assert stream.isStreaming


def test_stateful_sessionizer_matches_batch(spark):
    from simple_data_workflow_spark.plans.relational import sessionize_events
    from simple_data_workflow_spark.streaming.events import sessionize_stream

    stream = read_event_stream(spark, f"{SF}/events.parquet")
    out = sessionize_stream(stream)
    run_stream_to_memory(out, "sessions_stateful", output_mode="update")
    # single micro-batch → final update per user == batch sessionization
    got = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in spark.sql("SELECT * FROM sessions_stateful").collect()
    }
    want = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in sessionize_events(spark, SF).collect()
    }
    assert got == want


def test_foreachbatch_parquet_sink(spark, tmp_path):
    """Exactly-once-style sink: foreachBatch writing idempotent per-epoch
    parquet (the pattern for sinks without native streaming support)."""
    from simple_data_workflow_spark.streaming.events import (
        read_event_stream,
        windowed_counts_stream,
    )

    out_dir = str(tmp_path / "stream_out")
    stream = windowed_counts_stream(read_event_stream(spark, f"{SF}/events.parquet"))

    def write_epoch(batch_df, epoch_id):
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/epoch={epoch_id}")

    q = (
        stream.writeStream.outputMode("update")
        .foreachBatch(write_epoch)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    back = spark.read.parquet(f"{out_dir}/epoch=0")
    assert back.count() > 0
    assert set(back.columns) == {"window_start", "event_type", "n", "total_value"}
