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


def test_streaming_upsert_sink_converges_to_batch(spark, tmp_path):
    """Multi-batch update-mode aggregation through the partition-scoped
    merge sink: keys updated across micro-batches must hold their LATEST
    aggregate in the target table, equal to the one-shot batch result."""
    import datetime as dt
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from simple_data_workflow_spark.streaming.events import windowed_counts_stream
    from simple_data_workflow_spark.streaming.sinks import streaming_upsert_sink

    src = tmp_path / "src"
    os.makedirs(src)

    def write_batch(name, rows):
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ).coalesce(1).write.mode("overwrite").parquet(str(src / name))
        part = glob.glob(str(src / name / "part-*.parquet"))[0]
        shutil.move(part, str(src / f"{name}.parquet"))
        shutil.rmtree(str(src / name))

    def t(hour, minute=0):
        return dt.datetime(2024, 1, 1, hour, minute)

    # batch 1 seeds two windows; batch 2 updates one of them (same key)
    # and adds a new event_type in the other — the merge must replace the
    # updated key and keep the untouched keys in the same partition
    write_batch(
        "b1",
        [
            (1, t(10, 5), 1, "click", 1.0, "{}"),
            (2, t(10, 20), 2, "view", 2.0, "{}"),
            (3, t(11, 5), 1, "click", 3.0, "{}"),
        ],
    )

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(str(src))
    )
    agg = windowed_counts_stream(stream, watermark="10 hours")
    target = str(tmp_path / "serving")
    q = streaming_upsert_sink(
        agg,
        target,
        str(tmp_path / "ckpt"),
        key_cols=("window_start", "event_type"),
        partition_col="window_start",
    )
    q.processAllAvailable()
    write_batch("b2", [(4, t(10, 40), 3, "click", 5.0, "{}")])
    q.processAllAvailable()
    q.stop()

    got = {
        (str(r["window_start"]), r["event_type"]): (r["n"], r["total_value"])
        for r in spark.read.parquet(target).collect()
    }
    batch_events = spark.read.parquet(str(src))
    want = {
        (str(r["window_start"]), r["event_type"]): (r["n"], r["total_value"])
        for r in batch_events.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
        .collect()
    }
    assert got == want
    # the 10:00 click key was updated in place (n=2), view kept untouched
    assert got[("2024-01-01 10:00:00", "click")][0] == 2
    assert got[("2024-01-01 10:00:00", "view")][0] == 1


def test_watermark_drops_late_data(spark, tmp_path):
    """Append-mode windowed agg with a watermark: a row arriving far
    behind the advanced watermark is dropped; windows only emit once
    finalized."""
    import datetime as dt
    import os

    from simple_data_workflow_spark.streaming.events import windowed_counts_stream

    src = tmp_path / "src"
    os.makedirs(src)

    def write_batch(name, rows):
        spark.createDataFrame(
            rows, "event_id long, ts long, user_id long, event_type string, value double, props string"
        ).coalesce(1).write.mode("overwrite").parquet(str(src / name))
        # move the parquet part file into the source dir as one batch file
        import glob
        import shutil

        part = glob.glob(str(src / name / "part-*.parquet"))[0]
        shutil.move(part, str(src / f"{name}.parquet"))
        shutil.rmtree(str(src / name))

    def ns(hour, minute=0):
        return int(dt.datetime(2024, 1, 1, hour, minute).timestamp() * 1_000_000_000)

    # batch 1: events at 10:xx and 13:xx → watermark advances to 11:00
    write_batch("b1", [(1, ns(10, 5), 1, "click", 1.0, "{}"), (2, ns(13, 5), 1, "click", 1.0, "{}")])

    from pyspark.sql import functions as F

    # this test's synthetic batch files store ts as epoch-nanos long
    # (write_batch above) — declare that shape inline
    long_ts_schema = (
        "event_id long, ts long, user_id long, event_type string, "
        "value double, props string"
    )
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    stream = (
        spark.readStream.format("parquet")
        .schema(long_ts_schema)
        .option("maxFilesPerTrigger", 1)
        .load(str(src))
        .withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    )
    agg = windowed_counts_stream(stream, watermark="2 hours")
    q = agg.writeStream.outputMode("append").format("memory").queryName("wm_test").start()
    q.processAllAvailable()
    # batch 2: a very late row (05:xx — far below the 11:00 watermark)
    write_batch("b2", [(3, ns(5, 30), 1, "click", 1.0, "{}"), (4, ns(14, 5), 1, "click", 1.0, "{}")])
    q.processAllAvailable()
    q.stop()
    got = {str(r["window_start"]) for r in spark.sql("SELECT * FROM wm_test").collect()}
    # the 05:00 window must never appear: its data arrived after the
    # watermark passed it (append mode only emits finalized windows)
    assert not any("05:00" in w for w in got)


def test_session_window_matches_sessionize(spark):
    """session_window (gap-based) in batch mode agrees with the explicit
    lag+cumsum sessionizer on session counts per user."""
    from pyspark.sql import functions as F

    from simple_data_workflow_spark.sources.readers import load_table
    from simple_data_workflow_spark.plans.relational import sessionize_events

    ev = load_table(spark, SF, "events")
    sw = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .count()
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
    )
    got = {r["user_id"]: r["n_sessions"] for r in sw.collect()}
    want = {r["user_id"]: r["n_sessions"] for r in sessionize_events(spark, SF).collect()}
    assert got == want


def test_dedup_stream_matches_batch_distinct(spark):
    """Streaming dropDuplicatesWithinWatermark == batch first-per-key on a
    bounded stream."""
    from simple_data_workflow_spark.sources.readers import load_table
    from simple_data_workflow_spark.streaming.events import dedup_stream

    stream = read_event_stream(spark, f"{SF}/events.parquet")
    out = dedup_stream(stream, keys=("user_id", "event_type"))
    run_stream_to_memory(out, "dedup_stream_t", output_mode="append")
    got = spark.sql("SELECT COUNT(*) AS n FROM dedup_stream_t").first()["n"]
    want = load_table(spark, SF, "events").dropDuplicates(["user_id", "event_type"]).count()
    assert got == want
    # emitted keys are unique
    dup = spark.sql(
        "SELECT user_id, event_type FROM dedup_stream_t GROUP BY 1,2 HAVING COUNT(*) > 1"
    ).count()
    assert dup == 0


def test_stream_stream_join_matches_batch(spark):
    """Watermarked, time-bounded stream-stream join == the same join in
    batch mode over a bounded source."""
    from pyspark.sql import functions as F

    from simple_data_workflow_spark.sources.readers import load_table
    from simple_data_workflow_spark.streaming.events import error_click_join_stream

    stream = read_event_stream(spark, f"{SF}/events.parquet")
    out = error_click_join_stream(stream)
    run_stream_to_memory(out, "ss_join_t", output_mode="append")
    got = {
        (r["click_id"], r["error_id"])
        for r in spark.sql("SELECT click_id, error_id FROM ss_join_t").collect()
    }
    ev = load_table(spark, SF, "events")
    errors = ev.where("event_type = 'error'").select(
        F.col("event_id").alias("error_id"), F.col("user_id").alias("e_user"), F.col("ts").alias("e_ts")
    )
    clicks = ev.where("event_type = 'click'").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("c_ts")
    )
    want = {
        (r["click_id"], r["error_id"])
        for r in clicks.join(
            errors,
            (F.col("user_id") == F.col("e_user"))
            & (F.col("c_ts") >= F.col("e_ts"))
            & (F.col("c_ts") < F.col("e_ts") + F.expr("INTERVAL 5 MINUTES")),
        ).collect()
    }
    assert got == want and len(got) > 0


def test_streaming_incremental_agg_matches_batch(spark, tmp_path):
    """Append-only stream folded into a versioned grouped SUM/COUNT
    state (incremental materialized view) must equal the batch
    aggregate, across multiple micro-batches."""
    from pyspark.sql import functions as F

    from simple_data_workflow_spark.sources.readers import load_table
    from simple_data_workflow_spark.streaming.events import read_event_stream
    from simple_data_workflow_spark.streaming.sinks import (
        read_materialized_agg,
        streaming_incremental_agg,
    )

    stream = read_event_stream(spark, f"{SF}/events.parquet", max_files=1)
    state = str(tmp_path / "state")
    q = streaming_incremental_agg(
        stream,
        state,
        str(tmp_path / "ckpt"),
        group_cols=["event_type"],
        val_col="value",
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r["event_type"]: (round(r["sum_val"], 6), r["n_rows"])
        for r in read_materialized_agg(spark, state).collect()
    }
    batch = (
        load_table(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.sum("value").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    want = {r["event_type"]: (round(r["s"], 6), r["n"]) for r in batch}
    assert got == want


def test_incremental_batch_replay_is_noop(spark, tmp_path):
    """Replaying a micro-batch (at-least-once delivery) must not double-
    count: the versioned state skips batch ids already folded."""
    from simple_data_workflow_spark.streaming.sinks import (
        apply_incremental_batch,
        read_materialized_agg,
    )

    state = str(tmp_path / "s2")
    batch = spark.createDataFrame([("a", 1.0), ("b", 2.0)], "g string, v double")
    apply_incremental_batch(spark, state, batch, 0, ["g"], "v")
    apply_incremental_batch(spark, state, batch, 0, ["g"], "v")  # replay
    out = {r["g"]: (r["sum_val"], r["n_rows"]) for r in read_materialized_agg(spark, state).collect()}
    assert out == {"a": (1.0, 1), "b": (2.0, 1)}
    # a NEW batch id does fold
    apply_incremental_batch(spark, state, batch, 1, ["g"], "v")
    out = {r["g"]: (r["sum_val"], r["n_rows"]) for r in read_materialized_agg(spark, state).collect()}
    assert out == {"a": (2.0, 2), "b": (4.0, 2)}


def test_stream_temporal_join_static_dim(spark):
    """Stream-static point-in-time join: streaming facts enriched with
    the SCD2 dim version valid at each event's timestamp — stateless in
    streaming (static side), equal to the batch temporal_join."""
    from simple_data_workflow_spark.operators.cdc import scd2_build, temporal_join
    from simple_data_workflow_spark.sources.readers import load_table
    from simple_data_workflow_spark.streaming.events import (
        read_event_stream,
        run_stream_to_memory,
    )
    from pyspark.sql import functions as F

    ev = load_table(spark, SF, "events")
    dim = scd2_build(
        ev.where(F.col("event_type").isin("signup", "purchase")).select(
            "user_id", "ts", "event_id", F.col("event_type").alias("status")
        ),
        key="user_id",
        ts_col="ts",
        tie_break="event_id",
    ).localCheckpoint(eager=True)  # static snapshot for the stream side

    stream = read_event_stream(spark, f"{SF}/events.parquet").where(
        F.col("event_type") == "click"
    ).select("event_id", "user_id", "ts")
    joined = temporal_join(stream, dim, key="user_id", ts_col="ts")
    assert joined.isStreaming
    run_stream_to_memory(joined, "stream_temporal", output_mode="append")
    got = {
        r["event_id"]: r["status"]
        for r in spark.sql("SELECT * FROM stream_temporal").collect()
    }
    batch_facts = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    want = {
        r["event_id"]: r["status"]
        for r in temporal_join(batch_facts, dim, key="user_id", ts_col="ts").collect()
    }
    assert got == want and len(got) > 0


def test_streaming_table_upsert_matches_batch(spark, tmp_path):
    """Micro-batches landing as atomic table-format commits must
    converge to the batch aggregate, with every intermediate snapshot
    time-travelable."""
    from pyspark.sql import functions as F

    from simple_data_workflow_spark.sources.readers import load_table
    from simple_data_workflow_spark.sources.tablelog import table_history, table_read
    from simple_data_workflow_spark.streaming.events import read_event_stream
    from simple_data_workflow_spark.streaming.sinks import streaming_table_upsert_sink

    stream = read_event_stream(spark, f"{SF}/events.parquet", max_files=1)
    agg = stream.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("total")
    )
    t = str(tmp_path / "serving")
    q = streaming_table_upsert_sink(
        agg, t, str(tmp_path / "ck"), key_cols=["event_type"]
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r["event_type"]: (r["n"], round(r["total"], 6))
        for r in table_read(spark, t).collect()
    }
    want = {
        r["event_type"]: (r["n"], round(r["total"], 6))
        for r in load_table(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert got == want
    assert len(table_history(spark, t)) >= 1  # each batch = one commit


def test_tablelog_streaming_source_tails_commits(spark, tmp_path):
    """spark.readStream.format('tablelog'): the Python-data-source
    stream must deliver exactly the rows of each append commit, tagged
    with its _commit_version, across multiple trigger cycles —
    including commits that land WHILE the stream is running."""
    from simple_data_workflow_spark.sources.tablelog import table_commit
    from simple_data_workflow_spark.streaming.tablelog_source import (
        TablelogStreamDataSource,
    )

    t = str(tmp_path / "stream_src")
    table_commit(spark.range(0, 10).selectExpr("id", "id * 2 as v"), t)  # v0
    table_commit(spark.range(10, 15).selectExpr("id", "id * 2 as v"), t)  # v1

    spark.dataSource.register(TablelogStreamDataSource)
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.format("tablelog").option("path", t).load()
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir)
    assert got.count() == 15
    byv = {
        r["_commit_version"]: r["n"]
        for r in got.groupBy("_commit_version").count().withColumnRenamed("count", "n").collect()
    }
    assert byv == {0: 10, 1: 5}
    # new commit while the stream is down; restart resumes from the
    # checkpointed version offset and delivers ONLY the new rows
    table_commit(spark.range(15, 18).selectExpr("id", "id * 2 as v"), t)  # v2
    q2 = (
        spark.readStream.format("tablelog")
        .option("path", t)
        .load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    got2 = spark.read.parquet(out_dir)
    assert got2.count() == 18
    assert got2.where("_commit_version = 2").count() == 3
    assert {r["id"] for r in got2.where("_commit_version = 2").collect()} == {15, 16, 17}


def test_tablelog_streaming_source_rejects_rewrites(spark, tmp_path):
    from simple_data_workflow_spark.sources.tablelog import (
        table_commit,
        table_delete_where,
    )
    from simple_data_workflow_spark.streaming.tablelog_source import (
        TablelogStreamDataSource,
    )

    t = str(tmp_path / "stream_src2")
    table_commit(spark.range(0, 10).selectExpr("id"), t)
    table_delete_where(spark, t, "id < 3")  # delta commit
    spark.dataSource.register(TablelogStreamDataSource)
    q = (
        spark.readStream.format("tablelog")
        .option("path", t)
        .load()
        .writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    import pyspark.errors

    try:
        q.awaitTermination(120)
        raised = q.exception() is not None
    except pyspark.errors.exceptions.base.PySparkException:
        raised = True
    assert raised, "stream over a delta commit must fail without allowRewrites"
    # with allowRewrites the same range streams (at-least-once)
    q2 = (
        spark.readStream.format("tablelog")
        .option("path", t)
        .option("allowRewrites", "true")
        .load()
        .writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert q2.exception() is None


def test_tablelog_streaming_sink_exactly_once(spark, tmp_path):
    """writeStream.format('tablelog'): every micro-batch lands as one
    atomic append commit stamped with its batch id; the table reads
    back exactly the streamed rows, and a manually replayed batch id
    is skipped (exactly-once table contents on at-least-once
    delivery)."""
    from simple_data_workflow_spark.sources.tablelog import (
        table_history,
        table_read,
    )
    from simple_data_workflow_spark.streaming.tablelog_source import (
        TablelogStreamDataSource,
    )

    spark.dataSource.register(TablelogStreamDataSource)
    # file-source stream: two staged input files -> deterministic rows
    src = str(tmp_path / "in")
    spark.range(0, 20).selectExpr("id", "id * 3 as v").coalesce(1).write.parquet(src)
    t = str(tmp_path / "tbl")
    q = (
        spark.readStream.schema("id long, v long")
        .parquet(src)
        .writeStream.format("tablelog")
        .option("path", t)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None
    got = {(r["id"], r["v"]) for r in table_read(spark, t).collect()}
    assert got == {(i, i * 3) for i in range(20)}
    hist = table_history(spark, t)
    assert all(h["action"] == "append" for h in hist)

    # replay protection: re-commit the same batch id directly
    from simple_data_workflow_spark.streaming.tablelog_source import (
        TablelogStreamWriter,
        _StagedWrite,
    )
    from pyspark.sql.types import _parse_datatype_string

    # round 10: dedup is scoped (appId, batchId) — the replay must
    # carry the SAME app scope (here: derived from the checkpoint
    # location, exactly as the real query's sink derived it)
    writer = TablelogStreamWriter(
        _parse_datatype_string("id long, v long"),
        {"path": t, "checkpointLocation": str(tmp_path / "ck")},
        overwrite=False,
    )
    n_before = len(table_history(spark, t))
    writer.commit([_StagedWrite(staged=[], rows=0)], batchId=0)  # replay of batch 0
    assert len(table_history(spark, t)) == n_before  # skipped, no new version
    # a NEW batch id commits (empty append) — proves the skip was the
    # batch-id match, not the empty message
    writer.commit([_StagedWrite(staged=[], rows=0)], batchId=999)
    assert len(table_history(spark, t)) == n_before + 1
    # a restarted pipeline with a FRESH checkpoint re-offers batch 0 —
    # a DIFFERENT scope, so it must LAND, not vanish as a false replay
    # (the pre-r10 bare-id data-loss hazard)
    writer2 = TablelogStreamWriter(
        _parse_datatype_string("id long, v long"),
        {"path": t, "checkpointLocation": str(tmp_path / "ck_fresh")},
        overwrite=False,
    )
    writer2.commit([_StagedWrite(staged=[], rows=0)], batchId=0)
    assert len(table_history(spark, t)) == n_before + 2
    # table contents unchanged either way (all replays/empties)
    assert table_read(spark, t).count() == 20


def test_tablelog_stream_roundtrip_source_to_sink(spark, tmp_path):
    """tablelog -> tablelog: tail one table and append into another;
    contents must match including across a second incremental cycle."""
    from simple_data_workflow_spark.sources.tablelog import (
        table_commit,
        table_read,
    )
    from simple_data_workflow_spark.streaming.tablelog_source import (
        TablelogStreamDataSource,
    )

    spark.dataSource.register(TablelogStreamDataSource)
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ck = str(tmp_path / "ck")
    table_commit(spark.range(0, 10).selectExpr("id"), src)

    def run_cycle():
        q = (
            spark.readStream.format("tablelog")
            .option("path", src)
            .load()
            .drop("_commit_version")
            .writeStream.format("tablelog")
            .option("path", dst)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert q.exception() is None

    run_cycle()
    assert {r["id"] for r in table_read(spark, dst).collect()} == set(range(10))
    table_commit(spark.range(10, 17).selectExpr("id"), src)
    run_cycle()
    assert {r["id"] for r in table_read(spark, dst).collect()} == set(range(17))


def test_tablelog_stream_starts_on_truncated_history(spark, tmp_path):
    """A fresh stream on a table whose history was truncated must
    default to the oldest RETAINED entry instead of demanding version
    0 forever (review finding)."""
    from simple_data_workflow_spark.sources.tablelog import (
        table_commit,
        table_truncate_history,
    )
    from simple_data_workflow_spark.streaming.tablelog_source import (
        TablelogStreamDataSource,
    )

    t = str(tmp_path / "trunc_stream")
    for i in range(4):
        table_commit(spark.range(i * 10, (i + 1) * 10).selectExpr("id"), t)
    table_truncate_history(spark, t, keep_last=2)  # entries now 2,3
    spark.dataSource.register(TablelogStreamDataSource)
    out = str(tmp_path / "out_ts")
    q = (
        spark.readStream.format("tablelog")
        .option("path", t)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck_ts"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None
    got = spark.read.parquet(out)
    # only the retained entries' rows stream (20..39); truncated
    # history is a batch-backfill concern
    assert {r["_commit_version"] for r in got.collect()} == {2, 3}
    assert got.count() == 20


def test_sink_races_concurrent_batch_appender_losslessly(spark, tmp_path):
    """Round 8: the streaming sink publishes log slots with the SAME
    atomic if-absent primitive as the batch path (os.link / JVM hard
    link), so a streaming sink racing concurrent batch appenders can
    never clobber a just-won commit — every commit lands in its own
    slot, versions stay contiguous, and no rows are lost."""
    import threading

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql.types import _parse_datatype_string

    from simple_data_workflow_spark.sources.tablelog import (
        table_commit,
        table_history,
        table_read,
    )
    from simple_data_workflow_spark.streaming.tablelog_source import (
        TablelogStreamWriter,
        _StagedWrite,
    )

    t = str(tmp_path / "race")
    table_commit(spark.range(0, 1).selectExpr("id", "id as v"), t)  # v0
    writer = TablelogStreamWriter(
        _parse_datatype_string("id bigint, v bigint"), {"path": t}, overwrite=False
    )
    errors = []

    def batch_appender(worker):
        try:
            for j in range(3):
                lo = 1000 * (worker * 3 + j + 1)
                table_commit(
                    spark.range(lo, lo + 5).selectExpr("id", "id as v"),
                    t,
                    max_retries=200,
                )
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    def sink_committer(worker):
        try:
            for j in range(3):
                bid = worker * 3 + j
                lo = -1000 * (bid + 1)
                name = f".stage-stream-race-{worker}-{j}.parquet"
                tbl = pa.table(
                    {
                        "id": pa.array(range(lo, lo + 5), pa.int64()),
                        "v": pa.array(range(lo, lo + 5), pa.int64()),
                    }
                )
                pq.write_table(tbl, f"{t}/data/{name}")
                writer.commit(
                    [_StagedWrite(staged=[name], rows=5)], batchId=bid
                )
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    threads = [
        threading.Thread(target=batch_appender, args=(w,)) for w in range(3)
    ] + [threading.Thread(target=sink_committer, args=(w,)) for w in range(2)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    hist = table_history(spark, t)
    n = 1 + 3 * 3 + 2 * 3  # seed + batch commits + sink commits
    assert [h["version"] for h in hist] == list(range(n))
    assert table_read(spark, t).count() == 1 + 9 * 5 + 6 * 5  # nothing lost


def test_tablelog_batch_reader_reads_snapshots_and_prunes(spark, tmp_path):
    """spark.read.format('tablelog'): batch half of the data source —
    snapshot read equals table_read, rows carry exact per-file commit
    provenance, version= time-travels, and pushed filters prune the
    FILE LIST driver-side before Spark plans a task."""
    from pyspark.sql.datasource import EqualTo
    from pyspark.sql.types import _parse_datatype_string

    from simple_data_workflow_spark.sources.tablelog import (
        table_commit,
        table_delete_where,
        table_read,
    )
    from simple_data_workflow_spark.streaming.tablelog_source import (
        TablelogBatchReader,
        TablelogStreamDataSource,
    )

    spark.dataSource.register(TablelogStreamDataSource)
    t = str(tmp_path / "batchread")
    table_commit(
        spark.range(0, 10).selectExpr("id", "id % 4 as g").repartition(4, "g"), t
    )
    table_commit(
        spark.range(10, 15).selectExpr("id", "id % 4 as g").repartition(4, "g"), t
    )

    df = spark.read.format("tablelog").option("path", t).load()
    got = {(r["id"], r["g"], r["_commit_version"]) for r in df.collect()}
    want = {(i, i % 4, 0 if i < 10 else 1) for i in range(15)}
    assert got == want  # exact per-file commit provenance

    # time travel
    v0 = spark.read.format("tablelog").option("path", t).option("version", "0").load()
    assert v0.count() == 10 and v0.agg({"_commit_version": "max"}).collect()[0][0] == 0

    # DML rewrite: survivors get the delta commit's version
    table_delete_where(spark, t, "id = 3")
    df2 = spark.read.format("tablelog").option("path", t).load()
    assert df2.count() == 14
    assert df2.where("_commit_version = 2").count() > 0

    # semantics under filters match table_read
    assert {r["id"] for r in df2.where("g = 2").collect()} == {
        r["id"] for r in table_read(spark, t).where("g = 2").collect()
    }

    # driver-side pruning: a pushed equality on the clustered column
    # yields fewer partitions than the unfiltered reader
    schema = _parse_datatype_string("id bigint, g bigint, _commit_version bigint")
    rd_all = TablelogBatchReader(schema, {"path": t})
    rd_f = TablelogBatchReader(schema, {"path": t})
    unhandled = list(rd_f.pushFilters([EqualTo(("g",), 2)]))
    assert len(unhandled) == 1  # everything handed back to Spark
    assert 0 < len(rd_f.partitions()) < len(rd_all.partitions())


def test_streaming_sink_commits_carry_footer_stats(spark, tmp_path):
    """Round 8: sink commits harvest per-file stats from the parquet
    footers they just wrote, so streaming-landed files prune
    driver-side and serve metadata-only COUNT(*) exactly like
    batch-landed ones."""
    from simple_data_workflow_spark.sources.tablelog import (
        _resolve_state,
        _stats_prune,
        table_row_count,
    )
    from simple_data_workflow_spark.streaming.tablelog_source import (
        TablelogStreamDataSource,
    )

    spark.dataSource.register(TablelogStreamDataSource)
    src = str(tmp_path / "fs_in")
    spark.range(0, 100).selectExpr(
        "id", "cast(id * 2 as double) as v", "concat('u', id % 7) as tag"
    ).coalesce(2).write.parquet(src)
    t = str(tmp_path / "fs_tbl")
    q = (
        spark.readStream.schema("id long, v double, tag string")
        .parquet(src)
        .writeStream.format("tablelog")
        .option("path", t)
        .option("checkpointLocation", str(tmp_path / "fs_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None
    state = _resolve_state(spark, t, None)
    assert state["files"]
    for f in state["files"]:
        st = state["stats"][f]
        assert st["__rows"] > 0
        assert st["id"][0] >= 0 and st["id"][1] <= 99  # real bounds
        assert st["tag"][0].startswith("u")  # string stats too
    # metadata-only COUNT(*) works on a purely stream-built table
    assert table_row_count(spark, t) == 100
    # an impossible range proves the bounds actually prune
    assert _stats_prune(state["stats"], state["files"], [("id", ">", 10**9)]) == []
    assert _stats_prune(state["stats"], state["files"], [("v", "<", 0.0)]) == []


def test_streaming_append_sink_enforces_check_constraints(spark, tmp_path):
    """Round 9 (VERDICT r8 #7): the session-ful foreachBatch append
    sink enforces CHECK constraints batch-side — a violating
    micro-batch fails the query ATOMICALLY (the table never advances,
    nothing stages), a clean batch appends exactly once, and a
    replayed batch id is a no-op."""
    import pyspark.sql.utils  # noqa: F401

    from simple_data_workflow_spark.sources.tablelog import (
        table_commit,
        table_history,
        table_read,
        table_set_check_constraint,
    )
    from simple_data_workflow_spark.streaming.sinks import (
        streaming_table_append_sink,
    )

    t = str(tmp_path / "checked_tbl")
    table_commit(spark.range(0, 5).selectExpr("id", "id * 2 AS v"), t)
    table_set_check_constraint(spark, t, "v_nonneg", "v >= 0")

    # violating stream FIRST (batch ids start at 0 per query; the sink
    # is single-query-per-table by contract, so the rejection case
    # must not share ids with a committed clean batch): query fails,
    # table never advances
    n_versions = len(table_history(spark, t))
    src_bad = str(tmp_path / "in_bad")
    spark.range(0, 4).selectExpr("id", "-id - 1 as v").coalesce(1).write.parquet(src_bad)
    q2 = streaming_table_append_sink(
        spark.readStream.schema("id long, v long").parquet(src_bad),
        t,
        str(tmp_path / "ck_bad"),
    )
    exc_msg = None
    try:
        q2.processAllAvailable()
        q2.awaitTermination(120)
    except Exception as e:  # StreamingQueryException wraps the ValueError
        exc_msg = str(e)
    if exc_msg is None:
        exc_msg = str(q2.exception() or "")
    q2.stop()
    assert "v_nonneg" in exc_msg, "violating batch must fail the query"
    assert len(table_history(spark, t)) == n_versions  # never advanced
    assert table_read(spark, t).count() == 5
    assert table_read(spark, t).where("v < 0").count() == 0

    # clean stream: appends land, constraint satisfied
    src_ok = str(tmp_path / "in_ok")
    spark.range(5, 15).selectExpr("id", "id * 2 as v").coalesce(1).write.parquet(src_ok)
    q = streaming_table_append_sink(
        spark.readStream.schema("id long, v long").parquet(src_ok),
        t,
        str(tmp_path / "ck_ok"),
    )
    q.processAllAvailable()
    q.stop()
    assert table_read(spark, t).count() == 15

    # replay dedup: re-running the CLEAN checkpointed query offers the
    # committed batch again on restart; the table must not double
    q3 = streaming_table_append_sink(
        spark.readStream.schema("id long, v long").parquet(src_ok),
        t,
        str(tmp_path / "ck_ok"),  # same checkpoint
    )
    q3.processAllAvailable()
    q3.stop()
    assert table_read(spark, t).count() == 15
    # and the direct-dedup contract (round 10: scoped per app id, the
    # (txnAppId, txnVersion) shape): the same (app, batch) pair is a
    # no-op, while the same batch id under ANOTHER app id commits —
    # that second half is exactly the fresh-checkpoint-restart data
    # loss the bare-id dedup used to cause
    import hashlib

    ck_app = hashlib.md5(
        str(tmp_path / "ck_ok").rstrip("/").encode()
    ).hexdigest()[:16]
    v_now = len(table_history(spark, t))
    table_commit(
        spark.range(100, 104).selectExpr("id", "id as v"),
        t,
        stream_batch_id=0,  # already in the log from the clean query
        stream_app_id=ck_app,
    )
    assert len(table_history(spark, t)) == v_now
    assert table_read(spark, t).count() == 15
    table_commit(
        spark.range(100, 104).selectExpr("id", "id as v"),
        t,
        stream_batch_id=0,
        stream_app_id="another-query",  # different scope: must land
    )
    assert len(table_history(spark, t)) == v_now + 1
    assert table_read(spark, t).count() == 19


def test_append_sink_fresh_checkpoint_restart_and_hwm(spark, tmp_path):
    """Round 10 (ADVICE r9 medium): replay dedup is scoped per query
    app id. A pipeline restarted with a FRESH checkpoint resets batch
    ids to 0 — its batches must LAND (previously they matched
    historical ids and silently vanished). And the checkpoint-local
    high-water mark keeps replays deduped even after
    table_truncate_history erases the in-log evidence."""
    from simple_data_workflow_spark.sources.tablelog import (
        table_read,
        table_truncate_history,
    )
    from simple_data_workflow_spark.streaming.sinks import (
        streaming_table_append_sink,
    )

    t = str(tmp_path / "restart_tbl")
    src_a = str(tmp_path / "in_a")
    spark.range(0, 10).selectExpr("id").coalesce(1).write.parquet(src_a)
    q = streaming_table_append_sink(
        spark.readStream.schema("id long").parquet(src_a),
        t,
        str(tmp_path / "ck_a"),
    )
    q.processAllAvailable()
    q.stop()
    assert table_read(spark, t).count() == 10

    # fresh checkpoint, new source content, batch ids restart at 0:
    # rows must land, not be dropped as replays of the old batch 0
    src_b = str(tmp_path / "in_b")
    spark.range(100, 107).selectExpr("id").coalesce(1).write.parquet(src_b)
    q2 = streaming_table_append_sink(
        spark.readStream.schema("id long").parquet(src_b),
        t,
        str(tmp_path / "ck_b"),
    )
    q2.processAllAvailable()
    q2.stop()
    assert table_read(spark, t).count() == 17

    # truncate history (dedup evidence in the log is gone), then
    # replay query B from its ORIGINAL checkpoint: the hwm file keeps
    # the replayed batch a no-op
    table_truncate_history(spark, t, keep_last=1)
    q3 = streaming_table_append_sink(
        spark.readStream.schema("id long").parquet(src_b),
        t,
        str(tmp_path / "ck_b"),
    )
    q3.processAllAvailable()
    q3.stop()
    assert table_read(spark, t).count() == 17


# --------------- round 11: streaming the jar-free Delta log ---------------


def test_delta_log_stream_matches_batch(spark, tmp_path):
    """stream==batch pin (VERDICT r10 #7): an append sequence on a
    spec-conformant Delta table streams through format('deltalog') with
    batch boundaries == commit versions, a checkpoint restart resumes
    at the version cursor, partition values inject, and the final
    streamed set equals the batch reader's snapshot."""
    from simple_data_workflow_spark.sources.delta_reader import delta_read
    from simple_data_workflow_spark.sources.delta_writer import delta_write
    from simple_data_workflow_spark.streaming.delta_source import (
        DeltaLogStreamDataSource,
    )

    t = str(tmp_path / "dstream")
    delta_write(
        spark.createDataFrame(
            [(i, float(i), "US" if i % 2 else "EU") for i in range(10)],
            "id long, v double, region string",
        ),
        t,
        mode="error",
        partition_by=["region"],
    )  # v0
    delta_write(
        spark.createDataFrame(
            [(10, 10.0, None)], "id long, v double, region string"
        ),
        t,
        mode="append",
    )  # v1 (NULL partition value)

    spark.dataSource.register(DeltaLogStreamDataSource)
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("deltalog")
        .option("path", t)
        .load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir)
    assert got.count() == 11
    byv = {
        r["_commit_version"]: r["n"]
        for r in got.groupBy("_commit_version")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    assert byv == {0: 10, 1: 1}
    # streamed rows == batch snapshot (incl. injected partition values)
    streamed = {
        (r["id"], r["v"], r["region"])
        for r in got.drop("_commit_version").collect()
    }
    batch = {
        (r["id"], r["v"], r["region"])
        for r in delta_read(spark, t).collect()
    }
    assert streamed == batch and (10, 10.0, None) in streamed

    # append while down; restart delivers ONLY the new commit
    delta_write(
        spark.createDataFrame(
            [(11, 11.0, "AS")], "id long, v double, region string"
        ),
        t,
        mode="append",
    )  # v2
    q2 = (
        spark.readStream.format("deltalog")
        .option("path", t)
        .load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    got2 = spark.read.parquet(out_dir)
    assert got2.count() == 12
    assert got2.where("_commit_version = 2").count() == 1


def test_delta_log_stream_rewrites_gate_and_dv(spark, tmp_path):
    """DML commits refuse without allowRewrites; with it, a
    DV-carrying re-add streams only its LIVE rows."""
    import pyspark.errors

    import pytest as _pytest

    from simple_data_workflow_spark.sources.delta_writer import (
        delta_delete,
        delta_write,
    )
    from simple_data_workflow_spark.streaming.delta_source import (
        DeltaLogStreamDataSource,
    )

    t = str(tmp_path / "dstream2")
    delta_write(
        spark.createDataFrame(
            [(i, float(i)) for i in range(10)], "id long, v double"
        ).coalesce(1),
        t,
        mode="error",
    )  # v0
    delta_delete(spark, t, "id >= 7", strategy="dv")  # v1: DV re-add
    spark.dataSource.register(DeltaLogStreamDataSource)

    def run(opts, out, ckpt):
        reader = spark.readStream.format("deltalog").option("path", t)
        for k, v in opts.items():
            reader = reader.option(k, v)
        q = (
            reader.load()
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    with _pytest.raises(pyspark.errors.exceptions.captured.StreamingQueryException, match="allowRewrites"):
        run({}, tmp_path / "o1", tmp_path / "c1")
    run({"allowRewrites": "true"}, tmp_path / "o2", tmp_path / "c2")
    got = spark.read.parquet(str(tmp_path / "o2"))
    # v0 streams all 10; v1's DV re-add streams the 7 live rows
    assert got.where("_commit_version = 0").count() == 10
    assert {
        r["id"] for r in got.where("_commit_version = 1").collect()
    } == {0, 1, 2, 3, 4, 5, 6}


def test_delta_log_stream_id_mode(spark, tmp_path):
    """id-mode column mapping streams: columns resolve by the parquet
    footers' field ids — with PRIORITY over names (a file whose
    physical names are swapped relative to its ids must still resolve
    by id) — and files carrying no id metadata fall back to physical
    names, the same fallback Spark's fieldId read path applies."""
    import glob as _glob
    import json as _json
    import os as _os
    import shutil as _shutil

    from pyspark.sql import functions as F

    from simple_data_workflow_spark.streaming.delta_source import (
        DeltaLogStreamDataSource,
    )

    t = str(tmp_path / "idstream")

    def one_file(df, dest):
        tmp = dest + ".__tmp__"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = _glob.glob(f"{tmp}/part-*.parquet")[0]
        _os.makedirs(_os.path.dirname(dest), exist_ok=True)
        _shutil.move(part, dest)
        _shutil.rmtree(tmp)

    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    # v0 file: conventional — p-1 carries id 1 (logical id), p-2 id 2
    one_file(
        spark.createDataFrame([(1, 1.5)], "a long, b double").select(
            F.col("a").alias("p-1", metadata={"parquet.field.id": 1}),
            F.col("b").alias("p-2", metadata={"parquet.field.id": 2}),
        ),
        f"{t}/a.parquet",
    )
    # v1 file: physical names SWAPPED vs ids — by-name reading would
    # flip the columns; by-id must not
    one_file(
        spark.createDataFrame([(2, 2.5)], "a long, b double").select(
            F.col("a").alias("p-2", metadata={"parquet.field.id": 1}),
            F.col("b").alias("p-1", metadata={"parquet.field.id": 2}),
        ),
        f"{t}/b.parquet",
    )
    # v2 file: NO field ids → physical-name fallback
    one_file(
        spark.createDataFrame([(3, 3.5)], "a long, b double").select(
            F.col("a").alias("p-1"), F.col("b").alias("p-2")
        ),
        f"{t}/c.parquet",
    )
    fields = [
        {"name": "id", "type": "long", "nullable": True,
         "metadata": {"delta.columnMapping.id": 1,
                      "delta.columnMapping.physicalName": "p-1"}},
        {"name": "score", "type": "double", "nullable": True,
         "metadata": {"delta.columnMapping.id": 2,
                      "delta.columnMapping.physicalName": "p-2"}},
    ]
    _os.makedirs(f"{t}/_delta_log", exist_ok=True)
    with open(f"{t}/_delta_log/{0:020d}.json", "w") as f:
        f.write(_json.dumps({"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}}) + "\n")
        f.write(_json.dumps({"metaData": {
            "id": "idstream",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": _json.dumps({"type": "struct", "fields": fields}),
            "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "id"},
            "createdTime": 1,
        }}) + "\n")
        f.write(_json.dumps({"add": {"path": "a.parquet", "partitionValues": {}, "size": 1, "modificationTime": 1, "dataChange": True}}) + "\n")
    for v, name in ((1, "b.parquet"), (2, "c.parquet")):
        with open(f"{t}/_delta_log/{v:020d}.json", "w") as f:
            f.write(_json.dumps({"add": {"path": name, "partitionValues": {}, "size": 1, "modificationTime": 1, "dataChange": True}}) + "\n")

    spark.dataSource.register(DeltaLogStreamDataSource)
    out_dir = str(tmp_path / "idout")
    q = (
        spark.readStream.format("deltalog")
        .option("path", t)
        .load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "idckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["id"], r["score"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == {(1, 1.5), (2, 2.5), (3, 3.5)}


def test_iceberg_log_stream_matches_batch(spark, tmp_path):
    """stream==batch over an Iceberg v2 append sequence: sequence
    numbers are the offsets, batches align to snapshots, a checkpoint
    restart resumes at the cursor, rewrites gate, and v1 refuses."""
    import pyspark.errors

    import pytest as _pytest

    from simple_data_workflow_spark.sources.iceberg_reader import (
        iceberg_read,
    )
    from simple_data_workflow_spark.sources.iceberg_writer import (
        iceberg_write,
    )
    from simple_data_workflow_spark.streaming.iceberg_source import (
        IcebergLogStreamDataSource,
    )

    t = str(tmp_path / "istream")
    iceberg_write(
        spark.createDataFrame(
            [(i, float(i)) for i in range(8)], "id long, v double"
        ),
        t,
        mode="error",
    )  # seq 1
    iceberg_write(
        spark.createDataFrame([(8, 8.0)], "id long, v double"),
        t,
        mode="append",
    )  # seq 2
    spark.dataSource.register(IcebergLogStreamDataSource)
    out, ckpt = str(tmp_path / "o"), str(tmp_path / "c")

    def run():
        q = (
            spark.readStream.format("iceberglog")
            .option("path", t)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    got = spark.read.parquet(out)
    assert got.count() == 9
    # two distinct snapshot tags, matching the metadata's snapshot ids
    meta_ids = {
        r["_snapshot_id"] for r in got.select("_snapshot_id").distinct().collect()
    }
    assert len(meta_ids) == 2
    streamed = {(r["id"], r["v"]) for r in got.drop("_snapshot_id").collect()}
    batch = {(r["id"], r["v"]) for r in iceberg_read(spark, t).collect()}
    assert streamed == batch

    # append while down; restart delivers only the new snapshot
    iceberg_write(
        spark.createDataFrame([(9, 9.0)], "id long, v double"),
        t,
        mode="append",
    )  # seq 3
    run()
    assert spark.read.parquet(out).count() == 10

    # an overwrite snapshot gates without allowRewrites
    iceberg_write(
        spark.createDataFrame([(0, 0.0)], "id long, v double"),
        t,
        mode="overwrite",
    )  # seq 4
    with _pytest.raises(
        pyspark.errors.exceptions.captured.StreamingQueryException,
        match="allowRewrites",
    ):
        run()
    # with the opt-in, its added file streams as at-least-once inserts
    q = (
        spark.readStream.format("iceberglog")
        .option("path", t)
        .option("allowRewrites", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == 11

    # v1 tables refuse (no sequence-number cursor)
    t1 = str(tmp_path / "istream1")
    iceberg_write(
        spark.createDataFrame([(1, 1.0)], "id long, v double"),
        t1,
        mode="error",
        format_version=1,
    )
    with _pytest.raises(Exception, match="format-version 2"):
        q = (
            spark.readStream.format("iceberglog")
            .option("path", t1)
            .load()
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "c1"))
            .start()
        )
        q.awaitTermination(120)


def test_hudi_log_stream_change_feed(spark, tmp_path):
    """Hudi incremental stream: base inserts tag 'insert', MoR log
    data blocks tag 'upsert', delete blocks tag 'delete' (key only),
    batches align to instants, a checkpoint restart resumes, and
    replacecommits gate behind allowRewrites."""
    import pyspark.errors

    import pytest as _pytest

    from simple_data_workflow_spark.sources.hudi_writer import (
        hudi_delta_delete,
        hudi_delta_upsert,
        hudi_upsert,
        hudi_write,
    )
    from simple_data_workflow_spark.streaming.hudi_source import (
        HudiLogStreamDataSource,
    )

    t = str(tmp_path / "hstream")
    hudi_write(
        spark.createDataFrame(
            [(1, 10.0), (2, 20.0)], "id long, v double"
        ),
        t, mode="error", record_key="id", table_type="MERGE_ON_READ",
    )
    hudi_delta_upsert(
        spark, t, spark.createDataFrame([(2, 222.0)], "id long, v double")
    )
    hudi_delta_delete(spark, t, "id = 1")
    spark.dataSource.register(HudiLogStreamDataSource)
    out, ckpt = str(tmp_path / "o"), str(tmp_path / "c")

    def run(extra=None):
        reader = spark.readStream.format("hudilog").option("path", t)
        for k, v in (extra or {}).items():
            reader = reader.option(k, v)
        q = (
            reader.load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    got = spark.read.parquet(out)
    by_type = {
        r["_change_type"]: r["n"]
        for r in got.groupBy("_change_type").count()
        .withColumnRenamed("count", "n").collect()
    }
    assert by_type == {"insert": 2, "upsert": 1, "delete": 1}
    up = got.where("_change_type = 'upsert'").collect()[0]
    assert up["id"] == 2 and up["v"] == 222.0 and up["_hoodie_record_key"] == "2"
    de = got.where("_change_type = 'delete'").collect()[0]
    assert de["_hoodie_record_key"] == "1" and de["id"] is None
    # three distinct instants = three change batches
    assert got.select("_instant").distinct().count() == 3

    # restart delivers only the NEW instant's changes
    hudi_delta_upsert(
        spark, t, spark.createDataFrame([(3, 30.0)], "id long, v double")
    )  # new key → new base group (insert)
    run()
    got2 = spark.read.parquet(out)
    assert got2.count() == 5
    assert got2.where("id = 3 AND _change_type = 'insert'").count() == 1

    # a CoW replacecommit gates without allowRewrites (separate CoW
    # table: hudi_upsert is the CoW upsert and refuses MoR by design)
    t2 = str(tmp_path / "hstream2")
    hudi_write(
        spark.createDataFrame([(1, 10.0)], "id long, v double"),
        t2, mode="error", record_key="id",
    )
    out2, ckpt2 = str(tmp_path / "o2"), str(tmp_path / "c2")

    def run2(extra=None):
        reader = spark.readStream.format("hudilog").option("path", t2)
        for k, v in (extra or {}).items():
            reader = reader.option(k, v)
        q = (
            reader.load()
            .writeStream.format("parquet")
            .option("path", out2)
            .option("checkpointLocation", ckpt2)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run2()
    assert spark.read.parquet(out2).count() == 1
    hudi_upsert(
        spark, t2, spark.createDataFrame([(1, 2222.0)], "id long, v double")
    )
    with _pytest.raises(
        pyspark.errors.exceptions.captured.StreamingQueryException,
        match="allowRewrites",
    ):
        run2()
    run2({"allowRewrites": "true"})
    got3 = spark.read.parquet(out2)
    assert got3.where("v = 2222.0").count() == 1


def test_iceberg_log_stream_skips_replace_snapshots(spark, tmp_path):
    """A compaction's REPLACE snapshot adds/removes files WITHOUT
    changing table data (spec wording) — the stream must SKIP it, then
    keep delivering later appends."""
    from simple_data_workflow_spark.sources.iceberg_writer import (
        iceberg_compact,
        iceberg_delete,
        iceberg_write,
    )
    from simple_data_workflow_spark.streaming.iceberg_source import (
        IcebergLogStreamDataSource,
    )

    t = str(tmp_path / "icmpstream")
    iceberg_write(
        spark.createDataFrame(
            [(i, float(i)) for i in range(6)], "id long, v double"
        ).repartition(3),
        t,
        mode="error",
    )  # seq 1
    spark.dataSource.register(IcebergLogStreamDataSource)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run():
        q = (
            spark.readStream.format("iceberglog")
            .option("path", t)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    assert spark.read.parquet(out).count() == 6
    iceberg_delete(spark, t, "id = 0")  # seq 2: delete snapshot
    iceberg_compact(spark, t)  # seq 3: REPLACE — must be skipped
    iceberg_write(
        spark.createDataFrame([(9, 9.0)], "id long, v double"),
        t,
        mode="append",
    )  # seq 4
    # the delete snapshot would gate; but replace alone must not —
    # checkpoint sits at seq 1, so the delete (seq 2) gates first
    import pyspark.errors

    import pytest as _pytest

    with _pytest.raises(
        pyspark.errors.exceptions.captured.StreamingQueryException,
        match="allowRewrites",
    ):
        run()
    # fresh stream anchored after the delete: replace skips silently,
    # the append streams
    q = (
        spark.readStream.format("iceberglog")
        .option("path", t)
        .option("startingSequence", "2")
        .load()
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out2"))
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r["id"], r["v"]) for r in spark.read.parquet(str(tmp_path / "out2")).collect()}
    assert got == {(9, 9.0)}


def test_delta_log_stream_id_mode_nested(spark, tmp_path):
    """id-mode streaming with a NESTED struct column: the worker
    renames the file's fields to logical names by footer field id at
    every nesting level, so nested values resolve even when physical
    names are arbitrary."""
    import glob as _glob
    import json as _json
    import os as _os
    import shutil as _shutil

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from simple_data_workflow_spark.streaming.delta_source import (
        DeltaLogStreamDataSource,
    )

    t = str(tmp_path / "idnstream")

    def one_file(df, dest):
        tmp = dest + ".__tmp__"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = _glob.glob(f"{tmp}/part-*.parquet")[0]
        _os.makedirs(_os.path.dirname(dest), exist_ok=True)
        _shutil.move(part, dest)
        _shutil.rmtree(tmp)

    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    nested_t = T.StructType(
        [T.StructField("p-3", T.DoubleType(), True, {"parquet.field.id": 3})]
    )
    one_file(
        spark.createDataFrame(
            [(1, (1.5,)), (2, (2.5,))], "a long, b struct<x: double>"
        ).select(
            F.col("a").cast("long").alias("p-1", metadata={"parquet.field.id": 1}),
            F.col("b").cast(nested_t).alias("p-2", metadata={"parquet.field.id": 2}),
        ),
        f"{t}/a.parquet",
    )
    fields = [
        {"name": "id", "type": "long", "nullable": True,
         "metadata": {"delta.columnMapping.id": 1,
                      "delta.columnMapping.physicalName": "p-1"}},
        {"name": "payload",
         "type": {"type": "struct", "fields": [
             {"name": "score", "type": "double", "nullable": True,
              "metadata": {"delta.columnMapping.id": 3,
                           "delta.columnMapping.physicalName": "p-3"}}]},
         "nullable": True,
         "metadata": {"delta.columnMapping.id": 2,
                      "delta.columnMapping.physicalName": "p-2"}},
    ]
    _os.makedirs(f"{t}/_delta_log", exist_ok=True)
    with open(f"{t}/_delta_log/{0:020d}.json", "w") as f:
        f.write(_json.dumps({"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}}) + "\n")
        f.write(_json.dumps({"metaData": {
            "id": "idnstream",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": _json.dumps({"type": "struct", "fields": fields}),
            "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "id"},
            "createdTime": 1,
        }}) + "\n")
        f.write(_json.dumps({"add": {"path": "a.parquet", "partitionValues": {}, "size": 1, "modificationTime": 1, "dataChange": True}}) + "\n")

    spark.dataSource.register(DeltaLogStreamDataSource)
    out_dir = str(tmp_path / "idnout")
    q = (
        spark.readStream.format("deltalog")
        .option("path", t)
        .load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "idnckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["id"], r["payload"]["score"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == {(1, 1.5), (2, 2.5)}


def test_delta_log_stream_id_mode_array_map_nested(spark, tmp_path):
    """Round 12 (ADVICE r11): id-mode streaming renames structs nested
    inside ARRAY and MAP columns too — the rename is a zero-copy
    type view at every nesting level, so array<struct> / map<…,struct>
    values resolve by field id instead of null-filling or failing."""
    import glob as _glob
    import json as _json
    import os as _os
    import shutil as _shutil

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from simple_data_workflow_spark.streaming.delta_source import (
        DeltaLogStreamDataSource,
    )

    t = str(tmp_path / "idamstream")

    def one_file(df, dest):
        tmp = dest + ".__tmp__"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = _glob.glob(f"{tmp}/part-*.parquet")[0]
        _os.makedirs(_os.path.dirname(dest), exist_ok=True)
        _shutil.move(part, dest)
        _shutil.rmtree(tmp)

    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    arr_t = T.ArrayType(
        T.StructType(
            [
                T.StructField(
                    "p-3", T.DoubleType(), True, {"parquet.field.id": 3}
                )
            ]
        )
    )
    map_t = T.MapType(
        T.StringType(),
        T.StructType(
            [T.StructField("p-5", T.LongType(), True, {"parquet.field.id": 5})]
        ),
    )
    one_file(
        spark.createDataFrame(
            [
                (1, [(1.5,), (2.5,)], {"a": (10,)}),
                (2, [(3.5,)], {"b": (20,)}),
            ],
            "a long, b array<struct<x: double>>, "
            "c map<string, struct<y: long>>",
        ).select(
            F.col("a").cast("long").alias(
                "p-1", metadata={"parquet.field.id": 1}
            ),
            F.col("b").cast(arr_t).alias(
                "p-2", metadata={"parquet.field.id": 2}
            ),
            F.col("c").cast(map_t).alias(
                "p-4", metadata={"parquet.field.id": 4}
            ),
        ),
        f"{t}/a.parquet",
    )
    fields = [
        {"name": "id", "type": "long", "nullable": True,
         "metadata": {"delta.columnMapping.id": 1,
                      "delta.columnMapping.physicalName": "p-1"}},
        {"name": "items",
         "type": {"type": "array", "containsNull": True,
                  "elementType": {"type": "struct", "fields": [
                      {"name": "score", "type": "double",
                       "nullable": True,
                       "metadata": {"delta.columnMapping.id": 3,
                                    "delta.columnMapping.physicalName":
                                        "p-3"}}]}},
         "nullable": True,
         "metadata": {"delta.columnMapping.id": 2,
                      "delta.columnMapping.physicalName": "p-2"}},
        {"name": "attrs",
         "type": {"type": "map", "keyType": "string",
                  "valueContainsNull": True,
                  "valueType": {"type": "struct", "fields": [
                      {"name": "n", "type": "long", "nullable": True,
                       "metadata": {"delta.columnMapping.id": 5,
                                    "delta.columnMapping.physicalName":
                                        "p-5"}}]}},
         "nullable": True,
         "metadata": {"delta.columnMapping.id": 4,
                      "delta.columnMapping.physicalName": "p-4"}},
    ]
    _os.makedirs(f"{t}/_delta_log", exist_ok=True)
    with open(f"{t}/_delta_log/{0:020d}.json", "w") as f:
        f.write(_json.dumps({"protocol": {"minReaderVersion": 2,
                                          "minWriterVersion": 5}}) + "\n")
        f.write(_json.dumps({"metaData": {
            "id": "idamstream",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": _json.dumps(
                {"type": "struct", "fields": fields}
            ),
            "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "id"},
            "createdTime": 1,
        }}) + "\n")
        f.write(_json.dumps({"add": {
            "path": "a.parquet", "partitionValues": {}, "size": 1,
            "modificationTime": 1, "dataChange": True}}) + "\n")

    spark.dataSource.register(DeltaLogStreamDataSource)
    out_dir = str(tmp_path / "idamout")
    q = (
        spark.readStream.format("deltalog")
        .option("path", t)
        .load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "idamckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (
            r["id"],
            tuple(x["score"] for x in r["items"]),
            tuple(sorted((k, v["n"]) for k, v in r["attrs"].items())),
        )
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == {
        (1, (1.5, 2.5), (("a", 10),)),
        (2, (3.5,), (("b", 20),)),
    }


def test_delta_log_stream_cdf_dml_exactly_once(spark, tmp_path):
    """Round 12 (VERDICT r11 #4): DML commits on a CDF-enabled table
    stream EXACTLY-ONCE from their cdc files (new row versions only:
    insert / update_postimage) without allowRewrites — no carried-over
    duplicates; stream == batch derivation from delta_table_changes."""
    from simple_data_workflow_spark.sources.delta_reader import (
        delta_table_changes,
    )
    from simple_data_workflow_spark.sources.delta_writer import (
        delta_merge_upsert,
        delta_set_properties,
        delta_update,
        delta_write,
    )
    from simple_data_workflow_spark.streaming.delta_source import (
        DeltaLogStreamDataSource,
    )

    t = str(tmp_path / "cdfstream")
    delta_write(
        spark.createDataFrame(
            [(i, float(i)) for i in range(6)], "id long, v double"
        ).coalesce(1),
        t,
        mode="error",
    )  # v0: 6 inserts
    delta_set_properties(spark, t, {"delta.enableChangeDataFeed": "true"})
    delta_update(spark, t, {"v": "v * 100.0"}, "id = 2")  # postimage row
    delta_merge_upsert(
        spark,
        t,
        spark.createDataFrame([(4, 44.0), (9, 9.0)], "id long, v double"),
        ["id"],
    )  # 2 inserts (4 replaced, 9 new)

    spark.dataSource.register(DeltaLogStreamDataSource)
    out_dir = str(tmp_path / "cdfout")
    q = (
        spark.readStream.format("deltalog")
        .option("path", t)
        .load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "cdfckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["id"], r["v"], r["_commit_version"])
        for r in spark.read.parquet(out_dir).collect()
    }
    expect = {(i, float(i), 0) for i in range(6)} | {
        (2, 200.0, 2),
        (4, 44.0, 3),
        (9, 9.0, 3),
    }
    assert got == expect
    # pin stream == batch: the CDF reader's new-row-version view
    ch = delta_table_changes(spark, t, 2, 3).where(
        "_change_type IN ('insert', 'update_postimage')"
    )
    batch = {(r["id"], r["v"], r["_commit_version"]) for r in ch.collect()}
    assert batch == {(2, 200.0, 2), (4, 44.0, 3), (9, 9.0, 3)}
