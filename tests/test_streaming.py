"""True Structured Streaming test: readStream over the events data with
a watermark, availableNow trigger, memory sink -- results must equal the
batch run of the same transformation (Structured Streaming's
batch-equivalence contract)."""

from __future__ import annotations

from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark.streaming.events import stream_events, tumbling_agg
from discogs_xml_to_parquet_spark.tables import load
from tests.conftest import SF_SMOKE


def test_stream_matches_batch(spark, tmp_path):
    # stage the events table (with normalized ts) as a parquet dir the
    # stream can read; two files so the stream sees multiple splits
    src = str(tmp_path / "events_src")
    events = load(spark, SF_SMOKE, "events")
    events.repartition(2).write.mode("overwrite").parquet(src)

    expected = {
        tuple(r)
        for r in tumbling_agg(
            spark.read.parquet(src)
        ).collect()
    }

    q = (
        stream_events(spark, src)
        .writeStream.format("memory")
        .queryName("tumbling_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.sql("SELECT * FROM tumbling_test").collect()}
    assert got == expected
    assert len(got) > 0


def test_sliding_stream_matches_batch(spark, tmp_path):
    """Same batch-equivalence contract for the sliding (hopping)
    window: each event lands in 2 overlapping window copies and the
    streaming state store must produce the identical window set."""
    from discogs_xml_to_parquet_spark.streaming.events import sliding_agg

    src = str(tmp_path / "events_sliding_src")
    events = load(spark, SF_SMOKE, "events")
    events.repartition(2).write.mode("overwrite").parquet(src)

    expected = {tuple(r) for r in sliding_agg(spark.read.parquet(src)).collect()}

    schema = (
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string"
    )
    stream = (
        spark.readStream.schema(schema)
        .parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "10 minutes")
    )
    q = (
        sliding_agg(stream)
        .writeStream.format("memory")
        .queryName("sliding_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.sql("SELECT * FROM sliding_test").collect()}
    assert got == expected
    assert len(got) > 0


def test_stream_stream_interval_join(spark, tmp_path):
    """Stream-stream inner join with an event-time interval condition:
    both sides carry watermarks so the join state is bounded -- matched
    signups/purchases within 1 hour per user."""
    import datetime as dt

    src_a = str(tmp_path / "signups")
    src_b = str(tmp_path / "purchases")
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    schema = "event_id long, ts timestamp, user_id long"

    spark.createDataFrame(
        [(1, t0, 7), (2, t0 + dt.timedelta(hours=3), 8)], schema
    ).coalesce(1).write.mode("append").parquet(src_a)
    spark.createDataFrame(
        [
            (10, t0 + dt.timedelta(minutes=30), 7),   # joins signup 1
            (11, t0 + dt.timedelta(hours=2), 7),      # outside 1h window
            (12, t0 + dt.timedelta(hours=3, minutes=10), 8),  # joins 2
        ],
        schema,
    ).coalesce(1).write.mode("append").parquet(src_b)

    from pyspark.sql import functions as F

    signups = (
        spark.readStream.schema(schema).parquet(src_a)
        .withWatermark("ts", "10 minutes")
        .select(
            F.col("event_id").alias("s_id"),
            F.col("ts").alias("s_ts"),
            F.col("user_id").alias("s_user"),
        )
    )
    purchases = (
        spark.readStream.schema(schema).parquet(src_b)
        .withWatermark("ts", "10 minutes")
        .select(
            F.col("event_id").alias("p_id"),
            F.col("ts").alias("p_ts"),
            F.col("user_id").alias("p_user"),
        )
    )
    joined = signups.join(
        purchases,
        (F.col("s_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("s_ts"))
        & (F.col("p_ts") <= F.col("s_ts") + F.expr("INTERVAL 1 HOUR")),
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["s_id"], r["p_id"])
        for r in spark.sql("SELECT s_id, p_id FROM ss_join").collect()
    )
    assert got == [(1, 10), (2, 12)]


def test_drop_duplicates_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark: dedup state bounded by the
    watermark (the streaming face of exact dedup -- state for keys
    older than the watermark is evicted instead of growing forever)."""
    import datetime as dt

    src = str(tmp_path / "dd_src")
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "click", 1.0, "{}"),
        (1, t0 + dt.timedelta(seconds=30), 1, "click", 1.0, "{}"),  # dup id
        (2, t0 + dt.timedelta(minutes=1), 1, "click", 1.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
        )
        .parquet(src)
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("dd_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT event_id FROM dd_test").collect()
    assert sorted(r["event_id"] for r in got) == [1, 2]


def test_stream_watermark_drops_late(spark, tmp_path):
    """Append mode + watermark: feed a first batch, advance event time
    far beyond the watermark with a second batch, then append an event
    older than the watermark -- its window must not be re-emitted."""
    src = tmp_path / "late_src"
    src.mkdir()
    sink_rows = []

    def write_batch(name, rows):
        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double, props string",
        )
        df.coalesce(1).write.mode("append").parquet(str(src))

    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    write_batch("b1", [(1, t0, 1, "click", 1.0, "{}")])
    q = (
        stream_events(spark, str(src), watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("late_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # advance watermark far past t0's window, then send a late event
    write_batch("b2", [(2, t0 + dt.timedelta(hours=2), 1, "click", 1.0, "{}")])
    write_batch("b3", [(3, t0 + dt.timedelta(minutes=1), 1, "click", 99.0, "{}")])
    q2 = (
        stream_events(spark, str(src), watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("late_test2")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    rows = spark.sql(
        "SELECT * FROM late_test2 WHERE window_start = '2024-01-01 00:00:00'"
    ).collect()
    # the [00:00, 00:05) window was finalized when the watermark passed
    # it; event_id=3 (late) must not have produced a second emission
    assert len(rows) <= 1


def test_checkpoint_recovery_exactly_once(spark, tmp_path):
    """Stop a file-sink stream MID-SOURCE (after its first committed
    microbatch, with more input files still pending), restart it from
    the SAME checkpoint over a further-grown source, and require the
    final output to be duplicate-free and equal to the batch answer --
    the checkpoint+transactional-file-sink contract that makes a
    100 TB streaming ingest restartable. The first run uses a
    continuous trigger with maxFilesPerTrigger=1 so stop() lands with
    committed AND uncommitted source files; the restart must resume
    from the committed offset without replaying output (the file
    sink's _spark_metadata log makes replayed batches idempotent)."""
    import time as _time

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    events = load(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    first, second = events.randomSplit([0.5, 0.5], seed=7)
    first = first.cache()
    second = second.cache()
    # 8 source files -> 8 microbatches at maxFilesPerTrigger=1
    first.repartition(8).write.mode("overwrite").parquet(src)

    def start(trigger_kwargs):
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .withColumn("value_cents",
                        F.floor(F.col("value") * 100 + F.lit(0.5)))
        )
        return (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(**trigger_kwargs)
            .start()
        )

    q1 = start({"processingTime": "0 seconds"})
    # wait for at least one committed batch, then kill mid-source
    deadline = _time.time() + 60
    while _time.time() < deadline:
        if any(p["numInputRows"] > 0 for p in q1.recentProgress):
            break
        _time.sleep(0.2)
    assert q1.recentProgress, "stream never progressed"
    q1.stop()
    q1.awaitTermination(60)
    n_after_kill = spark.read.parquet(out).count()
    assert n_after_kill > 0, "no batch committed before the kill"

    # grow the source, restart from the same checkpoint: committed
    # offsets must not replay, pending + new files must all process
    second.write.mode("append").parquet(src)
    q2 = start({"availableNow": True})
    assert q2.awaitTermination(120), "restarted stream did not finish"

    got = spark.read.parquet(out)
    n_src = first.count() + second.count()
    assert got.count() == n_src, "duplicated or lost rows across restart"
    assert got.select("event_id").distinct().count() == n_src


def test_stream_static_enrichment_join(spark, tmp_path):
    """Stream-static join: enrich the event stream with the customer
    dimension (the most common production streaming shape -- the static
    side is re-read per microbatch and broadcast, no state store).
    Results must equal the batch join of the same inputs."""
    src = str(tmp_path / "events_ss")
    events = load(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "value"
    )
    events.repartition(2).write.mode("overwrite").parquet(src)
    customers = load(spark, SF_SMOKE, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )

    expected = {
        tuple(r)
        for r in (
            spark.read.parquet(src)
            .join(customers, "user_id")
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
    }
    assert expected

    q = (
        spark.readStream.schema(events.schema)
        .parquet(src)
        .join(customers, "user_id")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .writeStream.format("memory")
        .queryName("stream_static")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = {
        tuple(r) for r in spark.sql("SELECT * FROM stream_static").collect()
    }
    assert got == expected


def test_session_stream_matches_batch(spark, tmp_path):
    """Batch-equivalence for SESSION windows: the same session_agg
    expression runs state-store-backed under readStream + watermark
    and sort-based in batch, and must emit the identical session set
    (this is the claim behind q_session_window_builtin being 'the
    streaming-capable lane')."""
    from discogs_xml_to_parquet_spark.streaming.events import session_agg

    src = str(tmp_path / "events_session_src")
    events = load(spark, SF_SMOKE, "events")
    events.repartition(2).write.mode("overwrite").parquet(src)

    batch = (
        spark.read.parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    expected = {tuple(r) for r in session_agg(batch).collect()}

    schema = (
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string"
    )
    stream = (
        spark.readStream.schema(schema)
        .parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "10 minutes")
    )
    q = (
        session_agg(stream)
        .writeStream.format("memory")
        .queryName("session_stream_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        tuple(r)
        for r in spark.sql("SELECT * FROM session_stream_test").collect()
    }
    assert got == expected
    assert len(got) > 0


def test_stream_dedup_docs_matches_batch_exact(spark, tmp_path):
    """Batch-equivalence for the streaming exact-dedup twin (VERDICT r6
    item 7): dropDuplicatesWithinWatermark keyed on md5(text) over a
    two-file documents backfill must keep exactly one survivor per
    distinct text -- the same survivor SET as the batch q_dedup_exact
    grouping -- including a duplicate pair that spans the two files."""
    from discogs_xml_to_parquet_spark.streaming.events import (
        dedup_docs_exact,
        stream_dedup_docs,
    )

    src = str(tmp_path / "docs_src")
    schema = ("doc_id long, text string, lang string, source string, "
              "n_chars long")
    batch1 = [
        (1, "alpha beta gamma", "en", "web", 16),
        (2, "delta epsilon", "en", "web", 13),
        (3, "alpha beta gamma", "en", "books", 16),  # dup of 1, same file
    ]
    batch2 = [
        (4, "delta epsilon", "en", "web", 13),       # dup of 2, across files
        (5, "zeta eta theta", "en", "web", 14),
    ]
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode(
        "append").parquet(src)
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode(
        "append").parquet(src)

    q = (
        stream_dedup_docs(spark, src)
        .writeStream.format("memory")
        .queryName("dd_docs")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_hashes = {
        r["text_hash"]
        for r in spark.sql("SELECT text_hash FROM dd_docs").collect()
    }
    n_stream = spark.sql("SELECT * FROM dd_docs").count()

    batch = dedup_docs_exact(spark.read.parquet(src))
    batch_hashes = {r["text_hash"] for r in batch.select("text_hash").collect()}

    assert stream_hashes == batch_hashes
    assert n_stream == 3  # 5 docs, 2 collapsed (one within-, one cross-file)
