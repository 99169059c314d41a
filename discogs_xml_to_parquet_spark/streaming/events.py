"""Structured Streaming over the events stream (SURVEY.md §2.B
'Streaming' -- an extension; the reference is pure batch,
main.rs:436-473).

The transformations are written once and applied to both batch and
streaming frames (Structured Streaming's core contract): `tumbling_agg`
and `session_agg` below are used by the oracle-checked batch queries in
queries/streaming_queries.py AND by the readStream pipeline in
`stream_events` / tests.

Scale notes:
- watermark bounds state: with a 10-minute watermark, window state
  older than (max event time - 10 min) is evicted every microbatch;
  without it, windowed state grows forever
- the aggregation state store is keyed by (window, event_type) --
  bounded cardinality here; for high-cardinality keys size
  spark.sql.shuffle.partitions to spread state
- output mode 'append' emits each window once, when the watermark
  passes it -- the right mode for a downstream parquet sink
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark.functions.exact import dsum



# The events table's readStream schema, shared by every streaming lane
# (this module, streaming_queries.py, streaming_restart.py): one
# definition so a schema change cannot leave a lane reading a stale
# column set.
EVENTS_STREAM_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, "
    "event_type string, value double, props string"
)
def tumbling_agg(events: DataFrame, width: str = "5 minutes") -> DataFrame:
    """Tumbling-window counts/sums per event_type. Works identically on
    batch and streaming inputs (window() is epoch-aligned, matching
    DuckDB's time_bucket)."""
    return (
        events.groupBy(F.window("ts", width), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("total_value"),
        )
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_agg(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user: a session extends while consecutive
    events are < gap apart. In streaming this is state-store-backed
    session_window; in batch the same expression runs as a sort-based
    aggregation."""
    return (
        events.groupBy(F.session_window("ts", gap), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("session_value"),
        )
        .select(
            "user_id",
            F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("session_window.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def sliding_agg(events: DataFrame, width: str = "10 minutes",
                slide: str = "5 minutes") -> DataFrame:
    """Sliding (hopping) windows: each event lands in width/slide
    overlapping windows (2 here). In streaming, state is kept per open
    window copy -- watermark eviction matters twice as much as for
    tumbling; batch runs the same expression as an explode of window
    instances + hash agg."""
    return (
        events.groupBy(F.window("ts", width, slide), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("total_value"),
        )
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            F.date_format("window.end", "yyyy-MM-dd HH:mm:ss").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def dedup_first(events: DataFrame, width: str = "5 minutes") -> DataFrame:
    """Streaming-shaped dedup: one surviving event per (user_id,
    event_type, window) key -- the earliest by (ts, event_id) -- plus
    the number of events collapsed. This is the batch face of
    dropDuplicatesWithinWatermark-style dedup (keep-first within a
    bounded horizon; tests/test_streaming.py drives the true streaming
    variant): a windowed min_by aggregation is streaming-legal under a
    watermark, unlike row_number windows."""
    return (
        events.groupBy(F.window("ts", width), "user_id", "event_type")
        .agg(
            F.min_by("event_id", F.struct("ts", "event_id")).alias("first_event_id"),
            F.min(F.date_format("ts", "yyyy-MM-dd HH:mm:ss")).alias("first_ts"),
            (F.count(F.lit(1)) - 1).alias("n_collapsed"),
        )
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "user_id",
            "event_type",
            "first_event_id",
            "first_ts",
            "n_collapsed",
        )
    )


def stream_events(spark: SparkSession, source_dir: str,
                  watermark: str = "10 minutes",
                  width: str = "5 minutes") -> DataFrame:
    """readStream -> watermark -> tumbling agg: the streaming pipeline.
    `source_dir` must contain parquet files with the events schema
    (ts already a timestamp -- see tables._load_events for the nanos
    caveat on the raw testdata)."""
    schema = EVENTS_STREAM_SCHEMA
    # watermarks require TimestampType (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE
    # on NTZ); the cast interprets wall time in the session zone -- the
    # session pins UTC (session.py) so batch (NTZ) and stream agree
    stream = (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
    )
    return tumbling_agg(stream, width)


def dedup_docs_exact(docs: DataFrame, watermark: str = "10 minutes",
                     streaming: bool = False) -> DataFrame:
    """Streaming-native exact document dedup: the
    dropDuplicatesWithinWatermark twin of q_dedup_exact (VERDICT r6
    item 7 -- the one §2.B streaming row without a streaming-native
    counterpart). Keys on md5(text) so the dedup state carries 32-byte
    hashes, never documents -- the same shuffle-weight argument as the
    batch operator (queries/dedup.py:76).

    Documents have no event time, so a deterministic ingest timestamp
    is derived from doc_id (epoch + doc_id seconds) -- monotone in
    doc_id, which keeps the watermark advancing as a parquet backfill
    drains in id order. In a live pipeline this column IS the ingest
    time. State is bounded by the watermark: a duplicate arriving
    within the horizon is dropped; one outside it would re-emit, the
    documented dropDuplicatesWithinWatermark contract (batch dedup has
    no horizon -- the equivalence test feeds everything inside one).

    With streaming=False the same transformation runs on a batch frame
    via dropDuplicates (dropDuplicatesWithinWatermark is
    streaming-only); both paths emit one survivor per distinct text.
    """
    # base epoch 2020-01-01: the stream's INITIAL event-time watermark
    # is epoch 0, and a row whose event time does not exceed the
    # current watermark is discarded as late -- with base 0, doc_id=0
    # (testdata ids start at 0) lands exactly on the initial watermark
    # and silently vanishes from the output
    keyed = docs.withColumn("text_hash", F.md5("text")).withColumn(
        "ingest_ts",
        (F.lit(1_577_836_800) + F.col("doc_id")).cast("timestamp"),
    )
    if streaming:
        return keyed.withWatermark(
            "ingest_ts", watermark
        ).dropDuplicatesWithinWatermark(["text_hash"])
    return keyed.dropDuplicates(["text_hash"])


def stream_dedup_docs(spark: SparkSession, source_dir: str,
                      watermark: str = "10 minutes",
                      glob: str | None = None) -> DataFrame:
    """readStream -> watermark -> dropDuplicatesWithinWatermark over a
    parquet documents directory (doc_id, text, lang, source, n_chars).
    `glob` sets pathGlobFilter -- the file streaming source requires a
    DIRECTORY basePath, so a single-file table like the testdata's
    documents.parquet is streamed as (parent dir, glob=filename)."""
    schema = ("doc_id long, text string, lang string, source string, "
              "n_chars long")
    reader = spark.readStream.schema(schema)
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    stream = reader.parquet(source_dir)
    return dedup_docs_exact(stream, watermark, streaming=True)
