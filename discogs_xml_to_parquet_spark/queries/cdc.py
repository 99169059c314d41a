"""CDC changelog compaction: materialize the latest state of a keyed
table from an ordered stream of upserts and deletes -- the ingest shape
of every CDC/Debezium-fed lakehouse table, and the batch twin of
Structured Streaming's `transformWithState` latest-value operators.

The reference (src/main.rs) is append-only with no update surface; this
is a brief-required warehouse extension. The events table plays the
changelog: every row is an operation on its user_id (the key), ordered
by (ts, event_id); 'error' events are deletes, everything else upserts
the carried value.

Scale shape: ONE hash shuffle on the key, then a per-key sort inside
each partition (Spark's window exec) -- no global sort, no driver
state. This is exactly how a 100 TB compaction runs: changelog
partitions are co-partitioned with the key, AQE splits skewed keys,
and the output is the (much smaller) live-state table. The same plan
compacts incrementally when the changelog is bucketed by key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark.registry import query
from discogs_xml_to_parquet_spark.tables import load

_DELETE = "error"  # the event_type that plays the changelog DELETE op


@query(
    "q_cdc_apply",
    oracle=f"""
WITH log AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type,
         value
  FROM events
), ranked AS (
  SELECT user_id, ts, event_id, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n_ops
  FROM log
)
SELECT user_id,
       event_type AS last_op,
       value AS last_value,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
       CAST(n_ops AS BIGINT) AS n_ops
FROM ranked
WHERE rn = 1 AND event_type <> '{_DELETE}'
ORDER BY user_id
""",
)
def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-state materialization: rank each key's operations newest
    first (ROW_NUMBER over ts DESC, event_id DESC -- the event_id
    tiebreak makes same-timestamp ordering deterministic), keep rank 1,
    and drop keys whose final operation is a delete. n_ops (the per-key
    changelog depth) falls out of the same window partition, so the
    whole compaction is one shuffle + one in-partition sort. The value
    column passes through unaggregated (no float summation), and the
    timestamp is formatted to a string per the registry determinism
    rules."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    wp = Window.partitionBy("user_id")
    return (
        ev.select("user_id", "ts", "event_id", "event_type", "value")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n_ops", F.count(F.lit(1)).over(wp))
        .filter((F.col("rn") == 1) & (F.col("event_type") != _DELETE))
        .select(
            "user_id",
            F.col("event_type").alias("last_op"),
            F.col("value").alias("last_value"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
            F.col("n_ops").cast("bigint").alias("n_ops"),
        )
        .orderBy("user_id")
    )
