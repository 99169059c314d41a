"""Batch-checkable faces of the streaming pipelines: the same
tumbling/session transformations from streaming/events.py run on the
batch events table and are oracle-checked; the true readStream path is
exercised in tests/test_streaming.py against these same functions."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from discogs_xml_to_parquet_spark.registry import query
from discogs_xml_to_parquet_spark.streaming.events import session_agg, tumbling_agg
from discogs_xml_to_parquet_spark.tables import load


@query(
    "q_stream_tumbling",
    oracle="""
SELECT
  strftime(time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS window_start,
  event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute tumbling windows per event type. window() is
    epoch-aligned, as is DuckDB's time_bucket, so buckets agree."""
    e = load(spark, sf_dir, "events")
    return tumbling_agg(e).orderBy("window_start", "event_type")


@query(
    "q_stream_session",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events)
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sessions AS (
  SELECT user_id, ts, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_no
  FROM flagged
)
SELECT user_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS session_value
FROM sessions
GROUP BY user_id, session_no
ORDER BY user_id, session_start
""",
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-minute gap) per user. The oracle rebuilds
    session_window semantics relationally: a new session starts when
    the gap >= 30min (Spark sessions span [first, last+gap)); session
    end = last event + gap. Event timestamps are unique per user here,
    so the lag-based reconstruction is exact."""
    e = load(spark, sf_dir, "events")
    return session_agg(e).orderBy("user_id", "session_start")
