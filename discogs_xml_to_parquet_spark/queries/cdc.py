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
    """Latest-state materialization as a TWO-PHASE AGGREGATE, not a
    window: max over the (ts, event_id, op, value) struct picks each
    key's newest operation (lexicographic struct order == the oracle's
    ROW_NUMBER order -- event_id is unique, so the trailing fields
    never decide), and the changelog depth rides in the same agg. The
    aggregate is associative, so Spark partial-aggregates map-side: a
    hot key collapses to one row per map task BEFORE the shuffle,
    where the equivalent rank-window formulation (the oracle's
    spelling) must sort the hot key's entire history in one reduce
    partition -- the difference between skew-proof and skew-bound at
    100 TB. Keys whose final op is a delete are dropped; value passes
    through unaggregated; the timestamp is formatted to a string per
    the registry determinism rules."""
    ev = load(spark, sf_dir, "events")
    last = F.max(
        F.struct(
            F.col("ts").alias("t"),
            F.col("event_id").alias("e"),
            F.col("event_type").alias("op"),
            F.col("value").alias("v"),
        )
    ).alias("last")
    return (
        ev.select("user_id", "ts", "event_id", "event_type", "value")
        .groupBy("user_id")
        .agg(last, F.count(F.lit(1)).cast("bigint").alias("n_ops"))
        .filter(F.col("last.op") != _DELETE)
        .select(
            "user_id",
            F.col("last.op").alias("last_op"),
            F.col("last.v").alias("last_value"),
            F.date_format("last.t", "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
            "n_ops",
        )
        .orderBy("user_id")
    )


@query(
    "q_attribution_last_touch",
    oracle=f"""
WITH ev AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type
  FROM events
), tagged AS (
  SELECT user_id, ts, event_id, event_type,
         MAX(CASE WHEN event_type NOT IN ('purchase', 'error')
                  THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS touch_ts
  FROM ev
), attributed AS (
  SELECT t.user_id, t.event_id,
         strftime(t.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
         COALESCE(s.event_type, 'none') AS channel
  FROM tagged t
  LEFT JOIN ev s
    ON s.user_id = t.user_id AND s.ts = t.touch_ts
   AND s.event_type NOT IN ('purchase', 'error')
   AND (s.ts, s.event_id) < (t.ts, t.event_id)
   AND s.event_id = (SELECT MAX(s2.event_id) FROM ev s2
                     WHERE s2.user_id = t.user_id AND s2.ts = t.touch_ts
                       AND s2.event_type NOT IN ('purchase', 'error')
                       AND (s2.ts, s2.event_id) < (t.ts, t.event_id))
  WHERE t.event_type = 'purchase'
)
SELECT user_id, event_id, purchase_ts, channel
FROM attributed
ORDER BY user_id, event_id
""",
)
def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: every purchase is credited to the
    user's most recent PRECEDING non-purchase, non-error event (its
    event_type plays the marketing channel), 'none' when the purchase
    opens the history. ONE window pass over the user timeline carries
    both the last-touch timestamp and channel (a conditional max over
    a (ts, event_id, type)-encoded struct -- no self-join back onto
    the event log, which is what makes this linear at 100 TB where
    the oracle's correlated rebuild would not be). Deterministic under
    same-timestamp touches via the event_id tiebreak inside the
    struct ordering."""
    ev = load(spark, sf_dir, "events")
    is_touch = ~F.col("event_type").isin("purchase", "error")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # encode (ts, event_id, channel) so ONE max() carries the payload;
    # struct ordering is lexicographic, so max = latest touch with the
    # highest event_id on ties -- mirroring the oracle's MAX(event_id)
    # subselect
    touch = F.max(
        F.when(
            is_touch,
            F.struct(
                F.col("ts").alias("t"),
                F.col("event_id").alias("e"),
                F.col("event_type").alias("c"),
            ),
        )
    ).over(w)
    return (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("touch", touch)
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
            F.coalesce(F.col("touch.c"), F.lit("none")).alias("channel"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "q_time_weighted_avg",
    oracle="""
WITH ev AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v_c
  FROM events
), seg AS (
  SELECT user_id, v_c,
         epoch_us(LEAD(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id)
                  - ts) AS dur_us
  FROM ev
), agg AS (
  SELECT user_id,
         CAST(SUM(v_c * dur_us) AS HUGEINT) AS wsum,
         CAST(SUM(dur_us) AS BIGINT) AS tot_us,
         COUNT(*) AS n_segments
  FROM seg WHERE dur_us IS NOT NULL
  GROUP BY user_id
)
SELECT user_id,
       CAST(n_segments AS BIGINT) AS n_segments,
       tot_us,
       CAST(wsum // tot_us AS BIGINT) AS twa_cents
FROM agg
ORDER BY user_id
""",
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (the TWAP/metrics-rollup primitive): each
    observation's value holds until the key's next event, so the
    average weights value by segment duration, not sample count --
    irregular sampling stops biasing the mean. One window pass derives
    segment durations (LEAD over the user timeline, last segment open
    -> excluded identically in both engines), then a per-key aggregate
    of exact integer (cents x microseconds) products -- sums stay
    order-independent (decimal accumulator; DuckDB HUGEINT), and the
    final integer division truncates the same way in both engines.
    One shuffle on the key; scan-bound at 100 TB."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.floor(F.col("value") * 100.0 + F.lit(0.5))
        .cast("bigint")
        .alias("v_c"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # timestampdiff on the timestamp_ntz pair directly: no cast to
    # session-zoned timestamp (tables.py documents that detour shifting
    # values under non-UTC sessions)
    seg = (
        ev.withColumn("next_ts", F.lead("ts").over(w))
        .select(
            "user_id",
            "v_c",
            F.expr(
                "timestampdiff(MICROSECOND, ts, next_ts)"
            ).alias("dur_us"),
        )
        .filter(F.col("dur_us").isNotNull())
    )
    return (
        seg.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum(
                (F.col("v_c") * F.col("dur_us")).cast("decimal(38,0)")
            ).alias("wsum"),
            F.sum("dur_us").cast("bigint").alias("tot_us"),
        )
        .select(
            "user_id",
            "n_segments",
            "tot_us",
            F.expr("CAST(wsum div tot_us AS BIGINT)").alias("twa_cents"),
        )
        .orderBy("user_id")
    )
