"""Range / interval joins: the temporal-join family beyond as-of.

The reference (src/main.rs) has no join surface at all; these are
brief-required extensions expressed Spark-first:

- equi-key + range predicate  -> SortMergeJoin on the key, range as a
  join filter (no explosion; the 100 TB shape for per-entity windows);
- keyless pure-range join     -> bucket the time axis and equi-join on
  the bucket (banded join), verifying the exact predicate after; never
  a broadcast-nested-loop over the raw inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark.functions.exact import dsum
from discogs_xml_to_parquet_spark.registry import query
from discogs_xml_to_parquet_spark.tables import load


@query(
    "q_range_join_events",
    oracle="""
WITH p AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
  FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id,
       p.user_id,
       COUNT(e.event_id) AS n_prior,
       COALESCE(CAST(SUM(CAST(floor((e.value) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000, 0.0)
         AS prior_value
FROM p
LEFT JOIN events e
  ON e.user_id = p.user_id
 AND CAST(e.ts AS TIMESTAMP) >= p.ts - INTERVAL 10 MINUTE
 AND CAST(e.ts AS TIMESTAMP) <  p.ts
GROUP BY p.event_id, p.user_id
ORDER BY p.event_id
""",
)
def q_range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-purchase lookback: every purchase joined to the same user's
    events in the preceding 10 minutes. The equi key (user_id) carries
    the shuffle -- Spark plans a SortMergeJoin with the time range as a
    join filter, so each user's timeline meets only itself; at 100 TB
    this partitions by user exactly like the production per-entity
    window joins it models. LEFT join keeps zero-activity purchases
    (count 0 / value 0.0, coalesced identically in the oracle)."""
    e = load(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    prior = e.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        "value",
    )
    return (
        p.join(
            prior,
            (p["user_id"] == prior["p_user"])
            & (prior["p_ts"] >= F.expr("ts - INTERVAL 10 MINUTES"))
            & (prior["p_ts"] < p["ts"]),
            "left",
        )
        .groupBy("event_id", "user_id")
        .agg(
            F.count("p_ts").alias("n_prior"),
            F.coalesce(dsum("value"), F.lit(0.0)).alias("prior_value"),
        )
        .orderBy("event_id")
    )


@query(
    "q_interval_overlap",
    oracle="""
WITH iv AS (
  SELECT o_orderkey, o_custkey,
         CAST(o_orderdate AS TIMESTAMP) AS s,
         CAST(o_orderdate AS TIMESTAMP) + INTERVAL 30 DAY AS e
  FROM orders
)
SELECT a.o_custkey AS custkey,
       a.o_orderkey AS ok1,
       b.o_orderkey AS ok2,
       CAST(date_diff('day', greatest(a.s, b.s), least(a.e, b.e)) AS INT)
         AS overlap_days
FROM iv a
JOIN iv b
  ON a.o_custkey = b.o_custkey
 AND a.o_orderkey < b.o_orderkey
 AND a.s < b.e AND b.s < a.e
ORDER BY custkey, ok1, ok2
""",
)
def q_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self-join: orders modeled as 30-day service
    windows; emit overlapping same-customer pairs with the overlap
    length. Equi key (custkey) + two range predicates as join filters:
    the classic interval join plan that stays a partitioned SMJ at any
    scale (pairs explode only within a customer, bounded by per-entity
    activity). Both engines compute day counts on midnight-aligned
    timestamps, so datediff/date_diff agree exactly."""
    o = load(spark, sf_dir, "orders")
    iv = o.select(
        "o_orderkey",
        "o_custkey",
        F.col("o_orderdate").alias("s"),
        F.expr("o_orderdate + INTERVAL 30 DAYS").alias("e"),
    )
    a, b = iv.alias("a"), iv.alias("b")
    return (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey"))
            & (F.col("a.s") < F.col("b.e"))
            & (F.col("b.s") < F.col("a.e")),
        )
        .select(
            F.col("a.o_custkey").alias("custkey"),
            F.col("a.o_orderkey").alias("ok1"),
            F.col("b.o_orderkey").alias("ok2"),
            F.datediff(
                F.least("a.e", "b.e"), F.greatest("a.s", "b.s")
            ).alias("overlap_days"),
        )
        .orderBy("custkey", "ok1", "ok2")
    )


@query(
    "q_range_join_bucketed",
    oracle="""
WITH err AS (
  SELECT event_id AS err_id, CAST(ts AS TIMESTAMP) AS err_ts
  FROM events WHERE event_type = 'error'
),
clk AS (
  SELECT event_id AS clk_id, CAST(ts AS TIMESTAMP) AS clk_ts,
         epoch_us(CAST(ts AS TIMESTAMP)) // 1800000000 AS bucket
  FROM events WHERE event_type = 'click'
),
probe AS (
  SELECT err_id, err_ts, unnest([b0, b0 - 1]) AS bucket
  FROM (SELECT err_id, err_ts,
               epoch_us(err_ts) // 1800000000 AS b0 FROM err)
)
SELECT p.err_id,
       c.clk_id,
       epoch_us(p.err_ts) - epoch_us(c.clk_ts) AS delta_us
FROM probe p
JOIN clk c ON p.bucket = c.bucket
WHERE c.clk_ts >= p.err_ts - INTERVAL 30 MINUTE
  AND c.clk_ts < p.err_ts
ORDER BY err_id, clk_id
""",
)
def q_range_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyless range join, the banded scale path: match every error
    event to ANY user's clicks in the preceding 30 minutes. With no
    equi key, a naive plan is a broadcast-nested-loop over the whole
    cross product; instead both sides are bucketed to the half hour and
    each error probes its own bucket and the one before (which together
    cover the full 30-minute lookback), making the only wide operation an
    equi-join on the bucket id. Exact range verification runs on the
    in-bucket candidates only -- the same band-then-verify shape as the
    LSH dedup family, applied to the time axis."""
    e = load(spark, sf_dir, "events")
    # integer DIV, never double /: a double quotient near a minute
    # boundary can round up across the integer and land the event in
    # the wrong bucket
    err = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        F.col("ts").alias("err_ts"),
        F.expr(
            "unix_micros(CAST(ts AS TIMESTAMP)) DIV 1800000000"
        ).alias("b0"),
    )
    probe = err.select(
        "err_id",
        "err_ts",
        F.explode(F.array(F.col("b0"), F.col("b0") - 1)).alias("bucket"),
    )
    clk = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("clk_id"),
        F.col("ts").alias("clk_ts"),
        F.expr(
            "unix_micros(CAST(ts AS TIMESTAMP)) DIV 1800000000"
        ).alias("bucket"),
    )
    return (
        probe.join(clk, "bucket")
        .filter(
            (F.col("clk_ts") >= F.expr("err_ts - INTERVAL 30 MINUTES"))
            & (F.col("clk_ts") < F.col("err_ts"))
        )
        .select(
            "err_id",
            "clk_id",
            (
                F.unix_micros(F.col("err_ts").cast("timestamp"))
                - F.unix_micros(F.col("clk_ts").cast("timestamp"))
            ).alias("delta_us"),
        )
        .orderBy("err_id", "clk_id")
    )
