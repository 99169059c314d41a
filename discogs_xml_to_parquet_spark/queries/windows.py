"""Window functions: ranking, analytic (lag/lead), aggregates over row
and range frames, top-k per group (SURVEY.md §2.B 'Window functions').

Scale notes: a window is one shuffle on partitionBy + a per-partition
sort. Top-k-per-group via row_number + filter is the scalable idiom --
Spark pushes a per-group heap (WindowGroupLimit) below the shuffle when
the window is rank-like and filtered, so the shuffle carries ~k rows per
group instead of the whole table. Skewed partition keys are the main
risk; AQE skew handling does not apply inside windows, so key choice
matters (here: mktsegment x bounded groups, user_id ~uniform).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark.functions.exact import scaled, unscale
from discogs_xml_to_parquet_spark.registry import query
from discogs_xml_to_parquet_spark.tables import load


@query(
    "q_window_topk_per_group",
    oracle="""
SELECT * FROM (
  SELECT
    c_mktsegment,
    o_orderkey,
    o_totalprice,
    ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders JOIN customer ON o_custkey = c_custkey
) WHERE rk <= 3
ORDER BY c_mktsegment, rk
""",
)
def q_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per market segment: join + row_number + filter.
    The rank-filter pattern lets Spark insert WindowGroupLimit under the
    exchange, bounding shuffled rows per group."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .orderBy("c_mktsegment", "rk")
    )


@query(
    "q_window_running",
    oracle="""
SELECT
  user_id,
  event_id,
  event_type,
  CAST(SUM(CAST(floor((value) * 1000000 + 0.5) AS BIGINT)) OVER w AS DOUBLE) / 1000000 AS running_total,
  LAG(event_type) OVER w AS prev_type,
  LEAD(event_type) OVER w AS next_type,
  ROW_NUMBER() OVER w AS seq
FROM events
WHERE user_id < 50
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, seq
""",
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event sequence analytics: running total (decimal-exact
    cumulative sum), lag/lead neighbors, sequence numbering -- the
    sessionization building block. Ties on ts broken by event_id."""
    e = load(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            "user_id",
            "event_id",
            "event_type",
            unscale(F.sum(scaled("value").cast("decimal(38,0)")).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )).alias("running_total"),
            F.lag("event_type").over(w).alias("prev_type"),
            F.lead("event_type").over(w).alias("next_type"),
            F.row_number().over(w).alias("seq"),
        )
        .orderBy("user_id", "seq")
    )


@query(
    "q_window_range_frame",
    oracle="""
SELECT
  o_custkey,
  o_orderkey,
  day_no,
  COUNT(*) OVER w AS orders_30d,
  CAST(SUM(CAST(floor((o_totalprice) * 1000000 + 0.5) AS BIGINT)) OVER w AS DOUBLE) / 1000000 AS spend_30d
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         DATEDIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS day_no
  FROM orders WHERE o_custkey < 100
)
WINDOW w AS (PARTITION BY o_custkey ORDER BY day_no
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
ORDER BY o_custkey, day_no, o_orderkey
""",
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-30-day window per customer via a RANGE frame over an
    integer day number (timezone-free: a datediff from a fixed epoch,
    rather than unix_timestamp which shifts with the session zone)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    day_no = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day_no")
        .rangeBetween(-30, Window.currentRow)
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            day_no.alias("day_no"),
        )
        .select(
            "o_custkey",
            "o_orderkey",
            "day_no",
            F.count(F.lit(1)).over(w).alias("orders_30d"),
            unscale(F.sum(scaled("o_totalprice").cast("decimal(38,0)")).over(w)).alias("spend_30d"),
        )
        .orderBy("o_custkey", "day_no", "o_orderkey")
    )


@query(
    "q_window_rank_dense",
    oracle="""
SELECT
  p_brand,
  p_partkey,
  p_retailprice,
  RANK() OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS size_rank,
  DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS size_dense_rank,
  CAST(NTILE(4) OVER (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey) AS BIGINT) AS price_quartile,
  CAST(FIRST_VALUE(p_partkey) OVER (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey) AS BIGINT) AS cheapest_part,
  PERCENT_RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey) AS price_pct_rank,
  CUME_DIST() OVER (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey) AS price_cume_dist
FROM part
WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
ORDER BY p_brand, p_partkey
""",
)
def q_window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank vs dense_rank (gap semantics on p_size ties), ntile
    quartiles, first_value -- the remaining ranking/analytic surface.
    rank/dense_rank are deterministic under ties by construction (equal
    inputs get equal ranks); ntile/first_value get a unique tiebreak."""
    p = load(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
    )
    w_size = Window.partitionBy("p_brand").orderBy(F.col("p_size").desc())
    w_price = Window.partitionBy("p_brand").orderBy("p_retailprice", "p_partkey")
    return p.select(
        "p_brand",
        "p_partkey",
        "p_retailprice",
        F.rank().over(w_size).alias("size_rank"),
        F.dense_rank().over(w_size).alias("size_dense_rank"),
        F.ntile(4).over(w_price).cast("bigint").alias("price_quartile"),
        F.first_value(F.col("p_partkey")).over(w_price).cast("bigint").alias("cheapest_part"),
        F.percent_rank().over(w_price).alias("price_pct_rank"),
        F.cume_dist().over(w_price).alias("price_cume_dist"),
    ).orderBy("p_brand", "p_partkey")
