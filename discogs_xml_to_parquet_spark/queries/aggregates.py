"""Aggregation breadth: distinct, approximate, rollup/cube/grouping sets
(SURVEY.md §2.B 'Aggregations' + 'Grouping sets').

Scale notes: every groupBy here is a two-phase HashAggregate (partial
map-side combine, then final after a shuffle keyed on the group columns)
-- the shuffle carries one row per (group, partition), not per input
row. COUNT(DISTINCT) expands to a two-level aggregate (Expand +
re-aggregation); approx_count_distinct replaces that with a fixed-size
HLL sketch merged map-side, the right trade at 100 TB when +-2% error is
acceptable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark.functions.exact import dsum
from discogs_xml_to_parquet_spark.registry import query
from discogs_xml_to_parquet_spark.tables import load


@query(
    "q_agg_distinct",
    oracle="""
SELECT
  c_mktsegment,
  COUNT(*) AS n_customers,
  COUNT(DISTINCT c_nationkey) AS n_nations,
  CAST(SUM(DISTINCT CAST(c_nationkey AS BIGINT)) AS BIGINT) AS sum_distinct_nk,
  CAST(MIN(c_acctbal) AS DOUBLE) AS min_bal,
  CAST(MAX(c_acctbal) AS DOUBLE) AS max_bal
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregates alongside plain ones (forces the Expand-based
    two-level distinct plan). min/max of doubles are order-insensitive,
    so they are safe to emit raw."""
    c = load(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.sum_distinct(F.col("c_nationkey").cast("bigint")).alias("sum_distinct_nk"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "q_agg_rollup",
    oracle="""
SELECT
  l_returnflag,
  l_linestatus,
  CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
  CAST(GROUPING(l_linestatus) AS INT) AS g_status,
  COUNT(*) AS n_rows,
  CAST(SUM(CAST(floor((l_quantity) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000 AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY g_flag, g_status, l_returnflag, l_linestatus
""",
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: hierarchical subtotals + grand total in one pass (Expand
    produces the grouping-set replicas before a single shuffle)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.count(F.lit(1)).alias("n_rows"),
            dsum("l_quantity").alias("sum_qty"),
        )
        .select("l_returnflag", "l_linestatus", "g_flag", "g_status", "n_rows", "sum_qty")
        .orderBy("g_flag", "g_status", "l_returnflag", "l_linestatus")
    )


@query(
    "q_agg_cube",
    oracle="""
SELECT
  o_orderstatus,
  o_orderpriority,
  CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
  CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(floor((o_totalprice) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000 AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority
""",
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^n grouping combinations in one Expand+aggregate."""
    o = load(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_prio"),
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total"),
        )
        .select("o_orderstatus", "o_orderpriority", "g_status", "g_prio", "n_orders", "total")
        .orderBy("g_status", "g_prio", "o_orderstatus", "o_orderpriority")
    )


@query(
    "q_agg_grouping_sets",
    oracle="""
SELECT
  c_mktsegment,
  c_nationkey,
  CAST(GROUPING(c_mktsegment) AS INT) AS g_seg,
  CAST(GROUPING(c_nationkey) AS INT) AS g_nat,
  COUNT(*) AS n_customers
FROM customer
GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
ORDER BY g_seg, g_nat, c_mktsegment, c_nationkey
""",
)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS through the SQL API (the engine exposes
    both DataFrame and spark.sql surfaces; this exercises the latter)."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    return spark.sql("""
        SELECT
          c_mktsegment,
          c_nationkey,
          CAST(GROUPING(c_mktsegment) AS INT) AS g_seg,
          CAST(GROUPING(c_nationkey) AS INT) AS g_nat,
          COUNT(*) AS n_customers
        FROM customer_v
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
        ORDER BY g_seg, g_nat, c_mktsegment, c_nationkey
    """)
