"""Core relational queries: scan/filter/project/agg/sort (SURVEY.md §2.B).

The reference implements only scan+project+sink (src/main.rs:436-473);
filters, aggregates and sorts are 'absent' categories supplied here by
stock Spark primitives. Each query is written so Catalyst can push the
filter and the column pruning into the parquet scan, and so the
aggregation runs as a two-phase HashAggregate (partial map-side combine
before the shuffle) -- at 100 TB the shuffle carries only
num_groups x num_partitions rows, not the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark.functions.exact import davg, dsum
from discogs_xml_to_parquet_spark.registry import query
from discogs_xml_to_parquet_spark.tables import load

FLAGSHIP_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(floor((l_quantity) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000 AS sum_qty,
  CAST(SUM(CAST(floor((l_extendedprice) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000 AS sum_base_price,
  CAST(SUM(CAST(floor((l_extendedprice * (1 - l_discount)) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000 AS sum_disc_price,
  CAST(SUM(CAST(floor((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000 AS sum_charge,
  CAST(SUM(CAST(floor((l_quantity) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000 / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(floor((l_extendedprice) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000 / COUNT(*) AS avg_price,
  CAST(SUM(CAST(floor((l_discount) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000 / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@query("q1_pricing_summary", oracle=FLAGSHIP_ORACLE)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: the flagship end-to-end slice.

    Scan -> pushed filter -> two-phase hash aggregate -> sort. The scan
    reads only the 8 referenced columns (ReadSchema pruning) and the
    shipdate predicate reaches the parquet row-group stats
    (PushedFilters), so at scale the input is bounded by the date range,
    not the table size.
    """
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q_filter_project",
    oracle="""
SELECT
  l_orderkey,
  l_linenumber,
  CAST(l_quantity AS BIGINT) AS qty_int,
  CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS DOUBLE) AS net_price_dec,
  l_returnflag = 'R' AS is_returned
FROM lineitem
WHERE l_discount > 0.05 AND l_quantity >= 40 AND l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
""",
)
def q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter + projection + casts (reference analog: main.rs:486,846 casts,
    and the skip-parser projection pushdown at main.rs:758-917).

    All three predicates and the 7-column projection push into the scan;
    no shuffle at all -- the whole query is one narrow stage.
    """
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_discount") > 0.05)
            & (F.col("l_quantity") >= 40)
            & (F.col("l_shipdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp_ntz"))
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").cast("bigint").alias("qty_int"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .cast("decimal(18,4)")
            .cast("double")
            .alias("net_price_dec"),
            (F.col("l_returnflag") == "R").alias("is_returned"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle="""
SELECT
  o_orderkey,
  CAST(SUM(CAST(floor((l_extendedprice * (1 - l_discount)) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000 AS revenue,
  STRFTIME(o_orderdate, '%Y-%m-%d') AS orderdate
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: unshipped-order revenue for one segment, top 10.
    Both date predicates push to the scans; the segment filter shrinks
    customer before its join; final top-k is a TakeOrderedAndProject."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    )
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select(
            "o_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(10)
    )


@query(
    "q_sort_limit_topk",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 25
""",
)
def q_sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: sort + limit with a unique-key tiebreak.

    Spark executes this as TakeOrderedAndProject -- each task keeps a
    25-row heap and the driver merges; no full sort, no shuffle of the
    table. This is the only scalable global-top-k plan at 100 TB.
    """
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
    )


@query(
    "q_sink_roundtrip",
    oracle="""
SELECT
  l_returnflag,
  COUNT(*) AS n_rows,
  CAST(SUM(CAST(floor((l_quantity) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000 AS sum_qty
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def q_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sink category, driver-checkable (VERDICT r1 flagged the sink as
    locally-tested only): write a projection of lineitem as snappy
    parquet PARTITIONED BY l_returnflag (operators/sinks.py
    write_partitioned), read the directory back, and aggregate -- the
    oracle computes the same aggregate from the original table, so any
    loss/corruption/duplication through the sink+scan round trip breaks
    the hash. Partitioned layout is the 100 TB sink shape: downstream
    readers filtering on the partition key prune directories instead of
    scanning files (test_partition_pruning pins that plan)."""
    from discogs_xml_to_parquet_spark.operators.sinks import write_partitioned
    from discogs_xml_to_parquet_spark.queries._paths import scratch_sink_dir

    out = scratch_sink_dir("sink_roundtrip", sf_dir)
    li = load(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    write_partitioned(li, out, ["l_returnflag"])
    back = spark.read.parquet(out)
    return (
        back.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum("l_quantity").alias("sum_qty"),
        )
        .orderBy("l_returnflag")
    )
