"""Scalar function queries: string / date / math / JSON (SURVEY.md §2.B).

The reference's only scalar work is XML-entity unescape via `replace`
(main.rs:596,619) and str->int/bool casts (main.rs:486,826-830,846);
everything else here is 'absent' category supplied by built-in
pyspark.sql.functions -- JVM-side, whole-stage-codegen'd, no Python in
the hot path.

Cross-engine determinism notes: only exact math functions are emitted
(abs/floor/ceil/sqrt/mod, integer arithmetic) -- sqrt is IEEE
correctly-rounded so bit-identical everywhere, while ln/exp/pow are
libm-dependent and would flake the value hash. Dates are emitted as
formatted strings, never raw timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark.functions.exact import dsum
from discogs_xml_to_parquet_spark.registry import query
from discogs_xml_to_parquet_spark.tables import load


@query(
    "q_string_funcs",
    oracle="""
SELECT
  p_partkey,
  UPPER(p_name) AS name_upper,
  LOWER(p_brand) AS brand_lower,
  LENGTH(p_name) AS name_len,
  SUBSTRING(p_type, 1, 5) AS type_prefix,
  REPLACE(p_brand, 'Brand#', 'B') AS brand_short,
  CONCAT(p_brand, '/', p_type) AS brand_type,
  TRIM(CONCAT('  ', p_name, '  ')) AS name_trimmed,
  LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
  CONTAINS(p_type, 'STANDARD') AS is_standard,
  SPLIT_PART(p_type, ' ', 1) AS type_first_word
FROM part
WHERE STARTS_WITH(p_name, 'r')
""",
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions (reference analog: the hand-rolled `replace`
    unescape at main.rs:596). All JVM built-ins; fully pushed/pruned.
    Predicate matches ~13% of part names ('red widget', ...) -- round 1
    shipped startswith('p') which matched zero rows, a vacuous green."""
    p = load(spark, sf_dir, "part")
    return p.filter(F.col("p_name").startswith("r")).select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.replace(F.col("p_brand"), F.lit("Brand#"), F.lit("B")).alias("brand_short"),
        F.concat(F.col("p_brand"), F.lit("/"), F.col("p_type")).alias("brand_type"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("name_trimmed"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.col("p_type").contains("STANDARD").alias("is_standard"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_first_word"),
    )


@query(
    "q_date_funcs",
    oracle="""
SELECT
  STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m-%d') AS order_month,
  EXTRACT(year FROM o_orderdate) AS order_year,
  EXTRACT(quarter FROM o_orderdate) AS order_quarter,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(floor((o_totalprice) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000 AS month_revenue,
  MIN(STRFTIME(o_orderdate, '%Y-%m-%d')) AS first_day,
  MAX(DATEDIFF('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00')) AS max_days_to_2002
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
GROUP BY 1, 2, 3
ORDER BY 1
""",
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time functions over the order stream: trunc, extract, diff.
    Formatted-string output keeps the cross-engine hash stable."""
    o = load(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        .groupBy(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("order_month"),
            F.year("o_orderdate").cast("bigint").alias("order_year"),
            F.quarter("o_orderdate").cast("bigint").alias("order_quarter"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("month_revenue"),
            F.min(F.date_format("o_orderdate", "yyyy-MM-dd")).alias("first_day"),
            F.max(
                F.datediff(
                    F.lit("2002-01-01").cast("date"),
                    F.col("o_orderdate").cast("date"),
                ).cast("bigint")
            ).alias("max_days_to_2002"),
        )
        .orderBy("order_month")
    )


@query(
    "q_math_funcs",
    oracle="""
SELECT
  l_orderkey,
  l_linenumber,
  ABS(l_discount - 0.05) AS disc_dev,
  FLOOR(l_quantity / 7) AS qty_bucket,
  CEIL(l_extendedprice / 1000) AS price_k,
  SQRT(l_quantity) AS qty_sqrt,
  CAST(l_quantity AS BIGINT) % 5 AS qty_mod5,
  l_quantity * l_quantity AS qty_sq,
  FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) / 100 AS net_rounded
FROM lineitem
WHERE l_linenumber = 1 AND l_quantity <= 10
""",
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalars, restricted to the exactly-computable subset
    (abs/floor/ceil/sqrt/mod/multiply/round) so both engines produce
    bit-identical doubles."""
    li = load(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    return li.filter((F.col("l_linenumber") == 1) & (q <= 10)).select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor(q / 7).cast("double").alias("qty_bucket"),
        F.ceil(F.col("l_extendedprice") / 1000).cast("double").alias("price_k"),
        F.sqrt(q).alias("qty_sqrt"),
        (q.cast("bigint") % 5).alias("qty_mod5"),
        (q * q).alias("qty_sq"),
        # floor(x*100+0.5)/100, not round(x,2): Spark rounds the double's
        # shortest string repr (HALF_UP on "1222.745"), DuckDB rounds the
        # exact binary value (1222.74499...) -- they disagree at half
        # boundaries, while floor arithmetic is bit-identical in both
        (F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5) / 100)
        .alias("net_rounded"),
    )


@query(
    "q_json_funcs",
    oracle="""
SELECT
  event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
GROUP BY event_type
ORDER BY event_type
""",
)
def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction over events.props (semi-structured column), the
    pattern for property bags at scale: extract once in a project,
    filter+aggregate on the extracted value."""
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        e.select("event_type", k.alias("k"))
        .filter(F.col("k") > 50)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )
