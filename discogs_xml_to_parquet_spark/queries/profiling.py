"""Table profiling: the ANALYZE/data-quality pass every warehouse runs
on ingest -- per-column row count, null count, distinct count, and
min/max, emitted as one narrow (column, stats) table.

Scale shape: ONE scan computes every column's profile (a single
aggregate with per-column expression slots -- Spark executes the
multi-distinct via a grouping-id expansion, still two-phase and
shuffle-bounded by distinct values, never rows); the per-column rows
are unpivoted from that 1-row aggregate with a literal stack, which is
driver-free. Profiling 100 TB costs exactly one pass regardless of
column count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark.registry import query
from discogs_xml_to_parquet_spark.tables import load

# (column, min/max are cast to string so every profile row has one
# uniform schema -- doubles formatted by both engines identically via
# the integer-cents detour)
_COLS = ("o_orderstatus", "o_orderpriority", "o_custkey")


@query(
    "q_profile_columns",
    oracle="""
SELECT col, n, n_null, n_distinct, min_s, max_s
FROM (
  SELECT 'o_orderstatus' AS col, COUNT(*) AS n,
         COUNT(*) - COUNT(o_orderstatus) AS n_null,
         COUNT(DISTINCT o_orderstatus) AS n_distinct,
         CAST(MIN(o_orderstatus) AS VARCHAR) AS min_s,
         CAST(MAX(o_orderstatus) AS VARCHAR) AS max_s
  FROM orders
  UNION ALL
  SELECT 'o_orderpriority', COUNT(*),
         COUNT(*) - COUNT(o_orderpriority),
         COUNT(DISTINCT o_orderpriority),
         CAST(MIN(o_orderpriority) AS VARCHAR),
         CAST(MAX(o_orderpriority) AS VARCHAR)
  FROM orders
  UNION ALL
  SELECT 'o_custkey', COUNT(*),
         COUNT(*) - COUNT(o_custkey),
         COUNT(DISTINCT o_custkey),
         CAST(MIN(o_custkey) AS VARCHAR),
         CAST(MAX(o_custkey) AS VARCHAR)
  FROM orders
)
ORDER BY col
""",
)
def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass multi-column profile of the orders table: one
    aggregate computes (count, nulls, distincts, min, max) for every
    profiled column -- Spark plans the multi-distinct as ONE expand +
    two-phase aggregate over the same scan, where the oracle's UNION
    ALL spells three scans (DuckDB dedups them; at 100 TB the
    one-aggregate form is the only acceptable shape). The 1-row wide
    result unpivots to (column, stats) rows with a literal stack --
    no second shuffle, no driver loop."""
    o = load(spark, sf_dir, "orders")
    aggs = []
    for c in _COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__null"),
            F.countDistinct(c).alias(f"{c}__dist"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = o.agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__n, {c}__null, {c}__dist, {c}__min, {c}__max"
        for c in _COLS
    )
    return wide.selectExpr(
        f"stack({len(_COLS)}, {stack})"
        " AS (col, n, n_null, n_distinct, min_s, max_s)"
    ).orderBy("col")
