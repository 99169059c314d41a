"""Subquery forms: scalar, correlated-scalar, IN (SURVEY.md §2.B --
Catalyst's subquery handling, incl. decorrelation, is one of the 'free'
optimizer features the reference has no analog for).

Expressed through spark.sql over temp views: subqueries are the one
surface where SQL is the idiomatic form; Catalyst rewrites the
correlated scalar subquery into a left outer aggregate join
(decorrelation), which is exactly the plan one would hand-write."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from discogs_xml_to_parquet_spark.registry import query
from discogs_xml_to_parquet_spark.tables import load


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        load(spark, sf_dir, n).createOrReplaceTempView(f"{n}_v")


@query(
    "q_subquery_scalar",
    oracle="""
SELECT c_custkey, c_acctbal
FROM customer
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
ORDER BY c_custkey
""",
)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: one aggregate computed once and
    broadcast into the filter. (avg comparison, not emission, so the
    float avg only gates rows -- values near the boundary would need the
    decimal treatment, but > avg on well-spread doubles is stable.)"""
    _views(spark, sf_dir, "customer")
    return spark.sql("""
        SELECT c_custkey, c_acctbal
        FROM customer_v
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer_v)
        ORDER BY c_custkey
    """)


@query(
    "q_subquery_correlated",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders o
WHERE o_totalprice > 2 * (
  SELECT AVG(o_totalprice) FROM orders i WHERE i.o_custkey = o.o_custkey
)
ORDER BY o_orderkey
""",
)
def q_subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: orders more than twice their
    customer's average. Catalyst decorrelates this into an aggregate +
    join -- no per-row re-execution (the thing that makes correlated
    subqueries infeasible at scale in naive engines)."""
    _views(spark, sf_dir, "orders")
    return spark.sql("""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders_v o
        WHERE o_totalprice > 2 * (
          SELECT AVG(o_totalprice) FROM orders_v i WHERE i.o_custkey = o.o_custkey
        )
        ORDER BY o_orderkey
    """)


@query(
    "q_subquery_in",
    oracle="""
SELECT s_suppkey, s_name
FROM supplier
WHERE s_nationkey IN (
  SELECT n_nationkey FROM nation WHERE n_regionkey IN (
    SELECT r_regionkey FROM region WHERE r_name IN ('ASIA', 'EUROPE')
  )
)
ORDER BY s_suppkey
""",
)
def q_subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested IN subqueries (rewritten to semi joins by Catalyst)."""
    _views(spark, sf_dir, "supplier", "nation", "region")
    return spark.sql("""
        SELECT s_suppkey, s_name
        FROM supplier_v
        WHERE s_nationkey IN (
          SELECT n_nationkey FROM nation_v WHERE n_regionkey IN (
            SELECT r_regionkey FROM region_v WHERE r_name IN ('ASIA', 'EUROPE')
          )
        )
        ORDER BY s_suppkey
    """)
