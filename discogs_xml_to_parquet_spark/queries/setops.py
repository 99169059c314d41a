"""Set operations: union/union all, intersect[ all], except[ all]
(SURVEY.md §2.B 'Set ops').

Scale notes: UNION ALL is free (no shuffle -- just plan concatenation);
the distinct variants (UNION/INTERSECT/EXCEPT) each cost a shuffle on
the full row. Prefer pre-aggregated or pre-filtered inputs so the
shuffle carries keys, not facts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark.registry import query
from discogs_xml_to_parquet_spark.tables import load


@query(
    "q_setops_nations",
    oracle="""
WITH cust_n AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
     supp_n AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
SELECT 'both' AS src, nationkey FROM (SELECT nationkey FROM cust_n INTERSECT SELECT nationkey FROM supp_n)
UNION ALL
SELECT 'cust_only' AS src, nationkey FROM (SELECT nationkey FROM cust_n EXCEPT SELECT nationkey FROM supp_n)
UNION ALL
SELECT 'supp_only' AS src, nationkey FROM (SELECT nationkey FROM supp_n EXCEPT SELECT nationkey FROM cust_n)
ORDER BY src, nationkey
""",
)
def q_setops_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL composed: partition the nation-key
    space by which side (customers, suppliers) covers it."""
    cust = (
        load(spark, sf_dir, "customer")
        .select(F.col("c_nationkey").alias("nationkey"))
        .distinct()
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .select(F.col("s_nationkey").alias("nationkey"))
        .distinct()
    )
    both = cust.intersect(supp).select(F.lit("both").alias("src"), "nationkey")
    cust_only = cust.exceptAll(supp).select(F.lit("cust_only").alias("src"), "nationkey")
    supp_only = supp.exceptAll(cust).select(F.lit("supp_only").alias("src"), "nationkey")
    return both.unionByName(cust_only).unionByName(supp_only).orderBy("src", "nationkey")


@query(
    "q_setops_multiset",
    oracle="""
SELECT l_partkey FROM lineitem WHERE l_quantity >= 45
INTERSECT ALL
SELECT l_partkey FROM lineitem WHERE l_discount >= 0.08
""",
)
def q_setops_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL: multiset semantics -- each partkey appears
    min(count_left, count_right) times. Exercises the bag-variant
    plans (no implicit distinct)."""
    li = load(spark, sf_dir, "lineitem")
    heavy = li.filter(F.col("l_quantity") >= 45).select("l_partkey")
    discounted = li.filter(F.col("l_discount") >= 0.08).select("l_partkey")
    return heavy.intersectAll(discounted)
