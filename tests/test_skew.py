"""Salted join/aggregate must be result-identical to their unsalted
forms (salting changes distribution, never semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark.operators.skew import (
    salted_aggregate,
    salted_join,
)
from discogs_xml_to_parquet_spark.tables import load
from tests.conftest import SF_SMOKE


def test_salted_join_matches_plain(spark):
    li = load(spark, SF_SMOKE, "lineitem").withColumnRenamed(
        "l_orderkey", "orderkey"
    )
    o = load(spark, SF_SMOKE, "orders").select(
        F.col("o_orderkey").alias("orderkey"), "o_totalprice"
    )
    plain = li.join(o, "orderkey")
    salted = salted_join(li, o, "orderkey", salt_buckets=4,
                         fact_unique_col="l_linenumber")
    assert salted.count() == plain.count()
    a = plain.agg(F.sum("l_quantity"), F.count(F.lit(1))).collect()[0]
    b = salted.agg(F.sum("l_quantity"), F.count(F.lit(1))).collect()[0]
    assert tuple(a) == tuple(b)


def test_salted_aggregate_matches_plain(spark):
    li = load(spark, SF_SMOKE, "lineitem")
    plain = {
        r["l_returnflag"]: (r["cnt"], r["mx"])
        for r in li.groupBy("l_returnflag")
        .agg(F.count("l_quantity").alias("cnt"), F.max("l_extendedprice").alias("mx"))
        .collect()
    }
    salted = {
        r["l_returnflag"]: (r["l_quantity_count"], r["l_extendedprice_max"])
        for r in salted_aggregate(
            li, "l_returnflag",
            {"l_quantity": "count", "l_extendedprice": "max"},
            salt_buckets=4, unique_col="l_orderkey",
        ).collect()
    }
    assert plain == salted
