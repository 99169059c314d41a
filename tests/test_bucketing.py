"""Bucketed co-located join: correctness + the actual point -- no
exchange in the physical plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark.operators.bucketing import (
    bucketed_join,
    write_bucketed,
)
from discogs_xml_to_parquet_spark.tables import load
from tests.conftest import SF_SMOKE


def test_bucketed_join_no_exchange(spark, tmp_path):
    li = load(spark, SF_SMOKE, "lineitem")
    o = load(spark, SF_SMOKE, "orders")
    write_bucketed(li, "li_b", str(tmp_path / "li_b"), ["l_orderkey"], 8)
    write_bucketed(
        o.withColumnRenamed("o_orderkey", "l_orderkey"),
        "o_b", str(tmp_path / "o_b"), ["l_orderkey"], 8,
    )
    # disable broadcast so the planner must pick SMJ: the test is that
    # the co-bucketed layout removes the shuffle a SMJ would need (with
    # broadcast on, the planner just broadcasts the small side and skips
    # bucketing -- also fine, but not what's under test)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "li_b", "o_b", ["l_orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"

        expected = li.join(
            o, li.l_orderkey == o.o_orderkey
        ).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS o_b")
