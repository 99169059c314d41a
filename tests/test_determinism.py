"""Partition-count invariance: results must be identical under
different parallelism (the driver runs its own session config; any
shuffle-partition-dependent value would flake the t2 hash)."""

from __future__ import annotations

import pytest

from discogs_xml_to_parquet_spark import registry
from tests.conftest import SF_ORACLE
from tests.oracle_utils import _normalize

registry.load_all_queries()

# the queries whose shapes could plausibly leak partitioning: float
# aggregation order, collect_set order, LSH pair generation, window ties
RISKY = [
    "q1_pricing_summary",
    "q_join_star_revenue",
    "q_nested_collect",
    "q_dedup_minhash_lsh",
    "q_dedup_embedding_cosine",
    "q_window_running",
    "q_asof_join",
    "q_stream_session",
]


@pytest.mark.parametrize("name", RISKY)
def test_partition_count_invariant(spark, name):
    fn = registry.QUERIES[name]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        df_a = fn(spark, SF_ORACLE)
        a = _normalize([tuple(r) for r in df_a.collect()], df_a.columns)
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        df_b = fn(spark, SF_ORACLE)
        b = _normalize([tuple(r) for r in df_b.collect()], df_b.columns)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b, f"{name}: result depends on shuffle partition count"
