"""Bucket-pruning invariants (queries/bucket_pruning.py): the point
lookup really opens <= |keys| of 16 bucket files, the autoBucketedScan
subtlety is pinned both ways, and the session conf does not leak."""

from __future__ import annotations

from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark.queries.bucket_pruning import (
    _BUCKETS,
    _KEYS,
    bucketed_orders_by_custkey,
    pruned_lookup,
    selected_buckets,
)
from tests.conftest import SF_SMOKE


def test_lookup_selects_at_most_key_count_buckets(spark):
    """SelectedBucketsCount <= |keys| out of 16: the layout's plan-time
    commitment the driver row's boolean is built from."""
    tbl = bucketed_orders_by_custkey(spark, SF_SMOKE)
    sel, total = selected_buckets(pruned_lookup(spark, tbl))
    assert total == _BUCKETS
    assert 0 < sel <= len(_KEYS), (sel, total)


def test_auto_bucketed_scan_defeats_pruning(spark):
    """The subtlety the lane documents: WITHOUT forcing bucketed
    reading, the planner disables it for a bare point lookup and
    SelectedBucketsCount disappears -- the layout does nothing. Pinned
    so a Spark upgrade changing this default is noticed."""
    tbl = bucketed_orders_by_custkey(spark, SF_SMOKE)
    df = spark.table(tbl).filter(F.col("o_custkey").isin(*_KEYS))
    assert selected_buckets(df) == (-1, -1)


def test_pruning_loses_no_rows(spark):
    """Over-pruning is bucketing's failure mode: the pruned lookup's
    row set must equal the unpruned filter's, key for key."""
    tbl = bucketed_orders_by_custkey(spark, SF_SMOKE)
    pruned = sorted(
        r["o_orderkey"]
        for r in pruned_lookup(spark, tbl).select("o_orderkey").collect())
    full = sorted(
        r["o_orderkey"]
        for r in spark.table(tbl)
        .filter(F.col("o_custkey").isin(*_KEYS))
        .select("o_orderkey").collect())
    assert pruned == full and pruned


def test_forced_bucketed_scan_conf_does_not_leak(spark):
    """pruned_lookup flips autoBucketedScan in a SIBLING session; the
    main session's conf must keep its default, so no other lane's
    plan can be perturbed."""
    tbl = bucketed_orders_by_custkey(spark, SF_SMOKE)
    pruned_lookup(spark, tbl)
    assert spark.conf.get(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled") == "true"
