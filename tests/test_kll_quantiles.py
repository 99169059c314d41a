"""KLL quantile-sketch invariants (queries/kll_quantiles.py): the
production range query never touches the fact, the sketch's item
count is lossless through every merge level, and re-merging merged
sketches keeps the rank-error contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark.queries.kll_quantiles import (
    _K,
    _RANGE_HI,
    _RANGE_LO,
    quantiles_from_sketches,
    staged_day_kll,
)
from discogs_xml_to_parquet_spark.tables import load
from tests.conftest import SF_SMOKE


def test_quantiles_read_only_sketch_table(spark):
    """The range query's plan scans the sketch parquet once (rollup =
    one Expand + one aggregation) and the events fact ZERO times."""
    from tests.test_plans import plan_of

    d = staged_day_kll(spark, SF_SMOKE)
    plan = plan_of(quantiles_from_sketches(spark, d))
    tree = plan.split("\n\n")[0]
    assert tree.count("Scan parquet") == 1, tree
    assert "Expand" in tree, tree
    assert "events.parquet" not in plan, plan


def test_sketch_n_is_lossless(spark):
    """KLL's n is an exact counter, not an estimate: through the
    day -> (type, ALL) rollup it must equal the fact's non-null count
    for the window, per group."""
    d = staged_day_kll(spark, SF_SMOKE)
    rolled = {r["event_type"]: r
              for r in quantiles_from_sketches(spark, d).collect()}
    fact = (
        load(spark, SF_SMOKE, "events")
        .filter(F.col("value").isNotNull())
        .filter(F.to_date("ts").between(_RANGE_LO, _RANGE_HI))
        .groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    )
    per_type = {r["event_type"]: r["n"] for r in fact.collect()}
    for t, n in per_type.items():
        assert rolled[t]["sketch_n"] == n == rolled[t]["n_values"], t
    assert rolled["ALL"]["sketch_n"] == sum(per_type.values())


def test_remerged_quantiles_track_exact(spark):
    """Two-level re-merge (day -> per-type -> ALL as separate jobs
    would run it): the twice-merged sketch's median must still land
    within the rank band around the exact median -- merges of merges
    keep the error contract."""
    d = staged_day_kll(spark, SF_SMOKE)
    days = spark.read.parquet(d).filter(
        F.col("day").between(_RANGE_LO, _RANGE_HI))
    total = (
        days.groupBy("event_type")
        .agg(F.kll_merge_agg_double("val_sketch", _K).alias("tsk"))
        .agg(F.kll_sketch_get_quantile_double(
            F.kll_merge_agg_double("tsk", _K), F.lit(0.5)).alias("p50"))
    ).first()["p50"]
    vals = sorted(
        r["value"]
        for r in load(spark, SF_SMOKE, "events")
        .filter(F.col("value").isNotNull())
        .filter(F.to_date("ts").between(_RANGE_LO, _RANGE_HI))
        .select("value").collect()
    )
    n = len(vals)
    lo = vals[max(0, int(0.47 * n) - 1)]
    hi = vals[min(n - 1, int(0.53 * n))]
    assert lo <= total <= hi, (lo, total, hi)
