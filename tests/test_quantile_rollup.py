"""Mergeable-histogram rollup invariants (queries/quantile_rollup.py):
the production rollup never touches the fact, the stored histogram
table is kilobyte-sized, re-merging merged vectors is sound, and the
emitted quantile bin really brackets the exact quantile."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark.queries.quantile_rollup import (
    _BINS,
    _RANGE_HI,
    _RANGE_LO,
    _WIDTH,
    rollup_from_histograms,
    staged_day_histograms,
)
from discogs_xml_to_parquet_spark.tables import load
from tests.conftest import SF_SMOKE


def test_rollup_reads_only_histogram_table(spark):
    """The point of storing histograms: the range rollup's plan scans
    the histogram parquet (twice -- per-type and ALL branches of the
    union; both MV-sized) and the events fact ZERO times."""
    from tests.test_plans import plan_of

    d = staged_day_histograms(spark, SF_SMOKE)
    plan = plan_of(rollup_from_histograms(spark, d))
    assert "events.parquet" not in plan, plan


def test_histogram_table_is_mv_sized(spark):
    """One row per (event_type, day), a 64-long vector each: orders of
    magnitude smaller than the fact it summarizes."""
    d = staged_day_histograms(spark, SF_SMOKE)
    mv = spark.read.parquet(d)
    n_types = load(spark, SF_SMOKE, "events").select(
        "event_type").distinct().count()
    assert mv.count() <= n_types * 31  # one month of days per type
    assert all(len(r["hist"]) == _BINS for r in mv.collect())
    total_bytes = sum(
        p.stat().st_size for p in Path(d).glob("part-*") if p.is_file())
    assert total_bytes < 512 * 1024, total_bytes


def test_day_vectors_sum_to_fact_counts(spark):
    """Vector-merge soundness at the finest grain: summing every
    stored day vector cell-wise reproduces the fact's per-bin counts
    exactly (counts are lossless through the MV; only the value->bin
    mapping quantizes)."""
    d = staged_day_histograms(spark, SF_SMOKE)
    from discogs_xml_to_parquet_spark.queries.quantile_rollup import (
        _bin_col,
    )

    mv = (
        spark.read.parquet(d)
        .select(F.posexplode("hist").alias("pos", "cnt"))
        .groupBy("pos").agg(F.sum("cnt").alias("cnt"))
        .filter(F.col("cnt") > 0)
    )
    fact = (
        load(spark, SF_SMOKE, "events")
        .filter(F.col("value").isNotNull())
        .select(_bin_col(F.col("value")).alias("pos"))
        .groupBy("pos").agg(F.count(F.lit(1)).alias("cnt"))
    )
    assert sorted(map(tuple, mv.collect())) == sorted(
        map(tuple, fact.collect()))


def test_quantile_bin_brackets_exact_quantile(spark):
    """The histogram-quantile contract: the exact in-range median must
    lie inside the emitted p50 bin's [16b, 16b+16) interval -- one bin
    width is the whole error budget."""
    d = staged_day_histograms(spark, SF_SMOKE)
    rolled = {r["event_type"]: r
              for r in rollup_from_histograms(spark, d).collect()}
    vals = sorted(
        r["value"]
        for r in load(spark, SF_SMOKE, "events")
        .filter(F.col("value").isNotNull())
        .filter(F.to_date("ts").between(_RANGE_LO, _RANGE_HI))
        .select("value").collect()
    )
    import math

    exact_p50 = vals[math.ceil(0.5 * len(vals)) - 1]
    b = rolled["ALL"]["p50_bin"]
    assert b * _WIDTH <= exact_p50 < (b + 1) * _WIDTH
    assert rolled["ALL"]["n_events"] == len(vals)
