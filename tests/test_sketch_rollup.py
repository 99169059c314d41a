"""Mergeable HLL rollup invariants (queries/sketch_rollup.py): the
production rollup never touches the fact, the stored sketch table is
kilobyte-sized, and the two union levels stay in the error band."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark.queries.sketch_rollup import (
    rollup_from_sketches,
    staged_day_sketches,
)
from discogs_xml_to_parquet_spark.tables import load
from tests.conftest import SF_SMOKE


def test_rollup_reads_only_sketch_table(spark):
    """The point of storing sketches: the range rollup's plan scans
    the sketch parquet ONCE (rollup = one Expand, one aggregation)
    and the events fact ZERO times."""
    from tests.test_plans import plan_of

    d = staged_day_sketches(spark, SF_SMOKE)
    plan = plan_of(rollup_from_sketches(spark, d))
    tree = plan.split("\n\n")[0]
    assert tree.count("Scan parquet") == 1, tree
    assert "Expand" in tree, tree
    assert "events.parquet" not in plan, plan


def test_sketch_table_is_mv_sized(spark):
    """One row per (event_type, day), ~1.5 KiB sketch each: the MV is
    orders of magnitude smaller than the fact it summarizes."""
    d = staged_day_sketches(spark, SF_SMOKE)
    mv = spark.read.parquet(d)
    n_cells = mv.count()
    n_types = load(spark, SF_SMOKE, "events").select(
        "event_type").distinct().count()
    assert n_cells <= n_types * 31  # one month of days per type
    total_bytes = sum(
        p.stat().st_size for p in Path(d).glob("part-*") if p.is_file())
    assert total_bytes < 512 * 1024, total_bytes


def test_two_level_union_estimates(spark):
    """Both grouping levels within the band; the ALL estimate at
    least as large as its largest input (a union can never shrink a
    distinct set); exact n_events ride through losslessly."""
    d = staged_day_sketches(spark, SF_SMOKE)
    rolled = {r["event_type"]: r
              for r in rollup_from_sketches(spark, d).collect()}
    ev = load(spark, SF_SMOKE, "events")
    exact_all = ev.select(F.countDistinct("user_id")).first()[0]
    n_all = ev.count()
    all_row = rolled["ALL"]
    assert 0.94 * exact_all <= all_row["est_users"] <= 1.06 * exact_all
    assert all_row["n_events"] == n_all
    per_type_max = max(
        r["est_users"] for k, r in rolled.items() if k != "ALL")
    assert all_row["est_users"] >= per_type_max
    assert sum(
        r["n_events"] for k, r in rolled.items() if k != "ALL") == n_all


def test_remerging_merged_sketches_is_sound(spark):
    """Two-level re-merge as separate jobs would run it: day sketches
    -> per-type month sketches -> union of THOSE into a total. The
    twice-merged estimate must still land in the band around the
    exact total -- the property that lets rollups of rollups (daily ->
    monthly -> yearly) reuse stored intermediates instead of facts."""
    d = staged_day_sketches(spark, SF_SMOKE)
    month = (
        spark.read.parquet(d)
        .groupBy("event_type")
        .agg(F.hll_union_agg("user_sketch").alias("msk"))
    )
    total = month.agg(
        F.hll_sketch_estimate(F.hll_union_agg("msk")).alias("est")
    ).first()["est"]
    exact_all = load(spark, SF_SMOKE, "events").select(
        F.countDistinct("user_id")).first()[0]
    assert 0.94 * exact_all <= total <= 1.06 * exact_all
