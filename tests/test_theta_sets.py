"""Theta set-algebra invariants (queries/theta_sets.py): the
production retention algebra never touches the fact, estimates are
EXACT below the sketch's nominal capacity, and re-merging merged
sketches is sound."""

from __future__ import annotations

from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark.queries.theta_sets import (
    _LGK,
    _W1_HI,
    _W1_LO,
    _W3_HI,
    _W3_LO,
    retention_from_sketches,
    staged_day_theta,
)
from discogs_xml_to_parquet_spark.tables import load
from tests.conftest import SF_SMOKE


def test_retention_reads_only_sketch_table(spark):
    """The point of storing sketches: the cohort algebra's plan reads
    the sketch parquet (two window branches, both MV-sized) and the
    events fact ZERO times."""
    from tests.test_plans import plan_of

    d = staged_day_theta(spark, SF_SMOKE)
    plan = plan_of(retention_from_sketches(spark, d))
    assert "events.parquet" not in plan, plan


def test_estimates_exact_below_nominal_capacity(spark):
    """At lgK=12 a theta sketch holds up to ~4k hashes before
    sampling; these cohorts are far smaller, so every estimate --
    including the intersected and differenced sketches -- must equal
    the exact count, not just band-match. This pins the algebra's
    correctness independent of the band's slack."""
    d = staged_day_theta(spark, SF_SMOKE)
    est = {r["event_type"]: r
           for r in retention_from_sketches(
               spark, d, with_window_estimates=True).collect()}
    ev = load(spark, SF_SMOKE, "events")

    def cohort(lo, hi):
        return (
            ev.filter(F.to_date("ts").between(lo, hi))
            .select("event_type", "user_id").distinct()
        )

    w1 = {(r["event_type"], r["user_id"])
          for r in cohort(_W1_LO, _W1_HI).collect()}
    w3 = {(r["event_type"], r["user_id"])
          for r in cohort(_W3_LO, _W3_HI).collect()}
    # the lane reports one row per WEEK-1 cohort (w1 LEFT JOIN w3 on
    # both sides); a w3-only type has no week-1 cohort to retain from
    types = {t for t, _ in w1}
    assert set(est) == types
    for t in types:
        a = {u for tt, u in w1 if tt == t}
        b = {u for tt, u in w3 if tt == t}
        r = est[t]
        assert round(r["est_w1"]) == len(a), t
        assert round(r["est_w3"]) == len(b), t
        assert round(r["est_retained"]) == len(a & b), t
        assert round(r["est_churned"]) == len(a - b), t


def test_dormant_type_reports_fully_churned(spark, tmp_path):
    """A type with week-1 users but NO week-3 activity must appear as
    a fully-churned cohort (retained 0, churned |w1|) -- the case the
    oracle's LEFT JOIN keeps and an inner sketch join would silently
    drop. Built from a synthetic day-sketch MV so the case exists
    regardless of the corpus."""
    from pyspark.sql import functions as F2

    days = spark.createDataFrame(
        [("dormant", "2024-01-02", 101), ("dormant", "2024-01-02", 102),
         ("alive", "2024-01-03", 201), ("alive", "2024-01-16", 201)],
        "event_type string, day string, user_id long",
    ).groupBy("event_type", F2.to_date("day").alias("day")).agg(
        F2.theta_sketch_agg("user_id", _LGK).alias("user_sketch"),
        F2.count(F2.lit(1)).alias("n_events"),
    )
    mv = str(tmp_path / "mv")
    days.write.parquet(mv)
    rows = {r["event_type"]: r
            for r in retention_from_sketches(
                spark, mv, with_window_estimates=True).collect()}
    assert round(rows["dormant"]["est_w1"]) == 2
    assert rows["dormant"]["est_w3"] == 0.0
    assert rows["dormant"]["est_retained"] == 0.0
    assert round(rows["dormant"]["est_churned"]) == 2
    assert round(rows["alive"]["est_retained"]) == 1


def test_remerging_merged_sketches_is_sound(spark):
    """Union of the two window-union sketches == one union over all
    the member days directly: merges of merges lose nothing (the
    property that lets stored weekly rollups serve monthly queries
    without re-reading days)."""
    d = staged_day_theta(spark, SF_SMOKE)
    days = spark.read.parquet(d)
    in_windows = days.filter(
        F.col("day").between(_W1_LO, _W1_HI)
        | F.col("day").between(_W3_LO, _W3_HI))
    direct = (
        in_windows.groupBy("event_type")
        .agg(F.theta_sketch_estimate(
            F.theta_union_agg("user_sketch", _LGK)).alias("est"))
    )
    staged2 = (
        in_windows.withColumn(
            "w", F.when(F.col("day") <= _W1_HI, 1).otherwise(3))
        .groupBy("event_type", "w")
        .agg(F.theta_union_agg("user_sketch", _LGK).alias("wsk"))
        .groupBy("event_type")
        .agg(F.theta_sketch_estimate(
            F.theta_union_agg("wsk", _LGK)).alias("est"))
    )
    a = {r["event_type"]: r["est"] for r in direct.collect()}
    b = {r["event_type"]: r["est"] for r in staged2.collect()}
    assert a == b
