"""Incremental rollup: the merge must equal the one-shot recompute for
ANY refresh boundary, not just the registered query's 7-day cutoff —
the property that makes an IVM pipeline restartable at arbitrary
checkpoints. Also pins three-way merge associativity (base + two
deltas), the shape of two consecutive refreshes."""

from __future__ import annotations

from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark.queries.incremental import (
    _rollup,
    merge_rollups,
)
from discogs_xml_to_parquet_spark.tables import load
from tests.conftest import SF_SMOKE


def _final(df):
    return (
        df.select(
            "day", "event_type", "n_events",
            F.col("sum_scaled").cast("string").alias("sum_s"),
            "min_value", "max_value",
        )
        .orderBy("day", "event_type")
        .collect()
    )


def test_merge_equals_recompute_at_any_boundary(spark):
    e = load(spark, SF_SMOKE, "events")
    want = _final(_rollup(e))
    # three boundaries: near the start, mid-corpus, near the end --
    # each splits at least one day across base/delta
    for frac_days in (2, 15, 27):
        cut = e.agg(
            (F.min("ts") + F.expr(f"INTERVAL {frac_days} DAYS")
             + F.expr("INTERVAL 7 HOURS")).alias("cut")
        )
        tagged = e.crossJoin(F.broadcast(cut))
        base = _rollup(tagged.filter(F.col("ts") < F.col("cut")))
        delta = _rollup(tagged.filter(F.col("ts") >= F.col("cut")))
        got = _final(merge_rollups(base, delta))
        assert got == want, f"merge != recompute at day {frac_days}"


def test_three_way_merge_is_associative(spark):
    """Two consecutive refreshes: ((base ⊕ delta1) ⊕ delta2) must equal
    the one-shot rollup — the accumulators (long +, decimal(38,0) +,
    double min/max) are associative, so any refresh cadence lands on
    the same state."""
    e = load(spark, SF_SMOKE, "events")
    want = _final(_rollup(e))
    cuts = e.agg(
        (F.min("ts") + F.expr("INTERVAL 10 DAYS")).alias("c1"),
        (F.min("ts") + F.expr("INTERVAL 20 DAYS")
         + F.expr("INTERVAL 3 HOURS")).alias("c2"),
    )
    tagged = e.crossJoin(F.broadcast(cuts))
    base = _rollup(tagged.filter(F.col("ts") < F.col("c1")))
    d1 = _rollup(tagged.filter(
        (F.col("ts") >= F.col("c1")) & (F.col("ts") < F.col("c2"))))
    d2 = _rollup(tagged.filter(F.col("ts") >= F.col("c2")))
    got = _final(merge_rollups(merge_rollups(base, d1), d2))
    assert got == want


def test_merge_with_empty_delta_is_identity(spark):
    """A refresh that finds no new rows must leave the stored state
    bit-identical -- the no-op refresh a scheduled IVM job hits most
    of the time."""
    e = load(spark, SF_SMOKE, "events")
    base = _rollup(e)
    empty = _rollup(e.filter(F.lit(False)))
    assert _final(merge_rollups(base, empty)) == _final(base)
