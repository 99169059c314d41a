"""Mergeable-sketch rollup: stored per-day HLL sketches answer
distinct-count queries over any time range without rescanning the
fact -- the approximate-distinct analog of q_incremental_rollup.

Exact COUNT(DISTINCT) is not mergeable: yesterday's count and
today's count cannot be combined into a two-day count, so every
range query rescans the range. A Datasketches HLL sketch IS
mergeable: compute one kilobyte-sized sketch per (event_type, day)
at ingest (O(day) scan, once), store them as a binary column, and
any rollup -- per-type month, all-types total, arbitrary date spans
-- is a union of stored sketches: `hll_union_agg` over
MV-sized input, never the fact. This lane materializes the day-level
sketch table (staged parquet, the binary column round-trips), then
rolls it up through TWO union levels (day -> type-month -> ALL) to
pin that re-merging merged sketches stays sound.

Measured: at the 10x corpus (1M events) the MV rollup answers in
0.39 s vs 0.94 s for the same rollup over the fact -- and the MV
side's input is ~1.5k kilobyte-rows regardless of how many events
the days hold, so the gap is the fact's size: at 100 TB the fact
rollup is a full scan, the MV rollup is unchanged. (At sf0.1 both
sides are scheduling-bound sub-second walls, per README's fixed-cost
note.)

The exact-distinct pass over the fact exists for the harness only
(it gives the driver real values and the error band its reference),
exactly like q_agg_approx_distinct; the sketch union alone is the
production plan, plan-gated in tests/test_sketch_rollup.py to read
ONLY the sketch table. Estimator error: lgConfigK=12 -> RSE ~0.8%;
the +-6% band is ~7 sigma, deterministic for a given corpus (fixed
Datasketches hash), verified at sf0.001/0.01/0.1 locally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark.registry import query
from discogs_xml_to_parquet_spark.staging import (
    source_fingerprint as _source_fingerprint,
    staged as _staged,
)
from discogs_xml_to_parquet_spark.tables import load

_VERSION = 1


def staged_day_sketches(spark: SparkSession, sf_dir: str) -> str:
    """The ingest-time sketch MV: one row per (event_type, day) with
    an HLL sketch of that cell's user_ids plus the exact row count.
    Built once per container per (sf_dir, fingerprint)."""
    slug = sf_dir.strip("/").replace("/", "_")
    fp = _source_fingerprint(sf_dir, "events.parquet")
    return _staged(
        f"spark_graft_hllday_v{_VERSION}_{slug}_{fp}",
        lambda tmp: (
            load(spark, sf_dir, "events")
            .groupBy("event_type", F.to_date("ts").alias("day"))
            .agg(
                F.hll_sketch_agg("user_id").alias("user_sketch"),
                F.count(F.lit(1)).alias("n_events"),
            )
            .write.mode("overwrite")
            .parquet(tmp)
        ),
    )


def rollup_from_sketches(spark: SparkSession, sketch_dir: str) -> DataFrame:
    """The production rollup: per-type distinct estimates (every
    stored day of that type merged) AND the all-types total in ONE
    aggregation over the stored day sketches -- `rollup(event_type)`
    expands each MV row into both grouping levels (a 2x Expand of
    kilobyte rows, nothing), so the plan is one sketch-table scan, one
    shuffle, zero fact scans. The grand-total row is identified by
    grouping(), not by a NULL sentinel. Re-merging already-merged
    sketches (day -> type -> total as separate jobs would do it) is
    pinned equivalent in tests/test_sketch_rollup.py."""
    days = spark.read.parquet(sketch_dir)
    return (
        days.rollup("event_type")
        .agg(
            F.hll_union_agg("user_sketch").alias("merged_sketch"),
            F.sum("n_events").alias("n_events"),
            F.count(F.lit(1)).alias("n_cells_merged"),
            F.grouping("event_type").alias("_is_total"),
        )
        .select(
            F.when(F.col("_is_total") == 1, F.lit("ALL"))
            .otherwise(F.col("event_type")).alias("event_type"),
            F.hll_sketch_estimate("merged_sketch").alias("est_users"),
            "n_events",
            "n_cells_merged",
        )
    )


@query(
    "q_hll_union_rollup",
    oracle="""
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users_exact,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       TRUE AS union_in_band
FROM events
GROUP BY event_type
UNION ALL
SELECT 'ALL', COUNT(DISTINCT user_id), CAST(COUNT(*) AS BIGINT), TRUE
FROM events
ORDER BY event_type
""",
)
def q_hll_union_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type and overall, answered from the
    stored day-sketch table through two union levels, with the
    estimate checked in-band against the exact reference -- plus the
    exact per-cell row counts riding through the sketch MV, so a day
    cell dropped or double-merged in the rollup breaks the hash (the
    counts are exact; only the distinct is approximate)."""
    sketch_dir = staged_day_sketches(spark, sf_dir)
    rolled = rollup_from_sketches(spark, sketch_dir)
    # the exact reference (harness-only) uses the same one-scan
    # rollup+grouping trick as the MV side: both levels from ONE pass
    # over the fact, instead of a per-type groupBy plus a second
    # whole-fact aggregate
    ref = (
        load(spark, sf_dir, "events")
        .rollup("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users_exact"),
            F.grouping("event_type").alias("_is_total"),
        )
        .select(
            F.when(F.col("_is_total") == 1, F.lit("ALL"))
            .otherwise(F.col("event_type")).alias("event_type"),
            "n_users_exact",
        )
    )
    return (
        rolled.join(F.broadcast(ref), "event_type")
        .select(
            "event_type",
            "n_users_exact",
            "n_events",
            F.col("est_users")
            .between(
                F.col("n_users_exact") * 0.94,
                F.col("n_users_exact") * 1.06,
            )
            .alias("union_in_band"),
        )
        .orderBy("event_type")
    )
