"""Mergeable-histogram rollup: stored per-day fixed-bin histograms
answer quantile queries over ANY date range without rescanning the
fact -- the quantile analog of q_hll_union_rollup.

An exact percentile is not mergeable: yesterday's p50 and today's p50
cannot be combined into a two-day p50, so every range query rescans
the range. A fixed-bin HISTOGRAM is mergeable by vector addition:
compute one 64-long count vector per (event_type, day) at ingest
(O(day) scan, once), store it as an array column, and any range
quantile -- per-type week, all-types month, arbitrary spans -- is a
sum of stored vectors followed by a cumulative walk over 64 cells.
This is the production monitoring shape at 100 TB: the fact is
scanned once per day ever; every dashboard percentile after that
reads kilobyte rows.

Binning is EXACT across engines by construction: bounds [0, 1024)
with width 16.0 are binary-exact doubles, so `floor(value / 16.0)`
rounds identically in Spark and DuckDB (one IEEE division + floor;
both sides clamp into [0, 63] BEFORE the int cast, so a wild
out-of-range value saturates instead of overflowing DuckDB's INT32),
and the emitted quantile BINS are integers -- no float tolerance, no
band; the oracle replays the same binning against the raw fact and
the driver hash pins equality. The bin->value mapping (bin b covers
[16b, 16b+16)) bounds the quantile estimate's error by one bin width,
the standard histogram-quantile contract (same trade as the t-digest
/ KLL sketches this models, with a fixed instead of adaptive grid).

Quantile definition shared by both sides: the p-quantile bin is the
smallest bin whose cumulative count reaches ceil(p * n) -- the
discrete "at least a p fraction at or below" rank.

Scale shape: the MV build is one fact scan + a (type, day)-keyed
aggregation; the range rollup reads ONLY the histogram table
(plan-gated zero fact scans in tests/test_quantile_rollup.py),
explodes K*days kilobyte rows to (type, bin) cells, and the
cumulative window runs over at most 64 rows per type -- bounded by
the grid, not the data, at any corpus size. Re-merging merged
histograms (day -> week -> total) is pinned sound in the same test
file, the property that lets rollups of rollups reuse stored
intermediates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark.registry import query
from discogs_xml_to_parquet_spark.staging import (
    source_fingerprint as _source_fingerprint,
    staged as _staged,
)
from discogs_xml_to_parquet_spark.tables import load

_VERSION = 1
_BINS = 64
_WIDTH = 16.0                       # [0, 1024) -- binary-exact width
_RANGE_LO, _RANGE_HI = "2024-01-08", "2024-01-21"   # the queried span
_QS = (("p50_bin", 0.50), ("p90_bin", 0.90), ("p99_bin", 0.99))


def _bin_col(value):
    """LEAST(63, GREATEST(0, FLOOR(value / 16.0))) -- one IEEE
    division + floor, bit-identical across engines."""
    return F.least(
        F.lit(_BINS - 1),
        F.greatest(F.lit(0), F.floor(value / F.lit(_WIDTH))),
    ).cast("int")


def staged_day_histograms(spark: SparkSession, sf_dir: str) -> str:
    """The ingest-time histogram MV: one row per (event_type, day)
    with a dense 64-long count vector of that cell's `value`s plus the
    exact row count. Built once per container per (sf_dir,
    fingerprint)."""
    slug = sf_dir.strip("/").replace("/", "_")
    fp = _source_fingerprint(sf_dir, "events.parquet")

    def build(tmp: str) -> None:
        cells = (
            load(spark, sf_dir, "events")
            .filter(F.col("value").isNotNull())
            .select(
                "event_type",
                F.to_date("ts").alias("day"),
                _bin_col(F.col("value")).alias("pos"),
            )
            .groupBy("event_type", "day", "pos")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        (
            cells.groupBy("event_type", "day")
            .agg(
                F.map_from_entries(
                    F.collect_list(F.struct("pos", "cnt"))).alias("m"),
                F.sum("cnt").alias("n_events"),
            )
            .select(
                "event_type",
                "day",
                F.transform(
                    F.sequence(F.lit(0), F.lit(_BINS - 1)),
                    lambda j: F.coalesce(
                        F.element_at("m", j), F.lit(0).cast("bigint")
                    ),
                ).alias("hist"),
                "n_events",
            )
            .write.mode("overwrite")
            .parquet(tmp)
        )

    return _staged(
        f"spark_graft_histday_v{_VERSION}_{slug}_{fp}", build
    )


def rollup_from_histograms(spark: SparkSession, hist_dir: str) -> DataFrame:
    """The production rollup: per-type AND all-types quantile bins for
    the queried date range, from the stored day histograms only. The
    merge is vector addition spelled as posexplode + sum (K*days
    kilobyte rows -- nothing); the quantile walk is a cumulative
    window over at most 64 rows per type, bounded by the grid at any
    corpus size. Zero fact scans, plan-gated."""
    days = (
        spark.read.parquet(hist_dir)
        .filter(F.col("day").between(_RANGE_LO, _RANGE_HI))
        .select("event_type", F.posexplode("hist").alias("pos", "cnt"))
    )
    per_type = days.groupBy("event_type", "pos").agg(
        F.sum("cnt").alias("cnt"))
    merged = per_type.unionByName(
        per_type.groupBy("pos").agg(F.sum("cnt").alias("cnt"))
        .withColumn("event_type", F.lit("ALL"))
    )
    w = Window.partitionBy("event_type")
    cum = merged.select(
        "event_type",
        "pos",
        F.sum("cnt").over(w.orderBy("pos")).alias("cum"),
        F.sum("cnt").over(w).alias("n"),
    )
    return (
        cum.groupBy("event_type")
        .agg(
            F.max("n").alias("n_events"),
            *[
                F.min(
                    F.when(
                        F.col("cum") >= F.ceil(F.lit(p) * F.col("n")),
                        F.col("pos"),
                    )
                ).cast("int").alias(name)
                for name, p in _QS
            ],
        )
        .orderBy("event_type")
    )


@query(
    "q_quantile_histogram_rollup",
    oracle="""
WITH f AS (
  SELECT event_type,
         CAST(LEAST(63, GREATEST(0, FLOOR(value / 16.0))) AS INT) AS pos
  FROM events
  WHERE value IS NOT NULL
    AND CAST(ts AS DATE) BETWEEN DATE '2024-01-08' AND DATE '2024-01-21'
),
g AS (
  SELECT event_type, pos, COUNT(*) AS cnt FROM f GROUP BY 1, 2
  UNION ALL
  SELECT 'ALL', pos, COUNT(*) FROM f GROUP BY 2
),
c AS (
  SELECT event_type, pos,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY pos) AS cum,
         SUM(cnt) OVER (PARTITION BY event_type) AS n
  FROM g
)
SELECT event_type,
       CAST(MAX(n) AS BIGINT) AS n_events,
       CAST(MIN(CASE WHEN cum >= CEIL(0.50 * n) THEN pos END) AS INT)
         AS p50_bin,
       CAST(MIN(CASE WHEN cum >= CEIL(0.90 * n) THEN pos END) AS INT)
         AS p90_bin,
       CAST(MIN(CASE WHEN cum >= CEIL(0.99 * n) THEN pos END) AS INT)
         AS p99_bin
FROM c
GROUP BY 1
ORDER BY 1
""",
)
def q_quantile_histogram_rollup(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """p50/p90/p99 bins of event `value` per type and overall for a
    two-week span, answered from the stored day-histogram table -- the
    oracle replays the identical binning against the raw fact, so a
    day cell dropped, a vector misaligned, or a cumulative walk off by
    one breaks the hash (bins are integers; the match is exact, not
    banded). The exact range row counts ride through the MV too."""
    return rollup_from_histograms(
        spark, staged_day_histograms(spark, sf_dir))
