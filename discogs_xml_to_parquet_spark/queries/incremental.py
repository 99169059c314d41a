"""Incremental view maintenance (IVM): refresh a stored rollup from a
delta scan + partial-aggregate merge instead of a full recompute.

The 100 TB pattern this demonstrates: a daily rollup over an append-only
event stream should never rescan history. Store the aggregate in a
MERGEABLE form -- count, exact scaled-integer sum (functions/exact.py's
decimal(38,0) accumulator: associative, order-independent, so a
two-level base+delta merge is bit-identical to a one-shot sum), min,
max -- then each refresh scans ONLY the new partition and merges:

    merged(k) = combine(base(k), delta(k))
    combine   = (n1+n2, s1+s2, min(m1,m2), max(M1,M2))

Non-mergeable forms (avg stored as a double, median, distinct counts as
exact values) force the full rescan; the fix is to store the mergeable
decomposition (sum+count here; HLL sketches for distinct -- see
queries/sketches.py) and derive the display value at read time.

The driver row splits events at a cutoff (max ts - 7 days, derived from
the data so the same query is meaningful at every SF; a production
refresh boundary is a literal checkpoint timestamp, which additionally
pushes down into the delta scan as a plain parquet filter), builds the
base rollup, localCheckpoints it (standing in for the stored MV -- the
refresh plan reads it as an RDD scan, not a second parquet scan), and
merges the delta. The cutoff falls mid-day, so the boundary day exists
in BOTH halves and the merge combines real partial aggregates, not
disjoint key sets. The oracle is the ONE-SHOT rollup over all events:
correctness pins merge(base, delta) == recompute(all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark.functions.exact import scaled, unscale
from discogs_xml_to_parquet_spark.registry import query
from discogs_xml_to_parquet_spark.tables import load

_SUM_SQL = ("CAST(SUM(CAST(floor((value) * 1000000 + 0.5) AS BIGINT)) "
            "AS DOUBLE) / 1000000")


def _rollup(df: DataFrame) -> DataFrame:
    """The mergeable per-(day, event_type) aggregate state."""
    return (
        df.groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias(
                "day"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(scaled("value").cast("decimal(38,0)")).alias("sum_scaled"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


def merge_rollups(base: DataFrame, delta: DataFrame) -> DataFrame:
    """Combine two mergeable rollup states; associativity of every
    accumulator (long +, decimal(38,0) +, double min/max) makes this
    exact under any grouping of increments."""
    return (
        base.unionByName(delta)
        .groupBy("day", "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_scaled").alias("sum_scaled"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )


@query(
    "q_incremental_rollup",
    oracle="""
SELECT strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS day,
       event_type,
       COUNT(*) AS n_events,
       """ + _SUM_SQL + """ AS sum_value,
       """ + _SUM_SQL + """ / COUNT(*) AS avg_value,
       MIN(value) AS min_value,
       MAX(value) AS max_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def q_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily per-event-type rollup maintained incrementally: base state
    over ts < cutoff (staged -- the stored materialized view), delta
    over the trailing 7 days, merged by partial-aggregate combination.
    The oracle recomputes from scratch, so a hash match proves the
    merge is exact -- including on the boundary day both halves touch.

    avg is DERIVED (sum/count) at read time, never stored: storing the
    quotient is the classic IVM bug (averages don't merge).

    Scale shape: refresh cost is O(delta) scan + a merge keyed on
    (day, event_type) whose left side is the compact MV (days x types
    rows), not the corpus; the full-history scan happens once at MV
    creation. The cutoff crossJoin is a 1-row broadcast (same pattern
    as Q22's threshold scalar)."""
    e = load(spark, sf_dir, "events")
    cut = F.broadcast(
        e.agg((F.max("ts") - F.expr("INTERVAL 7 DAYS")).alias("cut"))
    )
    tagged = e.crossJoin(cut)
    base = _rollup(
        tagged.filter(F.col("ts") < F.col("cut"))
    ).localCheckpoint()
    delta = _rollup(tagged.filter(F.col("ts") >= F.col("cut")))
    merged = merge_rollups(base, delta)
    return (
        merged.select(
            "day",
            "event_type",
            "n_events",
            unscale(F.col("sum_scaled")).alias("sum_value"),
            (unscale(F.col("sum_scaled")) / F.col("n_events")).alias(
                "avg_value"
            ),
            "min_value",
            "max_value",
        )
        .orderBy("day", "event_type")
    )
