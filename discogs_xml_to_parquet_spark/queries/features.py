"""Feature-engineering statistics: exact per-group median absolute
deviation (the robust spread estimator) and per-row z-score
normalization from exact fixed-point moments.

Exactness: both queries follow the house discipline -- order
statistics are computed over the DISTINCT-value domain with integer
cumulative counts (no float accumulation at all), and the z-score's
mean/stddev come from exact 100-scaled integer sums with the final
double expression shared VERBATIM between selectExpr and the oracle,
so every IEEE op runs in the same order in both engines.

Scale shapes: MAD never sorts the data -- it aggregates to (group,
value, count), runs a per-group window over that domain table, and
broadcasts the 3-row median table back; normalization is one two-phase
aggregate plus a broadcast join, i.e. two scans' worth of work
regardless of group count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark.registry import query
from discogs_xml_to_parquet_spark.tables import load

# shared final-expression text (Spark selectExpr == DuckDB outer
# SELECT) for the z-score: inputs are exact integers (p100 per-row
# 100-scaled value, sp/spp group sums, n group count), every op is
# correctly-rounded IEEE double math in identical order.
_ZSCORE = (
    "(CAST(p100 AS DOUBLE) - CAST(sp AS DOUBLE) / CAST(n_rows AS DOUBLE)) / "
    "sqrt(CAST(n_rows AS DOUBLE)*CAST(spp AS DOUBLE)"
    " - CAST(sp AS DOUBLE)*CAST(sp AS DOUBLE)) * CAST(n_rows AS DOUBLE)"
)
# z = (x - mean) / pop-stddev; in p100 units the 1/100 scales cancel,
# so no descale term. pop-stddev = sqrt(n*spp - sp^2)/n, arranged
# divide-then-multiply so both engines associate identically.


def _median_of(counts: DataFrame, group: str, value: str) -> DataFrame:
    """Lower median per group from a (group, value, cnt) table:
    value at rank ceil(n/2) in value order. Returns (group, med).
    Integer ranks over the distinct-value domain -- no data sort."""
    w = (
        Window.partitionBy(group)
        .orderBy(value)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = counts.withColumn("cum", F.sum("cnt").over(w))
    tot = counts.groupBy(group).agg(F.sum("cnt").alias("n_g"))
    return (
        cum.join(F.broadcast(tot), group)
        .filter(F.col("cum") >= F.floor((F.col("n_g") + 1) / 2))
        .groupBy(group)
        .agg(F.min(value).alias("med"))
    )


@query(
    "q_stats_mad",
    oracle="""
WITH vc AS (
  SELECT l_returnflag AS g, l_extendedprice AS v, COUNT(*) AS cnt
  FROM lineitem GROUP BY 1, 2
), med1 AS (
  SELECT g, MIN(v) AS med FROM (
    SELECT g, v,
           SUM(cnt) OVER (PARTITION BY g ORDER BY v
                          ROWS UNBOUNDED PRECEDING) AS cum,
           SUM(cnt) OVER (PARTITION BY g) AS n_g
    FROM vc
  ) WHERE cum >= (n_g + 1) // 2 GROUP BY g
), dev AS (
  SELECT vc.g, abs(vc.v - m.med) AS v, SUM(cnt) AS cnt
  FROM vc JOIN med1 m ON vc.g = m.g
  GROUP BY vc.g, abs(vc.v - m.med)
), med2 AS (
  SELECT g, MIN(v) AS mad FROM (
    SELECT g, v,
           SUM(cnt) OVER (PARTITION BY g ORDER BY v
                          ROWS UNBOUNDED PRECEDING) AS cum,
           SUM(cnt) OVER (PARTITION BY g) AS n_g
    FROM dev
  ) WHERE cum >= (n_g + 1) // 2 GROUP BY g
)
SELECT med1.g AS l_returnflag, med1.med AS median_price, med2.mad AS mad_price
FROM med1 JOIN med2 ON med1.g = med2.g
ORDER BY l_returnflag
""",
)
def q_stats_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group median absolute deviation: lower median (value
    at rank ceil(n/2)) of the price, then lower median of |price -
    median|. Neither pass sorts the data: each aggregates to the
    (group, distinct value, count) domain table (map-side combining),
    runs an integer cumulative window over that domain, and the 3-row
    median table broadcasts back. |x - med| is one IEEE subtraction --
    exact and engine-identical -- and everything else is integer
    comparison, so the result hashes exactly."""
    li = load(spark, sf_dir, "lineitem")
    vc = li.groupBy(
        F.col("l_returnflag").alias("g"), F.col("l_extendedprice").alias("v")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    med1 = _median_of(vc, "g", "v")
    dev = (
        vc.join(F.broadcast(med1), "g")
        .select("g", F.abs(F.col("v") - F.col("med")).alias("v"), "cnt")
        .groupBy("g", "v")
        .agg(F.sum("cnt").alias("cnt"))
    )
    med2 = _median_of(dev, "g", "v").withColumnRenamed("med", "mad")
    return (
        med1.join(med2, "g")
        .select(
            F.col("g").alias("l_returnflag"),
            F.col("med").alias("median_price"),
            F.col("mad").alias("mad_price"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q_feature_normalize",
    oracle=f"""
WITH scaled AS (
  SELECT l_orderkey, l_linenumber, l_returnflag,
         CAST(floor(l_extendedprice * 100.0 + 0.5) AS HUGEINT) AS p100
  FROM lineitem
), sums AS (
  SELECT l_returnflag, COUNT(*) AS n_rows,
         SUM(p100) AS sp, SUM(p100 * p100) AS spp
  FROM scaled GROUP BY l_returnflag
)
SELECT s.l_orderkey, s.l_linenumber, s.l_returnflag,
       {_ZSCORE} AS z_price
FROM scaled s JOIN sums USING (l_returnflag)
ORDER BY l_orderkey, l_linenumber
""",
)
def q_feature_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row z-score normalization against per-group exact moments
    (the feature-standardization step of any ML data pipeline). One
    two-phase aggregate produces (n, sum, sum-of-squares) per group in
    exact 100-scaled integers; the K-row moment table broadcasts back
    onto the stream (map-only second pass -- the corpus shuffles
    zero times); the z expression is one shared double text, so both
    engines run the identical IEEE tree on identical integers."""
    li = load(spark, sf_dir, "lineitem")
    scaled = li.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.floor(F.col("l_extendedprice") * 100.0 + F.lit(0.5))
        .cast("decimal(38,0)")
        .alias("p100"),
    )
    sums = scaled.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("p100").alias("sp"),
        F.sum(F.col("p100") * F.col("p100")).alias("spp"),
    )
    return (
        scaled.join(F.broadcast(sums), "l_returnflag")
        .selectExpr(
            "l_orderkey",
            "l_linenumber",
            "l_returnflag",
            f"{_ZSCORE} AS z_price",
        )
        .orderBy("l_orderkey", "l_linenumber")
    )
