"""Cohort retention over the event stream: group users by first-seen
day, then count how many of each cohort return N days later -- the
standard product-analytics rollup (and, for a training pipeline, the
shape of any first-touch attribution over interaction logs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark.registry import query
from discogs_xml_to_parquet_spark.tables import load


@query(
    "q_cohort_retention",
    oracle="""
WITH e AS (
  SELECT user_id,
         CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
         MIN(CAST(CAST(ts AS TIMESTAMP) AS DATE))
           OVER (PARTITION BY user_id) AS cohort_day
  FROM events
)
SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
       CAST(date_diff('day', cohort_day, day) AS INT) AS day_offset,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(*) AS n_events
FROM e
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each user's cohort day is a window-min over their own events --
    ONE shuffle keyed by user_id, no self-join back onto the event
    table (the join formulation shuffles the fact table twice). The
    retention matrix aggregate is then cohort x offset, a few hundred
    cells at any scale, reduced almost entirely map-side."""
    e = load(spark, sf_dir, "events")
    day = F.to_date("ts")
    w = Window.partitionBy("user_id")
    cohorted = e.select(
        "user_id",
        day.alias("day"),
        F.min(day).over(w).alias("cohort_day"),
    )
    return (
        cohorted.groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("day", "cohort_day").alias("day_offset"),
        )
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("cohort_day", "day_offset")
    )
