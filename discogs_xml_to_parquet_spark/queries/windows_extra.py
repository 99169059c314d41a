"""Distribution-family window functions: percent_rank, cume_dist,
nth_value, lag/lead with defaults -- the remaining standard window
surface beyond rank/topk/frames (queries/windows.py).

Cross-engine exactness: percent_rank and cume_dist are single IEEE
divisions of exact integer rank counters ((rank-1)/(n-1), n_le/n), so
with a total order (unique tie-break key) both engines produce
bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark.registry import query
from discogs_xml_to_parquet_spark.tables import load


@query(
    "q_window_distribution",
    oracle="""
SELECT s_nationkey, s_suppkey,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume,
       nth_value(s_suppkey, 2) OVER (PARTITION BY s_nationkey
                                     ORDER BY s_acctbal, s_suppkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND UNBOUNDED FOLLOWING) AS second_poorest,
       lag(s_acctbal, 1, 0.0) OVER w AS prev_bal,
       lead(s_acctbal, 1, -1.0) OVER w AS next_bal
FROM supplier
WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey)
ORDER BY s_nationkey, s_suppkey
""",
)
def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank/cume_dist/nth_value/lag/lead over per-nation
    supplier partitions. The order key ends in the unique s_suppkey, so
    every rank counter -- and therefore every derived double -- is
    deterministic. nth_value gets an explicit unbounded frame (the
    default frame stops at CURRENT ROW, where the standard leaves
    nulls before row 2); lag/lead carry explicit defaults instead of
    null so the boundary rows are value-compared too. Windows
    partition by nation: per-partition sorts parallelize across
    groups, nothing global."""
    s = load(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy("s_acctbal", "s_suppkey")
    w_full = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return s.select(
        "s_nationkey",
        "s_suppkey",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.nth_value("s_suppkey", 2).over(w_full).alias("second_poorest"),
        F.lag("s_acctbal", 1, 0.0).over(w).alias("prev_bal"),
        F.lead("s_acctbal", 1, -1.0).over(w).alias("next_bal"),
    ).orderBy("s_nationkey", "s_suppkey")
