"""As-of join: for each left row, the most recent right row at or
before its timestamp, per key.

Spark has no native ASOF JOIN (DuckDB/Pandas do); the scalable
composition is the union + last-value-over-window trick:

    union(left tagged side=1, right tagged side=0)
    -> window per key ordered by (ts, side)
    -> last(right_payload, ignoreNulls) over rows unbounded..current
    -> keep side=1 rows

One shuffle on the key + one per-partition sort -- exactly the cost of
a sort-merge join, with none of the range-explosion a theta-join
formulation (l.ts >= r.ts) would have. At equal timestamps the right
row sorts first (side 0 < 1), so 'at or before' includes ties,
matching ASOF semantics.

Skew note: the window partitions by key; a pathologically hot key
serializes in one task. For bounded lookback, pre-bucket by (key,
time_bucket) and run the window within buckets carrying forward the
bucket-boundary state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: list[str] | None = None,
) -> DataFrame:
    """Left as-of join; right must be unique per (key, ts) -- pre-
    aggregate if not, or the carried value is nondeterministic."""
    payload = right_payload or [
        c for c in right.columns if c not in (key, right_ts)
    ]
    l_tag = left.withColumn("_ts", F.col(left_ts)).withColumn("_side", F.lit(1))
    for c in payload:
        l_tag = l_tag.withColumn(f"_r_{c}", F.lit(None).cast(right.schema[c].dataType))
    r_tag = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in payload],
    )
    for c in l_tag.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None))
    u = l_tag.unionByName(r_tag.select(l_tag.columns))
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in payload
        ],
    )
    return carried.filter(F.col("_side") == 1).drop(
        "_ts", "_side", *[f"_r_{c}" for c in payload]
    )
