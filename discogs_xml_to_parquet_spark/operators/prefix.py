"""Distributed prefix (running) aggregates over a global ordering.

Spark's `Window.orderBy(...)` WITHOUT a partitionBy collapses the whole
input into ONE task (`Exchange SinglePartition` + single sort) -- fine
for a 32-row day table, a scale-killer when the ordered domain is the
data itself (e.g. a running sum over 58M distinct prices at 100x). The
classic distributed spelling used here:

  1. `repartitionByRange` on the ordering -- every row in partition i
     orders before every row in partition i+1, equal keys co-located
     (RangePartitioner boundaries are keys; its sampling seed is
     derived from partition ids, so the layout is deterministic for a
     given input);
  2. a WITHIN-partition running aggregate (window partitioned by
     `spark_partition_id()` -- each range partition is one bounded
     task, so the longest task is domain/P rows, not the domain);
  3. per-partition totals (P rows) get a tiny prefix scan of their own
     (the only SinglePartition exchange left -- over P rows), and the
     resulting partition OFFSETS broadcast-join back.

Cost: two exchanges of the domain + one broadcast, no single-task
stage. Exactness: pure integer/ordered arithmetic, same cumulative
values as the single-task spelling -- oracles unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PARTS = 32  # range partitions; size to executor count at scale


def _ranged(df: DataFrame, order_cols: list[Column], parts: int) -> DataFrame:
    return df.repartitionByRange(parts, *order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )


def _offsets(ranged: DataFrame, per_part: Column, fold, out: str) -> DataFrame:
    """P-row frame: for each _pid, `fold` of all PRECEDING partitions'
    `per_part` aggregate (None for the first). The global window here
    is the point -- it runs over P rows, not the domain."""
    w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    return (
        ranged.groupBy("_pid")
        .agg(per_part.alias("_ptot"))
        .withColumn(out, fold(F.col("_ptot")).over(w))
        .select("_pid", out)
    )


def running_sum(
    df: DataFrame,
    order_cols: list[Column],
    value: Column,
    out: str,
    parts: int = _PARTS,
    group_cols: list[str] | tuple[str, ...] = (),
) -> DataFrame:
    """df + `out` = inclusive running sum of `value` over the total
    order `order_cols` (which must be total -- break ties with a unique
    key, the registry-wide determinism rule).

    `group_cols` restarts the sum per group WITHOUT one-task-per-group
    (the Window.partitionBy(g) trap when groups are few and huge --
    e.g. 3 return flags over a ~583k-value price domain): the range
    partitioning spans (groups, order), the within-partition window
    restarts per (group, _pid), and the offsets accumulate per group
    across its pids."""
    gcols = list(group_cols)
    r = _ranged(df, [F.col(g) for g in gcols] + list(order_cols), parts)
    w_in = Window.partitionBy(*gcols, "_pid").orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r = r.withColumn("_local", F.sum(value).over(w_in))
    w_off = Window.partitionBy(*gcols).orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = (
        r.groupBy(*gcols, "_pid")
        .agg(F.sum(value).alias("_ptot"))
        .withColumn("_off", F.sum("_ptot").over(w_off))
        .select(*gcols, "_pid", "_off")
    )
    return (
        r.join(F.broadcast(offs), gcols + ["_pid"])
        .withColumn(out, F.col("_local") + F.coalesce(F.col("_off"), F.lit(0)))
        .select(*df.columns, out)  # join reorders keys first; restore
    )


def running_max_strict(
    df: DataFrame,
    order_cols: list[Column],
    value: Column,
    out: str,
    parts: int = _PARTS,
) -> DataFrame:
    """df + `out` = max of `value` over rows STRICTLY preceding in the
    total order `order_cols` (null for the first row) -- the skyline /
    dominance scan primitive."""
    r = _ranged(df, order_cols, parts)
    w_in = Window.partitionBy("_pid").orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, -1
    )
    r = r.withColumn("_local", F.max(value).over(w_in))
    offs = _offsets(r, F.max(value), F.max, "_off")
    return (
        r.join(F.broadcast(offs), "_pid")
        .withColumn(out, F.greatest(F.col("_local"), F.col("_off")))
        .drop("_pid", "_local", "_off")
    )
