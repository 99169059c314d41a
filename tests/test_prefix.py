"""operators/prefix.py: the distributed prefix-scan primitives must be
value-identical to the single-task global-window spelling on any input
-- partition boundaries, ties co-located by range partitioning, and
null-for-first-row strictness are the edge cases."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark.operators import prefix as P


def _data(spark, n=500, seed=11):
    rng = random.Random(seed)
    # heavy ties: only 40 distinct keys over 500 rows, so several tie
    # groups are guaranteed to straddle would-be partition boundaries
    rows = [(i, rng.randrange(40), rng.randrange(100)) for i in range(n)]
    return spark.createDataFrame(rows, "id long, k long, v long")


def test_running_sum_matches_global_window(spark):
    df = _data(spark)
    order = [F.col("k").asc(), F.col("id").asc()]
    got = P.running_sum(df, order, F.col("v"), "c", parts=7)
    w = Window.orderBy("k", "id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = df.withColumn("c", F.sum("v").over(w))
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_running_max_strict_matches_global_window(spark):
    df = _data(spark, seed=13)
    order = [F.col("k").asc(), F.col("id").desc()]
    got = P.running_max_strict(df, order, F.col("v"), "m", parts=7)
    w = Window.orderBy(F.col("k").asc(), F.col("id").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    want = df.withColumn("m", F.max("v").over(w))
    g = sorted(map(tuple, got.collect()))
    e = sorted(map(tuple, want.collect()))
    assert g == e
    # the global first row has no strict predecessor
    assert sum(1 for r in g if r[3] is None) == 1


def test_running_sum_more_partitions_than_rows(spark):
    df = spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "id long, v long")
    got = P.running_sum(df, [F.col("id").asc()], F.col("v"), "c", parts=16)
    assert {(r.id, r.c) for r in got.collect()} == {
        (1, 10), (2, 30), (3, 60)}


def test_grouped_running_sum_matches_per_group_window(spark):
    """group_cols must restart the sum per group with the same values
    as Window.partitionBy(group) -- including groups that straddle
    range-partition boundaries (3 groups, 600 rows, 7 partitions)."""
    rng = random.Random(17)
    rows = [(i, rng.choice("ABC"), rng.randrange(50), rng.randrange(100))
            for i in range(600)]
    df = spark.createDataFrame(rows, "id long, g string, k long, v long")
    got = P.running_sum(
        df, [F.col("k").asc(), F.col("id").asc()], F.col("v"), "c",
        parts=7, group_cols=["g"],
    )
    w = Window.partitionBy("g").orderBy("k", "id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = df.withColumn("c", F.sum("v").over(w))
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
