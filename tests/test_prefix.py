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


def test_bucket_assignment_is_pure(spark):
    """ADVICE r7 (medium): the bucketed frame feeds two plan branches
    (local window + bucket offsets); with the r7 repartitionByRange +
    spark_partition_id spelling each branch instantiated its own range
    exchange, whose boundary sampling depends on upstream row order --
    so on a cluster the branches could disagree on _pid and mis-add
    offsets. _pid is now a pure function of the leading order key
    (quantile-boundary counting), so re-evaluation is safe by
    construction: assert two independent evaluations over differently
    partitioned inputs agree row-for-row, and no rangepartitioning
    exchange exists in consumer plans."""
    df = _data(spark)
    order = [F.col("k").asc(), F.col("id").asc()]
    r = P._bucketed(df, order, 7)
    # one call = one boundary fetch, embedded as literals: every
    # consumer branch of r, however it reshuffles, sees the same _pid
    a = r.select("id", "_pid")
    b = r.repartition(13, "v").select("id", "_pid")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # and the boundaries are plan literals, not a sampling subquery
    assert "approx" not in a._jdf.queryExecution().executedPlan(
    ).toString().lower()

    got = P.running_sum(df, order, F.col("v"), "c", parts=7)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan.lower(), plan
    got2 = P.running_max_strict(df, order, F.col("v"), "m", parts=7)
    plan2 = got2._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan2.lower(), plan2


def test_bucket_monotone_and_ties_colocated(spark):
    """_pid must be monotone along the leading key and constant across
    equal keys (ties share a bucket), ascending and descending."""
    df = _data(spark)
    for order, sign in ([F.col("k").asc(), F.col("id").asc()], 1), (
            [F.col("k").desc(), F.col("id").asc()], -1):
        r = P._bucketed(df, order, 7).select("k", "_pid").collect()
        by_k = {}
        for row in r:
            by_k.setdefault(row.k, set()).add(row._pid)
        assert all(len(s) == 1 for s in by_k.values())  # ties co-located
        ks = sorted(by_k, key=lambda k: sign * k)
        pids = [next(iter(by_k[k])) for k in ks]
        assert pids == sorted(pids)  # monotone along the sort order


def test_running_sum_desc_leading_key(spark):
    """The q_budget_select shape: leading key DESCENDING (quality
    first), unique-key tie-break -- bucket direction must reverse."""
    df = _data(spark, seed=23)
    order = [F.col("v").desc(), F.col("id").asc()]
    got = P.running_sum(df, order, F.col("v"), "c", parts=5)
    w = Window.orderBy(F.col("v").desc(), F.col("id").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = df.withColumn("c", F.sum("v").over(w))
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_value_at_ranks_matches_window_spelling(spark):
    """Distributed selection: values at target ranks must equal the
    MIN(v) WHERE cum >= k definition computed by a per-group window --
    including ranks 1 and n_g, heavy ties, and multiple tags hitting
    the same bucket."""
    rng = random.Random(29)
    rows = [(i, rng.choice("AB"), rng.randrange(30), 1 + rng.randrange(4))
            for i in range(400)]
    df = spark.createDataFrame(rows, "id long, g string, v long, cnt long")
    counts = df.groupBy("g", "v").agg(F.sum("cnt").alias("cnt"))
    got = P.value_at_ranks(
        counts, "v", F.col("cnt"),
        {
            "first": F.lit(1),
            "med": F.floor((F.col("n_g") + 1) / 2),
            "last": F.col("n_g"),
        },
        group_cols=["g"], parts=5,
    )
    w = Window.partitionBy("g").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = counts.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n_g", F.sum("cnt").over(Window.partitionBy("g"))
    )
    def at(k_expr):
        return (cum.filter(F.col("cum") >= k_expr).groupBy("g")
                .agg(F.min("v")))
    want = {}
    for r in at(F.lit(1)).collect():
        want.setdefault(r[0], {})["first"] = r[1]
    for r in at(F.floor((F.col("n_g") + 1) / 2)).collect():
        want.setdefault(r[0], {})["med"] = r[1]
    for r in at(F.col("n_g")).collect():
        want.setdefault(r[0], {})["last"] = r[1]
    for row in got.collect():
        for tag in ("first", "med", "last"):
            assert row[tag] == want[row.g][tag], (row, want[row.g])


def test_column_repr_surface_is_pinned(spark):
    """_leading introspects str(Column) -- an undocumented PySpark
    surface (ADVICE r8). Pin the exact repr format for every case the
    parser distinguishes, so a PySpark upgrade that reshapes it fails
    HERE with a clear message instead of inside an operator."""
    assert str(F.col("v").asc()) == "Column<'v ASC NULLS FIRST'>"
    assert str(F.col("v").desc()) == "Column<'v DESC NULLS LAST'>"
    assert str(F.col("v").asc_nulls_last()) == "Column<'v ASC NULLS LAST'>"
    assert str(F.col("v").desc_nulls_first()) == (
        "Column<'v DESC NULLS FIRST'>")
    df = spark.range(3).withColumnRenamed("id", "v")
    assert P._leading(df, [F.col("v").asc()]) == ("v", False)
    assert P._leading(df, [F.col("v").desc()]) == ("v", True)


def test_leading_rejects_contract_violations(spark):
    """The narrowed leading-key contract (plain df column, default
    null placement) must fail fast on every misuse path."""
    import pytest

    df = spark.range(3).withColumnRenamed("id", "v")
    with pytest.raises(ValueError, match="null placement"):
        P._leading(df, [F.col("v").asc_nulls_last()])
    with pytest.raises(ValueError, match="plain column"):
        P._leading(df, [F.col("missing").asc()])
    with pytest.raises(ValueError, match="plain column"):
        P._leading(df, [(F.col("v") + 1).asc()])


def test_running_sum_null_semantics_match_window(spark):
    """Review r11: a row whose within-bucket inclusive frame holds
    only NULL values must still carry the prior buckets' total (the
    global Window sum skips NULLs; it is NULL only when NO non-null
    value precedes). Compared against the single-task Window spelling
    on a nullable measure."""
    from pyspark.sql import Window

    rows = [(i, None if i % 3 == 0 else i * 10) for i in range(1, 41)]
    rows[0] = (1, 7)  # a non-null before the first null
    df = spark.createDataFrame(rows, "k int, v int")
    got = {
        r["k"]: r["rs"]
        for r in P.running_sum(
            df, [F.col("k").asc()], F.col("v"), "rs", parts=4
        ).collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r["k"]: r["rs"]
        for r in df.withColumn("rs", F.sum("v").over(w)).collect()
    }
    assert got == want
    # and the all-null-prefix case really returns NULL in both
    df2 = spark.createDataFrame(
        [(1, None), (2, None), (3, 5)], "k int, v int")
    got2 = {r["k"]: r["rs"] for r in P.running_sum(
        df2, [F.col("k").asc()], F.col("v"), "rs", parts=2).collect()}
    assert got2 == {1: None, 2: None, 3: 5}


def test_value_at_ranks_keeps_group_on_out_of_range_rank(spark):
    """Review r11: a group whose every rank expression lands outside
    [1, n_g] must return its (n_g) row with NULL tag columns, not
    silently vanish from the output."""
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 3.0)], "g string, v double")
    out = {
        r["g"]: (r["n_g"], r["oor"])
        for r in P.value_at_ranks(
            df, "v", F.lit(1), {"oor": F.col("n_g") + 10},
            group_cols=["g"], parts=2,
        ).collect()
    }
    assert out == {"a": (2, None), "b": (1, None)}
