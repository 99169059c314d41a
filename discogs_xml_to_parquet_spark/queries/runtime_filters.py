"""Runtime filters: dynamic partition pruning + runtime bloom-filter
join (VERDICT r7 item 8 -- the one classic 100 TB join optimization
the inventory did not yet demonstrate as a driver row).

Both are OPTIMIZER-injected filters, not hand-built ones (the
hand-built broadcast bloom table already exists as
q_decontaminate_bloom): the query declares a plain join and Catalyst
inserts a filter on the fact side computed at runtime from the dim
side --

- DPP: when the fact is PARTITIONED on the join key, the dim side's
  filtered key set becomes a partition filter
  (`dynamicpruningexpression` in PartitionFilters), so whole fact
  partitions are never read. At 100 TB this is the difference between
  scanning 3 months and scanning 7 years.
- Runtime bloom filter: when the dim carries a selective predicate but
  is too big to broadcast (shuffle join), a `bloom_filter_agg` of the
  dim keys is computed first and `might_contain` is pushed into the
  fact scan, so fact rows that cannot match never reach the shuffle.

tests/test_plans.py gates that BOTH filters appear in the registered
query's executed plan (test_dpp_query_prunes_partitions,
test_bloom_query_injects_runtime_filter).
"""

from __future__ import annotations

import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark.functions.exact import dsum
from discogs_xml_to_parquet_spark.registry import query
from discogs_xml_to_parquet_spark.tables import load

# bump when the staged-fact construction changes
_FACT_VERSION = 1

_REV_SQL = ("CAST(SUM(CAST(floor((l_extendedprice * (1 - l_discount)) "
            "* 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000")


def _source_fingerprint(sf_dir: str) -> str:
    """Cheap content fingerprint of the source lineitem parquet
    (mtime_ns + size over its file(s)): a regenerated testdata file at
    the same path must produce a different staged-fact cache key
    (ADVICE r8 -- the slug-only key silently served stale data)."""
    import hashlib
    import os

    src = Path(sf_dir) / "lineitem.parquet"
    parts = []
    for p in sorted(src.rglob("*")) if src.is_dir() else [src]:
        st = p.stat()
        parts.append(f"{p.name}:{st.st_mtime_ns}:{st.st_size}")
    return hashlib.md5(";".join(parts).encode()).hexdigest()[:12]


def month_partitioned_lineitem(spark: SparkSession, sf_dir: str) -> str:
    """Stage lineitem partitioned by ship month (the layout a 100 TB
    fact would ship with -- date-keyed partitions) once per container
    per (sf_dir, source fingerprint); DPP needs a partitioned source to
    prune. repartition on the partition column first so each month
    lands in one task -> one file, not files x tasks.

    Concurrency/staleness (ADVICE r8): the cache key embeds the source
    file's mtime+size, and the build goes to a unique temp dir followed
    by an atomic rename -- a concurrent first build (pytest + driver)
    races to the rename and the loser discards its copy; a reader can
    never observe a half-written dest."""
    import os
    import shutil
    import uuid

    slug = sf_dir.strip("/").replace("/", "_")
    dest = Path(tempfile.gettempdir()) / (
        f"spark_graft_dpp_fact_v{_FACT_VERSION}_{slug}_"
        f"{_source_fingerprint(sf_dir)}"
    )
    if dest.exists():
        return str(dest)
    tmp = dest.with_name(dest.name + f".build-{uuid.uuid4().hex[:8]}")
    (
        load(spark, sf_dir, "lineitem")
        .withColumn("ship_month", F.date_format("l_shipdate", "yyyy-MM"))
        .repartition("ship_month")
        .write.mode("overwrite")
        .partitionBy("ship_month")
        .parquet(str(tmp))
    )
    try:
        os.rename(tmp, dest)
    except OSError:
        if not dest.exists():
            raise
        shutil.rmtree(tmp, ignore_errors=True)  # lost the race; theirs won
    return str(dest)


def dpp_lane(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-dim join against the partitioned fact: dim = the distinct
    order months of 1995-Q1 (derived from the orders table, so the key
    set is data, not a foldable literal -- the shape of a calendar dim
    filtered to a quarter). The broadcast hint keeps the dim side
    broadcast (DPP's default reuseBroadcastOnly=true reuses that exact
    exchange for the pruning subquery -- the filter is free)."""
    fact = spark.read.parquet(month_partitioned_lineitem(spark, sf_dir))
    dim = (
        load(spark, sf_dir, "orders")
        .select(
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
            F.year("o_orderdate").alias("yr"),
            F.quarter("o_orderdate").alias("qtr"),
        )
        .distinct()
        .filter((F.col("yr") == 1995) & (F.col("qtr") == 1))
    )
    return (
        fact.join(F.broadcast(dim), fact.ship_month == dim.month)
        .groupBy("month")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
        )
        .select(F.lit("dpp").alias("lane"), F.col("month").alias("key"),
                "n_rows", "revenue")
    )


def bloom_lane(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selectively-filtered orders joined to lineitem as a SHUFFLE
    join: the optimizer injects bloom_filter_agg(o_orderkey) /
    might_contain(l_orderkey) into the fact scan. The caller's session
    must have broadcast disabled (the 100 TB premise: the filtered dim
    is still too big to broadcast) and the bloom application threshold
    lowered to fire at test scale -- see q_join_bloom_dpp."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_totalprice") > 150000)
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
        )
        .select(F.lit("bloom").alias("lane"),
                F.col("o_orderpriority").alias("key"), "n_rows", "revenue")
    )


def scoped_session(spark: SparkSession) -> SparkSession:
    """A sibling SparkSession (same SparkContext, OWN runtime conf)
    with the runtime-filter knobs a 100 TB deployment would set:
    broadcast off (the premise that makes runtime filters matter) and
    the bloom application-side threshold at 0 so the injection fires
    at test scale (the default 10 GB gate exists precisely because
    blooms only pay off on big scans). Scoping via newSession keeps
    the knobs out of the shared session -- every other registered
    query keeps its measured plan."""
    s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s2.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold", "0")
    return s2


@query(
    "q_join_bloom_dpp",
    oracle="""
WITH dim AS (
  SELECT DISTINCT strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m') AS month
  FROM orders
  WHERE year(CAST(o_orderdate AS DATE)) = 1995
    AND quarter(CAST(o_orderdate AS DATE)) = 1
),
dpp AS (
  SELECT 'dpp' AS lane,
         strftime(CAST(l_shipdate AS TIMESTAMP), '%Y-%m') AS key,
         COUNT(*) AS n_rows,
         """ + _REV_SQL + """ AS revenue
  FROM lineitem
  JOIN dim ON strftime(CAST(l_shipdate AS TIMESTAMP), '%Y-%m') = dim.month
  GROUP BY 1, 2
),
bloom AS (
  SELECT 'bloom' AS lane, o_orderpriority AS key,
         COUNT(*) AS n_rows,
         """ + _REV_SQL + """ AS revenue
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 150000
  GROUP BY 1, 2
)
SELECT lane, key, n_rows, revenue FROM dpp
UNION ALL
SELECT lane, key, n_rows, revenue FROM bloom
ORDER BY lane, key
""",
)
def q_join_bloom_dpp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter showcase, two lanes UNIONed:

    - 'dpp' rows: 1995-Q1 revenue by ship month off the
      month-partitioned fact -- the executed plan reads 3 of ~84 fact
      partitions (PartitionFilters: dynamicpruningexpression);
    - 'bloom' row: urgent/high-value order revenue through a shuffle
      join -- the fact scan carries might_contain(l_orderkey) built
      from the filtered orders keys.

    Both lanes run on a scoped sibling session (broadcast disabled,
    bloom threshold 0 -- see scoped_session); the oracle is the plain
    relational spelling of both joins, so correctness pins that the
    injected filters are filters, not semantics."""
    s2 = scoped_session(spark)
    return (
        dpp_lane(s2, sf_dir)
        .unionAll(bloom_lane(s2, sf_dir))
        .orderBy("lane", "key")
    )
