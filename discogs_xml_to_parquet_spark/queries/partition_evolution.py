"""Partition-spec evolution: a table whose OLD slices are partitioned
by month and whose NEW slices are partitioned by (month, priority) --
read through both specs with per-spec pruning, NO historical rewrite.

The Iceberg capability the other evolution lanes (schema_evolution.py:
columns, types, names) don't cover: partition layout is a physical
choice that outgrows itself -- a table laid out by month alone
becomes unprunable for the priority-filtered queries that dominate
later -- and repartitioning 100 TB of history to fix it is exactly
the petabyte rewrite a table format exists to avoid. Iceberg's answer
(spec evolution) keeps BOTH layouts: old files stay under the old
spec, new files land under the new one, and the planner prunes each
file group by ITS OWN spec. This lane spells that mechanism in Spark
terms: one root per spec generation, a per-spec pruned scan, and a
union by name -- the manifest-level split a format would do from
metadata.

The contract rides in the driver row both ways: the relational oracle
reconstructs the filtered aggregate from the live table (a row lost
at either spec's scan breaks the hash), and the layout booleans carry
the pruning proof computed from the scans' actual file sets --
`old_spec_pruned` (the old generation read only the predicate's month
dirs -- priority still filters in-scan there, the cost of the old
layout), `new_spec_pruned` (the new generation read ONLY the
predicate's priority subdirs within its months -- the 5x file-skip
the new spec exists for). PartitionFilters on both scans are
plan-gated in tests/test_partition_evolution.py.

Scale shape: spec resolution is metadata-only (two listings); each
generation pays one partition-pruned scan + the shared K-group
aggregate. At 100 TB the new spec's priority pruning is a 5x scan
reduction on the new history while the old history stays exactly as
prunable as it ever was -- no rewrite, no downtime, the Iceberg
trade."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark.functions.exact import dsum, rev_sql
from discogs_xml_to_parquet_spark.registry import query
from discogs_xml_to_parquet_spark.staging import (
    source_fingerprint as _source_fingerprint,
    staged as _staged,
)
from discogs_xml_to_parquet_spark.tables import load

_VERSION = 1
_EVOLVED_AT = "1997-01-01"        # spec flip date (writer-side)
# the query predicate: a month span straddling the spec boundary plus
# a priority filter only the NEW spec can prune on
_Q_MONTH_LO, _Q_MONTH_HI = "1996-09", "1997-04"
_Q_PRIORITY = "1-URGENT"


def staged_evolved_partitions(spark: SparkSession, sf_dir: str) -> str:
    """Two spec generations of the orders table: spec=0 (orders before
    the flip) partitioned by o_month only; spec=1 (the rest)
    partitioned by (o_month, o_orderpriority). Fingerprinted
    build-once staging, same contract as the schema-evolution dirs."""
    slug = sf_dir.strip("/").replace("/", "_")
    fp = _source_fingerprint(sf_dir, "orders.parquet")

    def build(tmp: str) -> None:
        o = load(spark, sf_dir, "orders").withColumn(
            "o_month", F.date_format("o_orderdate", "yyyy-MM"))
        old = o.filter(F.col("o_orderdate") < _EVOLVED_AT)
        new = o.filter(F.col("o_orderdate") >= _EVOLVED_AT)
        old.write.mode("overwrite").partitionBy("o_month").parquet(
            f"{tmp}/spec=0")
        new.write.mode("overwrite").partitionBy(
            "o_month", "o_orderpriority").parquet(f"{tmp}/spec=1")

    return _staged(
        f"spark_graft_specevo_v{_VERSION}_{slug}_{fp}", build
    )


def _spec_reads(spark: SparkSession,
                root: str) -> tuple[DataFrame, DataFrame]:
    """The ONE definition of each generation's filtered read -- both
    the aggregated scan and the pruning proof derive from these exact
    frames, so the gate cannot drift from the plan that produces the
    row (the shingle-stage lesson from e3725d4; bucket_pruning.py
    applies the same rule by parsing the very frame it aggregates)."""
    month_pred = F.col("o_month").between(_Q_MONTH_LO, _Q_MONTH_HI)
    pri = F.col("o_orderpriority") == _Q_PRIORITY
    old = spark.read.parquet(f"{root}/spec=0").filter(month_pred & pri)
    new = spark.read.parquet(f"{root}/spec=1").filter(month_pred & pri)
    return old, new


def evolved_scan(spark: SparkSession, root: str) -> DataFrame:
    """The spec-aware read for the lane's predicate: each generation
    scanned under ITS OWN spec with the predicate pushed to that
    spec's partition columns -- month-only pruning on spec 0 (priority
    filters in-scan there), month+priority pruning on spec 1 -- then
    unioned by name. This is what a format's planner derives from
    manifests; spelled explicitly so both PartitionFilters are
    visible and gateable."""
    old, new = _spec_reads(spark, root)
    cols = ["o_month", "o_orderpriority", "o_orderkey", "o_totalprice"]
    return old.select(*cols).unionByName(new.select(*cols))


def _pruning_facts(spark: SparkSession, root: str) -> dict:
    """The layout half of the contract, from each generation's
    OPTIMIZED PLAN (the merge.py discipline -- PartitionFilters on the
    scan node are the planner's binding commitment about which dirs it
    will list): the old spec's scan must carry the month bounds as
    partition filters (priority can only be a data filter there); the
    new spec's scan must carry BOTH month and priority partition
    filters -- the 5x directory skip the evolved spec exists for.
    Derived from the SAME frames evolved_scan unions (_spec_reads).
    Metadata-only: .explain of an unexecuted frame reads no data."""
    from discogs_xml_to_parquet_spark.plans import formatted_plan

    def partition_filters(df: DataFrame) -> str:
        plan = formatted_plan(df)
        return "".join(
            ln for ln in plan.splitlines() if "PartitionFilters" in ln)

    old, new = _spec_reads(spark, root)
    old_pf, new_pf = partition_filters(old), partition_filters(new)
    return {
        "old_spec_pruned": (
            "o_month" in old_pf and "o_orderpriority" not in old_pf),
        "new_spec_pruned": (
            "o_month" in new_pf and "o_orderpriority" in new_pf),
    }


_REV_SQL = rev_sql("o_totalprice")


@query(
    "q_partition_evolution",
    oracle=f"""
SELECT strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m') AS o_month,
       COUNT(*) AS n_orders,
       {_REV_SQL} AS total_price,
       TRUE AS old_spec_pruned,
       TRUE AS new_spec_pruned
FROM orders
WHERE o_orderpriority = '{_Q_PRIORITY}'
  AND strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m')
      BETWEEN '{_Q_MONTH_LO}' AND '{_Q_MONTH_HI}'
GROUP BY 1
ORDER BY 1
""",
)
def q_partition_evolution(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """Urgent-order counts and exact revenue per month across a span
    that straddles the partition-spec flip: months before the flip
    come from the month-partitioned generation (priority filtered
    in-scan -- the old layout's cost), months after from the
    (month, priority) generation where the priority predicate prunes
    directories. The oracle reconstructs the same aggregate from the
    live table, so a row lost at either spec's scan breaks the hash;
    the booleans prove each generation's scan touched only the files
    its own spec allows."""
    root = staged_evolved_partitions(spark, sf_dir)
    facts = _pruning_facts(spark, root)
    return (
        evolved_scan(spark, root)
        .groupBy("o_month")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .withColumn("old_spec_pruned",
                    F.lit(bool(facts["old_spec_pruned"])))
        .withColumn("new_spec_pruned",
                    F.lit(bool(facts["new_spec_pruned"])))
        .orderBy("o_month")
    )
