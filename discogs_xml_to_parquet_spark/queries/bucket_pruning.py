"""Bucket pruning on read: a point lookup against a bucketed table
scans ONLY the buckets its keys hash into -- file skipping from the
write-time layout, no partition directories and no index needed.

The scan-efficiency story bucketing buys beyond shuffle-free joins
(q_join_bucketed, queries/runtime_filters.py): `bucketBy(16, key)`
assigns every row to murmur3(key) % 16 at WRITE time, so an equality
or IN predicate on the bucket key determines, at plan time, which
bucket files can possibly hold matches -- the other 13-15 of 16 are
never opened. At 100 TB this is the difference between a full-table
scan and reading ~3/16ths of it for the "all orders of these
customers" lookup every support tool runs; it composes with partition
pruning (buckets live inside partitions) and needs no stats, no
bloom sidecar, no sort.

The proof rides in the row, the partition_evolution.py discipline:
`bucket_pruned` comes from the EXECUTED plan's SelectedBucketsCount
(selected <= |keys| < total), and the relational oracle reconstructs
the same per-customer aggregate from the live table, so a row lost to
over-pruning (the failure bucketing invites: prune a bucket that DID
hold a key) breaks the hash -- the boolean alone could not prove
losslessness.

One Spark subtlety is the lane's reason to exist as a pinned example:
since 3.2, the planner DISABLES bucketed reading when nothing
downstream needs the bucket distribution (autoBucketedScan -- the
scan prints `Bucketed: false (disabled by query planner)` and bucket
pruning is lost with it). A production point-lookup path must turn
`spark.sql.sources.bucketing.autoBucketedScan.enabled` off (a
session-local conf here, exactly how the bucketed-join lane pins its
no-broadcast premise), or the layout it paid for at write time does
nothing at read time.

Scale shape: the lookup reads |selected buckets| / 16 of the table's
bytes; the aggregate is a K-group hash over those rows. Write cost is
the same one-shuffle bucketed write the join lane already pays --
this lane shares no catalog table with it (different bucket key), so
neither can perturb the other's layout premise.
"""

from __future__ import annotations

import tempfile
import threading
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark.functions.exact import dsum, rev_sql
from discogs_xml_to_parquet_spark.registry import query
from discogs_xml_to_parquet_spark.staging import (
    source_fingerprint as _source_fingerprint,
)
from discogs_xml_to_parquet_spark.tables import load

_BUCKETS = 16
_KEYS = (7, 41, 83)   # lookup customers, present at every testdata SF
_LOCK = threading.Lock()

# conf-flipped sibling session, one per Spark application (ADVICE r11:
# pruned_lookup runs repeatedly per bench round, and a fresh
# newSession() each call accumulates sibling SQLConf/listener state
# for the application's lifetime -- siblings are never stopped)
_SIBLINGS: dict[str, SparkSession] = {}


def _pruned_scan_session(spark: SparkSession) -> SparkSession:
    """The session whose plans force bucketed reading on (see module
    docstring), memoized per applicationId exactly how
    bucketed_orders_by_custkey memoizes its table."""
    app = spark.sparkContext.applicationId
    with _LOCK:
        s2 = _SIBLINGS.get(app)
        if s2 is None:
            s2 = spark.newSession()
            s2.conf.set(
                "spark.sql.sources.bucketing.autoBucketedScan.enabled",
                "false")
            _SIBLINGS.clear()   # stale appIds from a stopped context
            _SIBLINGS[app] = s2
    return s2


def bucketed_orders_by_custkey(spark: SparkSession, sf_dir: str) -> str:
    """orders as a catalog table bucketed by o_custkey (the LOOKUP
    key -- deliberately not the join lane's o_orderkey layout), once
    per Spark application per (sf_dir, fingerprint); same isolation
    contract as runtime_filters.bucketed_fact_tables."""
    slug = sf_dir.strip("/").replace("/", "_").replace(".", "_")
    fp = _source_fingerprint(sf_dir, "orders.parquet")
    app = spark.sparkContext.applicationId.replace(
        "-", "_").replace(".", "_")
    tbl = f"o_custbkt_{slug}_{fp}"
    root = Path(tempfile.gettempdir()) / f"spark_graft_custbkt_{app}"
    from discogs_xml_to_parquet_spark.operators.bucketing import (
        write_bucketed,
    )
    with _LOCK:
        if not spark.catalog.tableExists(tbl):
            write_bucketed(load(spark, sf_dir, "orders"), tbl,
                           str(root / tbl), ["o_custkey"], _BUCKETS)
    return tbl


def pruned_lookup(spark: SparkSession, tbl: str) -> DataFrame:
    """The point-lookup scan with bucketed reading FORCED on (see
    module docstring): the IN predicate prunes to at most |keys|
    buckets at plan time. Runs in a memoized sibling session so the
    conf cannot leak into other lanes' plans."""
    s2 = _pruned_scan_session(spark)
    return s2.table(tbl).filter(F.col("o_custkey").isin(*_KEYS))


def selected_buckets(df: DataFrame) -> tuple[int, int]:
    """(selected, total) parsed from the executed plan's
    SelectedBucketsCount -- the planner's binding commitment about
    which bucket files it will open."""
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"SelectedBucketsCount:\s*(\d+)\s+out of\s+(\d+)",
                  plan)
    return (int(m.group(1)), int(m.group(2))) if m else (-1, -1)


_REV_SQL = rev_sql("o_totalprice")


@query(
    "q_bucket_pruning",
    oracle=f"""
SELECT o_custkey,
       COUNT(*) AS n_orders,
       {_REV_SQL} AS total_price,
       TRUE AS bucket_pruned
FROM orders
WHERE o_custkey IN {_KEYS!r}
GROUP BY 1
ORDER BY 1
""",
)
def q_bucket_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order counts and exact revenue for a 3-key point
    lookup against the custkey-bucketed orders table: the scan opens
    at most 3 of 16 bucket files (SelectedBucketsCount from the
    executed plan rides as `bucket_pruned`), and the oracle's
    reconstruction from the live table pins that pruning lost no rows
    -- the failure mode bucketing invites is pruning a bucket that
    DID hold a key."""
    tbl = bucketed_orders_by_custkey(spark, sf_dir)
    looked_up = pruned_lookup(spark, tbl)
    sel, total = selected_buckets(looked_up)
    pruned = 0 < sel <= len(_KEYS) < total
    return (
        looked_up.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .withColumn("bucket_pruned", F.lit(bool(pruned)))
        .orderBy("o_custkey")
    )
