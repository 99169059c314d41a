"""Small-file compaction: the OPTIMIZE-style bin-packing rewrite --
the most common maintenance job on a 100 TB lake.

Streaming ingests, frequent small batch appends, and over-parallel
writes all fragment a table into files far below the scan-efficient
size; every downstream query then pays per-file open/footer/listing
cost (and at cloud-store latencies, per-file round trips) that dwarfs
the data read. The fix is a periodic compaction pass: read the
fragmented data, rewrite it as ceil(total_bytes / target_size) files,
swap the directory in. This module stages a deliberately fragmented
copy of lineitem (64 shards), compacts it to target-size files, and
proves BOTH halves of the contract: content equality (the relational
oracle over the compacted output must hash-match the source table) and
the layout bound (file count == the byte-derived target, every data
file near the target size -- asserted in-lane and in
tests/test_compaction.py).

Scale shape: sizing comes from the file LISTING (driver-side metadata,
exactly what table formats read from their manifests -- never a data
scan); the rewrite is one round-robin repartition to the target file
count, i.e. a single all-to-all whose output is perfectly even --
compaction rewrites the bytes anyway, so the shuffle is the price of
even files, not an extra pass. Partition-local variants (compact
within each date partition; AQE `REBALANCE` for advisory sizing) drop
the global shuffle when the table is partitioned; the staged corpus
here is a single flat directory, so the global form is the honest
plan. The swap is atomic-publish (build under a temp name, rename),
same discipline as every staged artifact in this repo.
"""

from __future__ import annotations

import math
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark.functions.exact import dsum
from discogs_xml_to_parquet_spark.registry import query
from discogs_xml_to_parquet_spark.staging import (
    source_fingerprint as _source_fingerprint,
    staged as _staged,
    work_dir as _work_dir,
)
from discogs_xml_to_parquet_spark.tables import load

_FRAG_SHARDS = 64            # fragmentation floor
_TARGET_BYTES = 1 << 20      # 1 MiB target files at test scale
                             # (production: 128 MiB-1 GiB)
_FRAG_DIV = 16               # fragments sized ~1/16 of the target
_PART_FRAG = 16              # files per month in the partitioned tree
_VERSION = 2                 # v2: fragmentation scales with the corpus


def _table_bytes(sf_dir: str, table: str) -> int:
    src = Path(sf_dir) / table
    files = sorted(src.rglob("*.parquet")) if src.is_dir() else [src]
    return sum(p.stat().st_size for p in files)


def staged_fragmented_lineitem(spark: SparkSession, sf_dir: str) -> str:
    """lineitem shattered into small parquet files well BELOW the
    compaction target (~1/_FRAG_DIV of it, _FRAG_SHARDS minimum) --
    the aftermath of an over-parallel ingest, which is the scenario
    compaction exists for. The count scales with the corpus (a fixed
    64 shards at 10x data yields files ABOVE target, where a real
    OPTIMIZE would skip the rewrite -- the sf1_verify lane caught
    exactly that). Built once per container per (sf_dir, source
    fingerprint, shard count), atomic publish."""
    slug = sf_dir.strip("/").replace("/", "_")
    fp = _source_fingerprint(sf_dir, "lineitem.parquet")
    n_frag = max(
        _FRAG_SHARDS,
        math.ceil(_table_bytes(sf_dir, "lineitem.parquet")
                  / (_TARGET_BYTES // _FRAG_DIV)),
    )
    return _staged(
        f"spark_graft_frag_v{_VERSION}_n{n_frag}_{slug}_{fp}",
        lambda tmp: (
            load(spark, sf_dir, "lineitem")
            .repartition(n_frag)
            .write.mode("overwrite")
            .parquet(tmp)
        ),
    )


def _data_files(d: str) -> list[Path]:
    return sorted(p for p in Path(d).glob("part-*") if p.is_file())


def compact_files(spark: SparkSession, src: str,
                  target_bytes: int = _TARGET_BYTES) -> tuple[str, dict]:
    """Bin-pack `src` (a fragmented parquet directory) into
    ceil(total_bytes / target_bytes) files; returns (compacted dir,
    layout facts). Sizing reads only the listing; the rewrite is one
    even repartition."""
    before = _data_files(src)
    total = sum(p.stat().st_size for p in before)
    n_target = max(1, math.ceil(total / target_bytes))
    # reused per-(src, pid) output dir: the returned DataFrame reads
    # from it lazily, so rebuild-on-next-call (staging.work_dir) is
    # the leak bound, not cleanup-at-return
    out = _work_dir("compacted", src)
    (
        spark.read.parquet(src)
        .repartition(n_target)
        .write.mode("overwrite")
        .parquet(out)
    )
    after = _data_files(out)
    facts = {
        "n_before": len(before),
        "n_after": len(after),
        "n_target": n_target,
        "bytes_before": total,
        "sizes_after": sorted(p.stat().st_size for p in after),
    }
    return out, facts


def staged_fragmented_partitioned(spark: SparkSession, sf_dir: str) -> str:
    """lineitem as a ship_month-PARTITIONED tree with _PART_FRAG small
    files inside every partition directory (a round-robin write under
    partitionBy: each of the 16 tasks holds rows of every month, so
    each month dir collects 16 fragments) -- the aftermath every
    micro-batch-appended date-partitioned fact accumulates."""
    slug = sf_dir.strip("/").replace("/", "_")
    fp = _source_fingerprint(sf_dir, "lineitem.parquet")
    return _staged(
        f"spark_graft_pfrag_v{_VERSION}_n{_PART_FRAG}_{slug}_{fp}",
        lambda tmp: (
            load(spark, sf_dir, "lineitem")
            .withColumn("ship_month",
                        F.date_format("l_shipdate", "yyyy-MM"))
            .repartition(_PART_FRAG)
            .write.mode("overwrite")
            .partitionBy("ship_month")
            .parquet(tmp)
        ),
    )


def compact_partitioned(spark: SparkSession, src: str) -> tuple[str, dict]:
    """Partition-LOCAL compaction: rewrite a partitioned tree so every
    partition directory collapses to one file, without ever mixing
    rows across partitions -- the shuffle key IS the partition column,
    so each partition's rows land in exactly one task and partitionBy
    re-emits the directory scheme unchanged (a hash collision merges
    two partitions into one task, but they still write separate
    files). Downstream partition pruning (the DPP family) keeps
    working on the compacted table; global round-robin
    (compact_files) would destroy it.

    One-file-per-partition is the correct OPTIMIZE output whenever
    partitions sit below the target file size, as date partitions of
    a fragmented ingest do here. A partition ABOVE the target splits
    by adding a listing-derived bucket column to the shuffle key
    (ceil(partition_bytes / target) salts for the hot months only) or
    capping with spark.sql.files.maxRecordsPerFile -- both keep the
    single-shuffle property; range-partitioning on (month, sort key)
    does NOT (measured here: 83 range tasks left a boundary sliver in
    nearly every month dir, 165 files for 83 partitions)."""
    dirs = sorted(p for p in Path(src).glob("ship_month=*")
                  if p.is_dir())
    files_before = [f for d in dirs for f in d.glob("part-*")]
    total = sum(f.stat().st_size for f in files_before)
    n_target = len(dirs)
    out = _work_dir("pcompact", src)
    (
        spark.read.parquet(src)
        .repartition(n_target, "ship_month")
        .write.mode("overwrite")
        .partitionBy("ship_month")
        .parquet(out)
    )
    out_dirs = sorted(p for p in Path(out).glob("ship_month=*")
                      if p.is_dir())
    per_dir = {d.name: len(list(d.glob("part-*"))) for d in out_dirs}
    facts = {
        "n_before": len(files_before),
        "n_after": sum(per_dir.values()),
        "n_target": n_target,
        "bytes_before": total,
        "months_before": [d.name for d in dirs],
        "months_after": [d.name for d in out_dirs],
        "files_per_month": per_dir,
    }
    return out, facts


@query(
    "q_compact_partitioned",
    oracle="""
SELECT strftime(CAST(l_shipdate AS TIMESTAMP), '%Y-%m') AS ship_month,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(floor((l_extendedprice * (1 - l_discount))
                     * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000
         AS revenue,
       TRUE AS compacted,
       TRUE AS partitions_preserved
FROM lineitem
GROUP BY 1
ORDER BY 1
""",
)
def q_compact_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-preserving compaction round trip: a ship_month tree
    fragmented to 16 files per month is rewritten partition-locally
    (one range shuffle keyed on the partition column) and checksummed
    per month against the live table, so a row that leaked into the
    wrong month, got dropped, or duplicated breaks the hash. The
    booleans carry the layout contract: `compacted` = EVERY partition
    directory collapsed to exactly one file (a 16x reduction), and
    `partitions_preserved` = the directory scheme survived exactly --
    the property that keeps every downstream partition-pruned scan
    (q_join_bloom_dpp's family) working on the compacted table."""
    src = staged_fragmented_partitioned(spark, sf_dir)
    out, facts = compact_partitioned(spark, src)
    compacted = (
        all(n == 1 for n in facts["files_per_month"].values())
        and facts["n_after"] * 4 <= facts["n_before"]
    )
    preserved = facts["months_after"] == facts["months_before"]
    return (
        spark.read.parquet(out)
        .groupBy("ship_month")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum(F.col("l_extendedprice")
                 * (1 - F.col("l_discount"))).alias("revenue"),
        )
        .withColumn("compacted", F.lit(bool(compacted)))
        .withColumn("partitions_preserved", F.lit(bool(preserved)))
        .orderBy("ship_month")
    )


@query(
    "q_compact_files",
    oracle="""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(floor((l_extendedprice * (1 - l_discount))
                     * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000
         AS revenue,
       COUNT(DISTINCT l_orderkey) AS n_orders,
       TRUE AS compacted,
       TRUE AS evenly_sized
FROM lineitem
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def q_compact_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction round trip: shatter lineitem into corpus-scaled
    sub-target fragments (64 at the small SFs, ~2300 at the 10x
    corpus), bin-pack them back to ~1 MiB files, and checksum the
    COMPACTED output against the live table -- per (returnflag,
    linestatus) row counts, exact revenue, and order-key cardinality,
    so a dropped, duplicated, or corrupted row anywhere in the rewrite
    breaks the hash. The two booleans carry the layout contract into the oracle
    compare: `compacted` = the rewrite hit the byte-derived target
    file count (a >=4x reduction at every SF), `evenly_sized` = every output
    file is within 2x of the mean (round-robin's evenness). The oracle
    asserts both as TRUE -- a compaction that silently fragmented or
    skewed would fail the driver row, not just a pytest."""
    src = staged_fragmented_lineitem(spark, sf_dir)
    out, facts = compact_files(spark, src)
    sizes = facts["sizes_after"]
    mean = sum(sizes) / len(sizes)
    compacted = (facts["n_after"] == facts["n_target"]
                 and facts["n_after"] * 4 <= facts["n_before"])
    evenly = sizes[0] >= mean / 2 and sizes[-1] <= mean * 2
    return (
        spark.read.parquet(out)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum(F.col("l_extendedprice")
                 * (1 - F.col("l_discount"))).alias("revenue"),
            F.countDistinct("l_orderkey").alias("n_orders"),
        )
        .withColumn("compacted", F.lit(bool(compacted)))
        .withColumn("evenly_sized", F.lit(bool(evenly)))
        .orderBy("l_returnflag", "l_linestatus")
    )
