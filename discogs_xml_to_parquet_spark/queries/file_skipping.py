"""Min/max file skipping on a NON-partition column: a kilobyte stats
manifest names which data files can possibly satisfy a range
predicate, and the scan opens ONLY those -- the Delta data-skipping /
Iceberg column-metrics mechanism, physically executed.

This closes the loop q_zorder_layout (queries/layout.py) opens: that
lane computes the zone-map table a planner would consult; this one
CONSULTS it. The three-step lifecycle every lakehouse runs:

  1. CLUSTER: the table is written range-clustered on the skip column
     (repartitionByRange -- the single-dimension OPTIMIZE; the Morton
     variant is the layout lane's subject), so each file's min/max
     envelope is tight. Skipping works exactly as well as the layout
     is clustered -- on an unclustered table every file overlaps every
     range and nothing skips (pytest pins that negative).
  2. INDEX: one scan aggregates per-file (min, max, rows) via the
     scan's own `_metadata.file_path` and lands the stats as ONE JSON
     manifest written executor-side (coalesce(1).write.json) -- the
     Delta checkpoint / Iceberg manifest shape. The driver never
     holds a data row.
  3. SCAN: the driver reads the KILOBYTE manifest (exactly how every
     table format's driver reads its transaction log -- metadata, not
     data), keeps files whose [min, max] envelope intersects the
     predicate range, and hands the explicit file list to the parquet
     reader; the residual filter still applies row-level on the kept
     files, so an over-wide envelope costs I/O but never correctness.

Both halves ride in the driver row, the repo's physical-proof
pattern: the relational oracle recomputes the range aggregate from
the raw table (a row lost to over-skipping -- THE failure mode a
skipping index invites -- breaks the per-priority checksums), and
`files_skipped` carries the layout proof (the scan opened strictly
fewer files than the table holds, and at least one).

Scale shape: the manifest is O(files) bytes regardless of table
bytes; a selective range reads O(selectivity) of the table with NO
partition column involved -- the mechanism composes with partition
pruning (files live inside partitions) and needs no sort order at
read time. Index build is one columnar scan; cluster cost is the one
range-shuffle write, amortized over every subsequent skip.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark.functions.exact import dsum, rev_sql
from discogs_xml_to_parquet_spark.registry import query
from discogs_xml_to_parquet_spark.staging import (
    source_fingerprint as _source_fingerprint,
    staged as _staged,
)
from discogs_xml_to_parquet_spark.tables import load

_N_FILES = 16
_LO, _HI = 100, 200   # custkey lookup range: inside the domain at
                      # every SF (>= 150 custkeys at sf0.001), narrow
                      # enough that most range-clustered files skip
_VERSION = 1


def staged_clustered_orders(spark: SparkSession, sf_dir: str) -> str:
    """orders range-clustered on o_custkey into _N_FILES files -- the
    write-time layout skipping depends on. Built once per container
    per (sf_dir, fingerprint), atomic publish."""
    slug = sf_dir.strip("/").replace("/", "_")
    fp = _source_fingerprint(sf_dir, "orders.parquet")
    return _staged(
        f"spark_graft_skiporders_v{_VERSION}_{slug}_{fp}",
        lambda tmp: (
            load(spark, sf_dir, "orders")
            .repartitionByRange(_N_FILES, "o_custkey")
            .write.mode("overwrite")
            .parquet(tmp)
        ),
    )


def build_manifest(spark: SparkSession, table: str, dest: str) -> None:
    """INDEX: one scan of `table` grouped by the scan's own file
    identity -> per-file (min, max, rows), landed executor-side as a
    single JSON manifest (coalesce(1).write.json -- the
    Delta-checkpoint shape; the driver never holds a data row)."""
    (
        spark.read.parquet(table)
        .groupBy(F.col("_metadata.file_path").alias("file"))
        .agg(
            F.min("o_custkey").alias("min_custkey"),
            F.max("o_custkey").alias("max_custkey"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .json(dest)
    )


def staged_skipping_manifest(spark: SparkSession, sf_dir: str,
                             table: str) -> str:
    """build_manifest over the staged clustered table, once per
    container per (sf_dir, fingerprint)."""
    slug = sf_dir.strip("/").replace("/", "_")
    fp = _source_fingerprint(sf_dir, "orders.parquet")
    return _staged(
        f"spark_graft_skipmanifest_v{_VERSION}_{slug}_{fp}",
        lambda tmp: build_manifest(spark, table, tmp),
    )


def _manifest_entries(manifest_dir: str) -> list[dict]:
    """Driver-side manifest read -- kilobytes of metadata, the same
    class of operation as merge.py reading its version manifests."""
    out: list[dict] = []
    for part in sorted(Path(manifest_dir).glob("part-*.json")):
        for line in part.read_text().splitlines():
            if line.strip():
                out.append(json.loads(line))
    return out


def pruned_range_read(spark: SparkSession, manifest_dir: str,
                      lo: int, hi: int) -> tuple[DataFrame, dict]:
    """The skipping scan: keep files whose [min, max] envelope
    intersects [lo, hi], hand the EXPLICIT list to the reader, apply
    the residual row filter. Returns (frame, layout facts)."""
    entries = _manifest_entries(manifest_dir)
    # the staged table is never empty, so an empty manifest is always
    # a build bug (ADVICE r12: the empty-keep fallback below reads
    # entries[0] and would raise an opaque IndexError instead)
    assert entries, (
        f"empty/corrupt skipping manifest at {manifest_dir}: "
        "build_manifest wrote no entries for a non-empty table"
    )
    keep = [
        e["file"] for e in entries
        if not (e["max_custkey"] < lo or e["min_custkey"] > hi)
    ]
    pred = F.col("o_custkey").between(lo, hi)
    if keep:
        df = spark.read.parquet(*sorted(keep)).filter(pred)
    else:  # nothing can match: an empty frame with the table schema
        df = spark.read.parquet(entries[0]["file"]).filter(
            F.lit(False))
    facts = {
        "n_files_total": len(entries),
        "n_files_read": len(keep),
        "files_skipped": 0 < len(keep) < len(entries),
    }
    return df, facts


_REV_SQL = rev_sql("o_totalprice")


@query(
    "q_file_skipping_scan",
    oracle=f"""
SELECT o_orderpriority AS priority,
       COUNT(*) AS n_orders,
       {_REV_SQL} AS total_price,
       TRUE AS files_skipped
FROM orders
WHERE o_custkey BETWEEN {_LO} AND {_HI}
GROUP BY 1
ORDER BY 1
""",
)
def q_file_skipping_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority order counts and exact revenue for a custkey
    range, read through the min/max stats manifest: the scan opens
    only the files whose envelope intersects [{lo}, {hi}] -- strictly
    fewer than the table holds (`files_skipped`) -- and the oracle's
    reconstruction from the raw table pins that skipping lost no row,
    the failure mode a skipping index invites."""
    table = staged_clustered_orders(spark, sf_dir)
    manifest = staged_skipping_manifest(spark, sf_dir, table)
    df, facts = pruned_range_read(spark, manifest, _LO, _HI)
    return (
        df.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .withColumn("files_skipped",
                    F.lit(bool(facts["files_skipped"])))
        .orderBy("priority")
    )
