"""The composed lakehouse read path (VERDICT r12 "what's missing"
#5): partition pruning, bucket-transform pruning, and min/max file
skipping must compose on ONE table -- each gate pinned to strictly
reduce the file set on its own, the final scan pinned to open EXACTLY
the planned files, the partition predicate pinned to survive as
PartitionFilters in the executed plan, and the gated read pinned
value-identical to an ungated full scan (losslessness, the failure
every metadata gate invites)."""

from __future__ import annotations

from discogs_xml_to_parquet_spark.queries.lakehouse import (
    _KEYS,
    _N_BUCKETS,
    key_buckets,
    planned_read,
    q_lakehouse_read_path,
    staged_lakehouse_manifest,
    staged_lakehouse_orders,
)
from tests.conftest import SF_SMOKE
from tests.test_plans import plan_of


def _setup(spark):
    table = staged_lakehouse_orders(spark, SF_SMOKE)
    manifest = staged_lakehouse_manifest(spark, SF_SMOKE, table)
    return table, manifest


def test_each_gate_strictly_reduces(spark):
    """Disable one gate at a time: every gate must drop files the
    other two keep -- otherwise the 'composed' lane is really
    exercising fewer mechanisms than it claims."""
    table, manifest = _setup(spark)
    _, full = planned_read(spark, table, manifest)
    assert (full["total"] > full["after_partition"]
            > full["after_bucket"] > full["after_skip"] > 0), full
    for dropped in ("partition", "bucket", "skip"):
        gates = tuple(g for g in ("partition", "bucket", "skip")
                      if g != dropped)
        _, n = planned_read(spark, table, manifest, gates=gates)
        assert n["after_skip"] > full["after_skip"], (dropped, n, full)


def test_scan_opens_exactly_the_planned_files(spark):
    """The explicit-file-list gate, physically: inputFiles of the
    gated frame == the manifest plan's keep set (no extra file opened
    behind the plan's back, none silently dropped)."""
    import json
    import re
    from pathlib import Path

    def norm(p: str) -> str:
        # inputFiles and _metadata.file_path spell the scheme
        # differently (file:///x vs file:/x); compare plain paths
        return re.sub(r"^file:/*", "/", p)

    table, manifest = _setup(spark)
    df, n = planned_read(spark, table, manifest)
    opened = {norm(f) for f in df.inputFiles()}
    entries = []
    for part in sorted(Path(manifest).glob("part-*.json")):
        entries += [json.loads(x) for x in
                    part.read_text().splitlines() if x.strip()]
    buckets = key_buckets(spark, _KEYS)
    planned = {
        norm(e["file"])
        for e in entries
        if 1996 <= e["year"] <= 1997
        and e["bucket"] in buckets
        and not (e["max_price"] < 175_000.0
                 or e["min_price"] > 325_000.0)
    }
    assert opened == planned and len(opened) == n["after_skip"]


def test_partition_filter_survives_in_executed_plan(spark):
    """Gate 1's catalog spelling: the final scan reads with basePath
    so o_year stays a partition column, and the year predicate must
    plan as PartitionFilters -- metadata-level directory pruning, not
    a row filter over already-opened files."""
    import re

    table, manifest = _setup(spark)
    df, _ = planned_read(spark, table, manifest)
    plan = plan_of(df)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "o_year" in m.group(1), plan


def test_bucket_ids_match_the_written_layout(spark):
    """The read-side bucket computation must agree with the write-side
    assignment file by file: for every kept file, every row's custkey
    must hash to the file's own bucket dir (murmur3 drift between the
    two sides would prune buckets that DO hold keys)."""
    from pyspark.sql import functions as F

    table, _ = _setup(spark)
    bad = (
        spark.read.option("basePath", table).parquet(table)
        .filter(F.pmod(F.hash("o_custkey"), F.lit(_N_BUCKETS))
                != F.col("o_bucket"))
        .count()
    )
    assert bad == 0
    # and the chosen lookup keys cover exactly 3 of the 4 buckets --
    # the property that makes the bucket gate strict by construction
    assert key_buckets(spark, _KEYS) == {0, 2, 3}


def test_gated_read_is_lossless(spark):
    """Values identical with every gate off: the full-table scan with
    the same ROW predicates is the ground truth; a gate that drops a
    qualifying file diverges here (and in the driver's oracle)."""
    table, manifest = _setup(spark)
    gated, _ = planned_read(spark, table, manifest)
    ungated, n = planned_read(spark, table, manifest, gates=())
    assert n["after_skip"] == n["total"]
    cols = ["o_orderkey", "o_custkey", "o_totalprice"]
    assert sorted(map(tuple, gated.select(cols).collect())) == sorted(
        map(tuple, ungated.select(cols).collect()))


def test_registered_query_matches_oracle(spark):
    """The driver's t2 gate, locally: Spark vs DuckDB on the raw
    table (which also forces every strict-decrease boolean TRUE)."""
    import __spark_entry__ as entrymod

    from tests.oracle_utils import compare

    compare(spark, SF_SMOKE, q_lakehouse_read_path,
            entrymod.oracle_sql()["q_lakehouse_read_path"],
            "q_lakehouse_read_path")
