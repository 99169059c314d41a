"""Layout + content invariants of the compaction pass
(queries/compaction.py)."""

from __future__ import annotations

import math

from discogs_xml_to_parquet_spark.queries.compaction import (
    _FRAG_SHARDS,
    _TARGET_BYTES,
    compact_files,
    staged_fragmented_lineitem,
)
from tests.conftest import SF_SMOKE


def test_compaction_layout_and_content(spark):
    src = staged_fragmented_lineitem(spark, SF_SMOKE)
    out, facts = compact_files(spark, src)

    # layout: the byte-derived target count, a real reduction
    assert facts["n_before"] == _FRAG_SHARDS
    assert facts["n_target"] == max(
        1, math.ceil(facts["bytes_before"] / _TARGET_BYTES)
    )
    assert facts["n_after"] == facts["n_target"]
    assert facts["n_after"] * 4 <= facts["n_before"]

    # evenness: round-robin output within 2x of the mean
    sizes = facts["sizes_after"]
    mean = sum(sizes) / len(sizes)
    assert sizes[0] >= mean / 2 and sizes[-1] <= mean * 2

    # content: exact row multiset preserved (count + key checksum)
    a = spark.read.parquet(src)
    b = spark.read.parquet(out)
    assert a.count() == b.count()
    cols = ["l_orderkey", "l_linenumber"]
    assert (
        a.select(cols).exceptAll(b.select(cols)).count() == 0
        and b.select(cols).exceptAll(a.select(cols)).count() == 0
    )


def test_partitioned_compaction_layout_and_purity(spark):
    from discogs_xml_to_parquet_spark.queries.compaction import (
        _PART_FRAG,
        compact_partitioned,
        staged_fragmented_partitioned,
    )

    src = staged_fragmented_partitioned(spark, SF_SMOKE)
    out, facts = compact_partitioned(spark, src)

    # every partition dir collapsed to exactly one file; the scheme
    # survived exactly (no month appeared, vanished, or renamed)
    assert facts["months_after"] == facts["months_before"]
    assert all(n == 1 for n in facts["files_per_month"].values())
    # every month heavily fragmented before (a sparse month can miss a
    # few of the 16 round-robin tasks at the smoke SF, so <= not ==)
    n_months = len(facts["months_before"])
    assert (4 * n_months <= facts["n_before"]
            <= _PART_FRAG * n_months)

    # partition purity: per-month content identical to the source
    # (a row that crossed a partition boundary would break both sides)
    a = spark.read.parquet(src).groupBy("ship_month").count()
    b = spark.read.parquet(out).groupBy("ship_month").count()
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_partitioned_compaction_keeps_pruning(spark):
    """The point of partition-LOCAL compaction: a partition-filtered
    scan of the compacted tree still prunes at the listing (one month
    dir read, not a post-scan filter)."""
    from pyspark.sql import functions as F

    from discogs_xml_to_parquet_spark.queries.compaction import (
        compact_partitioned,
        staged_fragmented_partitioned,
    )
    from tests.test_plans import plan_of

    src = staged_fragmented_partitioned(spark, SF_SMOKE)
    out, _ = compact_partitioned(spark, src)
    month = spark.read.parquet(out).select("ship_month").first()[0]
    df = spark.read.parquet(out).filter(F.col("ship_month") == month)
    plan = plan_of(df)
    assert "PartitionFilters" in plan and "ship_month" in plan, plan
    one = spark.read.parquet(out).filter(
        F.col("ship_month") == month
    ).count()
    assert 0 < one < spark.read.parquet(out).count()


def test_compaction_single_file_floor(spark, tmp_path):
    """A corpus below one target size compacts to exactly one file."""
    src = str(tmp_path / "tiny")
    spark.range(100).write.parquet(src)
    out, facts = compact_files(spark, src, target_bytes=1 << 30)
    assert facts["n_target"] == 1 and facts["n_after"] == 1
    assert spark.read.parquet(out).count() == 100
