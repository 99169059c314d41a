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


def test_compaction_single_file_floor(spark, tmp_path):
    """A corpus below one target size compacts to exactly one file."""
    src = str(tmp_path / "tiny")
    spark.range(100).write.parquet(src)
    out, facts = compact_files(spark, src, target_bytes=1 << 30)
    assert facts["n_target"] == 1 and facts["n_after"] == 1
    assert spark.read.parquet(out).count() == 100
