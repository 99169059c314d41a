"""Min/max file-skipping invariants (queries/file_skipping.py): the
scan opens exactly the envelope-intersecting files, skipping never
loses a row at ANY range (the failure mode a skipping index invites),
an unclustered layout skips nothing (the clustering premise), and the
manifest accounts for every table row."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark.queries.file_skipping import (
    _LO,
    _HI,
    _N_FILES,
    _manifest_entries,
    build_manifest,
    pruned_range_read,
    staged_clustered_orders,
    staged_skipping_manifest,
)
from discogs_xml_to_parquet_spark.tables import load
from tests.conftest import SF_SMOKE


def _staged(spark):
    t = staged_clustered_orders(spark, SF_SMOKE)
    m = staged_skipping_manifest(spark, SF_SMOKE, t)
    return t, m


def test_scan_opens_exactly_the_intersecting_files(spark):
    """inputFiles of the pruned read == the envelope-selected list
    (explicit paths, so inputFiles is exact here), and the driver-row
    facts agree."""
    t, m = _staged(spark)
    df, facts = pruned_range_read(spark, m, _LO, _HI)
    opened = {p.split("/")[-1] for p in df.inputFiles()}
    entries = _manifest_entries(m)
    want = {
        e["file"].split("/")[-1] for e in entries
        if not (e["max_custkey"] < _LO or e["min_custkey"] > _HI)
    }
    assert opened == want
    assert facts["n_files_total"] == _N_FILES == len(entries)
    assert facts["n_files_read"] == len(want) < _N_FILES
    assert facts["files_skipped"] is True


def test_skipping_never_loses_a_row(spark):
    """For randomized ranges (plus the boundary cases), the pruned
    read's row count equals the full-table filter's -- envelopes may
    be over-wide (residual filter pays) but never under-wide."""
    t, m = _staged(spark)
    full = load(spark, SF_SMOKE, "orders")
    hi_key = full.agg(F.max("o_custkey")).collect()[0][0]
    rng = random.Random(12)
    ranges = [(1, 1), (hi_key, hi_key), (1, hi_key), (_LO, _HI)] + [
        tuple(sorted((rng.randint(1, hi_key), rng.randint(1, hi_key))))
        for _ in range(6)
    ]
    for lo, hi in ranges:
        got = pruned_range_read(spark, m, lo, hi)[0].count()
        want = full.filter(F.col("o_custkey").between(lo, hi)).count()
        assert got == want, (lo, hi, got, want)


def test_out_of_domain_range_reads_zero_files(spark):
    """A range no envelope intersects: the scan opens nothing and
    returns an empty, correctly-typed frame."""
    t, m = _staged(spark)
    df, facts = pruned_range_read(spark, m, 10**9 + 7, 10**9 + 9)
    assert facts["n_files_read"] == 0
    assert df.count() == 0
    assert "o_orderpriority" in df.columns


def test_unclustered_layout_skips_nothing(spark, tmp_path):
    """The clustering premise, pinned by its negative: on a
    round-robin layout every file's envelope spans the whole domain,
    so the same range prunes ZERO files -- skipping is a property of
    the write-time layout, not of the index."""
    messy = str(tmp_path / "messy")
    load(spark, SF_SMOKE, "orders").repartition(_N_FILES).write.parquet(
        messy)
    mdir = str(tmp_path / "manifest")
    build_manifest(spark, messy, mdir)
    df, facts = pruned_range_read(spark, mdir, _LO, _HI)
    assert facts["n_files_read"] == facts["n_files_total"]
    assert facts["files_skipped"] is False
    # still correct, just unskipped
    want = (
        load(spark, SF_SMOKE, "orders")
        .filter(F.col("o_custkey").between(_LO, _HI)).count()
    )
    assert df.count() == want


def test_manifest_accounts_for_every_row(spark):
    """sum(per-file n_rows) == table row count: the index covers the
    table with no file missing or double-counted."""
    t, m = _staged(spark)
    entries = _manifest_entries(m)
    assert len(entries) == len(set(e["file"] for e in entries))
    assert sum(e["n_rows"] for e in entries) == (
        spark.read.parquet(t).count())
