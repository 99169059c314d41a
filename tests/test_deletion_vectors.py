"""Merge-on-read deletion-vector invariants (queries/
deletion_vectors.py): the MOR read never shuffles the base, the DELETE
leaves every base file byte-identical, sidecars stay delta-sized, and
the MOR->COW compaction folds them away losslessly."""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark.queries.deletion_vectors import (
    _DEL_MOD,
    apply_deletion_vectors,
    delete_keys,
    mor_read,
    write_deletion_vectors,
)
from discogs_xml_to_parquet_spark.queries.merge import (
    _inventory,
    staged_partitioned_orders,
)
from tests.conftest import SF_SMOKE


def test_mor_read_is_broadcast_left_anti(spark):
    """The read-side merge tax is ONE BroadcastHashJoin LeftAnti: the
    base is scanned, never shuffled; the key set rides as a
    broadcast."""
    from tests.test_plans import plan_of

    base = staged_partitioned_orders(spark, SF_SMOKE)
    dv_dir, _ = write_deletion_vectors(spark, SF_SMOKE, base)
    plan = plan_of(mor_read(spark, base, dv_dir))
    tree = plan.split("\n\n")[0]
    assert "BroadcastHashJoin" in tree and "LeftAnti" in tree, tree
    assert "SortMergeJoin" not in tree, tree
    assert "Exchange hashpartitioning" not in tree, tree


def test_delete_leaves_base_byte_identical(spark):
    """The merge-on-read point: after the DELETE, every base data file
    is byte-identical -- nothing rewritten, nothing removed -- and the
    facts the driver row carries are actually true, not vacuous."""
    base = staged_partitioned_orders(spark, SF_SMOKE)
    before = _inventory(base)
    _, facts = write_deletion_vectors(spark, SF_SMOKE, base)
    assert _inventory(base) == before
    assert facts["base_untouched"] is True
    assert facts["dv_smaller_than_rewrite"] is True
    assert facts["n_dv_months"] > 0


def test_compaction_folds_sidecars_losslessly(spark, tmp_path):
    """MOR -> COW: after apply_deletion_vectors on a scratch copy, a
    PLAIN scan (no merge tax) returns exactly what the MOR read
    returned before, the compacted partitions' DVs are gone, and the
    live row set equals the predicate's complement."""
    base = staged_partitioned_orders(spark, SF_SMOKE)
    scratch = str(tmp_path / "tbl")
    shutil.copytree(base, scratch)
    dv_dir, _ = write_deletion_vectors(spark, SF_SMOKE, scratch)
    want = sorted(
        r["o_orderkey"]
        for r in mor_read(spark, scratch, dv_dir)
        .select("o_orderkey").collect()
    )
    months = apply_deletion_vectors(spark, scratch, dv_dir)
    assert months, "no partitions compacted"
    assert not list(Path(dv_dir).glob("o_month=*"))
    got = sorted(
        r["o_orderkey"]
        for r in spark.read.parquet(scratch)
        .select("o_orderkey").collect()
    )
    assert got == want
    assert all(k % _DEL_MOD != 0 for k in got)


def test_mor_read_with_no_sidecars_is_plain_scan(spark, tmp_path):
    """An empty _dv root means 'no deletes', not a schema-inference
    crash: the MOR read must return the full base."""
    base = staged_partitioned_orders(spark, SF_SMOKE)
    empty_dv = tmp_path / "dv"
    empty_dv.mkdir()
    n_base = spark.read.parquet(base).count()
    assert mor_read(spark, base, str(empty_dv)).count() == n_base


def test_compaction_drops_fully_deleted_partition(spark, tmp_path):
    """A DELETE that empties a partition entirely: compaction must
    remove the partition directory, not crash moving a file that was
    never written."""
    tbl = str(tmp_path / "t")
    spark.createDataFrame(
        [(17, "1995-01", 1.0), (34, "1995-01", 2.0), (5, "1995-02", 3.0)],
        "o_orderkey long, o_month string, o_totalprice double",
    ).write.partitionBy("o_month").parquet(tbl)
    dv = str(tmp_path / "dv")
    delete_keys(spark, tbl).write.partitionBy("o_month").parquet(dv)
    months = apply_deletion_vectors(spark, tbl, dv)
    assert "o_month=1995-01" in months
    assert not (Path(tbl) / "o_month=1995-01").exists()
    assert [r["o_orderkey"] for r in
            spark.read.parquet(tbl).collect()] == [5]
