"""The composed snapshot read (queries/snapshot_read.py): the layers
the oracle checksum cannot see individually -- the physical plan of
the DV subtraction, the planned-file/scanned-file identity, snapshot
isolation of the v0 read, and each gate's strict decrease -- pinned
directly."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark.queries.lakehouse import (
    _KEYS,
    _P_HI,
    _P_LO,
    _Y_HI,
    _Y_LO,
)
from discogs_xml_to_parquet_spark.queries.snapshot_read import (
    _DEL_MOD,
    _UPD_MOD,
    snapshot_scan,
    versioned_lakehouse,
)
from discogs_xml_to_parquet_spark.tables import load
from tests.conftest import SF_SMOKE


def _gated(df):
    return df.filter(
        F.col("o_year").between(_Y_LO, _Y_HI)
        & F.col("o_custkey").isin(*_KEYS)
        & F.col("o_totalprice").between(_P_LO, _P_HI)
    )


def test_v1_scan_is_broadcast_left_anti_no_base_shuffle(spark):
    """The DV subtraction must plan as ONE BroadcastHashJoin LeftAnti
    on the EXECUTED plan: the planned-file scan is never shuffled and
    the delete set rides as a broadcast."""
    table, facts = versioned_lakehouse(spark, SF_SMOKE)
    df, _ = snapshot_scan(
        spark, f"{table}/{facts['current']}", f"{table}/_man_gate",
        f"{table}/_pdv_v1")
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "ShuffledHashJoin" not in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan


def test_scan_reads_exactly_the_planned_files(spark):
    """inputFiles == the manifest-planned keep set, both snapshots:
    gates 2 and 3 are invisible to the plan tree (no catalog), so the
    file-identity check IS their proof."""
    table, facts = versioned_lakehouse(spark, SF_SMOKE)
    for version, pdv in (
        ("v0", None),
        (facts["current"], f"{table}/_pdv_v1"),
    ):
        df, counts = snapshot_scan(
            spark, f"{table}/{version}", f"{table}/_man_files_{version}",
            pdv)

        # inputFiles renders file:///tmp/... while _metadata.file_path
        # (the manifest's file identity) renders file:/tmp/... -- same
        # files, different URI spellings
        def norm(u: str) -> str:
            return "file:///" + u.split(":", 1)[1].lstrip("/")

        # inputFiles also lists the DV sidecar (the anti-join's build
        # side); the planned-file contract is about the BASE scan, so
        # scope to the version root
        root = norm(f"file:{table}/{version}/")
        got = sorted(
            f for f in (norm(f) for f in df.inputFiles())
            if f.startswith(root))
        want = sorted(norm(f) for f in counts["files"])
        assert got == want, (version, got, want)


def test_each_gate_strictly_reduces_both_snapshots(spark):
    """The three gates each drop files on BOTH snapshots (the v1
    rewrite must keep the range-cluster, or the skip gate goes
    vacuous on rewritten cells -- the file-density regression this
    pins)."""
    table, facts = versioned_lakehouse(spark, SF_SMOKE)
    for version in ("v0", facts["current"]):
        _, n = snapshot_scan(
            spark, f"{table}/{version}", f"{table}/_man_gates_{version}")
        assert n["after_partition"] < n["total"], (version, n)
        assert n["after_bucket"] < n["after_partition"], (version, n)
        assert 0 < n["after_skip"] < n["after_bucket"], (version, n)


def test_v0_is_snapshot_isolated(spark):
    """Time travel: the v0 read through the composed path equals the
    RAW orders table under the same gate -- no merged value, no DV
    subtraction may leak in (facts say so; this proves it row-wise)."""
    table, facts = versioned_lakehouse(spark, SF_SMOKE)
    assert facts["v0_intact"] and facts["base_untouched"]
    df, counts = snapshot_scan(
        spark, f"{table}/v0", f"{table}/_man_iso")
    assert counts["dv_applied"] is False
    raw = _gated(
        load(spark, SF_SMOKE, "orders")
        .withColumn("o_year", F.year("o_orderdate"))
    )
    got = {(r["o_orderkey"], r["o_orderstatus"], r["o_totalprice"])
           for r in df.select(
               "o_orderkey", "o_orderstatus", "o_totalprice").collect()}
    want = {(r["o_orderkey"], r["o_orderstatus"], r["o_totalprice"])
            for r in raw.select(
                "o_orderkey", "o_orderstatus", "o_totalprice").collect()}
    assert got == want


def test_v1_applies_merge_then_deletes(spark):
    """The v1 row set = (update applied) minus (every DEL_MOD-th
    key), checked per row against an independent reconstruction from
    the raw table."""
    table, facts = versioned_lakehouse(spark, SF_SMOKE)
    df, counts = snapshot_scan(
        spark, f"{table}/{facts['current']}", f"{table}/_man_v1chk",
        f"{table}/_pdv_v1")
    assert counts["dv_applied"] is True
    assert facts["n_dv_rows"] > 0
    raw = load(spark, SF_SMOKE, "orders").withColumn(
        "o_year", F.year("o_orderdate"))
    upd_pred = (
        F.col("o_year").between(_Y_LO, _Y_HI)
        & (F.col("o_orderkey") % _UPD_MOD == 0)
    )
    want_df = _gated(
        raw.withColumn(
            "o_orderstatus",
            F.when(upd_pred, F.lit("U")).otherwise(F.col("o_orderstatus")),
        ).withColumn(
            "o_totalprice",
            F.when(upd_pred, F.col("o_totalprice") + F.lit(10.0))
            .otherwise(F.col("o_totalprice")),
        ).filter(F.col("o_orderkey") % _DEL_MOD != 0)
    )
    got = {(r["o_orderkey"], r["o_orderstatus"], r["o_totalprice"])
           for r in df.select(
               "o_orderkey", "o_orderstatus", "o_totalprice").collect()}
    want = {(r["o_orderkey"], r["o_orderstatus"], r["o_totalprice"])
            for r in want_df.select(
                "o_orderkey", "o_orderstatus", "o_totalprice").collect()}
    assert got == want


def test_unaffected_cells_share_storage_by_pointer(spark):
    """O(affected) versioning: every cell OUTSIDE the update window
    resolves v1 -> v0 -> base as the same directory (zero new bytes);
    every window cell is a rewritten real directory."""
    table, facts = versioned_lakehouse(spark, SF_SMOKE)
    assert facts["storage_shared"] is True
    v0, v1 = Path(table) / "v0", Path(table) / "v1"
    for cell in sorted(v1.glob("o_year=*/o_bucket=*")):
        rel = str(cell.relative_to(v1))
        year = int(rel.split("/")[0].split("=")[1])
        if _Y_LO <= year <= _Y_HI:
            assert not cell.is_symlink(), rel   # rewritten
        else:
            assert cell.is_symlink(), rel       # shared
            assert cell.resolve() == (v0 / rel).resolve(), rel
