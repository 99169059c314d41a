"""Partition-spec evolution invariants (queries/partition_evolution
.py): the staged generations really carry different specs, each
generation's scan prunes by its OWN spec, and the row booleans are
true facts, not vacuous."""

from __future__ import annotations

from pathlib import Path

from discogs_xml_to_parquet_spark.queries.partition_evolution import (
    _pruning_facts,
    evolved_scan,
    staged_evolved_partitions,
)
from tests.conftest import SF_SMOKE


def test_generations_carry_different_specs(spark):
    """spec=0 must be partitioned by month only, spec=1 by
    (month, priority) -- the evolution premise, pinned so a refactor
    cannot quietly write both generations under one spec (the query
    would still pass its oracle but stop testing spec evolution)."""
    root = staged_evolved_partitions(spark, SF_SMOKE)
    old_months = [d for d in Path(f"{root}/spec=0").glob("o_month=*")
                  if d.is_dir()]
    assert old_months
    assert not list(old_months[0].glob("o_orderpriority=*"))
    new_months = [d for d in Path(f"{root}/spec=1").glob("o_month=*")
                  if d.is_dir()]
    assert new_months
    assert list(new_months[0].glob("o_orderpriority=*"))


def test_each_scan_prunes_by_its_own_spec(spark):
    """The union's plan must carry PartitionFilters on BOTH scans:
    month bounds on the old generation, month bounds AND the priority
    equality on the new one -- the per-file-group spec resolution a
    format's planner derives from manifests."""
    from tests.test_plans import plan_of

    root = staged_evolved_partitions(spark, SF_SMOKE)
    plan = plan_of(evolved_scan(spark, root))
    pf_lines = [ln for ln in plan.splitlines()
                if "PartitionFilters" in ln and "o_month" in ln]
    assert len(pf_lines) >= 2, plan
    assert any("o_orderpriority" in ln for ln in pf_lines), plan
    assert any("o_orderpriority" not in ln for ln in pf_lines), plan


def test_pruning_facts_are_true(spark):
    """The booleans the driver row carries must hold at the smoke SF
    (and the helper must be able to FAIL: a scan without the priority
    partition filter -- the old generation's -- must not satisfy the
    new-spec predicate)."""
    root = staged_evolved_partitions(spark, SF_SMOKE)
    facts = _pruning_facts(spark, root)
    assert facts == {"old_spec_pruned": True, "new_spec_pruned": True}
