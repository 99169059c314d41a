"""Expectations-audit invariants (queries/constraints.py): one fact
scan serves every rule, the FK dimension is broadcast, and detection
is real (a failing rule actually fails)."""

from __future__ import annotations

from discogs_xml_to_parquet_spark.queries.constraints import audit_frame
from tests.conftest import SF_SMOKE


def test_audit_is_one_scan_with_broadcast_fk(spark):
    """Adding a rule must never add a pass over the data: the plan
    carries exactly ONE orders scan; referential integrity rides as a
    broadcast LEFT join folded into that scan's stage."""
    from tests.test_plans import plan_of

    plan = plan_of(audit_frame(spark, SF_SMOKE))
    tree = plan.split("\n\n")[0]
    assert tree.count("Scan parquet") == 2, tree  # orders + dim keys
    assert "BroadcastHashJoin" in tree, tree
    assert "LeftOuter" in plan, plan
    # the only wide operations are the broadcast (not an Exchange
    # hash) and the final 1-row aggregate + distinct rewrite
    assert "CartesianProduct" not in tree, tree


def test_duplicate_dimension_keys_do_not_multiply_the_fact(spark):
    """A dimension carrying duplicate keys (the very defect a DQ
    engine exists to catch) must not inflate the audit: the FK fold
    joins DISTINCT keys, so n_checked stays the fact row count,
    row-local violations don't double-count, and uniqueness reports
    no phantom violations."""
    from discogs_xml_to_parquet_spark.queries.constraints import _audit
    from discogs_xml_to_parquet_spark.tables import load

    o = load(spark, SF_SMOKE, "orders")
    dim = load(spark, SF_SMOKE, "customer").select("c_custkey")
    dup = dim.unionAll(dim).unionAll(dim.limit(5))
    clean = {r["rule"]: r for r in _audit(o, dim).collect()}
    dirty = {r["rule"]: r for r in _audit(o, dup).collect()}
    assert clean == dirty
    assert dirty["unique_orderkey"]["n_violations"] == 0
    assert dirty["not_null_orderkey"]["n_checked"] == o.count()


def test_audit_detects_and_passes(spark):
    """The rule set must contain a genuinely failing rule and
    genuinely passing rules, all over the same n_checked."""
    rows = {r["rule"]: r for r in audit_frame(spark, SF_SMOKE).collect()}
    assert len(rows) == 6
    n = {r["n_checked"] for r in rows.values()}
    assert len(n) == 1  # every rule audited the same row universe
    cap = rows["price_cap_400k"]
    assert cap["n_violations"] > 0 and not cap["passed"]
    for name in ("not_null_orderkey", "status_in_domain",
                 "price_positive", "fk_customer_exists",
                 "unique_orderkey"):
        assert rows[name]["n_violations"] == 0 and rows[name]["passed"]
