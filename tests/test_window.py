"""The driver-window rotation policy, pinned (VERDICT r6 item 6).

registry.window() derives the recommended first-50 registration order
from the CORRECTNESS_r*.json artifacts; these tests assert the static
import order in queries/__init__.py agrees with it, so window planning
can no longer drift as hand-maintained prose (the r6 docstring's slot
math needed a correction commit, 1c435de). When a new round's artifact
lands (or a query is added/changed), the fixed-point test breaks and
the import order must be re-derived -- that is the intended workflow.
"""

from __future__ import annotations

from discogs_xml_to_parquet_spark import registry

registry.load_all_queries()

WINDOW_SIZE = 50

# Round-7 policy inputs that artifacts cannot express (see
# registry.window docstring): q_curation_pipeline changed in r6 after
# its module rotated out of the window; the conversion trio carries the
# VERDICT r5 item-6 guarantee (namesake surface never goes >3 rounds
# without a driver row -- r4 evidence, so it is pinned into r7).
# NOTE for r8's builder: the r7 perf-sweep queries changed AFTER the
# r7 window locked (full list + measurements in queries/__init__.py
# docstring tail): q_histogram_equidepth, q_pareto_frontier,
# q_triangle_count, q_budget_select, q_dedup_semantic, q_stats_mad,
# q_pagerank_bipartite, q_agg_approx_distinct, q_percentiles_approx,
# q_percentile_cont_exact.
# They go into R8_CHANGED, pulling analytics_extra, curation_extra
# (+ clustering import), graph_iter, features, and sketches into the
# r8 window alongside pipeline's tail + ranges.
R7_CHANGED = frozenset({"q_curation_pipeline"})
R7_PIN = ("conversion",)


def test_import_order_is_policy_fixed_point():
    """The first 50 registered queries ARE the policy window."""
    want = registry.window(
        size=WINDOW_SIZE, changed=R7_CHANGED, pin=R7_PIN
    )
    got = list(registry.QUERIES)[:WINDOW_SIZE]
    assert got == want, (
        "queries/__init__.py import order disagrees with the "
        "artifact-derived rotation policy;\nre-derive it: "
        f"policy={want}\nactual={got}"
    )


def test_window_contains_every_never_checked_query():
    """Invariant behind rank 0: a query with no driver row anywhere
    must never wait outside the window."""
    latest = registry._latest_green_round(
        __import__("os").path.join(__import__("os").path.dirname(
            __file__), "..")
    )
    never = [n for n in registry.QUERIES if n not in latest]
    win = set(list(registry.QUERIES)[:WINDOW_SIZE])
    missing = [n for n in never if n not in win]
    assert not missing, f"never-checked queries outside window: {missing}"


def test_r7_window_contents():
    """The round-7 membership decisions, pinned explicitly (VERDICT r6
    item 1): the three driver-unchecked TPC-H queries + new Q21 lead,
    the changed capstone re-checks with its dependency group, the
    conversion trio is in, and the oversubscription resolves by
    slipping pipeline's tail + ranges to r8."""
    win = list(registry.QUERIES)[:WINDOW_SIZE]
    for must in (
        "q5_local_supplier_volume",
        "q6_forecast_revenue",
        "q19_discounted_revenue",
        "q21_suppliers_waiting",
        "q_curation_pipeline",
        "discogs_xml_conversion",
        "discogs_conversion_stats",
        "discogs_explode_artists",
        "q_agg_cube",
        "q_agg_grouping_sets",
        "q_source_csv_roundtrip",
    ):
        assert must in win, must
    assert win[-1] == "q_pii_redact"  # the documented mid-module cut
    for out in ("q_range_join_events", "q_sample_hash",
                "q_dedup_span_shingles", "q_rollup_reuse_hourly_daily"):
        assert out not in win, out


def test_module_deps_reflect_imports():
    """The dependency scan that lets window() fold import-dragged
    modules forward must see the known edges."""
    deps = registry._module_deps()
    assert set(deps["curation_full"]) >= {"dedup", "packing", "quality"}
    assert "clustering" in deps["curation_extra"]
