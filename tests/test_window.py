"""The driver-window rotation policy, pinned (VERDICT r6 item 6).

registry.window() derives the recommended first-50 registration order
from the CORRECTNESS_r*.json artifacts; these tests assert the static
import order in queries/__init__.py agrees with it, so window planning
can no longer drift as hand-maintained prose (the r6 docstring's slot
math needed a correction commit, 1c435de). When a new round's artifact
lands (or a query is added/changed), the fixed-point test breaks and
the import order must be re-derived -- that is the intended workflow:
`python scripts/window_plan.py --changed <next round's changed list>`
prints the ready-to-paste module order (ADVICE r7).
"""

from __future__ import annotations

from discogs_xml_to_parquet_spark import registry

registry.load_all_queries()

WINDOW_SIZE = 50

# Round-8 policy inputs that artifacts cannot express (see
# registry.window docstring): the 10 queries the r7 perf sweep rewrote
# AFTER the r7 window locked (plan-level changes, oracles unchanged --
# full measurements in queries/__init__.py). No pin this round: the
# conversion trio's max-3-rounds guarantee (VERDICT r5 item 6) is
# satisfied through r10 by its r7 rows. The five queries NEW in r8
# (q_stream_dedup_exact, q_stream_cdc_state, q_fuzzy_blocked_stats,
# q_join_bloom_dpp, q_freq_items_cms) are IN the r8 window -- they
# registered before it locked, so rank 0 (never-checked) pulls their
# modules to the head.
R8_CHANGED = frozenset({
    "q_histogram_equidepth",
    "q_pareto_frontier",
    "q_budget_select",
    "q_stats_mad",
    "q_percentile_cont_exact",
    "q_triangle_count",
    "q_dedup_semantic",
    "q_pagerank_bipartite",
    "q_agg_approx_distinct",
    "q_percentiles_approx",
})
R8_PIN: tuple[str, ...] = ()


def test_import_order_is_policy_fixed_point():
    """The first 50 registered queries ARE the policy window."""
    want = registry.window(
        size=WINDOW_SIZE, changed=R8_CHANGED, pin=R8_PIN
    )
    got = list(registry.QUERIES)[:WINDOW_SIZE]
    assert got == want, (
        "queries/__init__.py import order disagrees with the "
        "artifact-derived rotation policy;\nre-derive it "
        "(scripts/window_plan.py prints this ready to paste): "
        f"policy={want}\nactual={got}"
    )


def test_window_contains_every_never_checked_query():
    """Invariant behind rank 0: a query with no driver row anywhere
    must never wait outside the window."""
    import os

    latest = registry._latest_green_round(
        os.path.join(os.path.dirname(__file__), "..")
    )
    never = [n for n in registry.QUERIES if n not in latest]
    win = set(list(registry.QUERIES)[:WINDOW_SIZE])
    missing = [n for n in never if n not in win]
    assert not missing, f"never-checked queries outside window: {missing}"


def test_r8_window_contents():
    """The round-8 membership decisions, pinned explicitly: the ten
    NEW queries' modules lead (rank 0, incl. the tpch_extra2 five),
    all 10 perf-sweep-rewritten queries follow (VERDICT r7 items
    1/2), the r3 leftovers (pipeline tail + ranges) and most of the
    r4 cohort are in, and the cut lands mid-text_analysis after
    q_text_stats (its last six queries plus windows, subqueries
    and semistructured slip to r9 -- the cost of the new queries'
    modules entering at rank 0)."""
    win = list(registry.QUERIES)[:WINDOW_SIZE]
    for must in (
        "q_stream_dedup_exact",
        "q_stream_cdc_state",
        "q_fuzzy_blocked_stats",
        "q_join_bloom_dpp",
        "q_freq_items_cms",
        "q13_customer_distribution",
        "q17_small_qty_revenue",
        "q7_volume_shipping",
        "q22_idle_balance",
        "q15_top_supplier",
        *sorted(R8_CHANGED),
        "q_sample_hash",
        "q_dedup_span_shingles",
        "q_rollup_reuse_hourly_daily",
        "q_range_join_events",
        "q_interval_overlap",
        "q_range_join_bucketed",
        "q_cohort_retention",
        "q_asof_join",
        "q_text_stats",
    ):
        assert must in win, must
    assert win[-1] == "q_text_stats"  # the mid-module cut
    for out in ("q_text_quality", "q_text_fingerprint",
                "q_text_rolling_winnow", "q_text_langid_ngram",
                "q_window_topk_per_group", "q_subquery_correlated",
                "q_map_funcs", "q1_pricing_summary", "q_string_funcs",
                "q_dedup_exact", "discogs_xml_conversion"):
        assert out not in win, out


def test_module_deps_reflect_imports():
    """The dependency scan that lets window() fold import-dragged
    modules forward must see the known edges (ast-based since r8 --
    ADVICE r7: the old regex dropped all but the first name of a
    multi-module import)."""
    deps = registry._module_deps()
    assert set(deps["curation_full"]) >= {"dedup", "packing", "quality"}
    assert "clustering" in deps["curation_extra"]


def test_module_deps_multi_import(tmp_path, monkeypatch):
    """Regression for the ADVICE r7 regex bug: a single
    `from ...queries import a, b` line must yield BOTH modules."""
    import textwrap

    from discogs_xml_to_parquet_spark import queries as qpkg

    mod = tmp_path / "fake_dep_probe.py"
    mod.write_text(textwrap.dedent("""\
        from discogs_xml_to_parquet_spark.queries import dedup, packing
        from discogs_xml_to_parquet_spark.queries.quality import x
        import discogs_xml_to_parquet_spark.queries.scoring
    """))
    (tmp_path / "__init__.py").write_text("")
    monkeypatch.setattr(qpkg, "__file__", str(tmp_path / "__init__.py"))
    deps = registry._module_deps()
    assert deps["fake_dep_probe"] == ["dedup", "packing", "quality",
                                      "scoring"]
