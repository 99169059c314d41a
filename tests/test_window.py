"""The driver-window rotation policy, pinned (VERDICT r6 item 6).

registry.window() derives the recommended first-50 registration order
from the CORRECTNESS_r*.json artifacts; these tests assert the static
import order in queries/__init__.py agrees with it, so window planning
can no longer drift as hand-maintained prose.

Since r9 the derivation is ROUND-PINNED (VERDICT r8 item 1): the r7
and r8 suites both went red at judging time because the driver landing
the round's artifact re-ranked the just-checked queries -- a designed
tripwire that fired twice is a process bug. window(max_round=
DERIVED_AT_ROUND) ignores artifacts newer than the pinned round, so
landing CORRECTNESS_r12.json cannot flip this suite; re-deriving for
r13 is one deliberate commit: bump DERIVED_AT_ROUND to 12, update
CHANGED/PIN, and paste the order printed by
`python scripts/window_plan.py --max-round 12 --changed <r13 changed>`.
"""

from __future__ import annotations

from discogs_xml_to_parquet_spark import registry

registry.load_all_queries()

WINDOW_SIZE = 50

# The round whose artifacts this derivation used (artifacts r1..r11;
# CORRECTNESS_r12.json and later are ignored by the fixed-point test).
DERIVED_AT_ROUND = 11

# Round-12 policy inputs that artifacts cannot express -- queries whose
# code changed since their LAST green driver row:
# - r12 in-round changes: q_setsim_prefix_join (size-conditional
#   verification/expansion broadcasts -- VERDICT r11 item 1),
#   q_theta_set_algebra (production projection slimmed, ADVICE),
#   q_delete_merge_on_read (stat-only untouched fact, ADVICE),
#   q_bucket_pruning (memoized sibling session, ADVICE),
#   q_retention_ttl (hardlink scratch clone).
# - late-r11 changes to lanes outside the r11 window (values identical,
#   re-verified locally at sf0.01, but engine/oracle/parser code
#   changed): q_constraint_audit (distinct-dim FK fold),
#   q_hll_union_rollup (one-scan exact reference, column rename), the
#   conversion trio (strict-parser conformance fixes, commit 4ecc7ab
#   -- also their max-3-rounds freshness pin expires r13, closed here
#   as CHANGED, VERDICT r11 item 7), and the operators/prefix.py
#   consumers (commit e3725d4: running_sum null-carry fix ->
#   q_budget_select, q_histogram_equidepth; value_at_ranks left-join
#   fix -> q_stats_mad, q_percentile_cont_exact).
# DELIBERATELY NOT CHANGED: q_compact_files / q_compact_partitioned
# (late-r11 change was work-dir reuse -- harness footprint only) and
# q_reservoir_per_group (canonical _doc_hash reuse, an identical
# expression by construction); both rotate on evidence age, which
# keeps every r7-evidence query inside this window (item 2's target:
# oldest evidence anywhere >= r8 after r12).
# The three r12-NEW queries (q_file_skipping_scan,
# q_delete_positional_dv, q_incremental_join_view) need no entry:
# rank 0 covers never-checked, and their modules ride forward whole
# (deletion_vectors dragging merge via the dependency fold;
# incremental bringing q_incremental_rollup).
R12_CHANGED = frozenset({
    "q_setsim_prefix_join", "q_theta_set_algebra",
    "q_delete_merge_on_read", "q_bucket_pruning", "q_retention_ttl",
    "q_constraint_audit", "q_hll_union_rollup",
    "discogs_xml_conversion", "discogs_conversion_stats",
    "discogs_explode_artists",
    "q_budget_select", "q_histogram_equidepth",
    "q_stats_mad", "q_percentile_cont_exact",
})
R12_PIN: tuple[str, ...] = ()


def test_import_order_is_policy_fixed_point():
    """The first 50 registered queries ARE the policy window."""
    want = registry.window(
        size=WINDOW_SIZE, changed=R12_CHANGED, pin=R12_PIN,
        max_round=DERIVED_AT_ROUND,
    )
    got = list(registry.QUERIES)[:WINDOW_SIZE]
    assert got == want, (
        "queries/__init__.py import order disagrees with the "
        "artifact-derived rotation policy;\nre-derive it "
        "(scripts/window_plan.py --max-round N prints this ready to "
        f"paste): policy={want}\nactual={got}"
    )


def test_derivation_is_stable_under_new_artifacts(tmp_path):
    """The VERDICT r8 item-1 regression test: a NEWER artifact landing
    in the artifacts dir must not change the pinned derivation. Builds
    a copy of the repo-root artifacts plus a fake CORRECTNESS_r99.json
    that greens every registered query -- without the max_round pin
    that re-ranks everything."""
    import glob
    import json
    import os
    import shutil

    repo = os.path.join(os.path.dirname(__file__), "..")
    for fp in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        shutil.copy(fp, tmp_path)
    fake = {n: {"rows_match": True, "schema_match": True,
                "hash_match": True, "err": None}
            for n in registry.QUERIES}
    (tmp_path / "CORRECTNESS_r99.json").write_text(json.dumps(fake))
    pinned = registry.window(
        size=WINDOW_SIZE, artifacts_dir=str(tmp_path),
        changed=R12_CHANGED, pin=R12_PIN, max_round=DERIVED_AT_ROUND,
    )
    baseline = registry.window(
        size=WINDOW_SIZE, changed=R12_CHANGED, pin=R12_PIN,
        max_round=DERIVED_AT_ROUND,
    )
    assert pinned == baseline


def test_window_contains_every_never_checked_query():
    """Invariant behind rank 0: a query with no driver row anywhere
    (as of the pinned round) must never wait outside the window."""
    import os

    latest = registry._latest_green_round(
        os.path.join(os.path.dirname(__file__), ".."),
        max_round=DERIVED_AT_ROUND,
    )
    never = [n for n in registry.QUERIES if n not in latest]
    win = set(list(registry.QUERIES)[:WINDOW_SIZE])
    missing = [n for n in never if n not in win]
    assert not missing, f"never-checked queries outside window: {missing}"


def test_r12_window_contents():
    """The round-12 membership decisions, pinned explicitly: the
    three NEW lanes lead with their riding modules (file_skipping;
    deletion_vectors whole, its merge dependency folding the COW
    quartet in first; incremental whole), the five r12-CHANGED lanes
    and the late-r11 CHANGED cohort follow (curation_extra dragging
    clustering, analytics_extra, features, sketch_rollup,
    constraints, the conversion trio), then the oldest evidence:
    reshaping riding for r7 q_percentiles and the COMPLETE r7 cohort
    (joins, nested, python_udfs). The 50-cut lands at matching's
    first query, so q_fuzzy_blocked leads the r13 remainder. After
    this window the oldest evidence anywhere is r8."""
    win = list(registry.QUERIES)[:WINDOW_SIZE]
    for must in (
        # rank 0 + riders
        "q_file_skipping_scan",
        "q_delete_positional_dv", "q_delete_merge_on_read",
        "q_merge_upsert", "q_time_travel", "q_table_diff",
        "q_vacuum_retention",
        "q_incremental_join_view", "q_incremental_rollup",
        # r12 changed
        "q_theta_set_algebra", "q_bucket_pruning", "q_retention_ttl",
        "q_setsim_prefix_join",
        # late-r11 changed cohort + riders
        "q_kmeans_assign", "q_kmeans_update",
        "q_dedup_chunks", "q_budget_select", "q_dedup_semantic",
        "q_triangle_count", "q_pareto_frontier",
        "q_histogram_equidepth", "q_session_window_builtin",
        "q_stats_mad", "q_feature_normalize", "q_embedding_quantize",
        "q_percentile_cont_exact",
        "q_hll_union_rollup", "q_constraint_audit",
        "discogs_xml_conversion", "discogs_conversion_stats",
        "discogs_explode_artists",
        # oldest evidence: reshaping rides for q_percentiles
        "q_pivot", "q_unpivot", "q_minby_maxby", "q_percentiles",
        # the complete r7 cohort
        "q_join_star_revenue", "q_join_left_outer", "q_join_semi",
        "q_join_anti", "q_join_nonequi_bands", "q_join_full_outer",
        "q_skew_salted_join",
        "q_explode_wordcount", "q_array_ops", "q_nested_collect",
        "q_pandas_udf_scalar", "q_pandas_udf_grouped_agg",
        "q_python_udtf", "q_apply_in_pandas",
        # matching begins; the cut
        "q_fuzzy_levenshtein",
    ):
        assert must in win, must
    assert win[-1] == "q_fuzzy_levenshtein"  # cut at matching's head
    for out in (
        # the matching tail -> r13 leaders
        "q_fuzzy_blocked", "q_funnel_conversion",
        "q_entity_resolution", "q_fuzzy_blocked_stats",
        # r8-green stays out
        "q_agg_approx_distinct", "q13_customer_distribution",
        "q_pagerank_bipartite",
        # deliberately-not-changed late-r11 touches stay on evidence
        # age (see R12_CHANGED comment)
        "q_compact_files", "q_compact_partitioned",
        "q_reservoir_per_group",
        # r9/r10/r11-green stays out
        "q_join_aqe_skew", "q_stream_dedup_exact", "q_zorder_layout",
        "q1_pricing_summary", "q_ann_bruteforce_topk",
        "q_profile_columns", "q_distribution_drift",
        "q_sessionize_events", "q_stats_moments", "q_scd2_merge",
        "q_dedup_exact", "q_curation_pipeline", "q_agg_rollup",
        "q_stream_merge_sink", "q_stream_restart",
        "q_schema_evolution_widening", "q_multimodal_image_decode",
        "q_quantile_histogram_rollup", "q_kll_quantile_sketch",
        "q_partition_evolution", "q_source_python_datasource",
        "q10_returned_items",
    ):
        assert out not in win, out


def test_module_deps_reflect_imports():
    """The dependency scan that lets window() fold import-dragged
    modules forward must see the known edges (ast-based since r8 --
    ADVICE r7: the old regex dropped all but the first name of a
    multi-module import) -- and must NOT see edges to the shared
    staging helpers, which live outside the queries package precisely
    so consumers don't drag a query module into the window."""
    deps = registry._module_deps()
    assert set(deps["curation_full"]) >= {"dedup", "packing", "quality"}
    assert "clustering" in deps["curation_extra"]
    assert "merge" in deps["deletion_vectors"]
    assert "merge" in deps["incremental"]
    for consumer in ("binary_source", "schema_evolution",
                     "streaming_restart", "compaction"):
        assert "runtime_filters" not in deps.get(consumer, []), consumer


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
