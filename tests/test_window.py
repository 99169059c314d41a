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
landing CORRECTNESS_r14.json cannot flip this suite; re-deriving for
r15 is one deliberate commit: bump DERIVED_AT_ROUND to 14, update
CHANGED/PIN, and paste the order printed by
`python scripts/window_plan.py --max-round 14 --changed <r15 changed>`.
"""

from __future__ import annotations

from discogs_xml_to_parquet_spark import registry

registry.load_all_queries()

WINDOW_SIZE = 50

# The round whose artifacts this derivation used (artifacts r1..r13;
# CORRECTNESS_r14.json and later are ignored by the fixed-point test).
DERIVED_AT_ROUND = 13

# Round-14 policy inputs that artifacts cannot express -- queries whose
# code changed since their LAST green driver row: the late-r13
# operators/graph.py staging migration (raw localCheckpoint ->
# staging.stage_df, value-identical by construction and pinned
# both-modes in test_staging_modes.py) touches the connected-
# components consumers. The matching/graph_iter CC consumers were
# driver-checked AFTER that commit landed (they sat in the r13
# window), so only the dedup/curation group lanes -- whose last green
# row predates the migration -- carry a CHANGED mark. The last three
# entries are r14 IN-ROUND rewrites of r13-green queries: the
# interned-token setsim verification, the pre-divided PageRank rank
# vector, and planned_read's planned-file-list return (the lakehouse
# helper the new snapshot_read lane composes):
R14_CHANGED = frozenset({
    "q_dedup_minhash_lsh", "q_dedup_simhash_banded",
    "q_dedup_semantic", "q_curation_pipeline",
    "q_entity_resolution",
    "q_setsim_prefix_join", "q_pagerank_bipartite",
    "q_lakehouse_read_path",
})
R14_PIN: tuple[str, ...] = ()


def test_import_order_is_policy_fixed_point():
    """The first 50 registered queries ARE the policy window."""
    want = registry.window(
        size=WINDOW_SIZE, changed=R14_CHANGED, pin=R14_PIN,
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
        changed=R14_CHANGED, pin=R14_PIN, max_round=DERIVED_AT_ROUND,
    )
    baseline = registry.window(
        size=WINDOW_SIZE, changed=R14_CHANGED, pin=R14_PIN,
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


def test_r14_window_contents():
    """The round-14 membership decisions, pinned explicitly: the
    rank-0 arrival leads (q_snapshot_read -- the composed snapshot
    read -- with its changed lakehouse import folding in first), then
    matching (its CHANGED member q_entity_resolution pulls the module
    up), the dedup/curation CHANGED cohort with its dependency folds,
    the two in-round rewrites (setsim, graph_iter), runtime_filters
    -- whose q_join_bucketed + q_join_bloom_dpp are the two
    r9-evidence queries the late-r13 arrivals displaced -- and the
    r9-evidence cohort: binary_source, tpch_extra3, layout, the full
    text_analysis seven, and windows closing the cut at exactly 50.
    After this window the r9-evidence set shrinks from 37 to 18
    (subqueries, semistructured, relational, scalars, similarity
    lead r15)."""
    win = list(registry.QUERIES)[:WINDOW_SIZE]
    for must in (
        # rank 0 + its changed dep; packing's rank-0 arrival
        "q_snapshot_read", "q_lakehouse_read_path",
        "q_pack_greedy",
        # matching: CHANGED member + riding siblings
        "q_entity_resolution", "q_fuzzy_levenshtein", "q_fuzzy_blocked",
        "q_fuzzy_blocked_sampled", "q_funnel_conversion",
        "q_fuzzy_blocked_stats",
        # dedup: CHANGED members + r11 tail
        "q_dedup_minhash_lsh", "q_dedup_simhash_banded",
        "q_dedup_exact", "q_dedup_components", "q_dedup_containment",
        # the curation_full dependency fold
        "q_pack_sequences", "q_quality_repetition",
        "q_quality_gopher_filter", "q_curation_pipeline",
        # curation_extra CHANGED member + its clustering dep
        "q_dedup_semantic", "q_kmeans_assign", "q_kmeans_update",
        "q_dedup_chunks", "q_budget_select",
        # the in-round rewrites re-verify
        "q_setsim_prefix_join", "q_pagerank_bipartite",
        "q_label_propagation",
        # the displaced r9 leads + their riding sibling
        "q_join_bucketed", "q_join_bloom_dpp", "q_join_aqe_skew",
        # the r9-evidence cohort
        "q_source_binaryfile",
        "q4_order_priority", "q8_market_share", "q12_priority_class",
        "q_zorder_layout",
        "q_text_stats", "q_text_quality", "q_text_langid",
        "q_text_token_regex", "q_text_fingerprint",
        "q_text_rolling_winnow", "q_text_langid_ngram",
        "q_window_topk_per_group", "q_window_running",
        "q_window_range_frame",
    ):
        assert must in win, must
    assert win[0] == "q_lakehouse_read_path"  # snapshot_read's dep
    assert win[1] == "q_snapshot_read"        # the rank-0 arrival
    assert win[-1] == "q_window_range_frame"  # cut inside windows
    for out in (
        # r9-green past the cut: first in line for r15
        "q_window_rank_dense",
        "q_subquery_scalar", "q_subquery_correlated", "q_subquery_in",
        "q_map_funcs", "q_json_struct",
        "q1_pricing_summary", "q_filter_project", "q_string_funcs",
        "q_ann_bruteforce_topk", "q_ann_lsh_buckets",
        # r13-green stays out (freshest evidence)
        "q_bpe_encode", "q_file_skipping_scan",
        "q_merge_upsert", "q_incremental_rollup", "q_retention_ttl",
        "q_stream_dedup_exact", "q_agg_approx_distinct",
        "q13_customer_distribution", "q_asof_join", "q_cohort_retention",
        "q_setops_nations", "q_multimodal_features", "q_pii_redact",
        "q_range_join_events",
        # r10/r11/r12-green stays out
        "q_profile_columns", "q_distribution_drift",
        "q_sessionize_events", "q_scd2_merge", "q_stream_merge_sink",
        "q_stream_restart", "q_schema_evolution_widening",
        "q_multimodal_image_decode", "q_partition_evolution",
        "q_source_python_datasource", "q10_returned_items",
        "q_delete_positional_dv", "q_theta_set_algebra",
        "q_bucket_pruning", "q_nested_collect", "q_join_semi",
        "q_pandas_udf_scalar", "q_pivot", "q_hll_union_rollup",
        "q_constraint_audit", "discogs_xml_conversion", "q_stats_mad",
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
