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
landing CORRECTNESS_r13.json cannot flip this suite; re-deriving for
r14 is one deliberate commit: bump DERIVED_AT_ROUND to 13, update
CHANGED/PIN, and paste the order printed by
`python scripts/window_plan.py --max-round 13 --changed <r14 changed>`.
"""

from __future__ import annotations

from discogs_xml_to_parquet_spark import registry

registry.load_all_queries()

WINDOW_SIZE = 50

# The round whose artifacts this derivation used (artifacts r1..r12;
# CORRECTNESS_r13.json and later are ignored by the fixed-point test).
DERIVED_AT_ROUND = 12

# Round-13 policy inputs that artifacts cannot express -- queries whose
# code changed since their LAST green driver row:
# - late-r12 changes (commits 5c2117b + 80458ce, landed after the r12
#   driver check): q_file_skipping_scan (non-empty-manifest guard),
#   q_retention_ttl (EXDEV-safe hardlink clone), and the staged-lane
#   cohort reworked onto staging.stage_df with the reliable-checkpoint
#   production mode -- setsim, incremental (both queries), matching
#   (all five), graph_iter (both; also the partition-aware PageRank
#   edge staging, VERDICT r12 item 2).
# - r13 in-round changes: q_setsim_prefix_join again (byte-gated
#   broadcasts, VERDICT r12 item 3) and the four true-readStream
#   lanes (memory sinks -> checkpointed file sinks, VERDICT r12
#   item 6): q_stream_dedup_exact, q_stream_cdc_state,
#   q_stream_join_attrib, q_stream_static_enrich.
# The four q_stream_* batch faces in the same module are NOT changed
# (their code is untouched); they ride the module fold.
# q_lakehouse_read_path (NEW r13) needs no entry: rank 0 covers
# never-checked.
# NOTE for the r14 derivation: the late-r13 operators/graph.py
# staging migration (raw localCheckpoint -> staging.stage_df, value-
# identical by construction and pinned both-modes in
# test_staging_modes.py) touches the connected-components consumers
# -- the dedup/curation group lanes (q_dedup_minhash_lsh,
# q_dedup_simhash_banded, q_dedup_semantic, q_curation_pipeline,
# q_entity_resolution) -- add them to R14_CHANGED when bumping
# DERIVED_AT_ROUND (the matching/graph_iter members are already in
# this round's set and the rest did not fit the r13 window anyway).
R13_CHANGED = frozenset({
    "q_file_skipping_scan", "q_retention_ttl",
    "q_setsim_prefix_join",
    "q_incremental_rollup", "q_incremental_join_view",
    "q_fuzzy_levenshtein", "q_fuzzy_blocked", "q_funnel_conversion",
    "q_entity_resolution", "q_fuzzy_blocked_stats",
    "q_pagerank_bipartite", "q_label_propagation",
    "q_stream_dedup_exact", "q_stream_cdc_state",
    "q_stream_join_attrib", "q_stream_static_enrich",
})
R13_PIN: tuple[str, ...] = ()


def test_import_order_is_policy_fixed_point():
    """The first 50 registered queries ARE the policy window."""
    want = registry.window(
        size=WINDOW_SIZE, changed=R13_CHANGED, pin=R13_PIN,
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
        changed=R13_CHANGED, pin=R13_PIN, max_round=DERIVED_AT_ROUND,
    )
    baseline = registry.window(
        size=WINDOW_SIZE, changed=R13_CHANGED, pin=R13_PIN,
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


def test_r13_window_contents():
    """The round-13 membership decisions, pinned explicitly: the
    rank-0 arrivals lead (q_bpe_encode -- the late-r13 tokenizer
    APPLY lane -- the composed-lakehouse lane, then matching, whose
    late-r13 member q_fuzzy_blocked_sampled pulls the module into
    rank 0), the late-r12/r13
    CHANGED cohort follows with its dependency folds (incremental
    dragging the COW merge quartet in first), and the ENTIRE 28-query
    r8-evidence cohort re-verifies -- matching's and graph_iter's
    tails, the sketches, TPC-H q13/q17/q7/q22/q15, the pipeline and
    range-join families, cohorts, setops, asof + the multimodal
    trio. The 50-cut lands inside runtime_filters' r9 trio: aqe_skew
    q_join_aqe_skew rides in at the cut; q_join_bucketed and
    q_join_bloom_dpp are the two r9-evidence queries the late-r13
    arrivals (q_bpe_encode, q_fuzzy_blocked_sampled) displaced past
    it -- they lead the r14 derivation instead. After this window the
    oldest evidence anywhere is r9."""
    win = list(registry.QUERIES)[:WINDOW_SIZE]
    for must in (
        # rank 0
        "q_bpe_encode",
        "q_lakehouse_read_path",
        # changed + dependency folds
        "q_file_skipping_scan",
        "q_merge_upsert", "q_time_travel", "q_table_diff",
        "q_vacuum_retention",
        "q_incremental_rollup", "q_incremental_join_view",
        "q_retention_ttl", "q_setsim_prefix_join",
        "q_fuzzy_levenshtein",
        # the late-r13 sampled-blocking twin rides with matching
        "q_fuzzy_blocked_sampled",
        # the 28-query r8 cohort
        "q_fuzzy_blocked", "q_funnel_conversion",
        "q_entity_resolution", "q_fuzzy_blocked_stats",
        "q_pagerank_bipartite", "q_label_propagation",
        "q_agg_approx_distinct", "q_percentiles_approx",
        "q_freq_items_cms",
        "q13_customer_distribution", "q17_small_qty_revenue",
        "q7_volume_shipping", "q22_idle_balance", "q15_top_supplier",
        "q_pii_redact", "q_sample_hash", "q_dedup_span_shingles",
        "q_rollup_reuse_hourly_daily",
        "q_range_join_events", "q_interval_overlap",
        "q_range_join_bucketed",
        "q_cohort_retention",
        "q_setops_nations", "q_setops_multiset",
        "q_asof_join", "q_multimodal_features", "q_multimodal_resize",
        "q_multimodal_frames",
        # the changed streaming lanes + their riding batch faces
        "q_stream_dedup_exact", "q_stream_cdc_state",
        "q_stream_join_attrib", "q_stream_static_enrich",
        "q_stream_tumbling", "q_stream_session", "q_stream_sliding",
        "q_stream_dedup_face",
        # the r9 tail that fills the window
        "q_join_aqe_skew",
    ):
        assert must in win, must
    assert win[0] == "q_bpe_encode"
    assert win[1] == "q_lakehouse_read_path"
    assert win[-1] == "q_join_aqe_skew"  # cut inside runtime_filters
    for out in (
        # the two r9-evidence queries the late-r13 arrivals displaced
        # past the cut (they lead r14)
        "q_join_bloom_dpp", "q_join_bucketed",
        # r12-green stays out (freshest evidence)
        "q_delete_positional_dv", "q_delete_merge_on_read",
        "q_theta_set_algebra", "q_bucket_pruning", "q_nested_collect",
        "q_join_semi", "q_pandas_udf_scalar", "q_pivot",
        "q_hll_union_rollup", "q_constraint_audit",
        "discogs_xml_conversion", "q_stats_mad", "q_budget_select",
        # r9-green stays out past the cut
        "q_source_binaryfile", "q4_order_priority", "q_zorder_layout",
        "q_text_stats", "q_window_topk_per_group",
        "q1_pricing_summary", "q_ann_bruteforce_topk",
        # r10/r11-green stays out
        "q_profile_columns", "q_distribution_drift",
        "q_sessionize_events", "q_scd2_merge", "q_dedup_exact",
        "q_curation_pipeline", "q_stream_merge_sink",
        "q_stream_restart", "q_schema_evolution_widening",
        "q_multimodal_image_decode", "q_partition_evolution",
        "q_source_python_datasource", "q10_returned_items",
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
