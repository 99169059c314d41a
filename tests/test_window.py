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
landing CORRECTNESS_r09.json cannot flip this suite; re-deriving for
r10 is one deliberate commit: bump DERIVED_AT_ROUND to 9, update
CHANGED, and paste the order printed by
`python scripts/window_plan.py --max-round 9 --changed <r10 changed>`.
"""

from __future__ import annotations

from discogs_xml_to_parquet_spark import registry

registry.load_all_queries()

WINDOW_SIZE = 50

# The round whose artifacts this derivation used (artifacts r1..r8;
# CORRECTNESS_r09.json and later are ignored by the fixed-point test).
DERIVED_AT_ROUND = 8

# Round-9 policy inputs that artifacts cannot express: queries whose
# code changed after their last green driver row.
# - q_zorder_layout: rewritten AFTER the r8 window locked (Morton
#   magic-number bit spread, commit 3969229; values identical).
# - q_stream_dedup_exact / q_stream_cdc_state: r9 drain hardening
#   (ADVICE r8 -- awaitTermination timeout raises, stale sinks
#   stopped, watermark horizon derived from the corpus span).
# - q_join_bloom_dpp: r9 staged-fact cache fix (ADVICE r8 -- source
#   fingerprint in the cache key, atomic publish).
# The twelve r9-NEW queries (q_join_aqe_skew, q_join_bucketed,
# q_incremental_rollup, q_source_binaryfile, q_schema_evolution_scan,
# q_distribution_drift, q_setsim_prefix_join, tpch_extra3 trio,
# q_stream_join_attrib, q_stream_static_enrich) need no entry: rank 0
# covers never-checked.
R9_CHANGED = frozenset({
    "q_zorder_layout",
    "q_stream_dedup_exact",
    "q_stream_cdc_state",
    "q_join_bloom_dpp",
})
R9_PIN: tuple[str, ...] = ()


def test_import_order_is_policy_fixed_point():
    """The first 50 registered queries ARE the policy window."""
    want = registry.window(
        size=WINDOW_SIZE, changed=R9_CHANGED, pin=R9_PIN,
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
        changed=R9_CHANGED, max_round=DERIVED_AT_ROUND,
    )
    baseline = registry.window(
        size=WINDOW_SIZE, changed=R9_CHANGED,
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


def test_r9_window_contents():
    """The round-9 membership decisions, pinned explicitly: the twelve
    NEW queries' modules lead (rank 0: AQE skew, the bucketed join,
    the IVM rollup, the binaryFile ingest, the mergeSchema scan, the
    drift monitor, the exact-Jaccard prefix join, the tpch_extra3
    trio, the stream-stream join, the stream-static enrich),
    the four CHANGED queries follow with their modules, then the
    ENTIRE r4 tail (text_analysis, windows, subqueries,
    semistructured -- VERDICT r8 item 2) and the r5 cohort
    (relational, scalars, similarity incl. the manually-registered
    bruteforce query, timeseries, text_extra); the cut lands
    ON the similarity/timeseries boundary after
    q_ann_bruteforce_topk. After this window nothing has evidence
    older than r5 (the r5 leftover modules, timeseries and
    text_extra, lead round 10)."""
    win = list(registry.QUERIES)[:WINDOW_SIZE]
    for must in (
        "q_join_aqe_skew", "q_join_bucketed", "q_incremental_rollup",
        "q_source_binaryfile", "q_schema_evolution_scan",
        "q_distribution_drift", "q_setsim_prefix_join",
        "q4_order_priority", "q8_market_share", "q12_priority_class",
        "q_stream_join_attrib", "q_stream_static_enrich",
        *sorted(R9_CHANGED),
        # the 15 r4-evidence queries, retired whole
        "q_text_quality", "q_text_langid", "q_text_token_regex",
        "q_text_fingerprint", "q_text_rolling_winnow",
        "q_text_langid_ngram",
        "q_window_topk_per_group", "q_window_running",
        "q_window_range_frame", "q_window_rank_dense",
        "q_subquery_scalar", "q_subquery_correlated", "q_subquery_in",
        "q_map_funcs", "q_json_struct",
        # the r5 cohort (all but the text_extra leftovers)
        "q1_pricing_summary", "q_string_funcs", "q_ann_lsh_buckets",
        "q_ann_bruteforce_topk",
    ):
        assert must in win, must
    assert win[-1] == "q_ann_bruteforce_topk"  # module-boundary cut
    for out in ("q_sessionize_events",  # r5 leftovers -> r10 lead
                "q_gapfill_timeseries",
                "q_cumulative_distinct",
                "q_chunk_documents",
                "q_token_cooccurrence",
                "q_regex_extract_all",
                "q_stats_moments",
                "q_ntile_bucketing", "q_mode_per_group",
                "q_histogram_fixed",
                "q_window_distribution", "q_ratio_to_report",
                "q_scd2_merge", "q_cdc_apply",
                "q_dedup_exact", "discogs_xml_conversion",
                "q_fuzzy_blocked", "q13_customer_distribution",
                "q_stats_mad", "q_pagerank_bipartite"):
        assert out not in win, out
    # q_text_stats (r8) rides with its module -- in-window by design
    assert "q_text_stats" in win


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
