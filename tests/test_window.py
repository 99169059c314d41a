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
landing CORRECTNESS_r10.json cannot flip this suite; re-deriving for
r11 is one deliberate commit: bump DERIVED_AT_ROUND to 10, update
CHANGED/PIN, and paste the order printed by
`python scripts/window_plan.py --max-round 10 --changed <r11 changed>`.
"""

from __future__ import annotations

from discogs_xml_to_parquet_spark import registry

registry.load_all_queries()

WINDOW_SIZE = 50

# The round whose artifacts this derivation used (artifacts r1..r9;
# CORRECTNESS_r10.json and later are ignored by the fixed-point test).
DERIVED_AT_ROUND = 9

# Round-10 policy inputs that artifacts cannot express:
# - q_distribution_drift CHANGED: the ADVICE r9 NULLIF divisor guard
#   changed both the Spark expression and the oracle SQL the driver
#   runs (values identical on current data; latent-divergence fix).
# - q_setsim_prefix_join CHANGED: r10 verification rewrite (lossless
#   length + positional PPJoin residuals in the candidate join,
#   broadcast set tables) -- values identical, plan 5x faster at
#   sf0.1.
# - conversion PINNED: the trio's evidence is r7 and the
#   max-3-rounds-unverified freshness pin (VERDICT r5) expires at r10
#   -- a scheduling constraint older-evidence ranking alone would
#   leave at slot ~64.
# The four r10-NEW queries (q_stream_restart, q_compact_partitioned,
# q_compact_files, q_profile_columns_approx) need no entry: rank 0
# covers never-checked.
R10_CHANGED = frozenset({"q_distribution_drift", "q_setsim_prefix_join"})
R10_PIN: tuple[str, ...] = ("conversion",)


def test_import_order_is_policy_fixed_point():
    """The first 50 registered queries ARE the policy window."""
    want = registry.window(
        size=WINDOW_SIZE, changed=R10_CHANGED, pin=R10_PIN,
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
        changed=R10_CHANGED, pin=R10_PIN, max_round=DERIVED_AT_ROUND,
    )
    baseline = registry.window(
        size=WINDOW_SIZE, changed=R10_CHANGED, pin=R10_PIN,
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


def test_r10_window_contents():
    """The round-10 membership decisions, pinned explicitly: the NEW
    queries' modules lead (the checkpoint-restart lane, the two
    compaction passes, the copy-on-write MERGE, the approx profiler
    with q_profile_columns riding), the CHANGED drift monitor and
    setsim join follow, then the PINNED conversion trio (freshness pin
    expiry -- VERDICT r9 item 1), the six r5-evidence queries VERDICT
    r9 item 1 named, the ENTIRE r6 cohort, and the oldest r7 evidence
    (tpch_extra); the 50-cut lands one short of the module boundary,
    so q21_suppliers_waiting leads the r11 remainder with dedup.
    Nothing in the window has fresher evidence than r7 except the
    new/changed/riding heads."""
    win = list(registry.QUERIES)[:WINDOW_SIZE]
    for must in (
        # new + riding + changed heads
        "q_stream_restart", "q_compact_partitioned", "q_compact_files",
        "q_merge_upsert", "q_time_travel", "q_table_diff",
        "q_source_python_datasource",
        "q_hll_union_rollup", "q_constraint_audit",
        "q_profile_columns_approx", "q_profile_columns",
        "q_distribution_drift", "q_setsim_prefix_join",
        # the pinned conversion trio
        "discogs_xml_conversion", "discogs_conversion_stats",
        "discogs_explode_artists",
        # the six r5-evidence queries
        "q_sessionize_events", "q_gapfill_timeseries",
        "q_cumulative_distinct", "q_chunk_documents",
        "q_token_cooccurrence", "q_regex_extract_all",
        # r6 cohort spot checks (first/last of each family)
        "q_stats_moments", "q_histogram_fixed",
        "q_window_distribution", "q_ratio_to_report",
        "q_scd2_merge", "q_cdc_apply", "q_time_weighted_avg",
        "q_quality_classifier", "q_bpe_pair_counts",
        "q_multimodal_audio_energy", "q_decontaminate_bloom",
        "q_bm25_search", "q_source_orc_roundtrip",
        "q_reservoir_per_group",
        # oldest r7 + the cut query
        "q10_returned_items",
    ):
        assert must in win, must
    assert win[-1] == "q10_returned_items"  # cut six short of the
    # tpch_extra/dedup boundary: the six mid-round additions (merge +
    # time travel + table diff, python_datasource, sketch_rollup,
    # constraints) took the tail slots
    for out in (
        # the displaced tpch_extra tail and the r7 dedup cohort ->
        # r11 leaders
        "q14_promo_revenue", "q18_large_volume",
        "q5_local_supplier_volume", "q6_forecast_revenue",
        "q19_discounted_revenue", "q21_suppliers_waiting",
        "q_dedup_exact",
        "q_dedup_minhash_lsh", "q_dedup_components", "q_pack_sequences",
        "q_quality_repetition", "q_curation_pipeline",
        "q_agg_distinct", "q_join_star_revenue",
        # r9-green stays out
        "q_join_aqe_skew", "q_incremental_rollup",
        "q_stream_dedup_exact",
        "q_zorder_layout", "q1_pricing_summary",
        "q_ann_bruteforce_topk",
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
