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
landing CORRECTNESS_r11.json cannot flip this suite; re-deriving for
r12 is one deliberate commit: bump DERIVED_AT_ROUND to 11, update
CHANGED/PIN, and paste the order printed by
`python scripts/window_plan.py --max-round 11 --changed <r12 changed>`.
"""

from __future__ import annotations

from discogs_xml_to_parquet_spark import registry

registry.load_all_queries()

WINDOW_SIZE = 50

# The round whose artifacts this derivation used (artifacts r1..r10;
# CORRECTNESS_r11.json and later are ignored by the fixed-point test).
DERIVED_AT_ROUND = 10

# Round-11 policy inputs that artifacts cannot express:
# - q_setsim_prefix_join CHANGED: the r11 distinct-token-set collapse
#   rewrote candidate generation (values identical, hash re-pinned
#   locally at sf0.001/sf0.01; ~9x faster at sf0.1, 3.7-4.6x-for-10x).
# - q_source_python_datasource CHANGED: the stream reader's offsets
#   became filename SETS (ADVICE r10 backfill fix) -- the registered
#   connector the driver query reads through changed.
# The twelve r11-NEW queries (q_vacuum_retention,
# q_schema_evolution_widening, q_schema_evolution_rename,
# q_multimodal_image_decode, q_delete_merge_on_read,
# q_quantile_histogram_rollup, q_theta_set_algebra,
# q_kll_quantile_sketch, q_partition_evolution, q_bucket_pruning,
# q_stream_merge_sink, q_retention_ttl) need no entry: rank 0 covers
# never-checked, and their modules (merge, schema_evolution,
# multimodal_image, deletion_vectors, quantile_rollup, theta_sets,
# kll_quantiles, partition_evolution, bucket_pruning,
# streaming_merge -- dragging r10's streaming_restart forward via
# the dependency fold -- and ttl) ride forward whole. No pins: the
# conversion trio's evidence is r10, fresh until r13 under the
# max-3-rounds-unverified guarantee.
R11_CHANGED = frozenset(
    {"q_setsim_prefix_join", "q_source_python_datasource"})
R11_PIN: tuple[str, ...] = ()

# Already-known CHANGED candidates for the r12 derivation (late-r11
# review fixes to lanes OUTSIDE the r11 window -- values identical,
# re-verified locally at sf0.01, but plans/oracles/parsers changed):
# q_constraint_audit (distinct-dim FK fold, engine + oracle),
# q_hll_union_rollup (one-scan exact reference, column rename),
# q_compact_files / q_compact_partitioned (reused work dirs),
# q_stream_restart (in-lane WAL byte-identity guard, work dir),
# the conversion trio discogs_xml_conversion/_stats/_explode_artists
# (strict-parser conformance fixes: empty master_id skip, attributed
# empty unknown tags, empty genre/style and non-empty label
# rejection, empty-listing guard), q_reservoir_per_group (canonical
# _doc_hash reuse -- identical expression), and the
# operators/prefix.py consumers in matching/curation_extra/
# analytics_extra/features (running_sum null-carry fix +
# value_at_ranks left join -- latent-contract fixes, plans changed).
# The dedup-module fixes (simhash null guards, shared shingle
# candidate stage) land on queries already IN the r11 window, so they
# get fresh r11 evidence without a derivation change.


def test_import_order_is_policy_fixed_point():
    """The first 50 registered queries ARE the policy window."""
    want = registry.window(
        size=WINDOW_SIZE, changed=R11_CHANGED, pin=R11_PIN,
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
        changed=R11_CHANGED, pin=R11_PIN, max_round=DERIVED_AT_ROUND,
    )
    baseline = registry.window(
        size=WINDOW_SIZE, changed=R11_CHANGED, pin=R11_PIN,
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


def test_r11_window_contents():
    """The round-11 membership decisions, pinned explicitly: the
    twelve NEW lanes lead with their riding modules (merge whole --
    VACUUM retention plus the r10 trio re-checking the ADVICE guards;
    schema_evolution whole -- widening + rename plus the r9 scan;
    the MOR deletion-vector, histogram-rollup, theta-set-algebra,
    KLL-quantile, partition-spec-evolution, and bucket-pruning
    modules; the transactional streaming-MERGE sink, whose import
    drags r10's q_stream_restart forward to ride; and the TTL
    enforcement lane), the CHANGED connector and setsim join follow,
    then the oldest evidence: tpch_extra's six r7 queries (q10
    rides) and the r7 cohort through reshaping. The 50-cut lands
    mid-reshaping after q_minby_maxby, so q_percentiles leads the
    r12 remainder with joins, nested, and python_udfs.
    Nothing in the window has evidence fresher than r7 except the
    new/changed/riding heads."""
    win = list(registry.QUERIES)[:WINDOW_SIZE]
    for must in (
        # new + riding + changed heads
        "q_vacuum_retention", "q_merge_upsert", "q_time_travel",
        "q_table_diff",
        "q_schema_evolution_widening", "q_schema_evolution_rename",
        "q_schema_evolution_scan",
        "q_multimodal_image_decode",
        "q_delete_merge_on_read", "q_quantile_histogram_rollup",
        "q_theta_set_algebra", "q_kll_quantile_sketch",
        "q_partition_evolution", "q_bucket_pruning",
        "q_stream_merge_sink", "q_stream_restart", "q_retention_ttl",
        "q_source_python_datasource", "q_setsim_prefix_join",
        # oldest evidence: tpch_extra (q10 r10 rides at module head)
        "q10_returned_items", "q14_promo_revenue", "q18_large_volume",
        "q5_local_supplier_volume", "q6_forecast_revenue",
        "q19_discounted_revenue", "q21_suppliers_waiting",
        # the r7 cohort (first/last of each family)
        "q_dedup_exact", "q_dedup_containment",
        "q_pack_sequences",
        "q_quality_repetition", "q_quality_gopher_filter",
        "q_curation_pipeline",
        "q_agg_distinct", "q_agg_grouping_sets",
        "q_source_csv_roundtrip", "q_source_json_roundtrip",
        "q_pivot", "q_unpivot", "q_minby_maxby",
    ):
        assert must in win, must
    assert win[-1] == "q_minby_maxby"  # cut mid-reshaping
    for out in (
        # the r7 remainder -> r12 leaders
        "q_percentiles",
        "q_join_star_revenue", "q_join_left_outer",
        "q_join_semi", "q_join_anti", "q_join_nonequi_bands",
        "q_join_full_outer",
        "q_skew_salted_join", "q_explode_wordcount", "q_array_ops",
        "q_nested_collect",
        "q_pandas_udf_scalar", "q_apply_in_pandas",
        # r8-green stays out
        "q_fuzzy_blocked", "q_pagerank_bipartite", "q_stats_mad",
        # r9-green stays out
        "q_join_aqe_skew", "q_incremental_rollup",
        "q_stream_dedup_exact", "q_zorder_layout",
        "q1_pricing_summary", "q_ann_bruteforce_topk",
        # r10-green rotated out (q_stream_restart is NOT here: the
        # streaming_merge dependency fold pulled it into the window)
        "q_compact_files", "q_hll_union_rollup",
        "q_constraint_audit", "q_profile_columns",
        "q_distribution_drift", "discogs_xml_conversion",
        "q_sessionize_events", "q_stats_moments", "q_scd2_merge",
        "q_reservoir_per_group",
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
