"""Query modules; importing this package registers every named query.

Import order IS driver-check order (the registry dict preserves
insertion order and the driver checks the first 50 registered queries
-- r01-r05 all cut at exactly 50). Rotation policy: queries with no
CORRECTNESS row anywhere go first, then fixed/changed queries, then
the module whose passing evidence is oldest.

Round-6 window (the first 50) -- executes the rotation planned in r5
(VERDICT r5 "next round" item 1): ALL 32 queries that have never had a
driver CORRECTNESS row, plus 18 refresh slots:

- 1-4: stats_extra -- q_mode_per_group and q_histogram_fixed are NEW
  (no row anywhere); q_stats_moments CHANGED this round (per-row
  bigint-lane rewrite closing the r5 [1.5 s, 28 s] bench spread) so
  its re-check is load-bearing, and q_ntile_bucketing rides along;
- 5-18: the six zero-evidence families the r5 verdict called out:
  windows_extra (q_window_distribution, q_ratio_to_report -- the
  ratio oracle CHANGED this round, ADVICE r5 overflow widening), scd
  (q_scd2_merge), graph_iter (q_pagerank_bipartite,
  q_label_propagation), curation_extra (q_dedup_chunks,
  q_budget_select, q_dedup_semantic), analytics_extra
  (q_triangle_count, q_pareto_frontier, q_histogram_equidepth,
  q_session_window_builtin), features (q_stats_mad,
  q_feature_normalize);
- 19-30: the rest of the NEW block: features cont. (
  q_embedding_quantize, q_percentile_cont_exact), cdc (q_cdc_apply,
  q_attribution_last_touch -- oracle tiebreak CHANGED this round,
  ADVICE r5 -- q_time_weighted_avg), layout (q_zorder_layout),
  quality_model (q_quality_classifier, q_quality_rare_bigrams),
  vocab (q_bpe_pair_counts), profiling (q_profile_columns),
  multimodal_audio (q_multimodal_audio_energy);
- 31-42: modules whose NEW member drags r3/r4 refreshes in with it:
  decontam (q_decontaminate_bloom NEW + q_decontaminate_ngram r3),
  scoring (q_inverted_index NEW + tfidf/bm25 r3), formats_extra
  (q_source_text_roundtrip NEW + orc/csv-permissive r4), sampling
  (q_train_test_split + q_reservoir_per_group NEW + stratified/
  weighted/shuffle r4);
- 45-48: matching -- q_fuzzy_blocked and q_entity_resolution CHANGED
  this round (the two blocking passes fused into one window + one
  self-join with disjoint band_no ranges; candidate set provably
  identical, but changed queries outrank stale refreshes per the
  policy), with q_fuzzy_levenshtein / q_funnel_conversion riding;
- 49-50: the first two aggregates entries (q_agg_distinct,
  q_agg_rollup r3 -- rollup also had the only nominal r5 bench
  regression, so its re-check is timely; the cut lands mid-module,
  cube/grouping-sets go to r7). clustering (kmeans assign/update r3)
  rides at positions 10-11 via curation_extra's import dependency
  (SemDeDup shares the kmeans fragments), so its refresh is in-window
  too.

q_curation_pipeline also changed this round (exact-dup edges dropped
from the CC input) but sits outside the window: pulling curation_full
in would drag its import-dependency modules dedup/packing/quality (14
r5-green queries) through the cut; its equivalence is pinned instead
by tests/test_round_fusions.py plus a local sf0.01 driver-parity
compare, and it re-checks with its dependency group in r7.

After this window every query registered before round 6 has driver
evidence. Left for round 7, leaders first: the two NEW r6 additions
q5_local_supplier_volume / q6_forecast_revenue /
q19_discounted_revenue (tpch_extra; locally
oracle-green at sf0.001+sf0.01, no driver row yet), curation_full +
dedup/packing/quality (capstone changed in r6), aggregates'
cube/grouping-sets and
formats (displaced by the changed-query rule), the remaining r3-green
modules (reshaping, joins, nested, python_udfs, pipeline, ranges --
four rounds old by r7), then the conversion trio (r4; VERDICT r5 item
6 asks for its re-check in r7 so the namesake surface never exceeds
three rounds unverified), then the other r4-green modules, then
everything r5/r6-green.

r7 slot math at module granularity: tpch_extra(6: 3 NEW + 3 r5
riders) + curation_full group(15) + aggregates(4) + formats(2) +
reshaping(4) + joins(7) + nested(3) + python_udfs(4) + pipeline(4)
+ ranges(3) + conversion(3) = 55 -- five over; the natural cut
drops conversion's 3 plus 2 more to r8, OR ranges(3)+nested's tail;
r7's builder should prefer keeping conversion IN (the VERDICT r5
item-6 ask) and push pipeline or ranges instead.
"""

from discogs_xml_to_parquet_spark.queries import (  # noqa: F401
    # 1-4: NEW members + the bigint-lane moments rewrite (re-check)
    stats_extra,
    # 5-30: the 32 never-driver-checked queries (six whole families)
    windows_extra,
    scd,
    graph_iter,
    curation_extra,
    analytics_extra,
    features,
    cdc,
    layout,
    quality_model,
    vocab,
    profiling,
    multimodal_audio,
    # 31-42: NEW members riding with their module's r3/r4 refreshes
    decontam,
    scoring,
    formats_extra,
    sampling,
    # 43-46: changed this round (blocking-pass fusion)
    matching,
    # 47-50: r3-stale refresh picks; the cut lands after aggregates'
    # second entry (q_agg_rollup)
    clustering,
    aggregates,
    # --- 50-query window cut (mid-aggregates) ---
    formats,
    # r3-green leftovers: first in line for round 7
    reshaping,
    joins,
    nested,
    python_udfs,
    pipeline,
    ranges,
    # conversion trio (r4): scheduled for the r7 window per VERDICT r5
    conversion,
    # r4-green
    cohorts,
    setops,
    temporal,
    text_analysis,
    windows,
    subqueries,
    semistructured,
    # r5-green (freshest evidence, rotated out of the window)
    dedup,
    packing,
    quality,
    curation_full,
    relational,
    scalars,
    tpch_extra,
    streaming_queries,
    similarity,
)
from discogs_xml_to_parquet_spark.registry import query as _query

# q_ann_bruteforce_topk is registered manually (demoted from the
# similarity module in r3); r5-green, so it sits outside the window.
_query("q_ann_bruteforce_topk", oracle=similarity.BRUTEFORCE_ORACLE)(
    similarity.q_ann_bruteforce_topk
)

from discogs_xml_to_parquet_spark.queries import (  # noqa: E402,F401
    timeseries,
    text_extra,
    sketches,
)
