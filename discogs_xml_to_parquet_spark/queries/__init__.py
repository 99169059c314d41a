"""Query modules; importing this package registers every named query.

Import order IS driver-check order (the registry dict preserves
insertion order and the driver checks the first 50 registered queries
-- r01-r07 all cut at exactly 50). Rotation policy: queries with no
CORRECTNESS row anywhere go first, then fixed/changed queries, then
the module whose passing evidence is oldest.

The policy is CODE, not prose: registry.window() derives this order
from the CORRECTNESS_r*.json artifacts (VERDICT r6 item 6), and
tests/test_window.py pins that the first 50 imports below agree with
it -- a new artifact or query that changes the policy answer breaks
that test and forces this list to be re-derived
(`python scripts/window_plan.py` prints the ready-to-paste order).

Round-8 window (the first 50), derived by window(changed=R8_CHANGED)
with R8_CHANGED = the 10 queries the r7 perf sweep rewrote AFTER the
r7 window locked (plan-level changes, oracles unchanged; evidence
until now local sf0.001+sf0.01 oracle compares + scripts/sf1_verify.py
hash checks at the 10x corpus). Ten queries are NEW in r8 --
q_stream_dedup_exact and q_stream_cdc_state (the watermark-dedup twin
and the applyInPandasWithState CDC lane driving the TRUE readStream
paths, VERDICT r7 item 7 -- both with full hash oracles, stronger
than the rows-only ask), q_fuzzy_blocked_stats (the aggregate output
contract for output-bound fuzzy blocking, item 6), q_join_bloom_dpp
(runtime bloom filter + dynamic partition pruning showcase, item 8),
q_freq_items_cms (count-min-sketch heavy hitters built as plain
DataFrame ops, completing the sketch trio), and the tpch_extra2 five
(Q13 outer-join count distribution, Q17 correlated-avg decorrelated
to one partitioned window, Q7 dual-role dimension join, Q22 scalar
aggregate subquery + anti-join with an exact-integer avg compare,
Q15 aggregate -> scalar-max -> exact-equality join-back) --
and rank 0 (never-checked) pulls their modules to the head of the
window, exactly the "never-checked first" invariant:

- 1-6: streaming_queries (q_stream_dedup_exact / q_stream_cdc_state
  NEW; the four r5 batch faces ride);
- 7-11: matching (q_fuzzy_blocked_stats NEW; the four r6 queries
  ride);
- 12: runtime_filters (q_join_bloom_dpp NEW);
- 13-15: sketches (approx_distinct / percentiles_approx CHANGED in
  the r7 perf sweep; q_freq_items_cms NEW);
- 16-20: tpch_extra2 (all five NEW);
- 21-24: graph_iter (pagerank CHANGED) + clustering (dragged forward
  as curation_extra's import dependency);
- 25-27: curation_extra (budget_select / dedup_semantic CHANGED);
- 28-31: analytics_extra (triangle / pareto / histogram CHANGED);
- 32-35: features (mad / percentile_cont CHANGED);
- 36-42: the r3-evidence leftovers -- pipeline's tail (q_sample_hash,
  q_dedup_span_shingles, q_rollup_reuse_hourly_daily; q_pii_redact
  rides, r7) and ranges -- slipped from r7 exactly as that round's
  plan promised;
- 43-50: the r4-evidence burn-down, oldest first: cohorts, setops,
  temporal (asof + multimodal), and text_analysis -- the cut lands
  mid-text_analysis after its 1st query (q_text_stats, slot 50;
  its last six slip to r9, the cost of tpch_extra2 entering at
  rank 0).

After this window the remaining r4 evidence is 15 queries (the six
text_analysis slips, windows, subqueries, semistructured) and r5 is
20 (relational, scalars, similarity incl. the manually-registered
bruteforce query, timeseries, text_extra). Two-round retirement
schedule (VERDICT r7 item 5): the r9 window takes all 35 of those
plus the oldest r6 modules in the order below -- r9 then ends with
nothing older than r6.

R9_CHANGED note: q_zorder_layout was rewritten AFTER the r8 window
locked (magic-number Morton spread replacing the HOF fold, 6.4x at
sf0.1; values identical, both-SF oracle compares local) -- it must
be in the r9 changed set so its driver row refreshes.
"""

from discogs_xml_to_parquet_spark.queries import (  # noqa: F401
    # 1-6: q_stream_dedup_exact + q_stream_cdc_state NEW (true
    # readStream paths); the four batch faces ride
    streaming_queries,
    # 7-11: q_fuzzy_blocked_stats NEW (aggregate fuzzy contract)
    matching,
    # 12: q_join_bloom_dpp NEW (runtime bloom + DPP showcase)
    runtime_filters,
    # 13-15: sketches (two r7-sweep CHANGED + q_freq_items_cms NEW)
    sketches,
    # 16-20: tpch_extra2 NEW (Q13/Q17/Q7/Q22/Q15 optimizer shapes)
    tpch_extra2,
    # 21-24: graph_iter (pagerank CHANGED) + clustering
    # (curation_extra import dependency, folded forward)
    graph_iter,
    clustering,
    # 25-27: curation_extra (budget_select / dedup_semantic CHANGED)
    curation_extra,
    # 28-31: analytics_extra (triangle / pareto / histogram CHANGED)
    analytics_extra,
    # 32-35: features (mad / percentile_cont CHANGED)
    features,
    # 36-42: the r3-evidence leftovers -- pipeline tail + ranges
    pipeline,
    ranges,
    # 43-50: r4-evidence burn-down; the cut lands mid-text_analysis
    # after q_text_stats (its last six queries slip to r9)
    cohorts,
    setops,
    temporal,
    text_analysis,
    # --- 50-query window cut (mid-text_analysis) ---
    # r4-green leftovers: first in line for round 9
    windows,
    subqueries,
    semistructured,
    # r5-green
    relational,
    scalars,
    similarity,
    timeseries,
    text_extra,
    # r6-green
    stats_extra,
    windows_extra,
    scd,
    cdc,
    layout,
    quality_model,
    vocab,
    profiling,
    multimodal_audio,
    decontam,
    scoring,
    formats_extra,
    sampling,
    # r7-green (freshest evidence, rotated out of the window)
    tpch_extra,
    dedup,
    packing,
    quality,
    curation_full,
    conversion,
    aggregates,
    formats,
    reshaping,
    joins,
    nested,
    python_udfs,
)
from discogs_xml_to_parquet_spark.registry import query as _query

# q_ann_bruteforce_topk is registered manually (demoted from the
# similarity module in r3); r5-green, so it sits outside the window.
_query("q_ann_bruteforce_topk", oracle=similarity.BRUTEFORCE_ORACLE)(
    similarity.q_ann_bruteforce_topk
)
