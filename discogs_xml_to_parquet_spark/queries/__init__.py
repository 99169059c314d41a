"""Query modules; importing this package registers every named query.

Import order IS driver-check order (the registry dict preserves
insertion order and the driver checks the first 50 registered queries
-- r01-r09 all cut at exactly 50). Rotation policy: queries with no
CORRECTNESS row anywhere go first, then fixed/changed queries, then
pinned modules, then the module whose passing evidence is oldest.

The policy is CODE, not prose: registry.window() derives this order
from the CORRECTNESS_r*.json artifacts (VERDICT r6 item 6), and
tests/test_window.py pins that the first 50 imports below agree with
it. The derivation is PINNED to the artifacts that existed when it was
made (window(max_round=DERIVED_AT_ROUND) -- VERDICT r8 item 1): the
driver landing CORRECTNESS_r10.json cannot flip the fixed-point test
red; re-deriving for r11 is a deliberate commit that bumps
DERIVED_AT_ROUND to 10 and pastes the order
`python scripts/window_plan.py --max-round 10 --changed ...` prints.

Round-10 window (the first 50), derived by
window(changed={q_distribution_drift, q_setsim_prefix_join},
pin=("conversion",), max_round=9):

- 1-9: the NEW rank-0 block (q_stream_restart, the checkpointed
  kill/resume exactly-once lane -- VERDICT r9 item 2;
  q_compact_partitioned + q_compact_files, the partition-local and
  global OPTIMIZE-style bin-packs -- item 5; then the five mid-round
  additions: q_merge_upsert + q_time_travel + q_table_diff, the
  copy-on-write partition-pruned MERGE, its versioned-manifest
  snapshot reads, and the manifest-driven change data feed;
  q_source_python_datasource, the Spark 4 Python DataSource
  conversion lane; q_hll_union_rollup, the stored mergeable-sketch
  distinct rollup; q_constraint_audit, the one-scan declarative
  expectations engine);
- 10-11: profiling (q_profile_columns_approx NEW, the no-Expand HLL
  profile -- item 7; q_profile_columns r6 rides);
- 10: drift CHANGED (NULLIF divisor guard, ADVICE r9 -- the oracle SQL
  the driver runs changed, so it re-enters);
- 11: setsim CHANGED (r10 verification rewrite: length + positional
  PPJoin residual filters and broadcast set tables -- values
  identical, plan 5x faster at sf0.1);
- 14-16: conversion PINNED (r7 evidence; the max-3-rounds-unverified
  freshness pin from VERDICT r5 expires THIS round -- the one
  scheduling constraint the artifact ranking cannot express);
- 17-22: the six r5-evidence queries, exactly the set VERDICT r9
  item 1 named -- timeseries + text_extra;
- 23-49: the ENTIRE r6 cohort (stats_extra, windows_extra, scd, cdc,
  quality_model, vocab, multimodal_audio, decontam, scoring,
  formats_extra, sampling);
- 50: the oldest r7 evidence -- tpch_extra; the cut lands six short
  of the tpch_extra/dedup module boundary (after q10_returned_items
  -- the mid-round additions took those slots), so q14/q18/q5/q6/
  q19/q21 lead the r11 window with the dedup module and the r7
  cohort.

After this window nothing in the registry has evidence older than r6,
and the oldest unchecked evidence anywhere is r7.

The staging helpers these modules share live in ../staging.py, OUTSIDE
this package, so importing them cannot drag a query module forward in
the window (the r9 layout cost runtime_filters three head slots via
the dependency fold; r10 returns it to its evidence rank).
"""

from discogs_xml_to_parquet_spark.queries import (  # noqa: F401
    # 1: q_stream_restart NEW (checkpointed kill/resume exactly-once)
    streaming_restart,
    # 2-3: q_compact_partitioned + q_compact_files NEW (partition-local
    # and global small-file bin-pack rewrites)
    compaction,
    # 4-6: q_merge_upsert + q_time_travel + q_table_diff NEW
    # (copy-on-write partition-pruned MERGE; versioned-manifest
    # snapshot reads; manifest-driven change data feed)
    merge,
    # 7: q_source_python_datasource NEW (the Spark 4 Python DataSource
    # conversion lane)
    python_datasource,
    # 8: q_hll_union_rollup NEW (stored mergeable day sketches,
    # two-level distinct rollup)
    sketch_rollup,
    # 9: q_constraint_audit NEW (declarative expectations: six rules,
    # one scan)
    constraints,
    # 10-11: q_profile_columns_approx NEW (HLL no-Expand profile);
    # q_profile_columns (r6) rides
    profiling,
    # 12: q_distribution_drift CHANGED (NULLIF divisor guard)
    drift,
    # 13: q_setsim_prefix_join CHANGED (residual filters + broadcast
    # verification)
    setsim,
    # 14-16: conversion trio PINNED (freshness pin expires at r10)
    conversion,
    # 17-22: the six r5-evidence queries (VERDICT r9 item 1)
    timeseries,
    text_extra,
    # 23-49: the entire r6 cohort
    stats_extra,
    windows_extra,
    scd,
    cdc,
    quality_model,
    vocab,
    multimodal_audio,
    decontam,
    scoring,
    formats_extra,
    sampling,
    # 50: oldest r7 evidence; the cut lands six short of the module
    # boundary (after q10_returned_items)
    tpch_extra,
    # --- 50-query window cut ---
    # r7-green remainder: first in line for round 11
    dedup,
    packing,
    quality,
    curation_full,
    aggregates,
    formats,
    reshaping,
    joins,
    nested,
    python_udfs,
    # r8-green
    matching,
    sketches,
    tpch_extra2,
    graph_iter,
    clustering,
    curation_extra,
    analytics_extra,
    features,
    pipeline,
    ranges,
    cohorts,
    setops,
    temporal,
    # r9-green (freshest evidence, rotated out of the window)
    runtime_filters,
    incremental,
    binary_source,
    schema_evolution,
    tpch_extra3,
    streaming_queries,
    layout,
    text_analysis,
    windows,
    subqueries,
    semistructured,
    relational,
    scalars,
    similarity,
)
from discogs_xml_to_parquet_spark.registry import query as _query

# q_ann_bruteforce_topk is registered manually (demoted from the
# similarity module in r3). It registers HERE -- directly after its
# module -- so its registration slot matches the policy order, which
# groups it with similarity.
_query("q_ann_bruteforce_topk", oracle=similarity.BRUTEFORCE_ORACLE)(
    similarity.q_ann_bruteforce_topk
)
