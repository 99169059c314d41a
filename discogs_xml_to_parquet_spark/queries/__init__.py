"""Query modules; importing this package registers every named query.

Import order IS driver-check order (the registry dict preserves
insertion order and the driver checks the first 50 registered queries
-- r01-r11 all cut at exactly 50). Rotation policy: queries with no
CORRECTNESS row anywhere go first, then fixed/changed queries, then
pinned modules, then the module whose passing evidence is oldest.

The policy is CODE, not prose: registry.window() derives this order
from the CORRECTNESS_r*.json artifacts (VERDICT r6 item 6), and
tests/test_window.py pins that the first 50 imports below agree with
it. The derivation is PINNED to the artifacts that existed when it was
made (window(max_round=DERIVED_AT_ROUND) -- VERDICT r8 item 1): the
driver landing CORRECTNESS_r12.json cannot flip the fixed-point test
red; re-deriving for r13 is a deliberate commit that bumps
DERIVED_AT_ROUND to 12 and pastes the order
`python scripts/window_plan.py --max-round 12 --changed ...` prints.

Round-12 window (the first 50), derived by window(changed=R12_CHANGED
in tests/test_window.py, pin=(), max_round=11):

- 1: file_skipping rank 0 (q_file_skipping_scan NEW -- min/max file
  skipping physically executed: range-clustered layout, one-scan
  stats manifest, envelope-pruned read; oracle pins no-row-lost);
- 2-7: deletion_vectors rank 0 (q_delete_positional_dv NEW
  -- VERDICT r11 item 5: (file, row position) delete files applied
  via the scan's own row identity, key columns out of the read path;
  q_delete_merge_on_read CHANGED rides -- stat-only inventory), and
  its merge dependency folds in first (the r11-green COW quartet
  re-rides);
- 8-9: incremental rank 0 (q_incremental_join_view NEW -- item 4:
  the delta-join IVM refresh dA|x|B0 U A0|x|dB U dA|x|dB, every scan
  partition-pruned, the MV never re-joined; r9 q_incremental_rollup
  rides);
- 10-13: the four r12-CHANGED r11 lanes (theta slim projection,
  bucket-pruning memoized session, TTL hardlink scratch, setsim's
  size-conditional broadcasts -- item 1);
- 14-28: the late-r11 CHANGED cohort with its riders --
  curation_extra (q_budget_select: prefix running_sum null-carry
  fix; drags clustering via the dependency fold), analytics_extra
  (q_histogram_equidepth: same fix), features (q_stats_mad +
  q_percentile_cont_exact: value_at_ranks left-join fix),
  sketch_rollup (column rename), constraints (FK fold, engine +
  oracle);
- 29-31: conversion CHANGED (strict-parser conformance fixes,
  commit 4ecc7ab) -- also the max-3-rounds freshness pin due r13,
  closed here (VERDICT r11 item 7);
- 32-49: the oldest evidence -- reshaping rides for r7
  q_percentiles, then the full r7 cohort (joins 7, nested 3,
  python_udfs 4: every r7-evidence query is in this window, VERDICT
  r11 item 2);
- 50: matching (r8) begins; the cut lands after
  q_fuzzy_levenshtein, so q_fuzzy_blocked leads the r13 remainder.

After this window the oldest evidence anywhere is r8 (matching's
tail, sketches, tpch_extra2, graph_iter, ...). NOT marked changed,
deliberately: q_compact_files/q_compact_partitioned (late-r11 change
was work-dir reuse -- harness footprint only, values and plans
identical) and q_reservoir_per_group (canonical _doc_hash reuse, an
IDENTICAL expression by construction); both rotate on evidence age.

The staging helpers these modules share live in ../staging.py, OUTSIDE
this package, so importing them cannot drag a query module forward in
the window.
"""

from discogs_xml_to_parquet_spark.queries import (  # noqa: F401
    # 1: q_file_skipping_scan NEW (min/max data skipping on a
    # non-partition column: a kilobyte JSON stats manifest names the
    # envelope-intersecting files and the scan opens ONLY those --
    # the physical complement of q_zorder_layout's zone-map audit)
    file_skipping,
    # 2-7: q_delete_positional_dv NEW (positional deletion vectors:
    # the reader subtracts (file, row position) pairs via
    # _metadata.row_index -- no key column in the read path) +
    # q_delete_merge_on_read CHANGED (stat-only untouched fact); the
    # module imports merge, so the COW MERGE / time travel / diff /
    # vacuum quartet folds in ahead of it
    deletion_vectors,
    # 8-9: q_incremental_join_view NEW (join-view IVM: three
    # delta-join terms, all six scans month-pruned, MV enters as its
    # materialized form) + r9 q_incremental_rollup riding
    incremental,
    # 10: q_theta_set_algebra CHANGED (production projection slimmed
    # to what the driver row consumes -- ADVICE r11)
    theta_sets,
    # 11: q_bucket_pruning CHANGED (conf-flipped sibling session
    # memoized per application -- ADVICE r11)
    bucket_pruning,
    # 12: q_retention_ttl CHANGED (hardlink scratch clone: harness
    # isolation no longer bills O(table) I/O to the O(1)+O(boundary)
    # lane)
    ttl,
    # 13: q_setsim_prefix_join CHANGED (VERDICT r11 item 1: the
    # verification/expansion broadcasts are size-conditional -- the
    # plan that survives a low-duplication 100 TB corpus)
    setsim,
    # 14-18: q_budget_select CHANGED (prefix running_sum null-carry
    # fix, commit e3725d4); its clustering import folds in first
    curation_extra,
    # 19-22: q_histogram_equidepth CHANGED (same prefix fix)
    analytics_extra,
    # 23-26: q_stats_mad + q_percentile_cont_exact CHANGED
    # (value_at_ranks keeps all-out-of-range groups, left join)
    features,
    # 27: q_hll_union_rollup CHANGED (one-scan exact reference,
    # column rename)
    sketch_rollup,
    # 28: q_constraint_audit CHANGED (distinct-dim FK fold, engine +
    # oracle)
    constraints,
    # 29-31: conversion trio CHANGED (five strict-parser conformance
    # gaps closed against the reference, commit 4ecc7ab); also the
    # freshness pin due r13
    conversion,
    # 32-35: reshaping rides whole for r7 q_percentiles (pivot/
    # unpivot/minby_maxby are r11-green riders)
    reshaping,
    # 36-42: joins (7, r7)
    joins,
    # 43-45: nested (3, r7)
    nested,
    # 46-49: python_udfs (4, r7) -- with these, every r7-evidence
    # query is checked this round
    python_udfs,
    # 50: matching (r8) -- the cut lands after q_fuzzy_levenshtein;
    # q_fuzzy_blocked leads the r13 remainder
    matching,
    # --- 50-query window cut ---
    # r8-green remainder: first in line for round 13
    sketches,
    tpch_extra2,
    graph_iter,
    pipeline,
    ranges,
    cohorts,
    setops,
    temporal,
    # r9-green
    runtime_filters,
    binary_source,
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

from discogs_xml_to_parquet_spark.queries import (  # noqa: F401,E402
    # r10-green (compaction + sampling stay on evidence age: their
    # late-r11 changes were harness-only -- see module docstring)
    compaction,
    profiling,
    drift,
    timeseries,
    text_extra,
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
    # r11-green (freshest evidence, rotated out of the window;
    # streaming_restart precedes streaming_merge exactly as the
    # dependency fold would emit them)
    schema_evolution,
    multimodal_image,
    quantile_rollup,
    kll_quantiles,
    partition_evolution,
    streaming_restart,
    streaming_merge,
    python_datasource,
    tpch_extra,
    dedup,
    packing,
    quality,
    curation_full,
    aggregates,
    formats,
)
