"""Query modules; importing this package registers every named query.

Import order IS driver-check order (the registry dict preserves
insertion order and the driver checks the first 50 registered queries
-- r01-r12 all cut at exactly 50). Rotation policy: queries with no
CORRECTNESS row anywhere go first, then fixed/changed queries, then
pinned modules, then the module whose passing evidence is oldest.

The policy is CODE, not prose: registry.window() derives this order
from the CORRECTNESS_r*.json artifacts (VERDICT r6 item 6), and
tests/test_window.py pins that the first 50 imports below agree with
it. The derivation is PINNED to the artifacts that existed when it was
made (window(max_round=DERIVED_AT_ROUND) -- VERDICT r8 item 1): the
driver landing CORRECTNESS_r13.json cannot flip the fixed-point test
red; re-deriving for r14 is a deliberate commit that bumps
DERIVED_AT_ROUND to 13 and pastes the order
`python scripts/window_plan.py --max-round 13 --changed ...` prints.

Round-13 window (the first 50), derived by window(changed=R13_CHANGED
in tests/test_window.py, pin=(), max_round=12). The design intent
(VERDICT r12 item 1): retire the r8 evidence cohort -- all 28
r8-evidence queries re-verify this round, so after r13 the oldest
evidence anywhere is r9.

- 1: tokenize rank 0 (q_bpe_encode NEW late-r13 -- the tokenizer
  APPLY half of the BPE story; its arrival displaces the one
  r9-evidence tail entry q_join_bloom_dpp past the 50-cut);
- 2: lakehouse rank 0 (q_lakehouse_read_path NEW -- the COMPOSED
  read path: partition pruning x bucket-transform pruning x min/max
  file skipping planned off ONE stats manifest, the Iceberg scan
  shape; closes VERDICT r12 "what's missing" #5);
- 3-8: matching rank 0 (q_fuzzy_blocked_sampled NEW late-r13: block
  SAMPLING, the graceful-degradation twin of the df-cap purge whose
  sf10 recall cliff this round measured; the module also carries its
  stage_df CHANGED rework and 4 of the r8 cohort);
- 9: file_skipping CHANGED (non-empty-manifest guard, ADVICE r12);
- 10-16: the staged-lane cohort CHANGED by the reliable-checkpoint
  rework (commit 80458ce: staging.stage_df gives every staged lane a
  SPARK_GRAFT_CHECKPOINT_DIR production mode) -- incremental (whose
  merge import folds the COW quartet in first), ttl (also the EXDEV
  hardlink fallback, ADVICE r12), setsim (also the r13 BYTE gate on
  the verification/expansion broadcasts, VERDICT r12 item 3);
- 17-18: graph_iter CHANGED (the partition-aware PageRank edge
  staging, VERDICT r12 item 2);
- 19-26: streaming_queries -- the four true-readStream lanes
  CHANGED (memory sinks -> file sinks, VERDICT r12 item 6), the four
  r9-evidence batch faces ride the module;
- 27-48: the rest of the r8 cohort on evidence age -- sketches,
  tpch_extra2 (q13/q17/q7/q22/q15), pipeline (pii/sample/span-
  shingles/rollup-reuse), ranges (the range-join trio), cohorts,
  setops, temporal (asof + the multimodal feature trio);
- 49-50: the oldest r9 evidence fills the window -- runtime_filters'
  q_join_aqe_skew rides in at the cut; q_join_bucketed and
  q_join_bloom_dpp are the two r9-evidence queries the late-r13
  arrivals displaced past it (they lead the r14 derivation).

After this window the oldest evidence anywhere is r9 (binary_source,
tpch_extra3, layout, text_analysis, ...). The staging helpers the
staged lanes share live in ../staging.py, OUTSIDE this package, so
importing them cannot drag a query module forward in the window.
"""

from discogs_xml_to_parquet_spark.queries import (  # noqa: F401
    # 1: q_bpe_encode NEW late-r13 (rank 0) -- the tokenizer APPLY
    # half of the BPE story (vocab.py holds the training count step);
    # its arrival displaces exactly one r9-evidence query
    # (q_join_bloom_dpp, the runtime_filters tail) past the 50-cut,
    # leaving the whole r8 cohort intact
    tokenize,
    # 2: q_lakehouse_read_path NEW (rank 0)
    lakehouse,
    # 3-8: matching rank 0 (q_fuzzy_blocked_sampled NEW late-r13 --
    # block SAMPLING, the graceful twin of the df-cap purge whose
    # sf10 recall cliff this round measured; the module's stage_df
    # rework + r8-evidence tail ride up with it)
    matching,
    # 9: q_file_skipping_scan CHANGED (manifest guard)
    file_skipping,
    # 3-6: merge folds in first (incremental imports it): the COW
    # MERGE / time travel / diff / vacuum quartet re-rides
    merge,
    # 7-8: q_incremental_rollup + q_incremental_join_view CHANGED
    # (stage_df rework)
    incremental,
    # 9: q_retention_ttl CHANGED (EXDEV-safe hardlink clone)
    ttl,
    # 10: q_setsim_prefix_join CHANGED (byte-gated broadcasts)
    setsim,
    # 18-19: graph_iter CHANGED (partition-aware edge staging)
    graph_iter,
    # 18-25: the four true-readStream lanes CHANGED (file sinks);
    # the r9 batch faces ride
    streaming_queries,
    # 26-28: r8 evidence -- approx sketches
    sketches,
    # 29-33: r8 evidence -- TPC-H q13/q17/q7/q22/q15
    tpch_extra2,
    # 34-37: r8 evidence -- pii/sample/span-shingles/rollup-reuse
    pipeline,
    # 38-40: r8 evidence -- the range-join trio
    ranges,
    # 41: r8 evidence -- cohort retention
    cohorts,
    # 42-43: r8 evidence -- set operations
    setops,
    # 44-47: r8 evidence -- asof join + the multimodal feature trio
    temporal,
    # 50: oldest r9 evidence; the 50-cut lands INSIDE
    # runtime_filters -- q_join_bucketed + q_join_bloom_dpp lead r14
    runtime_filters,
    # --- 50-query window cut ---
    # r9-green remainder: first in line for round 14
    binary_source,
    tpch_extra3,
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
    # late-r11 changes were harness-only -- see r12 window notes)
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
    # r11-green
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
    # r12-green (freshest evidence, rotated out of the window;
    # deletion_vectors' merge import is already satisfied above)
    deletion_vectors,
    theta_sets,
    bucket_pruning,
    clustering,
    curation_extra,
    analytics_extra,
    features,
    sketch_rollup,
    constraints,
    conversion,
    reshaping,
    joins,
    nested,
    python_udfs,
)
