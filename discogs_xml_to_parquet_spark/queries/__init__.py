"""Query modules; importing this package registers every named query.

Import order IS driver-check order (the registry dict preserves
insertion order and the driver checks the first 50 registered queries
-- r01-r13 all cut at exactly 50). Rotation policy: queries with no
CORRECTNESS row anywhere go first, then fixed/changed queries, then
pinned modules, then the module whose passing evidence is oldest.

The policy is CODE, not prose: registry.window() derives this order
from the CORRECTNESS_r*.json artifacts (VERDICT r6 item 6), and
tests/test_window.py pins that the first 50 imports below agree with
it. The derivation is PINNED to the artifacts that existed when it was
made (window(max_round=DERIVED_AT_ROUND) -- VERDICT r8 item 1): the
driver landing CORRECTNESS_r14.json cannot flip the fixed-point test
red; re-deriving for r15 is a deliberate commit that bumps
DERIVED_AT_ROUND to 14 and pastes the order
`python scripts/window_plan.py --max-round 14 --changed ...` prints.

Round-14 window (the first 50), derived by window(changed=R14_CHANGED
in tests/test_window.py, pin=(), max_round=13). The design intent
(VERDICT r13 item 1): re-green the stage_df-migrated connected-
components consumers and start retiring the 37-query r9-evidence
cohort -- the oldest evidence in the repo.

- 1-2: snapshot_read NEW r14 at rank 0 -- q_snapshot_read, the FULL
  composed snapshot read (versioned manifest -> three-gate planned
  scan -> positional-DV subtraction); its lakehouse import folds in
  first, and q_lakehouse_read_path is itself CHANGED in-round
  (planned_read now exposes the planned file list);
- 3-4: packing rank 0 (q_pack_greedy NEW r14 -- boundary-preserving
  next-fit packing as a per-shard applyInPandas recurrence, the
  non-splitting twin of concat-and-chunk);
- 5-10: matching CHANGED (the late-r13 operators/graph.py stage_df
  migration touches q_entity_resolution's CC stage; the module's
  five siblings -- including the late-r13 sampled-blocking twin --
  ride the fold with fresh r13 evidence);
- 9-19: dedup CHANGED (q_dedup_minhash_lsh + q_dedup_simhash_banded
  are stage_df-migrated CC consumers; the module's r11-evidence tail
  re-verifies with them);
- 20-23: packing + quality + curation_full ride the dependency fold
  (curation_full imports dedup/packing/quality; q_curation_pipeline
  is itself a stage_df-migrated CC consumer);
- 24-28: clustering + curation_extra (q_dedup_semantic is the fifth
  stage_df-migrated CC consumer; clustering is its import dep);
- 29-31: setsim + graph_iter CHANGED in-round (the interned-token
  verification rewrite and the pre-divided PageRank rank vector --
  both r13-green, both rewritten this round, so both re-verify);
- 32-34: runtime_filters -- q_join_bucketed and q_join_bloom_dpp are
  the two r9-evidence queries the late-r13 arrivals displaced past
  the r13 cut (VERDICT r13: "they lead the r14 derivation");
  q_join_aqe_skew rides its module;
- 36-50: the r9-evidence cohort on evidence age -- binary_source,
  tpch_extra3 (q4/q8/q12), layout, text_analysis (all seven),
  windows (the cut lands INSIDE windows: rank_dense waits for r15).

After this window the r9-evidence set shrinks from 37 to 18
(subqueries, semistructured, relational, scalars, similarity --
first in line for r15). The
staging helpers the staged lanes share live in ../staging.py, OUTSIDE
this package, so importing them cannot drag a query module forward in
the window.
"""

from discogs_xml_to_parquet_spark.queries import (  # noqa: F401
    # 1-2: snapshot_read NEW r14 (rank 0) -- the FULL composed
    # snapshot read (versioned manifest -> three-gate planned scan ->
    # positional-DV subtraction); its lakehouse import folds in first
    lakehouse,
    snapshot_read,
    # 3-4: packing rank 0 (q_pack_greedy NEW r14 -- the boundary-
    # preserving next-fit packer; q_pack_sequences rides the module)
    packing,
    # 5-10: matching CHANGED (stage_df CC migration touches
    # q_entity_resolution; fresh-r13 siblings ride the module fold)
    matching,
    # 11-21: dedup CHANGED (q_dedup_minhash_lsh + q_dedup_simhash_banded
    # are stage_df-migrated; the r11 tail re-verifies)
    dedup,
    # 22-24: the curation_full dependency fold (imports dedup,
    # packing, quality; q_curation_pipeline is stage_df-migrated)
    quality,
    curation_full,
    # 24-28: q_dedup_semantic CHANGED (stage_df) + its clustering dep
    clustering,
    curation_extra,
    # 29-31: the in-round rewrites re-verify (interned setsim
    # verification, pre-divided PageRank)
    setsim,
    graph_iter,
    # 32-34: q_join_bucketed + q_join_bloom_dpp -- the two r9-evidence
    # queries displaced past the r13 cut lead the rotation
    runtime_filters,
    # 35-50: the r9-evidence cohort on evidence age; the 50-cut lands
    # exactly at windows' fourth query
    binary_source,
    tpch_extra3,
    layout,
    text_analysis,
    windows,
    # --- 50-query window cut ---
    # r9-green remainder: first in line for round 15
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
    # r10-green
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
    # merge rides here on the dependency fold (streaming_merge,
    # deletion_vectors and incremental all import it) -- its own
    # evidence is fresh r13
    merge,
    streaming_merge,
    python_datasource,
    tpch_extra,
    aggregates,
    formats,
    # r12-green
    deletion_vectors,
    theta_sets,
    bucket_pruning,
    analytics_extra,
    features,
    sketch_rollup,
    constraints,
    conversion,
    reshaping,
    joins,
    nested,
    python_udfs,
    # r13-green (freshest evidence, rotated out of the window;
    # lakehouse/setsim/graph_iter already registered in-window above)
    tokenize,
    file_skipping,
    incremental,
    ttl,
    streaming_queries,
    sketches,
    tpch_extra2,
    pipeline,
    ranges,
    cohorts,
    setops,
    temporal,
)
