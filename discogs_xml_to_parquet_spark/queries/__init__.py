"""Query modules; importing this package registers every named query.

Import order IS driver-check order (the registry dict preserves
insertion order and the driver checks the first 50 registered queries
-- r01-r10 all cut at exactly 50). Rotation policy: queries with no
CORRECTNESS row anywhere go first, then fixed/changed queries, then
pinned modules, then the module whose passing evidence is oldest.

The policy is CODE, not prose: registry.window() derives this order
from the CORRECTNESS_r*.json artifacts (VERDICT r6 item 6), and
tests/test_window.py pins that the first 50 imports below agree with
it. The derivation is PINNED to the artifacts that existed when it was
made (window(max_round=DERIVED_AT_ROUND) -- VERDICT r8 item 1): the
driver landing CORRECTNESS_r11.json cannot flip the fixed-point test
red; re-deriving for r12 is a deliberate commit that bumps
DERIVED_AT_ROUND to 11 and pastes the order
`python scripts/window_plan.py --max-round 11 --changed ...` prints.

Round-11 window (the first 50), derived by
window(changed={q_setsim_prefix_join, q_source_python_datasource},
pin=(), max_round=10):

- 1-4: merge leads with rank 0 (q_vacuum_retention NEW -- VERDICT
  r10 item 4: the reference-counted VACUUM + 3-generation publish
  chain gets its oracle-backed driver row; the r10-green trio
  q_merge_upsert/q_time_travel/q_table_diff rides, which also
  re-checks the ADVICE r10 out-of-window guards added this round);
- 5-7: schema_evolution rank 0 (q_schema_evolution_widening NEW --
  item 6: int32->int64 across generations via the explicit catalog
  schema, mergeSchema's refusal pytest-pinned;
  q_schema_evolution_rename NEW -- explicit per-generation rename
  map, mergeSchema's silent column fork pytest-pinned; r9
  q_schema_evolution_scan rides);
- 8: multimodal_image rank 0 (q_multimodal_image_decode NEW --
  item 7: the pure-Python PPM/BMP decoder replacing the repo's one
  NotImplementedError, both codecs round-tripped in one
  oracle-checked lane);
- 9: deletion_vectors rank 0 (q_delete_merge_on_read NEW --
  merge-on-read DELETE: kilobyte key sidecars, byte-identical base,
  broadcast-LeftAnti read, MOR->COW compaction pytest-pinned);
- 10: quantile_rollup rank 0 (q_quantile_histogram_rollup NEW --
  stored per-day histogram vectors answer any-range p50/p90/p99
  with zero fact scans, integer-exact against the oracle);
- 11: theta_sets rank 0 (q_theta_set_algebra NEW -- Datasketches
  Theta set algebra: the distinct-count intersection/difference HLL
  cannot do, week-cohort retention from the stored day-sketch MV);
- 12: kll_quantiles rank 0 (q_kll_quantile_sketch NEW -- stored
  per-day KLL doubles sketches, any-range value-space p50/p90 with
  a hash-pinned rank-error band);
- 13: partition_evolution rank 0 (q_partition_evolution NEW --
  Iceberg-style spec evolution: old slices pruned by month, new
  slices by month+priority, no historical rewrite);
- 14: bucket_pruning rank 0 (q_bucket_pruning NEW -- point lookup
  opens <= |keys| of 16 bucket files, SelectedBucketsCount-proven;
  the autoBucketedScan subtlety pinned both ways);
- 15-16: streaming_merge rank 0 (q_stream_merge_sink NEW -- the
  transactional foreachBatch MERGE sink: non-idempotent increments
  exactly once across a kill/resume, batchId txn set inside the
  version manifest, one atomic flip; the dependency fold pulls
  r10's q_stream_restart forward to ride at 15 -- its WAL helpers
  are what the sink lane reuses);
- 17: ttl rank 0 (q_retention_ttl NEW -- TTL enforcement: expired
  partitions unlink as metadata, proven no-read; only the cutoff's
  boundary partition rewritten);
- 18: python_datasource CHANGED (ADVICE r10: the stream reader's
  offsets became filename SETS -- backfill-proof exactly-once);
- 19: setsim CHANGED (item 1: the distinct-token-set collapse --
  ~4-5 s at sf0.1 / 3.7-4.6x wall for 10x data, was 47 s / 22x);
- 20-26: tpch_extra, the oldest-evidence module (six r7 queries;
  r10-green q10_returned_items rides at the module head);
- 27-50: the r7 cohort in evidence order -- dedup (11), packing,
  quality (2), curation_full, aggregates (4), formats (2),
  reshaping (first 3 of 4); the 50-cut lands mid-reshaping after
  q_minby_maxby, so q_percentiles leads the r12 remainder with
  joins, nested, python_udfs, and the r8 cohort.

After this window nothing in the registry has evidence older than r7,
and the oldest unchecked evidence anywhere is r7 (the joins tail,
nested, python_udfs).

The staging helpers these modules share live in ../staging.py, OUTSIDE
this package, so importing them cannot drag a query module forward in
the window (the r9 layout cost runtime_filters three head slots via
the dependency fold; r10 returned it to its evidence rank).
"""

from discogs_xml_to_parquet_spark.queries import (  # noqa: F401
    # 1-4: q_vacuum_retention NEW (3-generation publish chain +
    # reference-counted VACUUM, keep-set validated); the r10 trio
    # (COW MERGE, time travel, manifest diff) rides with its module
    merge,
    # 5-7: q_schema_evolution_widening NEW (int32->int64 via explicit
    # catalog schema; mergeSchema refusal pinned) +
    # q_schema_evolution_rename NEW (explicit per-generation rename
    # map; mergeSchema's silent column fork pinned); r9 scan rides
    schema_evolution,
    # 8: q_multimodal_image_decode NEW (pure-Python PPM/BMP round
    # trip -- the image decoder the r10 verdict's last-skip item
    # asked for, oracle-checked like the audio lane)
    multimodal_image,
    # 9: q_delete_merge_on_read NEW (merge-on-read DELETE via
    # deletion-vector sidecars -- the write-amplification complement
    # to the COW MERGE; imports merge, which is already emitted)
    deletion_vectors,
    # 10: q_quantile_histogram_rollup NEW (mergeable per-day histogram
    # MV answering any-range p50/p90/p99 with zero fact scans -- the
    # quantile analog of q_hll_union_rollup)
    quantile_rollup,
    # 11: q_theta_set_algebra NEW (Datasketches Theta sketches: the
    # distinct-count INTERSECTION/DIFFERENCE algebra HLL cannot do --
    # week-cohort retention/churn from the stored day-sketch MV)
    theta_sets,
    # 12: q_kll_quantile_sketch NEW (Datasketches KLL doubles: stored
    # per-day quantile sketches, any-range p50/p90 in value space
    # with a hash-pinned rank-error band)
    kll_quantiles,
    # 13: q_partition_evolution NEW (Iceberg-style partition-spec
    # evolution: old slices month-partitioned, new slices
    # (month, priority)-partitioned, each scanned under its OWN spec
    # with per-spec PartitionFilters -- no historical rewrite)
    partition_evolution,
    # 14: q_bucket_pruning NEW (point lookup against a
    # custkey-bucketed table opens <= |keys| of 16 bucket files --
    # SelectedBucketsCount from the executed plan rides as the proof;
    # the autoBucketedScan planner subtlety pinned both ways)
    bucket_pruning,
    # 15-16: q_stream_merge_sink NEW (transactional streaming MERGE:
    # foreachBatch applies non-idempotent increments exactly once
    # across a kill/resume -- batchId set rides in the version
    # manifest, data+log commit in one atomic flip); its import
    # drags r10's streaming_restart forward (q_stream_restart rides
    # at 15, re-greening the WAL helpers this lane reuses)
    streaming_merge,
    # 17: q_retention_ttl NEW (TTL enforcement: ~42 expired
    # partitions unlink as metadata -- proven no-read by the
    # unreadable-files pytest -- and only the cutoff's boundary
    # partition is rewritten; imports merge, already emitted)
    ttl,
    # 18: q_source_python_datasource CHANGED (filename-set stream
    # offsets -- backfill-proof exactly-once, ADVICE r10)
    python_datasource,
    # 19: q_setsim_prefix_join CHANGED (distinct-set collapse before
    # the prefix join -- the r10 scale-killer fix)
    setsim,
    # 20-26: oldest evidence, r7 cohort begins (q10 rides at head)
    tpch_extra,
    # 27-37: dedup (11 queries, r7)
    dedup,
    # 38: packing (r7)
    packing,
    # 39-40: quality (r7)
    quality,
    # 41: curation_full (r7; folds after its dedup/packing/quality deps)
    curation_full,
    # 42-45: aggregates (r7)
    aggregates,
    # 46-47: formats (r7)
    formats,
    # 48-50: reshaping (r7) -- the cut lands mid-module after
    # q_minby_maxby; q_percentiles leads the r12 remainder
    reshaping,
    # --- 50-query window cut ---
    # r7-green remainder: first in line for round 12
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
    # r9-green
    runtime_filters,
    incremental,
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
    # r10-green (freshest evidence, rotated out of the window;
    # streaming_restart is absent here -- streaming_merge imports it,
    # so it already registered at the window head)
    compaction,
    sketch_rollup,
    constraints,
    profiling,
    drift,
    conversion,
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
)
