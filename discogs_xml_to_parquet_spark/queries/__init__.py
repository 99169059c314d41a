"""Query modules; importing this package registers every named query.

Import order IS driver-check order (the registry dict preserves
insertion order and the driver checks the first 50 registered queries
-- both r01 and r02 cut at exactly 50). Rotation policy: queries
without a CORRECTNESS row from the previous round go first, then
modules added/changed this round, then the stable previously-green
bulk. Round 3 window: similarity tail + conversion + joins +
aggregates + nested + python_udfs + reshaping + setops (the 33 queries
r02 skipped, incl. the 3 never-checked: discogs_conversion_stats,
q_ann_lsh_probe, q_skew_salted_join) and this round's new modules.
"""

from discogs_xml_to_parquet_spark.queries import (  # noqa: F401
    # no CORRECTNESS row in round 2 -- highest priority
    similarity,
    conversion,
    joins,
    aggregates,
    nested,
    python_udfs,
    reshaping,
    setops,
    # new this round
    ranges,
    pipeline,
    formats,
    # stable green in round 2
    windows,
    subqueries,
    temporal,
    text_analysis,
    tpch_extra,
    streaming_queries,
    relational,
    semistructured,
    scalars,
    dedup,
    matching,
)
