"""Query modules; importing this package registers every named query.

Import order IS driver-check order (the registry dict preserves
insertion order and the driver checks the first 50 registered queries
-- r01 and r02 both cut at exactly 50). Rotation policy: queries with
no CORRECTNESS row anywhere go first, then this round's new modules,
then the stable previously-green bulk.

Round-3 window (the first 50): the 10 new queries (sampling x3,
decontam, quality x2, kmeans x2, tfidf, bm25) + the 12 never-checked
(ranges, pipeline, formats, q_ann_lsh_probe, discogs_conversion_stats,
q_skew_salted_join) + 28 of the 30 checked only in r01 (similarity
tail, conversion, joins, aggregates, nested, python_udfs, reshaping)
= exactly 50. setops (r01-green) lands at positions 51-52 -- a
deliberate trade: giving its two slots to q_kmeans_update and
q_bm25_search leaves only cohorts/orc/packing with no row anywhere
after round 3, the minimum possible. q_ann_bruteforce_topk (green in
r02) is re-registered at the bottom of this file to free its
similarity-module slot.
"""

from discogs_xml_to_parquet_spark.queries import (  # noqa: F401
    # new this round -- no row anywhere yet
    sampling,
    decontam,
    quality,
    clustering,
    scoring,
    # never driver-checked
    ranges,
    pipeline,
    formats,
    # checked only in round 1 (plus the never-checked strays inside)
    similarity,
    conversion,
    joins,
    aggregates,
    nested,
    python_udfs,
    reshaping,
    setops,
    # new this round, beyond the 50-window (round-4 candidates)
    cohorts,
    formats_extra,
    packing,
    curation_full,
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
from discogs_xml_to_parquet_spark.registry import query as _query

# q_ann_bruteforce_topk demoted out of the round-3 window (green in
# r02); implementation + oracle stay in queries/similarity.py.
_query("q_ann_bruteforce_topk", oracle=similarity.BRUTEFORCE_ORACLE)(
    similarity.q_ann_bruteforce_topk
)
