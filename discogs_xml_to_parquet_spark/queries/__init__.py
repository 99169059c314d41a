"""Query modules; importing this package registers every named query.

Import order IS driver-check order (the registry dict preserves
insertion order and the driver walks it top to bottom under a wall-time
budget -- round 1 stopped after 50 of 69 queries). So: families that
have never received a CORRECTNESS row go first, then modules changed
this round, then the stable previously-green bulk.
"""

from discogs_xml_to_parquet_spark.queries import (  # noqa: F401
    # never driver-checked in round 1 -- highest priority
    windows,
    subqueries,
    temporal,
    text_analysis,
    tpch_extra,
    streaming_queries,
    # changed this round (hash fixes, de-vacuified, new scale paths)
    relational,
    semistructured,
    scalars,
    dedup,
    matching,
    similarity,
    conversion,
    # stable green since round 1
    aggregates,
    joins,
    nested,
    python_udfs,
    reshaping,
    setops,
)
