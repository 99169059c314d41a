"""Query modules; importing this package registers every named query."""

from discogs_xml_to_parquet_spark.queries import (  # noqa: F401
    aggregates,
    conversion,
    dedup,
    joins,
    matching,
    nested,
    python_udfs,
    relational,
    reshaping,
    scalars,
    semistructured,
    setops,
    similarity,
    streaming_queries,
    subqueries,
    temporal,
    text_analysis,
    tpch_extra,
    windows,
)
