"""PySpark-native analytics engine with the capabilities of
jfgreen/discogs-xml-to-parquet, rebuilt Spark-first.

The reference (/root/reference/src/main.rs) is a single-threaded Rust
XML->Parquet streaming converter. This package re-expresses that surface
as declarative PySpark (DataFrame / SQL / Catalyst) and extends it with
the relational operator breadth and large-scale training-data-pipeline
operators described in SURVEY.md §2.

Layout:
    session.py    SparkSession builder tuned for scale-out defaults
    tables.py     parquet table loaders for the test star schema
    registry.py   named-query + DuckDB-oracle registry (driver contract)
    queries/      one module per operator category, each registering queries
    sources/      Discogs XML source (reference parity, §2.A)
    operators/    composed operators: dedup, similarity, as-of join, ...
    functions/    column-level helpers (vector math, text stats)
    streaming/    Structured Streaming variants of the event pipeline
"""

__version__ = "0.1.0"
