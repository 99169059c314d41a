from discogs_xml_to_parquet_spark.sources.discogs_xml import (  # noqa: F401
    OUTPUT_SCHEMA,
    convert,
    read_releases,
)
