from discogs_xml_to_parquet_spark.functions.exact import davg, dsum  # noqa: F401
