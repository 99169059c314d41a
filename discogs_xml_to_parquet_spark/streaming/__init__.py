from discogs_xml_to_parquet_spark.streaming.events import (  # noqa: F401
    session_agg,
    stream_events,
    tumbling_agg,
)
