from discogs_xml_to_parquet_spark.plans.inspect import (  # noqa: F401
    formatted_plan,
    plan_report,
)
