"""CSV and JSON source/sink round trips, driver-checked.

The reference reads gzipped XML and writes Parquet only (src/main.rs:63-71,
219-226); a user of a general engine also needs delimited and JSON-lines
IO. Each query writes a projection out through the format, reads it back
with an EXPLICIT schema (never inferSchema -- a schema-inference pass
re-reads the whole input at 100 TB), and aggregates; the oracle computes
the same aggregate from the original parquet, so any loss, duplication,
type drift, or quoting corruption through the round trip breaks the
hash.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark.functions.exact import dsum
from discogs_xml_to_parquet_spark.queries._paths import scratch_sink_dir
from discogs_xml_to_parquet_spark.registry import query
from discogs_xml_to_parquet_spark.tables import load


def _out(sf_dir: str, tag: str) -> str:
    # unique per call: see _paths.scratch_sink_dir on why a fixed
    # shared path races with concurrent drivers/pytest workers
    return scratch_sink_dir(tag, sf_dir)


@query(
    "q_source_csv_roundtrip",
    oracle="""
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(floor((c_acctbal) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000 AS sum_acctbal
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def q_source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer -> CSV (header, quoted) -> read back with explicit
    schema -> aggregate. c_name carries free text, so the quoting path
    is exercised; c_acctbal round-trips through its shortest decimal
    string repr, which Java parses back to the identical double."""
    out = _out(sf_dir, "csv_roundtrip")
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    c.write.mode("overwrite").option("header", "true").csv(out)
    back = (
        spark.read.option("header", "true")
        .schema(
            "c_custkey long, c_name string, c_acctbal double, "
            "c_mktsegment string"
        )
        .csv(out)
    )
    return (
        back.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal").alias("sum_acctbal"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "q_source_json_roundtrip",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(floor((o_totalprice) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000 AS sum_price,
       MIN(strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%d')) AS first_date
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def q_source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders -> JSON lines -> read back with explicit schema ->
    aggregate. The timestamp is pre-formatted to a date string before
    the sink (raw timestamp JSON round trips are format-dependent;
    strings are exact), matching the determinism rule the whole suite
    uses for temporal output."""
    out = _out(sf_dir, "json_roundtrip")
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"),
    )
    o.write.mode("overwrite").json(out)
    back = spark.read.schema(
        "o_orderkey long, o_orderpriority string, o_totalprice double, "
        "o_date string"
    ).json(out)
    return (
        back.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("sum_price"),
            F.min("o_date").alias("first_date"),
        )
        .orderBy("o_orderpriority")
    )
