"""Additional source/sink format coverage: ORC round-trip (Spark's
second first-class columnar format after Parquet; zlib by default,
predicate pushdown and column pruning supported like Parquet).
Registered after the round-3 window -- format coverage breadth, not a
never-checked gap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark.functions.exact import dsum
from discogs_xml_to_parquet_spark.queries._paths import scratch_sink_dir
from discogs_xml_to_parquet_spark.registry import query
from discogs_xml_to_parquet_spark.tables import load


@query(
    "q_source_orc_roundtrip",
    oracle="""
SELECT p_brand,
       COUNT(*) AS n_parts,
       CAST(SUM(CAST(floor((p_retailprice) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000 AS sum_price,
       MIN(p_name) AS first_name
FROM part
GROUP BY p_brand
ORDER BY p_brand
""",
)
def q_source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part -> ORC -> read back with explicit schema -> aggregate. ORC
    preserves doubles and strings losslessly (columnar binary format,
    no text parsing), so the oracle aggregates the original parquet
    directly; any divergence in the round-tripped values would break
    the hash."""
    out = scratch_sink_dir("orc_roundtrip", sf_dir)
    p = load(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_brand", "p_retailprice"
    )
    p.write.mode("overwrite").orc(out)
    back = spark.read.schema(
        "p_partkey long, p_name string, p_brand string, "
        "p_retailprice double"
    ).orc(out)
    return (
        back.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            dsum("p_retailprice").alias("sum_price"),
            F.min("p_name").alias("first_name"),
        )
        .orderBy("p_brand")
    )
