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


@query(
    "q_source_csv_permissive",
    oracle="""
SELECT (SELECT COUNT(*) FROM customer) AS n_good,
       CAST(3 AS BIGINT) AS n_corrupt,
       (SELECT CAST(SUM(CAST(floor((c_acctbal) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000
        FROM customer) AS good_acctbal
""",
)
def q_source_csv_permissive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PERMISSIVE quarantine lane at the relational layer -- the
    same error model the XML source implements against the reference's
    9 panic variants (main.rs:32-55, FAILFAST) with a softer recovery
    path: customer rows round-trip through CSV alongside 3 injected
    malformed lines; the reader parses good rows, shunts bad lines
    whole into the corrupt-record column, and the query audits both
    lanes in one aggregate. The oracle states the invariant: every
    original row survives as a good row, exactly the injected lines
    are quarantined, and the good-lane aggregate is unchanged."""
    import os

    out = scratch_sink_dir("csv_permissive", sf_dir)
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    c.write.mode("overwrite").csv(out)
    # inject malformed lines -- each must fail FIELD TYPE CONVERSION,
    # not just token count: Spark's CSV PERMISSIVE mode null-pads a
    # record with fewer/more tokens than the schema rather than
    # quarantining it, so a truncated-but-well-typed line would land in
    # the good lane. Every line below has a field that cannot convert.
    with open(os.path.join(out, "part-corrupt.csv"), "w") as fh:
        fh.write("notanumber,Broken Customer,12.5\n")
        fh.write("42,Truncated,notadouble\n")
        fh.write("garbage line without any commas at all,,,,,\n")
    back = (
        spark.read.schema(
            "c_custkey long, c_name string, c_acctbal double, "
            "_corrupt string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(out)
        .cache()  # Spark disallows corrupt-column-only pushdown scans
    )
    return back.agg(
        F.count(F.when(F.col("_corrupt").isNull(), 1)).alias("n_good"),
        F.count(F.when(F.col("_corrupt").isNotNull(), 1)).alias(
            "n_corrupt"
        ),
        dsum(F.when(F.col("_corrupt").isNull(), F.col("c_acctbal"))
             .otherwise(F.lit(0.0))).alias("good_acctbal"),
    )


@query(
    "q_source_text_roundtrip",
    oracle="""
SELECT COUNT(*) AS n_lines,
       CAST(SUM(length(replace(replace(text, chr(10), ' '), chr(13), ' ')))
            AS BIGINT) AS total_chars,
       MIN(md5(replace(replace(text, chr(10), ' '), chr(13), ' ')))
         AS min_line_md5,
       MAX(md5(replace(replace(text, chr(10), ' '), chr(13), ' ')))
         AS max_line_md5
FROM documents
""",
)
def q_source_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text -> line-oriented text files -> spark.read.text ->
    aggregate. The text source is the raw-corpus workhorse (one line =
    one record, no schema); newlines are scrubbed before writing since
    the format cannot carry embedded record separators -- the oracle
    applies the identical scrub to the source table, so the md5
    fingerprints prove the round trip is byte-lossless. Counting and
    hashing are map-only over however many splits the files yield."""
    out = scratch_sink_dir("text_roundtrip", sf_dir)
    d = load(spark, sf_dir, "documents")
    scrubbed = d.select(
        F.regexp_replace(
            F.regexp_replace("text", "\n", " "), "\r", " "
        ).alias("value")
    )
    scrubbed.write.mode("overwrite").text(out)
    back = spark.read.text(out)
    return back.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.length("value")).alias("total_chars"),
        F.min(F.md5("value")).alias("min_line_md5"),
        F.max(F.md5("value")).alias("max_line_md5"),
    )
