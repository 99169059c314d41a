"""Nested-data compute: explode, array functions, collect-based
reconstruction (SURVEY.md §2.B 'Nested access / flatten' +
'Array/map fns').

The reference *writes* nested data (array<struct> columns,
main.rs:192-217) but never reads it back; these queries supply the
read/compute side over the documents table's text treated as arrays.

Scale notes: explode multiplies rows before any shuffle -- always
project to the minimal columns first so the exploded stage carries only
(key, element). collect_set/collect_list are per-group state: bound the
group cardinality (here: 5 langs) or cap with slice() before collecting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark.registry import query
from discogs_xml_to_parquet_spark.tables import load


@query(
    "q_explode_wordcount",
    oracle="""
SELECT word, COUNT(*) AS n
FROM (
  SELECT unnest(string_split(text, ' ')) AS word
  FROM documents
  WHERE lang = 'en'
)
WHERE word <> ''
GROUP BY word
ORDER BY n DESC, word
LIMIT 20
""",
)
def q_explode_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical explode: tokenize, flatten, count, top-20.
    Projection to just `text` happens before the explode so the
    row-multiplied stage is one column wide."""
    d = load(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "word")
        .limit(20)
    )


@query(
    "q_array_ops",
    oracle="""
SELECT
  doc_id,
  len(string_split(text, ' ')) AS n_tokens,
  len(list_distinct(string_split(text, ' '))) AS n_unique,
  list_contains(string_split(text, ' '), 'spark') AS has_spark,
  list_sort(string_split(text, ' '))[1] AS first_token_sorted,
  list_sort(string_split(text, ' '))[-1] AS last_token_sorted,
  string_split(text, ' ')[1] AS first_token,
  len(list_filter(string_split(text, ' '), t -> length(t) > 4)) AS n_long_tokens
FROM documents
WHERE doc_id < 100
ORDER BY doc_id
""",
)
def q_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array compute without explode: size, dedup, membership, sort +
    element access, lambda filter -- all JVM higher-order functions, no
    row multiplication, no shuffle."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.array_sort(toks).getItem(0).alias("first_token_sorted"),
        F.element_at(F.array_sort(toks), -1).alias("last_token_sorted"),
        toks.getItem(0).alias("first_token"),
        F.size(F.filter(toks, lambda t: F.length(t) > 4)).alias("n_long_tokens"),
    ).orderBy("doc_id")


@query(
    "q_nested_collect",
    oracle="""
SELECT
  lang,
  COUNT(*) AS n_docs,
  string_agg(source, ',' ORDER BY source) AS sources_sorted
FROM (SELECT DISTINCT lang, source FROM documents)
GROUP BY lang
ORDER BY lang
""",
)
def q_nested_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group -> collect_set -> sort -> serialize: rebuilding a nested
    value per group and emitting it in a canonical string form (the
    cross-engine-stable way to compare constructed arrays)."""
    d = load(spark, sf_dir, "documents").select("lang", "source").distinct()
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.concat_ws(",", F.array_sort(F.collect_set("source"))).alias("sources_sorted"),
        )
        .orderBy("lang")
    )
