"""Text operators beyond the analysis/quality families: sliding-window
chunking (the RAG/context-window prep step), capped token
co-occurrence (PMI-style vocabulary statistics), and all-match regex
extraction.

Chunking and extraction are map-only (explode of per-row computed
arrays, no shuffle until the optional rollup); co-occurrence bounds the
quadratic pair blow-up with a per-document top-K token cap BEFORE the
self-join, the same cap-then-join discipline as the dedup family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark.registry import query
from discogs_xml_to_parquet_spark.tables import load

_CHUNK = 16   # tokens per chunk
_STRIDE = 12  # tokens between chunk starts (overlap = _CHUNK - _STRIDE)


@query(
    "q_chunk_documents",
    oracle=f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS tokens
  FROM documents
), starts AS (
  SELECT doc_id, tokens,
         UNNEST(generate_series(0, len(tokens) - 1, {_STRIDE})) AS start
  FROM toks
  WHERE len(tokens) >= 1
)
SELECT doc_id,
       CAST(start / {_STRIDE} AS INT) AS chunk_no,
       CAST(LEAST({_CHUNK}, len(tokens) - start) AS INT) AS n_chunk_tokens,
       array_to_string(tokens[start + 1 : start + {_CHUNK}], ' ') AS chunk_text
FROM starts
ORDER BY doc_id, chunk_no
""",
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking ({_CHUNK}-token chunks, stride
    {_STRIDE}, {_CHUNK - _STRIDE}-token overlap): the prep step for any
    context-window-bounded consumer (embedding models, RAG indexing).
    Map-only: tokens, starts and slices are per-row higher-order
    expressions inside one projection -- no shuffle, no UDF, nothing
    driver-side, so throughput is scan-bound at any scale."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.filter(F.split("text", r"\s+"), lambda t: t != "").alias("tokens"),
    ).filter(F.size("tokens") >= 1)
    starts = toks.select(
        "doc_id",
        "tokens",
        F.explode(
            F.sequence(F.lit(0), F.size("tokens") - 1, F.lit(_STRIDE))
        ).alias("start"),
    )
    return starts.select(
        "doc_id",
        (F.col("start") / _STRIDE).cast("int").alias("chunk_no"),
        F.least(F.lit(_CHUNK), F.size("tokens") - F.col("start"))
        .cast("int")
        .alias("n_chunk_tokens"),
        F.array_join(
            F.slice("tokens", F.col("start") + 1, F.lit(_CHUNK)), " "
        ).alias("chunk_text"),
    ).orderBy("doc_id", "chunk_no")


_CAP = 32     # max tokens per doc entering the pair join
_TOP_PAIRS = 50


@query(
    "q_token_cooccurrence",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, UNNEST(
    list_filter(string_split_regex(lower(text), '[^a-z]+'),
                t -> length(t) >= 4)) AS token
  FROM documents
), counted AS (
  SELECT doc_id, token, COUNT(*) AS n
  FROM tok GROUP BY doc_id, token
), capped AS (
  SELECT doc_id, token FROM (
    SELECT doc_id, token,
           ROW_NUMBER() OVER (PARTITION BY doc_id
                              ORDER BY n DESC, token) AS rn
    FROM counted
  ) WHERE rn <= {_CAP}
)
SELECT a.token AS token_a, b.token AS token_b,
       COUNT(*) AS n_docs
FROM capped a JOIN capped b
  ON a.doc_id = b.doc_id AND a.token < b.token
GROUP BY a.token, b.token
ORDER BY n_docs DESC, token_a, token_b
LIMIT {_TOP_PAIRS}
""",
)
def q_token_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-level token co-occurrence (the counting core of PMI /
    association mining). The quadratic danger is bounded BEFORE the
    self-join: per-doc distinct tokens are capped to the {_CAP} most
    frequent (deterministic count-desc/token-asc rank), so a document
    contributes at most C({_CAP},2) pairs no matter how long it is --
    the same cap-then-join discipline as the LSH candidate paths. The
    join itself is a doc_id equi-join (no theta), and the final top-K
    is a TakeOrdered heap, not a global sort."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.lower("text"), "[^a-z]+"),
                lambda t: F.length(t) >= 4,
            )
        ).alias("token"),
    )
    counted = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("n"), "token")
    capped = (
        counted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _CAP)
        .select("doc_id", "token")
    )
    a = capped.alias("a")
    b = capped.alias("b")
    return (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.token") < F.col("b.token")),
        )
        .groupBy(
            F.col("a.token").alias("token_a"),
            F.col("b.token").alias("token_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(F.desc("n_docs"), "token_a", "token_b")
        .limit(_TOP_PAIRS)
    )


@query(
    "q_regex_extract_all",
    oracle="""
WITH m AS (
  SELECT doc_id,
         UNNEST(regexp_extract_all(lower(text), '[a-z]{5,}')) AS token
  FROM documents
)
SELECT token,
       COUNT(*) AS n_occurrences,
       COUNT(DISTINCT doc_id) AS n_docs
FROM m
GROUP BY token
ORDER BY n_occurrences DESC, token
LIMIT 20
""",
)
def q_regex_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-match regex extraction (regexp_extract_all): the engine-side
    counterpart of tokenizer/scrubber passes -- every >=5-letter run is
    extracted per row inside codegen, exploded, and rolled up. Map-only
    until the final two-phase aggregate; top-K is a heap."""
    d = load(spark, sf_dir, "documents")
    m = d.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z]{5,}"), 0)
        ).alias("token"),
    )
    return (
        m.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), "token")
        .limit(20)
    )
