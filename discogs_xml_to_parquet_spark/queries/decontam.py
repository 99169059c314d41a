"""Benchmark decontamination: flag training documents that share any
word n-gram with a held-out evaluation set.

This is the standard contamination check run before LLM training
(n-gram overlap against eval benchmarks). Production uses 13-grams
over real prose; the synthetic corpus averages ~55 words per doc, so
the query uses 4-grams to exercise the identical plan shape with a
non-vacuous result (19 contaminated docs at sf0.01 -- verified against
the data; a 13-gram run here would green on an empty set, the round-1
vacuous-query lesson).

Scale shape: the eval side (benchmark suites) is tiny and static -- its
distinct grams broadcast to every executor; the training side is one
map-only explode feeding a broadcast hash join, then a per-doc
aggregate. No shuffle touches the 100 TB side until the (contaminated
docs only) aggregate, so the pass is scan-bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark.operators import dedup as D
from discogs_xml_to_parquet_spark.registry import query
from discogs_xml_to_parquet_spark.tables import load_spread

NGRAM = 4
EVAL_MODULUS = 50  # doc_id % 50 == 0 plays the held-out benchmark set


@query(
    "q_decontaminate_ngram",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
g AS (
  SELECT DISTINCT doc_id,
         list_aggregate(t[i:i+{NGRAM - 1}], 'string_agg', ' ') AS gram
  FROM tok,
       LATERAL (SELECT unnest(generate_series(1, len(t) - {NGRAM - 1}))
                AS i) s
),
ev AS (
  SELECT DISTINCT gram FROM g WHERE doc_id % {EVAL_MODULUS} = 0
)
SELECT g.doc_id,
       COUNT(*) AS n_shared_grams,
       MIN(g.gram) AS example_gram
FROM g JOIN ev USING (gram)
WHERE g.doc_id % {EVAL_MODULUS} <> 0
GROUP BY g.doc_id
ORDER BY g.doc_id
""",
)
def q_decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc distinct 4-grams (word_shingles: zipped shifted slices,
    one split per row -- the O(n)-splits lambda trap is documented on
    the helper) -> the eval partition's gram set, deduped and broadcast
    -> inner hash join from the exploded training grams -> count of
    distinct shared grams per contaminated doc. Grams are distinct per
    doc on both sides (array_distinct / DISTINCT), so n_shared_grams
    counts gram types, not occurrences."""
    d = load_spread(spark, sf_dir, "documents")
    grams = d.select(
        "doc_id",
        F.explode_outer(D.word_shingles(F.col("text"), k=NGRAM)).alias(
            "gram"
        ),
    ).filter(F.col("gram").isNotNull())
    is_eval = F.col("doc_id") % EVAL_MODULUS == 0
    ev = grams.filter(is_eval).select("gram").distinct()
    train = grams.filter(~is_eval)
    return (
        train.join(F.broadcast(ev), "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shared_grams"),
            F.min("gram").alias("example_gram"),
        )
        .orderBy("doc_id")
    )
