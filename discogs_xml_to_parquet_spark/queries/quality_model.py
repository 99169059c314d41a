"""Model-based quality scoring: a hashed linear (fastText-style)
classifier over bag-of-words features -- the CCNet / DCLM quality-
filter shape, separate from the rule-based Gopher filters in
quality.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark.registry import query
from discogs_xml_to_parquet_spark.tables import load_spread

# --- Hashed linear quality classifier ---------------------------------
#
# fastText-style model-based quality scoring (the CCNet / DCLM shape):
# a linear model over hashed bag-of-words features. The weight table is
# DERIVED from the bucket id by a fixed multiplicative hash, so both
# engines rebuild identical "learned" weights with no side file; a real
# deployment broadcasts a trained weight array instead -- same plan, a
# broadcast join (or a literal array) swapped in for the derivation.
_CLF_V = 1024            # hashed feature buckets
_CLF_MULT = 2654435761   # Knuth multiplicative constant
_CLF_RANGE = 2_000_001   # weight in [-1e6, 1e6] ppm

# Horner fold of the first 8 md5 hex digits of a token t -> 32-bit int.
_CLF_H32 = "0"
for _i in range(1, 9):
    _CLF_H32 = (
        f"({_CLF_H32} * 16 + strpos('0123456789abcdef', md5(t)[{_i}]) - 1)"
    )


@query(
    "q_quality_classifier",
    oracle=f"""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS ts
  FROM documents
), scored AS (
  SELECT doc_id,
         CAST(len(ts) AS BIGINT) AS n_tokens,
         list_sum(list_transform(ts, t ->
           (({_CLF_H32} % {_CLF_V}) * {_CLF_MULT}) % {_CLF_RANGE}
             - 1000000)) AS w_sum
  FROM tok WHERE len(ts) >= 1
)
SELECT doc_id, n_tokens,
       CAST(w_sum // n_tokens AS BIGINT) AS score_ppm,
       (w_sum // n_tokens) >= 0 AS keep
FROM scored
ORDER BY doc_id
""",
)
def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear bag-of-hashed-words classifier: token -> bucket (first 8
    md5 hex digits mod {_CLF_V}) -> integer weight in [-1e6, 1e6] ppm
    (multiplicative hash of the bucket), doc score = truncated mean
    token weight (`div` in Spark mirrors DuckDB's `//`, both
    round-toward-zero on negative sums), keep = score >= 0. The whole scorer is ONE JVM
    higher-order fold per row (transform + aggregate over the token
    array) -- map-only, no shuffle until the final tiny sort, which is
    how a model-based quality filter must run over 100 TB (the weight
    table rides along broadcast; scoring never leaves the scan
    pipeline). All integer arithmetic: cross-engine hash-exact."""
    d = load_spread(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.filter(F.split("text", r"\s+"), lambda t: t != "").alias("ts"),
    ).filter(F.size("ts") >= 1)
    bucket = lambda t: (  # noqa: E731
        F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("bigint")
        % _CLF_V
    )
    weight = lambda t: (  # noqa: E731
        (bucket(t) * _CLF_MULT) % _CLF_RANGE - 1_000_000
    )
    scored = toks.select(
        "doc_id",
        F.size("ts").cast("bigint").alias("n_tokens"),
        F.aggregate(
            "ts", F.lit(0).cast("bigint"), lambda acc, t: acc + weight(t)
        ).alias("w_sum"),
    )
    score = F.expr("w_sum div n_tokens")
    return scored.select(
        "doc_id",
        "n_tokens",
        score.cast("bigint").alias("score_ppm"),
        (score >= 0).alias("keep"),
    ).orderBy("doc_id")


# --- Rare-bigram rarity proxy -----------------------------------------
#
# A KenLM-style perplexity filter scores each doc against a corpus
# n-gram LM; its engine-shaped core is "how unusual are this doc's
# n-grams relative to the corpus". The float log-prob sum is engine-
# dependent, so this query keeps the LM integer: a word bigram is RARE
# when its corpus frequency <= _RARE_MAX, and the doc score is the
# ppm fraction of its bigrams that are rare (high = likely gibberish
# or boilerplate-free novel text; low = templated).
_RARE_MAX = 2


@query(
    "q_quality_rare_bigrams",
    oracle=f"""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS ts
  FROM documents
), bg AS (
  SELECT doc_id, ts[i] || ' ' || ts[i+1] AS bigram
  FROM tok,
       LATERAL (SELECT unnest(generate_series(1, len(ts) - 1)) AS i) s
  WHERE len(ts) >= 2
), freq AS (
  SELECT bigram, COUNT(*) AS bf FROM bg GROUP BY bigram
)
SELECT b.doc_id,
       COUNT(*) AS n_bigrams,
       COUNT(*) FILTER (WHERE f.bf <= {_RARE_MAX}) AS n_rare,
       COUNT(*) FILTER (WHERE f.bf <= {_RARE_MAX})
         * 1000000 // COUNT(*) AS rare_ppm
FROM bg b JOIN freq f USING (bigram)
GROUP BY b.doc_id
ORDER BY b.doc_id
""",
)
def q_quality_rare_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rare-bigram fraction per document: corpus bigram frequencies
    (one vocabulary-sized, map-side-combined shuffle), joined back to
    the per-doc bigram stream, aggregated to an integer ppm score.
    The join key is the bigram string, so at 100 TB both sides shuffle
    on vocabulary terms, never documents; a production variant
    broadcasts the (bounded) rare-set instead, exactly like the
    decontamination lane. All counts integer -- hash-exact."""
    d = load_spread(spark, sf_dir, "documents")
    bg = (
        d.select(
            "doc_id",
            F.filter(F.split("text", r"\s+"), lambda t: t != "").alias(
                "ts"
            ),
        )
        .filter(F.size("ts") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.zip_with(
                    F.slice(F.col("ts"), 1, F.size("ts") - 1),
                    F.slice(F.col("ts"), 2, F.size("ts") - 1),
                    lambda x, y: F.concat_ws(" ", x, y),
                )
            ).alias("bigram"),
        )
    )
    freq = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("bf"))
    rare = F.when(F.col("bf") <= _RARE_MAX, 1)
    return (
        bg.join(freq, "bigram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.count(rare).alias("n_rare"),
            F.expr(
                f"count(CASE WHEN bf <= {_RARE_MAX} THEN 1 END)"
                " * 1000000 div count(1)"
            ).alias("rare_ppm"),
        )
        .orderBy("doc_id")
    )
