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
