"""Tokenizer APPLICATION: BPE encoding of a corpus under a trained
merge table (r13). q_bpe_pair_counts (vocab.py) is the TRAINING count
step of byte-pair encoding; this module is the other half every
training-data pipeline runs orders of magnitude more often — ENCODE
the corpus with an already-trained merge list.

Algorithm (the Sennrich rank-order sweep): each word starts as its
character sequence; merges are applied in rank order, each rank
replacing ALL current occurrences of its pair left-to-right,
non-overlapping. Both engines implement the IDENTICAL algorithm on the
identical representation — a word is the comma-delimited symbol string
`,c,a,t,` and merge (a, b) is the plain string replacement
`,a,b,` -> `,ab,`:

- comma delimiters on BOTH sides of every symbol make cross-symbol
  false matches impossible (a multi-char symbol can never alias a
  pair boundary), and because the REPLACEMENT restores its trailing
  comma, adjacent merge sites chain correctly in one pass
  (`,s,p,s,p,` -> `,sp,sp,`);
- SQL replace() in Spark and DuckDB both scan left-to-right
  non-overlapping, so overlapping pairs resolve leftmost-first
  (`,a,a,a,` + (a,a) -> `,aa,a,`) — pinned identical in both engines
  by the oracle equality itself.

Scale shape (100 TB): the corpus collapses to the DISTINCT-WORD
domain first (one map-side-combined count aggregate — the same
collapse q_bpe_pair_counts uses), so each distinct word is encoded
exactly once no matter how many times it appears; the merge sweep is
a fixed chain of engine-native string replaces (whole-stage codegen,
zero Python), and corpus frequencies re-enter as the per-word weight
in the final bounded top-K aggregate. The trained merge table is a
literal here, exactly as a production encoder ships its merges file
to every executor.

Reference: no counterpart (the reference is an XML converter,
SURVEY.md §0); the operator is LLM-pipeline coverage, grouped with
vocab.py's training half.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark.registry import query
from discogs_xml_to_parquet_spark.tables import load

# The trained merge list, rank order. Chains several levels deep on
# purpose (spark/order/column/query assemble through 4-5 merges), so
# the sweep's rank ordering is load-bearing, not decorative: (o,r)
# must fire inside 'order' before (c,o) gets a look at 'column'.
_MERGES = [
    ("s", "p"), ("sp", "a"), ("spa", "r"), ("spar", "k"),
    ("o", "r"), ("or", "d"), ("ord", "e"), ("orde", "r"),
    ("c", "o"), ("co", "l"), ("col", "u"), ("colu", "m"),
    ("colum", "n"),
    ("q", "u"), ("qu", "e"), ("que", "r"), ("quer", "y"),
    ("t", "h"), ("a", "n"), ("i", "n"),
    # a self-pair, kept in the trained table deliberately: it pins the
    # leftmost-first non-overlapping semantics on repeated symbols
    # ("zzz" -> [zz, z]) in both engines
    ("z", "z"),
]

_TOP_K = 40


def _enc_sql(col: str) -> str:
    """The nested-replace encoding expression, ONE string shared by
    the Spark plan and the DuckDB oracle so the two sides cannot
    drift: seed = ',' || each char comma-suffixed, then one replace()
    per merge in rank order."""
    expr = f"',' || regexp_replace({col}, '(.)', '$1,')"
    for a, b in _MERGES:
        expr = f"replace({expr}, ',{a},{b},', ',{a}{b},')"
    return expr


# DuckDB's regexp_replace needs the explicit global flag (Spark's is
# global by default) and its capture-group syntax is \1, not $1 --
# the ONLY two dialect differences, applied textually to the shared
# expression.
def _enc_sql_duck(col: str) -> str:
    return _enc_sql(col).replace(
        "'(.)', '$1,'", "'(.)', '\\1,', 'g'")


@query(
    "q_bpe_encode",
    oracle=f"""
WITH tok AS (
  SELECT t.tok AS word
  FROM documents,
       unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS t(tok)
  WHERE t.tok <> ''
),
w AS (SELECT word, COUNT(*) AS freq FROM tok GROUP BY 1),
enc AS (SELECT word, freq, {_enc_sql_duck('word')} AS s FROM w),
sym AS (
  SELECT u.sym AS symbol, word, freq
  FROM enc, unnest(string_split(trim(s, ','), ',')) AS u(sym)
)
SELECT symbol,
       CAST(SUM(freq) AS BIGINT) AS n_occurrences,
       CAST(COUNT(DISTINCT word) AS BIGINT) AS n_words
FROM sym
GROUP BY symbol
ORDER BY n_occurrences DESC, symbol
LIMIT {_TOP_K}
""",
)
def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode the document corpus under the trained merge table and
    report the top-{K} encoded symbols by corpus occurrence count
    (with how many distinct words each symbol appears in). The
    encoding itself is exact and engine-portable (module docstring);
    equality against the oracle therefore pins every merge, in rank
    order, across the whole vocabulary."""
    docs = load(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(
                F.filter(
                    F.split(F.lower("text"), "[^a-z0-9]+"),
                    lambda t: t != "",
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    enc = words.withColumn("s", F.expr(_enc_sql("word")))
    sym = enc.select(
        "word",
        "freq",
        F.explode(
            F.filter(F.split(F.expr("trim(BOTH ',' FROM s)"), ","),
                     lambda t: t != "")
        ).alias("symbol"),
    )
    return (
        sym.groupBy("symbol")
        .agg(
            F.sum("freq").alias("n_occurrences"),
            F.count_distinct("word").alias("n_words"),
        )
        .orderBy(F.col("n_occurrences").desc(), "symbol")
        .limit(_TOP_K)
    )
