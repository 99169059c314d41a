"""Tokenizer-training primitives: the corpus-statistics inner loop of
BPE/WordPiece vocabulary construction.

Full BPE training alternates (count adjacent symbol pairs) -> (merge
the argmax pair) for tens of thousands of rounds; the count step is
the only part that touches the corpus and therefore the only part that
matters at 100 TB -- the merge bookkeeping is vocabulary-sized and
driver-local in every real trainer (Sennrich et al. 2016). The query
implements that count step exactly: word frequencies first (one
corpus-sized but map-side-combined shuffle), then character-pair
counts weighted by word frequency over the DISTINCT-word table, which
is orders of magnitude smaller than the corpus -- the same
collapse-to-domain trick as the equi-depth histogram.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark.registry import query
from discogs_xml_to_parquet_spark.tables import load

_TOP = 30


@query(
    "q_bpe_pair_counts",
    oracle=f"""
WITH words AS (
  SELECT w, COUNT(*) AS wc
  FROM (SELECT unnest(list_filter(string_split_regex(text, '\\s+'),
                                  x -> x <> '')) AS w
        FROM documents)
  GROUP BY w
), pairs AS (
  SELECT w[i] || w[i+1] AS pair, wc
  FROM words,
       LATERAL (SELECT unnest(generate_series(1, length(w) - 1)) AS i) s
  WHERE length(w) >= 2
)
SELECT pair, CAST(SUM(wc) AS BIGINT) AS n
FROM pairs
GROUP BY pair
ORDER BY n DESC, pair
LIMIT {_TOP}
""",
)
def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-weighted adjacent-character-pair counts -- the BPE
    count step. Phase 1 collapses the corpus to (word, frequency)
    with a map-side-combining groupBy; phase 2 explodes each DISTINCT
    word's length-1 pair positions and sums frequencies per pair. The
    corpus is touched exactly once; everything after runs on the
    vocabulary (bounded by distinct words, not tokens). Top pairs via
    TakeOrdered heap with the pair string as tiebreak. Counts are
    integers -- cross-engine hash-exact."""
    d = load(spark, sf_dir, "documents")
    words = (
        d.select(
            F.explode(
                F.filter(F.split("text", r"\s+"), lambda x: x != "")
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    pairs = (
        words.filter(F.length("w") >= 2)
        .select(
            "wc",
            F.explode(
                F.expr(
                    "transform(sequence(1, length(w) - 1),"
                    " i -> substring(w, i, 2))"
                )
            ).alias("pair"),
        )
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wc").cast("bigint").alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(_TOP)
    )
