"""Sequence packing: concatenate documents in a deterministic order
and split at a fixed token budget -- the standard LLM-pretraining step
that turns variable-length documents into fixed-size training
sequences (concat-and-chunk packing, as in GPT/T5 data pipelines).

Packing is embarrassingly parallel *per output shard*: real pipelines
never pack globally (a global greedy pack is a serial scan); they
hash-shard the corpus, order each shard deterministically, and pack
within the shard. That is exactly the shape here -- the only wide
exchange is the 16-way shard partition, and the running token sum is a
per-shard window, so the plan scales linearly with shard count.

All arithmetic is integer (token counts, cumulative sums, integer
div), so the oracle matches bit-for-bit with no float discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark.functions.sharding import (
    shard_col,
    shard_sql,
    shuffle_key,
)
from discogs_xml_to_parquet_spark.registry import query
from discogs_xml_to_parquet_spark.tables import load

CAPACITY = 256  # tokens per packed training sequence / bin budget


@query(
    "q_pack_sequences",
    oracle=f"""
WITH keyed AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_tokens,
         md5(CAST(doc_id AS VARCHAR)) AS skey,
         {shard_sql("doc_id")} AS shard
  FROM documents
),
packed AS (
  SELECT shard, doc_id, n_tokens,
         CAST(SUM(n_tokens) OVER (
           PARTITION BY shard ORDER BY skey, doc_id
           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
  FROM keyed
)
SELECT CAST(shard AS INT) AS shard,
       (cum_tokens - n_tokens) // {CAPACITY} AS seq_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
       MIN(doc_id) AS first_doc
FROM packed
GROUP BY shard, seq_id
ORDER BY shard, seq_id
""",
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing: documents are ordered by their md5
    shuffle key within each of 16 hash shards, the running token count
    is a per-shard window cumsum, and a document belongs to the packed
    sequence its *starting* offset falls into
    (seq_id = start_offset div capacity). The output is the packing
    manifest (docs and tokens per sequence) a writer task would follow;
    sequences average capacity tokens with boundary docs spanning two
    sequences, the usual concat-packing semantics."""
    d = load(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_tokens"),
        shuffle_key("doc_id").alias("skey"),
        shard_col("doc_id").alias("shard"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("skey", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = keyed.withColumn(
        "cum_tokens", F.sum("n_tokens").over(w)
    ).withColumn(
        "seq_id",
        F.expr(f"(cum_tokens - n_tokens) div {CAPACITY}"),
    )
    return (
        packed.groupBy("shard", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("shard", "seq_id")
    )


# --- boundary-preserving greedy packing (r14) ------------------------

def greedy_pack_pandas(pdf):
    """One shard's next-fit scan: documents in deterministic (skey,
    doc_id) order fill the current bin until the next document would
    overflow CAPACITY, then a new bin opens. A document is NEVER
    split (the q_pack_sequences concat-and-chunk lane is the
    splitting variant); an oversize document (> CAPACITY tokens)
    occupies a bin alone -- the recurrence handles it with no special
    case, because its fill immediately exceeds the budget and the
    next document must open a new bin."""
    pdf = pdf.sort_values(["skey", "doc_id"]).reset_index(drop=True)
    bins = []
    bin_id, fill = 0, 0
    for i, n in enumerate(pdf["n_tokens"]):
        n = int(n)
        if i > 0 and fill + n > CAPACITY:
            bin_id += 1
            fill = n
        else:
            fill += n
        bins.append(bin_id)
    out = pdf[["shard", "doc_id", "n_tokens"]].copy()
    out["bin_id"] = bins
    return out


@query(
    "q_pack_greedy",
    oracle=f"""
WITH RECURSIVE keyed AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         md5(CAST(doc_id AS VARCHAR)) AS skey,
         {shard_sql("doc_id")} AS shard
  FROM documents
),
t AS (
  SELECT shard, doc_id, n_tokens,
         ROW_NUMBER() OVER (PARTITION BY shard
                            ORDER BY skey, doc_id) AS rn
  FROM keyed
),
packed AS (
  SELECT shard, rn, doc_id, n_tokens,
         CAST(0 AS BIGINT) AS bin_id, n_tokens AS fill
  FROM t WHERE rn = 1
  UNION ALL
  SELECT t.shard, t.rn, t.doc_id, t.n_tokens,
         CASE WHEN p.fill + t.n_tokens > {CAPACITY}
              THEN p.bin_id + 1 ELSE p.bin_id END,
         CASE WHEN p.fill + t.n_tokens > {CAPACITY}
              THEN t.n_tokens ELSE p.fill + t.n_tokens END
  FROM packed p JOIN t ON t.shard = p.shard AND t.rn = p.rn + 1
)
SELECT CAST(shard AS INT) AS shard, bin_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
       MIN(doc_id) AS first_doc
FROM packed
GROUP BY shard, bin_id
ORDER BY shard, bin_id
""",
)
def q_pack_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boundary-preserving greedy (next-fit) packing: the variant
    real pipelines use when cross-document attention contamination is
    unacceptable -- no document is ever split across training
    sequences, so bins under-fill instead of chunking (the padding
    cost IS the boundary guarantee; q_pack_sequences is the splitting
    twin). The per-shard scan is a genuine sequential recurrence (the
    bin boundary depends on every prior fill -- not a prefix-sum
    floor, not window-expressible), which is exactly the documented
    Pandas escape hatch: hash-shard the corpus (the only wide
    exchange), run each shard's O(|shard|) scan as one Arrow-batched
    applyInPandas group, deterministic by the engine-portable md5
    order. The DuckDB oracle spells the identical recurrence as a
    recursive CTE (one frontier row per shard per step), so every
    bin boundary is pinned cell-exact -- including oversize documents
    occupying bins alone.

    Scale shape: shard fan-out bounds each task at |corpus|/16 rows of
    (id, count) pairs -- at 100 TB the shard constant generalizes to
    O(corpus/target-task-rows) and the scan stays map-shaped after one
    exchange; output is one manifest row per bin."""
    d = load(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        shuffle_key("doc_id").alias("skey"),
        shard_col("doc_id").alias("shard"),
    )
    assigned = keyed.groupBy("shard").applyInPandas(
        greedy_pack_pandas,
        "shard int, doc_id long, n_tokens bigint, bin_id bigint",
    )
    return (
        assigned.groupBy("shard", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("shard", "bin_id")
    )
