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

CAPACITY = 256  # tokens per packed training sequence


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
