"""Python extension surface: vectorized pandas UDFs (scalar + grouped
agg) and applyInPandas group transforms (SURVEY.md §2.B 'UDF/UDAF').

These exist to prove the Arrow-batched extension path, so they compute
deterministic integer/exact arithmetic (a pandas float sum would be
order-dependent and break the oracle). The guidance stands: built-ins
first; pandas UDFs only for logic Catalyst cannot express -- here they
deliberately mirror expressible logic so the oracle can check the
plumbing itself.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from discogs_xml_to_parquet_spark.registry import query
from discogs_xml_to_parquet_spark.tables import load


def _scaled_qty_udf():
    # created lazily: decorating at module import would require an
    # active SparkSession before the registry can even be listed
    @pandas_udf("bigint")
    def _scaled_qty(qty: pd.Series, disc: pd.Series) -> pd.Series:
        # exact integer math on Arrow batches: qty cents minus discount bps
        return (qty * 100).astype("int64") - (disc * 1000).round().astype("int64")

    return _scaled_qty


@query(
    "q_pandas_udf_scalar",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(l_quantity * 100 AS BIGINT) - CAST(round(l_discount * 1000) AS BIGINT) AS scaled
FROM lineitem
WHERE l_linenumber = 2 AND l_quantity > 45
ORDER BY l_orderkey, l_linenumber
""",
)
def q_pandas_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF: Arrow batches in, vectorized numpy math,
    Arrow batches out -- the 10-100x-over-row-UDF path when Python is
    unavoidable. (l_quantity is integral-valued and l_discount is in
    {0.00..0.10}, so the cents/bps conversion is exact in both
    engines.)"""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_linenumber") == 2) & (F.col("l_quantity") > 45)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        _scaled_qty_udf()("l_quantity", "l_discount").alias("scaled"),
    ).orderBy("l_orderkey", "l_linenumber")


def _qty_units_sum_udf():
    @pandas_udf("bigint")
    def _qty_units_sum(qty: pd.Series) -> int:
        # grouped-agg pandas UDF; integer sum => order-independent
        return int((qty * 100).astype("int64").sum())

    return _qty_units_sum


@query(
    "q_pandas_udf_grouped_agg",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CAST(l_quantity * 100 AS BIGINT)) AS BIGINT) AS qty_units
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def q_pandas_udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (a UDAF over Arrow batches). Note
    the scale caveat: unlike built-in aggregates there is no partial
    map-side combine -- each group's values ship to one executor. Keep
    for algorithms that truly need the whole group in memory."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(_qty_units_sum_udf()("l_quantity").alias("qty_units"))
        .orderBy("l_returnflag")
    )


@query(
    "q_python_udtf",
    oracle="""
SELECT doc_id, word, length(word) AS word_len
FROM (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word
  FROM documents WHERE doc_id < 20
)
WHERE length(word) > 4
ORDER BY doc_id, word, word_len
""",
)
def q_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function): one input row -> many output rows
    via LATERAL, the row-expanding extension point (parsers, chunkers,
    tokenizers that need Python). Registered lazily per session."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word string, word_len int")
    class SplitLongWords:
        def eval(self, text: str):
            for w in text.split(" "):
                if len(w) > 4:
                    yield w, len(w)

    spark.udtf.register("split_long_words", SplitLongWords)
    load(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 20
    ).createOrReplaceTempView("docs_udtf_v")
    return spark.sql("""
        SELECT doc_id, s.word, s.word_len
        FROM docs_udtf_v, LATERAL split_long_words(text) s
        ORDER BY doc_id, word, word_len
    """)


@query(
    "q_apply_in_pandas",
    oracle="""
SELECT c_mktsegment, c_custkey,
       CAST(rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS BIGINT) AS bal_rank
FROM customer
WHERE c_custkey <= 300
ORDER BY c_mktsegment, bal_rank, c_custkey
""",
)
def q_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas: whole-group pandas transform (per-segment ranking
    here; the shape used for per-group model scoring / normalization
    when the computation genuinely needs the full group). Each group
    must fit in one executor's memory -- partition keys are chosen with
    bounded group size."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 300)

    def rank_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["c_acctbal", "c_custkey"], ascending=[False, True]
        ).reset_index(drop=True)
        out = pdf[["c_mktsegment", "c_custkey"]].copy()
        # rank() semantics: min-rank with ties shared, matching the SQL
        # oracle's RANK() OVER (ORDER BY c_acctbal DESC) exactly
        out["bal_rank"] = pdf["c_acctbal"].rank(
            method="min", ascending=False
        ).astype("int64")
        return out

    return (
        c.select("c_mktsegment", "c_custkey", "c_acctbal")
        .groupBy("c_mktsegment")
        .applyInPandas(
            rank_group, "c_mktsegment string, c_custkey bigint, bal_rank bigint"
        )
        .orderBy("c_mktsegment", "bal_rank")
    )
