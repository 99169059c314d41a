"""Training-data pipeline operators beyond the dedup/similarity core:
deterministic sampling, PII-style redaction, shared-span (substring)
duplicate detection, and partial-aggregate rollup reuse.

The reference (src/main.rs) is a converter with no query surface; these
are brief-required LLM-pipeline extensions, each expressed with JVM-side
built-ins (no Python in the hot path) and mirrored exactly in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark.functions.exact import dsum, scaled, unscale
from discogs_xml_to_parquet_spark.operators import dedup as D
from discogs_xml_to_parquet_spark.registry import query
from discogs_xml_to_parquet_spark.tables import load, load_spread

# Stand-in blocklist lexicon: in production this is the configurable
# PII/unsafe-term list; the synthetic corpus has no emails/phones, so
# the pattern targets terms that actually occur (a 0-hit redaction
# would verify nothing -- round-1 lesson on vacuous greens).
_REDACT_PATTERN = r"\b(customer|spark|vector)\b"


@query(
    "q_pii_redact",
    oracle=f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_REDACT_PATTERN}')) AS BIGINT)
         AS n_hits,
       md5(regexp_replace(text, '{_REDACT_PATTERN}', '[REDACTED]', 'g'))
         AS redacted_md5,
       CAST(length(regexp_replace(text, '{_REDACT_PATTERN}', '[REDACTED]', 'g'))
         AS BIGINT) AS redacted_len
FROM documents
ORDER BY doc_id
""",
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex redaction over the corpus: count blocklist hits per doc and
    rewrite them to [REDACTED]. Pure per-row JVM string ops (codegen'd,
    no shuffle beyond the final presentation sort) -- the shape scales
    to 100 TB as a map-only pass. The rewritten text is value-checked
    via md5 + length; the oracle runs the identical RE2-compatible
    pattern with the global flag."""
    d = load(spark, sf_dir, "documents")
    redacted = F.regexp_replace("text", _REDACT_PATTERN, "[REDACTED]")
    return d.select(
        "doc_id",
        F.regexp_count("text", F.lit(_REDACT_PATTERN))
        .cast("long")
        .alias("n_hits"),
        F.md5(redacted).alias("redacted_md5"),
        F.length(redacted).cast("long").alias("redacted_len"),
    ).orderBy("doc_id")


@query(
    "q_sample_hash",
    oracle="""
SELECT l_returnflag,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(floor((l_quantity) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000 AS sum_qty
FROM lineitem
WHERE substring(md5(CAST(l_orderkey AS VARCHAR) || '-'
                    || CAST(l_linenumber AS VARCHAR)), 1, 1) = '0'
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash sampling: keep the ~1/16 of rows whose md5 of
    the primary key starts with '0', then aggregate the sample. This is
    the reproducible-subset operator of a training pipeline (same rows
    selected on any cluster, any partitioning, any engine -- unlike
    TABLESAMPLE/rand()); md5 is engine-independent so the oracle selects
    the identical rows. Map-side filter, no extra shuffle."""
    li = load(spark, sf_dir, "lineitem")
    key = F.md5(F.concat_ws("-", "l_orderkey", "l_linenumber"))
    return (
        li.filter(F.substring(key, 1, 1) == "0")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum("l_quantity").alias("sum_qty"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q_dedup_span_shingles",
    oracle="""
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
sp AS (
  SELECT DISTINCT doc_id,
         md5(list_aggregate(t[i:i+7], 'string_agg', ' ')) AS span
  FROM tok,
       LATERAL (SELECT unnest(generate_series(1, len(t) - 7)) AS i) g
)
SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS shared_spans
FROM sp a
JOIN sp b ON a.span = b.span AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING COUNT(*) >= 3
ORDER BY id1, id2
""",
)
def q_dedup_span_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared-span (substring) duplicate detection, the Lee et al.
    'Deduplicating Training Data Makes Language Models Better' shape
    reduced to word 8-grams: documents sharing >= 3 distinct 8-token
    spans are near-duplicate candidates. Per-row span extraction is the
    zip-shifted slice fold (operators/dedup.word_shingles -- one split
    per row, no per-element re-evaluation), spans are md5'd so the
    shuffle carries 32-byte keys, and the only wide op is the equi-join
    on span -- never an all-pairs comparison. At 100 TB the span join
    is the same banded shape as MinHash LSH with exact (not
    probabilistic) span matching."""
    d = load_spread(spark, sf_dir, "documents")
    # explode_outer: plain explode would let InferFiltersFromGenerate
    # push a size()>0 filter into the scan stage and re-run the whole
    # shingle fold there (pyspark-perf-pitfalls)
    sp = d.select(
        "doc_id",
        F.explode_outer(
            F.transform(
                D.word_shingles(F.col("text"), 8), lambda s: F.md5(s)
            )
        ).alias("span"),
    )
    a, b = sp.alias("a"), sp.alias("b")
    return (
        a.join(
            b,
            (F.col("a.span") == F.col("b.span"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2")
        )
        .agg(F.count(F.lit(1)).alias("shared_spans"))
        .filter(F.col("shared_spans") >= 3)
        .orderBy("id1", "id2")
    )


@query(
    "q_rollup_reuse_hourly_daily",
    oracle="""
SELECT strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS day,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(floor((value) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000 AS total_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def q_rollup_reuse_hourly_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate reuse (the hypertable rollup pattern): the
    daily aggregate is computed FROM the hourly partial aggregate --
    counts sum, integer-scaled exact sums sum -- never from raw rows. The oracle
    aggregates the raw table directly, so the hash proves the partials
    compose losslessly (scaled-integer addition is associative; double
    sums would not be). At 100 TB this is the difference between scanning a
    day of raw events and scanning 24 pre-aggregated rows per key."""
    e = load(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("c"),
        F.sum(scaled("value").cast("decimal(38,0)")).alias("v"),  # exact partial
    )
    return (
        hourly.groupBy(
            F.date_format(F.date_trunc("day", "hour"), "yyyy-MM-dd").alias(
                "day"
            ),
            "event_type",
        )
        .agg(
            F.sum("c").alias("n_events"),
            unscale(F.sum("v")).alias("total_value"),
        )
        .orderBy("day", "event_type")
    )
