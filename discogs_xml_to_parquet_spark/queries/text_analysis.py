"""Text-analysis queries (north-star: language ID, quality scoring,
token counting, fingerprinting), all oracle-checked."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark.operators import text as TX
from discogs_xml_to_parquet_spark.registry import query
from discogs_xml_to_parquet_spark.tables import load, load_spread

_STOP_SQL = "['" + "','".join(TX.ENGLISH_STOPWORDS) + "']"

_SW_ROWS = ",\n  ".join(
    f"('{lang}', '{w}')" for lang, words in TX.STOPWORDS.items() for w in words
)


@query(
    "q_text_stats",
    oracle=f"""
SELECT
  doc_id,
  n_chars,
  len(string_split(text, ' ')) AS n_tokens,
  len(list_distinct(string_split(text, ' '))) AS n_unique_tokens,
  list_sum(list_transform(string_split(text, ' '), x -> length(x)))
    / len(string_split(text, ' ')) AS avg_token_len,
  len(list_distinct(string_split(text, ' ')))
    / len(string_split(text, ' ')) AS unique_ratio,
  len(list_intersect(list_distinct(string_split(text, ' ')), {_STOP_SQL})) AS stopword_hits
FROM documents
ORDER BY doc_id
""",
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token statistics: counts, diversity, stopword hits.
    Pure per-row array math -- computed in the scan stage at any scale."""
    d = load(spark, sf_dir, "documents")
    return TX.token_stats(d).select(
        "doc_id",
        "n_chars",
        "n_tokens",
        "n_unique_tokens",
        "avg_token_len",
        "unique_ratio",
        "stopword_hits",
    ).orderBy("doc_id")


@query(
    "q_text_quality",
    oracle=f"""
WITH s AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_distinct(string_split(text, ' ')))
           / len(string_split(text, ' ')) AS unique_ratio
  FROM documents
)
SELECT doc_id,
       (unique_ratio + least(n_tokens / 50.0, 1.0)) / 2 AS quality_score
FROM s
ORDER BY doc_id
""",
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: diversity + length components, the filter stage
    of a data-curation pipeline (keep WHERE quality_score >= tau)."""
    d = load(spark, sf_dir, "documents")
    return (
        TX.quality_score(TX.token_stats(d))
        .select("doc_id", "quality_score")
        .orderBy("doc_id")
    )


@query(
    "q_text_langid",
    oracle=f"""
WITH sw(lang, word) AS (VALUES
  {_SW_ROWS}
),
hits AS (
  SELECT doc_id, lang, COUNT(*) AS hits
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents) t
  JOIN sw USING (word)
  GROUP BY doc_id, lang
),
best AS (
  SELECT doc_id, lang AS pred_lang, hits,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY hits DESC, lang) AS rk
  FROM hits
)
SELECT d.doc_id,
       COALESCE(b.pred_lang, 'und') AS pred_lang,
       COALESCE(b.hits, 0) AS hits
FROM documents d
LEFT JOIN (SELECT * FROM best WHERE rk = 1) b ON d.doc_id = b.doc_id
ORDER BY d.doc_id
""",
)
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID by stopword overlap: explode -> broadcast-join the
    KB-sized stopword dim -> argmax per doc. The corpus shuffles only
    (doc_id, lang, count) rows."""
    d = load(spark, sf_dir, "documents")
    return TX.language_id(d).orderBy("doc_id")


@query(
    "q_text_token_regex",
    oracle="""
SELECT
  doc_id,
  len(string_split(text, ' ')) AS ws_tokens,
  len(regexp_extract_all(text, '[a-z]+')) AS alpha_tokens,
  len(regexp_extract_all(text, '[0-9]+')) AS num_tokens,
  length(text) - length(replace(text, ' ', '')) AS n_spaces
FROM documents
WHERE doc_id < 200
ORDER BY doc_id
""",
)
def q_text_token_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace split, BPE-ish regex runs
    ([a-z]+ / [0-9]+ -- patterns chosen inside the RE2/Java-regex common
    subset), and raw space count."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit("[a-z]+"), F.lit(0))).alias("alpha_tokens"),
        F.size(F.regexp_extract_all("text", F.lit("[0-9]+"), F.lit(0))).alias("num_tokens"),
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))).alias("n_spaces"),
    ).orderBy("doc_id")


@query(
    "q_text_fingerprint",
    oracle="""
WITH sh AS (
  SELECT doc_id, text,
         list_transform(
           list_distinct(list_transform(
             generate_series(1, greatest(len(string_split(text, ' ')) - 2, 0)),
             i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] || ' ' || string_split(text, ' ')[i+2])),
           s -> md5(s)) AS hashed
  FROM documents
)
SELECT doc_id,
       md5(trim(lower(text))) AS content_md5,
       list_min(hashed) AS min_shingle_md5,
       list_max(hashed) AS max_shingle_md5
FROM sh
ORDER BY doc_id
""",
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprints: normalized full-text md5 + min/max shingle
    hashes (a 2-hash winnowing sketch robust to local edits). Spread:
    per-row md5-fold compute over a single-file source."""
    d = load_spread(spark, sf_dir, "documents")
    return TX.fingerprint(d).orderBy("doc_id")


@query(
    "q_text_rolling_winnow",
    oracle="""
WITH h AS (
  SELECT doc_id,
         list_transform(generate_series(1, greatest(length(text) - 3, 0)), i ->
           ((((ord(text[i]) * 31 + ord(text[i+1])) * 31 + ord(text[i+2])) * 31
             + ord(text[i+3])) % 2147483647)) AS hs
  FROM documents
)
SELECT doc_id,
       len(hs) AS n_windows,
       list_min(hs) AS min_hash,
       CASE WHEN len(hs) = 0 THEN NULL ELSE
         md5(list_aggregate(
           list_transform(generate_series(0, CAST(ceil(len(hs) / 8.0) AS BIGINT) - 1),
             b -> CAST(list_min(hs[b * 8 + 1 : b * 8 + 8]) AS VARCHAR)),
           'string_agg', ','))
       END AS winnow_md5
FROM h
ORDER BY doc_id
""",
)
def q_text_rolling_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprint (Rabin-Karp 4-char window
    polynomial + winnowing min-per-8-window selection, Schleimer et
    al.) -- character-granular near-dup/plagiarism evidence, unlike the
    word-shingle fingerprints. The winnowed selection is emitted as an
    md5 over the block minimums so the whole selection is value-checked
    cross-engine. Two selects with a repartition barrier between hash
    computation and block selection (the block lambda references the
    hash array per block -- the projection-collapse discipline)."""
    d = load_spread(spark, sf_dir, "documents")
    hs = d.select(
        "doc_id", TX.rolling_window_hashes(F.col("text")).alias("hs")
    ).repartition("doc_id")
    sel = TX.winnow_select(F.col("hs"))
    return hs.select(
        "doc_id",
        F.size("hs").cast("bigint").alias("n_windows"),
        F.array_min("hs").alias("min_hash"),
        F.when(
            F.size("hs") > 0,
            F.md5(F.concat_ws(",", F.transform(sel, lambda x: x.cast("string")))),
        ).alias("winnow_md5"),
    ).orderBy("doc_id")


_TRIGRAM_ROWS = ",\n  ".join(
    "('{}', '{}')".format(lang, g.replace("'", "''"))
    for lang, grams in TX.TRIGRAM_PROFILES.items()
    for g in grams
)


@query(
    "q_text_langid_ngram",
    oracle=f"""
WITH prof(lang, trigram) AS (VALUES
  {_TRIGRAM_ROWS}
),
doc_grams AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           generate_series(1, greatest(length(' ' || lower(text) || ' ') - 2, 0)),
           i -> substring(' ' || lower(text) || ' ', i, 3)))) AS trigram
  FROM documents
),
hits AS (
  SELECT doc_id, lang, COUNT(*) AS hits
  FROM doc_grams JOIN prof USING (trigram)
  GROUP BY doc_id, lang
),
best AS (
  SELECT doc_id, lang AS pred_lang, hits,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY hits DESC, lang) AS rk
  FROM hits
)
SELECT d.doc_id,
       COALESCE(b.pred_lang, 'und') AS pred_lang,
       COALESCE(b.hits, 0) AS hits
FROM documents d
LEFT JOIN (SELECT * FROM best WHERE rk = 1) b ON d.doc_id = b.doc_id
ORDER BY d.doc_id
""",
)
def q_text_langid_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram language ID (Cavnar-Trenkle-style n-gram
    heuristic, complementing the word-level stopword variant): distinct
    doc trigrams join the broadcast per-language trigram profiles
    (derived deterministically from the stopword lists, shared with the
    oracle), argmax overlap per doc."""
    d = load(spark, sf_dir, "documents")
    return TX.language_id_ngram(d).orderBy("doc_id")
