"""Temporal operators: as-of join (oracle: DuckDB's native ASOF JOIN)
and multimodal feature extraction (oracle: the same deterministic
features computed relationally)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark.operators.asof import asof_join
from discogs_xml_to_parquet_spark.operators.multimodal import (
    attach_payload,
    extract_features,
    resize_payloads,
    sample_frames,
)
from discogs_xml_to_parquet_spark.registry import query
from discogs_xml_to_parquet_spark.tables import load, load_spread


@query(
    "q_asof_join",
    oracle="""
WITH purchases AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
  FROM events WHERE event_type = 'purchase'
),
signups AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, MAX(event_id) AS signup_event_id
  FROM events WHERE event_type = 'signup'
  GROUP BY user_id, CAST(ts AS TIMESTAMP)
)
SELECT p.event_id,
       p.user_id,
       s.signup_event_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       strftime(s.ts, '%Y-%m-%d %H:%M:%S') AS signup_ts
FROM purchases p
ASOF LEFT JOIN signups s
  ON p.user_id = s.user_id AND s.ts <= p.ts
ORDER BY p.event_id
""",
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's most recent
    signup at or before it. Spark lacks ASOF JOIN; operators/asof.py
    composes it from union + last-ignoreNulls window (one shuffle, one
    sort -- SMJ cost, no range explosion). DuckDB's native ASOF JOIN is
    the oracle. Right side deduped per (user, ts) so the carried value
    is deterministic in both engines."""
    e = load(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    signups = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("signup_event_id"))
    )
    joined = asof_join(
        purchases, signups, key="user_id",
        right_payload=["signup_event_id", "ts"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("asof_signup_event_id").alias("signup_event_id"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.date_format("asof_ts", "yyyy-MM-dd HH:mm:ss").alias("signup_ts"),
    ).orderBy("event_id")


@query(
    "q_multimodal_features",
    oracle="""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_bytes,
       md5(text) AS payload_md5,
       CAST(length(text) % 640 AS INT) AS fake_width,
       CAST((length(text) * 7) % 480 AS INT) AS fake_height
FROM documents
ORDER BY doc_id
""",
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end to end: text -> binary payload + metadata
    struct -> Arrow-batched mapInPandas feature extraction. The features
    are deterministic byte-level stand-ins (real decoders aren't in this
    container -- operators/multimodal.py), which makes even the pandas
    stage oracle-checkable: the oracle recomputes them relationally.
    ASCII text means n_bytes == n_chars on the DuckDB side. Spread so
    the Arrow/pandas stage gets parallel batches from the single-file
    source."""
    d = load_spread(spark, sf_dir, "documents")
    return extract_features(attach_payload(d)).orderBy("doc_id")


@query(
    "q_multimodal_resize",
    oracle="""
SELECT doc_id,
       CAST(length(substring(text, 1, 4096)) AS BIGINT) AS out_bytes,
       md5(substring(text, 1, 4096)) AS resized_md5
FROM documents
ORDER BY doc_id
""",
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stage of the multimodal pipeline: binary-in/binary-out
    mapInPandas (operators/multimodal.py resize_payloads -- the
    deterministic truncation stand-in for PIL resize). The oracle
    recomputes the transform relationally on the ASCII source text, so
    the Arrow round trip of the binary column is value-checked via its
    md5."""
    d = load_spread(spark, sf_dir, "documents")
    resized = resize_payloads(attach_payload(d))
    return resized.select(
        "doc_id",
        "out_bytes",
        F.md5("resized").alias("resized_md5"),
    ).orderBy("doc_id")


@query(
    "q_multimodal_frames",
    oracle="""
WITH f AS (
  SELECT doc_id, CAST(g.f_no AS INT) AS frame_no,
         substring(text, g.f_no * 256 + 1, 256) AS frame
  FROM documents,
       LATERAL (SELECT unnest(generate_series(0,
                  CAST(ceil(length(text) / 256.0) AS BIGINT) - 1)) AS f_no) g
  WHERE g.f_no % 4 = 0
)
SELECT doc_id, frame_no,
       CAST(length(frame) AS BIGINT) AS frame_bytes,
       md5(frame) AS frame_md5
FROM f
ORDER BY doc_id, frame_no
""",
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling stage: 1:N mapInPandas emitting every 4th
    256-byte frame per payload (operators/multimodal.py sample_frames
    -- the keyframe-extraction access pattern with a deterministic
    chop stand-in). Output cardinality is decoupled from input
    cardinality; the oracle rebuilds the same frames with a lateral
    series."""
    d = load_spread(spark, sf_dir, "documents")
    return sample_frames(attach_payload(d)).orderBy("doc_id", "frame_no")
