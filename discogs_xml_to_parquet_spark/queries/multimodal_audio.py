"""Audio-lane multimodal query: a REAL decode path (int16 PCM via
numpy frombuffer -- no external codec needed), upgrading the
multimodal family beyond the env-stubbed image decoder.

The payload is synthesized as a pure function of doc_id (stage 1
byte-packs it, stage 2 decodes it back), so the DuckDB oracle can
rebuild the expected features arithmetically WITHOUT parsing binary --
the same generator-derived-expected technique the XML conversion
fixture uses. The binary round trip is still load-bearing: a packing
bug, an endianness mistake, or an Arrow binary-column corruption all
break the hash match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from discogs_xml_to_parquet_spark.operators import multimodal as M
from discogs_xml_to_parquet_spark.registry import query
from discogs_xml_to_parquet_spark.tables import load_spread


@query(
    "q_multimodal_audio_energy",
    oracle=f"""
WITH s AS (
  SELECT doc_id, i,
         (doc_id * {M._PCM_MULT} + i * {M._PCM_STEP}) % 65536 - 32768
           AS v
  FROM documents,
       LATERAL (SELECT unnest(generate_series(
                  0, 64 + CAST(doc_id % 64 AS INT) - 1)) AS i) g
)
SELECT doc_id,
       CAST(COUNT(*) AS INT) AS n_samples,
       CAST(SUM(abs(v)) AS BIGINT) AS sum_abs,
       CAST(MAX(abs(v)) AS INT) AS max_abs,
       CAST(SUM(v * v) AS BIGINT) AS energy,
       CAST(COUNT(*) FILTER (WHERE abs(v) > {M._LOUD}) AS INT) AS n_loud
FROM s GROUP BY doc_id
ORDER BY doc_id
""",
)
def q_multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCM energy/activity features through the full binary round
    trip: synth_pcm packs each doc's waveform into a little-endian
    int16 payload (Arrow binary column), audio_features DECODES the
    bytes (np.frombuffer -- a real codec, not a stub) and reduces to
    integer features. Both stages are Arrow-batched mapInPandas; the
    oracle rebuilds the same integers from the generator formula, so
    the driver hash-checks the decode itself. At 100 TB this is the
    canonical audio featurization pass: scan-bound, no shuffle until
    the output sort."""
    d = load_spread(spark, sf_dir, "documents")
    return M.audio_features(M.synth_pcm(d)).orderBy("doc_id")
