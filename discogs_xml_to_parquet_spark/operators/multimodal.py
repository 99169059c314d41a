"""Multimodal column plumbing: opaque binary payloads + typed metadata,
with decode / feature-extraction as Arrow-batched pandas stages.

The pattern for image/audio/video at 100 TB:

- payloads are `binary` columns (or object-store URIs for >row-group
  blobs) with a typed metadata struct alongside (mime, n_bytes, ...)
- decode / resize / frame-sample runs in ``mapInPandas``: Arrow batches
  cross the Python boundary once per batch, the pandas function applies
  a vectorized library per batch, and the output schema is declared up
  front so Spark plans around it
- partitioning stays row-count based (``maxRecordsPerBatch`` tuned down
  for fat rows) so a batch of decoded frames fits executor memory

The decode libraries (PIL/ffmpeg/...) are not in this container, so
``decode_image`` raises NotImplementedError and the shipped feature
extractor computes deterministic byte-level features instead -- the
Spark-side plumbing (schema, batching, UDF signature) is real and
oracle-checked; swap `_features_of` for a real decoder without touching
the dataflow.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("payload_md5", T.StringType()),
    T.StructField("fake_width", T.IntegerType()),
    T.StructField("fake_height", T.IntegerType()),
])


def attach_payload(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Simulate a multimodal table: utf-8 payload bytes + metadata
    struct. With real media this is the ingestion schema; the payload
    column stays opaque to the relational layer."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(payload).alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> object:
    """Real decoder stub -- image/audio libs are not in this container.
    A production build plugs PIL/torchvision/ffmpeg in here; everything
    around it (batching, schema, partitioning) is already in place."""
    raise NotImplementedError(
        "media decoding requires an image/audio library not present in "
        "this environment; see module docstring"
    )


def _features_of(doc_id: int, payload: bytes) -> tuple:
    n = len(payload)
    md5 = hashlib.md5(payload).hexdigest()
    # deterministic stand-ins for decoded width/height
    return (doc_id, n, md5, n % 640, (n * 7) % 480)


def extract_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over (doc_id, payload): the
    Arrow-batched hot path a real decoder would run in."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                _features_of(i, p)
                for i, p in zip(pdf["doc_id"], pdf["payload"])
            ]
            yield pd.DataFrame(
                rows, columns=[f.name for f in FEATURE_SCHEMA.fields]
            )

    return df.select("doc_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


RESIZE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("resized", T.BinaryType()),
    T.StructField("out_bytes", T.LongType()),
])


def resize_payloads(df: DataFrame, target_bytes: int = 4096) -> DataFrame:
    """'Resize' stage: 1:1 mapInPandas producing a transformed binary
    column (payload truncated to target_bytes -- the deterministic
    stand-in; a real build calls PIL's resize here). Demonstrates the
    binary-in/binary-out batch shape: the output column stays opaque
    binary with a size column alongside, so downstream stages keep
    planning relationally. For fat rows, tune
    spark.sql.execution.arrow.maxRecordsPerBatch down so a batch of
    decoded frames fits executor memory."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [bytes(p[:target_bytes]) for p in pdf["payload"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "resized": resized,
                "out_bytes": [len(r) for r in resized],
            })

    return df.select("doc_id", "payload").mapInPandas(run, RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_no", T.IntegerType()),
    T.StructField("frame_bytes", T.LongType()),
    T.StructField("frame_md5", T.StringType()),
])


def sample_frames(df: DataFrame, frame_size: int = 256,
                  stride: int = 4) -> DataFrame:
    """'Frame-sample' stage: 1:N mapInPandas -- each payload is chopped
    into fixed-size frames and every stride-th frame is emitted as its
    own row (the video-keyframe access pattern; a real build runs
    ffmpeg keyframe extraction here). Demonstrates the expanding batch
    shape: mapInPandas output cardinality is independent of input
    cardinality, declared only by schema."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_no": [], "frame_bytes": [],
                   "frame_md5": []}
            for i, p in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = (len(p) + frame_size - 1) // frame_size
                for f_no in range(0, n_frames, stride):
                    frame = bytes(p[f_no * frame_size:(f_no + 1) * frame_size])
                    out["doc_id"].append(i)
                    out["frame_no"].append(f_no)
                    out["frame_bytes"].append(len(frame))
                    out["frame_md5"].append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(out)

    return df.select("doc_id", "payload").mapInPandas(run, FRAME_SCHEMA)


# --- REAL audio lane: int16 PCM pack + numpy decode -------------------
#
# Unlike the image path (decoder library absent -> stubbed), raw PCM
# needs only numpy: frombuffer('<i2') IS the decode. The two stages
# below are genuine binary round-trip work -- stage 1 synthesizes and
# byte-packs a waveform, stage 2 decodes the bytes back and reduces
# them -- so the multimodal plumbing is exercised with a real codec,
# not a stand-in.

PCM_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("pcm", T.BinaryType()),
    T.StructField("n_bytes", T.LongType()),
])

AUDIO_FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_samples", T.IntegerType()),
    T.StructField("sum_abs", T.LongType()),
    T.StructField("max_abs", T.IntegerType()),
    T.StructField("energy", T.LongType()),
    T.StructField("n_loud", T.IntegerType()),
])

_PCM_MULT = 9973   # sample generator: deterministic pure function of
_PCM_STEP = 31     # (doc_id, sample index) so an oracle can rebuild
_LOUD = 16384      # |sample| threshold for the activity counter


def synth_pcm(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Stage 1 (ingest): synthesize a little-endian int16 PCM payload
    per row -- 64 + doc_id % 64 samples, s_i = ((doc_id*9973 + i*31)
    % 65536) - 32768 -- and BYTE-PACK it (numpy astype('<i2')
    .tobytes()). The payload column leaving this stage is opaque
    binary, exactly like a parquet table of real audio clips."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pcm, nbytes = [], []
            for d in pdf[id_col]:
                n = 64 + int(d) % 64
                i = np.arange(n, dtype=np.int64)
                s = (int(d) * _PCM_MULT + i * _PCM_STEP) % 65536 - 32768
                b = s.astype("<i2").tobytes()
                pcm.append(b)
                nbytes.append(len(b))
            yield pd.DataFrame(
                {"doc_id": pdf[id_col], "pcm": pcm, "n_bytes": nbytes}
            )

    return df.select(id_col).mapInPandas(run, PCM_SCHEMA)


def audio_features(df: DataFrame) -> DataFrame:
    """Stage 2 (decode + reduce): np.frombuffer('<i2') decodes each
    payload -- the real PCM codec -- then integer reductions produce
    sample count, total |amplitude|, peak, energy (sum of squares) and
    the loud-sample count. All-integer outputs make the stage
    cross-engine checkable."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in AUDIO_FEATURE_SCHEMA.fields}
            for d, b in zip(pdf["doc_id"], pdf["pcm"]):
                s = np.frombuffer(b, dtype="<i2").astype(np.int64)
                out["doc_id"].append(int(d))
                out["n_samples"].append(len(s))
                out["sum_abs"].append(int(np.abs(s).sum()))
                out["max_abs"].append(int(np.abs(s).max()))
                out["energy"].append(int((s * s).sum()))
                out["n_loud"].append(int((np.abs(s) > _LOUD).sum()))
            yield pd.DataFrame(out)

    return df.select("doc_id", "pcm").mapInPandas(run, AUDIO_FEATURE_SCHEMA)
