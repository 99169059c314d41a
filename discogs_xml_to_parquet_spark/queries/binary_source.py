"""binaryFile source: ingest a directory of raw binary assets as a
DataFrame -- the Spark-native first step of every at-scale image/audio/
video pipeline (the multimodal queries' binary columns come from
parquet; a real 100 TB corpus starts as millions of FILES).

Scale shape: the binaryFile source lists files on the driver-side
catalog but reads them in executors, bin-packing many small files into
each task partition (spark.sql.files.maxPartitionBytes /
openCostInBytes govern the packing), so a 100M-file corpus becomes
~corpus_size/128MB tasks, not 100M tasks. Pushdown exists at the
LISTING level (pathGlobFilter, recursiveFileLookup, modifiedAfter)
-- the analog of partition pruning for file corpora. Content is only
materialized when the `content` column is selected; a metadata-only
query (path/length) never reads the bytes.

The staged corpus is DERIVED from the documents table (one file per
selected doc, utf-8 bytes of its text, doc_id in the file name), so the
DuckDB oracle can pin the full ingestion round trip relationally:
md5(file bytes) == md5(text) and file length == strlen(text). Files are
written EXECUTOR-side (foreachPartition -- at cluster scale the
writers would target shared storage) into the same fingerprinted
atomic-publish staging the DPP fact uses.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark.registry import query
from discogs_xml_to_parquet_spark.staging import (
    source_fingerprint as _source_fingerprint,
    staged as _staged,
)
from discogs_xml_to_parquet_spark.tables import load

# one doc in 17 becomes a file: ~30 files at sf0.001/sf0.01 (500-doc
# corpora), ~300 at sf0.1 -- enough to exercise multi-file bin-packing
# without staging a giant file tree per container
_SEL_MOD = 17
_VERSION = 1


def staged_binary_corpus(spark: SparkSession, sf_dir: str) -> str:
    """One .bin file per selected document (name = zero-padded doc_id,
    bytes = utf-8 text), built once per container per (sf_dir, source
    fingerprint) with atomic publish."""
    slug = sf_dir.strip("/").replace("/", "_")
    fp = _source_fingerprint(sf_dir, "documents.parquet")

    def build(tmp: str) -> None:
        os.makedirs(tmp, exist_ok=True)
        rows = (
            load(spark, sf_dir, "documents")
            .filter(F.col("doc_id") % _SEL_MOD == 0)
            .select("doc_id", "text")
            .repartition(8)
        )

        def write_files(part) -> None:
            for r in part:
                path = os.path.join(tmp, f"{r.doc_id:012d}.bin")
                with open(path, "wb") as f:
                    f.write(r.text.encode("utf-8"))

        rows.foreachPartition(write_files)

    return _staged(
        f"spark_graft_binfiles_v{_VERSION}_m{_SEL_MOD}_{slug}_{fp}", build
    )


@query(
    "q_source_binaryfile",
    # the selector is interpolated from _SEL_MOD so query and oracle can
    # never desynchronize on it (ADVICE r9)
    oracle=f"""
SELECT doc_id,
       md5(text) AS content_md5,
       CAST(strlen(text) AS BIGINT) AS n_bytes
FROM documents
WHERE doc_id % {_SEL_MOD} = 0
ORDER BY doc_id
""",
)
def q_source_binaryfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-corpus ingestion round trip: read the staged file tree
    through the binaryFile source, recover each asset's id from its
    path, and fingerprint the bytes. The oracle computes the same
    md5/byte-length from the documents table the files were derived
    from, so a hash match pins listing completeness (every selected doc
    present exactly once), byte fidelity (no truncation/transcoding),
    and the path->id recovery -- the contract a multimodal pipeline
    needs before any decode step runs."""
    corpus = staged_binary_corpus(spark, sf_dir)
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(corpus)
        .select(
            F.regexp_extract(F.col("path"), r"(\d+)\.bin$", 1)
            .cast("long").alias("doc_id"),
            F.md5("content").alias("content_md5"),
            F.col("length").cast("long").alias("n_bytes"),
        )
        .orderBy("doc_id")
    )
