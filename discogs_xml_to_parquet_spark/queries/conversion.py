"""The reference's own surface (SURVEY.md §2.A) as a driver-checkable
query: generate the Discogs fixture, run the XML->DataFrame conversion,
flatten to scalar columns. Rows-only check (XML input is outside the
DuckDB oracle's view set); exact-value conformance lives in
tests/test_discogs_xml.py against hand-written expected rows."""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark.registry import query
from discogs_xml_to_parquet_spark.sources.discogs_xml import read_releases
from discogs_xml_to_parquet_spark.sources.fixture import write_fixture_gz


@query("discogs_xml_conversion")  # rows-only: non-SQL-expressible source
def discogs_xml_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = write_fixture_gz(
        f"{tempfile.gettempdir()}/discogs_fixture/releases.xml.gz")
    df = read_releases(spark, path)
    return df.select(
        "id",
        "status",
        "title",
        F.size("artists").alias("n_artists"),
        F.size("genres").alias("n_genres"),
        F.size("styles").alias("n_styles"),
        F.size("labels").alias("n_labels"),
        "is_main_release",
        "master_id",
    ).orderBy("id")


@query("discogs_explode_artists")  # rows-only: XML source input
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
