"""User-facing engine API: the 'switch to this repo' surface.

The reference exposes exactly one CLI (main.rs:919-930). This engine
exposes three coherent layers:

    eng = Engine()                       # or Engine(existing_spark)
    eng.convert("dump/*.xml.gz", "out/") # the reference's whole surface
    eng.table("lineitem")                # DataFrame API entry
    eng.sql("SELECT ... FROM lineitem")  # SQL over registered tables
    eng.query("q1_pricing_summary")      # the named operator library
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from discogs_xml_to_parquet_spark import registry
from discogs_xml_to_parquet_spark.session import get_spark
from discogs_xml_to_parquet_spark.tables import TABLES, load

DEFAULT_SF_DIR = "/root/testdata/sf0.01"


class Engine:
    def __init__(self, spark: SparkSession | None = None,
                 sf_dir: str = DEFAULT_SF_DIR) -> None:
        self.spark = spark or get_spark()
        self.sf_dir = sf_dir
        self._registered = False

    # -- reference surface ------------------------------------------------
    def convert(self, in_path: str, out_path: str, strict: bool = False,
                single_file: bool = False) -> None:
        from discogs_xml_to_parquet_spark.sources.discogs_xml import convert

        convert(self.spark, in_path, out_path, strict=strict,
                single_file=single_file)

    # -- relational surface ----------------------------------------------
    def table(self, name: str) -> DataFrame:
        return load(self.spark, self.sf_dir, name)

    def register_tables(self) -> None:
        """Register every star-schema table as a temp view for sql()."""
        for t in TABLES:
            self.table(t).createOrReplaceTempView(t)
        self._registered = True

    def sql(self, query: str) -> DataFrame:
        if not self._registered:
            self.register_tables()
        return self.spark.sql(query)

    # -- operator library -------------------------------------------------
    def query(self, name: str) -> DataFrame:
        registry.load_all_queries()
        return registry.QUERIES[name](self.spark, self.sf_dir)

    def queries(self) -> list[str]:
        registry.load_all_queries()
        return sorted(registry.QUERIES)
