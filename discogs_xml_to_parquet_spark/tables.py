"""Loaders for the driver-generated star schema (TESTDATA.md).

All queries take (spark, sf_dir) and load via these helpers so that the
physical reading strategy is controlled in exactly one place. At cluster
scale the same call sites would point at partitioned/bucketed tables; on
the test data they are single parquet files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# Dimension tables small enough that joins against them must always be
# broadcast at any realistic scale factor (region/nation are bounded by
# geography; supplier/part/customer grow with SF but stay << lineitem).
BROADCAST_DIMS = {"region", "nation", "supplier"}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}
