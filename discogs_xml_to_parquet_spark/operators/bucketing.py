"""Bucketed tables: shuffle-free co-located joins.

A join between two tables bucketed (and sort-ordered) on the join key
into the same bucket count needs no exchange at query time: bucket i of
A joins bucket i of B directly. At 100 TB this converts the recurring
cost of shuffling a fact table on every join into a one-time cost paid
at write: the canonical layout for fact tables that are repeatedly
joined on the same key (lineitem x orders on orderkey).

The trade-offs this module encodes:
- bucket count is fixed at write time; pick it for the target SF
  (buckets ~ total_size / desired_task_size, here parameterized)
- both sides must agree on count (or be multiples, with AQE coalescing)
- writing requires a metastore table (bucket metadata lives in the
  catalog, not parquet) -- saveAsTable with an explicit path
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table_name: str, path: str,
                   keys: list[str], num_buckets: int) -> None:
    """Persist df bucketed+sorted by `keys`; registers `table_name` in
    the session catalog with data at `path`."""
    (
        df.write.mode("overwrite")
        .bucketBy(num_buckets, *keys)
        .sortBy(*keys)
        .option("path", path)
        .saveAsTable(table_name)
    )


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: list[str], how: str = "inner") -> DataFrame:
    """Join two co-bucketed catalog tables; with matching bucket specs
    the plan contains no Exchange on either side (asserted in
    tests/test_bucketing.py)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
