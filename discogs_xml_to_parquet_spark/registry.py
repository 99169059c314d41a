"""Named-query registry: the driver contract surface.

Every implemented operator registers a named query callable
(spark, sf_dir) -> DataFrame and, where SQL-expressible, a DuckDB oracle
SQL string computing the same result on the same parquet tables.

Determinism rules (the driver hash-compares values order-insensitively
but cell-exactly):

- Alias every computed column identically in Spark and SQL.
- Never output raw floating aggregates of doubles: sum/avg of doubles is
  order-dependent across engines. Instead round each addend to a scaled
  64-bit integer, floor(x * 1e6 + 0.5) (correctly-rounded IEEE ops,
  engine-independent), aggregate exactly (decimal(38,0) accumulator /
  DuckDB HUGEINT -- no overflow at scale), and unscale the final value
  to double -- bit-identical in both engines regardless of aggregation
  order. Use functions/exact.py dsum/davg and their documented mirrors.
- Never output raw timestamps; format to 'yyyy-MM-dd[ HH:mm:ss]' strings.
- Break all ordering ties with a unique key before any limit/rank.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; `oracle` is DuckDB SQL over the view names
    region nation customer supplier part orders lineitem events documents
    embeddings. Omit oracle only for genuinely non-SQL-expressible ops
    (the driver then records a weaker rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all_queries() -> None:
    """Import every query module so registration side effects run."""
    from discogs_xml_to_parquet_spark import queries as _q  # noqa: F401
