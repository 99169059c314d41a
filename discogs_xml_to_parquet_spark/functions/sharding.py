"""Deterministic hash sharding shared by the shuffle and packing
operators: shard = index of the first hex digit of md5(key), i.e. a
fixed 16-way fan-out (the hex alphabet implies the shard count -- there
is no tunable constant). One helper per engine so the Spark expression
and the DuckDB oracle fragment cannot drift (the round-1 shared-
fragment lesson)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HEXDIGITS = "0123456789abcdef"


def shuffle_key(col: str = "doc_id") -> Column:
    """md5 of the key -- the deterministic pseudo-random sort key."""
    return F.md5(F.col(col).cast("string"))


def shard_col(col: str = "doc_id") -> Column:
    """Spark: 0-15 from the first hex digit of md5(key). instr with a
    constant haystack mirrors DuckDB strpos exactly (both 1-based)."""
    return F.expr(
        f"cast(instr('{HEXDIGITS}', "
        f"substring(md5(cast({col} as string)), 1, 1)) - 1 as int)"
    )


def shard_sql(col: str = "doc_id") -> str:
    """DuckDB fragment computing the identical shard number."""
    return (
        f"strpos('{HEXDIGITS}', "
        f"substring(md5(CAST({col} AS VARCHAR)), 1, 1)) - 1"
    )
