"""Data-layout clustering: z-order (Morton) keys and the zone-map audit
that justifies them -- the file-skipping primitive behind OPTIMIZE
ZORDER in lakehouse table formats.

At 100 TB the dominant cost of a selective scan is how many files the
predicate can SKIP via min/max zone maps. Sorting by one key makes that
key's zones tight and every other key's zones useless; interleaving the
bits of two keys (the Morton curve) makes BOTH dimensions' zones tight
simultaneously, so predicates on either key prune most buckets. The
query computes the z-value in pure integer arithmetic (16 bits per
key), assigns rows to 64 z-range buckets (the "files"), and emits each
bucket's per-dimension min/max -- exactly the zone-map table a scan
planner would consult. Map-only + one small aggregate: the layout pass
itself is a shuffle-by-zvalue write at scale (repartitionByRange on
the z-key), which this audit's bucket key models.

The reference (src/main.rs) writes a single unclustered file; this is
a brief-required scale extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark.registry import query
from discogs_xml_to_parquet_spark.tables import load

_BITS = 16      # bits interleaved per dimension (keys < 2^16 at test SFs;
                # widen to 20-24 bits for production key domains)
_BUCKET_SHIFT = 2 * _BITS - 6  # top 6 z-bits -> <= 64 buckets ("files")

# One fragment per engine computing the identical 2x16-bit Morton code.
_Z_SQL = (
    f"list_sum(list_transform(generate_series(0, {_BITS - 1}), k -> "
    "((l_partkey >> k) & 1) * (CAST(1 AS BIGINT) << (2*k)) + "
    "((l_suppkey >> k) & 1) * (CAST(1 AS BIGINT) << (2*k + 1))))"
)
# Spark side computes the SAME interleave with the classic magic-number
# bit spread (x | x<<8 & 0x00FF00FF, then 4/2/1) -- 4 shift-mask steps
# per key, straight-line codegen arithmetic. The r7 spelling was a
# 16-step higher-order `aggregate` fold over sequence(0,15): per-row
# array allocation + lambda interpretation outside codegen, measured
# 6.4x slower at sf0.1 (2.7 s -> 0.4 s interleaved, values identical).
# The oracle keeps the definitional fold: same Morton value either way.


def _spread(col: str) -> str:
    """16 -> 32 bit spread of `col`'s low {_BITS} bits (even positions),
    all BIGINT ops shared verbatim across rows."""
    x = f"(CAST({col} AS BIGINT) & 65535)"
    x = f"(({x} | ({x} << 8)) & 16711935)"    # 0x00FF00FF
    x = f"(({x} | ({x} << 4)) & 252645135)"   # 0x0F0F0F0F
    x = f"(({x} | ({x} << 2)) & 858993459)"   # 0x33333333
    x = f"(({x} | ({x} << 1)) & 1431655765)"  # 0x55555555
    return x


_Z_SPARK = f"({_spread('l_partkey')} | ({_spread('l_suppkey')} << 1))"


@query(
    "q_zorder_layout",
    oracle=f"""
WITH z AS (
  SELECT l_partkey, l_suppkey,
         {_Z_SQL} AS zval
  FROM lineitem
)
SELECT CAST(zval >> {_BUCKET_SHIFT} AS INT) AS bucket,
       COUNT(*) AS n_rows,
       MIN(l_partkey) AS pk_lo, MAX(l_partkey) AS pk_hi,
       MIN(l_suppkey) AS sk_lo, MAX(l_suppkey) AS sk_hi
FROM z
GROUP BY bucket
ORDER BY bucket
""",
)
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton-code layout audit: interleave the low {_BITS} bits of
    (l_partkey, l_suppkey) into one sortable z-value via the magic-
    number bit spread (straight-line shift/mask arithmetic inside
    whole-stage codegen -- no UDF, no per-row array), bucket rows by
    the top 6 z-bits (the would-be file assignment of a
    repartitionByRange-on-z write), and report each bucket's min/max
    per dimension. Tight pk AND sk ranges per bucket are the point:
    either predicate prunes most buckets, which a single-key sort
    cannot deliver. All arithmetic is bit-ops on bigints --
    cross-engine hash-exact."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_partkey",
            "l_suppkey",
            F.expr(_Z_SPARK).alias("zval"),
        )
        .select(
            F.shiftright("zval", _BUCKET_SHIFT).cast("int").alias("bucket"),
            "l_partkey",
            "l_suppkey",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_partkey").alias("pk_lo"),
            F.max("l_partkey").alias("pk_hi"),
            F.min("l_suppkey").alias("sk_lo"),
            F.max("l_suppkey").alias("sk_hi"),
        )
        .orderBy("bucket")
    )
