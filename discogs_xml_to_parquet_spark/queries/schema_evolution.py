"""Schema evolution at the scan: read a parquet directory whose older
slices PREDATE a column and whose newer slices carry it, via
mergeSchema, with NULL backfill for the missing column.

The 100 TB reality this pins: long-lived ingestion pipelines accrete
columns over time, so a fact directory is never one schema -- it is a
timeline of schemas, and the engine must (a) union them without
rewriting history, (b) surface pre-schema rows as NULLs, and
(c) keep every downstream aggregate honest about the mixed lineage.
Spark's mergeSchema=true reconciles the footers at listing time; the
per-file reader projects absent columns as NULL, so the backfill is
metadata-only -- no historical rewrite, which at 100 TB is the
difference between a config flag and a petabyte compaction job.

The staged directory derives from the orders table split at a fixed
date (old slice written WITHOUT o_orderpriority, new slice with it),
so the DuckDB oracle can express the same semantics relationally:
priority is visible only for rows past the evolution boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark.functions.exact import dsum, rev_sql
from discogs_xml_to_parquet_spark.registry import query
from discogs_xml_to_parquet_spark.staging import (
    source_fingerprint as _source_fingerprint,
    staged as _staged,
)
from discogs_xml_to_parquet_spark.tables import load

_VERSION = 1
# the date the o_orderpriority column "started being captured"
_EVOLVED_AT = "1995-07-01"
# the date o_custkey was widened int32 -> int64 in the writer
_WIDENED_AT = "1995-07-01"
# the date the writer renamed o_totalprice -> total_price
_RENAMED_AT = "1995-07-01"

_REV_SQL = rev_sql("(o_totalprice)")


def staged_evolving_orders(spark: SparkSession, sf_dir: str) -> str:
    """Two-generation parquet directory: gen=0 holds pre-boundary
    orders WITHOUT the priority column, gen=1 holds the rest with it.
    Fingerprinted build-once staging with atomic publish (same
    contract as the DPP fact)."""
    slug = sf_dir.strip("/").replace("/", "_")
    fp = _source_fingerprint(sf_dir, "orders.parquet")

    def build(tmp: str) -> None:
        o = load(spark, sf_dir, "orders")
        old = o.filter(F.col("o_orderdate") < _EVOLVED_AT).drop(
            "o_orderpriority"
        )
        new = o.filter(F.col("o_orderdate") >= _EVOLVED_AT)
        old.write.mode("overwrite").parquet(f"{tmp}/gen=0")
        new.write.mode("overwrite").parquet(f"{tmp}/gen=1")

    return _staged(
        f"spark_graft_schemaevo_v{_VERSION}_{slug}_{fp}", build
    )


@query(
    "q_schema_evolution_scan",
    oracle="""
SELECT CASE WHEN o_orderdate >= TIMESTAMP '1995-07-01 00:00:00'
            THEN o_orderpriority ELSE '(pre-schema)' END AS priority,
       COUNT(*) AS n_orders,
       """ + _REV_SQL + """ AS total_price
FROM orders
GROUP BY 1
ORDER BY 1
""",
)
def q_schema_evolution_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-schema directory scan: order counts and exact revenue per
    priority, where every order written before the column existed
    lands in an explicit '(pre-schema)' bucket via NULL backfill --
    the aggregate is honest about lineage instead of silently
    dropping or misclassifying history. The oracle derives the same
    buckets from the live table's date split, so a hash match pins
    that mergeSchema unioned both generations completely and
    backfilled exactly the pre-boundary rows.

    Scale shape: schema reconciliation happens once at listing
    (mergeSchema reads footers, not data); the scan itself is one
    map-side pass + a K-group aggregate. recursiveFileLookup picks up
    the generation subdirs without treating gen= as a partition
    column, mirroring a directory whose layout predates partition
    discipline."""
    src = staged_evolving_orders(spark, sf_dir)
    return (
        spark.read.option("mergeSchema", "true")
        .option("recursiveFileLookup", "true")
        .parquet(src)
        .select(
            F.coalesce(F.col("o_orderpriority"), F.lit("(pre-schema)"))
            .alias("priority"),
            "o_totalprice",
        )
        .groupBy("priority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_price"),
        )
        .orderBy("priority")
    )


# --- type widening: int32 -> int64 across generations -----------------

def staged_widening_orders(spark: SparkSession, sf_dir: str) -> str:
    """Two-generation parquet directory where o_custkey WIDENS: gen=0
    (pre-boundary) wrote it as int32, gen=1 writes int64. The
    directory a long-lived pipeline leaves behind when a key column
    outgrows its original type."""
    slug = sf_dir.strip("/").replace("/", "_")
    fp = _source_fingerprint(sf_dir, "orders.parquet")

    def build(tmp: str) -> None:
        o = load(spark, sf_dir, "orders")
        old = o.filter(F.col("o_orderdate") < _WIDENED_AT).withColumn(
            "o_custkey", F.col("o_custkey").cast("int"))
        new = o.filter(F.col("o_orderdate") >= _WIDENED_AT)
        old.write.mode("overwrite").parquet(f"{tmp}/gen=0")
        new.write.mode("overwrite").parquet(f"{tmp}/gen=1")

    return _staged(
        f"spark_graft_schemawiden_v{_VERSION}_{slug}_{fp}", build
    )


@query(
    "q_schema_evolution_widening",
    oracle="""
SELECT strftime(CAST(o_orderdate AS TIMESTAMP), '%Y') AS order_year,
       COUNT(*) AS n_orders,
       CAST(SUM(o_custkey) AS BIGINT) AS sum_custkey,
       TRUE AS widened
FROM orders
GROUP BY 1
ORDER BY 1
""",
)
def q_schema_evolution_widening(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Type-widening scan: the mixed int32/int64 directory is read
    with the EXPLICIT widened schema (o_custkey: bigint) -- the
    production route, where the catalog/table format records the
    widened type and the parquet reader upcasts int32 pages per file
    at scan time; NO historical rewrite. mergeSchema cannot take this
    directory (Spark's footer reconciliation refuses INT-vs-BIGINT --
    CANNOT_MERGE_SCHEMAS, pinned as a negative pytest together with
    the double-vs-string case), which is exactly why real formats
    carry the authoritative schema in metadata instead of deriving it
    from footers. The per-year checksum over BOTH generations breaks
    if either slice is dropped, double-read, or mis-cast, and
    `widened` pins the scan's resolved dtype.

    Scale shape: schema resolution is metadata-only; the scan is one
    map-side pass + a K-group aggregate, identical to the
    added-column lane (q_schema_evolution_scan)."""
    src = staged_widening_orders(spark, sf_dir)
    wide = load(spark, sf_dir, "orders").schema
    df = (
        spark.read.schema(wide)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    widened = dict(df.dtypes)["o_custkey"] == "bigint"
    return (
        df.groupBy(
            F.date_format("o_orderdate", "yyyy").alias("order_year"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_custkey").alias("sum_custkey"),
        )
        .withColumn("widened", F.lit(bool(widened)))
        .orderBy("order_year")
    )


# --- column rename across generations ---------------------------------

def staged_renamed_orders(spark: SparkSession, sf_dir: str) -> str:
    """Two-generation parquet directory where a column was RENAMED in
    the writer: gen=0 (pre-boundary) calls the revenue column
    `o_totalprice`, gen=1 calls it `total_price`. The directory a
    pipeline leaves behind after a naming-convention migration that
    nobody backfilled."""
    slug = sf_dir.strip("/").replace("/", "_")
    fp = _source_fingerprint(sf_dir, "orders.parquet")

    def build(tmp: str) -> None:
        o = load(spark, sf_dir, "orders")
        old = o.filter(F.col("o_orderdate") < _RENAMED_AT)
        new = o.filter(
            F.col("o_orderdate") >= _RENAMED_AT
        ).withColumnRenamed("o_totalprice", "total_price")
        old.write.mode("overwrite").parquet(f"{tmp}/gen=0")
        new.write.mode("overwrite").parquet(f"{tmp}/gen=1")

    return _staged(
        f"spark_graft_schemarename_v{_VERSION}_{slug}_{fp}", build
    )


# per-generation name of the canonical `total_price` column -- the
# rename map a real table format keeps in metadata (Iceberg tracks it
# by field id; Delta by column-mapping). Parquet footers alone CANNOT
# express a rename: mergeSchema on this directory silently forks the
# column into o_totalprice-with-NULLs and total_price-with-NULLs (the
# failure mode, pinned as a pytest in tests/test_schema_evolution.py).
_RENAME_MAP = {"gen=0": "o_totalprice", "gen=1": "total_price"}


@query(
    "q_schema_evolution_rename",
    oracle="""
SELECT o_orderpriority AS priority,
       COUNT(*) AS n_orders,
       """ + _REV_SQL + """ AS total_price,
       TRUE AS rename_unified
FROM orders
GROUP BY 1
ORDER BY 1
""",
)
def q_schema_evolution_rename(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Column-rename scan: the mixed-name directory is read through an
    explicit per-generation rename map -- each generation is projected
    to the canonical name at scan time and the slices unioned BY NAME,
    the mechanism behind Iceberg's field-id renames and Delta's column
    mapping. No historical rewrite: the map is metadata, the per-file
    reader just projects a differently-named physical column. The
    per-priority exact revenue checksum spans BOTH generations, so a
    dropped slice, a double-read, or a column forked into two (what
    footer-merging would do -- pinned as the negative pytest) breaks
    the hash; `rename_unified` pins that exactly one revenue column
    survived unification.

    Scale shape: identical to the sibling evolution lanes -- schema
    resolution is metadata-only, then one map-side pass + a K-group
    aggregate. The per-generation projection adds zero passes: it IS
    the scan's ReadSchema, one per file group."""
    src = staged_renamed_orders(spark, sf_dir)
    gens = []
    for gen, phys in _RENAME_MAP.items():
        gens.append(
            spark.read.parquet(f"{src}/{gen}")
            .select(
                "o_orderpriority",
                F.col(phys).alias("total_price"),
            )
        )
    df = gens[0].unionByName(gens[1])
    unified = df.columns.count("total_price") == 1
    return (
        df.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("total_price").alias("total_price"),
        )
        .withColumn("rename_unified", F.lit(bool(unified)))
        .orderBy("priority")
    )
