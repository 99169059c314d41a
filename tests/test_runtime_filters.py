"""queries/runtime_filters.py: the staged month-partitioned fact and
the scoped-session knobs behind the q_join_bloom_dpp driver row.
(The runtime-filter PLAN gates live in tests/test_plans.py; the value
gate is the registered oracle.)"""

from __future__ import annotations

import os
from pathlib import Path

from discogs_xml_to_parquet_spark.queries import runtime_filters as RT
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_month_fact_staging_is_idempotent(spark):
    """The partitioned fact is built once per container per
    (sf_dir, source fingerprint): a second call must return the same
    path without rewriting anything, and no .build-* temp dir may be
    left behind (ADVICE r8: build goes to a temp dir + atomic rename)."""
    p1 = RT.month_partitioned_lineitem(spark, SF_SMOKE)
    stamps = {
        f: (Path(p1) / f).stat().st_mtime_ns for f in os.listdir(p1)
    }
    p2 = RT.month_partitioned_lineitem(spark, SF_SMOKE)
    assert p2 == p1
    assert {
        f: (Path(p1) / f).stat().st_mtime_ns for f in os.listdir(p1)
    } == stamps
    leftovers = [
        d for d in Path(p1).parent.iterdir()
        if d.name.startswith(Path(p1).name + ".build-")
    ]
    assert not leftovers, leftovers


def test_month_fact_cache_key_tracks_source(spark, tmp_path):
    """A REGENERATED source parquet at the same path must produce a
    different staged-fact path (ADVICE r8: the slug-only key silently
    served stale data to q_join_bloom_dpp)."""
    import shutil
    import time

    src = tmp_path / "sfcopy"
    src.mkdir()
    shutil.copy(Path(SF_SMOKE) / "lineitem.parquet",
                src / "lineitem.parquet")
    fp1 = RT._source_fingerprint(str(src))
    time.sleep(0.01)  # ensure a distinct mtime_ns on regeneration
    shutil.copy(Path(SF_SMOKE) / "lineitem.parquet",
                src / "lineitem.parquet")
    fp2 = RT._source_fingerprint(str(src))
    assert fp1 != fp2


def test_fact_is_partitioned_by_month(spark):
    """DPP has nothing to prune unless the fact directory is laid out
    as ship_month=... partitions with the month as a virtual column."""
    p = Path(RT.month_partitioned_lineitem(spark, SF_SMOKE))
    parts = [d for d in os.listdir(p) if d.startswith("ship_month=")]
    assert len(parts) > 12  # several years of months
    fact = spark.read.parquet(str(p))
    assert "ship_month" in fact.columns


def test_scoped_session_isolates_conf(spark):
    """The demonstration knobs (broadcast off, bloom threshold 0) must
    live on the sibling session ONLY -- leaking them into the shared
    session would silently change every other query's measured plan."""
    s2 = RT.scoped_session(spark)
    assert s2.conf.get("spark.sql.autoBroadcastJoinThreshold") == "-1"
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") != "-1"
    assert s2 is not spark
    assert s2.sparkContext is spark.sparkContext


def test_binary_corpus_staging_contract(spark):
    """staged_binary_corpus: idempotent (same path twice, no rebuild),
    one file per selected doc, selector keyed into the cache name so a
    selectivity change can never serve a stale tree (the r9 build hit
    exactly that with an unkeyed selector)."""
    import os

    from discogs_xml_to_parquet_spark.queries import binary_source as B
    from discogs_xml_to_parquet_spark.tables import load

    p1 = B.staged_binary_corpus(spark, SF_SMOKE)
    p2 = B.staged_binary_corpus(spark, SF_SMOKE)
    assert p1 == p2
    assert f"m{B._SEL_MOD}_" in os.path.basename(p1)
    n_files = len([f for f in os.listdir(p1) if f.endswith(".bin")])
    expected = (
        load(spark, SF_SMOKE, "documents")
        .filter(F.col("doc_id") % B._SEL_MOD == 0)
        .count()
    )
    assert n_files == expected


def test_evolving_orders_generations_differ_in_schema(spark):
    """staged_evolving_orders: gen=0 must NOT carry o_orderpriority,
    gen=1 must -- the mixed-schema premise the mergeSchema query
    demonstrates, pinned so a refactor cannot quietly write both
    generations with the full schema (the query would still pass its
    oracle but stop testing evolution)."""
    from discogs_xml_to_parquet_spark.queries import schema_evolution as SE

    root = SE.staged_evolving_orders(spark, SF_SMOKE)
    old_cols = spark.read.parquet(f"{root}/gen=0").columns
    new_cols = spark.read.parquet(f"{root}/gen=1").columns
    assert "o_orderpriority" not in old_cols
    assert "o_orderpriority" in new_cols
    assert set(old_cols) == set(new_cols) - {"o_orderpriority"}


def test_widening_generations_differ_in_type(spark):
    """staged_widening_orders: gen=0 must carry o_custkey as int32,
    gen=1 as int64 -- the widening premise, pinned so a refactor
    cannot quietly write both generations wide (the query would still
    pass its oracle but stop testing type evolution)."""
    from discogs_xml_to_parquet_spark.queries import schema_evolution as SE

    root = SE.staged_widening_orders(spark, SF_SMOKE)
    old_t = dict(spark.read.parquet(f"{root}/gen=0").dtypes)["o_custkey"]
    new_t = dict(spark.read.parquet(f"{root}/gen=1").dtypes)["o_custkey"]
    assert old_t == "int"
    assert new_t == "bigint"


def test_merge_schema_refuses_type_conflicts(spark, tmp_path):
    """The documented failure modes behind the explicit-schema route:
    Spark's footer reconciliation (mergeSchema) refuses BOTH the
    widenable INT-vs-BIGINT mix and the incompatible
    DOUBLE-vs-STRING mix with CANNOT_MERGE_SCHEMAS -- which is why
    q_schema_evolution_widening reads with the catalog's widened
    schema instead of deriving one from footers."""
    import pytest

    from pyspark.sql import functions as F

    from discogs_xml_to_parquet_spark.queries import schema_evolution as SE

    root = SE.staged_widening_orders(spark, SF_SMOKE)
    with pytest.raises(Exception, match="CANNOT_MERGE_SCHEMAS"):
        (spark.read.option("mergeSchema", "true")
         .option("recursiveFileLookup", "true").parquet(root).schema)

    bad = str(tmp_path / "bad")
    spark.range(3).select(F.col("id").cast("double").alias("x")).write \
        .parquet(f"{bad}/gen=0")
    spark.range(3).select(F.col("id").cast("string").alias("x")).write \
        .parquet(f"{bad}/gen=1")
    with pytest.raises(Exception, match="CANNOT_MERGE_SCHEMAS"):
        (spark.read.option("mergeSchema", "true")
         .option("recursiveFileLookup", "true").parquet(bad).schema)


def test_renamed_generations_differ_in_name(spark):
    """staged_renamed_orders: gen=0 must call the revenue column
    o_totalprice, gen=1 total_price -- the rename premise, pinned so a
    refactor cannot quietly write both generations with one name (the
    query would still pass its oracle but stop testing renames)."""
    from discogs_xml_to_parquet_spark.queries import schema_evolution as SE

    root = SE.staged_renamed_orders(spark, SF_SMOKE)
    old_cols = spark.read.parquet(f"{root}/gen=0").columns
    new_cols = spark.read.parquet(f"{root}/gen=1").columns
    assert "o_totalprice" in old_cols and "total_price" not in old_cols
    assert "total_price" in new_cols and "o_totalprice" not in new_cols


def test_merge_schema_forks_renamed_column(spark):
    """The documented failure mode behind the explicit rename map:
    footer reconciliation has no rename concept, so mergeSchema on the
    renamed directory SUCCEEDS but silently forks the revenue column
    into o_totalprice-with-NULLs and total_price-with-NULLs -- every
    row half-NULL, every whole-table SUM half-blind. This is why real
    formats track renames in metadata (Iceberg field ids, Delta column
    mapping) and why q_schema_evolution_rename projects per generation
    instead of merging footers."""
    from discogs_xml_to_parquet_spark.queries import schema_evolution as SE

    root = SE.staged_renamed_orders(spark, SF_SMOKE)
    forked = (spark.read.option("mergeSchema", "true")
              .option("recursiveFileLookup", "true").parquet(root))
    assert {"o_totalprice", "total_price"} <= set(forked.columns)
    n = forked.count()
    half_nulls = forked.filter(
        F.col("o_totalprice").isNull() | F.col("total_price").isNull()
    ).count()
    assert half_nulls == n  # every row is blind in one fork or the other


def test_bucketed_fact_tables_reuse_within_app(spark):
    """bucketed_fact_tables: the second call must short-circuit on
    tableExists (no rewrite -- data files untouched), and the tables
    must carry the co-bucketed spec (16 buckets on the join keys)."""
    import os

    from discogs_xml_to_parquet_spark.queries import runtime_filters as RT

    li_t, o_t = RT.bucketed_fact_tables(spark, SF_SMOKE)
    loc = (
        spark.sql(f"DESCRIBE TABLE EXTENDED {li_t}")
        .filter(F.col("col_name") == "Location")
        .collect()[0].data_type
    ).replace("file:", "")
    before = max(os.path.getmtime(os.path.join(loc, f))
                 for f in os.listdir(loc))
    li_t2, o_t2 = RT.bucketed_fact_tables(spark, SF_SMOKE)
    assert (li_t2, o_t2) == (li_t, o_t)
    after = max(os.path.getmtime(os.path.join(loc, f))
                for f in os.listdir(loc))
    assert after == before, "second call rewrote the bucketed data"
    desc = spark.sql(f"DESCRIBE TABLE EXTENDED {li_t}").collect()
    kv = {r.col_name: r.data_type for r in desc}
    assert kv.get("Num Buckets") == "16"
    assert "l_orderkey" in kv.get("Bucket Columns", "")
