"""queries/runtime_filters.py: the staged month-partitioned fact and
the scoped-session knobs behind the q_join_bloom_dpp driver row.
(The runtime-filter PLAN gates live in tests/test_plans.py; the value
gate is the registered oracle.)"""

from __future__ import annotations

import os
from pathlib import Path

from discogs_xml_to_parquet_spark.queries import runtime_filters as RT
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
