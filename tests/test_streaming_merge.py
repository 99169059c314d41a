"""Transactional streaming-MERGE sink invariants (queries/
streaming_merge.py): the replay gate skips an already-applied batchId
(non-idempotent increments survive at-least-once delivery), a crashed
attempt's orphan version is rebuilt not double-applied, and untouched
months share storage across versions."""

from __future__ import annotations

import json
import shutil
from pathlib import Path

from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark.queries.streaming_merge import (
    apply_batch,
    init_table,
    staged_delta_shards,
)
from tests.conftest import SF_SMOKE


def _delta_batch(spark, shard: Path):
    return spark.read.parquet(str(shard))


def _revenue(spark, table: Path) -> float:
    cur = (table / "_current").read_text()
    return (
        spark.read.parquet(str(table / cur))
        .agg(F.sum(F.expr(
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")))
        .first()[0]
    )


def test_replay_gate_skips_applied_batch(spark, tmp_path):
    """The at-least-once moment: applying the SAME batchId twice must
    be a no-op the second time -- increments are not idempotent, so
    without the gate the second apply would move the checksum."""
    table = tmp_path / "t"
    init_table(spark, SF_SMOKE, table)
    shard = sorted(Path(staged_delta_shards(spark, SF_SMOKE))
                   .glob("q*.parquet"))[0]
    v1 = apply_batch(spark, table, _delta_batch(spark, shard), 0)
    assert v1 == "v1"
    rev_after = _revenue(spark, table)
    assert apply_batch(spark, table, _delta_batch(spark, shard), 0) \
        == "skipped"
    assert _revenue(spark, table) == rev_after
    assert (table / "_current").read_text() == "v1"


def test_orphan_version_is_rebuilt_not_double_applied(spark, tmp_path):
    """Crash between writing the new version and flipping `_current`:
    the orphan dir exists but the table is unchanged; the replay must
    rebuild the SAME version name and apply exactly once."""
    table = tmp_path / "t"
    init_table(spark, SF_SMOKE, table)
    shard = sorted(Path(staged_delta_shards(spark, SF_SMOKE))
                   .glob("q*.parquet"))[0]
    rev_v0 = _revenue(spark, table)
    # fake the crashed attempt: an orphan v1 with garbage inside
    orphan = table / "v1"
    orphan.mkdir()
    (orphan / "_applied.json").write_text(json.dumps({"applied": [0]}))
    assert (table / "_current").read_text() == "v0"  # crash pre-flip
    n_upd = _delta_batch(spark, shard).count()
    assert apply_batch(spark, table, _delta_batch(spark, shard), 0) \
        == "v1"
    assert (table / "_current").read_text() == "v1"
    # exactly one +10.00 (= 1000 cents) per delta key
    assert _revenue(spark, table) == rev_v0 + 1000 * n_upd


def test_untouched_months_share_storage(spark, tmp_path):
    """O(affected) bytes per version: every month the batch did not
    touch must resolve to the PREVIOUS version's exact directory."""
    table = tmp_path / "t"
    init_table(spark, SF_SMOKE, table)
    shard = sorted(Path(staged_delta_shards(spark, SF_SMOKE))
                   .glob("q*.parquet"))[0]
    batch = _delta_batch(spark, shard)
    touched = {"o_month=" + r["o_month"]
               for r in batch.select("o_month").distinct().collect()}
    apply_batch(spark, table, batch, 0)
    v0, v1 = table / "v0", table / "v1"
    months = sorted(p.name for p in v0.glob("o_month=*"))
    for m in months:
        if m in touched:
            assert not (v1 / m).is_symlink(), m
        else:
            assert (v1 / m).resolve() == (v0 / m).resolve(), m


def test_empty_batch_commits_metadata_only(spark, tmp_path):
    """A batch with zero rows must still commit its batchId (else the
    stream would re-deliver it forever) while rewriting nothing."""
    table = tmp_path / "t"
    init_table(spark, SF_SMOKE, table)
    shard = sorted(Path(staged_delta_shards(spark, SF_SMOKE))
                   .glob("q*.parquet"))[0]
    empty = _delta_batch(spark, shard).filter(F.lit(False))
    rev_v0 = _revenue(spark, table)
    assert apply_batch(spark, table, empty, 0) == "v1"
    assert _revenue(spark, table) == rev_v0
    cur = (table / "v1" / "_applied.json").read_text()
    assert json.loads(cur)["applied"] == [0]
