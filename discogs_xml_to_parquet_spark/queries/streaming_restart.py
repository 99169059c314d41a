"""Checkpointed streaming restart: the exactly-once resume story.

Every other streaming lane (streaming_queries.py) runs a single
readStream to completion into a memory sink -- fine for semantics, but
the property a production 100 TB ingest actually relies on is
RECOVERY: a streaming job that dies mid-backfill must restart from its
checkpoint and produce the identical result, never re-emitting a
committed batch and never losing an in-flight one. This lane
demonstrates that end to end with the durable pair Structured
Streaming's guarantee is built on: a file SINK (whose _spark_metadata
transaction log makes readers see only committed batches) plus a
CHECKPOINT (whose offsets/commits WAL makes the source replay exactly
the uncommitted work).

The lane:

1. stages the events table as 8 parquet shard files;
2. run 1 reads a source directory seeded with only the first 3 shards
   (availableNow, maxFilesPerTrigger=1 -- so progress is batch-at-a-
   time) and is KILLED mid-stream: a poller stops the query as soon as
   the first batch commits, so the checkpoint is left partial by
   construction (committed batches cover at most 3 of the 8 shards,
   and an in-flight batch may have written data files the sink log
   does not reference);
3. the remaining 5 shards arrive (the late-file pattern of a periodic
   batch-drain ingest);
4. run 2 starts from the SAME checkpoint + sink with a plain
   availableNow trigger: the source WAL replays any planned-but-
   uncommitted batch byte-for-byte, skips every committed one, then
   admits the new files;
5. the result is read back THROUGH the sink's metadata log, so orphan
   files from the killed batch are invisible -- exactly once, pinned
   by the relational oracle over the full corpus.

Scale shape: everything on the hot path is the stream itself -- the
transform is a stateless map (codegen projection), the sink is
append-mode parquet, checkpoint I/O is O(batches), and recovery cost
is O(one batch replay), independent of history length. At 100 TB the
same topology is "restart the ingest job after a node loss": the
checkpoint, not the data, carries the resume point.

The extended-never-rewritten WAL property is enforced IN the lane:
run_restart_lane snapshots run 1's commit record bytes and raises if
run 2 changed any of them (so every execution -- driver, bench,
tests/test_streaming_restart.py -- checks byte identity, and run 2's
batch ids must be a strict continuation).
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark.registry import query
from discogs_xml_to_parquet_spark.staging import (
    source_fingerprint as _source_fingerprint,
    staged as _staged,
    work_dir as _work_dir,
)
from discogs_xml_to_parquet_spark.streaming.events import (
    EVENTS_STREAM_SCHEMA as _SCHEMA,
)
from discogs_xml_to_parquet_spark.tables import load

_N_SHARDS = 8
_FIRST_SHARDS = 3       # shards visible to run 1 (partial by construction)
_DRAIN_TIMEOUT_SEC = 600
_VERSION = 1


def staged_event_shards(spark: SparkSession, sf_dir: str) -> str:
    """The events table rewritten as exactly _N_SHARDS parquet files
    (round-robin repartition), built once per container per (sf_dir,
    source fingerprint) with atomic publish -- the multi-file backfill
    the restart lane feeds from."""
    slug = sf_dir.strip("/").replace("/", "_")
    fp = _source_fingerprint(sf_dir, "events.parquet")
    return _staged(
        f"spark_graft_evshards_v{_VERSION}_n{_N_SHARDS}_{slug}_{fp}",
        lambda tmp: (
            load(spark, sf_dir, "events")
            .repartition(_N_SHARDS)
            .write.mode("overwrite")
            .parquet(tmp)
        ),
    )


def _committed_batches(ckpt: str) -> list[int]:
    """Batch ids with a commit record in the checkpoint WAL (the
    source of truth for what a restart may never re-emit)."""
    commits = Path(ckpt) / "commits"
    if not commits.is_dir():
        return []
    return sorted(int(p.name) for p in commits.iterdir()
                  if p.name.isdigit())


def _commit_blobs(ckpt: str) -> dict[int, bytes]:
    """Commit WAL records by batch id, BYTES -- so a resume that
    rewrote a committed record in place (same id, new payload) is
    detectable, not just a shortened id list."""
    commits = Path(ckpt) / "commits"
    if not commits.is_dir():
        return {}
    return {int(p.name): p.read_bytes()
            for p in commits.iterdir() if p.name.isdigit()}


def _transform(stream: DataFrame) -> DataFrame:
    """The lane's stateless map: project the changelog to its stable
    identity plus an exact integer-cents value (codegen-only; no state,
    so recovery cost is pure batch replay)."""
    return stream.select(
        "event_id", "user_id", "event_type",
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")
        .alias("value_cents"),
    )


def run_restart_lane(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, dict]:
    """Execute the kill/resume cycle; returns (result read through the
    sink metadata log, facts for the invariant asserts)."""
    import time

    shards = sorted(Path(staged_event_shards(spark, sf_dir))
                    .glob("part-*"))
    if len(shards) != _N_SHARDS:  # not assert: must survive python -O
        raise RuntimeError(
            f"staged shard dir holds {len(shards)} part files, "
            f"expected {_N_SHARDS}: {shards}")
    # reused per-(corpus, pid) root (staging.work_dir): the returned
    # DataFrame reads the sink lazily, so rebuild-on-next-call is the
    # leak bound -- mkdtemp leaked a full corpus copy per run
    run_root = Path(_work_dir("restart", sf_dir))
    run_root.mkdir()
    src = run_root / "src"
    out, ckpt = str(run_root / "out"), str(run_root / "ckpt")
    src.mkdir()
    for p in shards[:_FIRST_SHARDS]:
        shutil.copy(p, src / p.name)

    def start(max_files: int | None):
        r = spark.readStream.schema(_SCHEMA)
        if max_files is not None:
            r = r.option("maxFilesPerTrigger", max_files)
        return (
            _transform(r.parquet(str(src)))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    # run 1: batch-at-a-time over the 3 visible shards, killed as soon
    # as the first commit lands (stop() interrupts any in-flight batch;
    # the checkpoint stays consistent -- that is the property under
    # test). If the drain wins the race and finishes first, the lane
    # still exercises resume: 5 shards are invisible by construction.
    q1 = start(max_files=1)
    deadline = time.monotonic() + _DRAIN_TIMEOUT_SEC
    while q1.isActive and not _committed_batches(ckpt):
        if time.monotonic() > deadline:
            q1.stop()
            raise RuntimeError("restart lane run 1: no commit within "
                               f"{_DRAIN_TIMEOUT_SEC}s")
        time.sleep(0.01)
    q1.stop()
    q1.awaitTermination()
    run1 = _committed_batches(ckpt)
    if len(run1) > _FIRST_SHARDS:
        raise RuntimeError(f"run 1 committed {run1}; expected at most "
                           f"{_FIRST_SHARDS} single-file batches")
    run1_blobs = _commit_blobs(ckpt)

    # the rest of the backfill arrives
    for p in shards[_FIRST_SHARDS:]:
        shutil.copy(p, src / p.name)

    # run 2: resume from the same checkpoint; the WAL replays the
    # killed batch (if any) exactly and admits only unseen files
    q2 = start(max_files=None)
    if not q2.awaitTermination(_DRAIN_TIMEOUT_SEC):
        q2.stop()
        raise RuntimeError("restart lane run 2 did not finish within "
                           f"{_DRAIN_TIMEOUT_SEC}s")
    total = _committed_batches(ckpt)
    if total[:len(run1)] != run1:
        raise RuntimeError(f"resume rewrote committed history: "
                           f"run1={run1} total={total}")
    if len(total) <= len(run1):
        raise RuntimeError(f"run 2 committed nothing: run1={run1} "
                           f"total={total}")
    # the WAL is extended, never rewritten: run 1's commit records
    # must survive run 2 BYTE-identically (a resume that rewrote a
    # committed record in place would pass the id-list checks above)
    blobs2 = _commit_blobs(ckpt)
    rewritten = [i for i, b in run1_blobs.items() if blobs2.get(i) != b]
    if rewritten:
        raise RuntimeError(
            f"resume rewrote committed WAL records in place: {rewritten}")
    facts = {"run1_commits": run1, "total_commits": total,
             "wal_extended_not_rewritten": not rewritten,
             "run_root": str(run_root)}
    # read THROUGH _spark_metadata: orphan files from the killed batch
    # are invisible, committed batches appear exactly once
    return spark.read.parquet(out), facts


@query(
    "q_stream_restart",
    oracle="""
SELECT event_id, user_id, event_type,
       CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_cents
FROM events
ORDER BY event_id
""",
)
def q_stream_restart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kill-and-resume exactly-once: a checkpointed file-sink stream
    over the sharded events backfill is stopped mid-drain, restarted
    from its checkpoint after more shards arrive, and the sink -- read
    through its transaction log -- must equal the plain relational
    projection of the full corpus. A lost batch would drop rows, a
    re-emitted one would duplicate event_ids; either breaks the
    row-count + value hash, so the oracle match IS the exactly-once
    proof. In-lane guards additionally pin that run 1 was partial
    (at most 3 of 8 shards committed) and that run 2 extended the
    commit WAL without rewriting it."""
    result, _ = run_restart_lane(spark, sf_dir)
    return result.orderBy("event_id")
