"""Custom stateful streaming operator via applyInPandasWithState: the
escape hatch when windowed built-ins can't express the state machine
(per-key counters, sessionizers with custom logic, online aggregates).

State design rules encoded here:
- state schema is explicit and tiny (two longs + a double per user) --
  the state store holds one row per key, so state size x key
  cardinality is the memory budget
- the function is incremental: it folds each microbatch's rows into
  state and emits one update row per touched key -- output is
  proportional to keys-in-batch, not history
- a processing-time timeout evicts idle keys, bounding the store
  (without it, state grows with total distinct keys forever)

Spark 4's newer transformWithStateInPandas API (StatefulProcessor +
value/list/map state + timers) was probed and does NOT run in this
container: its driver-side runner needs google.protobuf, which is
broken here (ImportError: cannot import name 'descriptor'), an
environment gate like the multimodal decoders. applyInPandasWithState
expresses the same state machines on the stable API.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
])

STATE_SCHEMA = StructType([
    StructField("n_events", LongType()),
    StructField("value_units", LongType()),  # exact micro-units, not float
])


def _make_update_user(evict_after_ms: int | None):
    def _update_user(key, pdfs: Iterator[pd.DataFrame],
                     state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n, units = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            # accumulate in integer micro-units so state totals are
            # exact and independent of batch arrival order
            units += int((pdf["value"] * 1_000_000).round().astype("int64").sum())
        state.update((n, units))
        if evict_after_ms is not None:
            state.setTimeoutDuration(evict_after_ms)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n],
             "total_value": [units / 1_000_000]}
        )

    return _update_user


def running_user_totals(events: DataFrame,
                        evict_after_ms: int | None = None) -> DataFrame:
    """Streaming per-user running totals with custom state. Input must
    be a streaming frame with (user_id, value).

    evict_after_ms enables processing-time state eviction for unbounded
    key spaces. Caveat: with processing-time timeouts Spark schedules
    *continuous empty microbatches* to fire timeout checks, so
    processAllAvailable() never stabilizes -- use it only with a spaced
    processingTime trigger, never with availableNow/test harnesses."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if evict_after_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _make_update_user(evict_after_ms),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )


# --- CDC latest-state (streaming twin of queries/cdc.q_cdc_apply) -----

CDC_OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("last_op", StringType()),
    StructField("last_value", DoubleType()),
    StructField("last_ts_micros", LongType()),
    StructField("n_ops", LongType()),
])

CDC_STATE_SCHEMA = StructType([
    StructField("ts_micros", LongType()),
    StructField("event_id", LongType()),
    StructField("last_op", StringType()),
    StructField("last_value", DoubleType()),
    StructField("n_ops", LongType()),
])


def _update_latest(key, pdfs: Iterator[pd.DataFrame],
                   state: GroupState) -> Iterator[pd.DataFrame]:
    """Fold a microbatch of changelog rows into per-key latest state.
    The winner within and across batches is max (ts, event_id) -- the
    same total order q_cdc_apply ranks by, so replaying any batch
    arrangement of the same changelog converges to the identical
    state (the exactly-once-after-reorder property CDC apply needs)."""
    ts_us, eid, op, val, n = (
        state.get if state.exists else (-1, -1, None, None, 0)
    )
    for pdf in pdfs:
        if not len(pdf):
            continue
        n += len(pdf)
        us = (pdf["ts"].astype("int64") // 1000)  # ns -> us
        top = pdf.assign(_us=us).sort_values(
            ["_us", "event_id"]).iloc[-1]
        if (int(top["_us"]), int(top["event_id"])) > (ts_us, eid):
            ts_us, eid = int(top["_us"]), int(top["event_id"])
            op, val = str(top["event_type"]), float(top["value"])
    state.update((ts_us, eid, op, val, n))
    yield pd.DataFrame({
        "user_id": [key[0]], "last_op": [op], "last_value": [val],
        "last_ts_micros": [ts_us], "n_ops": [n],
    })


def latest_keyed_state(changelog: DataFrame) -> DataFrame:
    """Streaming CDC compaction: one state row per key holding the
    latest (ts, event_id)-ordered operation and the changelog depth.
    Emits the refreshed state for every key touched by the microbatch
    (update mode). Input: a streaming frame with (user_id, ts,
    event_id, event_type, value). Delete semantics are downstream's
    call (filter last_op), matching the batch lane."""
    return (
        changelog.groupBy("user_id")
        .applyInPandasWithState(
            _update_latest,
            outputStructType=CDC_OUTPUT_SCHEMA,
            stateStructType=CDC_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
