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
