"""Custom stateful streaming operator via ``applyInPandasWithState``
(engine extension; the prompt-level Spark surface for operators the
built-in windowed aggregations can't express).

``user_running_totals`` keeps one state row per user (event count + value
sum) across micro-batches; state survives restarts through the checkpoint,
so an AvailableNow catch-up run resumes exactly where the previous run
stopped — the streaming analogue of the reference's daily incremental
processing.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, sum_value double"
STATE_SCHEMA = "n long, s double"


def _update(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_value": [round(s, 2)]}
    )


def user_running_totals(
    events_stream: DataFrame, output_mode: str = "append"
) -> DataFrame:
    """Per-user cumulative (count, sum) maintained in keyed state. Append
    output (one snapshot row per touched user per micro-batch) so the
    result can feed a file sink, which is what supports checkpoint
    recovery; the latest snapshot per user is the current total."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode=output_mode,
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------
# Streaming CDC snapshot: the streaming twin of
# plans/changefeed.latest_snapshot (batch max_by compaction).
# --------------------------------------------------------------------------

CDC_OUTPUT_SCHEMA = (
    "user_id long, event_type string, last_ts string,"
    " last_event_id long, last_value double, n_changes long"
)
# last change's order key (epoch micros + event_id), payload, count
CDC_STATE_SCHEMA = "ts_us long, eid long, v double, n long"
_CDC_TS_FMT = "%Y-%m-%d %H:%M:%S"


def _cdc_update(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    ts_us, eid, v, n = state.get if state.exists else (-1, -1, 0.0, 0)
    for pdf in batches:
        if not len(pdf):
            continue
        n += len(pdf)
        # vectorized lexicographic argmax on (ts, event_id): max ts rows,
        # then max event_id among the ties — no per-row Python loop
        us = pdf["ts"].astype("int64") // 1000  # ns -> us
        t_max = int(us.max())
        ties = pdf[us == t_max]
        j = ties["event_id"].idxmax()
        cand = (t_max, int(ties["event_id"].loc[j]))
        if cand > (ts_us, eid):
            ts_us, eid = cand
            v = float(ties["value"].loc[j])
    state.update((ts_us, eid, v, n))
    last_ts = pd.Timestamp(ts_us * 1000).strftime(_CDC_TS_FMT)
    # round half away from zero on the binary double — the batch round2
    # convention, so parity with the batch snapshot is bit-exact
    import math

    rounded = math.copysign(math.floor(abs(v) * 100 + 0.5), v) / 100
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "event_type": [key[1]],
            "last_ts": [last_ts],
            "last_event_id": [eid],
            "last_value": [rounded],
            "n_changes": [n],
        }
    )


def streaming_cdc_snapshot(
    events_stream: DataFrame, output_mode: str = "append"
) -> DataFrame:
    """Continuously-maintained last-write-wins snapshot of a change
    stream: one keyed-state row per (user_id, event_type) holding the
    latest change's (ts, event_id, value) and the change count, updated
    per micro-batch — the streaming MERGE/upsert read-side.

    Batch/streaming parity: per-key state applies the SAME (ts, event_id)
    max-ordering and the same half-away-from-zero value rounding as the
    batch ``plans/changefeed.latest_snapshot``; a pytest replays a feed in
    multiple micro-batches and asserts the final per-key snapshot rows
    equal the batch aggregate over the union.

    Scale shape: state is ONE fixed-width row per live key (never the
    change history — the same "move the snapshot, not the log" property as
    the batch max_by form), partitioned by the grouping key across
    executors; checkpointing makes restarts resume exactly. Append mode
    emits a snapshot row per touched key per micro-batch, so a downstream
    file sink holds the upsert history; the latest row per key is the
    current snapshot."""
    return events_stream.groupBy("user_id", "event_type").applyInPandasWithState(
        _cdc_update,
        outputStructType=CDC_OUTPUT_SCHEMA,
        stateStructType=CDC_STATE_SCHEMA,
        outputMode=output_mode,
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
