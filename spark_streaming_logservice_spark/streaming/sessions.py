"""Streaming sessionization: gap-based session windows maintained across
micro-batches via ``applyInPandasWithState`` with an event-time timeout —
the streaming counterpart of the batch l07 sessionizer (same 30-minute gap
rule), and the custom-stateful analog of l11's native ``session_window``.

Why a custom operator when ``session_window`` exists: the native version
only supports aggregations; carrying arbitrary session payload (first/last
event ids, custom merge logic) needs the state-store API. This module
demonstrates the full pattern: per-key state partitioned by one shuffle,
Arrow-batched group functions, sessions finalized by the WATERMARK (an
event-time timeout), so results are deterministic in event time — a
processing-time timeout would make session boundaries depend on wall-clock
batch arrival.

100 TB notes: state per key is one fixed-width tuple (no event buffering —
aggregates fold incrementally), the shuffle key is user_id, and the state
store evicts each key as soon as the watermark passes its gap deadline, so
state size is O(active users), not O(events).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_MIN = 30

SESSIONS_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, total_value double"
)
# open-session accumulator: start/end in epoch-us, running count and sum
_STATE_SCHEMA = "start_us bigint, end_us bigint, n bigint, total double"

_GAP_US = SESSION_GAP_MIN * 60 * 1_000_000


def _emit(user_id: int, start_us: int, end_us: int, n: int, total: float) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "session_start": [pd.Timestamp(start_us, unit="us")],
            "session_end": [pd.Timestamp(end_us, unit="us")],
            "n_events": [n],
            "total_value": [round(total, 2)],
        }
    )


def _sessionize_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    user_id = key[0]
    if state.hasTimedOut:
        # watermark passed the open session's gap deadline: it can never
        # be extended — finalize and evict.
        start_us, end_us, n, total = state.get
        state.remove()
        yield _emit(user_id, start_us, end_us, n, total)
        return

    if state.exists:
        start_us, end_us, n, total = state.get
    else:
        start_us = end_us = n = 0
        total = 0.0

    rows = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
    for ts, value in zip(rows["ts"], rows["value"]):
        ts_us = ts.value // 1_000
        if n == 0:
            start_us, end_us, n, total = ts_us, ts_us, 1, float(value)
        elif ts_us - end_us > _GAP_US:
            # gap exceeded inside the batch: previous session is closed by
            # data, not by the watermark — emit immediately.
            yield _emit(user_id, start_us, end_us, n, total)
            start_us, end_us, n, total = ts_us, ts_us, 1, float(value)
        else:
            end_us = max(end_us, ts_us)
            n += 1
            total += float(value)

    state.update((start_us, end_us, n, total))
    # finalize when the watermark passes session_end + gap
    state.setTimeoutTimestamp(end_us // 1_000 + _GAP_US // 1_000)


def sessionize_stream(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Gap-based sessions over a stream; emits one row per CLOSED session
    (append semantics — a session is final once emitted)."""
    keyed = df.select(
        F.col(user_col).cast("bigint").alias("user_id"),
        F.col(ts_col).cast("timestamp").alias("ts"),
        F.col(value_col).cast("double").alias("value"),
    ).withWatermark("ts", watermark)
    return keyed.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn,
        outputStructType=SESSIONS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
