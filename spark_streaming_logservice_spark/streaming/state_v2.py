"""Arbitrary stateful streaming on Spark 4's transformWithState API.

applyInPandasWithState (streaming/stateful.py, streaming/sessions.py) is the
Spark 3.x arbitrary-state surface; Spark 4 replaces it with the
StatefulProcessor/handle API — typed named state, explicit lifecycle, and
(in later releases) timers/TTL per state variable. This module exercises the
new surface with the canonical bounded-state example: a per-key running
top-k maintained across micro-batches.

Why top-k: the state is FIXED SIZE per key (k doubles), so state-store
growth is O(keys · k) forever — the property that separates a production
streaming aggregate from one that OOMs in week three. Each batch emits the
key's refreshed top-k, so downstream sees an always-current leaderboard
without any reprocessing.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

TOPK_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("topk", ArrayType(DoubleType())),
    ]
)

_STATE_SCHEMA = StructType([StructField("vals", ArrayType(DoubleType()))])


class RunningTopKProcessor(StatefulProcessor):
    """Keeps the k largest values ever seen per key; emits the refreshed
    top-k (descending) once per key per batch it appears in."""

    def __init__(self, k: int = 3):
        self._k = k

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("topk", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        vals = list(self._state.get()[0]) if self._state.exists() else []
        for pdf in rows:
            vals.extend(float(v) for v in pdf["value"])
        vals = sorted(vals, reverse=True)[: self._k]
        self._state.update((vals,))
        yield pd.DataFrame({"user_id": [key[0]], "topk": [vals]})

    def close(self) -> None:
        pass


def running_topk(df: DataFrame, k: int = 3) -> DataFrame:
    """Per-user running top-k of ``value`` over a stream with columns
    (user_id, value). Update mode: one refreshed row per active key per
    batch."""
    return (
        df.groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningTopKProcessor(k),
            outputStructType=TOPK_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
