"""Streaming HyperLogLog cardinality store: the incrementally-maintained
face of operators/sketch.py l25 — "distinct users per scope, and overall",
continuously current as events stream in.

Per micro-batch: compute the batch's own (scope, bucket, rmax) register
partial (operators/sketch.hll_registers — O(scopes × 64) rows regardless
of batch size), then merge into the persistent register table with an
associative, idempotent per-bucket MAX through the shared crash-safe swap
(streaming/rollup.merge_additive with aggs={'rmax': 'max'}). max-merge is
exactly the class a crash-retried merge needs: replaying a batch's
registers is a no-op by construction, so convergence needs no dedup.

Like the Count-Min store (streaming/sketch.py) and unlike the rollup
(O(history)) or upsert (O(keys)) stores, this store is FIXED-size —
scopes × m register rows forever, while exact streaming COUNT(DISTINCT)
state grows with the key space. That is the entire 100 TB point: the
serving read touches O(scopes × 64) rows however many trillions of events
have flowed through, and estimates from the maintained table are
IDENTICAL to the batch l25 sketch over the full history (register max
commutes with batching — pinned by tests/test_hll_store.py).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_streaming_logservice_spark.operators.sketch import (
    hll_estimates,
    hll_registers,
)
from spark_streaming_logservice_spark.streaming.queries import (
    idempotent_foreach_batch,
)
from spark_streaming_logservice_spark.streaming.rollup import (
    merge_additive,
    read_store,
)

_SCHEMA = "scope STRING, bucket BIGINT, rmax BIGINT"


def incremental_hll_writer(
    table_dir: str,
    scope_col: str = "event_type",
    key_col: str = "user_id",
):
    """foreachBatch function maintaining the register store with
    batchId-idempotent replay and per-bucket max merge."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        merge_additive(
            table_dir,
            hll_registers(batch_df, F.col(scope_col), F.col(key_col)),
            key_cols=["scope", "bucket"],
            sum_cols=["rmax"],
            schema=_SCHEMA,
            batch_id=batch_id,
            aggs={"rmax": "max"},
        )

    return idempotent_foreach_batch(write, os.path.join(table_dir, "_markers"))


def read_hll_estimates(spark: SparkSession, table_dir: str) -> DataFrame:
    """(scope, est_users) from the maintained registers — same estimator
    stage as batch l25 (scaffold + integer 2^(56-rho) terms + one double
    division), including the register-max-merged 'ALL' scope."""
    reg = read_store(spark, table_dir, _SCHEMA)
    return hll_estimates(spark, reg).orderBy("scope")
