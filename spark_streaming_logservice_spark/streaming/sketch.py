"""Streaming Count-Min maintenance: a fixed-size frequency sketch kept
continuously up to date over an unbounded stream.

The batch operator (operators/sketch.py l19) builds the (j, col) -> cnt
relation in one pass; this module maintains the same relation incrementally:
each micro-batch contributes its own tiny partial sketch (≤ d×w rows
regardless of batch size), merged into a persistent table through the same
two-phase atomic swap + batchId-marker machinery the incremental rollup
uses (streaming/rollup.merge_additive — cells are decomposable sums, so the
merge is exact, crash-safe, and replay-idempotent).

Why this matters at scale: the sketch is the canonical bounded-state answer
to "top-k / frequency over an infinite stream" — state is O(d×w) forever,
while exact per-key streaming counts grow with the key space. Estimates
from the maintained table are identical to a batch sketch over the full
history (sums commute), which is exactly what the test pins.

Unlike the rollup (O(history), day-sharded) and the upsert/first-seen
stores (O(keys), hash-sharded), this store is NOT sharded — it is
FIXED-size (d×w cells) by construction, so the single-dir whole-table
swap is already a bounded, constant-cost publish at any corpus size.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from spark_streaming_logservice_spark.operators.sketch import (
    CM_DEPTH,
    CM_WIDTH,
    countmin_estimate,
    countmin_sketch,
)
from spark_streaming_logservice_spark.streaming.queries import (
    idempotent_foreach_batch,
)
from spark_streaming_logservice_spark.streaming.rollup import merge_additive

_SKETCH_SCHEMA = "j INT, col BIGINT, cnt BIGINT"


def incremental_countmin_writer(table_dir: str, key_col: str = "user_id",
                                depth: int = CM_DEPTH, width: int = CM_WIDTH):
    """foreachBatch function maintaining the sketch table under
    ``table_dir`` with batchId-idempotent replay."""
    from pyspark.sql import functions as F

    def write(batch_df: DataFrame, batch_id: int) -> None:
        partial = countmin_sketch(
            batch_df, F.col(key_col), depth=depth, width=width
        ).selectExpr("CAST(j AS INT) j", "CAST(col AS BIGINT) col",
                     "CAST(cnt AS BIGINT) cnt")
        merge_additive(
            table_dir,
            partial,
            key_cols=["j", "col"],
            sum_cols=["cnt"],
            schema=_SKETCH_SCHEMA,
            batch_id=batch_id,
        )

    return idempotent_foreach_batch(write, os.path.join(table_dir, "_markers"))


def read_sketch(spark: SparkSession, table_dir: str) -> DataFrame:
    return spark.read.schema(_SKETCH_SCHEMA).parquet(
        os.path.join(table_dir, "data")
    )


def estimate_from_store(spark: SparkSession, table_dir: str, keys: DataFrame,
                        key_col: str, depth: int = CM_DEPTH,
                        width: int = CM_WIDTH) -> DataFrame:
    """CM estimates for a probe key set against the maintained table."""
    return countmin_estimate(
        read_sketch(spark, table_dir), keys, key_col, depth=depth, width=width
    )
