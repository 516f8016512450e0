"""Streaming continuous aggregate: an incrementally-maintained
multi-resolution rollup (the streaming face of operators/events2.py e07).

Each micro-batch is aggregated to minute-grain partials (counts are
decomposable), merged into a tiny persistent rollup table, and the coarser
levels derive from the merged base — the TimescaleDB continuous-aggregate
pattern on Structured Streaming.

Scale/correctness posture:
- The per-batch aggregate is the only corpus-sized work; the merge
  re-aggregates base ∪ delta, both rollup-sized (O(minutes-of-history)).
- The table swap is two-phase (write ``.tmp`` dir, atomic rename) and the
  whole batch step runs under ``idempotent_foreach_batch``, so a replayed
  batchId is a no-op and a crash mid-swap leaves the previous table intact.
- State lives in the table, not the state store — the query itself is
  stateless (append mode), so there is no watermark requirement; late rows
  simply merge into their (old) buckets, exactly like the batch rollup.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_streaming_logservice_spark.streaming.queries import (
    idempotent_foreach_batch,
)

_SCHEMA = "bucket TIMESTAMP_NTZ, n_events BIGINT, n_errors BIGINT"


def minute_partials(df: DataFrame, time_col: str = "ts",
                    type_col: str = "event_type") -> DataFrame:
    """Minute-grain decomposable partials of a (possibly streaming) batch."""
    return df.groupBy(F.date_trunc("minute", time_col).alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count(F.when(F.col(type_col) == "error", 1)).alias("n_errors"),
    )


def merge_partials(table_dir: str, delta: DataFrame) -> None:
    """base ∪ delta → re-aggregate → atomic swap. Both inputs are
    rollup-sized; the rename is the commit point."""
    data = os.path.join(table_dir, "data")
    if os.path.exists(data):
        base = delta.sparkSession.read.schema(_SCHEMA).parquet(data)
        merged = (
            base.unionByName(delta)
            .groupBy("bucket")
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("n_errors").alias("n_errors"),
            )
        )
    else:
        merged = delta
    tmp = data + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    merged.coalesce(1).write.mode("overwrite").parquet(tmp)
    old = data + ".old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(data):
        os.rename(data, old)
    os.rename(tmp, data)
    shutil.rmtree(old, ignore_errors=True)


def incremental_rollup_writer(table_dir: str):
    """foreachBatch function maintaining the minute-grain base table under
    ``table_dir`` with batchId-idempotent replay."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        merge_partials(table_dir, minute_partials(batch_df))

    return idempotent_foreach_batch(write, os.path.join(table_dir, "_markers"))


def read_rollup(spark: SparkSession, table_dir: str,
                levels: tuple[str, ...] = ("hour", "day")) -> DataFrame:
    """Serve the coarser levels from the maintained base table (same
    explode-to-levels shape as batch e07)."""
    base = spark.read.schema(_SCHEMA).parquet(os.path.join(table_dir, "data"))
    structs = [
        F.struct(
            F.lit(lv).alias("resolution"),
            F.date_trunc(lv, "bucket").alias("bucket"),
        )
        for lv in levels
    ]
    return (
        base.select(F.explode(F.array(*structs)).alias("rb"), "n_events", "n_errors")
        .groupBy(
            F.col("rb.resolution").alias("resolution"),
            F.col("rb.bucket").alias("bucket"),
        )
        .agg(F.sum("n_events").alias("n_events"), F.sum("n_errors").alias("n_errors"))
        .orderBy("resolution", "bucket")
    )
