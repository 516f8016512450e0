"""Stream-static enrichment against a continuously-maintained snapshot:
each micro-batch joins the incoming events with the CURRENT latest-wins
snapshot (streaming/upsert.py) — the "enrich clicks with the user's current
profile" pattern, where the dimension itself is fed by a changelog.

Why foreachBatch and not a plain stream-static join: Spark plans a static
side ONCE at query start, so a `readStream.join(read.parquet(...))` pins
the snapshot version from t₀ forever. Re-reading inside foreachBatch binds
the CURRENT table version to each batch — the semantics a slowly-changing
dimension needs — while staying one broadcast-sized hash join per batch
(the snapshot is O(keys), the stream side is batch-sized).

Freshness contract: a batch is enriched with the snapshot as of the moment
the batch runs (not event time) — the same contract Kafka-connect style
lookup joins document. Rows with no snapshot entry keep NULL enrichment
columns (left join) so downstream can distinguish "unknown user"."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_streaming_logservice_spark.streaming import upsert as UP


def enrich_with_snapshot(
    batch_df: DataFrame, snapshot_dir: str
) -> DataFrame:
    """Left-join a (batch) event relation with the current snapshot's
    per-user state; broadcast the snapshot (O(keys) rows)."""
    from spark_streaming_logservice_spark.streaming.rollup import (
        store_data_dirs,
    )

    spark = batch_df.sparkSession
    if not store_data_dirs(snapshot_dir):
        return batch_df.select(
            "*",
            F.lit(None).cast("string").alias("profile_type"),
            F.lit(None).cast("double").alias("profile_value"),
        )
    snap = UP.read_snapshot(spark, snapshot_dir).select(
        "user_id",
        F.col("event_type").alias("profile_type"),
        F.col("value").alias("profile_value"),
    )
    return batch_df.join(F.broadcast(snap), "user_id", "left")


def enriching_writer(snapshot_dir: str, out_dir: str):
    """foreachBatch function: enrich each batch against the CURRENT
    snapshot version and append the result to ``out_dir`` (parquet).
    Output is append-only; idempotence comes from the streaming engine's
    batch replay plus the deterministic join (re-appending a replayed batch
    is prevented by the caller wrapping with idempotent_foreach_batch)."""
    from spark_streaming_logservice_spark.streaming.queries import (
        idempotent_foreach_batch,
    )

    def write(batch_df: DataFrame, batch_id: int) -> None:
        enriched = enrich_with_snapshot(batch_df, snapshot_dir)
        enriched.write.mode("append").parquet(out_dir)

    return idempotent_foreach_batch(
        write, os.path.join(out_dir, "_markers")
    )
