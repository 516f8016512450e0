"""Streaming latest-wins upsert store: an incrementally-maintained current
snapshot of a changelog (the streaming face of operators/cdc.py c02 — MERGE
INTO ... WHEN MATCHED UPDATE, run continuously).

Per micro-batch: collapse the batch to its latest row per key (O(batch keys)
rows), then merge into the persistent snapshot by taking, per key, the row
with the greater (ts, tiebreak) — an argmax combiner, which like min/max is
associative, commutative and idempotent under re-merge, so crash-retried
merges converge exactly like the additive stores. The two-phase swap +
batchId-marker machinery is shared with the rollup / first-seen / Count-Min
stores (streaming/rollup._recover_swap/_commit_swap).

Out-of-order batches are handled by VALUE, not arrival: a late batch whose
rows carry older (ts, tiebreak) keys never overwrites a newer snapshot row —
the argmax does the right thing without any watermark.

Scale layout: the snapshot is O(active keys) — hundreds of millions of
rows for a user-profile store at 100 TB — so a per-batch full rewrite is
the same hazard the rollup store's day shards fix. The snapshot is
KEY-HASH-SHARDED (``table/parts/<crc32(key) % N>/data``) through the same
machinery: a merge reads and republishes only the buckets the batch's keys
hash into (skewed/localized update patterns touch few buckets), each
bucket swapped atomically with its own batch marker."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_streaming_logservice_spark.streaming.queries import (
    idempotent_foreach_batch,
)
from spark_streaming_logservice_spark.streaming.rollup import (
    merge_additive,
    read_store,
)

N_BUCKETS = 16

_SCHEMA = (
    "user_id BIGINT, event_id BIGINT, event_type STRING,"
    " value DOUBLE, ts TIMESTAMP_NTZ"
)


def latest_partials(
    df: DataFrame, key: str = "user_id", ts: str = "ts",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Per-batch latest row per key (same keyed window as cdc.upsert_latest,
    over batch-sized input)."""
    w = Window.partitionBy(key).orderBy(F.col(ts).desc(), F.col(tiebreak).desc())
    return (
        df.withColumn("__rn__", F.row_number().over(w))
        .where(F.col("__rn__") == 1)
        .drop("__rn__")
    )


def merge_latest(
    table_dir: str,
    delta: DataFrame,
    key: str,
    ts: str,
    tiebreak: str,
    schema: str,
    batch_id: int | None = None,
) -> None:
    """base ∪ delta → argmax per key by (ts, tiebreak) → atomic swap of the
    touched key-hash buckets only. Both inputs are bucket-sized, never
    corpus-sized; untouched buckets are neither read nor rewritten."""
    merge_additive(
        table_dir,
        delta,
        key_cols=[key],
        sum_cols=[],
        schema=schema,
        batch_id=batch_id,
        partition_expr=F.crc32(F.col(key).cast("string")) % N_BUCKETS,
        combiner=lambda both: latest_partials(
            both, key=key, ts=ts, tiebreak=tiebreak
        ),
    )


def incremental_upsert_writer(table_dir: str):
    """foreachBatch function maintaining the latest-wins snapshot under
    ``table_dir`` with batchId-idempotent replay. Expects batches with the
    changelog projection (user_id, event_id, event_type, value, ts)."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        merge_latest(
            table_dir,
            latest_partials(batch_df),
            key="user_id",
            ts="ts",
            tiebreak="event_id",
            schema=_SCHEMA,
            batch_id=batch_id,
        )

    return idempotent_foreach_batch(write, os.path.join(table_dir, "_markers"))


def read_snapshot(spark: SparkSession, table_dir: str) -> DataFrame:
    return read_store(spark, table_dir, _SCHEMA)
