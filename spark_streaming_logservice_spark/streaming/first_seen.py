"""Streaming first-seen table: incrementally-maintained per-user first
activity timestamps — the user-acquisition primitive behind cohort and
retention analytics (operators/events2.py e05 computes cohorts from scratch;
this keeps the cohort key continuously current instead).

Per micro-batch: a per-user ``min(ts)`` partial (O(batch users) rows),
merged into the persistent table with a MIN combiner through the same
two-phase swap + batchId-marker machinery as the rollup and the Count-Min
store (streaming/rollup.merge_additive) — min is associative, commutative
and idempotent under re-merge, so crash retries converge exactly like the
additive cases.

Scale layout: the table is O(all users ever seen) — the same
grows-without-bound class as the upsert snapshot — so it is
KEY-HASH-SHARDED (``table/parts/<crc32(user) % N>/data``); a batch merge
reads and republishes only the buckets its users hash into."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_streaming_logservice_spark.streaming.queries import (
    idempotent_foreach_batch,
)
from spark_streaming_logservice_spark.streaming.rollup import (
    merge_additive,
    read_store,
)

_SCHEMA = "user_id BIGINT, first_seen TIMESTAMP_NTZ"
N_BUCKETS = 16


def first_seen_partials(df: DataFrame, user_col: str = "user_id",
                        time_col: str = "ts") -> DataFrame:
    return df.groupBy(F.col(user_col).alias("user_id")).agg(
        F.min(F.col(time_col)).cast("timestamp_ntz").alias("first_seen")
    )


def incremental_first_seen_writer(table_dir: str):
    """foreachBatch function maintaining the first-seen table with
    batchId-idempotent replay."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        merge_additive(
            table_dir,
            first_seen_partials(batch_df),
            key_cols=["user_id"],
            sum_cols=["first_seen"],
            schema=_SCHEMA,
            batch_id=batch_id,
            aggs={"first_seen": "min"},
            partition_expr=F.crc32(F.col("user_id").cast("string"))
            % N_BUCKETS,
        )

    return idempotent_foreach_batch(write, os.path.join(table_dir, "_markers"))


def read_first_seen(spark: SparkSession, table_dir: str) -> DataFrame:
    return read_store(spark, table_dir, _SCHEMA)
