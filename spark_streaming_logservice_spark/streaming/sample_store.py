"""Streaming bottom-k uniform sample store: a fixed-size, continuously
maintained uniform random sample of an unbounded stream — the "show me 64
random documents per source, current as of now" table every corpus
dashboard and eval-set builder needs.

The estimator is the classic bottom-k / hash-ordered sample: a row is in
the sample iff its key's 60-bit md5 hash ranks among the scope's k
smallest. Because the hash is a pure function of the key, membership is a
property of the DATA, not of arrival order or batching — so the sample is
uniform over distinct keys, exchangeable across batches, and the
maintained table is bit-identical to the batch bottom-k over the full
history (pinned by tests/test_sample_store.py).

Per micro-batch: reduce the batch to its own per-scope bottom-k rows (a
rank<=k window — WindowGroupLimit prunes to k rows per partition BEFORE
the shuffle, so the partial is O(scopes × k) rows regardless of batch
size), then merge into the persistent table by re-taking the k smallest
of base ∪ delta through the shared crash-safe swap
(streaming/rollup.merge_additive with a custom combiner). Bottom-k union
is associative, commutative and idempotent — replaying a batch's partial
is a mathematical no-op, so a crash-retried merge converges with no dedup
bookkeeping.

Unlike the KMV sketch store (streaming/kmv_store.py), which keeps only
hashes and answers cardinality/overlap, this store keeps the ROWS
(payload columns ride along with the hash), answering "what does the
stream look like" — at the price of payload bytes × scopes × k, still
FIXED-size forever. Reservoir sampling gives the same guarantee only with
mutable per-scope state and an RNG; bottom-k needs neither.
"""

from __future__ import annotations

import os
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_streaming_logservice_spark.operators.sketch import _hash60
from spark_streaming_logservice_spark.streaming.queries import (
    idempotent_foreach_batch,
)
from spark_streaming_logservice_spark.streaming.rollup import (
    merge_additive,
    read_store,
)

SAMPLE_K = 64


def _rekeep(df: DataFrame, k: int) -> DataFrame:
    """Keep each scope's k distinct keys with the smallest hashes — the
    bottom-k combiner. The window runs FIRST so WindowGroupLimit prunes
    every partition to its local top-k groups before the one shuffle;
    dense_rank (not row_number) makes duplicate rows of the same
    (scope, sample_key) — identical by construction: immutable payload
    keyed by the sample key — share a rank, so rank<=k admits exactly the
    k smallest DISTINCT keys and the trailing dropDuplicates touches only
    the O(scopes × k) survivors instead of paying a corpus-sized dedup
    exchange up front. (h, sample_key) is a total order over distinct
    keys, so the survivor set is deterministic at any partitioning."""
    w = Window.partitionBy("scope").orderBy("h", "sample_key")
    return (
        df.withColumn("__rk", F.dense_rank().over(w))
        .where(F.col("__rk") <= k)
        .drop("__rk")
        .dropDuplicates(["scope", "sample_key"])
    )


def bottomk_sample_partial(
    batch_df: DataFrame,
    scope_col: str,
    key_col: str,
    payload_cols: Sequence[str],
    k: int = SAMPLE_K,
) -> DataFrame:
    """O(scopes × k) bottom-k sample of one batch: (scope, h, sample_key,
    *payload), hash-ranked within scope. Same md5-60bit hash family as the
    batch sketches, so store state and a batch-computed sample over the
    same rows are directly comparable."""
    rows = batch_df.select(
        F.col(scope_col).cast("string").alias("scope"),
        F.col(key_col).cast("string").alias("sample_key"),
        *[F.col(c) for c in payload_cols],
    ).withColumn("h", _hash60("smp:", F.col("sample_key")))
    return _rekeep(rows, k)


def incremental_sample_writer(
    table_dir: str,
    scope_col: str,
    key_col: str,
    payload_cols: Sequence[str],
    schema: str,
    k: int = SAMPLE_K,
):
    """foreachBatch function maintaining the per-scope bottom-k sample
    table with batchId-idempotent replay; the merge combiner re-takes the
    k smallest of base ∪ delta per scope (never more than scopes × 2k
    rows in flight). ``schema`` must cover (scope STRING, sample_key
    STRING, h BIGINT) plus the payload columns."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        merge_additive(
            table_dir,
            bottomk_sample_partial(batch_df, scope_col, key_col, payload_cols, k),
            key_cols=["scope", "sample_key"],
            sum_cols=[],
            schema=schema,
            batch_id=batch_id,
            combiner=lambda both: _rekeep(both, k),
        )

    return idempotent_foreach_batch(write, os.path.join(table_dir, "_markers"))


def read_sample(spark: SparkSession, table_dir: str, schema: str) -> DataFrame:
    """The maintained sample rows — O(scopes × k), hash-ordered uniform
    over all distinct keys ever streamed."""
    return read_store(spark, table_dir, schema)
