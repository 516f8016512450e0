"""Streaming KMV (k-minimum-values / theta) sketch store: the
incrementally-maintained face of operators/sketch.py l26 — per-scope
distinct cardinality AND pairwise overlap, continuously current as events
stream in.

Per micro-batch: reduce the batch to its own per-scope k smallest distinct
60-bit md5 hashes (a rank<=k window — WindowGroupLimit prunes to k rows
per partition BEFORE the shuffle, so the partial is O(scopes × k) rows
regardless of batch size), then merge into the persistent sketch table by
re-taking the k smallest of base ∪ delta through the shared crash-safe
swap (streaming/rollup.merge_additive with a custom combiner). min-k
union is associative, commutative AND idempotent — replaying a batch's
partial is a mathematical no-op, so a crash-retried merge converges with
no dedup bookkeeping.

Like the HLL register store (streaming/hll_store.py) the state is FIXED
size — scopes × k rows forever — but where HLL registers only support
union/cardinality, the KMV hash sets also answer INTERSECTION (overlap)
queries between scopes, which is what l26 exists for. Serving reads the
O(scopes × k) table and runs the same estimator as batch l26; the store
content is IDENTICAL to the batch sketch over the full history (min-k
commutes with batching — pinned by tests/test_kmv_store.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_streaming_logservice_spark.operators.sketch import (
    KMV_K,
    _hash60,
)
from spark_streaming_logservice_spark.streaming.queries import (
    idempotent_foreach_batch,
)
from spark_streaming_logservice_spark.streaming.rollup import (
    merge_additive,
    read_store,
)

_SCHEMA = "scope STRING, h BIGINT"
_H60 = 1152921504606846976  # 2^60 — the hash domain size, as in l26


def _min_k(df: DataFrame, k: int) -> DataFrame:
    """Keep each scope's k smallest distinct hashes — the KMV combiner.
    Associative/commutative/idempotent over unions, so it serves both the
    per-batch partial build and the base ∪ delta merge."""
    w = Window.partitionBy("scope").orderBy("h")
    return (
        df.select("scope", "h")
        .distinct()
        .withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .drop("__rk")
    )


def kmv_partial(
    batch_df: DataFrame,
    scope_col: str = "event_type",
    key_col: str = "user_id",
    k: int = KMV_K,
) -> DataFrame:
    """O(scopes × k) sketch partial of one batch (same md5-60bit hash as
    batch l26, so store state and batch sketches are directly comparable)."""
    return _min_k(
        batch_df.select(
            F.col(scope_col).alias("scope"),
            _hash60("kmv:", F.col(key_col)).alias("h"),
        ),
        k,
    )


def incremental_kmv_writer(
    table_dir: str,
    scope_col: str = "event_type",
    key_col: str = "user_id",
    k: int = KMV_K,
):
    """foreachBatch function maintaining the per-scope min-k hash table
    with batchId-idempotent replay; the merge combiner re-takes the k
    smallest of base ∪ delta per scope (never more than scopes × 2k rows
    in flight)."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        merge_additive(
            table_dir,
            kmv_partial(batch_df, scope_col, key_col, k),
            key_cols=["scope", "h"],
            sum_cols=[],
            schema=_SCHEMA,
            batch_id=batch_id,
            combiner=lambda both: _min_k(both, k),
        )

    return idempotent_foreach_batch(write, os.path.join(table_dir, "_markers"))


def read_kmv_sketch(spark: SparkSession, table_dir: str) -> DataFrame:
    """The maintained (scope, h) sketch rows — O(scopes × k)."""
    return read_store(spark, table_dir, _SCHEMA)


def read_kmv_estimates(
    spark: SparkSession, table_dir: str, k: int = KMV_K
) -> DataFrame:
    """(scope, k_used, est_distinct) from the maintained sketch: exact
    count when the scope never filled its sketch (n < k), else the KMV
    estimator (k-1)·H/theta with theta = the k-th smallest hash — the
    same closed form as batch l26's cardinality path."""
    sk = read_kmv_sketch(spark, table_dir)
    stats = sk.groupBy("scope").agg(
        F.count(F.lit(1)).alias("k_used"), F.max("h").alias("theta")
    )
    est = F.when(
        F.col("k_used") < k, F.col("k_used").cast("double")
    ).otherwise(
        (F.lit(float(k - 1)) * F.lit(float(_H60)))
        / F.col("theta").cast("double")
    )
    return stats.select(
        "scope", "k_used", F.round(est, 2).alias("est_distinct")
    ).orderBy("scope")
