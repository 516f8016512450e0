"""Streaming cross-source duplicate matrix: the incrementally-maintained
face of operators/dedup.py d19 — "which sources copy from which",
continuously current as documents stream in.

Per micro-batch: fingerprint rows (canonical bag-of-words digest, row
local), aggregate to per-(digest, source) counts (one digest-keyed shuffle
with partial combine — the batch's contribution is O(batch distinct
digests) rows), and merge into the persistent count store through the
shared crash-safe sharded swap (streaming/rollup.merge_additive) — counts
are decomposable sums, so replayed/crash-retried merges converge exactly
like the rollup's.

Scale layout: the store is O(distinct digests ever seen) — corpus-sized —
so it is DIGEST-PREFIX-SHARDED (``table/parts/<first hex char>/data``,
16 buckets): a merge reads and republishes only the buckets the batch's
digests land in, and every bucket swap is atomic with its own batch
marker. Serving the matrix runs the same count algebra as batch d19
(C(n,2) within a source, n_a·n_b across, summed per digest) over the
store — never a pair join.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_streaming_logservice_spark.operators.dedup import (
    canonical_fingerprint,
)
from spark_streaming_logservice_spark.streaming.queries import (
    idempotent_foreach_batch,
)
from spark_streaming_logservice_spark.streaming.rollup import (
    merge_additive,
    read_store,
)

_SCHEMA = "dg STRING, source STRING, n BIGINT"


def dup_matrix_partials(
    df: DataFrame, text_col: str = "text", source_col: str = "source"
) -> DataFrame:
    """Per-batch (digest, source) counts — O(batch distinct digests)."""
    return (
        df.select(
            F.col(source_col).alias("source"),
            canonical_fingerprint(text_col).alias("dg"),
        )
        .groupBy("dg", "source")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def incremental_dup_matrix_writer(
    table_dir: str, text_col: str = "text", source_col: str = "source"
):
    """foreachBatch function maintaining the (digest, source) count store
    with batchId-idempotent replay."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        merge_additive(
            table_dir,
            dup_matrix_partials(batch_df, text_col, source_col),
            key_cols=["dg", "source"],
            sum_cols=["n"],
            schema=_SCHEMA,
            batch_id=batch_id,
            partition_expr=F.substring("dg", 1, 1),
        )

    return idempotent_foreach_batch(write, os.path.join(table_dir, "_markers"))


def read_dup_matrix(spark: SparkSession, table_dir: str) -> DataFrame:
    """Serve the matrix from the maintained store: same count algebra as
    batch d19 — within a source C(n,2), across sources n_a·n_b, summed
    per digest; the only join is between per-digest source-count rows
    keyed on the digest (fan-out ≤ |sources| per key)."""
    per = read_store(spark, table_dir, _SCHEMA)
    within = (
        per.groupBy("source")
        # integer DIV, same as batch d19 (ADVICE r7): every term and every
        # partial sum stays bigint — exact at any partitioning
        .agg(F.sum(F.expr("n * (n - 1) DIV 2")).alias("pairs"))
        .where(F.col("pairs") > 0)
        .select(
            F.col("source").alias("src_a"),
            F.col("source").alias("src_b"),
            "pairs",
        )
    )
    a = per.select("dg", F.col("source").alias("src_a"), F.col("n").alias("na"))
    b = per.select("dg", F.col("source").alias("src_b"), F.col("n").alias("nb"))
    across = (
        a.join(b, "dg")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.sum(F.col("na") * F.col("nb")).cast("bigint").alias("pairs"))
    )
    return (
        within.unionByName(across)
        .select("src_a", "src_b", F.col("pairs").alias("n_dup_pairs"))
        .orderBy(F.desc("n_dup_pairs"), F.asc("src_a"), F.asc("src_b"))
    )
