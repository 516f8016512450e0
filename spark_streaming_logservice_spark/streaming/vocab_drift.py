"""Streaming vocabulary profile + ingest-time distribution-drift monitor.

The data-quality gate a training-data ingest pipeline runs per micro-batch:
maintain the per-source token distribution incrementally (the corpus
"vocabulary profile"), and score every incoming batch's distance from the
profile BEFORE it is admitted — a source whose crawler broke, switched
language, or started emitting boilerplate shows up as an L1 spike at
ingest time, not in next week's training run. The batch face of the same
statistic is t19 (positional drift within documents); this store gives the
temporal axis (batch vs accumulated history).

Per micro-batch: one row-local tokenize + a (source, token) count partial
(O(batch vocabulary) rows), merged into the persistent profile with the
additive combiner through the same two-phase swap + batchId-marker
machinery as the rollup store (streaming/rollup.merge_additive) — counts
are associative/commutative, so crash retries converge.

Scale layout: the profile is O(sources × vocabulary) — corpus-INDEPENDENT
row count (a vocabulary saturates; v08's Heaps-law query measures exactly
that curve) — and SOURCE-HASH-SHARDED, so a batch merge reads and
republishes only the buckets its sources hash into, never the whole
profile.

Drift scoring is the t19 discipline: per-token |b/Nb − p/Np| from exact
BIGINT counts, quantized to 1e-6 integer units per token BEFORE the
associative sum — deterministic at any partitioning, overflow-safe.
"""

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

_SCHEMA = "source STRING, token STRING, c BIGINT"
N_BUCKETS = 16


def vocab_partials(
    df: DataFrame, text_col: str = "text", source_col: str = "source"
) -> DataFrame:
    """(source, token, c) for one batch — row-local tokenize (the t19/t18
    whitespace tokenizer) + one map-side-combined count."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), " "), lambda t: t != ""
    )
    return (
        df.select(F.col(source_col).alias("source"), F.explode(toks).alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )


def incremental_vocab_writer(table_dir: str):
    """foreachBatch function maintaining the vocabulary profile with
    batchId-idempotent replay; merges touch only the source-hash buckets
    present in the batch."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        merge_additive(
            table_dir,
            vocab_partials(batch_df),
            key_cols=["source", "token"],
            sum_cols=["c"],
            schema=_SCHEMA,
            batch_id=batch_id,
            partition_expr=F.crc32(F.col("source")) % N_BUCKETS,
        )

    return idempotent_foreach_batch(write, os.path.join(table_dir, "_markers"))


def read_vocab_profile(spark: SparkSession, table_dir: str) -> DataFrame:
    return read_store(spark, table_dir, _SCHEMA)


def batch_drift(
    spark: SparkSession, table_dir: str, batch_df: DataFrame,
    text_col: str = "text", source_col: str = "source",
) -> DataFrame:
    """Per-source L1 distance between ``batch_df``'s token distribution
    and the accumulated profile: (source, batch_tokens, profile_tokens,
    n_terms, l1_drift). 0 = identical distribution, 2 = disjoint
    vocabularies (batch mass 1 all novel + profile mass 1 all missing); a
    source absent from the profile scores 1.0 (its whole batch mass is
    novel, with no profile mass to miss).

    Shape: the batch side is batch-sized; the profile side reads only the
    source buckets the batch touches (bucket filter pushed to the sharded
    scan via the partition value); the join keys on (source, token) —
    O(vocabulary) rows, never corpus rows."""
    b = vocab_partials(batch_df, text_col, source_col).withColumnRenamed(
        "c", "bc"
    )
    prof = read_vocab_profile(spark, table_dir).withColumnRenamed("c", "pc")
    # restrict the profile to the batch's sources (O(batch sources) list,
    # collected once — semi-join would also work; the IN-filter keeps the
    # sharded scan prunable)
    srcs = [r["source"] for r in b.select("source").distinct().collect()]
    prof = prof.where(F.col("source").isin(srcs)) if srcs else prof.limit(0)
    both = b.join(prof, ["source", "token"], "full_outer").select(
        "source",
        F.coalesce(F.col("bc"), F.lit(0)).alias("bc"),
        F.coalesce(F.col("pc"), F.lit(0)).alias("pc"),
    )
    tot = both.groupBy("source").agg(
        F.greatest(F.sum("bc"), F.lit(1)).alias("nb"),
        F.greatest(F.sum("pc"), F.lit(1)).alias("np"),
        F.count(F.lit(1)).alias("n_terms"),
    )
    diff = F.abs(
        F.col("bc").cast("double") / F.col("nb")
        - F.col("pc").cast("double") / F.col("np")
    )
    units = both.join(F.broadcast(tot), "source").select(
        "source",
        "nb",
        "np",
        "n_terms",
        F.floor(diff * 1e6 + 0.5).cast("bigint").alias("u"),
    )
    return (
        units.groupBy("source")
        .agg(
            F.max("nb").cast("bigint").alias("batch_tokens"),
            F.max("np").cast("bigint").alias("profile_tokens"),
            F.max("n_terms").cast("bigint").alias("n_terms"),
            (F.sum("u").cast("double") / F.lit(1e6)).alias("l1_drift"),
        )
        .orderBy("source")
    )
