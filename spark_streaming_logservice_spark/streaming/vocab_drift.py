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
    whitespace tokenizer) + one map-side-combined count. NULL-source rows
    are excluded: the profile is keyed and hash-sharded on the source
    name, so a NULL source has no bucket (crc32(NULL) is NULL and the
    sharded merge rejects NULL partition values) — without this filter a
    single NULL-source row would crash the merge and wedge the stream on
    that batch forever."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), " "), lambda t: t != ""
    )
    return (
        df.where(F.col(source_col).isNotNull())
        .select(F.col(source_col).alias("source"), F.explode(toks).alias("token"))
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


def read_vocab_profile(
    spark: SparkSession, table_dir: str, sources=None
) -> DataFrame:
    """The accumulated profile; with ``sources`` given, only the shard
    buckets those sources hash into are even LISTED (directory-level
    pruning via ``_source_buckets`` — the Python mirror of the merge's
    ``crc32(source) % N_BUCKETS`` partition expr)."""
    buckets = None if sources is None else _source_buckets(sources)
    return read_store(spark, table_dir, _SCHEMA, buckets=buckets)


def _source_buckets(sources) -> set[str]:
    """Shard-bucket ids for a set of source names, computed driver-side.
    ``zlib.crc32`` over UTF-8 bytes equals Spark's ``F.crc32`` (both are
    the IEEE CRC-32 of the string's bytes; Python 3 returns it unsigned,
    matching Spark's non-negative bigint), so this is exactly the bucket
    the merge's ``partition_expr`` routed each source to —
    ``tests/test_vocab_drift.py`` pins the Python/Spark agreement."""
    import zlib

    return {
        str(zlib.crc32(s.encode("utf-8")) % N_BUCKETS) for s in sources
    }


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

    Shape: the batch side is batch-sized; the profile side reads ONLY the
    shard buckets the batch's sources hash into — the bucket ids are
    computed driver-side (``_source_buckets``, the zlib mirror of the
    merge's ``crc32(source) % N_BUCKETS``) and passed to ``read_store`` as
    a directory filter, so untouched buckets are never listed or opened;
    the residual ``source IN (...)`` predicate then drops same-bucket
    strangers. The join keys on (source, token) — O(vocabulary) rows,
    never corpus rows."""
    b = vocab_partials(batch_df, text_col, source_col).withColumnRenamed(
        "c", "bc"
    )
    # the batch's sources (O(batch sources) list, collected once) drive
    # both the directory-level bucket pruning and the row-level IN-filter
    # NULL sources can never be in the profile (crc32(NULL) is NULL and
    # the sharded merge rejects NULL partition values), so drop them here
    srcs = [
        r["source"]
        for r in b.select("source").distinct().collect()
        if r["source"] is not None
    ]
    prof = read_vocab_profile(
        spark, table_dir, sources=srcs
    ).withColumnRenamed("c", "pc")
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


def score_and_split(
    table_dir: str,
    batch_df: DataFrame,
    threshold: float,
    min_profile_tokens: int,
    text_col: str = "text",
    source_col: str = "source",
):
    """One admission decision: score per-source drift against the profile
    and split the batch. Returns ``(score_dicts, flagged_sources, clean_df,
    quarantined_df_or_None)``. Shared by :func:`admission_gate` and the
    composed ingest pipeline (streaming/ingest_pipeline.py) so the
    bootstrap rule, threshold semantics and NULL-source posture cannot
    silently fork between the two gate surfaces."""
    scores = [
        r.asDict()
        for r in batch_drift(
            batch_df.sparkSession, table_dir, batch_df, text_col, source_col
        ).collect()  # O(batch sources) rows
    ]
    flagged = sorted(
        s["source"]
        for s in scores
        if s["profile_tokens"] > min_profile_tokens
        and s["l1_drift"] >= threshold
    )
    if not flagged:
        return scores, flagged, batch_df, None
    quarantined = batch_df.where(F.col(source_col).isin(flagged))
    # NULL sources are unscoreable pass-through, never quarantined
    # (a bare NOT IN would silently drop them: NULL isin = NULL)
    clean = batch_df.where(
        F.col(source_col).isNull() | ~F.col(source_col).isin(flagged)
    )
    return scores, flagged, clean, quarantined


def admission_gate(
    table_dir: str,
    forward,
    on_alert,
    threshold: float = 0.5,
    min_profile_tokens: int = 1,
    text_col: str = "text",
    source_col: str = "source",
):
    """foreachBatch factory wiring :func:`batch_drift` into the ingest
    path as an ADMISSION GATE (the monitor's last mile, VERDICT r10
    item 6): each micro-batch is scored per source against the
    accumulated profile BEFORE anything is admitted.

    - Sources with ``l1_drift >= threshold`` are QUARANTINED:
      ``on_alert(batch_id, score_rows, quarantined_df)`` receives the
      batch_drift score dicts (source, batch_tokens, profile_tokens,
      n_terms, l1_drift) AND the flagged rows themselves — the recovery
      handle; stage them durably if a false positive must be replayable,
      because the source checkpoint advances past this batch. Flagged
      rows are neither forwarded downstream nor merged into the profile —
      a broken crawler must not teach the profile its own breakage.
    - Clean sources are forwarded via ``forward(clean_df, batch_id)`` and
      merged into the profile (same bucket-sharded additive merge as
      :func:`incremental_vocab_writer`).
    - Bootstrap rule: a source the profile barely knows
      (``profile_tokens <= min_profile_tokens`` — a never-seen source
      reads as 1 via the division clamp) is admitted on trust and seeds
      the profile; drift is only meaningful against history.
    - NULL-source rows cannot be profiled or scored (the profile is
      keyed and hash-sharded on the source name); they are always
      forwarded, never merged — the dedup store's NULL-text posture.

    Crash contract (the dedup store's, NOT stronger): the batch marker
    under ``<table_dir>/_markers`` makes replay of a COMPLETED batch a
    no-op, but a crash after ``forward``/``on_alert`` and before the
    marker re-runs both on replay — downstream and alerting must
    tolerate redelivery, exactly as ``dedup_on_ingest`` requires of its
    ``forward``."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        scores, flagged, clean, quarantined = score_and_split(
            table_dir, batch_df, threshold, min_profile_tokens,
            text_col, source_col,
        )
        if flagged:
            on_alert(
                batch_id,
                [s for s in scores if s["source"] in set(flagged)],
                quarantined,
            )
        forward(clean, batch_id)
        merge_additive(
            table_dir,
            vocab_partials(clean, text_col, source_col),
            key_cols=["source", "token"],
            sum_cols=["c"],
            schema=_SCHEMA,
            batch_id=batch_id,
            partition_expr=F.crc32(F.col("source")) % N_BUCKETS,
        )

    return idempotent_foreach_batch(apply, os.path.join(table_dir, "_markers"))
