"""Dedup-on-ingest: streaming exact dedup against a PERSISTENT digest store.

``queries.dedup_stream`` (dropDuplicates + watermark) bounds its state to the
watermark horizon — correct for in-flight duplicates, but a training-data
ingest pipeline must suppress duplicates against *everything ever ingested*.
That state can't live in the streaming state store (unbounded); the standard
shape is an external digest table:

    per micro-batch:
      1. digest rows (md5 of the content column — 16 bytes/doc),
      2. collapse duplicates within the batch (keep lowest id),
      3. anti-join against the persistent digest table,
      4. forward only the novel rows to the downstream writer,
      5. append the novel digests to the table (atomic rename + marker).

Scale: the digest table is O(corpus) rows of 16-byte keys — at 100 TB it is
parquet bucketed by digest, so the per-batch anti-join shuffles only the new
batch (the table side is pre-partitioned); here it is a plain parquet dir
(one file per batch; compact with ``sources/maintenance.py`` patterns when
file count grows). The batch never collects to the driver.

Crash contract (mirrors the logstore sink's stage-then-publish protocol,
``sources/logstore.py``): the downstream ``forward`` MUST itself be
idempotent under batch replay (wrap with ``idempotent_foreach_batch`` or
write to the logstore sink). Ordering is forward → digests → marker:
- crash before digests land → replay re-forwards (downstream guard absorbs
  it) and then lands digests;
- crash between digests and marker → replay sees its own digests in the
  store, forwards nothing new, and completes the marker — rows were already
  forwarded by the failed attempt, so nothing is lost or doubled.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DIGEST_SCHEMA = "digest STRING"


def _store_files(digest_dir: str) -> list[str]:
    if not os.path.isdir(digest_dir):
        return []
    return [
        os.path.join(digest_dir, f)
        for f in sorted(os.listdir(digest_dir))
        if f.endswith(".parquet") and not f.startswith("_staging")
    ]


def dedup_against_store(
    batch_df: DataFrame, digest_dir: str, text_col: str, id_col: str
) -> DataFrame:
    """The batch's novel rows: within-batch collapse (keep the lowest id per
    digest), then an anti-join on the persistent digest table."""
    spark = batch_df.sparkSession
    digested = batch_df.withColumn("__digest", F.md5(F.col(text_col)))
    # within-batch: keep the lowest id per digest (deterministic winner)
    keeper = digested.groupBy("__digest").agg(F.min(id_col).alias(id_col))
    fresh = digested.join(keeper, ["__digest", id_col], "left_semi")
    files = _store_files(digest_dir)
    if not files:
        return fresh
    seen = spark.read.schema(DIGEST_SCHEMA).parquet(*files)
    return fresh.join(
        seen, fresh["__digest"] == seen["digest"], "left_anti"
    )


def dedup_on_ingest(forward, digest_dir: str, text_col: str = "text",
                    id_col: str = "doc_id", namespace: str = "q"):
    """foreachBatch function factory: forward only never-seen-before rows
    downstream and remember their digests durably.

    ``forward(novel_df, batch_id)`` receives the novel rows WITHOUT the
    internal ``__digest`` column and must be replay-idempotent (see module
    docstring for the crash contract). ``namespace`` disambiguates batch
    ids when several streaming queries feed ONE shared digest store — the
    same lesson the logstore sink's commit markers learned (two queries
    both have a batch 0; an unqualified marker would read the other
    query's progress as its own replay).
    """

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        os.makedirs(digest_dir, exist_ok=True)
        # sweep staging orphans from crashed attempts (same recovery rule as
        # the logstore sink: anything not renamed to final never happened)
        for f in os.listdir(digest_dir):
            if f.startswith("_staging"):
                shutil.rmtree(os.path.join(digest_dir, f), ignore_errors=True)
        marker = os.path.join(digest_dir, f"{namespace}-batch-{batch_id}.done")
        if os.path.exists(marker):
            return
        novel = dedup_against_store(batch_df, digest_dir, text_col, id_col)
        # novel is re-computed below for the digest write; materializing the
        # forward first keeps the crash ordering (forward -> digests).
        forward(novel.drop("__digest"), batch_id)
        final = os.path.join(digest_dir, f"{namespace}-batch-{batch_id}.parquet")
        if not os.path.exists(final):
            staging = os.path.join(
                digest_dir, f"_staging-{batch_id}-{uuid.uuid4().hex}"
            )
            novel.select(F.col("__digest").alias("digest")).write.mode(
                "overwrite"
            ).parquet(staging)
            os.rename(staging, final)
        with open(marker, "w") as f:
            f.write("ok")

    return apply
