"""Streaming continuous aggregate: an incrementally-maintained
multi-resolution rollup (the streaming face of operators/events2.py e07).

Each micro-batch is aggregated to minute-grain partials (counts are
decomposable), merged into a tiny persistent rollup table, and the coarser
levels derive from the merged base — the TimescaleDB continuous-aggregate
pattern on Structured Streaming.

Scale/correctness posture:
- The per-batch aggregate is the only corpus-sized work; the merge
  re-aggregates base ∪ delta, both rollup-sized (O(minutes-of-history)).
- The table swap is two-phase (write ``.tmp`` dir, atomic rename), with
  TWO explicit crash-window recoveries: (a) a crash between
  ``rename(data, old)`` and ``rename(tmp, data)`` leaves no data dir — the
  next merge restores the base from ``.old`` before reading it (without
  this, the retry would compute merged=delta and then delete the only
  surviving copy of the history); (b) a crash after the swap but before the
  batchId marker replays the batch — the committed version records the
  producing batch_id in ``_batch_meta.json``, so the replayed merge is a
  no-op instead of a double count.
- State lives in the table, not the state store — the query itself is
  stateless (append mode), so there is no watermark requirement; late rows
  simply merge into their (old) buckets, exactly like the batch rollup.
"""

from __future__ import annotations

import json
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
    """Minute-grain decomposable partials of a (possibly streaming) batch.
    The trunc bucket is cast back to NTZ (date_trunc yields LTZ even on NTZ
    input) so the table's declared TIMESTAMP_NTZ schema and host-TZ-
    independent rendering hold."""
    return df.groupBy(
        F.date_trunc("minute", time_col).cast("timestamp_ntz").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count(F.when(F.col(type_col) == "error", 1)).alias("n_errors"),
    )


def merge_additive(
    table_dir: str,
    delta: DataFrame,
    key_cols: list[str],
    sum_cols: list[str],
    schema: str,
    batch_id: int | None = None,
    aggs: dict[str, str] | None = None,
) -> None:
    """Generic decomposable-partial merge: base ∪ delta → re-aggregate →
    atomic swap. Default combiner per value column is ``sum`` (the rollup's
    minute buckets, a Count-Min sketch's cells); ``aggs`` overrides a
    column to ``"min"``/``"max"`` for first-seen / last-seen semantics —
    any combiner that is associative, commutative and idempotent-mergeable
    works, which is exactly the class a crash-retried merge needs. Both
    inputs are table-sized, never corpus-sized. ``rename(tmp, data)`` is
    the commit point.

    Crash recovery (see module docstring): an interrupted swap is healed by
    restoring ``.old`` when the data dir is missing, and with ``batch_id``
    set a replay of an already-committed batch returns without merging
    (``_batch_meta.json`` inside the committed version names its producer;
    the leading underscore keeps the parquet reader from touching it)."""
    data, done = _recover_swap(table_dir, batch_id)
    if done:
        return
    if os.path.exists(data):
        base = delta.sparkSession.read.schema(schema).parquet(data)
        merged = (
            base.unionByName(delta)
            .groupBy(*key_cols)
            .agg(*[
                (F.min(c) if (aggs or {}).get(c) == "min"
                 else F.max(c) if (aggs or {}).get(c) == "max"
                 else F.sum(c)).alias(c)
                for c in sum_cols
            ])
        )
    else:
        merged = delta
    _commit_swap(table_dir, merged, batch_id)


def _recover_swap(table_dir: str, batch_id: int | None) -> tuple[str, bool]:
    """Heal an interrupted two-phase swap and detect an already-committed
    batch. Returns (data_dir, already_committed)."""
    data = os.path.join(table_dir, "data")
    old = data + ".old"
    if not os.path.exists(data) and os.path.exists(old):
        # crash landed between rename(data, old) and rename(tmp, data):
        # .old IS the base table — restore it before reading/deleting
        os.rename(old, data)
    meta = os.path.join(data, "_batch_meta.json")
    if batch_id is not None and os.path.exists(meta):
        try:
            with open(meta) as f:
                if json.load(f).get("batch_id") == batch_id:
                    # crash landed between swap and marker: this batch is
                    # already in the committed version — merging again
                    # would double-count it
                    shutil.rmtree(old, ignore_errors=True)
                    return data, True
        except (OSError, ValueError):
            pass
    return data, False


def _commit_swap(table_dir: str, merged: DataFrame, batch_id: int | None) -> None:
    """Write the merged version to ``.tmp`` and atomically publish it;
    ``rename(tmp, data)`` is the commit point."""
    data = os.path.join(table_dir, "data")
    old, tmp = data + ".old", data + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    merged.coalesce(1).write.mode("overwrite").parquet(tmp)
    if batch_id is not None:
        with open(os.path.join(tmp, "_batch_meta.json"), "w") as f:
            json.dump({"batch_id": batch_id}, f)
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(data):
        os.rename(data, old)
    os.rename(tmp, data)
    shutil.rmtree(old, ignore_errors=True)


def merge_partials(
    table_dir: str, delta: DataFrame, batch_id: int | None = None
) -> None:
    """Rollup-specific face of :func:`merge_additive` (minute buckets)."""
    merge_additive(
        table_dir,
        delta,
        key_cols=["bucket"],
        sum_cols=["n_events", "n_errors"],
        schema=_SCHEMA,
        batch_id=batch_id,
    )


def incremental_rollup_writer(table_dir: str):
    """foreachBatch function maintaining the minute-grain base table under
    ``table_dir`` with batchId-idempotent replay."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        merge_partials(table_dir, minute_partials(batch_df), batch_id=batch_id)

    return idempotent_foreach_batch(write, os.path.join(table_dir, "_markers"))


def read_rollup(spark: SparkSession, table_dir: str,
                levels: tuple[str, ...] = ("hour", "day")) -> DataFrame:
    """Serve the coarser levels from the maintained base table (same
    explode-to-levels shape as batch e07)."""
    base = spark.read.schema(_SCHEMA).parquet(os.path.join(table_dir, "data"))
    structs = [
        F.struct(
            F.lit(lv).alias("resolution"),
            F.date_trunc(lv, "bucket").cast("timestamp_ntz").alias("bucket"),
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


def read_rollup_gap_filled(spark: SparkSession, table_dir: str) -> DataFrame:
    """Serve the maintained minute base as a DENSE minute series with LOCF:
    every minute between the table's first and last bucket, zero-filled
    counts plus the last non-empty minute's error rate carried forward —
    the l23 gap-fill shape applied to the incrementally-maintained store
    (dashboards want dense series; the store only keeps observed minutes).
    Grid size is bounded by the covered time range, independent of how many
    rows ever streamed in."""
    from pyspark.sql.window import Window

    base = spark.read.schema(_SCHEMA).parquet(os.path.join(table_dir, "data"))
    span = base.agg(
        F.min("bucket").alias("b0"), F.max("bucket").alias("b1")
    )
    grid = span.select(
        F.explode(F.expr("sequence(b0, b1, interval 1 minute)")).alias("bucket")
    )
    w = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rate = F.when(
        F.col("n_events").isNotNull() & (F.col("n_events") > 0),
        F.col("n_errors").cast("double") / F.col("n_events"),
    )
    return (
        grid.join(base, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("n_errors", F.lit(0)).alias("n_errors"),
            F.col("n_events").isNull().alias("is_gap"),
            F.last(rate, ignorenulls=True).over(w).alias("filled_error_rate"),
        )
        .orderBy("bucket")
    )


def expire_rollup(table_dir: str, older_than, spark: SparkSession) -> int:
    """Retention maintenance: drop base-table buckets older than the cut,
    through the SAME two-phase swap as a merge (an interrupted expiry heals
    identically). Returns the number of buckets dropped. At scale this is a
    metadata-cheap rewrite of an O(minutes-of-history) table — never the
    corpus."""
    data, _ = _recover_swap(table_dir, None)
    if not os.path.exists(data):
        return 0
    base = spark.read.schema(_SCHEMA).parquet(data)
    kept = base.where(F.col("bucket") >= F.lit(older_than))
    dropped = base.count() - kept.count()
    if dropped:
        _commit_swap(table_dir, kept, None)
    return dropped
