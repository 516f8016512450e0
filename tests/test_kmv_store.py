"""Streaming KMV sketch store: the maintained (scope, h) table must equal
the batch min-k sketch over the same rows however the input is batched
(min-k union commutes with batching), replay must be a no-op both via the
batchId marker and mathematically, and state must stay O(scopes x k)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_logservice_spark.operators.sketch import KMV_K
from spark_streaming_logservice_spark.streaming import kmv_store as KS
from spark_streaming_logservice_spark.tables import load_table


def _sketch_set(df) -> set:
    return {(r["scope"], r["h"]) for r in df.collect()}


def test_streamed_sketch_equals_batch(spark, sf_dir, tmp_path):
    table = str(tmp_path / "kmv")
    writer = KS.incremental_kmv_writer(table)
    ev = load_table(spark, sf_dir, "events")
    for i in range(4):
        writer(ev.where(F.col("event_id") % 4 == i), i)

    batch = KS.kmv_partial(ev)
    assert _sketch_set(KS.read_kmv_sketch(spark, table)) == _sketch_set(batch)

    # fixed-size state: scopes x k rows at most
    n_scopes = ev.select("event_type").distinct().count()
    assert KS.read_kmv_sketch(spark, table).count() <= n_scopes * KMV_K


def test_replay_and_min_k_merge_idempotent(spark, sf_dir, tmp_path):
    table = str(tmp_path / "kmv")
    writer = KS.incremental_kmv_writer(table)
    ev = load_table(spark, sf_dir, "events")
    writer(ev.where(F.col("event_id") % 4 == 0), 0)
    first = _sketch_set(KS.read_kmv_sketch(spark, table))

    # batchId redelivery: marker short-circuits, store unchanged
    writer(ev.where(F.col("event_id") % 4 == 0), 0)
    assert _sketch_set(KS.read_kmv_sketch(spark, table)) == first

    # even WITHOUT the marker, min-k union makes a replayed partial a
    # mathematical no-op — feed the same rows as a new batch id
    writer(ev.where(F.col("event_id") % 4 == 0), 1)
    assert _sketch_set(KS.read_kmv_sketch(spark, table)) == first


def test_estimates_exact_below_k_and_bounded_above(spark, sf_dir, tmp_path):
    table = str(tmp_path / "kmv")
    writer = KS.incremental_kmv_writer(table)
    ev = load_table(spark, sf_dir, "events")
    for i in range(2):
        writer(ev.where(F.col("event_id") % 2 == i), i)

    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for r in KS.read_kmv_estimates(spark, table).collect():
        true_n = exact[r["scope"]]
        if r["k_used"] < KMV_K:
            # sketch never filled: the estimate IS the exact count
            assert r["est_distinct"] == float(true_n)
        else:
            # theta-sketch envelope: k=8 is coarse, so just sanity-bound
            # the estimator (positive, right order of magnitude)
            assert r["est_distinct"] > 0
            assert r["est_distinct"] < true_n * 10
            assert r["est_distinct"] > true_n / 10


def test_real_stream_drive_equals_batch(spark, sf_dir, tmp_path):
    """Drive the writer through an actual readStream -> foreachBatch query
    (availableNow, one file per trigger), not direct writer calls — the
    store must still equal the batch sketch over the full input."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    src = str(tmp_path / "src")
    ev.repartition(4).write.parquet(src)
    table = str(tmp_path / "kmv")
    q = (
        spark.readStream.schema("event_type STRING, user_id LONG")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(KS.incremental_kmv_writer(table))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(150)
    assert _sketch_set(KS.read_kmv_sketch(spark, table)) == _sketch_set(
        KS.kmv_partial(ev)
    )
