"""Watermark semantics: late data beyond the watermark is dropped in append
mode — the behavior the reference's watermark test exercises
(TEST/LoghubMicroBatchSourceSuite.scala:381-424), driven across two
micro-batches so the watermark actually advances."""

from __future__ import annotations

import time

import pytest

from pyspark.sql import functions as F

from spark_streaming_logservice_spark import fixtures
from spark_streaming_logservice_spark.sources.logstore import register
from spark_streaming_logservice_spark.streaming.queries import idempotent_foreach_batch


def test_late_data_dropped(spark, tmp_path):
    register(spark)
    store = str(tmp_path / "p" / "late-store")
    base = 1_700_000_000
    # batch 1: events at t=0..2 and a high-water event at t=100
    fixtures.write_messages(store, ["1", "2", "3"], shard=0, base_time=base)
    fixtures.write_messages(store, ["hw"], shard=0, base_time=base + 100)

    sdf = (
        spark.readStream.format("logstore")
        .schema("msg STRING, __time__ TIMESTAMP")
        .option("path", store)
        .option("startingOffsets", "earliest")
        .load()
        .withWatermark("__time__", "10 seconds")
        .groupBy(F.window("__time__", "5 seconds").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").cast("long").alias("ws"), "n")
    )
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        sdf.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(processingTime="0.3 seconds")
        .start()
    )

    def rows():
        try:
            return {(r["ws"], r["n"]) for r in spark.read.parquet(out).collect()}
        except Exception:
            return set()

    # wait until the early windows close (watermark = t+100-10 ≫ t+5);
    # generous deadline — under full-suite CPU contention the parquet sink
    # can take well over a minute to emit its first append
    deadline = time.time() + 150
    while time.time() < deadline and not rows():
        time.sleep(0.3)
    first = rows()
    assert (base, 3) in first, first  # window [base, base+5) emitted, count 3

    # batch 2: a LATE record at t=1 (watermark is ~t+90) must be dropped
    fixtures.write_messages(store, ["late"], shard=0, base_time=base + 1)
    time.sleep(3.0)  # a few more triggers
    q.stop()
    q.awaitTermination(30)
    final = rows()
    # the [base, base+5) window must NOT be re-emitted with count 4
    assert (base, 4) not in final, final
    assert (base, 3) in final


def test_foreach_batch_redelivery_skipped(spark, tmp_path):
    # S5 idempotency: the same batchId delivered twice writes once.
    calls = []
    marker_dir = str(tmp_path / "markers")
    apply = idempotent_foreach_batch(
        lambda bdf, bid: calls.append(bid), marker_dir
    )
    df = spark.range(3)
    apply(df, 7)
    apply(df, 7)  # redelivery
    apply(df, 8)
    assert calls == [7, 8]
