"""End-to-end pipeline: logstore source → transformation → logstore sink —
the reference's flagship example shape
(EX/sql/streaming/StructuredLoghubWordCount.scala:55-88 reads loghub,
aggregates, writes back out)."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from spark_streaming_logservice_spark import fixtures
from spark_streaming_logservice_spark.sources.logstore import register
from spark_streaming_logservice_spark.streaming.queries import (
    idempotent_foreach_batch,
    wordcount,
)


@pytest.fixture(autouse=True)
def _register(spark):
    register(spark)


def test_wordcount_pipeline_logstore_to_logstore(spark, tmp_path):
    src = str(tmp_path / "p" / "wc-src")
    dst = str(tmp_path / "p" / "wc-dst")
    fixtures.make_store(
        src, {0: ["spark makes logs", "logs make spark"], 1: ["spark spark"]}
    )
    sdf = (
        spark.readStream.format("logstore")
        .schema("msg STRING")
        .option("path", src)
        .option("startingOffsets", "earliest")
        .load()
    )
    counts = wordcount(sdf, "msg").select(
        F.col("word"), F.col("count").cast("string").alias("n")
    )
    q = (
        counts.writeStream.outputMode("complete")
        .foreachBatch(
            idempotent_foreach_batch(
                lambda bdf, bid: bdf.write.format("logstore")
                .option("path", dst)
                .mode("append")
                .save(),
                marker_dir=str(tmp_path / "markers"),
            )
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    back = (
        spark.read.format("logstore")
        .schema("word STRING, n STRING")
        .option("path", dst)
        .load()
    )
    got = {r["word"]: int(r["n"]) for r in back.collect()}
    assert got == {"spark": 4, "logs": 2, "makes": 1, "make": 1}


def test_batch_pipeline_default_schema_roundtrip(spark, tmp_path):
    # batch variant: read default schema → parse __value__ → re-write
    src = str(tmp_path / "p" / "b-src")
    dst = str(tmp_path / "p" / "b-dst")
    fixtures.make_store(src, {0: ["10", "20"], 1: ["30"]})
    df = spark.read.format("logstore").option("path", src).load()
    parsed = df.select(
        F.get_json_object("__value__", "$.msg").cast("int").alias("v"),
        F.col("__shard__").alias("orig_shard"),
    ).where(F.col("v") > 15)
    parsed.coalesce(1).write.format("logstore").option("path", dst).mode("append").save()
    back = (
        spark.read.format("logstore")
        .schema("v INT, orig_shard STRING")
        .option("path", dst)
        .load()
    )
    assert sorted((r["v"], r["orig_shard"]) for r in back.collect()) == [
        (20, "0"),
        (30, "1"),
    ]
