"""Sink golden tests — PySpark rebuild of TEST/LoghubSinkSuite.scala:70-220:
batch write + readback, forbidden save modes, unsupported-type flattening
errors, streaming append with idempotent batch commits."""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from spark_streaming_logservice_spark.sources.logstore import register


@pytest.fixture(autouse=True)
def _register(spark):
    register(spark)


def test_batch_write_readback(spark, tmp_path):
    path = str(tmp_path / "p" / "sink-store")
    df = spark.createDataFrame(
        [(1, "a", 2.5), (2, "b", 3.5), (3, "c", 4.5)], "id INT, name STRING, score DOUBLE"
    )
    (
        df.coalesce(1)
        .write.format("logstore")
        .option("path", path)
        .option("shards", "2")
        .option("topic", "t1")
        .option("hashKeyColumn", "id")
        .mode("append")
        .save()
    )
    back = spark.read.format("logstore").option("path", path).load()
    rows = back.collect()
    assert len(rows) == 3
    payloads = sorted(
        (json.loads(r["__value__"])["id"], json.loads(r["__value__"])["name"],
         json.loads(r["__value__"])["score"])
        for r in rows
    )
    # all values stringified on the wire (the reference's LogItem model)
    assert payloads == [("1", "a", "2.5"), ("2", "b", "3.5"), ("3", "c", "4.5")]
    assert all(r["__topic__"] == "t1" for r in rows)


def test_typed_readback_roundtrip(spark, tmp_path):
    path = str(tmp_path / "p" / "rt-store")
    df = spark.createDataFrame([(7, "x")], "k INT, v STRING")
    df.coalesce(1).write.format("logstore").option("path", path).mode("append").save()
    back = (
        spark.read.format("logstore")
        .schema("k INT, v STRING")
        .option("path", path)
        .load()
    )
    assert back.collect() == [(7, "x")]


def test_overwrite_mode_rejected(spark, tmp_path):
    # SQL/LoghubSourceProvider.scala:147-176: only Append/ErrorIfExists.
    path = str(tmp_path / "p" / "ow-store")
    df = spark.createDataFrame([(1,)], "a INT")
    with pytest.raises(Exception, match="[Oo]verwrite"):
        df.write.format("logstore").option("path", path).mode("overwrite").save()


def test_unsupported_types_rejected(spark, tmp_path):
    # SQL/Utils.scala:55-57,72-77: binary/array/map can't flatten to KV.
    path = str(tmp_path / "p" / "bad-store")
    df = spark.createDataFrame([([1, 2],)], "arr ARRAY<INT>")
    with pytest.raises(Exception, match="Unsupported type"):
        df.write.format("logstore").option("path", path).mode("append").save()


def test_decimal_timestamp_flattening(spark, tmp_path):
    # Decimal → double; timestamp → epoch millis (SQL/Utils.scala:60-71).
    path = str(tmp_path / "p" / "dec-store")
    df = spark.sql(
        "SELECT CAST(1.5 AS DECIMAL(10,2)) AS d, "
        "TIMESTAMP_NTZ '2024-01-01 00:00:00' AS ts"
    )
    df.coalesce(1).write.format("logstore").option("path", path).mode("append").save()
    r = spark.read.format("logstore").option("path", path).load().collect()[0]
    payload = json.loads(r["__value__"])
    assert payload["d"] == "1.5"
    assert payload["ts"] == "1704067200000"


def test_streaming_sink_append_and_commit_markers(spark, tmp_path):
    src = str(tmp_path / "p" / "src-store")
    dst = str(tmp_path / "p" / "dst-store")
    from spark_streaming_logservice_spark import fixtures

    fixtures.make_store(src, {0: ["1", "2", "3"]})
    df = (
        spark.readStream.format("logstore")
        .schema("msg STRING")
        .option("path", src)
        .option("startingOffsets", "earliest")
        .load()
        .select(F.col("msg"))
    )
    q = (
        df.writeStream.format("logstore")
        .option("path", dst)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    back = spark.read.format("logstore").schema("msg STRING").option("path", dst).load()
    assert sorted(r["msg"] for r in back.collect()) == ["1", "2", "3"]
    # idempotency guard persisted (SINK/LoghubSink.scala:24-39, hardened)
    assert os.path.isdir(os.path.join(dst, "_commits"))
    assert any(n.startswith("batch-") for n in os.listdir(os.path.join(dst, "_commits")))
