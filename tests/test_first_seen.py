"""Streaming first-seen table: must equal batch min(ts) per user over the
same rows (min merges exactly), replay must be a no-op, and a later batch
with an EARLIER timestamp must win (late data corrects the table)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_logservice_spark.streaming import first_seen as FS


def _mk(spark, n=300):
    return spark.range(n).select(
        (F.col("id") % 23).alias("user_id"),
        (
            F.lit("2024-03-01 00:00:00").cast("timestamp_ntz")
            + F.make_interval(secs=(F.col("id") * 53) % 5000)
        ).alias("ts"),
    )


def test_streamed_first_seen_equals_batch(spark, tmp_path):
    df = _mk(spark)
    src = str(tmp_path / "src")
    df.repartition(4).write.parquet(src)
    table = str(tmp_path / "fs")
    q = (
        spark.readStream.schema("user_id LONG, ts TIMESTAMP_NTZ")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(FS.incremental_first_seen_writer(table))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        r["user_id"]: r["first_seen"]
        for r in FS.read_first_seen(spark, table).collect()
    }
    exp = {
        r["user_id"]: r["m"]
        for r in df.groupBy("user_id").agg(F.min("ts").alias("m")).collect()
    }
    assert got == exp


def test_late_earlier_timestamp_corrects_table(spark, tmp_path):
    table = str(tmp_path / "fs")
    writer = FS.incremental_first_seen_writer(table)
    b0 = spark.createDataFrame(
        [(1, "2024-03-02 10:00:00")], "user_id LONG, ts STRING"
    ).select("user_id", F.col("ts").cast("timestamp_ntz").alias("ts"))
    writer(b0, 0)
    # late batch carries an EARLIER sighting of user 1
    b1 = spark.createDataFrame(
        [(1, "2024-03-01 09:00:00"), (2, "2024-03-03 00:00:00")],
        "user_id LONG, ts STRING",
    ).select("user_id", F.col("ts").cast("timestamp_ntz").alias("ts"))
    writer(b1, 1)
    got = {
        r["user_id"]: str(r["first_seen"])
        for r in FS.read_first_seen(spark, table).collect()
    }
    assert got == {
        1: "2024-03-01 09:00:00",
        2: "2024-03-03 00:00:00",
    }
    # replay of batch 1 is a no-op
    writer(b1, 1)
    again = {
        r["user_id"]: str(r["first_seen"])
        for r in FS.read_first_seen(spark, table).collect()
    }
    assert again == got
