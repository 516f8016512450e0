"""Streaming latest-wins upsert store: must equal the batch c02 snapshot
over the same rows, replay must be a no-op, an out-of-order OLDER batch
must not clobber a newer snapshot row, and an interrupted swap must heal."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from spark_streaming_logservice_spark.operators.cdc import upsert_latest
from spark_streaming_logservice_spark.streaming import upsert as UP


def _mk(spark, n=400):
    return spark.range(n).select(
        (F.col("id") % 29).alias("user_id"),
        F.col("id").alias("event_id"),
        F.when(F.col("id") % 2 == 0, "signup").otherwise("purchase").alias(
            "event_type"
        ),
        (F.col("id") * 1.5).alias("value"),
        (
            F.lit("2024-03-01 00:00:00").cast("timestamp_ntz")
            + F.make_interval(secs=(F.col("id") * 37) % 7000)
        ).alias("ts"),
    )


def _snap_dict(spark, table):
    return {
        r["user_id"]: (r["event_id"], r["event_type"], r["value"], str(r["ts"]))
        for r in UP.read_snapshot(spark, table).collect()
    }


def test_streamed_upsert_equals_batch(spark, tmp_path):
    df = _mk(spark)
    src = str(tmp_path / "src")
    df.repartition(4).write.parquet(src)
    table = str(tmp_path / "snap")
    q = (
        spark.readStream.schema(
            "user_id LONG, event_id LONG, event_type STRING,"
            " value DOUBLE, ts TIMESTAMP_NTZ"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(UP.incremental_upsert_writer(table))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(150)

    got = _snap_dict(spark, table)
    exp = {
        r["user_id"]: (r["event_id"], r["event_type"], r["value"], str(r["ts"]))
        for r in upsert_latest(
            df, key="user_id", ts="ts", tiebreak="event_id"
        ).collect()
    }
    assert got == exp


def test_out_of_order_batch_does_not_clobber(spark, tmp_path):
    table = str(tmp_path / "snap")
    writer = UP.incremental_upsert_writer(table)

    def batch(rows):
        return spark.createDataFrame(
            rows,
            "user_id LONG, event_id LONG, event_type STRING,"
            " value DOUBLE, ts STRING",
        ).select(
            "user_id", "event_id", "event_type", "value",
            F.col("ts").cast("timestamp_ntz").alias("ts"),
        )

    writer(batch([(1, 10, "purchase", 5.0, "2024-03-02 12:00:00")]), 0)
    # late batch: OLDER row for user 1, plus a new user
    writer(
        batch(
            [
                (1, 3, "signup", 1.0, "2024-03-01 08:00:00"),
                (2, 4, "signup", 2.0, "2024-03-01 09:00:00"),
            ]
        ),
        1,
    )
    got = _snap_dict(spark, table)
    assert got[1] == (10, "purchase", 5.0, "2024-03-02 12:00:00")
    assert got[2] == (4, "signup", 2.0, "2024-03-01 09:00:00")
    # replay of batch 1 is a no-op
    writer(
        batch(
            [
                (1, 3, "signup", 1.0, "2024-03-01 08:00:00"),
                (2, 4, "signup", 2.0, "2024-03-01 09:00:00"),
            ]
        ),
        1,
    )
    assert _snap_dict(spark, table) == got


def test_interrupted_swap_heals(spark, tmp_path):
    """A crash between rename(data, old) and rename(tmp, data) leaves no
    data dir; the next merge must restore the base from .old instead of
    treating delta as the whole table."""
    table = str(tmp_path / "snap")
    writer = UP.incremental_upsert_writer(table)

    def batch(rows):
        return spark.createDataFrame(
            rows,
            "user_id LONG, event_id LONG, event_type STRING,"
            " value DOUBLE, ts STRING",
        ).select(
            "user_id", "event_id", "event_type", "value",
            F.col("ts").cast("timestamp_ntz").alias("ts"),
        )

    writer(batch([(1, 1, "signup", 1.0, "2024-03-01 08:00:00")]), 0)
    import zlib

    bucket = zlib.crc32(b"1") % UP.N_BUCKETS  # user 1's key-hash shard
    data = os.path.join(table, "parts", str(bucket), "data")
    # simulate the mid-swap crash: data renamed away, tmp never published
    os.rename(data, data + ".old")
    writer(batch([(2, 2, "signup", 2.0, "2024-03-01 09:00:00")]), 1)
    got = _snap_dict(spark, table)
    assert set(got) == {1, 2}, "user 1's history must survive the healed swap"


def test_upsert_merge_touches_only_dirty_buckets(spark, tmp_path):
    """A batch whose keys hash into one bucket must not read or republish
    the other buckets — their data dirs stay bit-identical."""
    import zlib

    table = str(tmp_path / "snap")
    writer = UP.incremental_upsert_writer(table)

    def batch(rows):
        return spark.createDataFrame(
            rows,
            "user_id LONG, event_id LONG, event_type STRING,"
            " value DOUBLE, ts STRING",
        ).select(
            "user_id", "event_id", "event_type", "value",
            F.col("ts").cast("timestamp_ntz").alias("ts"),
        )

    # two users in provably different buckets
    u1 = 1
    b1 = zlib.crc32(str(u1).encode()) % UP.N_BUCKETS
    u2 = next(
        u for u in range(2, 100)
        if zlib.crc32(str(u).encode()) % UP.N_BUCKETS != b1
    )
    writer(batch([(u1, 1, "signup", 1.0, "2024-03-01 08:00:00")]), 0)
    d1 = os.path.join(table, "parts", str(b1), "data")
    before = {
        f: (os.path.getmtime(os.path.join(d1, f)), os.path.getsize(os.path.join(d1, f)))
        for f in sorted(os.listdir(d1))
    }
    writer(batch([(u2, 2, "click", 2.0, "2024-03-01 09:00:00")]), 1)
    after = {
        f: (os.path.getmtime(os.path.join(d1, f)), os.path.getsize(os.path.join(d1, f)))
        for f in sorted(os.listdir(d1))
    }
    assert before == after, "clean bucket republished by an unrelated batch"
    assert set(_snap_dict(spark, table)) == {u1, u2}
