"""Streaming Count-Min maintenance: the maintained sketch must equal a
batch sketch over the same rows (cell sums commute), replay must be a
no-op, and estimates from the store must never undercount."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_logservice_spark.operators.sketch import countmin_sketch
from spark_streaming_logservice_spark.streaming import sketch as S


def _mk_keys(spark, n=500):
    # skewed: key k = id % 37, plus a heavy hitter every 5th row
    return spark.range(n).select(
        F.when(F.col("id") % 5 == 0, F.lit(7))
        .otherwise(F.col("id") % 37)
        .alias("user_id")
    )


def test_streamed_sketch_equals_batch(spark, tmp_path):
    df = _mk_keys(spark)
    src = str(tmp_path / "src")
    df.repartition(4).write.parquet(src)
    table = str(tmp_path / "cm")
    q = (
        spark.readStream.schema("user_id LONG")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(S.incremental_countmin_writer(table))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["j"], r["col"]): r["cnt"] for r in S.read_sketch(spark, table).collect()
    }
    exp = {
        (r["j"], r["col"]): r["cnt"]
        for r in countmin_sketch(df, F.col("user_id")).collect()
    }
    assert got == exp

    # estimates from the store: never undercount the true frequency
    keys = df.distinct()
    est = {
        r["k"]: r["est_n"]
        for r in S.estimate_from_store(spark, table, keys, "user_id").collect()
    }
    true = {r["user_id"]: r["n"] for r in df.groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    for k, n in true.items():
        assert est[k] >= n


def test_streamed_sketch_replay_is_noop(spark, tmp_path):
    df = _mk_keys(spark, n=100)
    table = str(tmp_path / "cm")
    writer = S.incremental_countmin_writer(table)
    writer(df, 0)
    first = {
        (r["j"], r["col"]): r["cnt"] for r in S.read_sketch(spark, table).collect()
    }
    writer(df, 0)  # redelivery of the same batchId
    again = {
        (r["j"], r["col"]): r["cnt"] for r in S.read_sketch(spark, table).collect()
    }
    assert first == again
