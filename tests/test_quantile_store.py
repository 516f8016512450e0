"""Streaming histogram/quantile store: maintained bins must equal the batch
histogram over the same rows, served quantiles must sit within one bin
width of the exact values, replay must be a no-op, and rollup retention
expiry must drop exactly the old buckets (healing an interrupted swap)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_logservice_spark.streaming import quantile_store as QS


def _mk(spark, n=2000):
    return spark.range(n).select(
        ((F.col("id") * 37) % 1000).cast("double").alias("v")
    )


def test_streamed_histogram_equals_batch(spark, tmp_path):
    df = _mk(spark)
    src = str(tmp_path / "src")
    df.repartition(4).write.parquet(src)
    table = str(tmp_path / "hist")
    q = (
        spark.readStream.schema("v DOUBLE")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(
            QS.incremental_histogram_writer(table, "v", 0.0, 1000.0, 64)
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(150)

    got = {
        r["bin"]: r["cnt"]
        for r in spark.read.schema("bin INT, cnt BIGINT")
        .parquet(table + "/data")
        .collect()
    }
    exp = {
        r["bin"]: r["cnt"]
        for r in QS.histogram_partials(df, "v", 0.0, 1000.0, 64).collect()
    }
    assert got == exp


def test_quantiles_within_bin_width(spark, tmp_path):
    df = _mk(spark)
    table = str(tmp_path / "hist")
    writer = QS.incremental_histogram_writer(table, "v", 0.0, 1000.0, 64)
    writer(df, 0)
    probs = [0.1, 0.5, 0.9, 0.99]
    approx = QS.read_quantiles(spark, table, probs, 0.0, 1000.0, 64)
    exact = df.selectExpr(
        *[f"percentile(v, {p}) AS p{i}" for i, p in enumerate(probs)]
    ).first()
    width = 1000.0 / 64
    for i, a in enumerate(approx):
        assert abs(a - exact[i]) <= width, (probs[i], a, exact[i])
    # replay is a no-op (counts unchanged)
    writer(df, 0)
    assert QS.read_quantiles(spark, table, [0.5], 0.0, 1000.0, 64) == [approx[1]]


def test_clamped_outliers_keep_mass(spark, tmp_path):
    table = str(tmp_path / "hist")
    writer = QS.incremental_histogram_writer(table, "v", 0.0, 100.0, 10)
    writer(
        spark.createDataFrame([(-50.0,), (25.0,), (500.0,)], "v DOUBLE"), 0
    )
    rows = {
        r["bin"]: r["cnt"]
        for r in spark.read.schema("bin INT, cnt BIGINT")
        .parquet(table + "/data")
        .collect()
    }
    assert rows == {0: 1, 2: 1, 9: 1}, "outliers clamp to edge bins"


def test_expire_rollup_drops_only_old_buckets(spark, tmp_path):
    from spark_streaming_logservice_spark.streaming import rollup as RU

    table = str(tmp_path / "rt")
    batch = spark.createDataFrame(
        [
            ("2024-03-01 10:00:10", "error"),
            ("2024-03-01 10:05:10", "click"),
            ("2024-03-02 10:00:10", "click"),
        ],
        "ts STRING, event_type STRING",
    ).select(F.col("ts").cast("timestamp_ntz").alias("ts"), "event_type")
    RU.merge_partials(table, RU.minute_partials(batch), batch_id=0)

    import datetime

    cut = datetime.datetime(2024, 3, 2)
    dropped = RU.expire_rollup(table, cut, spark)
    assert dropped == 2
    left = RU.read_store(
        spark, table, "bucket TIMESTAMP_NTZ, n_events BIGINT, n_errors BIGINT"
    )
    assert left.count() == 1
    assert str(left.first()["bucket"]).startswith("2024-03-02")
    # idempotent: second expiry drops nothing
    assert RU.expire_rollup(table, cut, spark) == 0
