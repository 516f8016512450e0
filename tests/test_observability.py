"""Pipeline observability: Spark's observe/Observation API attaches QA
metrics (row counts, null counts, domain violations) to a pass WITHOUT a
second scan — at 100 TB a separate count()/agg() for QA doubles the I/O,
observe() makes it free. Batch face uses pyspark.sql.Observation; the
streaming face surfaces the same metrics per micro-batch in
StreamingQueryProgress.observedMetrics."""

from __future__ import annotations

import time

from pyspark.sql import Observation
from pyspark.sql import functions as F

from spark_streaming_logservice_spark.tables import load_table


def test_batch_observation_rides_single_pass(spark, sf_dir, tmp_path):
    """QA metrics from the SAME job that writes the output: rows kept,
    nulls seen, value-domain max — no second scan of the input."""
    obs = Observation("qa")
    e = load_table(spark, sf_dir, "events")
    gated = (
        e.where(F.col("event_type") != "error")
        .observe(
            obs,
            F.count(F.lit(1)).alias("n_rows"),
            F.count(F.when(F.col("value").isNull(), 1)).alias("n_null_value"),
            F.max("value").alias("max_value"),
        )
        .select("event_id", "value")
    )
    out = str(tmp_path / "out")
    gated.write.parquet(out)

    got = obs.get
    written = spark.read.parquet(out)
    assert got["n_rows"] == written.count()
    assert got["n_null_value"] == 0
    assert got["max_value"] == written.agg(F.max("value")).first()[0]


def test_streaming_observe_metrics_per_batch(spark, tmp_path):
    """observe() on a streaming DataFrame lands in each progress event's
    observedMetrics — the per-batch QA feed a monitoring pipeline tails."""
    src = str(tmp_path / "src")
    spark.range(100).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 7).cast("double").alias("value"),
    ).write.parquet(src)

    q = (
        spark.readStream.schema("event_id LONG, value DOUBLE")
        .parquet(src)
        .observe(
            "qa",
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("value").alias("sum_value"),
        )
        .writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    deadline = time.time() + 30
    seen = None
    while time.time() < deadline and seen is None:
        for p in q.recentProgress or []:
            om = (p or {}).get("observedMetrics") or {}
            if "qa" in om and om["qa"]["n_rows"]:
                seen = om["qa"]
                break
        if seen is None:
            time.sleep(0.5)
    assert seen is not None, "observed metrics must appear in progress"
    assert seen["n_rows"] == 100
    assert seen["sum_value"] == sum(i % 7 for i in range(100))
