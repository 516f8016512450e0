"""transformWithState (Spark 4 arbitrary-state API): the per-key running
top-k must converge to the batch top-k over the same rows, with state
carried across micro-batches (the final emission reflects EVERY prior
batch's values, not just the last batch's)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from spark_streaming_logservice_spark.streaming.state_v2 import running_topk

# transformWithState's state-server protocol is protobuf-based; the container
# this repo is built in has no google.protobuf (and installs are off-limits),
# so the operator is exercised only where the dependency exists. The
# applyInPandasWithState operators (streaming/stateful.py, sessions.py) cover
# the arbitrary-state contract in-container.
pytest.importorskip("google.protobuf", reason="transformWithState needs protobuf")


def _mk(spark, n=400):
    return spark.range(n).select(
        (F.col("id") % 7).alias("user_id"),
        # deterministic value pattern with per-user maxima spread across
        # the id range, so early AND late batches contribute to the top-k
        ((F.col("id") * 37 % 101) + (F.col("id") % 7) * 10.0).alias("value"),
    )


def test_running_topk_matches_batch(spark, tmp_path):
    df = _mk(spark)
    src = str(tmp_path / "src")
    df.repartition(5).write.parquet(src)  # 5 files -> 5 micro-batches

    q = (
        spark.readStream.schema("user_id LONG, value DOUBLE")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .transform(running_topk)
        .writeStream.format("memory")
        .queryName("t_topk")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # last emission per user wins (update mode emits one row per batch)
    rows = spark.sql(
        "SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY user_id "
        "ORDER BY monotonically_increasing_id() DESC) rn FROM t_topk) WHERE rn=1"
    ).collect()
    got = {r["user_id"]: list(r["topk"]) for r in rows}

    exp = {
        r["user_id"]: [r["v1"], r["v2"], r["v3"]]
        for r in df.groupBy("user_id")
        .agg(
            F.expr("sort_array(collect_list(value), false)[0]").alias("v1"),
            F.expr("sort_array(collect_list(value), false)[1]").alias("v2"),
            F.expr("sort_array(collect_list(value), false)[2]").alias("v3"),
        )
        .collect()
    }
    assert got == exp
