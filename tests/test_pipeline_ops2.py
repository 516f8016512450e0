"""Edge-case semantics for the round-3 second-tranche operators
(d10/d11/t08/p07/s09) — the oracle parity test covers the happy path at
test SF; these pin the boundary behaviors the SF data can't exercise."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from spark_streaming_logservice_spark.operators.dedup import (
    WINDOW_W,
    _window_hashes,
)


def _windows_of(spark, text: str) -> list[str]:
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(_window_hashes().alias("w")).collect()[0].w


def test_window_hashes_short_doc_yields_none(spark):
    assert _windows_of(spark, " ".join(["tok"] * (WINDOW_W - 1))) == []


def test_window_hashes_exact_and_overlapping_counts(spark):
    toks = [f"t{i}" for i in range(WINDOW_W + 2)]
    assert len(_windows_of(spark, " ".join(toks[:WINDOW_W]))) == 1
    assert len(_windows_of(spark, " ".join(toks))) == 3  # n - W + 1


def test_window_hashes_shifted_windows_differ(spark):
    ws = _windows_of(spark, " ".join(f"t{i}" for i in range(WINDOW_W + 1)))
    assert len(set(ws)) == 2


def test_repeated_window_hashes_within_one_doc_collide(spark):
    base = " ".join(["a"] * WINDOW_W)
    ws = _windows_of(spark, base + " " + base)
    # all-identical tokens: every window is the same 8-gram
    assert len(set(ws)) == 1 and len(ws) == WINDOW_W + 1


def test_p07_striping_balances_within_one_doc(spark):
    from spark_streaming_logservice_spark.operators import pipeline_ops as po

    # 16 equal-size docs over 8 shards -> exactly 2 docs per shard
    rows = [(i, "w " * 10) for i in range(16)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    sized = df.select(
        "doc_id",
        F.size(F.filter(F.split("text", " "), lambda t: t != "")).alias("n_tok"),
    )
    from pyspark.sql.window import Window

    rn = F.row_number().over(Window.orderBy(F.desc("n_tok"), F.asc("doc_id")))
    got = (
        sized.withColumn("shard", ((rn - 1) % po.N_OUT_SHARDS).cast("int"))
        .groupBy("shard")
        .count()
        .collect()
    )
    assert sorted((r.shard, r["count"]) for r in got) == [
        (s, 2) for s in range(po.N_OUT_SHARDS)
    ]


def test_s09_singleton_label_has_zero_residual(spark):
    from spark_streaming_logservice_spark.operators.similarity import (
        s09_centroid_residuals,
    )
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        df = spark.createDataFrame(
            [
                (0, [1.0, 2.0], 0),
                (1, [3.0, 4.0], 1),
                (2, [5.0, 4.0], 1),
            ],
            "vec_id long, embedding array<float>, label int",
        )
        df.write.parquet(os.path.join(td, "embeddings.parquet"))
        out = {r.label: r for r in s09_centroid_residuals(spark, td).collect()}
        assert out[0].mean_residual == 0.0 and out[0].n_vecs == 1
        # label 1: centroid (4,4); each member at distance 1
        assert math.isclose(out[1].mean_residual, 1.0)
        assert math.isclose(out[1].max_residual, 1.0)


def test_distributed_row_number_matches_window_rank(spark, sf_dir):
    from pyspark.sql.window import Window
    from spark_streaming_logservice_spark.operators.pipeline_ops import (
        distributed_row_number,
    )
    from spark_streaming_logservice_spark.tables import load_table

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.filter(F.split("text", " "), lambda t: t != "")).alias("n_tok"),
    )
    keys = [F.desc("n_tok"), F.asc("doc_id")]
    got = {
        r.doc_id: r.rn
        for r in distributed_row_number(d, keys, partitions=8).collect()
    }
    want = {
        r.doc_id: r.rn
        for r in d.withColumn(
            "rn", F.row_number().over(Window.orderBy(*keys)).cast("long")
        ).collect()
    }
    assert got == want
