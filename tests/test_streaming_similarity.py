"""Streaming top-k similarity: vectors streamed over the log wire as JSON
must produce the same neighbors as the batch brute-force path."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from spark_streaming_logservice_spark.operators.similarity import cosine_topk
from spark_streaming_logservice_spark.sources.logstore import register
from spark_streaming_logservice_spark.sources import store_backend as be
from spark_streaming_logservice_spark.streaming.similarity import (
    streaming_topk_foreach_batch,
)
from spark_streaming_logservice_spark.tables import load_table


def test_streaming_topk_matches_batch(spark, sf_dir, tmp_path):
    register(spark)
    corpus = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    # stream the first 4 vectors through a logstore as JSON contents
    queries = corpus.where(F.col("vec_id") < 4).collect()
    store = str(tmp_path / "p" / "vec-stream")
    be.append_rows(
        store,
        0,
        [
            {
                "time": 1_700_000_000 + i,
                "topic": "vec",
                "source": "s",
                "contents": {
                    "vec_id": str(r["vec_id"]),
                    "embedding_json": json.dumps(r["embedding"]),
                },
                "tags": {},
            }
            for i, r in enumerate(queries)
        ],
    )
    sdf = (
        spark.readStream.format("logstore")
        .schema("vec_id STRING, embedding_json STRING")
        .option("path", store)
        .option("startingOffsets", "earliest")
        .load()
    )
    out = str(tmp_path / "topk-out")
    q = (
        sdf.writeStream.foreachBatch(streaming_topk_foreach_batch(corpus, out, k=3))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    streamed = {
        (r["q_id"], r["rk"]): r["n_id"] for r in spark.read.parquet(out).collect()
    }
    batch = {
        (r["q_id"], r["rk"]): r["n_id"]
        for r in cosine_topk(corpus, corpus.where(F.col("vec_id") < 4), k=3).collect()
    }
    assert streamed == batch and len(streamed) == 12
