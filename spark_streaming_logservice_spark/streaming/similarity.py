"""Streaming top-k similarity (SURVEY.md §2.5: per-batch similarity join in
foreachBatch; cf. PAPERS.md EDBT'19/'20 incremental top-k entries).

Each micro-batch of query vectors is scored against a static (broadcast)
corpus with the same JVM-side cosine used batch-side
(operators/similarity.cosine_topk). At 100 TB the corpus side is the indexed
one (IVF cells / LSH buckets); per batch only the probe set changes, so the
incremental cost is O(batch × corpus/k) — never a stream-stream cross join.

Vectors ride the log wire as JSON arrays in the record contents (all wire
values are strings in the log data model), parsed with from_json.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spark_streaming_logservice_spark.operators.similarity import cosine_topk


def parse_wire_embedding(col: Column) -> Column:
    """JSON-string embedding → array<double> (wire format of the log model)."""
    return F.from_json(col, "array<double>")


def streaming_topk_foreach_batch(corpus: DataFrame, out_path: str, k: int = 3):
    """foreachBatch function: score each batch's (vec_id, embedding JSON)
    records against ``corpus`` (vec_id, embedding array<double>) and append
    top-k matches to ``out_path`` with the batch id."""
    def apply(batch_df: DataFrame, batch_id: int) -> None:
        queries = batch_df.select(
            F.col("vec_id").cast("bigint").alias("vec_id"),
            parse_wire_embedding(F.col("embedding_json")).alias("embedding"),
        ).where(F.col("embedding").isNotNull())
        # No isEmpty() pre-check: that is a driver action (an extra Spark job
        # every micro-batch, doubling per-trigger job count at cadence). An
        # empty batch flows through as a zero-row top-k and a zero-row
        # parquet append — one job either way.
        topk = cosine_topk(corpus, queries, k=k).withColumn(
            "batch_id", F.lit(batch_id)
        )
        topk.write.mode("append").parquet(out_path)

    return apply
