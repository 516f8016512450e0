"""DataFrame-returning factories replacing the reference's DStream APIs.

Mapping (SURVEY.md §1.5, §7.3):
- ``createDirectStream`` (DS/LoghubUtils.scala:728-775, receiver-less,
  per-batch shard planning) → ``create_direct_stream``: a Structured
  Streaming DataFrame from the logstore source; Spark's micro-batch planner
  does the per-trigger shard/offset planning the DStream did by hand.
- ``createStream`` (receiver-based, DS/LoghubInputDStream.scala:27-79) →
  same thing: receivers have no Spark-4 equivalent and the direct path
  subsumes them; kept as an alias with the legacy signature shape.
- ``createRDD`` (bounded history read, BATCH/LoghubBatchRDD.scala:30-208) →
  ``create_rdd``: a bounded batch DataFrame over a time range.
- ``commitAsync`` (DS/DirectLoghubInputDStream.scala:227-241) →
  ``commit_async``: no-op returning the checkpointed state; Spark's commit
  log already provides durable offset commits. Provided for source-level
  compatibility of calling code.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from spark_streaming_logservice_spark import offsets as off
from spark_streaming_logservice_spark.sources.logstore import register


def create_direct_stream(
    spark: SparkSession,
    path: str,
    *,
    project: str | None = None,
    logstore: str | None = None,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
    schema: str | None = None,
) -> DataFrame:
    """Receiver-less stream over a logstore (the reference's primary API)."""
    register(spark)
    reader = spark.readStream.format("logstore").option("path", path)
    if project:
        reader = reader.option("logProject", project)
    if logstore:
        reader = reader.option("logStore", logstore)
    reader = reader.option("startingOffsets", starting_offsets)
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    if schema:
        reader = reader.schema(schema)
    return reader.load()


# Receiver-based variant collapses onto the direct path (SURVEY.md §7.1).
create_stream = create_direct_stream


def create_rdd(
    spark: SparkSession,
    path: str,
    *,
    start_time: int,
    end_time: int = off.LATEST,
    project: str | None = None,
    logstore: str | None = None,
    schema: str | None = None,
    parallelism_in_shard: int = 1,
) -> DataFrame:
    """Bounded history read over [start_time, end_time) — the rebuild of
    LoghubBatchRDD's time-range scan, including its intra-shard slice
    parallelism (parallelismInShard 1..5, BATCH/LoghubBatchRDD.scala:40-108):
    each shard's range splits into row-balanced slices planned from parquet
    footer stats, so one hot shard fans out across tasks."""
    register(spark)
    from spark_streaming_logservice_spark.sources import store_backend as be

    shards = be.list_shards(path)
    p = project or "project"
    s = logstore or "store"
    key = off.store_key(p, s)
    start = json.dumps({key: {str(sh): start_time for sh in shards}})
    end = json.dumps({key: {str(sh): end_time for sh in shards}})
    reader = (
        spark.read.format("logstore")
        .option("path", path)
        .option("logProject", p)
        .option("logStore", s)
        .option("startingOffsets", start)
        .option("endingOffsets", end)
        .option("parallelismInShard", str(parallelism_in_shard))
    )
    if schema:
        reader = reader.schema(schema)
    return reader.load()


def commit_async(query) -> dict:
    """The reference's user-driven checkpoint commit
    (DS/DirectLoghubInputDStream.scala:227-241 + JAVA/CheckpointManager.java).
    Structured Streaming commits offsets durably per batch, so this is a
    compatibility no-op that surfaces the latest committed progress."""
    progress = query.lastProgress
    return {"committed": progress is not None, "progress": progress}
