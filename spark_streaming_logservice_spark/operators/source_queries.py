"""Correctness-gate queries that run THROUGH the logstore data source.

Each builds a deterministic logstore from the sf_dir's events table (cached
per sf_dir), reads it back via ``spark.read.format("logstore")`` with a typed
user schema, and aggregates — so the driver's DuckDB comparison covers the
whole connector path: KV wire format → ingest projection → converter battery
→ envelope columns (SURVEY.md §2.1-2.2), not just file scans.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_streaming_logservice_spark.registry import query

N_SHARDS = 4


def _fixture_store(sf_dir: str) -> str:
    """Build (once per sf_dir) a sharded logstore from events.parquet:
    shard = event_id % 4, time = floor(epoch seconds), contents = stringified
    event fields — the all-strings wire shape of the log data model."""
    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    root = os.path.join(tempfile.gettempdir(), f"logstream-fixture-{key}", "proj", "events-store")
    done = os.path.join(root, "_FIXTURE_READY")
    if os.path.exists(done):
        return root
    import duckdb

    from spark_streaming_logservice_spark.sources import store_backend as be

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS t, user_id,
               event_type, CAST(value AS VARCHAR) AS value_s, props
        FROM read_parquet('{os.path.join(sf_dir, "events.parquet")}')
        ORDER BY event_id
        """
    ).fetchall()
    con.close()
    per_shard: dict[int, list[dict]] = {}
    for event_id, t, user_id, event_type, value_s, props in rows:
        shard = event_id % N_SHARDS
        per_shard.setdefault(shard, []).append(
            {
                "seq": event_id,  # deterministic cursor
                "time": int(t),
                "topic": event_type,
                "source": f"src-{user_id}",
                "contents": {
                    "event_id": str(event_id),
                    "user_id": str(user_id),
                    "event_type": event_type,
                    "value": value_s,
                    "props": props,
                },
                "tags": {"env": "test"},
            }
        )
    for shard, shard_rows in sorted(per_shard.items()):
        be.append_rows(root, shard, shard_rows)
    with open(done, "w") as f:
        f.write("ok")
    return root


# --- sr01: typed read through the source + aggregate -----------------------

@query(
    "sr01_logstore_typed_agg",
    oracle="""
    SELECT CAST(event_id % 4 AS INTEGER) AS shard, event_type,
           count(*) AS n, round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def sr01_logstore_typed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_streaming_logservice_spark.sources.logstore import register

    register(spark)
    store = _fixture_store(sf_dir)
    df = (
        spark.read.format("logstore")
        .schema("event_type STRING, value DOUBLE, __shard__ INT")
        .option("path", store)
        .load()
    )
    return (
        df.groupBy(F.col("__shard__").alias("shard"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .orderBy("shard", "event_type")
    )


# --- sr02: bounded time-range read (createRDD path, offset resolution) -----

@query(
    "sr02_logstore_time_range",
    oracle="""
    SELECT event_type, count(*) AS n
    FROM events
    WHERE CAST(floor(epoch(ts)) AS BIGINT) >= 1704240000
      AND CAST(floor(epoch(ts)) AS BIGINT) < 1704499200
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def sr02_logstore_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_streaming_logservice_spark.compat.factories import create_rdd

    store = _fixture_store(sf_dir)
    # 2024-01-03T00:00Z .. 2024-01-06T00:00Z
    df = create_rdd(
        spark,
        store,
        start_time=1_704_240_000,
        end_time=1_704_499_200,
        project="proj",
        logstore="events-store",
        schema="event_type STRING",
    )
    return df.groupBy("event_type").agg(F.count("*").alias("n")).orderBy("event_type")


# --- sr03: default-schema JSON __value__ round-trip through the source -----

@query(
    "sr03_logstore_value_roundtrip",
    oracle="""
    SELECT CAST(event_id % 4 AS INTEGER) + 0 AS shard_i, count(*) AS n,
           round(sum(CAST(value AS DOUBLE)), 2) AS total_value
    FROM events
    GROUP BY 1 ORDER BY 1
    """,
)
def sr03_logstore_value_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the default 8-col schema, parse __value__ JSON back to typed
    fields with get_json_object — proving the JSON packing (P7) matches the
    reference's payload format end-to-end."""
    from spark_streaming_logservice_spark.sources.logstore import register

    register(spark)
    store = _fixture_store(sf_dir)
    df = spark.read.format("logstore").option("path", store).load()
    return (
        df.select(
            F.col("__shard__").cast("int").alias("shard_i"),
            F.get_json_object("__value__", "$.value").cast("double").alias("v"),
        )
        .groupBy("shard_i")
        .agg(F.count("*").alias("n"), F.round(F.sum("v"), 2).alias("total_value"))
        .orderBy("shard_i")
    )
