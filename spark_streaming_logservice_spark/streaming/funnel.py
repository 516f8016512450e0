"""Streaming sessionized funnel attribution — the stream face of
e33_session_funnel_attribution (r13 VERDICT item 7), composing the native
``session_window`` operator with the rollup store.

Shape: the stream runs the SAME per-session aggregate battery as the
batch query (``operators/events2.session_funnel_aggs`` — one expression
list, two execution modes) under ``session_window`` + a watermark; append
mode emits each session exactly once, when the watermark passes its gap
deadline. ``foreachBatch`` folds the finalized sessions into per-landing
ADDITIVE counters (``funnel_partials``) and merges them through
``rollup.merge_additive`` — batch-id-guarded, crash-replay convergent,
atomic two-phase swap, same storefs seam as every other store (so it runs
unchanged on the object-store backends). The serving view derives the
reported rates by the same exact integer arithmetic as the batch query.

100 TB notes: sessionization is ONE user-keyed stateful shuffle with
state evicted at the watermark (O(active users), no event buffering
beyond Spark's session store); the per-batch rollup is O(event_types)
rows, and the store merge reads/writes a table of the same size — nothing
downstream of the session operator scales with the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_streaming_logservice_spark.operators.events2 import (
    funnel_partials,
    funnel_serving,
    session_funnel_aggs,
)
from spark_streaming_logservice_spark.streaming.rollup import merge_additive

FUNNEL_SCHEMA = (
    "landing string, n_sessions bigint, n_view_sessions bigint, "
    "n_converted bigint, conv_rev_micro bigint"
)
SESSION_GAP = "30 minutes"


def sessionized_funnel(
    events: DataFrame, watermark: str = SESSION_GAP
) -> DataFrame:
    """Finalized sessions of a STREAMING events frame (user_id, ts,
    event_id, event_type, value): append-mode session_window aggregation —
    each session emits exactly once, after the watermark passes its gap
    deadline."""
    return events.withWatermark("ts", watermark).groupBy(
        F.session_window("ts", SESSION_GAP).alias("sw"), "user_id"
    ).agg(*session_funnel_aggs())


def funnel_store_writer(table_dir: str):
    """foreachBatch function: merge each micro-batch of finalized sessions
    into the per-landing funnel store (additive counters, batch-id replay
    guard)."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        merge_additive(
            table_dir,
            funnel_partials(batch_df),
            key_cols=["landing"],
            sum_cols=[
                "n_sessions",
                "n_view_sessions",
                "n_converted",
                "conv_rev_micro",
            ],
            schema=FUNNEL_SCHEMA,
            batch_id=batch_id,
        )

    return apply


def read_funnel(spark: SparkSession, table_dir: str) -> DataFrame:
    """Serving view over the merged store — identical derivation to the
    batch query's output (landing, counts, conv_rate, conv_revenue)."""
    from spark_streaming_logservice_spark.streaming import storefs

    data = storefs.join(table_dir, "data")
    partials = spark.read.schema(FUNNEL_SCHEMA).parquet(data)
    return funnel_serving(partials)
