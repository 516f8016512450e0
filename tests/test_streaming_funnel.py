"""Stream face of e33_session_funnel_attribution: native session_window +
watermark feeding the additive funnel store — stream==batch equality on
the same events, cross-batch session merging, watermark withholding of
open sessions, and the store's batch-id replay guard."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from spark_streaming_logservice_spark.operators.events2 import (
    funnel_partials,
    funnel_serving,
    session_funnel_aggs,
)
from spark_streaming_logservice_spark.streaming.funnel import (
    FUNNEL_SCHEMA,
    funnel_store_writer,
    read_funnel,
    sessionized_funnel,
)

_SCHEMA = (
    "user_id long, ts timestamp, event_id long, event_type string, "
    "value double"
)


def _mk(spark, rows):
    return spark.createDataFrame(
        rows,
        "user_id long, ts string, event_id long, event_type string, "
        "value double",
    ).select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"),
        "event_id", "event_type", "value",
    )


# user 1: view -> purchase inside one session (CONVERTS), session spans the
# two source files so the streaming session store must MERGE fragments.
# user 2: purchase BEFORE view in its session (funnel order violated — not
# converted). user 3: view only, then a second session >30min later.
_BATCH1 = [
    (1, "2024-01-01 10:00:00", 1, "view", 1.0),
    (2, "2024-01-01 10:01:00", 2, "purchase", 50.0),
    (3, "2024-01-01 10:02:00", 3, "view", 0.0),
]
_BATCH2 = [
    (1, "2024-01-01 10:20:00", 4, "purchase", 30.5),   # merges with batch 1
    (2, "2024-01-01 10:21:00", 5, "view", 0.0),        # after its purchase
    (3, "2024-01-01 11:30:00", 6, "click", 0.0),       # new session (gap)
    # flush sentinel: pushes the watermark far past every real session's
    # gap deadline so they all finalize; its own session stays OPEN and
    # must be withheld from the append output
    (99, "2024-01-11 00:00:00", 7, "flush", 0.0),
]


def _write_sources(spark, src):
    os.makedirs(src)
    _mk(spark, _BATCH1).coalesce(1).write.mode("append").parquet(src)
    _mk(spark, _BATCH2).coalesce(1).write.mode("append").parquet(src)


def test_stream_funnel_equals_batch_and_withholds_open_sessions(
    spark, tmp_path
):
    src = str(tmp_path / "src")
    _write_sources(spark, src)
    store = str(tmp_path / "funnel")
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        sessionized_funnel(stream)
        .writeStream.outputMode("append")
        .foreachBatch(funnel_store_writer(store))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {
        r["landing"]: (
            r["n_sessions"], r["n_view_sessions"], r["n_converted"],
            r["conv_rate"], r["conv_revenue"],
        )
        for r in read_funnel(spark, store).collect()
    }
    # the sentinel's session is still open: watermark never passes its gap
    # deadline, so 'flush' must NOT appear in the store
    assert "flush" not in got

    # batch twin over the REAL events (sentinel excluded): same expression
    # list, batch session_window
    real = _mk(spark, _BATCH1 + _BATCH2[:-1])
    per_session = real.groupBy(
        F.session_window("ts", "30 minutes").alias("sw"), "user_id"
    ).agg(*session_funnel_aggs())
    want = {
        r["landing"]: (
            r["n_sessions"], r["n_view_sessions"], r["n_converted"],
            r["conv_rate"], r["conv_revenue"],
        )
        for r in funnel_serving(funnel_partials(per_session)).collect()
    }
    assert got == want
    # semantic spot-checks: user 1 converted (view->purchase in-session,
    # merged ACROSS micro-batches); user 2's session did not (purchase
    # preceded its view); user 3 contributed two sessions
    assert got["view"][2] >= 1, "the cross-batch view->purchase session"
    assert got["purchase"] == (1, 1, 0, 0.0, 0.0)
    # 4 real sessions: u1 (view), u2 (purchase), u3 twice (view, click)
    assert got["view"][0] == 2 and got["click"][0] == 1


def test_funnel_store_replay_is_noop(spark, tmp_path):
    store = str(tmp_path / "funnel")
    per_session = _mk(spark, _BATCH1).groupBy(
        F.session_window("ts", "30 minutes").alias("sw"), "user_id"
    ).agg(*session_funnel_aggs())
    apply = funnel_store_writer(store)
    apply(per_session, 0)
    before = sorted(
        tuple(r) for r in read_funnel(spark, store).collect()
    )
    apply(per_session, 0)  # crash-redelivery of a committed batch
    after = sorted(
        tuple(r) for r in read_funnel(spark, store).collect()
    )
    assert before == after


def test_funnel_store_restart_resumes_from_checkpoint(spark, tmp_path):
    """Run the stream over file 1, stop, add file 2, restart from the same
    checkpoint: the merged store must equal the one-shot run (sessions
    spanning the restart merge via the session store's checkpointed
    state)."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    _mk(spark, _BATCH1).coalesce(1).write.mode("append").parquet(src)
    store = str(tmp_path / "funnel")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = (
            spark.readStream.schema(_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            sessionized_funnel(stream)
            .writeStream.outputMode("append")
            .foreachBatch(funnel_store_writer(store))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run()
    _mk(spark, _BATCH2).coalesce(1).write.mode("append").parquet(src)
    run()

    got = {
        r["landing"]: (r["n_sessions"], r["n_converted"])
        for r in read_funnel(spark, store).collect()
    }
    assert "flush" not in got
    assert got["view"][1] >= 1, (
        "the view->purchase session spanning the restart must converge"
    )
