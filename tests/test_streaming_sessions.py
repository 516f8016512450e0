"""Streaming gap-sessionization (streaming/sessions.py): sessions close
either in-batch (a later event exceeds the gap) or by event-time timeout
(the watermark passes session_end + gap), and state survives micro-batch
boundaries."""

from __future__ import annotations

import time

import pytest

from spark_streaming_logservice_spark.sources import store_backend as be
from spark_streaming_logservice_spark.sources.logstore import register
from spark_streaming_logservice_spark.streaming.sessions import sessionize_stream

BASE = 1_700_000_000


def _rows(*evts):
    return [
        {
            "time": BASE + t,
            "topic": "t",
            "source": "s",
            "contents": {"user": str(u), "value": str(v)},
            "tags": {},
        }
        for (u, t, v) in evts
    ]


@pytest.fixture()
def store(tmp_path, spark):
    register(spark)
    path = str(tmp_path / "proj" / "sess-store")
    # user 1: two events 60s apart (one session), then one 4840s later
    # (a second session); user 2: one event.
    be.append_rows(
        path, 0, _rows((1, 100, 1.0), (1, 160, 2.0), (1, 5000, 4.0), (2, 50, 8.0))
    )
    return path


def test_streaming_sessions_close_by_gap_and_watermark(spark, store, tmp_path):
    sdf = (
        spark.readStream.format("logstore")
        .schema("user STRING, value DOUBLE, __time__ TIMESTAMP")
        .option("path", store)
        .option("startingOffsets", "earliest")
        .load()
    )
    sessions = sessionize_stream(
        sdf, ts_col="__time__", user_col="user", value_col="value"
    )
    out = str(tmp_path / "out")
    q = (
        sessions.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="0.2 seconds")
        .start()
    )
    try:
        # Batch 1 closes user 1's first session in-batch (gap 4840s > 30min).
        # Feed later events to advance the watermark so the open sessions
        # (u1 @5000, u2 @50) finalize by event-time timeout.
        deadline = time.time() + 120
        fed = 0
        got: dict[tuple, tuple] = {}
        while time.time() < deadline and len(got) < 3:
            time.sleep(1.0)
            fed += 1
            be.append_rows(store, 0, _rows((9, 10_000 * fed, 0.0)))
            try:
                for r in spark.read.parquet(out).collect():
                    if r["user_id"] == 9:
                        continue
                    got[(r["user_id"], r["session_start"].timestamp())] = (
                        r["session_end"].timestamp(),
                        r["n_events"],
                        r["total_value"],
                    )
            except Exception:
                pass  # sink dir not created yet
    finally:
        q.stop()
        q.awaitTermination(30)

    assert got == {
        (1, float(BASE + 100)): (float(BASE + 160), 2, 3.0),
        (1, float(BASE + 5000)): (float(BASE + 5000), 1, 4.0),
        (2, float(BASE + 50)): (float(BASE + 50), 1, 8.0),
    }
