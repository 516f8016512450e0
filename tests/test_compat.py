"""Compat factories + retry policy tests (SURVEY.md §2.1 S16/S17, O13)."""

from __future__ import annotations

import pytest

from spark_streaming_logservice_spark import fixtures
from spark_streaming_logservice_spark.compat import (
    create_direct_stream,
    create_rdd,
    create_stream,
    retry_with_backoff,
)
from spark_streaming_logservice_spark.compat.retry import UnrecoverableError


@pytest.fixture()
def store(tmp_path, spark):
    path = str(tmp_path / "proj" / "compat-store")
    fixtures.make_store(path, {0: ["1", "2", "3"], 1: ["4", "5"]})
    return path


def test_create_direct_stream_is_streaming(spark, store):
    df = create_direct_stream(spark, store, starting_offsets="earliest", schema="msg STRING")
    assert df.isStreaming
    assert df.columns == ["msg"]


def test_create_stream_alias(spark, store):
    assert create_stream is create_direct_stream


def test_create_rdd_time_range(spark, store):
    base = 1_700_000_000
    df = create_rdd(
        spark,
        store,
        start_time=base + 1,
        end_time=base + 3,
        project="proj",
        logstore="compat-store",
        schema="msg STRING, __time__ TIMESTAMP_NTZ",
    )
    # shard0 times base..base+2 → "2","3"; shard1 base..base+1 → "5"
    assert sorted(r["msg"] for r in df.collect()) == ["2", "3", "5"]


def test_retry_succeeds_after_failures():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise OSError("transient")
        return "ok"

    assert retry_with_backoff(flaky, sleep=lambda s: None) == "ok"
    assert calls["n"] == 3


def test_retry_exhausts():
    def always_fails():
        raise OSError("down")

    with pytest.raises(OSError):
        retry_with_backoff(always_fails, max_retries=3, sleep=lambda s: None)


def test_retry_unrecoverable_fails_fast():
    calls = {"n": 0}

    def fatal():
        calls["n"] += 1
        raise UnrecoverableError("bad auth")

    with pytest.raises(UnrecoverableError):
        retry_with_backoff(fatal, sleep=lambda s: None)
    assert calls["n"] == 1


def test_retry_counter_reset():
    # server-ish errors reset the attempt counter (RetryUtil.java:60-66)
    calls = {"n": 0}

    def mixed():
        calls["n"] += 1
        if calls["n"] <= 4:
            raise ConnectionError("5xx-ish")  # resets counter
        if calls["n"] <= 6:
            raise OSError("client-ish")
        return "ok"

    out = retry_with_backoff(
        mixed,
        max_retries=3,
        resets_counter=lambda e: isinstance(e, ConnectionError),
        sleep=lambda s: None,
    )
    assert out == "ok"


def test_backoff_schedule_capped():
    seen = []

    calls = {"n": 0}

    def failing():
        calls["n"] += 1
        if calls["n"] <= 6:
            raise OSError("x")
        return "ok"

    retry_with_backoff(failing, sleep=seen.append)
    assert seen == [1.0, 2.0, 4.0, 8.0, 10.0, 10.0]
