"""Streaming vocabulary-profile store + ingest drift monitor
(streaming/vocab_drift.py): stream-equals-batch, replay idempotency,
source-bucket merge locality, and hand-computed drift scores."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from spark_streaming_logservice_spark.streaming import vocab_drift as VD


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id BIGINT, source STRING, text STRING")


def _profile_rows(spark, table):
    return sorted(
        (r["source"], r["token"], r["c"])
        for r in VD.read_vocab_profile(spark, table).collect()
    )


def test_stream_equals_batch(spark, tmp_path):
    """3 micro-batches merged == one aggregate over the union."""
    batches = [
        [(1, "s1", "a a b"), (2, "s2", "x y")],
        [(3, "s1", "b c"), (4, "s2", "x")],
        [(5, "s1", "a")],
    ]
    table = str(tmp_path / "profile")
    writer = VD.incremental_vocab_writer(table)
    for i, rows in enumerate(batches):
        writer(_docs(spark, rows), i)
    union = _docs(spark, [r for b in batches for r in b])
    expect = sorted(
        (r["source"], r["token"], r["c"])
        for r in VD.vocab_partials(union).collect()
    )
    assert _profile_rows(spark, table) == expect


def test_replay_is_noop(spark, tmp_path):
    table = str(tmp_path / "profile")
    writer = VD.incremental_vocab_writer(table)
    b = _docs(spark, [(1, "s1", "a a b")])
    writer(b, 0)
    before = _profile_rows(spark, table)
    writer(b, 0)  # crash-retry replay of a committed batch
    assert _profile_rows(spark, table) == before


def test_merge_touches_only_batch_source_buckets(spark, tmp_path):
    """A single-source batch republishes only that source's hash bucket."""
    table = str(tmp_path / "profile")
    writer = VD.incremental_vocab_writer(table)
    writer(_docs(spark, [(1, "s1", "a"), (2, "s2", "b")]), 0)
    parts = os.path.join(table, "parts")
    mtimes = {
        d: os.stat(os.path.join(parts, d)).st_mtime_ns
        for d in os.listdir(parts)
        if not d.startswith("_")
    }
    writer(_docs(spark, [(3, "s1", "c")]), 1)
    touched = [
        d
        for d in mtimes
        if os.stat(os.path.join(parts, d)).st_mtime_ns != mtimes[d]
    ]
    assert len(touched) <= 1, f"single-source batch rewrote {touched}"


def test_drift_hand_computed(spark, tmp_path):
    """Profile s1 = 'a a b b' (a:.5, b:.5). A batch 'a a a a' drifts
    |1-.5| + |0-.5| = 1.0; an identically-distributed batch drifts 0;
    a never-seen source drifts 1.0 (all mass novel)."""
    table = str(tmp_path / "profile")
    writer = VD.incremental_vocab_writer(table)
    writer(_docs(spark, [(1, "s1", "a a b b")]), 0)

    skew = VD.batch_drift(spark, table, _docs(spark, [(2, "s1", "a a a a")]))
    r = skew.collect()[0]
    assert (r["source"], r["batch_tokens"], r["profile_tokens"]) == ("s1", 4, 4)
    assert r["l1_drift"] == 1.0

    same = VD.batch_drift(spark, table, _docs(spark, [(3, "s1", "a b")]))
    assert same.collect()[0]["l1_drift"] == 0.0

    novel = VD.batch_drift(spark, table, _docs(spark, [(4, "sX", "q q")]))
    rn = novel.collect()[0]
    assert rn["source"] == "sX" and rn["l1_drift"] == 1.0


def test_drift_detects_broken_source(spark, tmp_path):
    """The operational scenario: a source's crawler breaks and starts
    emitting one boilerplate token — drift spikes for it while a healthy
    source stays near zero."""
    table = str(tmp_path / "profile")
    writer = VD.incremental_vocab_writer(table)
    healthy = [(i, "good", "w1 w2 w3 w4") for i in range(4)] + [
        (10 + i, "bad", "w1 w2 w3 w4") for i in range(4)
    ]
    writer(_docs(spark, healthy), 0)
    incoming = _docs(
        spark,
        [(20, "good", "w2 w1 w4 w3"), (21, "bad", "ERROR ERROR ERROR ERROR")],
    )
    out = {r["source"]: r["l1_drift"] for r in VD.batch_drift(
        spark, table, incoming
    ).collect()}
    assert out["good"] == 0.0
    assert out["bad"] == 2.0  # disjoint vocabulary: full both-sided mass
