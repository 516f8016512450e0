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


def test_python_crc32_matches_spark(spark):
    """The driver-side bucket computation (_source_buckets' zlib.crc32)
    must route every source to the same bucket as the merge's
    F.crc32(source) % N_BUCKETS partition expr — otherwise pruning would
    silently read the wrong shard and score a present source as novel."""
    import zlib

    names = ["s1", "s2", "good", "bad", "web-crawl.2026", "", "ünïcode ✓"]
    df = spark.createDataFrame([(n,) for n in names], "source STRING")
    spark_buckets = {
        r["source"]: r["b"]
        for r in df.select(
            "source", (F.crc32(F.col("source")) % VD.N_BUCKETS).alias("b")
        ).collect()
    }
    for n in names:
        assert zlib.crc32(n.encode("utf-8")) % VD.N_BUCKETS == spark_buckets[n]


def test_drift_scan_reads_only_touched_buckets(spark, tmp_path):
    """Directory-level pruning (VERDICT r10 item 2): after a many-source
    profile is laid down, a single-source drift scan's input files must
    all live under that source's hash bucket — untouched buckets are not
    even listed."""
    table = str(tmp_path / "profile")
    writer = VD.incremental_vocab_writer(table)
    # 12 sources spread across buckets so most buckets have data to NOT read
    rows = [(i, f"src{i}", "tok common") for i in range(12)]
    writer(_docs(spark, rows), 0)
    probe = _docs(spark, [(99, "src3", "tok tok")])
    srcs = ["src3"]
    prof = VD.read_vocab_profile(spark, table, sources=srcs)
    want = VD._source_buckets(srcs)
    files = prof.inputFiles()
    assert files, "pruned scan found no files for a present source"
    for f in files:
        bucket = f.split("/parts/")[1].split("/")[0]
        assert bucket in want, f"scan read untouched bucket {bucket}: {f}"
    # and the pruned drift score equals the unpruned computation
    out = VD.batch_drift(spark, table, probe).collect()
    assert [r["source"] for r in out] == ["src3"]
    assert out[0]["l1_drift"] == 1.0  # profile 'tok common' vs batch all-'tok'


def test_admission_gate_quarantines_drifting_source(spark, tmp_path):
    """End-to-end gate semantics (VERDICT r10 item 6): a stable source
    passes and keeps training the profile; a drifting source is alerted
    and quarantined — not forwarded, not merged — and a replay of the
    alerting batch neither double-forwards nor double-alerts."""
    table = str(tmp_path / "profile")
    forwarded, alerts = [], []

    def forward(df, bid):
        forwarded.append(
            (bid, sorted((r["doc_id"], r["source"]) for r in df.collect()))
        )

    gate = VD.admission_gate(
        table,
        forward,
        lambda bid, rows, qdf: alerts.append(
            (bid, rows, sorted(r["doc_id"] for r in qdf.collect()))
        ),
        threshold=0.5,
    )
    # batch 0: both sources unknown -> bootstrap-admitted, seed the profile
    gate(_docs(spark, [(1, "good", "w1 w2 w3 w4"), (2, "bad", "w1 w2 w3 w4")]), 0)
    assert alerts == []
    assert forwarded[0] == (0, [(1, "good"), (2, "bad")])

    # batch 1: good matches its history; bad's crawler broke
    gate(
        _docs(
            spark,
            [(3, "good", "w2 w1 w4 w3"), (4, "bad", "ERROR ERROR ERROR ERROR")],
        ),
        1,
    )
    assert len(alerts) == 1 and alerts[0][0] == 1
    assert [r["source"] for r in alerts[0][1]] == ["bad"]
    assert alerts[0][1][0]["l1_drift"] == 2.0
    assert alerts[0][2] == [4], "alert must hand over the quarantined rows"
    assert forwarded[1] == (1, [(3, "good")])
    # the quarantined rows never taught the profile: bad still means w1..w4
    prof = {
        (r["source"], r["token"])
        for r in VD.read_vocab_profile(spark, table).collect()
    }
    assert ("bad", "error") not in prof
    # replay of the alerting batch is a marker no-op
    gate(
        _docs(
            spark,
            [(3, "good", "w2 w1 w4 w3"), (4, "bad", "ERROR ERROR ERROR ERROR")],
        ),
        1,
    )
    assert len(alerts) == 1 and len(forwarded) == 2


def test_admission_gate_through_real_stream(spark, tmp_path):
    """The gate as it deploys: foreachBatch on a live Structured Streaming
    query — a stable stream raises no alerts end-to-end."""
    import os as _os

    src = str(tmp_path / "src")
    _os.makedirs(src)
    _docs(spark, [(1, "s1", "a b a b"), (2, "s2", "x y")]).write.mode(
        "overwrite"
    ).json(src)
    table = str(tmp_path / "profile")
    forwarded, alerts = [], []
    q = (
        spark.readStream.schema("doc_id BIGINT, source STRING, text STRING")
        .json(src)
        .writeStream.foreachBatch(
            VD.admission_gate(
                table,
                lambda df, bid: forwarded.append(df.count()),
                lambda bid, rows, qdf: alerts.append((bid, rows)),
            )
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(150)
    assert alerts == [] and sum(forwarded) == 2
    assert _profile_rows(spark, table) == [
        ("s1", "a", 2), ("s1", "b", 2), ("s2", "x", 1), ("s2", "y", 1),
    ]


def test_null_source_rows_pass_through_and_never_crash_the_merge(
    spark, tmp_path
):
    """A NULL-source row has no profile bucket (crc32(NULL) is NULL, the
    sharded merge rejects NULL partition values): the plain writer and
    the gate must both skip it in the merge instead of wedging the
    stream, and the gate must still FORWARD it — even when other sources
    are being quarantined (a bare NOT-IN filter would NULL it away)."""
    table = str(tmp_path / "plain")
    writer = VD.incremental_vocab_writer(table)
    writer(_docs(spark, [(1, None, "x y"), (2, "s1", "a b")]), 0)
    assert _profile_rows(spark, table) == [("s1", "a", 1), ("s1", "b", 1)]

    gtable = str(tmp_path / "gated")
    forwarded, alerts = [], []
    gate = VD.admission_gate(
        gtable,
        lambda df, bid: forwarded.append(
            sorted((r["doc_id"], r["source"]) for r in df.collect())
        ),
        lambda bid, rows, qdf: alerts.append(bid),
        threshold=0.5,
    )
    gate(_docs(spark, [(1, "good", "w1 w2 w3 w4"), (2, None, "x y")]), 0)
    assert forwarded[0] == [(1, "good"), (2, None)]
    # batch 1 quarantines 'good'; the NULL-source row must STILL forward
    gate(
        _docs(
            spark,
            [(3, "good", "ERROR ERROR ERROR ERROR"), (4, None, "z")],
        ),
        1,
    )
    assert alerts == [1]
    assert forwarded[1] == [(4, None)]
    prof = {r[0] for r in _profile_rows(spark, gtable)}
    assert prof == {"good"}, "NULL source must never enter the profile"
