"""Sink golden tests — PySpark rebuild of TEST/LoghubSinkSuite.scala:70-220:
batch write + readback, forbidden save modes, unsupported-type flattening
errors, streaming append with idempotent batch commits."""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from spark_streaming_logservice_spark.sources.logstore import register


@pytest.fixture(autouse=True)
def _register(spark):
    register(spark)


def test_batch_write_readback(spark, tmp_path):
    path = str(tmp_path / "p" / "sink-store")
    df = spark.createDataFrame(
        [(1, "a", 2.5), (2, "b", 3.5), (3, "c", 4.5)], "id INT, name STRING, score DOUBLE"
    )
    (
        df.coalesce(1)
        .write.format("logstore")
        .option("path", path)
        .option("shards", "2")
        .option("topic", "t1")
        .option("hashKeyColumn", "id")
        .mode("append")
        .save()
    )
    back = spark.read.format("logstore").option("path", path).load()
    rows = back.collect()
    assert len(rows) == 3
    payloads = sorted(
        (json.loads(r["__value__"])["id"], json.loads(r["__value__"])["name"],
         json.loads(r["__value__"])["score"])
        for r in rows
    )
    # all values stringified on the wire (the reference's LogItem model)
    assert payloads == [("1", "a", "2.5"), ("2", "b", "3.5"), ("3", "c", "4.5")]
    assert all(r["__topic__"] == "t1" for r in rows)


def test_typed_readback_roundtrip(spark, tmp_path):
    path = str(tmp_path / "p" / "rt-store")
    df = spark.createDataFrame([(7, "x")], "k INT, v STRING")
    df.coalesce(1).write.format("logstore").option("path", path).mode("append").save()
    back = (
        spark.read.format("logstore")
        .schema("k INT, v STRING")
        .option("path", path)
        .load()
    )
    assert back.collect() == [(7, "x")]


def test_overwrite_mode_rejected(spark, tmp_path):
    # SQL/LoghubSourceProvider.scala:147-176: only Append/ErrorIfExists.
    path = str(tmp_path / "p" / "ow-store")
    df = spark.createDataFrame([(1,)], "a INT")
    with pytest.raises(Exception, match="[Oo]verwrite"):
        df.write.format("logstore").option("path", path).mode("overwrite").save()


def test_unsupported_types_rejected(spark, tmp_path):
    # SQL/Utils.scala:55-57,72-77: binary/array/map can't flatten to KV.
    path = str(tmp_path / "p" / "bad-store")
    df = spark.createDataFrame([([1, 2],)], "arr ARRAY<INT>")
    with pytest.raises(Exception, match="Unsupported type"):
        df.write.format("logstore").option("path", path).mode("append").save()


def test_decimal_timestamp_flattening(spark, tmp_path):
    # Decimal → double; timestamp → epoch millis (SQL/Utils.scala:60-71).
    path = str(tmp_path / "p" / "dec-store")
    df = spark.sql(
        "SELECT CAST(1.5 AS DECIMAL(10,2)) AS d, "
        "TIMESTAMP_NTZ '2024-01-01 00:00:00' AS ts"
    )
    df.coalesce(1).write.format("logstore").option("path", path).mode("append").save()
    r = spark.read.format("logstore").option("path", path).load().collect()[0]
    payload = json.loads(r["__value__"])
    assert payload["d"] == "1.5"
    assert payload["ts"] == "1704067200000"


def _wb(rows):
    """Rows → the single-RecordBatch iterator the Arrow writer receives."""
    import pyarrow as pa

    return iter(
        [pa.record_batch({"msg": pa.array([r["msg"] for r in rows], pa.string())})]
    )


def _mk_stream_writer(path, n_shards=2):
    from pyspark.sql.types import StringType, StructField, StructType

    from spark_streaming_logservice_spark.sources.logstore import LogstoreStreamWriter

    schema = StructType([StructField("msg", StringType())])
    return LogstoreStreamWriter(schema, {"path": path, "shards": str(n_shards)}, False)


def _read_msgs(spark, path):
    df = spark.read.format("logstore").schema("msg STRING").option("path", path).load()
    return sorted(r["msg"] for r in df.collect())


def test_stream_sink_batch_redelivery_is_skipped(spark, tmp_path):
    """The same epoch delivered twice (driver restart replays the batch) must
    land exactly one copy — SINK/LoghubSink.scala:31-38's batchId guard."""
    path = str(tmp_path / "p" / "redeliver-store")
    os.makedirs(path)
    rows = [{"msg": "a"}, {"msg": "b"}, {"msg": "c"}]

    w1 = _mk_stream_writer(path)
    m1 = w1.write(_wb(rows))
    w1.commit([m1], batchId=0)
    # Restarted query re-delivers batch 0 through a fresh writer instance:
    w2 = _mk_stream_writer(path)
    m2 = w2.write(_wb(rows))
    w2.commit([m2], batchId=0)

    assert _read_msgs(spark, path) == ["a", "b", "c"]
    # and the redelivered staging was swept
    assert os.listdir(os.path.join(path, "_staging")) == []


def test_stream_sink_abort_then_retry_single_copy(spark, tmp_path):
    """abort() must clean staging so an aborted epoch leaves nothing visible;
    the retry is the only copy that lands."""
    path = str(tmp_path / "p" / "abort-store")
    os.makedirs(path)
    rows = [{"msg": "x"}, {"msg": "y"}]

    w1 = _mk_stream_writer(path)
    m1 = w1.write(_wb(rows))
    w1.abort([m1], batchId=0)
    assert _read_msgs(spark, path) == []  # nothing published
    assert os.listdir(os.path.join(path, "_staging")) == []

    w2 = _mk_stream_writer(path)
    m2 = w2.write(_wb(rows))
    w2.commit([m2], batchId=0)
    assert _read_msgs(spark, path) == ["x", "y"]


def test_task_retry_publishes_only_committed_attempt(spark, tmp_path):
    """A task attempt that wrote staged files but wasn't in the commit
    messages (speculative / failed attempt) must never become visible."""
    path = str(tmp_path / "p" / "retry-store")
    os.makedirs(path)
    rows = [{"msg": "r1"}, {"msg": "r2"}]

    w = _mk_stream_writer(path)
    _abandoned = w.write(_wb(rows))  # attempt 1: staged, never committed
    m2 = w.write(_wb(rows))  # attempt 2: wins
    w.commit([m2], batchId=0)
    assert _read_msgs(spark, path) == ["r1", "r2"]


def test_batch_write_abort_leaves_store_unchanged(spark, tmp_path):
    from pyspark.sql.types import StringType, StructField, StructType

    from spark_streaming_logservice_spark.sources.logstore import LogstoreBatchWriter

    path = str(tmp_path / "p" / "batch-abort-store")
    os.makedirs(path)
    schema = StructType([StructField("msg", StringType())])
    w = LogstoreBatchWriter(schema, {"path": path}, False)
    m = w.write(_wb([{"msg": "gone"}]))
    w.abort([m])
    assert _read_msgs(spark, path) == []
    assert os.listdir(os.path.join(path, "_staging")) == []


def test_hash_routing_is_hashseed_independent(tmp_path):
    """stable_shard must not depend on PYTHONHASHSEED (builtin hash does) —
    same key → same shard across executor processes and restarts (S15)."""
    import subprocess
    import sys

    prog = (
        "from spark_streaming_logservice_spark.sources.logstore import stable_shard;"
        "print([stable_shard(str(k), 7) for k in range(50)])"
    )
    outs = set()
    for seed in ("0", "1", "12345"):
        env = dict(os.environ, PYTHONHASHSEED=seed, PYTHONPATH="/root/repo")
        outs.add(
            subprocess.run(
                [sys.executable, "-c", prog], env=env, capture_output=True, text=True
            ).stdout
        )
    assert len(outs) == 1 and outs.pop().startswith("[")


def test_writer_seqs_unique_across_concurrent_jobs(tmp_path):
    """Two writers in the same millisecond with equal partition ids must not
    collide on seq (salted low bits — the unique-seq/half-open-range
    assumption of the backend)."""
    path = str(tmp_path / "p" / "seq-store")
    os.makedirs(path)
    w1 = _mk_stream_writer(path, n_shards=1)
    w2 = _mk_stream_writer(path, n_shards=1)
    m1 = w1.write(_wb([{"msg": f"a{i}"} for i in range(100)]))
    m2 = w2.write(_wb([{"msg": f"b{i}"} for i in range(100)]))
    w1.commit([m1], batchId=0)
    w2.commit([m2], batchId=1)
    from spark_streaming_logservice_spark.sources import store_backend as be

    seqs = [r["seq"] for r in be.read_rows(path, 0, 0, 2**63 - 1)]
    assert len(seqs) == 200 and len(set(seqs)) == 200


def test_streaming_sink_append_and_commit_markers(spark, tmp_path):
    src = str(tmp_path / "p" / "src-store")
    dst = str(tmp_path / "p" / "dst-store")
    from spark_streaming_logservice_spark import fixtures

    fixtures.make_store(src, {0: ["1", "2", "3"]})
    df = (
        spark.readStream.format("logstore")
        .schema("msg STRING")
        .option("path", src)
        .option("startingOffsets", "earliest")
        .load()
        .select(F.col("msg"))
    )
    q = (
        df.writeStream.format("logstore")
        .option("path", dst)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    back = spark.read.format("logstore").schema("msg STRING").option("path", dst).load()
    assert sorted(r["msg"] for r in back.collect()) == ["1", "2", "3"]
    # idempotency guard persisted (SINK/LoghubSink.scala:24-39, hardened)
    assert os.path.isdir(os.path.join(dst, "_commits"))
    assert any(n.startswith("batch-") for n in os.listdir(os.path.join(dst, "_commits")))


def test_update_mode_aggregation_into_logstore_sink(spark, tmp_path):
    """Update-mode streaming aggregation landed in the logstore
    (TEST/LoghubSinkSuite.scala:171-202). Python DSv2 sinks reject Update
    mode outright (no SupportsStreamingUpdateAsAppend hook), so the engine's
    documented route (S18) is update-as-append through the idempotent
    foreachBatch wrapper — each trigger appends the updated (word, count)
    rows; final state per word is the max count seen."""
    src = str(tmp_path / "p" / "agg-src")
    dst = str(tmp_path / "p" / "agg-dst")
    from spark_streaming_logservice_spark import fixtures
    from spark_streaming_logservice_spark.streaming.queries import (
        idempotent_foreach_batch,
    )

    fixtures.make_store(src, {0: ["a", "b", "a"]})
    counts = (
        spark.readStream.format("logstore")
        .schema("msg STRING")
        .option("path", src)
        .option("startingOffsets", "earliest")
        .load()
        .groupBy("msg")
        .count()
    )

    def write_batch(batch_df, _batch_id):
        (
            batch_df.write.format("logstore")
            .option("path", dst)
            .mode("append")
            .save()
        )

    q = (
        counts.writeStream.foreachBatch(
            idempotent_foreach_batch(write_batch, str(tmp_path / "markers"))
        )
        .option("checkpointLocation", str(tmp_path / "ck-agg"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    back = (
        spark.read.format("logstore")
        .schema("msg STRING, count LONG")
        .option("path", dst)
        .load()
    )
    state = {}
    for r in back.collect():
        state[r["msg"]] = max(state.get(r["msg"], 0), r["count"])
    assert state == {"a": 2, "b": 1}


def test_update_mode_direct_sink_raises_actionable_error(spark, tmp_path):
    """``outputMode("update")`` straight into ``format("logstore")`` cannot
    work — Python DSv2 sinks have no SupportsStreamingUpdateAsAppend hook —
    and the failure must be a clear, named rejection (not a silent wrong
    answer or an opaque planner error). The supported route is
    update-as-append through ``streaming.queries.idempotent_foreach_batch``
    (S18), exercised by test_update_mode_aggregation_into_logstore_sink."""
    src = str(tmp_path / "p" / "upd-src")
    dst = str(tmp_path / "p" / "upd-dst")
    from spark_streaming_logservice_spark import fixtures

    fixtures.make_store(src, {0: ["a", "b", "a"]})
    counts = (
        spark.readStream.format("logstore")
        .schema("msg STRING")
        .option("path", src)
        .option("startingOffsets", "earliest")
        .load()
        .groupBy("msg")
        .count()
        .selectExpr("msg", "CAST(count AS STRING) AS count")
    )
    q = (
        counts.writeStream.format("logstore")
        .option("path", dst)
        .option("checkpointLocation", str(tmp_path / "ck-upd"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    try:
        with pytest.raises(Exception, match="does not support Update mode"):
            q.awaitTermination(120)
            raise AssertionError("update-mode logstore sink must fail")
    finally:
        q.stop()


def test_concurrent_writers_isolated_and_unique(spark, tmp_path):
    """Two concurrent jobs writing the same store must not corrupt each
    other: staging dirs are per-write, publishes are atomic renames, seqs
    stay globally unique (salted low bits). Runs both writers through real
    Spark jobs back-to-back within the same wall-clock millisecond window."""
    import threading

    path = str(tmp_path / "p" / "conc-store")
    os.makedirs(path)
    errs = []

    def write_job(tag):
        try:
            df = spark.createDataFrame(
                [(f"{tag}{i}",) for i in range(200)], "msg STRING"
            )
            (
                df.repartition(4)
                .write.format("logstore")
                .option("path", path)
                .option("shards", "2")
                .mode("append")
                .save()
            )
        except Exception as ex:  # pragma: no cover
            errs.append(ex)

    threads = [threading.Thread(target=write_job, args=(t,)) for t in ("a", "b")]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    back = spark.read.format("logstore").schema("msg STRING").option("path", path).load()
    msgs = sorted(r["msg"] for r in back.collect())
    assert msgs == sorted([f"a{i}" for i in range(200)] + [f"b{i}" for i in range(200)])
    from spark_streaming_logservice_spark.sources import store_backend as be

    seqs = [r["seq"] for sh in be.list_shards(path) for r in be.read_rows(path, sh, 0, 2**63 - 1)]
    assert len(seqs) == len(set(seqs)) == 400
    assert os.listdir(os.path.join(path, "_staging")) == []


def test_crash_after_marker_before_publish_recovers_exactly_once(spark, tmp_path):
    """The manifest marker is the commit point: a crash BETWEEN marker write
    and publish must be completed (not duplicated) when the batch is
    redelivered (code-review r2: publish-then-marker window)."""
    import json as _json

    from spark_streaming_logservice_spark.sources import store_backend as be

    path = str(tmp_path / "p" / "crash-store")
    os.makedirs(path)
    rows = [{"msg": "a"}, {"msg": "b"}]

    w1 = _mk_stream_writer(path)
    m1 = w1.write(_wb(rows))
    # simulate commit() crashing right after the marker landed:
    os.makedirs(os.path.join(path, "_commits"))
    with open(os.path.join(path, "_commits", "batch-0"), "w") as f:
        _json.dump({"rows": m1.rows, "staged": m1.staged}, f)
    assert _read_msgs(spark, path) == []  # nothing visible yet

    # redelivery through a fresh writer completes the recorded publish
    w2 = _mk_stream_writer(path)
    m2 = w2.write(_wb(rows))
    w2.commit([m2], batchId=0)
    assert _read_msgs(spark, path) == ["a", "b"]  # exactly once
    # recovery sweeps BOTH the crashed delivery's staging and its own
    assert os.listdir(os.path.join(path, "_staging")) == []


def test_abort_after_marker_keeps_staging_for_recovery(spark, tmp_path):
    """abort() must NOT sweep staging once the batch marker exists — those
    files are the only copy the manifest promises; redelivery completes the
    publish from them."""
    import json as _json

    path = str(tmp_path / "p" / "abort-marker-store")
    os.makedirs(path)
    rows = [{"msg": "k1"}, {"msg": "k2"}]

    w1 = _mk_stream_writer(path)
    m1 = w1.write(_wb(rows))
    os.makedirs(os.path.join(path, "_commits"))
    with open(os.path.join(path, "_commits", "batch-0"), "w") as f:
        _json.dump({"rows": m1.rows, "staged": m1.staged}, f)
    # publish failed → Spark calls abort; staging must survive
    w1.abort([m1], batchId=0)
    assert os.listdir(os.path.join(path, "_staging")) == [w1.write_id]

    w2 = _mk_stream_writer(path)
    m2 = w2.write(_wb(rows))
    w2.commit([m2], batchId=0)
    assert _read_msgs(spark, path) == ["k1", "k2"]  # recovered, exactly once
    assert os.listdir(os.path.join(path, "_staging")) == []


def test_crash_mid_publish_recovers_exactly_once(spark, tmp_path):
    """Crash after SOME manifest files were renamed: redelivery finishes the
    rest and never re-publishes the moved ones."""
    import json as _json

    from spark_streaming_logservice_spark.sources import store_backend as be

    path = str(tmp_path / "p" / "midpub-store")
    os.makedirs(path)
    w1 = _mk_stream_writer(path, n_shards=2)
    # route to both shards via two batches with explicit partition... easier:
    # two write() calls → two staged files in the manifest
    m1 = w1.write(_wb([{"msg": "x"}]))
    m2 = w1.write(_wb([{"msg": "y"}]))
    staged = m1.staged + m2.staged
    os.makedirs(os.path.join(path, "_commits"))
    with open(os.path.join(path, "_commits", "batch-0"), "w") as f:
        _json.dump({"rows": 2, "staged": staged}, f)
    be.publish_staged(path, staged[:1])  # crash midway: one file moved

    w2 = _mk_stream_writer(path, n_shards=2)
    m3 = w2.write(_wb([{"msg": "x"}, {"msg": "y"}]))
    w2.commit([m3], batchId=0)
    assert _read_msgs(spark, path) == ["x", "y"]  # both present, once each


def test_replay_with_lost_manifest_entry_fails_loudly(spark, tmp_path):
    """A manifest entry that is neither staged nor published means lost
    rows: the redelivery replay must raise, not silently commit a partial
    batch (code-review r2, third pass)."""
    import json as _json

    path = str(tmp_path / "p" / "lost-store")
    os.makedirs(path)
    w1 = _mk_stream_writer(path)
    m1 = w1.write(_wb([{"msg": "a"}]))
    m2 = w1.write(_wb([{"msg": "b"}]))
    os.makedirs(os.path.join(path, "_commits"))
    with open(os.path.join(path, "_commits", "batch-0"), "w") as f:
        _json.dump({"rows": 2, "staged": m1.staged + m2.staged}, f)
    # lose one staged file entirely (disk fault) before any publish
    import shutil

    lost = os.path.join(path, "_staging", m1.staged[0])
    os.remove(lost)

    w2 = _mk_stream_writer(path)
    m3 = w2.write(_wb([{"msg": "a"}, {"msg": "b"}]))
    with pytest.raises(OSError, match="manifest entry lost"):
        w2.commit([m3], batchId=0)


def test_failed_redelivery_of_committed_batch_sweeps_staging(spark, tmp_path):
    """abort() on a redelivery attempt of an ALREADY-committed batch must
    sweep that attempt's staging (its write_id is not in the manifest) —
    otherwise every failed redelivery leaks a staging dir forever."""
    path = str(tmp_path / "p" / "leak-store")
    os.makedirs(path)
    rows = [{"msg": "z"}]

    w1 = _mk_stream_writer(path)
    m1 = w1.write(_wb(rows))
    w1.commit([m1], batchId=0)  # fully committed, staging clean

    w2 = _mk_stream_writer(path)  # redelivery attempt that fails pre-commit
    _m2 = w2.write(_wb(rows))
    w2.abort([_m2], batchId=0)
    assert os.listdir(os.path.join(path, "_staging")) == []
    assert _read_msgs(spark, path) == ["z"]


def test_two_queries_same_store_do_not_cross_dedup(spark, tmp_path):
    """batchIds are per-checkpoint: two distinct streaming queries appending
    to one store both deliver a batch 0. The commit markers are namespaced by
    query identity (checkpoint location), so query B's batch 0 must publish
    its own rows — not get mistaken for a redelivery of query A's batch 0
    (which would replay A's manifest and silently drop B's rows)."""
    from pyspark.sql.types import StringType, StructField, StructType

    from spark_streaming_logservice_spark.sources.logstore import LogstoreStreamWriter

    path = str(tmp_path / "p" / "shared-store")
    os.makedirs(path)
    schema = StructType([StructField("msg", StringType())])

    def writer(ck):
        return LogstoreStreamWriter(
            schema,
            {"path": path, "shards": "2", "checkpointlocation": ck},
            False,
        )

    wa = writer("/ck/query-a")
    ma = wa.write(_wb([{"msg": "from-a"}]))
    wa.commit([ma], batchId=0)

    wb_ = writer("/ck/query-b")
    mb = wb_.write(_wb([{"msg": "from-b"}]))
    wb_.commit([mb], batchId=0)  # same batchId, different query → must publish

    assert _read_msgs(spark, path) == ["from-a", "from-b"]

    # and a true redelivery within query B is still deduplicated
    wb2 = writer("/ck/query-b")
    mb2 = wb2.write(_wb([{"msg": "from-b"}]))
    wb2.commit([mb2], batchId=0)
    assert _read_msgs(spark, path) == ["from-a", "from-b"]
