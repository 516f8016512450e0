"""Streaming golden tests for the logstore source — PySpark rebuild of
TEST/LoghubMicroBatchSourceSuite.scala scenarios: earliest/latest starts,
maxOffsetsPerTrigger rate limiting, checkpoint recovery replay, new-shard
late binding, watermarked window aggregation."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from spark_streaming_logservice_spark import fixtures
from spark_streaming_logservice_spark.sources.logstore import register


@pytest.fixture()
def store(tmp_path, spark):
    register(spark)
    path = str(tmp_path / "proj" / "stream-store")
    fixtures.make_store(path, {0: ["1", "2", "3"], 1: ["4", "5"]})
    return path


def _run_once(spark, df, name: str, ckpt: str):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def _run_to_parquet(spark, df, out: str, ckpt: str, expect_rows: int, timeout: float = 60.0):
    """Run with a restartable (file) sink until the output has expect_rows
    rows or the stream goes idle; returns (rows, progresses).

    The memory sink can't recover from a checkpoint, so multi-run scenarios
    (recovery, latest-start, shard-split) write parquet."""
    import time as _t

    q = (
        df.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0.2 seconds")
        .start()
    )
    deadline = _t.time() + timeout

    def rows():
        try:
            return spark.read.parquet(out).collect()
        except Exception:
            return []

    n_idle = 0
    while _t.time() < deadline:
        r = rows()
        if len(r) >= expect_rows and q.lastProgress is not None:
            # at least one batch committed; one more cycle so the final
            # commit lands in the offset log
            _t.sleep(0.8)
            break
        prog = q.recentProgress
        if prog and prog[-1]["numInputRows"] == 0:
            n_idle += 1
            if n_idle > 20 and len(r) >= expect_rows:
                break
        _t.sleep(0.2)
    progresses = list(q.recentProgress)
    q.stop()
    q.awaitTermination(30)
    return rows(), progresses


def test_earliest_start_reads_all(spark, store, tmp_path):
    df = (
        spark.readStream.format("logstore")
        .schema("msg STRING, __shard__ INT")
        .option("path", store)
        .option("startingOffsets", "earliest")
        .load()
        .select((F.col("msg").cast("int") + 1).alias("v"))
    )
    out = _run_once(spark, df, "t_earliest", str(tmp_path / "ck1"))
    assert sorted(r["v"] for r in out.collect()) == [2, 3, 4, 5, 6]


def test_latest_start_reads_only_new(spark, store, tmp_path):
    # latest → nothing on first run; append → only new data on second run.
    ckpt, out_dir = str(tmp_path / "ck2"), str(tmp_path / "out2")
    df = (
        spark.readStream.format("logstore")
        .schema("msg STRING")
        .option("path", store)
        .option("startingOffsets", "latest")
        .load()
    )
    rows, _ = _run_to_parquet(spark, df, out_dir, ckpt, expect_rows=0, timeout=8)
    assert len(rows) == 0
    fixtures.write_messages(store, ["6", "7"], shard=0, base_time=1_700_000_100)
    rows, _ = _run_to_parquet(spark, df, out_dir, ckpt, expect_rows=2)
    assert sorted(r["msg"] for r in rows) == ["6", "7"]


def test_rate_limit_max_offsets_per_trigger(spark, store, tmp_path):
    # 5 records across 2 shards, one per second; cap 2/trigger → ≥2 batches
    # with ≤2 records per shard per batch (bucket granularity can overshoot
    # by one bucket, never more).
    df = (
        spark.readStream.format("logstore")
        .schema("msg STRING")
        .option("path", store)
        .option("startingOffsets", "earliest")
        .option("maxOffsetsPerTrigger", "2")
        .load()
    )
    rows, progress = _run_to_parquet(
        spark, df, str(tmp_path / "out3"), str(tmp_path / "ck3"), expect_rows=5
    )
    assert sorted(r["msg"] for r in rows) == ["1", "2", "3", "4", "5"]
    batches_with_rows = [p for p in progress if p["numInputRows"] > 0]
    assert len(batches_with_rows) >= 2, [p["numInputRows"] for p in progress]
    # cap 2 split over 2 shards → 1/shard/trigger, whole-bucket overshoot ≤ 1
    assert all(p["numInputRows"] <= 4 for p in batches_with_rows)


def test_recovery_replays_from_checkpoint(spark, store, tmp_path):
    # "Should get the data back on recovery"
    # (TEST/LoghubMicroBatchSourceSuite.scala:190-192): stop, append, restart
    # with same checkpoint → only the unread tail arrives.
    ckpt, out_dir = str(tmp_path / "ck4"), str(tmp_path / "out4")
    df = (
        spark.readStream.format("logstore")
        .schema("msg STRING")
        .option("path", store)
        .option("startingOffsets", "earliest")
        .load()
    )
    rows, _ = _run_to_parquet(spark, df, out_dir, ckpt, expect_rows=5)
    assert len(rows) == 5
    fixtures.write_messages(store, ["8", "9"], shard=1, base_time=1_700_000_200)
    rows, _ = _run_to_parquet(spark, df, out_dir, ckpt, expect_rows=7)
    assert sorted(r["msg"] for r in rows) == ["1", "2", "3", "4", "5", "8", "9"]


def test_new_shard_binds_earliest(spark, store, tmp_path):
    # Shard split mid-stream (TEST/LoghubMicroBatchSourceSuite.scala:199-205):
    # a shard appearing between triggers is read from its beginning (O6).
    ckpt, out_dir = str(tmp_path / "ck5"), str(tmp_path / "out5")
    df = (
        spark.readStream.format("logstore")
        .schema("msg STRING, __shard__ INT")
        .option("path", store)
        .option("startingOffsets", "earliest")
        .load()
    )
    rows, _ = _run_to_parquet(spark, df, out_dir, ckpt, expect_rows=5)
    fixtures.write_messages(store, ["10", "11"], shard=2, base_time=1_700_000_300)
    rows, _ = _run_to_parquet(spark, df, out_dir, ckpt, expect_rows=7)
    new = [r for r in rows if r["__shard__"] == 2]
    assert sorted(r["msg"] for r in new) == ["10", "11"]
    assert len(rows) == 7


def test_watermark_window_agg(spark, store, tmp_path):
    # F4 fixture: watermark + 5s tumbling window
    # (TEST/LoghubMicroBatchSourceSuite.scala:381-424).
    df = (
        spark.readStream.format("logstore")
        .schema("msg STRING, __time__ TIMESTAMP")
        .option("path", store)
        .option("startingOffsets", "earliest")
        .load()
        .withWatermark("__time__", "10 seconds")
        .groupBy(F.window("__time__", "5 seconds").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    q = (
        df.writeStream.format("memory")
        .queryName("t_window")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck6"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM t_window").collect()
    # 5 records at base..base+4 over 2 shards (base≡0 mod 5): shard0 times
    # 0,1,2 + shard1 times 0,1 → window[base,base+5) has all 5.
    assert sum(r["n"] for r in rows) == 5
    assert len(rows) == 1


def test_stream_stream_self_join(spark, store, tmp_path):
    # F5 fixture: join on derived key
    # (TEST/LoghubMicroBatchSourceSuite.scala:426-459).
    base = (
        spark.readStream.format("logstore")
        .schema("msg STRING, __time__ TIMESTAMP")
        .option("path", store)
        .option("startingOffsets", "earliest")
        .load()
        .select(
            F.col("msg").cast("int").alias("value"),
            (F.col("msg").cast("int") % 5).alias("key"),
            F.col("__time__"),
        )
    )
    joined = base.alias("a").join(base.alias("b"), "key").select(
        "key", F.col("a.value").alias("va"), F.col("b.value").alias("vb")
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("t_join")
        .option("checkpointLocation", str(tmp_path / "ck7"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM t_join").collect()
    # values 1..5; keys 1,2,3,4,0 all distinct → only self-pairs
    assert sorted((r["key"], r["va"], r["vb"]) for r in rows) == [
        (0, 5, 5), (1, 1, 1), (2, 2, 2), (3, 3, 3), (4, 4, 4),
    ]


def test_shard_split_parent_drain_children_at_earliest(spark, tmp_path):
    """Mid-stream shard split golden test
    (TEST/LoghubMicroBatchSourceSuite.scala:153-207 splitShard=true): after
    the split, parents 0/1 are read-only (drained, never re-read) and
    children 2/3 appear while the query runs, binding at earliest — every
    record arrives exactly once with correct shard provenance."""
    import time as _t

    register(spark)
    path = str(tmp_path / "proj" / "split-store")
    fixtures.make_store(path, {0: ["1", "2"], 1: ["3"]})
    ckpt, out_dir = str(tmp_path / "ck-split"), str(tmp_path / "out-split")
    df = (
        spark.readStream.format("logstore")
        .schema("msg STRING, __shard__ INT")
        .option("path", path)
        .option("startingOffsets", "earliest")
        .load()
        .select("msg", "__shard__")
    )
    # phase 1: read pre-split data; stop; append to parents; restart → tail only
    rows, _ = _run_to_parquet(spark, df, out_dir, ckpt, expect_rows=3)
    assert sorted(r["msg"] for r in rows) == ["1", "2", "3"]
    fixtures.write_messages(path, ["4", "5"], shard=0, base_time=1_700_000_200)
    rows, _ = _run_to_parquet(spark, df, out_dir, ckpt, expect_rows=5)
    assert sorted(r["msg"] for r in rows) == ["1", "2", "3", "4", "5"]

    # phase 2: split happens WHILE the query runs — children appear mid-stream
    q = (
        df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0.2 seconds")
        .start()
    )
    _t.sleep(1.5)  # a few triggers with only the (drained) parents
    fixtures.write_messages(path, ["6", "7"], shard=2, base_time=1_700_000_300)
    fixtures.write_messages(path, ["8", "9"], shard=3, base_time=1_700_000_300)
    # generous: under a loaded host (parallel suites/benches) micro-batches
    # can starve well past a minute — the 60s deadline flaked exactly once
    deadline = _t.time() + 150
    while _t.time() < deadline:
        try:
            if spark.read.parquet(out_dir).count() >= 9:
                _t.sleep(0.8)
                break
        except Exception:
            pass
        _t.sleep(0.2)
    q.stop()
    q.awaitTermination(30)

    rows = spark.read.parquet(out_dir).collect()
    msgs = sorted(r["msg"] for r in rows)
    assert msgs == ["1", "2", "3", "4", "5", "6", "7", "8", "9"]  # exactly once
    by_shard: dict[int, list[str]] = {}
    for r in rows:
        by_shard.setdefault(r["__shard__"], []).append(r["msg"])
    assert sorted(by_shard[0]) == ["1", "2", "4", "5"]  # parent never re-read
    assert sorted(by_shard[1]) == ["3"]
    assert sorted(by_shard[2]) == ["6", "7"]  # children bound at earliest
    assert sorted(by_shard[3]) == ["8", "9"]


def test_rate_limit_long_max_no_overflow(spark, store, tmp_path):
    """maxOffsetsPerTrigger = Long.MaxValue must not overflow and must read
    everything in one batch (TEST/LoghubMicroBatchSourceSuite.scala:276-314)."""
    df = (
        spark.readStream.format("logstore")
        .schema("msg STRING")
        .option("path", store)
        .option("startingOffsets", "earliest")
        .option("maxOffsetsPerTrigger", str(2**63 - 1))
        .load()
    )
    out = _run_once(spark, df, "t_longmax", str(tmp_path / "ck-longmax"))
    assert sorted(r["msg"] for r in out.collect()) == ["1", "2", "3", "4", "5"]


def test_stream_catchup_batch_slices_hot_shard(spark, tmp_path):
    """parallelismInShard in streaming: a catch-up micro-batch over one hot
    shard splits into multiple slice partitions, and the result is identical
    to the unsliced read."""
    register(spark)
    path = str(tmp_path / "proj" / "catchup-store")
    for i in range(5):
        fixtures.write_messages(
            path, [str(i * 10 + j) for j in range(10)], shard=0,
            base_time=1_700_000_000 + i * 100,
        )
    df = (
        spark.readStream.format("logstore")
        .schema("msg STRING")
        .option("path", path)
        .option("startingOffsets", "earliest")
        .option("maxOffsetsPerTrigger", str(2**62))
        .option("parallelismInShard", "4")
        .load()
    )
    out = _run_once(spark, df, "t_catchup_sliced", str(tmp_path / "ck-cs"))
    got = sorted(r["msg"] for r in out.collect())
    assert got == sorted(str(v) for v in range(50))


def test_stream_stream_left_outer_join_emits_unmatched(spark, tmp_path):
    """Outer stream-stream join over two logstore streams: watermarks on
    both sides + a time-range join constraint bound the join state; once
    the watermark passes a left row's match window, the row emits with
    nulls. Coverage for the OUTER variant of keyed_join (inner variant:
    test_stream_stream_self_join)."""
    register(spark)
    left_store = str(tmp_path / "proj" / "clicks-store")
    right_store = str(tmp_path / "proj" / "buys-store")
    base = 1_700_000_000
    # left keys 1,2,3 at base..base+2; right matches key 1 only (t=base+1).
    fixtures.make_store(left_store, {0: ["1", "2", "3"]}, base_time=base)
    fixtures.make_store(right_store, {0: ["1"]}, base_time=base + 1)
    # watermark pushers on BOTH sides far past the join horizon
    fixtures.write_messages(left_store, ["99"], shard=0, base_time=base + 500)
    fixtures.write_messages(right_store, ["99"], shard=0, base_time=base + 500)

    def src(path):
        return (
            spark.readStream.format("logstore")
            .schema("msg STRING, __time__ TIMESTAMP")
            .option("path", path)
            .option("startingOffsets", "earliest")
            # small trigger cap => several micro-batches, so the watermark
            # advances WHILE data is still flowing and nulls emit in-run
            .option("maxOffsetsPerTrigger", "2")
            .load()
        )

    lt = src(left_store).select(
        F.col("msg").cast("int").alias("key"), F.col("__time__").alias("lt")
    ).withWatermark("lt", "5 seconds")
    rt = src(right_store).select(
        F.col("msg").cast("int").alias("rkey"), F.col("__time__").alias("rt")
    ).withWatermark("rt", "5 seconds")
    joined = lt.join(
        rt,
        (F.col("key") == F.col("rkey"))
        & (F.col("rt") >= F.col("lt"))
        & (F.col("rt") <= F.col("lt") + F.expr("INTERVAL 10 SECONDS")),
        "leftOuter",
    ).select("key", "lt", "rkey")

    out, ckpt = str(tmp_path / "out-oj"), str(tmp_path / "ck-oj")
    # matched: key 1 (+99); unmatched 2,3 emit after watermark passes
    rows, _ = _run_to_parquet(spark, joined, out, ckpt, expect_rows=4, timeout=120)
    got = {(r["key"], r["rkey"]) for r in rows}
    assert (1, 1) in got and (99, 99) in got
    assert (2, None) in got and (3, None) in got
    assert len(rows) == 4
