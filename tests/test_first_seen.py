"""Streaming first-seen table: must equal batch min(ts) per user over the
same rows (min merges exactly), replay must be a no-op, and a later batch
with an EARLIER timestamp must win (late data corrects the table)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_logservice_spark.streaming import first_seen as FS


def _mk(spark, n=300):
    return spark.range(n).select(
        (F.col("id") % 23).alias("user_id"),
        (
            F.lit("2024-03-01 00:00:00").cast("timestamp_ntz")
            + F.make_interval(secs=(F.col("id") * 53) % 5000)
        ).alias("ts"),
    )


def test_streamed_first_seen_equals_batch(spark, tmp_path):
    df = _mk(spark)
    src = str(tmp_path / "src")
    df.repartition(4).write.parquet(src)
    table = str(tmp_path / "fs")
    q = (
        spark.readStream.schema("user_id LONG, ts TIMESTAMP_NTZ")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(FS.incremental_first_seen_writer(table))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        r["user_id"]: r["first_seen"]
        for r in FS.read_first_seen(spark, table).collect()
    }
    exp = {
        r["user_id"]: r["m"]
        for r in df.groupBy("user_id").agg(F.min("ts").alias("m")).collect()
    }
    assert got == exp


def test_late_earlier_timestamp_corrects_table(spark, tmp_path):
    table = str(tmp_path / "fs")
    writer = FS.incremental_first_seen_writer(table)
    b0 = spark.createDataFrame(
        [(1, "2024-03-02 10:00:00")], "user_id LONG, ts STRING"
    ).select("user_id", F.col("ts").cast("timestamp_ntz").alias("ts"))
    writer(b0, 0)
    # late batch carries an EARLIER sighting of user 1
    b1 = spark.createDataFrame(
        [(1, "2024-03-01 09:00:00"), (2, "2024-03-03 00:00:00")],
        "user_id LONG, ts STRING",
    ).select("user_id", F.col("ts").cast("timestamp_ntz").alias("ts"))
    writer(b1, 1)
    got = {
        r["user_id"]: str(r["first_seen"])
        for r in FS.read_first_seen(spark, table).collect()
    }
    assert got == {
        1: "2024-03-01 09:00:00",
        2: "2024-03-03 00:00:00",
    }
    # replay of batch 1 is a no-op
    writer(b1, 1)
    again = {
        r["user_id"]: str(r["first_seen"])
        for r in FS.read_first_seen(spark, table).collect()
    }
    assert again == got


def test_multi_store_foreachBatch_converges_after_partial_crash(spark, tmp_path):
    """One foreachBatch maintaining TWO stores (rollup-style sketch + the
    first-seen table): a crash AFTER store 1's merge but BEFORE store 2's
    must converge on replay — store 1's batch marker makes its re-merge a
    no-op while store 2 catches up, so neither double-counts."""
    from pyspark.sql import functions as F

    from spark_streaming_logservice_spark.operators.sketch import countmin_sketch
    from spark_streaming_logservice_spark.streaming import sketch as SK
    from spark_streaming_logservice_spark.streaming.rollup import merge_additive

    cm_dir = str(tmp_path / "cm")
    fs_dir = str(tmp_path / "fs")

    def write_both(batch_df, batch_id, crash_between=False):
        partial = countmin_sketch(batch_df, F.col("user_id")).selectExpr(
            "CAST(j AS INT) j", "CAST(col AS BIGINT) col", "CAST(cnt AS BIGINT) cnt"
        )
        merge_additive(cm_dir, partial, ["j", "col"], ["cnt"],
                       "j INT, col BIGINT, cnt BIGINT", batch_id=batch_id)
        if crash_between:
            raise RuntimeError("injected crash between store merges")
        fsp = batch_df.groupBy("user_id").agg(
            F.min("ts").cast("timestamp_ntz").alias("first_seen")
        )
        merge_additive(fs_dir, fsp, ["user_id"], ["first_seen"],
                       "user_id BIGINT, first_seen TIMESTAMP_NTZ",
                       batch_id=batch_id, aggs={"first_seen": "min"})

    mk = lambda rows: spark.createDataFrame(
        rows, "user_id LONG, ts STRING"
    ).select("user_id", F.col("ts").cast("timestamp_ntz").alias("ts"))

    b0 = mk([(1, "2024-04-01 10:00:00"), (2, "2024-04-01 11:00:00")])
    write_both(b0, 0)
    b1 = mk([(1, "2024-04-01 09:00:00"), (3, "2024-04-02 08:00:00")])
    try:
        write_both(b1, 1, crash_between=True)
    except RuntimeError:
        pass
    # replay of batch 1 after the crash: sketch merge is a marker no-op,
    # first-seen merge completes
    write_both(b1, 1)

    cm = {(r["j"], r["col"]): r["cnt"] for r in SK.read_sketch(spark, cm_dir).collect()}
    both = b0.unionAll(b1)
    exp = {
        (r["j"], r["col"]): r["cnt"]
        for r in countmin_sketch(both, F.col("user_id")).collect()
    }
    assert cm == exp  # no double count for batch 1's keys

    from spark_streaming_logservice_spark.streaming import first_seen as FS

    fs = {r["user_id"]: str(r["first_seen"]) for r in FS.read_first_seen(spark, fs_dir).collect()}
    assert fs == {
        1: "2024-04-01 09:00:00",
        2: "2024-04-01 11:00:00",
        3: "2024-04-02 08:00:00",
    }
