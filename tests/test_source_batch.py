"""Batch-read golden tests for the logstore source — PySpark rebuild of
TEST/LoghubRelationSuite.scala:69-201 scenarios (earliest→latest, explicit
per-shard offsets, default schema, user schema + casts, union, bad options)."""

from __future__ import annotations

import json

import pytest

from spark_streaming_logservice_spark import fixtures
from spark_streaming_logservice_spark.sources.logstore import register


@pytest.fixture()
def store(tmp_path, spark):
    register(spark)
    path = str(tmp_path / "proj" / "store-a")
    fixtures.make_store(path, {0: ["1", "2", "3"], 1: ["4", "5"]})
    return path


def test_default_schema_read(spark, store):
    df = spark.read.format("logstore").option("path", store).load()
    assert df.columns == [
        "__logProject__", "__logStore__", "__shard__", "__time__",
        "__topic__", "__source__", "__value__", "__sequence_number__",
    ]
    rows = df.collect()
    assert len(rows) == 5
    vals = sorted(json.loads(r["__value__"])["msg"] for r in rows)
    assert vals == ["1", "2", "3", "4", "5"]
    assert {r["__shard__"] for r in rows} == {"0", "1"}
    assert all(r["__logStore__"] == "store-a" for r in rows)


def test_user_schema_cast_plus_one(spark, store):
    # The reference's most-exercised pattern: CAST(msg AS INT) + 1
    # (TEST/LoghubMicroBatchSourceSuite.scala:186-206 golden {2,3,4}).
    df = (
        spark.read.format("logstore")
        .schema("msg STRING, __shard__ INT, __time__ TIMESTAMP_NTZ")
        .option("path", store)
        .load()
    )
    from pyspark.sql import functions as F

    out = sorted(
        r[0] for r in df.select(F.col("msg").cast("int") + 1).collect()
    )
    assert out == [2, 3, 4, 5, 6]
    shards = {r["__shard__"] for r in df.collect()}
    assert shards == {0, 1}


def test_user_schema_missing_key_is_null(spark, store):
    df = (
        spark.read.format("logstore")
        .schema("msg STRING, not_there STRING")
        .option("path", store)
        .load()
    )
    rows = df.collect()
    assert all(r["not_there"] is None for r in rows)
    assert sorted(r["msg"] for r in rows) == ["1", "2", "3", "4", "5"]


def test_tag_columns(spark, tmp_path):
    register(spark)
    path = str(tmp_path / "p" / "tagged")
    fixtures.write_messages(path, ["a"], tags={"env": "prod"})
    df = (
        spark.read.format("logstore")
        .schema("msg STRING, `__tag__:env` STRING, `__tag__:missing` STRING")
        .option("path", path)
        .load()
    )
    r = df.collect()[0]
    assert r["__tag__:env"] == "prod"
    assert r["__tag__:missing"] is None


def test_specific_offset_range(spark, store):
    # Shard 0 has times base+0..base+2; start shard 0 at base+1 → drops "1".
    base = 1_700_000_000
    start = json.dumps({"proj#store-a": {"0": base + 1, "1": -2}})
    df = (
        spark.read.format("logstore")
        .schema("msg STRING")
        .option("path", store)
        .option("startingOffsets", start)
        .load()
    )
    assert sorted(r["msg"] for r in df.collect()) == ["2", "3", "4", "5"]


def test_ending_offsets(spark, store):
    base = 1_700_000_000
    end = json.dumps({"proj#store-a": {"0": base + 1, "1": -1}})
    df = (
        spark.read.format("logstore")
        .schema("msg STRING")
        .option("path", store)
        .option("endingOffsets", end)
        .load()
    )
    # end at base+1 on shard 0 keeps only time<base+1 → "1"; shard 1 full.
    assert sorted(r["msg"] for r in df.collect()) == ["1", "4", "5"]


def test_union_self(spark, store):
    # TEST/LoghubRelationSuite.scala:163-172
    df = spark.read.format("logstore").option("path", store).load()
    assert df.union(df).count() == 10


def test_batch_cannot_start_at_latest(spark, store):
    with pytest.raises(Exception, match="latest"):
        (
            spark.read.format("logstore")
            .option("path", store)
            .option("startingOffsets", "latest")
            .load()
            .collect()
        )


def test_missing_path_errors(spark):
    register(spark)
    with pytest.raises(Exception, match="path"):
        spark.read.format("logstore").load().collect()


def test_converter_battery_types(spark, tmp_path):
    register(spark)
    path = str(tmp_path / "p" / "typed")
    from spark_streaming_logservice_spark.sources import store_backend as be

    be.append_rows(
        path,
        0,
        [
            {
                "time": 1_700_000_000,
                "topic": "t",
                "source": "s",
                "contents": {
                    "c_int": "42",
                    "c_double": "2.25",
                    "c_bool": "true",
                    "c_dec": "1,234.56",
                    "c_ts": "2026-01-02 03:04:05",
                    "c_date": "2026-01-02",
                },
                "tags": {},
            }
        ],
    )
    df = (
        spark.read.format("logstore")
        .schema(
            "c_int INT, c_double DOUBLE, c_bool BOOLEAN, c_dec DECIMAL(12,2), "
            "c_ts TIMESTAMP_NTZ, c_date DATE, __time__ TIMESTAMP_NTZ"
        )
        .option("path", path)
        .load()
    )
    r = df.collect()[0]
    assert r["c_int"] == 42
    assert r["c_double"] == 2.25
    assert r["c_bool"] is True
    assert str(r["c_dec"]) == "1234.56"
    assert str(r["c_ts"]) == "2026-01-02 03:04:05"
    assert str(r["c_date"]) == "2026-01-02"
    assert r["__time__"].isoformat() == "2023-11-14T22:13:20"


def test_intra_shard_slicing_partitions_and_results(spark, tmp_path):
    """parallelismInShard (1..5, BATCH/LoghubBatchRDD.scala:40-108): a
    single-shard store must plan >1 input partition and return identical
    data — the straggler-ceiling fix for hot shards."""
    register(spark)
    path = str(tmp_path / "proj" / "sliced-store")
    # 6 separate appends → 6 parquet files/row groups to cut between
    for i in range(6):
        fixtures.write_messages(
            path, [str(i * 10 + j) for j in range(10)], shard=0,
            base_time=1_700_000_000 + i * 100,
        )
    base = (
        spark.read.format("logstore").schema("msg STRING").option("path", path)
    )
    df1 = base.option("parallelismInShard", "1").load()
    df3 = base.option("parallelismInShard", "3").load()
    assert df1.rdd.getNumPartitions() == 1
    assert df3.rdd.getNumPartitions() == 3
    assert sorted(r["msg"] for r in df3.collect()) == sorted(
        r["msg"] for r in df1.collect()
    )


def test_intra_shard_slicing_bad_parallelism(spark, store):
    for bad in ("0", "6"):
        with pytest.raises(Exception, match="[Pp]arallelism"):
            (
                spark.read.format("logstore")
                .option("path", store)
                .option("parallelismInShard", bad)
                .load()
                .collect()
            )


def test_slice_ranges_partition_exactly():
    """Slices must tile [start, end) exactly regardless of stats quality."""
    from spark_streaming_logservice_spark.sources import store_backend as be

    # no data on disk → single slice fallback
    ranges = be.slice_ranges("/nonexistent-store", 0, 5, 50, 4)
    assert ranges == [(5, 50)]


def test_create_rdd_parallelism_passthrough(spark, tmp_path):
    from spark_streaming_logservice_spark.compat.factories import create_rdd

    path = str(tmp_path / "proj" / "rdd-sliced")
    for i in range(4):
        fixtures.write_messages(
            path, [str(j) for j in range(8)], shard=0,
            base_time=1_700_000_000 + i * 60,
        )
    df = create_rdd(
        spark, path, start_time=0, schema="msg STRING", parallelism_in_shard=2
    )
    assert df.rdd.getNumPartitions() == 2
    assert len(df.collect()) == 32


def test_reused_dataframe_snapshot_and_fresh_load_rereads(spark, store):
    """The reference's relation re-runs buildScan per action, so a re-used
    DF sees appended data (TEST/LoghubRelationSuite re-use scenario). Spark's
    Python DataSource caches planned partitions per DataFrame, so here a
    re-used DF is a stable snapshot (documented divergence — also valid
    relation semantics) and a fresh load() picks up new data."""
    reader = (
        spark.read.format("logstore").schema("msg STRING").option("path", store)
    )
    df = reader.load()
    assert len(df.collect()) == 5
    fixtures.write_messages(store, ["9"], shard=0, base_time=1_700_000_500)
    assert len(df.collect()) == 5  # snapshot: stable across actions
    assert sorted(r["msg"] for r in reader.load().collect()) == [
        "1", "2", "3", "4", "5", "9",
    ]
