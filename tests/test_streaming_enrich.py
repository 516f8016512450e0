"""Stream-static enrichment against the maintained snapshot: each batch
must see the snapshot version CURRENT at batch time (not the t₀ version a
plain stream-static join would pin), unknown users keep NULL enrichment,
and a replayed batch must not double-append."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from spark_streaming_logservice_spark.streaming import enrich as EN
from spark_streaming_logservice_spark.streaming import upsert as UP


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id LONG, event_id LONG, ts STRING"
    ).select(
        "user_id", "event_id", F.col("ts").cast("timestamp_ntz").alias("ts")
    )


def _changes(spark, rows):
    return spark.createDataFrame(
        rows,
        "user_id LONG, event_id LONG, event_type STRING,"
        " value DOUBLE, ts STRING",
    ).select(
        "user_id", "event_id", "event_type", "value",
        F.col("ts").cast("timestamp_ntz").alias("ts"),
    )


def test_batches_see_current_snapshot_version(spark, tmp_path):
    snap_dir = str(tmp_path / "snap")
    out_dir = str(tmp_path / "out")
    snap_writer = UP.incremental_upsert_writer(snap_dir)
    enr_writer = EN.enriching_writer(snap_dir, out_dir)

    # snapshot v1: user 1 is a signup worth 1.0
    snap_writer(
        _changes(spark, [(1, 1, "signup", 1.0, "2024-03-01 08:00:00")]), 0
    )
    enr_writer(_events(spark, [(1, 100, "2024-03-01 09:00:00")]), 0)

    # snapshot advances: user 1 upgraded to purchase 9.0
    snap_writer(
        _changes(spark, [(1, 2, "purchase", 9.0, "2024-03-01 10:00:00")]), 1
    )
    enr_writer(_events(spark, [(1, 101, "2024-03-01 11:00:00"),
                               (2, 102, "2024-03-01 11:00:00")]), 1)

    got = {
        r["event_id"]: (r["profile_type"], r["profile_value"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got[100] == ("signup", 1.0), "batch 0 must see snapshot v1"
    assert got[101] == ("purchase", 9.0), "batch 1 must see the ADVANCED snapshot"
    assert got[102] == (None, None), "unknown user keeps NULL enrichment"


def test_replayed_batch_does_not_double_append(spark, tmp_path):
    snap_dir = str(tmp_path / "snap")
    out_dir = str(tmp_path / "out")
    UP.incremental_upsert_writer(snap_dir)(
        _changes(spark, [(1, 1, "signup", 1.0, "2024-03-01 08:00:00")]), 0
    )
    enr_writer = EN.enriching_writer(snap_dir, out_dir)
    batch = _events(spark, [(1, 100, "2024-03-01 09:00:00")])
    enr_writer(batch, 0)
    enr_writer(batch, 0)  # replay after a simulated restart
    assert spark.read.parquet(out_dir).count() == 1


def test_empty_snapshot_yields_null_columns(spark, tmp_path):
    out = EN.enrich_with_snapshot(
        _events(spark, [(7, 1, "2024-03-01 09:00:00")]),
        str(tmp_path / "missing"),
    ).collect()
    assert len(out) == 1
    assert out[0]["profile_type"] is None and out[0]["profile_value"] is None
