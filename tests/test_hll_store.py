"""Streaming HLL register store: estimates served from the maintained
store must equal the batch l25 sketch over the same rows (register max
commutes with batching), replay must be a no-op, and state must stay
O(scopes x 64) rows however the input is batched."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_logservice_spark import registry
from spark_streaming_logservice_spark.streaming import hll_store as HS
from spark_streaming_logservice_spark.streaming.rollup import read_store
from spark_streaming_logservice_spark.tables import load_table

registry.load_all()


def _batch_estimates(spark, sf_dir):
    return {
        r["scope"]: r["est_users"]
        for r in registry.QUERIES["l25_hll_cardinality"](spark, sf_dir)
        .select("scope", "est_users")
        .collect()
    }


def test_streamed_estimates_equal_batch_l25(spark, sf_dir, tmp_path):
    table = str(tmp_path / "hll")
    writer = HS.incremental_hll_writer(table)
    ev = load_table(spark, sf_dir, "events")
    for i in range(3):
        writer(ev.where(F.col("event_id") % 3 == i), i)

    got = {
        r["scope"]: r["est_users"]
        for r in HS.read_hll_estimates(spark, table).collect()
    }
    assert got == _batch_estimates(spark, sf_dir)

    # fixed-size state: scopes x m register rows at most
    n_scopes = ev.select("event_type").distinct().count()
    n_state = read_store(spark, table, HS._SCHEMA).count()
    assert n_state <= n_scopes * 64


def test_replay_and_register_merge_idempotent(spark, sf_dir, tmp_path):
    table = str(tmp_path / "hll")
    writer = HS.incremental_hll_writer(table)
    ev = load_table(spark, sf_dir, "events")
    writer(ev.where(F.col("event_id") % 3 == 0), 0)
    first = {
        r["scope"]: r["est_users"]
        for r in HS.read_hll_estimates(spark, table).collect()
    }

    # batchId redelivery: marker short-circuits, store unchanged
    writer(ev.where(F.col("event_id") % 3 == 0), 0)
    assert first == {
        r["scope"]: r["est_users"]
        for r in HS.read_hll_estimates(spark, table).collect()
    }

    # even WITHOUT the marker, max-merge makes a replayed register
    # partial a mathematical no-op — feed the same rows as a new batch
    writer(ev.where(F.col("event_id") % 3 == 0), 1)
    assert first == {
        r["scope"]: r["est_users"]
        for r in HS.read_hll_estimates(spark, table).collect()
    }
