"""Streaming bottom-k sample store: the maintained table must equal the
batch bottom-k sample over the same rows however the input is batched
(bottom-k union commutes with batching), replay must be a no-op both via
the batchId marker and mathematically, and state must stay O(scopes x k).
Membership is a pure function of the key's hash, so the sample is uniform
over distinct keys and independent of arrival order."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_logservice_spark.streaming import sample_store as SS
from spark_streaming_logservice_spark.tables import load_table

_SCHEMA = (
    "scope STRING, sample_key STRING, lang STRING, n_chars BIGINT, h BIGINT"
)
_K = 16


def _writer(table: str):
    return SS.incremental_sample_writer(
        table, "source", "doc_id", ["lang", "n_chars"], _SCHEMA, k=_K
    )


def _rows(df) -> set:
    return {
        (r["scope"], r["sample_key"], r["lang"], r["n_chars"], r["h"])
        for r in df.collect()
    }


def test_streamed_sample_equals_batch_any_batching(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    batch = SS.bottomk_sample_partial(
        docs, "source", "doc_id", ["lang", "n_chars"], k=_K
    )

    for n_batches, name in [(1, "one"), (5, "five")]:
        table = str(tmp_path / name)
        writer = _writer(table)
        for i in range(n_batches):
            writer(docs.where(F.col("doc_id") % n_batches == i), i)
        assert _rows(SS.read_sample(spark, table, _SCHEMA)) == _rows(batch)

    # fixed-size state: scopes x k rows at most
    n_scopes = docs.select("source").distinct().count()
    assert batch.count() <= n_scopes * _K


def test_replay_and_bottomk_merge_idempotent(spark, sf_dir, tmp_path):
    table = str(tmp_path / "smp")
    writer = _writer(table)
    docs = load_table(spark, sf_dir, "documents")
    writer(docs.where(F.col("doc_id") % 3 == 0), 0)
    first = _rows(SS.read_sample(spark, table, _SCHEMA))

    # batchId redelivery: marker short-circuits, store unchanged
    writer(docs.where(F.col("doc_id") % 3 == 0), 0)
    assert _rows(SS.read_sample(spark, table, _SCHEMA)) == first

    # even WITHOUT the marker, bottom-k union makes a replayed partial a
    # mathematical no-op — feed the same rows under a new batch id
    writer(docs.where(F.col("doc_id") % 3 == 0), 1)
    assert _rows(SS.read_sample(spark, table, _SCHEMA)) == first


def test_sample_is_hash_prefix_of_full_ranking(spark, sf_dir, tmp_path):
    """The store must hold exactly the k hash-smallest distinct keys per
    scope — i.e. the bottom-k sample, not just any k rows."""
    table = str(tmp_path / "smp")
    writer = _writer(table)
    docs = load_table(spark, sf_dir, "documents")
    for i in range(4):
        writer(docs.where(F.col("doc_id") % 4 == i), i)

    got = {}
    for r in SS.read_sample(spark, table, _SCHEMA).collect():
        got.setdefault(r["scope"], set()).add(r["sample_key"])

    full = (
        docs.select(
            F.col("source").alias("scope"),
            F.col("doc_id").cast("string").alias("sample_key"),
        )
        .withColumn("h", F.conv(F.substring(F.md5(
            F.concat(F.lit("smp:"), F.col("sample_key"))), 1, 15), 16, 10)
            .cast("bigint"))
    )
    for scope, keys in got.items():
        want = [
            r["sample_key"]
            for r in full.where(F.col("scope") == scope)
            .orderBy("h", "sample_key")
            .limit(_K)
            .collect()
        ]
        assert set(want) == keys


def test_real_stream_drive_equals_batch(spark, sf_dir, tmp_path):
    """Drive the writer through an actual readStream -> foreachBatch query
    (availableNow, one file per trigger), not direct writer calls — the
    store must still equal the batch bottom-k sample over the full input."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", "lang", "n_chars"
    )
    src = str(tmp_path / "src")
    docs.repartition(4).write.parquet(src)
    table = str(tmp_path / "smp")
    q = (
        spark.readStream.schema(
            "source STRING, doc_id LONG, lang STRING, n_chars LONG"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(_writer(table))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(150)
    batch = SS.bottomk_sample_partial(
        docs, "source", "doc_id", ["lang", "n_chars"], k=_K
    )
    assert _rows(SS.read_sample(spark, table, _SCHEMA)) == _rows(batch)
