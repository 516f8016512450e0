"""Streaming cross-source dup-matrix store: the maintained matrix must
equal the batch d19 computation over the same rows, replay must be a
no-op, and merges must touch only the digest-prefix buckets the batch's
fingerprints land in (shared sharded-swap machinery — crash scenarios are
pinned by the rollup/upsert suites)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from spark_streaming_logservice_spark.streaming import dup_matrix as DM


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, source STRING, text STRING")


_ROWS = [
    (1, "web", "alpha beta gamma"),
    (2, "web", "alpha beta gamma"),       # within-web dup of 1
    (3, "wiki", "gamma beta alpha"),      # reordering dup of 1/2 (canonical)
    (4, "wiki", "delta epsilon"),
    (5, "books", "delta epsilon"),        # cross wiki/books dup
    (6, "books", "unique text here"),
    (7, "web", "epsilon delta delta"),    # repetition variant of 4/5
]


def test_streamed_matrix_equals_batch(spark, tmp_path):
    table = str(tmp_path / "dm")
    writer = DM.incremental_dup_matrix_writer(table)
    # three micro-batches
    writer(_docs(spark, _ROWS[:3]), 0)
    writer(_docs(spark, _ROWS[3:5]), 1)
    writer(_docs(spark, _ROWS[5:]), 2)

    got = {
        (r["src_a"], r["src_b"]): r["n_dup_pairs"]
        for r in DM.read_dup_matrix(spark, table).collect()
    }
    # canonical groups: {1,2,3} (web,web,wiki), {4,5,7} (wiki,books,web)
    assert got == {
        ("web", "web"): 1,        # docs 1-2
        ("web", "wiki"): 3,       # 1-3, 2-3, 7-4
        ("books", "web"): 1,      # 5-7
        ("books", "wiki"): 1,     # 4-5
    }


def test_replay_is_noop_and_buckets_isolated(spark, tmp_path):
    table = str(tmp_path / "dm")
    writer = DM.incremental_dup_matrix_writer(table)
    writer(_docs(spark, _ROWS[:3]), 0)
    first = {
        (r["src_a"], r["src_b"]): r["n_dup_pairs"]
        for r in DM.read_dup_matrix(spark, table).collect()
    }
    writer(_docs(spark, _ROWS[:3]), 0)  # redelivery
    again = {
        (r["src_a"], r["src_b"]): r["n_dup_pairs"]
        for r in DM.read_dup_matrix(spark, table).collect()
    }
    assert first == again

    # a batch only republishes the buckets its own fingerprints land in
    import hashlib

    def bucket(text):
        canon = " ".join(sorted(set(t for t in text.lower().split(" ") if t)))
        return hashlib.md5(canon.encode()).hexdigest()[0]

    new_bucket = bucket(_ROWS[5][2])  # doc 6's digest-prefix shard
    parts = os.path.join(table, "parts")
    before = {}
    for shard in sorted(os.listdir(parts)):
        d = os.path.join(parts, shard, "data")
        if os.path.isdir(d):
            before[shard] = sorted(
                (f, os.path.getmtime(os.path.join(d, f)))
                for f in os.listdir(d)
            )
    writer(_docs(spark, _ROWS[5:6]), 1)  # one unique doc
    dirty = set()
    for shard in before:
        d = os.path.join(parts, shard, "data")
        after = sorted(
            (f, os.path.getmtime(os.path.join(d, f))) for f in os.listdir(d)
        )
        if after != before[shard]:
            dirty.add(shard)
    assert dirty <= {new_bucket}, (
        f"buckets {dirty - {new_bucket}} republished by a batch whose "
        f"fingerprints land only in bucket {new_bucket}"
    )


def test_streamed_matrix_equals_batch_d19_at_sf001(spark, sf_dir, tmp_path):
    """Stream the real sf0.01 documents table in 4 micro-batches and assert
    the served matrix equals the batch d19 result EXACTLY (VERDICT r7 item
    6: the two paths share the count algebra by construction — this pins it
    at corpus scale, not just on a 7-row toy)."""
    from spark_streaming_logservice_spark import registry
    from spark_streaming_logservice_spark.tables import load_table

    registry.load_all()
    table = str(tmp_path / "dm")
    writer = DM.incremental_dup_matrix_writer(table)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    for b in range(4):
        writer(docs.where(F.col("doc_id") % 4 == b), b)

    served = {
        (r["src_a"], r["src_b"]): r["n_dup_pairs"]
        for r in DM.read_dup_matrix(spark, table).collect()
    }
    batch = {
        (r["src_a"], r["src_b"]): r["n_dup_pairs"]
        for r in registry.QUERIES["d19_cross_source_dup_matrix"](
            spark, sf_dir
        ).collect()
    }
    assert served == batch and len(batch) > 0
