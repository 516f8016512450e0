"""The session-pinned cluster-assignment cache (dedup.cluster_assignments)
must rebuild when the corpus file changes and hit when it doesn't — a stale
hit would silently serve clusters of a corpus that no longer exists."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from spark_streaming_logservice_spark.operators import dedup as DD


def _write_docs(spark, path, texts):
    spark.createDataFrame(
        [(i, t, "src", "en", len(t)) for i, t in enumerate(texts)],
        "doc_id LONG, text STRING, source STRING, lang STRING, n_chars LONG",
    ).coalesce(1).write.mode("overwrite").parquet(path)


def test_cache_hits_and_invalidates_on_corpus_change(spark, tmp_path):
    sf = str(tmp_path)
    docs = os.path.join(sf, "documents.parquet")
    dup = "alpha beta gamma delta epsilon zeta eta theta"
    _write_docs(spark, docs, [dup, dup, "totally different text here now"])

    a1 = DD.cluster_assignments(spark, sf)
    r1 = sorted(tuple(r) for r in a1.collect())
    assert len(r1) == 2  # docs 0,1 cluster together
    # same corpus -> same cached DataFrame object (no rebuild)
    assert DD.cluster_assignments(spark, sf) is a1

    # rewrite the corpus: three-way duplicate now
    _write_docs(spark, docs, [dup, dup, dup])
    a2 = DD.cluster_assignments(spark, sf)
    assert a2 is not a1
    assert len(a2.collect()) == 3

    # cache stays bounded and keyed per corpus: the old entry was evicted
    # or keyed differently, but a fresh dir gets its own entry
    assert len(DD._ASSIGN_CACHE) <= 4
