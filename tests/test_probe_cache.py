"""Content-keyed invalidation of the similarity probe caches (r15, VERDICT
r14 item 4 / ADVICE r14 medium).

``_probe_dim`` / ``_corpus_stats`` memoize one-row/one-aggregate probes per
sf_dir so repeated ANN invocations don't each pay a Spark job. r14 keyed
them on the sf_dir PATH only; these tests pin the r15 fix — the key is the
``dataset_content_key`` of embeddings.parquet, so regenerating the dataset
in place (different width or count) re-probes instead of silently serving
a stale dim/plane count.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from spark_streaming_logservice_spark.operators import similarity as sim
from spark_streaming_logservice_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark(app_name="probe-cache-test", master="local[2]",
                     shuffle_partitions=2)


def _write_embeddings(spark, sf_dir: str, n: int, dim: int) -> None:
    p = os.path.join(sf_dir, "embeddings.parquet")
    if os.path.exists(p):
        shutil.rmtree(p)
    (
        spark.range(n)
        .select(
            F.col("id").alias("vec_id"),
            F.array(*[(F.col("id") + i).cast("double") for i in range(dim)]).alias(
                "embedding"
            ),
        )
        .write.parquet(p)
    )


def _emb(spark, sf_dir: str):
    p = os.path.join(sf_dir, "embeddings.parquet")
    return spark.read.parquet(p).select(
        "vec_id", F.col("embedding").alias("emb")
    )


def test_probe_dim_rewrite_invalidates(spark, tmp_path):
    sf = str(tmp_path)
    _write_embeddings(spark, sf, n=6, dim=4)
    assert sim._probe_dim(_emb(spark, sf), "emb", cache_key=sf) == 4
    _write_embeddings(spark, sf, n=6, dim=8)
    assert sim._probe_dim(_emb(spark, sf), "emb", cache_key=sf) == 8


def test_probe_dim_same_content_hits_cache(spark, tmp_path):
    sf = str(tmp_path)
    _write_embeddings(spark, sf, n=5, dim=3)
    assert sim._probe_dim(_emb(spark, sf), "emb", cache_key=sf) == 3
    ck = (sim._embeddings_content_key(sf), "emb")
    assert ck in sim._DIM_CACHE
    # poison the cached value: a second probe over unchanged content must
    # be served from the cache (no Spark job), i.e. return the poison
    sim._DIM_CACHE[ck] = 99
    assert sim._probe_dim(_emb(spark, sf), "emb", cache_key=sf) == 99
    sim._DIM_CACHE[ck] = 3


def test_corpus_stats_rewrite_invalidates(spark, tmp_path):
    sf = str(tmp_path)
    _write_embeddings(spark, sf, n=4, dim=16)
    planes1, dim1 = sim._corpus_stats(_emb(spark, sf), cache_key=sf)
    assert dim1 == 16
    # regenerate in place with a much larger corpus: the adaptive plane
    # count must be recomputed from the new count, not served stale
    _write_embeddings(spark, sf, n=3000, dim=16)
    planes2, dim2 = sim._corpus_stats(_emb(spark, sf), cache_key=sf)
    assert dim2 == 16
    assert planes2 == sim.adaptive_n_planes(3000, 16)
    assert planes2 > planes1
