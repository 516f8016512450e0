"""Product quantization ANN: determinism, numpy row parity, recall floor."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from spark_streaming_logservice_spark.operators.ann_pq import (
    K_SUB,
    M_SUB,
    N_ITERS,
    TRAIN_SAMPLE_IDS,
    pq_search,
)
from spark_streaming_logservice_spark.operators.similarity import cosine_topk
from spark_streaming_logservice_spark.tables import load_table


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )


def _numpy_pq(ids: np.ndarray, vecs: np.ndarray, q_ids: np.ndarray, top_k: int = 3):
    """Independent reimplementation of the PQ spec: normalize, split into
    M_SUB slices, per-subspace Lloyd (seeded from the K_SUB lowest ids),
    encode, ADC with fixed-association partial sums."""
    order = np.argsort(ids)
    ids, vecs = ids[order], vecs[order]
    vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    d = vecs.shape[1] // M_SUB
    train = vecs[ids < TRAIN_SAMPLE_IDS]
    books = []
    codes = np.zeros((len(ids), M_SUB), dtype=int)
    for m in range(M_SUB):
        sub = train[:, m * d : (m + 1) * d]
        cw = sub[:K_SUB].copy()
        for _ in range(N_ITERS):
            d2 = ((sub[:, None, :] - cw[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)  # ties: lowest code wins (argmin)
            cw = np.stack(
                [
                    sub[assign == c].mean(axis=0) if (assign == c).any() else cw[c]
                    for c in range(len(cw))
                ]
            )
            # drop empty codewords the way the DataFrame groupBy does
            live = np.array([(assign == c).any() for c in range(len(cw))])
            cw = cw[live]
        full = vecs[:, m * d : (m + 1) * d]
        d2 = ((full[:, None, :] - cw[None, :, :]) ** 2).sum(axis=2)
        codes[:, m] = d2.argmin(axis=1)
        books.append(cw)
    out = []
    for q in q_ids:
        qi = int(np.where(ids == q)[0][0])
        partials = [
            books[m] @ vecs[qi, m * d : (m + 1) * d] for m in range(M_SUB)
        ]
        scores = {}
        for i, n in enumerate(ids):
            if n == q:
                continue
            s = 0.0
            for m in range(M_SUB):
                s = s + partials[m][codes[i, m]]
            scores[int(n)] = round(s, 6)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
        out.extend((int(q), n, s, rk + 1) for rk, (n, s) in enumerate(ranked))
    return out


def test_pq_matches_numpy_reference_literal_rows(spark, sf_dir):
    e = _emb(spark, sf_dir)
    rows = e.collect()
    ids = np.array([r["vec_id"] for r in rows])
    vecs = np.array([r["embedding"] for r in rows])
    got = [
        (r["q_id"], r["n_id"], r["adc_score"], r["rk"])
        for r in pq_search(e, e.where(F.col("vec_id") < 5)).collect()
    ]
    want = _numpy_pq(ids, vecs, np.arange(5))
    assert got == want


def test_pq_recall_against_brute_force(spark, sf_dir):
    """4-byte codes are coarse, but the ADC top-3 must still overlap the
    true cosine top-10 meaningfully — a broken codebook or table join
    collapses this to ~random (≈0)."""
    e = _emb(spark, sf_dir)
    q = e.where(F.col("vec_id") < 5)
    pq = {(r["q_id"], r["n_id"]) for r in pq_search(e, q).collect()}
    brute = {
        (r["q_id"], r["n_id"])
        for r in cosine_topk(e, q, k=10).collect()
    }
    recall = len(pq & brute) / 15.0
    assert recall >= 0.2, f"PQ recall collapsed: {recall}"
