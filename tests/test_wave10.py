"""Round-10 tests: hand-computed semantics for the 10 new operators
(d26, e32, g08, p26, q33, s28, s29, sql10, t19, v11) on fixtures small
enough to verify by hand — the oracle gate proves Spark==DuckDB; these
prove both equal the intended math."""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import functions as F

from spark_streaming_logservice_spark import registry

registry.load_all()


def _write(df, root: str, name: str) -> None:
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(root, f"{name}.parquet")
    )


def _docs(spark, root, rows):
    df = spark.createDataFrame(
        [
            (i, text, "en", src, len(text))
            for i, (text, src) in enumerate(rows)
        ],
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    )
    _write(df, root, "documents")


def test_d26_prefix_families(spark, tmp_path):
    """Three docs share the first-3-token prefix, two share another, one is
    unique: exactly two families, canonical = min doc_id, sources counted
    distinct."""
    _docs(
        spark,
        str(tmp_path),
        [
            ("a b c d e", "s1"),      # 0: prefix "a b c"
            ("a b c x y", "s1"),      # 1: prefix "a b c"
            ("a b c zz", "s2"),       # 2: prefix "a b c"
            ("p q r one", "s1"),      # 3: prefix "p q r"
            ("p q r two", "s1"),      # 4: prefix "p q r"
            ("lone doc here", "s3"),  # 5: singleton -> absent
        ],
    )
    rows = registry.QUERIES["d26_prefix_dedup"](spark, str(tmp_path)).collect()
    got = [(r["canonical_doc_id"], r["n_docs"], r["n_sources"]) for r in rows]
    assert got == [(0, 3, 2), (3, 2, 1)]


def test_e32_fano_hand_computed(spark, tmp_path):
    """One type with metronomic 1/minute (fano 0), one with counts [1, 3]
    (mean 2, pop-var 1, fano 0.5)."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    eid = 0
    for m in range(4):  # 'flat': one event per minute x 4 minutes
        rows.append((eid, base + dt.timedelta(minutes=m), 1, "flat", 0.0, "{}"))
        eid += 1
    # 'burst': minute 0 -> 1 event, minute 1 -> 3 events
    rows.append((eid, base, 2, "burst", 0.0, "{}")); eid += 1
    for _ in range(3):
        rows.append(
            (eid, base + dt.timedelta(minutes=1), 2, "burst", 0.0, "{}")
        )
        eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING",
    )
    _write(df, str(tmp_path), "events")
    out = {
        r["event_type"]: r
        for r in registry.QUERIES["e32_burstiness_fano"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out["flat"]["n_minutes"] == 4
    assert out["flat"]["fano_factor"] == 0.0
    assert out["flat"]["mean_per_minute"] == 1.0
    assert out["burst"]["n_minutes"] == 2
    assert out["burst"]["mean_per_minute"] == 2.0
    # counts [1,3]: fano = (n*sxx - sx^2)/(n*sx) = (2*10-16)/(2*4) = 0.5
    assert out["burst"]["fano_factor"] == 0.5
    assert out["burst"]["peak_minute"] == 3


def test_g08_ra_hand_computed(spark, tmp_path):
    """Path graph a-b-c built from two 2-item orders: the only candidate
    pair is (a, c) through center b (deg 2), RA = 1/2, common = 1."""
    li = spark.createDataFrame(
        [
            # order 2: parts 100, 200 / order 4: parts 200, 300
            (2, 100, 1, 1), (2, 200, 2, 1), (4, 200, 3, 1), (4, 300, 4, 1),
        ],
        "l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT, "
        "l_linenumber INT",
    ).select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        F.lit(1.0).alias("l_quantity"), F.lit(1.0).alias("l_extendedprice"),
        F.lit(0.0).alias("l_discount"), F.lit(0.0).alias("l_tax"),
        F.lit("N").alias("l_returnflag"), F.lit("O").alias("l_linestatus"),
        F.lit("2024-01-01").cast("timestamp").alias("l_shipdate"),
    )
    _write(li, str(tmp_path), "lineitem")
    rows = registry.QUERIES["g08_ra_link_prediction"](
        spark, str(tmp_path)
    ).collect()
    assert [(r["part_a"], r["part_b"], r["n_common"], r["ra_score"])
            for r in rows] == [(100, 300, 1, 0.5)]


def test_p26_allocation_hand_computed(spark, tmp_path):
    """Two sources, 10 and 90 tokens: budget = 200, share = 100. The small
    source caps at 4 epochs (40 tokens, data-constrained); the big one is
    budget-constrained at 100 tokens (1.1111 epochs)."""
    _docs(
        spark,
        str(tmp_path),
        [(" ".join(["w"] * 10), "small"), (" ".join(["w"] * 90), "big")],
    )
    out = {
        r["source"]: r
        for r in registry.QUERIES["p26_epoch_allocation"](
            spark, str(tmp_path)
        ).collect()
    }
    s, b = out["small"], out["big"]
    assert (s["n_tokens"], s["equal_share"], s["allocated_tokens"]) == (10, 100, 40)
    assert s["epochs"] == 4.0 and s["data_constrained"]
    assert (b["n_tokens"], b["allocated_tokens"]) == (90, 100)
    assert b["epochs"] == 1.1111 and not b["data_constrained"]


def test_q33_repeat_share_hand_computed(spark, tmp_path):
    """Customer 1 buys brand A in two orders (repeat), customer 2 buys it
    once; brand B only ever sold once."""
    part = spark.createDataFrame(
        [(100, "pn", "A", "t", 1, 1.0), (200, "pn2", "B", "t", 1, 1.0)],
        "p_partkey BIGINT, p_name STRING, p_brand STRING, p_type STRING, "
        "p_size INT, p_retailprice DOUBLE",
    )
    orders = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 2)],
        "o_orderkey BIGINT, o_custkey BIGINT",
    ).select(
        "o_orderkey", "o_custkey", F.lit("O").alias("o_orderstatus"),
        F.lit(1.0).alias("o_totalprice"),
        F.lit("2024-01-01").cast("timestamp").alias("o_orderdate"),
        F.lit("1-URGENT").alias("o_orderpriority"),
    )
    li = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 100), (3, 200)],
        "l_orderkey BIGINT, l_partkey BIGINT",
    ).select(
        "l_orderkey", "l_partkey", F.lit(1).cast("bigint").alias("l_suppkey"),
        F.lit(1).alias("l_linenumber"), F.lit(1.0).alias("l_quantity"),
        F.lit(1.0).alias("l_extendedprice"), F.lit(0.0).alias("l_discount"),
        F.lit(0.0).alias("l_tax"), F.lit("N").alias("l_returnflag"),
        F.lit("O").alias("l_linestatus"),
        F.lit("2024-01-01").cast("timestamp").alias("l_shipdate"),
    )
    for name, df in (("part", part), ("orders", orders), ("lineitem", li)):
        _write(df, str(tmp_path), name)
    out = {
        r["p_brand"]: r
        for r in registry.QUERIES["q33_brand_repeat_share"](
            spark, str(tmp_path)
        ).collect()
    }
    assert (out["A"]["n_customers"], out["A"]["n_repeat"]) == (2, 1)
    assert out["A"]["repeat_share"] == 0.5
    assert (out["B"]["n_customers"], out["B"]["n_repeat"]) == (1, 0)
    assert out["B"]["repeat_share"] == 0.0


def test_s28_s29_served_from_store(spark, sf_dir, tmp_path, monkeypatch):
    """s28's histogram sums to the corpus size; s29's per-subspace error is
    non-negative, bounded by the max, and the store serves both without
    retraining (fresh memo, existing store)."""
    from spark_streaming_logservice_spark.streaming import ann_index as AI

    root = str(tmp_path / "stores")
    monkeypatch.setenv("SPARK_GRAFT_ANN_STORE_ROOT", root)
    AI._INDEX_CACHE.clear()
    h = registry.QUERIES["s28_ivf_cell_balance"](spark, sf_dir).collect()
    n_corpus = AI.read_vectors(
        spark, AI.ensure_index(spark, sf_dir)
    ).count()
    assert sum(r["cell_size"] * r["n_cells"] for r in h) == n_corpus
    err = registry.QUERIES["s29_pq_reconstruction_error"](
        spark, sf_dir
    ).collect()
    assert [r["sub"] for r in err] == [0, 1, 2, 3]
    for r in err:
        assert 0.0 <= r["avg_sq_error"] <= r["max_sq_error"]
        assert r["n_vectors"] == n_corpus
    AI._INDEX_CACHE.clear()


def test_t19_drift_hand_computed(spark, tmp_path):
    """One doc 'a a b b': first half all-a, second half all-b. L1 drift =
    |1-0| + |0-1| = 2 (the maximum), with N1 = N2 = 2."""
    _docs(spark, str(tmp_path), [("a a b b", "s1")])
    r = registry.QUERIES["t19_positional_drift"](
        spark, str(tmp_path)
    ).collect()[0]
    assert (r["n_first_half"], r["n_second_half"], r["n_terms"]) == (2, 2, 2)
    assert r["l1_drift"] == 2.0


def test_v11_entropy_hand_computed(spark, tmp_path):
    """'abab' has bigrams ab, ba, ab: entropy = ln3 - (2 ln2)/3 (computed
    via the same 1e-6 quantization the operator uses)."""
    _docs(spark, str(tmp_path), [("abab", "s1")])
    r = registry.QUERIES["v11_char_bigram_entropy"](
        spark, str(tmp_path)
    ).collect()[0]
    assert (r["n_bigrams"], r["n_distinct"]) == (3, 2)
    s_units = math.floor(2 * math.log(2) * 1e6 + 0.5)  # c=2 term; c=1 -> 0
    expect = round(math.log(3) - s_units / (1e6 * 3) + 0.0, 4)
    assert r["entropy_nats"] == expect


def test_sql10_qualify_rewrite_topn(spark, tmp_path):
    """Top-2 per customer by totalprice, deterministic tie-break on
    orderkey."""
    orders = spark.createDataFrame(
        [(1, 1, 50.0), (2, 1, 70.0), (3, 1, 70.0), (4, 2, 10.0)],
        "o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE",
    ).select(
        "o_orderkey", "o_custkey", F.lit("O").alias("o_orderstatus"),
        "o_totalprice",
        F.lit("2024-01-01").cast("timestamp").alias("o_orderdate"),
        F.lit("1-URGENT").alias("o_orderpriority"),
    )
    _write(orders, str(tmp_path), "orders")
    # register_views needs every table present; copy stubs for the rest
    for t in ("region", "nation", "customer", "supplier", "part",
              "lineitem", "events", "documents", "embeddings"):
        src = os.path.join("/root/testdata/sf0.001", f"{t}.parquet")
        dst = os.path.join(str(tmp_path), f"{t}.parquet")
        if os.path.isdir(src):
            shutil.copytree(src, dst)
        else:
            shutil.copy(src, dst)
    rows = registry.QUERIES["sql10_qualify_topn"](
        spark, str(tmp_path)
    ).collect()
    got = [(r["o_custkey"], r["o_orderkey"], r["rn"]) for r in rows]
    assert got == [(1, 2, 1), (1, 3, 2), (2, 4, 1)]
