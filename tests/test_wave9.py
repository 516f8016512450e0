"""Round-9 tests: ADVICE fixes (s21 fold-order drift detector, rollup
empty-combiner shards, sample-store window-first pruning, l27 presence
count) and the ANN index store."""

from __future__ import annotations

import math
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from spark_streaming_logservice_spark import registry
from spark_streaming_logservice_spark.tables import TABLES

registry.load_all()


def _duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(sf_dir, t + '.parquet')}')"
        )
    return con


def test_s21_mmr_score_fold_order_tolerance(spark, sf_dir):
    """s21's exact hash parity relies on DuckDB's list_sum folding
    left-to-right in IEEE order (matching the python greedy's sequential
    loops). This test compares mmr_score per (q_id, n_id) at a tolerance
    one ulp-of-1e-6 wide: if a DuckDB version ever switches list_sum to
    pairwise summation, the hash gate breaks but THIS stays green —
    diagnosing the drift as a fold-order flip rather than a logic bug."""
    sdf = registry.QUERIES["s21_mmr_diversified_topk"](spark, sf_dir)
    srows = {
        (r["q_id"], r["n_id"]): r["mmr_score"] for r in sdf.collect()
    }
    con = _duck_con(sf_dir)
    drows = {
        (q, n): s
        for q, n, s in con.execute(
            "SELECT q_id, n_id, mmr_score FROM ("
            + registry.ORACLES["s21_mmr_diversified_topk"]
            + ")"
        ).fetchall()
    }
    con.close()
    assert srows.keys() == drows.keys()
    for k, sv in srows.items():
        assert math.isclose(sv, drows[k], abs_tol=1.1e-6), (
            f"{k}: spark={sv} duck={drows[k]} beyond one 1e-6 ulp — "
            "summation-order drift larger than a half-up boundary flip"
        )


def test_l27_presence_count_includes_subthreshold_template(spark):
    """Direct check: a day with one dominant and one sub-threshold template
    reports n_templates=2 when it appears as a drift row."""
    import datetime as dt
    import tempfile

    d1 = dt.datetime(2024, 3, 1)
    d2 = dt.datetime(2024, 3, 2)
    rows = (
        [(d1, "A", 1, "p") for _ in range(5)]
        + [(d2, "A", 1, "p") for _ in range(20001)]
        + [(d2, "B", 2, "p")]
    )
    df = spark.createDataFrame(
        rows, "ts TIMESTAMP, event_type STRING, user_id INT, props STRING"
    )
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "events.parquet"))
        from spark_streaming_logservice_spark.operators.log_queries import (
            l27_template_drift,
        )

        out = {
            r["day"].isoformat(): r["n_templates"]
            for r in l27_template_drift(spark, td).collect()
        }
    assert out == {"2024-03-02": 2}


def test_sharded_merge_combiner_may_empty_a_shard(spark, tmp_path):
    """A combiner that legitimately produces zero rows for a dirty shard
    (e.g. every delta row loses to base in a bottom-k) must publish an
    empty shard version, not raise / poison the batch (ADVICE r8)."""
    from spark_streaming_logservice_spark.streaming.rollup import (
        merge_additive,
        read_store,
    )

    table = str(tmp_path / "store")
    schema = "k STRING, v BIGINT"

    # batch 0 seeds shard 'a' with one row
    merge_additive(
        table,
        spark.createDataFrame([("a", 1)], schema),
        key_cols=["k"],
        sum_cols=["v"],
        schema=schema,
        batch_id=0,
        partition_expr=F.col("k"),
    )
    assert read_store(spark, table, schema).count() == 1

    # batch 1 touches shard 'a' again, but the combiner drops everything
    merge_additive(
        table,
        spark.createDataFrame([("a", 5)], schema),
        key_cols=["k"],
        sum_cols=["v"],
        schema=schema,
        batch_id=1,
        partition_expr=F.col("k"),
        combiner=lambda both: both.where(F.lit(False)),
    )
    assert read_store(spark, table, schema).count() == 0
    # and the swap remains crash-consistent: a replay of batch 1 is a no-op
    merge_additive(
        table,
        spark.createDataFrame([("a", 5)], schema),
        key_cols=["k"],
        sum_cols=["v"],
        schema=schema,
        batch_id=1,
        partition_expr=F.col("k"),
        combiner=lambda both: both.where(F.lit(False)),
    )
    assert read_store(spark, table, schema).count() == 0


def test_sample_rekeep_dense_rank_handles_duplicates(spark):
    """_rekeep must return the k smallest DISTINCT keys even when the same
    (scope, key) row appears multiple times in the input (merge replays):
    dense_rank shares a rank across duplicates, row_number would not."""
    from spark_streaming_logservice_spark.streaming.sample_store import _rekeep

    rows = [
        ("s", "ka", 10, "pa"),
        ("s", "ka", 10, "pa"),  # duplicate of the smallest key
        ("s", "kb", 20, "pb"),
        ("s", "kc", 30, "pc"),
    ]
    df = spark.createDataFrame(
        rows, "scope STRING, sample_key STRING, h BIGINT, payload STRING"
    )
    kept = {r["sample_key"] for r in _rekeep(df, 2).collect()}
    assert kept == {"ka", "kb"}
    assert _rekeep(df, 2).count() == 2


def test_assign_cache_keys_on_part_file_stats(spark, tmp_path):
    """Rewriting a part file in place (same name, same directory) must
    change the cluster_assignments cache key (ADVICE r8: directory mtime
    does not change on in-place rewrite)."""
    import time

    from spark_streaming_logservice_spark.operators import dedup

    corpus = str(tmp_path / "documents.parquet")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(
        50
    ).coalesce(1).write.parquet(corpus)

    def keys_here():
        return {k for k in dedup._ASSIGN_CACHE if k[1].startswith(str(tmp_path))}

    dedup.cluster_assignments(spark, str(tmp_path))
    key1 = keys_here()
    assert len(key1) == 1

    # in-place rewrite: touch a part file's mtime without renaming anything
    part = next(
        f for f in sorted(os.listdir(corpus)) if not f.startswith((".", "_"))
    )
    t = time.time() + 10
    os.utime(os.path.join(corpus, part), (t, t))

    dedup.cluster_assignments(spark, str(tmp_path))
    assert keys_here() - key1, (
        "a NEW cache key must appear when a part file is rewritten in place"
    )


# --- round-9 operator semantics on hand-computed fixtures ---------------------


def _write(df, td, name):
    df.write.parquet(os.path.join(td, f"{name}.parquet"))


def test_e29_retention_matrix_semantics(spark, tmp_path):
    """Two cohorts, hand-checked: users A,B first seen week0, only A
    returns week1; user C first seen week1."""
    import datetime as dt

    w0, w1 = dt.datetime(2024, 1, 1, 12), dt.datetime(2024, 1, 8, 12)
    rows = [
        (1, w0, "A"), (2, w0, "B"),
        (3, w1, "A"), (4, w1, "C"),
    ]
    df = spark.createDataFrame(
        [(i, ts, hash(u) % 1000 + ord(u[0]) * 1000) for i, ts, u in rows],
        "event_id INT, ts TIMESTAMP, user_id INT",
    ).withColumn("event_type", F.lit("view"))
    _write(df, str(tmp_path), "events")
    from spark_streaming_logservice_spark.operators.events2 import (
        e29_retention_matrix,
    )

    got = {
        (r["cohort_week"].isoformat(), r["week_offset"]): (
            r["n_active"],
            r["n_cohort"],
            r["retention"],
        )
        for r in e29_retention_matrix(spark, str(tmp_path)).collect()
    }
    assert got == {
        ("2024-01-01", 0): (2, 2, 1.0),
        ("2024-01-01", 1): (1, 2, 0.5),
        ("2024-01-08", 0): (1, 1, 1.0),
    }


def test_e30_top_contributor_and_tie_break(spark, tmp_path):
    """The spiking type wins attribution; on equal excess the tie breaks
    to the alphabetically-first type."""
    import datetime as dt

    # per-day (click, view) counts: varied baseline so MAD > 0, then a
    # click spike on day 6. Daily totals [3,5,4,5,3,12]: median 4.5, MAD
    # 1.0, day-6 robust z = .6745*7.5 = 5.06 > 2.5. Type medians: click
    # 2.5 (of [2,3,2,3,2,10]), view 2 (of [1,2,2,2,1,2]).
    plan = [(2, 1), (3, 2), (2, 2), (3, 2), (2, 1), (10, 2)]
    rows = []
    eid = 0
    for day, (nc, nv) in enumerate(plan, start=1):
        for t in ["click"] * nc + ["view"] * nv:
            rows.append((eid, dt.datetime(2024, 2, day, 10), 1, t)); eid += 1
    df = spark.createDataFrame(
        rows, "event_id INT, ts TIMESTAMP, user_id INT, event_type STRING"
    )
    _write(df, str(tmp_path), "events")
    from spark_streaming_logservice_spark.operators.events2 import (
        e30_anomaly_attribution,
    )

    out = {
        r["day"].isoformat(): (r["top_type"], r["top_excess"], r["is_anomaly"])
        for r in e30_anomaly_attribution(spark, str(tmp_path)).collect()
    }
    # day 6: click excess = 10 - 2.5 = 7.5, view excess = 0 -> click wins
    assert out["2024-02-06"] == ("click", 7.5, True)
    # day 2 (baseline): click excess 0.5 beats view 0; not anomalous
    assert out["2024-02-02"] == ("click", 0.5, False)
    # day 3 (baseline): click excess -0.5 loses to view 0
    assert out["2024-02-03"] == ("view", 0.0, False)


def test_p24_split_counting_by_hand(spark, tmp_path):
    """Three 300-token docs in one source: boundaries at 512/1024 ->
    exactly one doc straddles a boundary; 900 tokens -> 2 sequences,
    tail fill 388/512."""
    from spark_streaming_logservice_spark.operators.pipeline_ops import (
        p24_sequence_packing,
    )

    text = " ".join(["tok"] * 300)
    df = spark.createDataFrame(
        [(i, "src", text) for i in range(3)],
        "doc_id BIGINT, source STRING, text STRING",
    )
    _write(df, str(tmp_path), "documents")
    [r] = p24_sequence_packing(spark, str(tmp_path)).collect()
    assert (r["n_docs"], r["total_tokens"], r["n_sequences"]) == (3, 900, 2)
    # doc0 [0,300) no boundary; doc1 [300,600) crosses 512; doc2 [600,900)
    # crosses neither 512 nor 1024
    assert r["n_split_docs"] == 1
    assert r["split_share"] == 0.3333
    assert r["tail_fill"] == round((20000 * 388 + 512) // (2 * 512) / 10000, 4)


def test_l30_constant_rate_forecasts_exactly(spark, tmp_path):
    """A perfectly periodic signal (k events every hour, 28 days) makes
    the seasonal-naive forecast exact: ape == 0 for all 7 test days."""
    import datetime as dt

    rows = []
    eid = 0
    base = dt.datetime(2024, 3, 4)  # a Monday
    for day in range(28):
        for hr in range(0, 24, 6):  # 4 slots/day
            for _ in range(3):
                rows.append(
                    (eid, base + dt.timedelta(days=day, hours=hr), 1, "view")
                )
                eid += 1
    df = spark.createDataFrame(
        rows, "event_id INT, ts TIMESTAMP, user_id INT, event_type STRING"
    )
    _write(df, str(tmp_path), "events")
    from spark_streaming_logservice_spark.operators.log_queries import (
        l30_volume_forecast,
    )

    out = l30_volume_forecast(spark, str(tmp_path)).collect()
    assert len(out) == 7
    for r in out:
        assert (r["n_actual"], r["n_pred"], r["ape"]) == (12, 12, 0.0)


def test_p25_uniform_mix_has_full_effective_sources(spark, tmp_path):
    """4 equally-sized sources: entropy = ln 4, effective sources = 4."""
    import math

    from spark_streaming_logservice_spark.operators.pipeline_ops import (
        p25_mixture_diversity,
    )

    df = spark.createDataFrame(
        [(i, f"s{i % 4}", "x") for i in range(40)],
        "doc_id BIGINT, source STRING, text STRING",
    )
    _write(df, str(tmp_path), "documents")
    rows = p25_mixture_diversity(spark, str(tmp_path)).collect()
    assert len(rows) == 4
    for r in rows:
        assert r["share"] == 0.25
        assert r["entropy"] == round(math.log(4), 6)
        assert r["effective_sources"] == 4.0


def test_ann_index_eviction_reclaims_disk(spark, tmp_path, monkeypatch):
    """The store root is bounded: LRU overflow and crashed half-builds are
    rmtree'd, and their collected-artifact cache entries purged."""
    import json
    import time

    from spark_streaming_logservice_spark.streaming import ann_index as AI

    root = str(tmp_path / "stores")
    os.makedirs(root)
    monkeypatch.setenv("SPARK_GRAFT_ANN_STORE_ROOT", root)
    AI._INDEX_CACHE.clear()
    # 4 fake complete stores (oldest first) + one crashed half-build
    old_dirs = []
    for i in range(4):
        d = os.path.join(root, f"fake-{i}")
        os.makedirs(d)
        with open(os.path.join(d, AI._INDEX_MARKER), "w") as f:
            json.dump([f"/nonexistent/{i}", 1, 1, 1], f)
        t = time.time() - 1000 + i
        os.utime(os.path.join(d, AI._INDEX_MARKER), (t, t))
        old_dirs.append(d)
        AI._ARTIFACT_CACHE[("appX", os.path.realpath(d), 1)] = ([], [], 8)
    # a STALE marker-less dir (crashed build) must be reclaimed; a YOUNG
    # one may be another application's build in progress — left alone
    half = os.path.join(root, "half-build.build-999")
    os.makedirs(half)
    t = time.time() - 2 * AI._BUILD_GRACE_SEC
    os.utime(half, (t, t))
    young = os.path.join(root, "young.build-998")
    os.makedirs(young)

    table = AI.ensure_index(spark, "/root/testdata/sf0.001")
    assert os.path.isdir(table)
    assert not os.path.exists(half), "stale crashed half-build reclaimed"
    assert os.path.exists(young), "in-progress build must be left alone"
    # LRU: with the new store kept, only _MAX_STORES-1 old stores survive
    survivors = [d for d in old_dirs if os.path.exists(d)]
    assert len(survivors) == AI._MAX_STORES - 1
    assert not os.path.exists(old_dirs[0]), "oldest store evicted first"
    # artifact-cache entries for evicted dirs are purged (ADVICE r9)
    for d in old_dirs:
        if not os.path.exists(d):
            assert ("appX", os.path.realpath(d), 1) not in AI._ARTIFACT_CACHE
    for d in survivors:
        del AI._ARTIFACT_CACHE[("appX", os.path.realpath(d), 1)]
    AI._INDEX_CACHE.clear()


def test_ann_index_reattach_same_app(spark, tmp_path, monkeypatch):
    """Second ensure_index call (memo cleared — simulates a fresh process
    in-process) must reattach to the existing store, not rebuild: the
    marker mtime is touched but the store contents stay byte-identical."""
    from spark_streaming_logservice_spark.streaming import ann_index as AI

    root = str(tmp_path / "stores")
    monkeypatch.setenv("SPARK_GRAFT_ANN_STORE_ROOT", root)
    AI._INDEX_CACHE.clear()
    t1 = AI.ensure_index(spark, "/root/testdata/sf0.001")
    data = os.path.join(t1, "centroids", "data")
    built_mtime = os.stat(data).st_mtime_ns
    AI._INDEX_CACHE.clear()  # forget the in-process memo
    t2 = AI.ensure_index(spark, "/root/testdata/sf0.001")
    assert t2 == t1
    assert os.stat(data).st_mtime_ns == built_mtime, "reattach must not rebuild"
    AI._INDEX_CACHE.clear()
