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
