"""Persisted ANN index store (streaming/ann_index.py): served results must
be bit-identical to the train-inline s05/s07 pipelines, the streaming face
must converge to the batch build (stream-equals-batch), replay must be a
no-op, and serving must never retrain."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from spark_streaming_logservice_spark import registry
from spark_streaming_logservice_spark.streaming import ann_index as AI
from spark_streaming_logservice_spark.tables import load_table

registry.load_all()


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_store_served_equals_train_inline(spark, sf_dir, tmp_path):
    """ivf/pq-from-store == the full train-inline pipelines, bit-for-bit
    (IEEE doubles round-trip parquet exactly; same flat-fold float ops)."""
    from spark_streaming_logservice_spark.operators.ann_ivf import (
        N_QUERY,
        s05_ann_ivf,
    )
    from spark_streaming_logservice_spark.operators.ann_pq import s07_ann_pq

    table = str(tmp_path / "ann")
    AI.build_ann_index(spark, table, _emb(spark, sf_dir))
    q = _emb(spark, sf_dir).where(F.col("vec_id") < N_QUERY)
    assert _rows(AI.ivf_search_from_store(spark, table, q)) == _rows(
        s05_ann_ivf(spark, sf_dir)
    )
    assert _rows(AI.pq_search_from_store(spark, table, q)) == _rows(
        s07_ann_pq(spark, sf_dir)
    )


def test_stream_encode_equals_batch_build(spark, sf_dir, tmp_path):
    """Artifacts trained once, corpus streamed in 3 micro-batches through
    the incremental writer: the vectors store (and therefore every served
    result) must equal the one-shot batch build."""
    emb = _emb(spark, sf_dir)
    batch_t = str(tmp_path / "batch")
    AI.build_ann_index(spark, batch_t, emb)

    stream_t = str(tmp_path / "stream")
    # train the frozen artifacts via a normal build, then reset the
    # vectors store so the stream below is its sole producer
    AI.build_ann_index(spark, stream_t, emb)
    import shutil

    shutil.rmtree(AI._vectors_dir(stream_t))
    writer = AI.incremental_ann_writer(stream_t)
    for i in range(3):
        writer(emb.where(F.col("vec_id") % 3 == i), i)

    assert _rows(AI.read_vectors(spark, stream_t)) == _rows(
        AI.read_vectors(spark, batch_t)
    )
    q = emb.where(F.col("vec_id") < 5)
    assert _rows(AI.ivf_search_from_store(spark, stream_t, q)) == _rows(
        AI.ivf_search_from_store(spark, batch_t, q)
    )


def test_replay_is_noop_and_merge_idempotent(spark, sf_dir, tmp_path):
    emb = _emb(spark, sf_dir)
    table = str(tmp_path / "ann")
    AI.build_ann_index(spark, table, emb.where(F.col("vec_id") < 100))
    writer = AI.incremental_ann_writer(table)
    writer(emb.where((F.col("vec_id") >= 100) & (F.col("vec_id") < 200)), 0)
    first = _rows(AI.read_vectors(spark, table))

    # batchId redelivery: marker short-circuits
    writer(emb.where((F.col("vec_id") >= 100) & (F.col("vec_id") < 200)), 0)
    assert _rows(AI.read_vectors(spark, table)) == first

    # even WITHOUT the marker: encoding is a pure function of the frozen
    # artifacts, so re-merging the same rows as a new batch is a no-op
    writer(emb.where((F.col("vec_id") >= 100) & (F.col("vec_id") < 200)), 1)
    assert _rows(AI.read_vectors(spark, table)) == first


def test_incremental_batch_touches_only_tail_shards(spark, sf_dir, tmp_path):
    """The O(touched-shards) claim: a batch of new high-vec_id vectors must
    not rewrite shards whose vec_id range it doesn't touch."""
    emb = _emb(spark, sf_dir)
    table = str(tmp_path / "ann")
    AI.build_ann_index(spark, table, emb.where(F.col("vec_id") < 300))
    root = os.path.join(AI._vectors_dir(table), "parts")
    before = {
        d: os.stat(os.path.join(root, d, "data")).st_mtime_ns
        for d in os.listdir(root)
        if not d.startswith("_")
    }
    assert "0" in before  # vec_id < 1024 → shard 0

    writer = AI.incremental_ann_writer(table)
    # synthesize a tail batch beyond every existing shard
    tail = emb.where(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 5000).alias("vec_id"), "embedding"
    )
    writer(tail, 0)
    after = {
        d: os.stat(os.path.join(root, d, "data")).st_mtime_ns
        for d in os.listdir(root)
        if not d.startswith("_")
    }
    assert set(after) == set(before) | {"4"}  # 5000 DIV 1024 = 4
    for d, m in before.items():
        assert after[d] == m, f"untouched shard {d} was rewritten"


def test_served_queries_registered_with_full_pipeline_oracles():
    assert "s24_ann_ivf_served" in registry.QUERIES
    assert "s25_ann_pq_served" in registry.QUERIES
    from spark_streaming_logservice_spark.operators.ann_ivf import _S05_ORACLE
    from spark_streaming_logservice_spark.operators.ann_pq import _S07_ORACLE

    assert registry.ORACLES["s24_ann_ivf_served"] == _S05_ORACLE
    assert registry.ORACLES["s25_ann_pq_served"] == _S07_ORACLE


def test_real_stream_drive_equals_batch_build(spark, sf_dir, tmp_path):
    """Drive the incremental encoder through an actual readStream ->
    foreachBatch query (availableNow, one file per trigger), not direct
    writer calls — the vectors store must still equal the one-shot batch
    build, and store-served search must be unchanged."""
    emb = _emb(spark, sf_dir)
    batch_t = str(tmp_path / "batch")
    AI.build_ann_index(spark, batch_t, emb)

    stream_t = str(tmp_path / "stream")
    AI.build_ann_index(spark, stream_t, emb)  # train the frozen artifacts
    import shutil

    shutil.rmtree(AI._vectors_dir(stream_t))

    src = str(tmp_path / "src")
    emb.repartition(4).write.parquet(src)
    q = (
        spark.readStream.schema("vec_id BIGINT, embedding ARRAY<DOUBLE>")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(AI.incremental_ann_writer(stream_t))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(150)
    assert _rows(AI.read_vectors(spark, stream_t)) == _rows(
        AI.read_vectors(spark, batch_t)
    )
    queries = emb.where(F.col("vec_id") < 5)
    assert _rows(AI.pq_search_from_store(spark, stream_t, queries)) == _rows(
        AI.pq_search_from_store(spark, batch_t, queries)
    )


def test_batch_cell_drift_zero_for_index_corpus_and_spikes_on_skew(
    spark, sf_dir, tmp_path
):
    """The retrain-trigger monitor: re-scoring the index's own corpus
    drifts 0.0 (same assignment expression, same distribution); a batch
    drawn from a single cell drifts hard and names that cell as the
    hottest."""
    emb = _emb(spark, sf_dir)
    table = str(tmp_path / "ann")
    AI.build_ann_index(spark, table, emb)

    same = AI.batch_cell_drift(spark, table, emb).collect()[0]
    assert same["batch_vectors"] == same["index_vectors"]
    assert same["l1_drift"] == 0.0

    # craft a skewed batch: every vector already assigned to ONE cell
    hist = AI.index_cell_histogram(spark, table).collect()
    hot = max(hist, key=lambda r: (r["n"], -r["cell"]))["cell"]
    ids = [
        r["vec_id"]
        for r in AI.read_vectors(spark, table)
        .where(F.col("cell") == hot)
        .select("vec_id")
        .collect()
    ]
    skewed = emb.where(F.col("vec_id").isin(ids))
    rep = AI.batch_cell_drift(spark, table, skewed).collect()[0]
    assert rep["top_cell"] == hot
    assert rep["top_cell_batch_share"] == 1.0
    # L1 = (1 - p_hot) + sum_{other cells} p_c = 2 * (1 - p_hot) > 0
    n_total = sum(r["n"] for r in hist)
    p_hot = dict((r["cell"], r["n"]) for r in hist)[hot] / n_total
    assert abs(rep["l1_drift"] - 2 * (1 - p_hot)) < 1e-4


def test_active_build_with_stale_toplevel_mtime_survives_eviction(tmp_path):
    """ADVICE r10 (medium): a marker-less build dir whose TOP-LEVEL mtime
    is past the grace window but whose deep encode parts are still being
    written (fresh mtimes under vectors/parts/.../data/) is an ACTIVE
    build — eviction must leave it alone. Only a tree with no write
    activity anywhere for the full grace period is a crashed leftover."""
    import time

    root = tmp_path / "annroot"
    keep = root / "store-keep"
    os.makedirs(keep)
    open(os.path.join(keep, AI._INDEX_MARKER), "w").write("[]")

    old = time.time() - AI._BUILD_GRACE_SEC - 60
    # active long build: stale skeleton, one fresh deep file
    active = root / "store-A.build-1-abc"
    deep = active / "vectors" / "parts" / "7" / "data"
    os.makedirs(deep)
    open(os.path.join(deep, "part-0.parquet"), "w").write("x")
    for d in [
        active,
        active / "vectors",
        active / "vectors" / "parts",
        active / "vectors" / "parts" / "7",
    ]:
        os.utime(d, (old, old))  # skeleton mtimes all stale
    # the deep file keeps its fresh mtime — that's the heartbeat

    # genuinely crashed build: every path stale
    crashed = root / "store-B.build-2-def"
    cdeep = crashed / "vectors" / "parts" / "3" / "data"
    os.makedirs(cdeep)
    open(os.path.join(cdeep, "part-0.parquet"), "w").write("x")
    for walk_root, dirs, files in os.walk(crashed):
        for p in [walk_root] + [os.path.join(walk_root, f) for f in files]:
            os.utime(p, (old, old))

    AI._evict_lru_stores(str(root), keep_dir=str(keep))
    assert os.path.isdir(active), "active build was reclaimed mid-build"
    assert not os.path.exists(crashed), "crashed leftover not reclaimed"


def test_serve_paths_refresh_active_lease(spark, sf_dir, tmp_path):
    """ADVICE r10: read_vectors and _load_artifacts must touch the store
    marker so an app that attached long ago but is mid-scan keeps its
    active lease (ensure_index is no longer the only refresher)."""
    table = str(tmp_path / "ann")
    AI.build_ann_index(spark, table, _emb(spark, sf_dir))
    marker = os.path.join(table, AI._INDEX_MARKER)
    open(marker, "w").write("[]")
    old = 1_000_000.0
    os.utime(marker, (old, old))
    AI.read_vectors(spark, table)
    assert os.stat(marker).st_mtime > old
    os.utime(marker, (old, old))
    AI._ARTIFACT_CACHE.clear()
    AI._load_artifacts(spark, table)
    assert os.stat(marker).st_mtime > old


def test_gated_ann_writer_blocks_drifting_batch(spark, sf_dir, tmp_path):
    """End-to-end retrain-trigger gate (VERDICT r10 item 6): an
    in-distribution batch merges exactly like the plain writer; a batch
    whose cell distribution has drifted past the threshold is alerted and
    NOT merged; replaying the alerting batch does not double-alert."""
    emb = _emb(spark, sf_dir)
    table = str(tmp_path / "ann")
    # the sf0.001 corpus is vec_id 0..499: build from the first 300,
    # stream the rest through the gate
    AI.build_ann_index(spark, table, emb.where(F.col("vec_id") < 300))
    AI._CELL_HIST_CACHE.clear()
    alerts = []
    gate = AI.gated_ann_writer(
        table,
        lambda bid, rep, df: alerts.append((bid, rep, df.count())),
        threshold=0.5,
    )
    before = AI.read_vectors(spark, table).count()

    # batch 0: same corpus distribution -> admitted and merged
    ok_batch = emb.where(
        (F.col("vec_id") >= 300) & (F.col("vec_id") < 458)
    )  # 158 rows >= the 8*K_CELLS=128 scoring floor
    gate(ok_batch, 0)
    mid = AI.read_vectors(spark, table).count()
    assert alerts == [] and mid == before + ok_batch.count()

    # batch 1: adversarial drift — every vector is the SAME direction, so
    # the whole batch lands in one cell (top_cell_batch_share 1.0); the
    # alert carries the batch itself (the recovery handle)
    drifting = emb.where(F.col("vec_id") < 200).select(
        (F.col("vec_id") + 100_000).alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.size("embedding")),
            lambda i: F.lit(1.0),
        ).alias("embedding"),
    )
    gate(drifting, 1)
    assert len(alerts) == 1 and alerts[0][0] == 1
    assert alerts[0][1]["l1_drift"] >= 0.5
    assert alerts[0][1]["top_cell_batch_share"] == 1.0
    assert alerts[0][2] == 200, "alert must hand over the quarantined rows"
    assert AI.read_vectors(spark, table).count() == mid, "drifting batch merged"
    # replay: marker short-circuits, no duplicate alert
    gate(drifting, 1)
    assert len(alerts) == 1

    # batch 2: a 10-vector in-distribution trickle — far fewer vectors
    # than populated cells, so its L1 floor exceeds any sane threshold;
    # the min_batch_vectors clamp must admit it without scoring
    trickle = emb.where(
        (F.col("vec_id") >= 458) & (F.col("vec_id") < 468)
    )
    gate(trickle, 2)
    assert len(alerts) == 1, "small in-distribution batch was quarantined"
    assert AI.read_vectors(spark, table).count() == mid + 10


def test_gate_python_l1_matches_spark_batch_cell_drift(spark, sf_dir, tmp_path):
    """The gate scores drift driver-side from cached histograms; the math
    must equal the Spark batch_cell_drift path bit-for-bit (same IEEE
    divisions, same 1e-6 half-up quantization, same top-cell tie-break)."""
    emb = _emb(spark, sf_dir)
    table = str(tmp_path / "ann")
    AI.build_ann_index(spark, table, emb.where(F.col("vec_id") < 300))
    batch = emb.where((F.col("vec_id") >= 300) & (F.col("vec_id") < 458))
    spark_rep = AI.batch_cell_drift(spark, table, batch).collect()[0].asDict()

    cents_df, cb_df, dim = AI._load_artifacts(spark, table)
    enc = AI.encode_vectors(batch, cents_df, cb_df, dim)
    bc = {
        r["cell"]: r["n"]
        for r in enc.groupBy("cell")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .collect()
    }
    pc = {
        r["cell"]: r["n"]
        for r in AI.index_cell_histogram(spark, table).collect()
    }
    py_rep = AI._l1_cell_drift(bc, pc)
    assert py_rep["batch_vectors"] == spark_rep["batch_vectors"]
    assert py_rep["index_vectors"] == spark_rep["index_vectors"]
    assert py_rep["l1_drift"] == spark_rep["l1_drift"]
    assert py_rep["top_cell"] == spark_rep["top_cell"]
    assert py_rep["top_cell_batch_share"] == spark_rep["top_cell_batch_share"]


def test_quarantine_retrain_recovery_loop(spark, sf_dir, tmp_path):
    """The recovery half of the admission gate (the gate docstring's
    recipe, now code): drifting batch -> staged durably -> retrain on the
    grown corpus -> staged rows re-ingested, markers carried over, and a
    batch drawn from the GROWN distribution is admitted where the gate's
    stale view would have spuriously quarantined it (which also proves
    the cell-histogram cache re-keys on the new artifact version)."""
    emb = _emb(spark, sf_dir)
    table = str(tmp_path / "ann")
    qdir = str(tmp_path / "quarantine")
    AI.build_ann_index(spark, table, emb.where(F.col("vec_id") < 300))
    AI._CELL_HIST_CACHE.clear()
    gate = AI.gated_ann_writer(table, AI.quarantine_stager(qdir), threshold=0.5)

    ok_batch = emb.where((F.col("vec_id") >= 300) & (F.col("vec_id") < 458))
    gate(ok_batch, 0)  # in-distribution: merged

    ones = emb.where(F.col("vec_id") < 200).select(
        (F.col("vec_id") + 100_000).alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.size("embedding")), lambda i: F.lit(1.0)
        ).alias("embedding"),
    )
    gate(ones, 1)  # adversarial drift: alerted, staged, NOT merged
    assert AI.read_vectors(spark, table).count() == 458
    assert AI.read_quarantine(spark, qdir).count() == 200
    # alert redelivery (crash before marker): restages onto itself
    AI.quarantine_stager(qdir)(1, {}, ones)
    assert AI.read_quarantine(spark, qdir).count() == 200

    n = AI.retrain_from_quarantine(spark, table, qdir)
    assert n == 200
    vecs = AI.read_vectors(spark, table)
    assert vecs.count() == 658, "staged rows re-ingested with the corpus"
    assert vecs.where(F.col("vec_id") >= 100_000).count() == 200
    assert not os.path.exists(qdir) or not os.listdir(qdir)

    # quarantined batch id replays as a no-op: markers survived the swap
    gate(ones, 1)
    assert AI.read_vectors(spark, table).count() == 658
    assert AI.read_quarantine(spark, qdir).count() == 0, "replay re-alerted"

    # a batch mirroring the GROWN distribution (proportional stride
    # sample of the new corpus under fresh ids) must now be admitted —
    # with the pre-retrain histogram (stale cache or stale artifacts) its
    # one-third ones-mass would cram into a single old cell and alert
    grown = vecs.where(F.col("vec_id") % 3 == 0).select(
        (F.col("vec_id") + 500_000).alias("vec_id"),
        F.col("emb").alias("embedding"),
    )
    assert grown.count() >= 8 * AI.K_CELLS  # above the scoring floor
    gate(grown, 2)
    assert AI.read_quarantine(spark, qdir).count() == 0, "grown-dist alerted"
    assert AI.read_vectors(spark, table).count() == 658 + grown.count()


def test_retrain_with_empty_quarantine_is_untouched_noop(
    spark, sf_dir, tmp_path
):
    emb = _emb(spark, sf_dir)
    table = str(tmp_path / "ann")
    AI.build_ann_index(spark, table, emb.where(F.col("vec_id") < 200))
    before = os.stat(os.path.join(table, "centroids", "data")).st_mtime_ns
    assert AI.retrain_from_quarantine(spark, table, str(tmp_path / "q")) == 0
    assert os.stat(os.path.join(table, "centroids", "data")).st_mtime_ns == before


def test_retrain_heals_torn_publish(spark, sf_dir, tmp_path):
    """Crash between the two publish renames leaves only <table>.retrain-old;
    the next retrain call must restore the (self-consistent) old store."""
    emb = _emb(spark, sf_dir)
    table = str(tmp_path / "ann")
    AI.build_ann_index(spark, table, emb.where(F.col("vec_id") < 200))
    os.rename(table, table + ".retrain-old")
    assert AI.retrain_from_quarantine(spark, table, str(tmp_path / "q")) == 0
    assert os.path.isdir(os.path.join(table, "centroids"))
    assert AI.read_vectors(spark, table).count() == 200
