"""Composed ingest pipeline (gate → dedup → forward): the stage ORDER is
the property under test. Quarantined rows must leave no trace in pipeline
state (so recovery re-ingest is admitted, not swallowed by the digest
store), the profile must learn only novel rows, replay must converge."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from spark_streaming_logservice_spark.streaming.ingest_pipeline import (
    clear_quarantine,
    ingest_pipeline,
    read_quarantine,
)
from spark_streaming_logservice_spark.streaming.vocab_drift import (
    read_vocab_profile,
)

SCHEMA = "doc_id BIGINT, text STRING, source STRING"

A0 = [(1, "alpha beta gamma delta", "srcA"), (2, "alpha beta gamma epsilon", "srcA")]
B0 = [(3, "one two three four", "srcB")]
A1 = [
    (11, "alpha beta gamma delta", "srcA"),   # exact dup of doc 1
    (12, "alpha gamma beta zeta", "srcA"),    # novel, same distribution
]
B1_DRIFT = [
    (13, "zzz qqq www eee", "srcB"),
    (14, "zzz qqq www rrr", "srcB"),
    (15, "zzz qqq www sss", "srcB"),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


@pytest.fixture()
def pipe(spark, tmp_path):
    root = str(tmp_path / "pipe")
    sink: list[tuple[int, list]] = []
    alerts: list[tuple[int, list]] = []

    def forward(df, batch_id):
        sink.append((batch_id, sorted(r["doc_id"] for r in df.collect())))

    def on_alert(batch_id, scores, qdf):
        alerts.append((batch_id, sorted(s["source"] for s in scores)))

    apply = ingest_pipeline(root, forward, on_alert=on_alert, threshold=1.0)
    return root, apply, sink, alerts


def _run_two_batches(spark, pipe):
    root, apply, sink, alerts = pipe
    apply(_df(spark, A0 + B0), 0)
    apply(_df(spark, A1 + B1_DRIFT), 1)
    return root, apply, sink, alerts


def test_composed_flow(spark, pipe):
    root, apply, sink, alerts = _run_two_batches(spark, pipe)
    # batch 0: everything admitted on bootstrap trust
    assert sink[0] == (0, [1, 2, 3])
    # batch 1: srcB quarantined; srcA's exact dup (11) dropped, novel 12 kept
    assert sink[1] == (1, [12])
    assert alerts == [(1, ["srcB"])]
    q = read_quarantine(spark, root, SCHEMA)
    assert sorted(r["doc_id"] for r in q.collect()) == [13, 14, 15]
    # the profile never learned the drifted vocabulary
    prof = read_vocab_profile(spark, os.path.join(root, "vocab"))
    toks = {r["token"] for r in prof.collect()}
    assert "zzz" not in toks and "alpha" in toks and "one" in toks
    # digests: 3 batch-0 rows + 1 novel batch-1 row; never the quarantined
    dig = spark.read.parquet(
        *[
            os.path.join(root, "digests", f)
            for f in os.listdir(os.path.join(root, "digests"))
            if f.endswith(".parquet")
        ]
    )
    assert dig.count() == 4


def test_replay_completed_batch_is_noop(spark, pipe):
    root, apply, sink, alerts = _run_two_batches(spark, pipe)
    snapshot = (list(sink), list(alerts))
    apply(_df(spark, A1 + B1_DRIFT), 1)  # redelivery of a COMPLETED batch
    assert (sink, alerts) == snapshot
    q = read_quarantine(spark, root, SCHEMA)
    assert q.count() == 3


def test_crash_replay_converges(spark, pipe):
    root, apply, sink, alerts = _run_two_batches(spark, pipe)
    prof_before = sorted(
        map(tuple, read_vocab_profile(spark, os.path.join(root, "vocab")).collect())
    )
    # simulate a crash AFTER all stage writes, BEFORE the pipeline marker
    os.remove(os.path.join(root, "_markers", "batch-1"))
    apply(_df(spark, A1 + B1_DRIFT), 1)
    # redelivery re-runs forward (empty now: digests already know doc 12)
    # and re-alerts the SAME flag set — the documented crash contract
    assert sink[-1] == (1, [])
    assert alerts[-1] == (1, ["srcB"])
    # state converged: profile unchanged (merge is batch-id guarded),
    # quarantine restaged onto itself, digest count unchanged
    prof_after = sorted(
        map(tuple, read_vocab_profile(spark, os.path.join(root, "vocab")).collect())
    )
    assert prof_after == prof_before
    assert read_quarantine(spark, root, SCHEMA).count() == 3
    dig = spark.read.parquet(
        *[
            os.path.join(root, "digests", f)
            for f in os.listdir(os.path.join(root, "digests"))
            if f.endswith(".parquet")
        ]
    )
    assert dig.count() == 4


def test_quarantine_reingest_is_admitted_not_swallowed(spark, pipe):
    """THE composition property: because the gate runs before dedup, the
    digest store never saw the quarantined rows — recovery re-ingest under
    a new batch id forwards ALL of them (dedup-first would forward none)."""
    root, apply, sink, alerts = _run_two_batches(spark, pipe)
    staged = read_quarantine(spark, root, SCHEMA)
    # recovery: a human accepted the new distribution; re-ingest through a
    # trust-this-batch instance (threshold above the L1 maximum of 2)
    recover = ingest_pipeline(
        root,
        lambda df, bid: sink.append((bid, sorted(r["doc_id"] for r in df.collect()))),
        threshold=2.1,
    )
    recover(staged, 2)
    assert sink[-1] == (2, [13, 14, 15])  # nothing swallowed
    assert clear_quarantine(root) == 1
    # the profile has now learned the accepted distribution, so srcB's next
    # normal batch passes the NORMAL gate
    apply(_df(spark, [(21, "zzz qqq www eee", "srcB")]), 3)
    assert sink[-1] == (3, [])  # exact dup of doc 13 -> deduped, not quarantined
    assert alerts[-1] == (1, ["srcB"])  # no new alert
    apply(_df(spark, [(22, "zzz www qqq ttt", "srcB")]), 4)
    assert sink[-1] == (4, [22])  # novel, same accepted distribution


def test_null_rows_pass_through_every_stage(spark, pipe):
    root, apply, sink, alerts = pipe
    rows = [
        (31, "alpha beta", "srcA"),
        (32, None, "srcA"),        # NULL text: undedupable pass-through
        (33, "gamma delta", None),  # NULL source: unscoreable pass-through
    ]
    apply(_df(spark, rows), 0)
    assert sink[0] == (0, [31, 32, 33])
    # NULL-source tokens never reach the profile; NULL text never digested
    prof = read_vocab_profile(spark, os.path.join(root, "vocab"))
    assert prof.where(F.col("source").isNull()).count() == 0
    dig = spark.read.parquet(
        *[
            os.path.join(root, "digests", f)
            for f in os.listdir(os.path.join(root, "digests"))
            if f.endswith(".parquet")
        ]
    )
    assert dig.count() == 2  # docs 31 and 33 only


def test_replay_reuses_recorded_decision_never_rescores(spark, pipe, monkeypatch):
    """The flag decision is durable: a crash replay reuses _flags/batch-N
    and must NOT re-score — the profile may already have merged this
    batch's novel rows, and re-scoring against that shifted profile can
    flip a clean source to flagged (quarantining already-digested rows)."""
    from spark_streaming_logservice_spark.streaming import ingest_pipeline as IP

    root, apply, sink, alerts = _run_two_batches(spark, pipe)
    os.remove(os.path.join(root, "_markers", "batch-1"))

    def boom(*a, **k):
        raise AssertionError("replay must not re-score a recorded batch")

    monkeypatch.setattr(IP, "score_and_split", boom)
    apply(_df(spark, A1 + B1_DRIFT), 1)  # crash replay
    assert alerts[-1] == (1, ["srcB"])  # decision replayed from the record


def test_legacy_prepin_store_mismatch_raises(spark, tmp_path):
    """A pre-pin-era digest store (files, no _digest_impl) resolves to
    legacy md5; pointing the pipeline at it with the xxhash default must
    raise, not silently re-pin and read md5 files with the xxhash schema."""
    import pytest as _pytest

    from spark_streaming_logservice_spark.streaming.dedup_store import (
        dedup_on_ingest,
    )

    root = str(tmp_path / "legacy")
    digest_dir = os.path.join(root, "digests")
    ingest = dedup_on_ingest(
        lambda df, bid: df.count(), digest_dir, digest_impl="md5"
    )
    ingest(_df(spark, A0), 0)
    os.remove(os.path.join(digest_dir, "_digest_impl"))  # pre-pin era
    pipe = ingest_pipeline(root, lambda df, bid: df.count())
    with _pytest.raises(ValueError, match="pinned to 'md5'"):
        pipe(_df(spark, B0), 0)


def test_shared_digest_store_namespaces_do_not_collide(spark, tmp_path):
    """The pipeline's digest appends are namespaced ('pipe') so a
    dedup_on_ingest stream (default namespace 'q') sharing the store on
    the same batch ids never makes either writer skip its append."""
    from spark_streaming_logservice_spark.streaming.dedup_store import (
        dedup_on_ingest,
    )

    root = str(tmp_path / "shared")
    digest_dir = os.path.join(root, "digests")
    ingest = dedup_on_ingest(lambda df, bid: df.count(), digest_dir)
    ingest(_df(spark, A0), 0)  # writes q-batch-0.parquet
    pipe = ingest_pipeline(root, lambda df, bid: df.count())
    pipe(_df(spark, B0), 0)  # must write pipe-batch-0.parquet, not skip
    files = sorted(
        f for f in os.listdir(digest_dir) if f.endswith(".parquet")
    )
    assert files == ["pipe-batch-0.parquet", "q-batch-0.parquet"]
    dig = spark.read.parquet(*[os.path.join(digest_dir, f) for f in files])
    assert dig.count() == len(A0) + len(B0)


def test_pipeline_through_real_stream_with_restart(spark, tmp_path):
    """The composed pipeline as it deploys: foreachBatch on a live
    Structured Streaming query, across a STOP/RESTART boundary — run 1
    bootstraps the stores, run 2 (same checkpoint) picks up only the new
    file, dedups against run 1's digests and quarantines the drifted
    source."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    root = str(tmp_path / "pipe")
    _df(spark, A0 + B0).coalesce(1).write.mode("overwrite").json(src)
    forwarded, alerts = [], []

    def start():
        return (
            spark.readStream.schema(SCHEMA)
            .json(src)
            .writeStream.foreachBatch(
                ingest_pipeline(
                    root,
                    lambda df, bid: forwarded.append(
                        (bid, sorted(r["doc_id"] for r in df.collect()))
                    ),
                    on_alert=lambda bid, scores, qdf: alerts.append(
                        (bid, sorted(s["source"] for s in scores))
                    ),
                    threshold=1.0,
                )
            )
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )

    q = start()
    q.awaitTermination(150)
    assert forwarded == [(0, [1, 2, 3])] and alerts == []

    # second deployment over the same checkpoint: only the new file
    _df(spark, A1 + B1_DRIFT).coalesce(1).write.mode("append").json(src)
    q = start()
    q.awaitTermination(150)
    assert forwarded[-1] == (1, [12])  # dup 11 dropped against run 1's digests
    assert alerts == [(1, ["srcB"])]
    assert read_quarantine(spark, root, SCHEMA).count() == 3


def test_expire_pipeline_records_keeps_replay_horizon(spark, pipe):
    """Retention prunes only bookkeeping OLDER than the keep window and
    never touches quarantine data; a pruned-away batch id would re-run on
    redelivery, so the window must cover the replay horizon — within it,
    markers still short-circuit."""
    from spark_streaming_logservice_spark.streaming.ingest_pipeline import (
        expire_pipeline_records,
    )

    root, apply, sink, alerts = _run_two_batches(spark, pipe)
    removed = expire_pipeline_records(root, keep_last=1)
    # batch-0 marker + batch-0 flag record pruned; batch-1's kept
    assert removed == 2
    assert sorted(os.listdir(os.path.join(root, "_markers"))) == ["batch-1"]
    assert sorted(os.listdir(os.path.join(root, "_flags"))) == ["batch-1.json"]
    assert read_quarantine(spark, root, SCHEMA).count() == 3  # untouched
    # batch 1 is inside the kept window: redelivery still a no-op
    snapshot = (list(sink), list(alerts))
    apply(_df(spark, A1 + B1_DRIFT), 1)
    assert (sink, alerts) == snapshot
