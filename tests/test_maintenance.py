"""Logstore compaction (sources/maintenance.py): same rows, same seqs,
fewer files — plus crash-recovery of the manifested swap."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from spark_streaming_logservice_spark import fixtures
from spark_streaming_logservice_spark.sources import store_backend as be
from spark_streaming_logservice_spark.sources.logstore import register
from spark_streaming_logservice_spark.sources.maintenance import (
    compact_shard,
    compact_store,
    recover_compactions,
)


def _parquet_files(path: str, shard: int) -> list[str]:
    d = be.shard_dir(path, shard)
    return sorted(f for f in os.listdir(d) if f.endswith(".parquet"))


def _snapshot(spark, path):
    df = spark.read.format("logstore").option("path", path).load()
    return sorted(
        (r["__shard__"], r["__sequence_number__"], r["__value__"])
        for r in df.collect()
    )


@pytest.fixture()
def fragmented_store(tmp_path, spark):
    register(spark)
    path = str(tmp_path / "proj" / "frags")
    for i in range(6):
        fixtures.write_messages(
            path, [f"a{i}", f"b{i}"], shard=0, base_time=1_700_000_000 + 10 * i
        )
        fixtures.write_messages(
            path, [f"c{i}"], shard=1, base_time=1_700_000_000 + 10 * i
        )
    return path


def test_compact_preserves_rows_seqs_and_bounds(spark, fragmented_store):
    path = fragmented_store
    before = _snapshot(spark, path)
    bounds_before = [be.shard_bounds(path, s) for s in (0, 1)]
    assert len(_parquet_files(path, 0)) == 6

    reports = compact_store(path)

    assert [r["compacted"] for r in reports] == [True, True]
    assert len(_parquet_files(path, 0)) == 1
    assert len(_parquet_files(path, 1)) == 1
    assert _snapshot(spark, path) == before
    assert [be.shard_bounds(path, s) for s in (0, 1)] == bounds_before
    # idempotent second run: nothing to do
    again = compact_store(path)
    assert [r["compacted"] for r in again] == [False, False]


def test_compact_splits_by_target_rows(spark, fragmented_store):
    report = compact_shard(fragmented_store, 0, target_rows=4)
    # 12 rows arriving in 2-row batches; a file closes once it reaches >=4
    # rows, so the layout lands at 3 files of 4
    assert report["files_after"] == 3
    assert report["rows"] == 12


def test_compact_sorts_overlapping_fragments(tmp_path, spark):
    register(spark)
    path = str(tmp_path / "proj" / "overlap")
    d = be.shard_dir(path, 0)
    os.makedirs(d)

    def frag(name, seqs):
        t = pa.table(
            {
                "seq": pa.array(seqs, pa.int64()),
                "time": pa.array([1_700_000_000] * len(seqs), pa.int64()),
                "topic": ["t"] * len(seqs),
                "source": ["s"] * len(seqs),
                "contents": pa.array(
                    [{"msg": str(s)} for s in seqs],
                    pa.map_(pa.string(), pa.string()),
                ),
                "tags": pa.array(
                    [{} for _ in seqs], pa.map_(pa.string(), pa.string())
                ),
            }
        ).cast(be.STORE_ARROW_SCHEMA)
        pq.write_table(t, os.path.join(d, name))

    frag("f1.parquet", [10, 30, 50])
    frag("f2.parquet", [20, 40, 60])

    report = compact_shard(path, 0)
    assert report["compacted"] and report["files_after"] == 1
    out = pq.read_table(os.path.join(d, _parquet_files(path, 0)[0]))
    assert out.column("seq").to_pylist() == [10, 20, 30, 40, 50, 60]


def test_recovery_completes_committed_swap(spark, fragmented_store):
    """Crash after the commit point (manifest visible, swap unfinished):
    recovery must publish staged files, drop old ones, and leave exactly
    one copy of every row."""
    path = fragmented_store
    before = _snapshot(spark, path)

    from spark_streaming_logservice_spark.sources import maintenance as mt

    frags = mt._fragment_stats(be.shard_dir(path, 0))
    cid = "deadbeef"
    stage = mt._staging(path, cid)
    new_files = mt._write_compacted(
        be.shard_dir(path, 0), frags, stage, mt.DEFAULT_TARGET_ROWS
    )
    manifest = {"id": cid, "shard": 0, "old": [f[0] for f in frags], "new": new_files}
    os.makedirs(mt._manifest_dir(path), exist_ok=True)
    with open(os.path.join(mt._manifest_dir(path), f"{cid}.json"), "w") as f:
        json.dump(manifest, f)
    # crash here: old files still visible, new files only staged

    assert recover_compactions(path) == 1
    assert len(_parquet_files(path, 0)) == 1
    assert _snapshot(spark, path) == before
    assert not os.path.exists(os.path.join(mt._manifest_dir(path), f"{cid}.json"))


def test_recovery_sweeps_uncommitted_staging(spark, fragmented_store):
    """Crash before the commit point: staged files without a manifest are
    swept and the store is untouched."""
    path = fragmented_store
    before = _snapshot(spark, path)

    from spark_streaming_logservice_spark.sources import maintenance as mt

    stage = mt._staging(path, "cafebabe")
    os.makedirs(stage)
    with open(os.path.join(stage, "compact-00000.parquet"), "w") as f:
        f.write("partial")

    assert recover_compactions(path) == 0
    assert not os.path.isdir(stage)
    assert len(_parquet_files(path, 0)) == 6
    assert _snapshot(spark, path) == before


def test_streaming_replay_after_compaction(tmp_path, spark):
    """A from-earliest streaming read over a compacted store must deliver
    the same records a pre-compaction read would."""
    register(spark)
    path = str(tmp_path / "proj" / "stream")
    for i in range(4):
        fixtures.write_messages(path, [f"m{3 * i}", f"m{3 * i + 1}", f"m{3 * i + 2}"],
                                shard=0, base_time=1_700_000_000 + 100 * i)
    compact_store(path)
    q = (
        spark.readStream.format("logstore")
        .schema("msg STRING")
        .option("path", path)
        .option("startingOffsets", "earliest")
        .load()
        .writeStream.format("memory")
        .queryName("compacted_replay")
        .option(
            "checkpointLocation", str(tmp_path / "ck")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r["msg"] for r in spark.sql("SELECT * FROM compacted_replay").collect())
    assert got == sorted(f"m{i}" for i in range(12))
