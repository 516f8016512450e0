"""Segment compaction for the logstore shard files: small append segments
merge into ~target-size files with rows and seq addressing byte-identical,
oversized files untouched (hardlinked, never copied), and every crash point
of the directory-swap commit heals — including from the reader side
(list_shards self-heals a torn swap)."""

from __future__ import annotations

import os
import shutil

from spark_streaming_logservice_spark.sources import store_backend as SB


def _rows(n, base, t0=1_700_000_000):
    return [
        {
            "time": t0 + base + i,
            "topic": "t",
            "source": "s",
            "contents": {"k": str(base + i)},
            "tags": {},
        }
        for i in range(n)
    ]


def _snapshot(path, shard):
    # read_rows order follows file listing order (readers address by the
    # seq column, not row order) — normalize on seq for comparison
    return sorted(
        SB.read_rows(path, shard, *SB.shard_bounds(path, shard)),
        key=lambda r: r["seq"],
    )


def test_compaction_preserves_rows_and_addressing(tmp_path):
    path = str(tmp_path / "store")
    for b in range(8):  # 8 small segments
        SB.append_rows(path, 0, _rows(10, b * 10))
    before = _snapshot(path, 0)
    bounds = SB.shard_bounds(path, 0)
    seq_probe = SB.seq_for_time(path, 0, 1_700_000_035)

    stats = SB.compact_shard(path, 0, target_bytes=1 << 30)
    assert stats["files_before"] == 8 and stats["files_after"] == 1
    assert stats["bins"] == 1

    assert _snapshot(path, 0) == before
    assert SB.shard_bounds(path, 0) == bounds
    assert SB.seq_for_time(path, 0, 1_700_000_035) == seq_probe
    d = SB.shard_dir(path, 0)
    assert len([f for f in os.listdir(d) if f.endswith(".parquet")]) == 1


def test_oversized_files_hardlinked_not_copied(tmp_path):
    path = str(tmp_path / "store")
    SB.append_rows(path, 0, _rows(500, 0))  # big segment
    d = SB.shard_dir(path, 0)
    big = [f for f in os.listdir(d) if f.endswith(".parquet")][0]
    big_size = os.path.getsize(os.path.join(d, big))
    big_ino = os.stat(os.path.join(d, big)).st_ino
    for b in range(4):  # then small ones
        SB.append_rows(path, 0, _rows(2, 500 + b * 2))
    before = _snapshot(path, 0)

    # target sized so the big file exceeds it alone -> singleton, untouched
    stats = SB.compact_shard(path, 0, target_bytes=big_size)
    assert stats["bins"] == 1  # only the 4 small ones merged
    assert _snapshot(path, 0) == before
    # same inode => hardlink survived the swap, no byte was copied
    assert os.stat(os.path.join(SB.shard_dir(path, 0), big)).st_ino == big_ino


def test_noop_when_nothing_to_merge(tmp_path):
    path = str(tmp_path / "store")
    SB.append_rows(path, 0, _rows(10, 0))
    stats = SB.compact_shard(path, 0)
    assert stats["bins"] == 0 and stats["files_before"] == stats["files_after"] == 1


def test_crash_between_renames_heals_forward(tmp_path):
    path = str(tmp_path / "store")
    for b in range(4):
        SB.append_rows(path, 0, _rows(5, b * 5))
    before = _snapshot(path, 0)
    d = SB.shard_dir(path, 0)

    # build the .new layout exactly as compact_shard would, then simulate a
    # crash after the FIRST rename (shard dir gone, .new complete)
    import pyarrow as pa
    import pyarrow.parquet as pq

    files = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
    tbl = pa.concat_tables(
        [pq.read_table(os.path.join(d, f), schema=SB.STORE_ARROW_SCHEMA) for f in files]
    )
    os.makedirs(d + ".new")
    pq.write_table(tbl, os.path.join(d + ".new", "part-compact-x.parquet"))
    os.rename(d, d + ".old")

    # reader side self-heals: list_shards sees the torn swap and promotes
    assert SB.list_shards(path) == [0]
    assert not os.path.exists(d + ".new") and not os.path.exists(d + ".old")
    assert _snapshot(path, 0) == before


def test_crash_before_rename_discards_halfbuilt(tmp_path):
    path = str(tmp_path / "store")
    for b in range(3):
        SB.append_rows(path, 0, _rows(5, b * 5))
    before = _snapshot(path, 0)
    d = SB.shard_dir(path, 0)
    os.makedirs(d + ".new")  # half-built layout, shard dir intact
    with open(os.path.join(d + ".new", "junk"), "w") as f:
        f.write("x")
    assert SB.heal_shard_swaps(os.path.dirname(d)) == 1
    assert not os.path.exists(d + ".new")
    assert _snapshot(path, 0) == before


def test_compact_store_all_shards_and_rerun_idempotent(tmp_path):
    path = str(tmp_path / "store")
    for shard in (0, 1):
        for b in range(5):
            SB.append_rows(path, shard, _rows(4, b * 4))
    snaps = {s: _snapshot(path, s) for s in (0, 1)}
    stats = SB.compact_store(path, target_bytes=1 << 30)
    assert stats["files_before"] == 10 and stats["files_after"] == 2
    for s in (0, 1):
        assert _snapshot(path, s) == snaps[s]
    again = SB.compact_store(path, target_bytes=1 << 30)
    assert again["bins"] == 0  # already compact — rerun is a no-op


def test_streaming_source_reads_across_compaction(tmp_path, spark):
    """A batch read over the logstore sees identical rows before and after
    compaction (the DSv2 reader addresses by seq, not by file)."""
    path = str(tmp_path / "store")
    for b in range(6):
        SB.append_rows(path, 0, _rows(6, b * 6))
    from spark_streaming_logservice_spark.sources.logstore import (
        LogstoreDataSource,
    )

    spark.dataSource.register(LogstoreDataSource)
    load = lambda: sorted(
        (r["__sequence_number__"], r["__value__"])
        for r in spark.read.format("logstore")
        .option("path", path)
        .option("schema", "k STRING")
        .load()
        .collect()
    )
    before = load()
    SB.compact_shard(path, 0, target_bytes=1 << 30)
    assert load() == before and len(before) == 36
