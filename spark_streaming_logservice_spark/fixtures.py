"""Deterministic logstore fixtures for tests (FIXTURES.md F1/F3).

The reference tests against live 2-shard cloud stores with small integer
messages (TEST/LoghubTestUtils.scala:45-52,139-152); here the same shape is
written locally into the parquet logstore backend."""

from __future__ import annotations

from spark_streaming_logservice_spark.sources import store_backend as be


def write_messages(
    path: str,
    messages: list[str],
    shard: int = 0,
    base_time: int = 1_700_000_000,
    topic: str = "topic-a",
    source: str = "src-a",
    one_per_second: bool = True,
    tags: dict[str, str] | None = None,
) -> int:
    """Append single-column 'msg' records (F3 fixture); returns new end_seq.

    ``one_per_second`` gives each record its own time bucket so rate-limit
    tests can reason in whole seconds."""
    rows = []
    for i, m in enumerate(messages):
        rows.append(
            {
                "time": base_time + (i if one_per_second else 0),
                "topic": topic,
                "source": source,
                "contents": {"msg": m},
                "tags": dict(tags or {}),
            }
        )
    return be.append_rows(path, shard, rows)


def make_store(
    path: str, shard_messages: dict[int, list[str]], base_time: int = 1_700_000_000
) -> None:
    """Create a store with the given messages per shard (2-shard stores are
    the reference's test default)."""
    for shard, msgs in shard_messages.items():
        write_messages(path, msgs, shard=shard, base_time=base_time)
