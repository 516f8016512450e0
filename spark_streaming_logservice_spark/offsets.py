"""Cursor/offset algebra for the logstore source.

Reproduces the reference's offset model (SURVEY.md §1.4, §2.3):

- External offset JSON: ``{"project#store": {"<shard>": cursorTimeSeconds}}``
  (SQL/LoghubSourceOffset.scala:75-117), sorted for determinism (:61-74).
- Sentinels: ``-1`` = latest, ``-2`` = earliest
  (SQL/LoghubOffsetRangeLimit.scala:28-31).
- Batch range validation: start can't be latest, end can't be earliest
  (SQL/LoghubSourceProvider.scala:216-248).
- Clamping a user offset into [earliest, latest] (SQL/Utils.scala:166-219).
- Streaming checkpoint offsets are per-shard sequence numbers (dense,
  monotonic) — Spark's offset log provides durability, replacing the
  reference's ZK/HDFSMetadataLog plumbing (SQL/LoghubSource.scala:59-104).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

LATEST = -1
EARLIEST = -2
SENTINELS = (LATEST, EARLIEST)


def store_key(project: str, store: str) -> str:
    return f"{project}#{store}"


def parse_store_key(key: str) -> tuple[str, str]:
    if "#" not in key:
        raise ValueError(
            f"invalid store key {key!r}; expected 'project#store' "
            '(offset JSON grammar: {"project#store":{"shardId":cursorTime}})'
        )
    project, store = key.split("#", 1)
    return project, store


def parse_offset_json(s: str) -> dict[tuple[str, str], dict[int, int]]:
    """Parse the external offset JSON into {(project, store): {shard: cursorTime}}."""
    try:
        raw = json.loads(s)
        if not isinstance(raw, dict):
            raise ValueError("not an object")
        out: dict[tuple[str, str], dict[int, int]] = {}
        for key, shards in raw.items():
            if not isinstance(shards, dict):
                raise ValueError(f"store entry {key!r} is not an object")
            out[parse_store_key(key)] = {
                int(shard): int(t) for shard, t in shards.items()
            }
        return out
    except (json.JSONDecodeError, ValueError, TypeError) as e:
        raise ValueError(
            f"failed to parse offset JSON {s!r}: {e}; expected "
            '{"project#store":{"shardId":cursorTimeSeconds, ...}, ...} '
            "with -1 = latest, -2 = earliest"
        ) from e


def offset_json(offsets: dict[tuple[str, str], dict[int, int]]) -> str:
    """Serialize deterministically (stores and shards sorted —
    SQL/LoghubSourceOffset.scala:61-74)."""
    obj = {
        store_key(p, s): {str(k): offsets[(p, s)][k] for k in sorted(offsets[(p, s)])}
        for p, s in sorted(offsets)
    }
    return json.dumps(obj, separators=(",", ":"))


def validate_batch_range(
    start: dict[int, int], end: dict[int, int]
) -> None:
    """A bounded read can't start at 'latest' nor end at 'earliest'
    (SQL/LoghubSourceProvider.scala:216-248)."""
    for shard, t in start.items():
        if t == LATEST:
            raise ValueError(
                f"starting offset for shard {shard} can't be 'latest' (-1) for a batch read"
            )
    for shard, t in end.items():
        if t == EARLIEST:
            raise ValueError(
                f"ending offset for shard {shard} can't be 'earliest' (-2) for a batch read"
            )


def clamp(cursor_time: int, earliest: int, latest: int) -> int:
    """Clamp a user cursorTime into [earliest, latest]
    (SQL/Utils.scala:166-219). Sentinels resolve to their bound."""
    if cursor_time == EARLIEST:
        return earliest
    if cursor_time == LATEST:
        return latest
    return max(earliest, min(cursor_time, latest))


@dataclass
class StreamOffset:
    """Streaming checkpoint offset: per-shard next-sequence-to-read.

    Equality is by sequence (the reference compares cursors, not times —
    SQL/LoghubSourceOffset.scala:33-50)."""

    shard_seqs: dict[int, int] = field(default_factory=dict)

    def json(self) -> str:
        return json.dumps(
            {str(k): self.shard_seqs[k] for k in sorted(self.shard_seqs)},
            separators=(",", ":"),
        )

    @classmethod
    def from_json(cls, s: str) -> "StreamOffset":
        raw = json.loads(s)
        return cls({int(k): int(v) for k, v in raw.items()})

    @classmethod
    def from_dict(cls, d: dict) -> "StreamOffset":
        return cls({int(k): int(v) for k, v in d.items()})

    def to_dict(self) -> dict[str, int]:
        return {str(k): self.shard_seqs[k] for k in sorted(self.shard_seqs)}

    def ranges(self, end: "StreamOffset") -> list[tuple[int, int, int]]:
        """(shard, start_seq, end_seq) triples for the micro-batch
        [self, end). Shards present only in ``end`` are new (split/scale-out)
        and bind at earliest = seq 0 (SQL/LoghubSource.scala:140-153)."""
        out = []
        for shard, end_seq in end.shard_seqs.items():
            start_seq = self.shard_seqs.get(shard, 0)
            if end_seq < start_seq:
                raise ValueError(
                    f"offset rollback on shard {shard}: {end_seq} < {start_seq} "
                    "(cursor-rollback guard, DS/ShardUtils.scala:13-17)"
                )
            if end_seq > start_seq:
                out.append((shard, start_seq, end_seq))
        return sorted(out)
