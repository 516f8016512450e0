"""Key-offset replication of a testdata SF directory for scale benches.

``bench.py`` measures the headliners at the driver SF and again at a
``factor``× replica to report per-query scaling curvature (is the plan
linear in the data, or is something superlinear hiding at test scale?).
Replication is key-consistent, not naive row duplication: every replica i
shifts each table's surrogate keys by ``i × (max_key + 1)`` so foreign keys
keep joining 1:1 — row counts scale by ``factor`` while join fan-outs,
group cardinalities and dedup structure scale the way a genuinely bigger
dataset would. ``region``/``nation`` stay verbatim (fixed-size dims; their
keys are never offset, so replicated customers still join their nation).

Everything runs through pyarrow so parquet physical types survive exactly —
notably ``events.ts`` stays TIMESTAMP(NANOS), which ``tables._load_events``
depends on.
"""

from __future__ import annotations

import json
import os

# table -> {column: offset_source_table}; offset unit = max(key)+1 of the
# source table, so replica i adds i*unit to that column.
_OFFSETS: dict[str, dict[str, str]] = {
    "customer": {"c_custkey": "customer"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "part": {"p_partkey": "part"},
    "supplier": {"s_suppkey": "supplier"},
    "events": {"event_id": "events", "user_id": "events:user_id"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
_KEY_COLUMN = {
    "customer": "c_custkey",
    "orders": "o_orderkey",
    "part": "p_partkey",
    "supplier": "s_suppkey",
    "events": "event_id",
    "events:user_id": "user_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}
_COPY_TABLES = ("region", "nation")


def make_scaled(src_dir: str, dst_dir: str, factor: int = 10) -> str:
    """Materialize ``factor``× replicas of ``src_dir`` under ``dst_dir``
    (idempotent: a marker records src/factor, matching runs return
    immediately). Returns ``dst_dir``."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    marker = os.path.join(dst_dir, "_SCALED_OK.json")
    want = {"src": os.path.abspath(src_dir), "factor": factor}
    if os.path.exists(marker):
        try:
            with open(marker) as f:
                if json.load(f) == want:
                    return dst_dir
        except (OSError, ValueError):
            pass
    os.makedirs(dst_dir, exist_ok=True)

    units: dict[str, int] = {}
    for src_name, key in _KEY_COLUMN.items():
        table = src_name.split(":", 1)[0]
        path = os.path.join(src_dir, f"{table}.parquet")
        col = pq.read_table(path, columns=[key]).column(key)
        units[src_name] = pc.max(col).as_py() + 1

    for name in _COPY_TABLES:
        tbl = pq.read_table(os.path.join(src_dir, f"{name}.parquet"))
        pq.write_table(tbl, os.path.join(dst_dir, f"{name}.parquet"))

    for name, offsets in _OFFSETS.items():
        tbl = pq.read_table(os.path.join(src_dir, f"{name}.parquet"))
        replicas = [tbl]
        for i in range(1, factor):
            cols = []
            for field in tbl.schema.names:
                col = tbl.column(field)
                if field in offsets:
                    shift = i * units[offsets[field]]
                    col = pc.add(col, pa.scalar(shift, col.type))
                cols.append(col)
            replicas.append(pa.table(dict(zip(tbl.schema.names, cols))))
        out = pa.concat_tables(replicas)
        # keep physical types bit-identical to the source (version 2.6
        # preserves TIMESTAMP(NANOS); don't let the writer coerce)
        pq.write_table(
            out,
            os.path.join(dst_dir, f"{name}.parquet"),
            version="2.6",
            coerce_timestamps=None,
            row_group_size=1 << 20,
        )

    with open(marker, "w") as f:
        json.dump(want, f)
    return dst_dir
