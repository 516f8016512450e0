"""tables._load_events must handle BOTH physical generations of
events.parquet: TIMESTAMP(NANOS) (early testdata — Spark's vectorized
reader rejects it, so it's read as long nanos and floor-converted) and
plain TIMESTAMP(MICROS) (current testdata — read natively). The round-5
testdata regeneration silently flipped the type and broke every
events-backed query; this pins both branches.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq

from spark_streaming_logservice_spark.tables import load_table

_TS = datetime.datetime(2024, 3, 1, 12, 30, 45, 123456)


def _write_events(tmp_path, unit: str):
    t = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array([_TS, _TS], pa.timestamp(unit)),
            "user_id": pa.array([10, 20], pa.int64()),
            "event_type": pa.array(["click", "error"], pa.string()),
            "value": pa.array([1.5, 2.5], pa.float64()),
            "props": pa.array(["{}", "{}"], pa.string()),
        }
    )
    d = tmp_path / f"sf-{unit}"
    d.mkdir()
    pq.write_table(t, str(d / "events.parquet"), use_deprecated_int96_timestamps=False)
    return str(d)


def test_loads_nanos_generation(spark, tmp_path):
    sf = _write_events(tmp_path, "ns")
    rows = load_table(spark, sf, "events").orderBy("event_id").collect()
    assert [r["event_id"] for r in rows] == [1, 2]
    assert rows[0]["ts"] == _TS  # ns floor-truncates to the same µs value
    assert dict(load_table(spark, sf, "events").dtypes)["ts"] == "timestamp_ntz"


def test_loads_micros_generation(spark, tmp_path):
    sf = _write_events(tmp_path, "us")
    rows = load_table(spark, sf, "events").orderBy("event_id").collect()
    assert rows[0]["ts"] == _TS
    assert dict(load_table(spark, sf, "events").dtypes)["ts"] == "timestamp_ntz"
