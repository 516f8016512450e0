"""Replicates the driver's correctness gate locally: run every registered
query through Spark AND its DuckDB oracle on the same parquet tables, then
compare row count + order-insensitive values (columns sorted by name)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from spark_streaming_logservice_spark import registry
from spark_streaming_logservice_spark.tables import TABLES

registry.load_all()

QUERY_NAMES = sorted(registry.QUERIES)


def _duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{os.path.join(sf_dir, t + '.parquet')}')"
        )
    return con


def _normalize(rows, columns):
    """Sort columns by name, then rows; normalize floats/timestamps so that
    representation differences don't mask value equality."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def norm_cell(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return f"{v:.9g}"
        if isinstance(v, bytes):
            return v.hex()
        return str(v)

    out = []
    for row in rows:
        out.append(tuple(norm_cell(row[i]) for i in order))
    out.sort()
    return out


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, sf_dir, name):
    fn = registry.QUERIES[name]
    sdf = fn(spark, sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    if name not in registry.ORACLES:
        # rows-only check (mirrors the driver's weaker path)
        assert len(spark_rows) >= 0
        return

    con = _duck_con(sf_dir)
    res = con.execute(registry.ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    con.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    ns, nd = _normalize(spark_rows, spark_cols), _normalize(duck_rows, duck_cols)
    mismatches = [(a, b) for a, b in zip(ns, nd) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


def test_oracle_types_are_pandas_safe(sf_dir):
    """Guard against the e07/s13 failure class: DuckDB's sum() over integer
    columns returns HUGEINT (and exact arithmetic can yield DECIMAL), which
    the driver's pandas canonicalization renders as float ("364.0") while
    Spark prints "364" — a hash mismatch on byte-identical values that the
    stringify-based parity normalizer above cannot see. Binding an oracle
    (rel.types) is plan-only, so this is a cheap whole-surface sweep; any
    HUGEINT/DECIMAL output column must be CAST in the oracle SQL."""
    # l06 deliberately exercises the reference's DecimalType converter with a
    # symmetric DECIMAL(12,2) cast on BOTH sides (log_queries.py:209,246) —
    # that case canonicalizes identically (driver-green since r1).
    allowed = {("l06_converter_battery", "c_decimal")}
    con = _duck_con(sf_dir)
    offenders = []
    for name in QUERY_NAMES:
        if name not in registry.ORACLES:
            continue
        rel = con.sql(registry.ORACLES[name])
        for col, typ in zip(rel.columns, rel.types):
            t = str(typ).upper()
            if ("HUGEINT" in t or "DECIMAL" in t) and (name, col) not in allowed:
                offenders.append((name, col, t))
    con.close()
    assert not offenders, (
        "oracle columns with pandas-unsafe DuckDB types (CAST them): "
        f"{offenders}"
    )


def test_no_ltz_timestamp_outputs(spark, sf_dir):
    """date_trunc on a TIMESTAMP_NTZ yields LTZ, and PySpark renders LTZ in
    the HOST process timezone at collect — an output that silently changes
    with the TZ env var (e07/l16 failed the TZ=America/New_York probe this
    way in r6). Every query output must be NTZ or DATE; schema-only check,
    no execution."""
    from pyspark.sql.types import TimestampType

    bad = []
    for name in QUERY_NAMES:
        for f in registry.QUERIES[name](spark, sf_dir).schema.fields:
            if isinstance(f.dataType, TimestampType):
                bad.append((name, f.name))
    assert not bad, f"host-TZ-dependent LTZ output columns: {bad}"


def test_short_documents_yield_no_shingles(spark):
    """<3-token docs must produce ZERO shingles (Spark side previously
    emitted a degenerate 1-2-token shingle the SQL oracle never builds)."""
    from pyspark.sql import functions as F

    from spark_streaming_logservice_spark.operators.dedup import _shingles3

    df = spark.createDataFrame(
        [("x",), ("foo bar",), ("a b c",)], "text STRING"
    ).select(F.size(_shingles3()).alias("n"))
    assert [r["n"] for r in df.collect()] == [0, 0, 1]
