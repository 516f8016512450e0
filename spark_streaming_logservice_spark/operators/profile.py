"""Column profiling: per-column row/null/distinct counts and min/max.

The schema-drift / data-quality primitive every ingest pipeline runs before
training: one pass over the table produces a narrow (col_name, metrics) report.

Spark-first shape: a single ``agg`` computes all metrics for all columns at
once — exact distincts across N columns plan as one Expand (xN row
multiplication) feeding a single two-stage aggregate, so the table is
scanned ONCE regardless of column count. The 1-row wide result is unpivoted
to (column, ...) rows with ``stack`` — driver never sees the corpus.

100 TB notes: exact multi-column distinct multiplies shuffle volume by the
column count (Expand). That is the correct *exact* plan; at petabyte scale
swap ``F.count_distinct`` for ``F.approx_count_distinct`` (HLL, no Expand
blowup) — the approximate path is already exercised by l12_approx_distinct.
Min/max/null counts are plain partial aggregates (map-side combined).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_streaming_logservice_spark.registry import query


def profile_columns(df: DataFrame, columns: list[str]) -> DataFrame:
    """One-pass profile. Returns one row per column:
    (col_name, n_rows, n_null, n_distinct, min_num, max_num, min_str, max_str)
    — numeric bounds for numeric columns, string bounds for strings (the
    other pair is NULL), so the report keeps a single stable schema."""
    numeric = {
        f.name
        for f in df.schema.fields
        if f.dataType.typeName() in
        ("byte", "short", "integer", "long", "float", "double", "decimal")
    }
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in columns:
        aggs.append(F.count(F.col(c)).alias(f"nn_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"nd_{c}"))
        if c in numeric:
            aggs.append(F.round(F.min(c).cast("double"), 6).alias(f"mn_{c}"))
            aggs.append(F.round(F.max(c).cast("double"), 6).alias(f"mx_{c}"))
        else:
            aggs.append(F.min(F.col(c).cast("string")).alias(f"mn_{c}"))
            aggs.append(F.max(F.col(c).cast("string")).alias(f"mx_{c}"))
    wide = df.agg(*aggs)
    stack_args = []
    for c in columns:
        num = c in numeric
        stack_args.append(
            (
                f"'{c}', __n, __n - nn_{c}, nd_{c}, "
                + (f"mn_{c}, mx_{c}, " if num else "CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), ")
                + (f"CAST(NULL AS STRING), CAST(NULL AS STRING)" if num else f"mn_{c}, mx_{c}")
            )
        )
    expr = (
        f"stack({len(columns)}, "
        + ", ".join(stack_args)
        + ") AS (col_name, n_rows, n_null, n_distinct, min_num, max_num, min_str, max_str)"
    )
    return wide.selectExpr(expr)


def _register() -> None:
    _COLS = ["event_type", "user_id", "value", "props"]

    def _duck_col(c: str, numeric: bool) -> str:
        if numeric:
            bounds = (
                f"round(CAST(min({c}) AS DOUBLE), 6) AS min_num, "
                f"round(CAST(max({c}) AS DOUBLE), 6) AS max_num, "
                "CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str"
            )
        else:
            bounds = (
                "CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num, "
                f"min(CAST({c} AS VARCHAR)) AS min_str, max(CAST({c} AS VARCHAR)) AS max_str"
            )
        return (
            f"SELECT '{c}' AS col_name, count(*) AS n_rows, "
            f"count(*) - count({c}) AS n_null, count(DISTINCT {c}) AS n_distinct, "
            f"{bounds} FROM events"
        )

    oracle = (
        _duck_col("event_type", False)
        + " UNION ALL "
        + _duck_col("user_id", True)
        + " UNION ALL "
        + _duck_col("value", True)
        + " UNION ALL "
        + _duck_col("props", False)
        + " ORDER BY col_name"
    )

    @query("t12_column_profile", oracle=oracle)
    def t12_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
        from spark_streaming_logservice_spark.operators.text import (
            spread_rowlocal,
        )
        from spark_streaming_logservice_spark.tables import load_table

        # every aggregate here is order-insensitive (counts, exact
        # distincts, min/max), so the xN Expand is safe to parallelize
        # beyond the single-file scan partition
        ev = spread_rowlocal(load_table(spark, sf_dir, "events").select(*_COLS))
        return profile_columns(ev, _COLS).orderBy("col_name")


_register()
