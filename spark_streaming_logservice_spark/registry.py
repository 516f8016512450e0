"""Query registry: the single source of truth for the correctness contract.

Every operator the engine claims (SURVEY.md §2) registers here as a
``(spark, sf_dir) -> DataFrame`` builder plus, when SQL-expressible, a DuckDB
oracle SQL string over the same parquet tables. ``__spark_entry__.py`` exposes
the registry to the driver; ``tests/test_oracle_parity.py`` replicates the
driver's comparison locally.

Column-name discipline: the driver sorts columns by name before value-hashing,
so every computed column is aliased identically in the Spark builder and the
oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query builder; ``oracle`` is DuckDB SQL over the same
    tables (omit only for genuinely non-SQL-expressible operators — the
    driver then records a weaker rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from spark_streaming_logservice_spark.operators import (  # noqa: F401
        ann_ivf,
        ann_pq,
        cdc,
        dedup,
        events2,
        graph,
        log_queries,
        multimodal,
        pipeline_ops,
        relational,
        relational2,
        semdedup,
        similarity,
        skew,
        profile,
        sketch,
        source_queries,
        sql_api,
        text,
        vocab,
    )
    from spark_streaming_logservice_spark.streaming import (  # noqa: F401
        ann_index,  # registers the served-from-store ANN queries (s24/s25)
    )
