"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` exposes
every implemented operator from SURVEY.md §2 as (spark, sf_dir) -> DataFrame;
``oracle_sql()`` gives the DuckDB-equivalent SQL for each. The registry lives
in ``spark_streaming_logservice_spark.registry`` and is populated by the
operator modules.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Importable regardless of the harness's cwd: the package lives next to
# this file.
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from spark_streaming_logservice_spark import registry  # noqa: E402

registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from spark_streaming_logservice_spark.operators.relational import (
        q05_local_supplier_volume,
    )
    from spark_streaming_logservice_spark.shipping import ensure_executor_package

    ensure_executor_package(spark)
    return q05_local_supplier_volume(spark, "/root/testdata/sf0.001")


def _shipped(fn: Callable[[SparkSession, str], DataFrame]):
    """Python stages (mapInPandas etc.) need the package on executor workers;
    ship it lazily on first use of any query."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        from spark_streaming_logservice_spark.shipping import ensure_executor_package

        ensure_executor_package(spark)
        return fn(spark, sf_dir)

    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _shipped(fn) for name, fn in registry.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return dict(registry.ORACLES)
