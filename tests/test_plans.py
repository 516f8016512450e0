"""Pin the performance-critical plan properties (SURVEY.md §4): predicate
pushdown to the parquet scan, column pruning, broadcast joins for dimension
tables, map-side partial aggregation."""

from __future__ import annotations

import pytest

from spark_streaming_logservice_spark import registry
from spark_streaming_logservice_spark.plans import inspect as pi

registry.load_all()


def test_q01_pushdown_and_partial_agg(spark, sf_dir):
    df = registry.QUERIES["q01_pricing_summary"](spark, sf_dir)
    assert pi.has_pushed_filters(df), "shipdate filter must reach the parquet scan"
    assert pi.has_partial_aggregation(df), "aggregate must combine map-side"


def test_q01_column_pruning(spark, sf_dir):
    df = registry.QUERIES["q01_pricing_summary"](spark, sf_dir)
    scans = pi.read_schema_columns(df)
    assert scans, "expected at least one parquet scan"
    for cols in scans:
        assert "l_orderkey" not in cols and "l_partkey" not in cols, (
            f"q01 touches no join keys; scan must prune them, got {cols}"
        )


def test_q03_broadcasts_dimension(spark, sf_dir):
    df = registry.QUERIES["q03_shipping_priority"](spark, sf_dir)
    assert pi.uses_broadcast_join(df), "filtered customer dim must broadcast"
    assert pi.has_pushed_filters(df)


def test_q05_broadcasts_all_dims(spark, sf_dir):
    df = registry.QUERIES["q05_local_supplier_volume"](spark, sf_dir)
    assert pi.uses_broadcast_join(df)


def test_l08_selective_filter_pushdown(spark, sf_dir):
    df = registry.QUERIES["l08_projection_cast"](spark, sf_dir)
    assert pi.has_pushed_filters(df), "event_type/value filters must push down"


def test_t03_prunes_to_two_columns(spark, sf_dir):
    df = registry.QUERIES["t03_token_count"](spark, sf_dir)
    scans = pi.read_schema_columns(df)
    assert scans and all(cols <= {"doc_id", "text"} for cols in scans), scans


@pytest.mark.parametrize(
    "name", ["q01_pricing_summary", "l01_event_type_counts", "d01_exact_dedup"]
)
def test_codegen_active(spark, sf_dir, name):
    n = pi.wholestage_codegen_spans(
        lambda: registry.QUERIES[name](spark, sf_dir), spark
    )
    assert n >= 1, "whole-stage codegen missing"
