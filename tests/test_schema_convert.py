"""Converter battery + flattening unit tests, incl. error paths
(SQL/Utils.scala:101-164 semantics: nullSafeDatum, comma-stripped decimals,
unsupported sink types)."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pytest

from pyspark.sql import types as T

from spark_streaming_logservice_spark import schema as sch


def test_default_schema_shape():
    assert [f.name for f in sch.DEFAULT_SCHEMA.fields] == [
        "__logProject__", "__logStore__", "__shard__", "__time__",
        "__topic__", "__source__", "__value__", "__sequence_number__",
    ]
    assert sch.is_default_schema(sch.DEFAULT_SCHEMA)
    assert not sch.is_default_schema(T.StructType([T.StructField("x", T.StringType())]))


def test_pack_value_json_tags_prefixed():
    s = sch.pack_value_json({"msg": "1"}, {"env": "prod"})
    assert s == '{"msg":"1","__tag__:env":"prod"}'


@pytest.mark.parametrize(
    "dtype,raw,expected",
    [
        (T.IntegerType(), "42", 42),
        (T.LongType(), "9999999999", 9999999999),
        (T.DoubleType(), "2.25", 2.25),
        (T.BooleanType(), "true", True),
        (T.BooleanType(), "False", False),
        (T.DecimalType(12, 2), "1,234.56", Decimal("1234.56")),
        (T.DateType(), "2026-01-02", dt.date(2026, 1, 2)),
        (T.StringType(), "x", "x"),
    ],
)
def test_converters(dtype, raw, expected):
    assert sch.make_converter(dtype)(raw) == expected


def test_converter_null_nullable():
    assert sch.make_converter(T.IntegerType(), nullable=True)(None) is None


def test_converter_null_non_nullable_raises():
    with pytest.raises(ValueError, match="non-nullable"):
        sch.make_converter(T.IntegerType(), nullable=False)(None)


def test_converter_invalid_int_raises():
    with pytest.raises(ValueError):
        sch.make_converter(T.IntegerType())("not-a-number")


def test_converter_invalid_bool_raises():
    with pytest.raises(ValueError, match="boolean"):
        sch.make_converter(T.BooleanType())("yes")


def test_converter_unsupported_type_raises():
    with pytest.raises(TypeError, match="unsupported"):
        sch.make_converter(T.ArrayType(T.StringType()))


def test_flatten_timestamp_epoch_millis():
    ts = dt.datetime(2024, 1, 1, 0, 0, 0)
    assert sch.flatten_value("ts", T.TimestampNTZType(), ts) == "1704067200000"


def test_flatten_decimal_as_double():
    assert sch.flatten_value("d", T.DecimalType(10, 2), Decimal("1.50")) == "1.5"


def test_flatten_bool_lowercase():
    assert sch.flatten_value("b", T.BooleanType(), True) == "true"


@pytest.mark.parametrize(
    "dtype",
    [T.BinaryType(), T.ArrayType(T.IntegerType()), T.MapType(T.StringType(), T.StringType())],
)
def test_flatten_rejects_nested(dtype):
    with pytest.raises(TypeError, match="Unsupported type"):
        sch.flatten_value("x", dtype, None)
