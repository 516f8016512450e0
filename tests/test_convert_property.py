"""Property tests (hypothesis): the vectorized Arrow converter battery in
the source hot path must agree exactly with the scalar reference battery
(schema.make_converter) on wire-canonical strings — the strings
flatten_value actually produces — for every supported type. A divergence
here would mean the r2 Arrow vectorization silently changed ingest
semantics."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import types as T

from spark_streaming_logservice_spark import schema as sch
from spark_streaming_logservice_spark.sources.logstore import _BatchProjector

SETTINGS = dict(max_examples=60, deadline=None)


def _arrow_convert(strings, dtype, nullable=True):
    proj = _BatchProjector.__new__(_BatchProjector)  # _convert_str_array is self-free
    arr = pa.array(strings, pa.string())
    return proj._convert_str_array(arr, T.StructField("x", dtype, nullable)).to_pylist()


def _scalar_convert(strings, dtype, nullable=True):
    conv = sch.make_converter(dtype, nullable)
    return [conv(s) for s in strings]


@settings(**SETTINGS)
@given(st.lists(st.one_of(st.integers(-(2**63) + 1, 2**63 - 1), st.none()), max_size=20))
def test_long_agreement(vals):
    strings = [None if v is None else str(v) for v in vals]
    assert _arrow_convert(strings, T.LongType()) == _scalar_convert(strings, T.LongType())


@settings(**SETTINGS)
@given(
    st.lists(
        st.one_of(st.floats(allow_nan=False, allow_infinity=False), st.none()),
        max_size=20,
    )
)
def test_double_agreement(vals):
    strings = [None if v is None else repr(v) for v in vals]
    assert _arrow_convert(strings, T.DoubleType()) == _scalar_convert(
        strings, T.DoubleType()
    )


@settings(**SETTINGS)
@given(st.lists(st.sampled_from(["true", "false", "True", "FALSE", None]), max_size=20))
def test_bool_agreement(strings):
    assert _arrow_convert(strings, T.BooleanType()) == _scalar_convert(
        strings, T.BooleanType()
    )


@settings(**SETTINGS)
@given(
    st.lists(
        st.one_of(
            st.decimals(
                min_value=Decimal("-99999999.99"),
                max_value=Decimal("99999999.99"),
                places=2,
            ),
            st.none(),
        ),
        max_size=20,
    )
)
def test_decimal_agreement(vals):
    strings = [None if v is None else str(v) for v in vals]
    a = _arrow_convert(strings, T.DecimalType(10, 2))
    b = _scalar_convert(strings, T.DecimalType(10, 2))
    assert [(x is None, x if x is None else Decimal(x)) for x in a] == [
        (x is None, x if x is None else Decimal(x)) for x in b
    ]


@settings(**SETTINGS)
@given(
    st.lists(
        st.one_of(
            st.datetimes(
                min_value=dt.datetime(1970, 1, 2), max_value=dt.datetime(2100, 1, 1)
            ),
            st.none(),
        ),
        max_size=20,
    )
)
def test_timestamp_ntz_agreement(vals):
    strings = [None if v is None else v.isoformat() for v in vals]
    assert _arrow_convert(strings, T.TimestampNTZType()) == _scalar_convert(
        strings, T.TimestampNTZType()
    )


@settings(**SETTINGS)
@given(
    st.lists(
        st.one_of(st.dates(dt.date(1970, 1, 2), dt.date(2100, 1, 1)), st.none()),
        max_size=20,
    )
)
def test_date_agreement(vals):
    strings = [None if v is None else v.isoformat() for v in vals]
    assert _arrow_convert(strings, T.DateType()) == _scalar_convert(
        strings, T.DateType()
    )


def test_nonnullable_null_raises_both_paths():
    with pytest.raises(ValueError):
        _arrow_convert(["1", None], T.LongType(), nullable=False)
    with pytest.raises(ValueError):
        _scalar_convert(["1", None], T.LongType(), nullable=False)


def test_invalid_bool_raises_both_paths():
    with pytest.raises(ValueError):
        _arrow_convert(["yes"], T.BooleanType())
    with pytest.raises(ValueError):
        _scalar_convert(["yes"], T.BooleanType())


@settings(**SETTINGS)
@given(st.lists(st.integers(-(2**31) + 1, 2**31 - 1), max_size=20))
def test_flatten_then_convert_roundtrip(vals):
    """Sink flatten → wire string → source convert must reproduce the value
    (the full write→read loop for integral payloads)."""
    strings = [sch.flatten_value("x", T.IntegerType(), v) for v in vals]
    assert _arrow_convert(strings, T.IntegerType()) == vals


_map_entries = st.lists(
    st.tuples(
        st.text(max_size=8),  # keys: any unicode incl. quotes/controls
        st.text(max_size=12),
    ),
    max_size=5,
    unique_by=lambda kv: kv[0],  # writer never emits duplicate keys
)


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(), _map_entries),
            st.one_of(st.none(), _map_entries),
        ),
        max_size=12,
    )
)
def test_pack_value_json_arrow_agrees_with_scalar(rows):
    """The vectorized __value__ packer must be byte-identical to
    json.dumps-based pack_value_json for every payload, including keys and
    values that need JSON escaping (quote, backslash, control chars) and
    null/empty maps — those route through the per-row fallback."""
    mt = pa.map_(pa.string(), pa.string())
    contents = pa.array([c for c, _ in rows], mt)
    tags = pa.array([t for _, t in rows], mt)
    got = sch.pack_value_json_arrow(contents, tags).to_pylist()
    want = [
        sch.pack_value_json(dict(c or []), dict(t or []))
        for c, t in rows
    ]
    assert got == want
