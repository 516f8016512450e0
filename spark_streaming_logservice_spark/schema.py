"""Log-record data model: default schema, envelope columns, converter battery.

Reproduces the reference's schema system (SURVEY.md §1.2-1.3):

- Default schema: 8 string columns (SQL/LoghubSourceProvider.scala:255-274);
  the whole payload (contents + tags) is JSON-packed into ``__value__``
  (SQL/LoghubSourceRDD.scala:154-176).
- User schema: fields matched by name to content keys; ``__tag__:k`` names
  matched to tags; special envelope names populated from the envelope
  (SQL/LoghubSourceRDD.scala:178-223). Missing keys → null; unknown record
  keys silently dropped (projection at ingest).
- Converter battery: per-type string→value conversion
  (SQL/Utils.scala:101-164). In queries we use native Catalyst casts; the
  Python converters here serve the custom data source's row materialization.
"""

from __future__ import annotations

import datetime as _dt
import json
from decimal import Decimal
from typing import Any, Callable

from pyspark.sql import types as T

# Column names, default schema: SQL/LoghubSourceProvider.scala:255-262
LOG_PROJECT = "__logProject__"
LOG_STORE = "__logStore__"
SHARD = "__shard__"
TIME = "__time__"
TOPIC = "__topic__"
SOURCE = "__source__"
VALUE = "__value__"
SEQUENCE_NUMBER = "__sequence_number__"

# Special names recognized in user schemas: SQL/LoghubSourceRDD.scala:196-219
USER_PROJECT = "__project__"
USER_STORE = "__store__"
TAG_PREFIX = "__tag__:"

DEFAULT_SCHEMA = T.StructType(
    [
        T.StructField(LOG_PROJECT, T.StringType()),
        T.StructField(LOG_STORE, T.StringType()),
        T.StructField(SHARD, T.StringType()),
        T.StructField(TIME, T.StringType()),
        T.StructField(TOPIC, T.StringType()),
        T.StructField(SOURCE, T.StringType()),
        T.StructField(VALUE, T.StringType()),
        T.StructField(SEQUENCE_NUMBER, T.StringType()),
    ]
)


def is_default_schema(schema: T.StructType) -> bool:
    """Name+type comparison, mirroring isDefaultSchema
    (SQL/LoghubSourceProvider.scala:276-280)."""
    return [(f.name, f.dataType) for f in schema.fields] == [
        (f.name, f.dataType) for f in DEFAULT_SCHEMA.fields
    ]


def pack_value_json(contents: dict[str, str], tags: dict[str, str]) -> str:
    """JSON packing of a record's payload for the default schema's
    ``__value__``: contents keys verbatim, tags as ``__tag__:<k>``
    (SQL/LoghubSourceRDD.scala:154-167)."""
    obj = dict(contents)
    for k, v in tags.items():
        obj[TAG_PREFIX + k] = v
    return json.dumps(obj, separators=(",", ":"), ensure_ascii=False)


# Characters json.dumps(ensure_ascii=False) escapes: quote, backslash and
# C0 controls. Rows free of them JSON-pack by plain string concatenation.
_JSON_ESCAPE_RE = '["\\\\\\x00-\\x1f]'


def pack_value_json_arrow(contents, tags):
    """Vectorized ``__value__`` packing: one ``pyarrow.StringArray`` from two
    map<string,string> arrays, built entirely with Arrow string kernels.
    Rows whose keys/values contain a character json.dumps would escape (rare
    on the log wire) fall back to :func:`pack_value_json` individually, so
    output is byte-identical to the scalar path. Duplicate map keys can't
    occur: the sink writer assembles contents from distinct field names."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def _chunked(a):
        return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a

    contents, tags = _chunked(contents), _chunked(tags)
    n = len(contents)

    def _side(m, prefix: str):
        """(per-row joined '"k":"v"' fragments, per-row raw key+value concat)
        for one map column. A nonempty map always joins to a nonempty string
        (every entry contributes at least '"":""'), so empty-join ⟺ empty or
        null row."""
        keys = m.keys.cast(pa.string())
        vals = m.items.cast(pa.string())
        if prefix:
            keys = pc.binary_join_element_wise(pa.scalar(prefix), keys, "")
        frag = pc.binary_join_element_wise('"', keys, '":"', vals, '"', "")
        raw = pc.binary_join_element_wise(keys, vals, "")
        offsets = m.offsets
        joined = pc.binary_join(pa.ListArray.from_arrays(offsets, frag), ",")
        rawjoin = pc.binary_join(pa.ListArray.from_arrays(offsets, raw), "a")
        fill = pa.scalar("", pa.string())
        return pc.coalesce(joined, fill), pc.coalesce(rawjoin, fill)

    cjoin, craw = _side(contents, "")
    tjoin, traw = _side(tags, TAG_PREFIX)
    sep = pc.if_else(
        pc.and_(pc.not_equal(cjoin, ""), pc.not_equal(tjoin, "")),
        pa.scalar(",", pa.string()),
        pa.scalar("", pa.string()),
    )
    packed = pc.binary_join_element_wise("{", cjoin, sep, tjoin, "}", "")
    needs_escape = pc.or_(
        pc.match_substring_regex(craw, _JSON_ESCAPE_RE),
        pc.match_substring_regex(traw, _JSON_ESCAPE_RE),
    )
    if not pc.any(needs_escape).as_py():
        return packed
    idx = [i for i, f in enumerate(needs_escape.to_pylist()) if f]
    out = packed.to_pylist()
    esc_c = contents.take(pa.array(idx)).to_pylist()
    esc_t = tags.take(pa.array(idx)).to_pylist()
    for i, c, t in zip(idx, esc_c, esc_t):
        out[i] = pack_value_json(dict(c or []), dict(t or []))
    return pa.array(out, pa.string())


def _to_bool(s: str) -> bool:
    if s.lower() == "true":
        return True
    if s.lower() == "false":
        return False
    raise ValueError(f"invalid boolean string {s!r}")


def _to_ts(s: str) -> _dt.datetime:
    return _dt.datetime.fromisoformat(s)


def _to_date(s: str) -> _dt.date:
    return _dt.date.fromisoformat(s)


def make_converter(dtype: T.DataType, nullable: bool = True) -> Callable[[str | None], Any]:
    """String→Python-value converter per reference semantics
    (SQL/Utils.scala:101-164): integral/float/bool direct parse, Decimal
    strips thousands separators, timestamp/date ISO parse, null → null if
    nullable else error (nullSafeDatum, SQL/Utils.scala:152-164)."""
    conv: Callable[[str], Any]
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        conv = int
    elif isinstance(dtype, (T.FloatType, T.DoubleType)):
        conv = float
    elif isinstance(dtype, T.BooleanType):
        conv = _to_bool
    elif isinstance(dtype, T.DecimalType):
        conv = lambda s: Decimal(s.replace(",", ""))  # noqa: E731
    elif isinstance(dtype, T.TimestampType) or isinstance(dtype, T.TimestampNTZType):
        conv = _to_ts
    elif isinstance(dtype, T.DateType):
        conv = _to_date
    elif isinstance(dtype, T.StringType):
        conv = lambda s: s  # noqa: E731
    else:
        raise TypeError(f"unsupported field type for log record: {dtype}")

    def convert(s: str | None) -> Any:
        if s is None:
            if nullable:
                return None
            raise ValueError("null value for non-nullable field")
        return conv(s)

    return convert


# Sink-side flattening (SQL/Utils.scala:53-99): typed row → string KV pairs.
# Binary / Array / Map rejected (:55-57,72-77); Struct only as top-level row.
_UNSUPPORTED_SINK_TYPES = (T.BinaryType, T.ArrayType, T.MapType, T.StructType)


def flatten_value(name: str, dtype: T.DataType, v: Any) -> str | None:
    if isinstance(dtype, _UNSUPPORTED_SINK_TYPES):
        raise TypeError(
            f"Unsupported type for logstore sink field {name!r}: {dtype.simpleString()} "
            "(binary/array/map/nested-struct cannot be flattened to key/value)"
        )
    if v is None:
        return None
    if isinstance(dtype, T.DecimalType):
        # Decimal → double before stringify (SQL/Utils.scala:60-67)
        return repr(float(v))
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        # epoch millis (SQL/Utils.scala:68-69)
        epoch = v.timestamp() if v.tzinfo else v.replace(tzinfo=_dt.timezone.utc).timestamp()
        return str(int(epoch * 1000))
    if isinstance(dtype, T.DateType):
        epoch_ms = int(
            _dt.datetime(v.year, v.month, v.day, tzinfo=_dt.timezone.utc).timestamp() * 1000
        )
        return str(epoch_ms)
    if isinstance(dtype, T.BooleanType):
        return "true" if v else "false"
    return str(v)
