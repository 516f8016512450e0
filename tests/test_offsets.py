"""Offset algebra unit tests — mirrors TEST/LoghubSourceOffsetSuite.scala:48-99
and the O7/O8 validation/clamping rules."""

import pytest

from spark_streaming_logservice_spark import offsets as off


def test_parse_single_store():
    parsed = off.parse_offset_json('{"project#store":{"1":1000}}')
    assert parsed == {("project", "store"): {1: 1000}}


def test_parse_multi_store_multi_shard():
    parsed = off.parse_offset_json(
        '{"p1#s1":{"0":100,"1":200},"p2#s2":{"0":-1,"1":-2}}'
    )
    assert parsed[("p1", "s1")] == {0: 100, 1: 200}
    assert parsed[("p2", "s2")] == {0: off.LATEST, 1: off.EARLIEST}


def test_roundtrip_sorted_deterministic():
    parsed = off.parse_offset_json('{"b#y":{"1":2,"0":1},"a#x":{"0":5}}')
    assert off.offset_json(parsed) == '{"a#x":{"0":5},"b#y":{"0":1,"1":2}}'


@pytest.mark.parametrize("bad", ["[]", '{"nostore":{"0":1}}', '{"p#s":[1,2]}', "notjson"])
def test_invalid_offsets_raise(bad):
    with pytest.raises(ValueError):
        off.parse_offset_json(bad)


def test_batch_range_validation():
    off.validate_batch_range({0: off.EARLIEST}, {0: off.LATEST})
    with pytest.raises(ValueError, match="can't be 'latest'"):
        off.validate_batch_range({0: off.LATEST}, {0: off.LATEST})
    with pytest.raises(ValueError, match="can't be 'earliest'"):
        off.validate_batch_range({0: 100}, {0: off.EARLIEST})


def test_clamp():
    assert off.clamp(50, 100, 200) == 100
    assert off.clamp(500, 100, 200) == 200
    assert off.clamp(150, 100, 200) == 150
    assert off.clamp(off.EARLIEST, 100, 200) == 100
    assert off.clamp(off.LATEST, 100, 200) == 200


def test_stream_offset_ranges_new_shard_binds_earliest():
    start = off.StreamOffset({0: 10})
    end = off.StreamOffset({0: 20, 1: 5})
    assert start.ranges(end) == [(0, 10, 20), (1, 0, 5)]


def test_stream_offset_rollback_guard():
    with pytest.raises(ValueError, match="rollback"):
        off.StreamOffset({0: 10}).ranges(off.StreamOffset({0: 5}))


def test_stream_offset_json_roundtrip():
    o = off.StreamOffset({1: 7, 0: 3})
    assert o.json() == '{"0":3,"1":7}'
    assert off.StreamOffset.from_json(o.json()) == o
