"""Real-codec tests for functions/media.py: decoders validated against
externally-produced bytes (not just our own encoder), corrupt data rejected,
and the Spark round-trip queries hash-checked in test_oracle_parity.py."""

from __future__ import annotations

import base64
import struct

import pytest

from spark_streaming_logservice_spark.functions import media

# Canonical 1x1 transparent PNG (RGBA), produced by standard encoders — an
# external reference our own make_png never emits (color type 6).
PNG_1X1_B64 = (
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNkYPhf"
    "DwAChwGA60e6kgAAAABJRU5ErkJggg=="
)


def test_parse_external_png():
    fmt, w, h = media.parse_image(base64.b64decode(PNG_1X1_B64))
    assert (fmt, w, h) == ("png", 1, 1)


def test_parse_gif_header():
    blob = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 10
    assert media.parse_image(blob) == ("gif", 320, 200)


def test_parse_jpeg_sof():
    # SOI, APP0 (16 bytes), SOF0 with height=120 width=80
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(
        ">HH", 120, 80
    ) + b"\x01\x11\x00"
    assert media.parse_image(b"\xff\xd8" + app0 + sof0) == ("jpeg", 80, 120)


def test_parse_jpeg_skips_fill_bytes():
    """JPEG permits runs of 0xFF fill bytes before any marker (T.81
    §B.1.1.2); the walk must skip them instead of reading marker=0xFF and
    misparsing the real marker byte as a segment length."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(
        ">HH", 120, 80
    ) + b"\x01\x11\x00"
    padded = b"\xff\xd8" + b"\xff" * 4 + app0 + b"\xff\xff" + sof0
    assert media.parse_image(padded) == ("jpeg", 80, 120)


def test_png_roundtrip_and_pixel_validation():
    blob = media.make_png(17, 5)
    assert media.parse_image(blob) == ("png", 17, 5)
    # corrupt the IHDR dimensions: pixel-stream length no longer matches
    bad = bytearray(blob)
    struct.pack_into(">I", bad, 16, 999)  # claim width=999
    with pytest.raises(Exception):
        media.parse_image(bytes(bad))


def test_non_image_returns_none():
    assert media.parse_image(b"plain text, not an image") is None


def test_wav_roundtrip():
    blob = media.make_wav(480, sample_rate=16000)
    assert media.parse_wav(blob) == (480, 16000)


def test_spark_image_decode_stage(spark):
    df = spark.createDataFrame(
        [(1, media.make_png(3, 2)), (2, media.make_png(64, 48))],
        "doc_id LONG, blob BINARY",
    )
    rows = {r["doc_id"]: r for r in media.decode_image_meta(df).collect()}
    assert (rows[1]["format"], rows[1]["width"], rows[1]["height"]) == ("png", 3, 2)
    assert (rows[2]["width"], rows[2]["height"]) == (64, 48)
    assert rows[1]["n_bytes"] == len(media.make_png(3, 2))


def test_spark_audio_decode_stage(spark):
    df = spark.createDataFrame(
        [(7, media.make_wav(1600))], "doc_id LONG, blob BINARY"
    )
    r = media.decode_audio_meta(df).collect()[0]
    assert (r["n_samples"], r["sample_rate"], r["duration_ms"]) == (1600, 16000, 100)


def test_truncated_blobs_tolerated_not_strict():
    """strict=False maps malformed containers to None (invalid-record
    tolerance); strict=True raises for the corrupt-pixel case."""
    truncated_png = base64.b64decode(PNG_1X1_B64)[:20]  # sig + partial IHDR
    assert media.parse_image(truncated_png, strict=False) is None
    with pytest.raises(Exception):
        media.parse_image(truncated_png, strict=True)
    assert media.parse_image(b"GIF89a\x01", strict=False) is None


def test_spark_decode_stage_survives_corrupt_blob(spark):
    """One corrupt blob must yield a null row, never fail the task."""
    good = media.make_png(4, 3)
    bad = base64.b64decode(PNG_1X1_B64)[:20]
    df = spark.createDataFrame(
        [(1, good), (2, bad), (3, b"not an image")], "doc_id LONG, blob BINARY"
    )
    rows = {r["doc_id"]: r for r in media.decode_image_meta(df).collect()}
    assert (rows[1]["format"], rows[1]["width"], rows[1]["height"]) == ("png", 4, 3)
    assert rows[2]["format"] is None and rows[2]["width"] is None
    assert rows[3]["format"] is None


def test_spark_audio_stage_survives_corrupt_blob(spark):
    df = spark.createDataFrame(
        [(1, media.make_wav(100)), (2, b"RIFFgarbage")], "doc_id LONG, blob BINARY"
    )
    rows = {r["doc_id"]: r for r in media.decode_audio_meta(df).collect()}
    assert rows[1]["n_samples"] == 100
    assert rows[2]["n_samples"] is None
