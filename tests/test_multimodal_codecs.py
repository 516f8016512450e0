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


def test_png_fill_pixels_survive_roundtrip():
    """make_png(fill=...) must place pixel i (row-major) exactly where the
    luma-stats decoder reads it back: inflate, strip scanline filter bytes,
    and compare against the independently generated array."""
    import zlib

    w, h = 7, 3
    blob = media.make_png(w, h, fill=lambda i: (i * 13) % 251)
    raw = zlib.decompress(b"".join(media._png_chunks(blob, b"IDAT")))
    pixels = [
        raw[y * (1 + w) + 1 + x] for y in range(h) for x in range(w)
    ]
    assert pixels == [(i * 13) % 251 for i in range(w * h)]
    assert all(raw[y * (1 + w)] == 0 for y in range(h))  # filter byte rows


def test_wav_fill_samples_survive_roundtrip():
    """make_wav(fill=...) must place sample i exactly where the PCM-stats
    decoder reads it back, including int16 clamping at both rails."""
    import io
    import wave

    vals = [0, 5, -7, 40000, -40000]  # last two clamp to int16 rails
    blob = media.make_wav(len(vals), fill=lambda i: vals[i])
    with wave.open(io.BytesIO(blob), "rb") as w:
        raw = w.readframes(w.getnframes())
    got = list(struct.unpack("<%dh" % len(vals), raw))
    assert got == [0, 5, -7, 32767, -32768]


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


# --- Y4M video --------------------------------------------------------------

# Hand-laid-out YUV4MPEG2 stream (2x2 C420, 2 frames) — an external byte
# layout our encoder never produced: extra header params, FRAME params line,
# non-neutral chroma.
Y4M_EXTERNAL = (
    b"YUV4MPEG2 W2 H2 F30000:1001 It A128:117 C420mpeg2 XYSCSS=420MPEG2\n"
    b"FRAME\n" + bytes([10, 20, 30, 40]) + bytes([1, 2])
    + b"FRAMEXSOMEPARAM=1\n" + bytes([50, 60, 70, 80]) + bytes([3, 4])
)


def test_parse_external_y4m():
    w, h, num, den, cs, n = media.parse_y4m(Y4M_EXTERNAL)
    assert (w, h, num, den, cs, n) == (2, 2, 30000, 1001, "420mpeg2", 2)


def test_iter_y4m_frames_external():
    frames = list(media.iter_y4m_frames(Y4M_EXTERNAL))
    assert [(i, w, h) for i, w, h, _f, _y in frames] == [(0, 2, 2), (1, 2, 2)]
    assert bytes(frames[0][4]) == bytes([10, 20, 30, 40])  # Y plane only
    assert bytes(frames[1][3]) == bytes([50, 60, 70, 80, 3, 4])  # full frame


def test_y4m_roundtrip_colorspaces():
    for cs, factor in [("mono", 1.0), ("420jpeg", 1.5), ("422", 2.0), ("444", 3.0)]:
        blob = media.make_y4m(4, 2, 3, fps=(25, 1), colorspace=cs,
                              y_fill=lambda i: i * 10)
        w, h, num, den, got_cs, n = media.parse_y4m(blob)
        assert (w, h, num, den, got_cs, n) == (4, 2, 25, 1, cs, 3)
        frames = list(media.iter_y4m_frames(blob))
        assert len(frames) == 3
        for i, _w, _h, frame, y in frames:
            assert len(frame) == int(8 * factor)
            assert bytes(y) == bytes([i * 10]) * 8


def test_y4m_corrupt_rejected():
    good = media.make_y4m(2, 2, 2)
    assert media.parse_y4m(good[:-1], strict=False) is None  # truncated frame
    assert media.parse_y4m(b"YUV4MPEG2 F25:1\nFRAME\n", strict=False) is None  # no W/H
    assert media.parse_y4m(b"not video", strict=False) is None
    bad_marker = good.replace(b"FRAME\n", b"FRUME\n", 1)
    with pytest.raises(ValueError):
        media.parse_y4m(bad_marker, strict=True)


def test_spark_frame_sampling_stage(spark):
    """sample_frames fans one blob row out to every_n-th frame rows with raw
    bytes; corrupt blobs are skipped, not fatal."""
    v1 = media.make_y4m(2, 2, 7, y_fill=lambda i: i)   # frames 0..6 -> 0,3,6
    v2 = media.make_y4m(4, 2, 2, y_fill=lambda i: 99)  # frames 0,1 -> 0
    df = spark.createDataFrame(
        [(1, v1), (2, v2), (3, b"garbage")], "doc_id LONG, blob BINARY"
    )
    rows = sorted(
        (r["doc_id"], r["frame_idx"], r["width"], r["height"], bytes(r["frame"])[0])
        for r in media.sample_frames(df, every_n=3).collect()
    )
    assert rows == [(1, 0, 2, 2, 0), (1, 3, 2, 2, 3), (1, 6, 2, 2, 6),
                    (2, 0, 4, 2, 99)]


def test_spark_frame_features_stage(spark):
    df = spark.createDataFrame(
        [(5, media.make_y4m(2, 2, 4, y_fill=lambda i: 7 * i))],
        "doc_id LONG, blob BINARY",
    )
    rows = sorted(
        (r["frame_idx"], r["y_mean"])
        for r in media.sample_frame_features(df, every_n=2).collect()
    )
    assert rows == [(0, 0.0), (2, 14.0)]


def test_make_png_from_array_matches_fill_encoder():
    """Vectorized array encoder must produce byte-identical output to the
    closed-form fill encoder for the same pixels."""
    import numpy as np

    from spark_streaming_logservice_spark.functions import media

    w, h = 13, 7
    arr = np.array([[(y * w + x) * 3 % 251 for x in range(w)] for y in range(h)],
                   dtype=np.uint8)
    via_fill = media.make_png(w, h, fill=lambda i: (i * 3) % 251)
    via_array = media.make_png_from_array(arr)
    assert via_fill == via_array


def test_resize_nn_stride_semantics():
    """2x nearest-neighbor keeps pixels at even (row, col) coordinates and
    dims become ceil(d/2) — verified by decoding the re-encoded PNG."""
    import zlib

    import numpy as np

    from spark_streaming_logservice_spark.functions import media

    w, h = 9, 5  # odd dims: ceil behavior matters
    src = np.arange(w * h, dtype=np.uint8).reshape(h, w)
    blob = media.make_png_from_array(src)
    # emulate the stage's per-blob path
    meta = media.parse_image(blob)
    assert meta == ("png", w, h)
    raw = zlib.decompress(b"".join(media._png_chunks(blob, b"IDAT")))
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + w)[:, 1:]
    small_blob = media.make_png_from_array(arr[::2, ::2])
    assert media.parse_image(small_blob) == ("png", 5, 3)
    raw2 = zlib.decompress(b"".join(media._png_chunks(small_blob, b"IDAT")))
    got = np.frombuffer(raw2, dtype=np.uint8).reshape(3, 6)[:, 1:]
    assert np.array_equal(got, src[::2, ::2])


def test_png_text_chunks_roundtrip_and_pixels_survive():
    """tEXt splice must keep the PNG decodable (pixels intact) and the
    metadata recoverable; a PNG without tEXt yields an empty dict."""
    from spark_streaming_logservice_spark.functions import media

    plain = media.make_png(5, 3, fill=lambda i: i * 7 % 251)
    assert media.parse_png_text(plain) == {}
    tagged = media.make_png_with_text(
        5, 3, {"Title": "t1", "Creator": "c1"}, fill=lambda i: i * 7 % 251
    )
    assert media.parse_png_text(tagged) == {"Title": "t1", "Creator": "c1"}
    # pixel stream still validates after the splice
    assert media.parse_image(tagged) == ("png", 5, 3)
