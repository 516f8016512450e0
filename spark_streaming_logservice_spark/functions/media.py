"""Multimodal decode stages (north-star §2.5): Arrow-batched ``mapInPandas``
stages with declared output schemas.

Real, dependency-free codecs (stdlib ``struct``/``zlib``/``wave``):
- PNG: signature + IHDR parse, and full IDAT inflate with a scanline-length
  check, so a truncated or corrupt pixel stream is rejected, not just a bad
  header. Plus a minimal grayscale-8 PNG *encoder* for fixtures/round-trips.
- GIF87a/89a: logical screen descriptor.
- JPEG: marker walk to the first SOF0/1/2 frame header.
- WAV (PCM): stdlib ``wave`` for both synthesis and decode.
- Y4M (YUV4MPEG2): full encode + decode + frame iteration — an uncompressed
  planar-YUV stream container, so REAL video frame sampling works with zero
  native deps (mono/420/422/444 subsampling).

Pillow/av remain optional upgrades behind import gates for formats beyond
these; the Spark-side contract is identical either way — blobs travel once,
per-batch memory is bounded, Catalyst prunes around the declared schema.
"""

from __future__ import annotations

import io
import struct
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

IMAGE_META_SCHEMA = (
    "doc_id bigint, format string, width int, height int, n_bytes bigint"
)
AUDIO_META_SCHEMA = (
    "doc_id bigint, n_samples bigint, sample_rate int, duration_ms bigint, n_bytes bigint"
)
FRAME_SAMPLE_SCHEMA = (
    "doc_id bigint, frame_idx int, width int, height int, frame binary"
)
FRAME_FEATURE_SCHEMA = (
    "doc_id bigint, frame_idx int, width int, height int, y_mean double"
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

try:  # pragma: no cover - optional accelerator, not present in this container
    from PIL import Image  # type: ignore  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


# --- encoders (fixture/round-trip side) ------------------------------------

def make_png(width: int, height: int, fill=None) -> bytes:
    """Minimal valid grayscale-8 PNG of the given dimensions. ``fill(i)``
    gives pixel i's luma in row-major order (so an oracle can predict pixel
    statistics in closed form); default is all-black."""

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    if fill is None:
        raw = b"".join(b"\x00" + bytes(width) for _ in range(height))  # filter 0
    else:
        raw = b"".join(
            b"\x00"
            + bytes(fill(y * width + x) & 0xFF for x in range(width))
            for y in range(height)
        )
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def make_wav(n_samples: int, sample_rate: int = 16000, fill=None) -> bytes:
    """Mono 16-bit PCM via the stdlib wave module. ``fill(i)`` gives sample
    i's signed amplitude (clamped to int16, so an oracle can predict PCM
    statistics in closed form); default is silence."""
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        if fill is None:
            w.writeframes(b"\x00\x00" * n_samples)
        else:
            w.writeframes(
                b"".join(
                    struct.pack(
                        "<h", max(-32768, min(32767, int(fill(i))))
                    )
                    for i in range(n_samples)
                )
            )
    return buf.getvalue()


_Y4M_SIG = b"YUV4MPEG2"


def _y4m_plane_sizes(width: int, height: int, colorspace: str) -> tuple[int, int]:
    """(total_frame_bytes, y_plane_bytes) for one frame of the colorspace."""
    cs = colorspace.lower()
    y = width * height
    if cs.startswith("mono"):
        return y, y
    if cs.startswith("420"):  # 420 / 420jpeg / 420mpeg2 / 420paldv
        return y + 2 * ((width // 2) * (height // 2)), y
    if cs.startswith("422"):
        return y + 2 * ((width // 2) * height), y
    if cs.startswith("444"):
        return 3 * y, y
    raise ValueError(f"unsupported Y4M colorspace C{colorspace}")


def make_y4m(
    width: int,
    height: int,
    n_frames: int,
    fps: tuple[int, int] = (25, 1),
    colorspace: str = "420jpeg",
    y_fill=None,
) -> bytes:
    """Minimal valid YUV4MPEG2 stream: header + n_frames raw planar frames.
    ``y_fill(frame_idx) -> 0..255`` sets each frame's constant luma value
    (default 0); chroma planes sit at neutral 128."""
    frame_bytes, y_bytes = _y4m_plane_sizes(width, height, colorspace)
    out = [
        b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 C%s\n"
        % (width, height, fps[0], fps[1], colorspace.encode("ascii"))
    ]
    for i in range(n_frames):
        fill = int(y_fill(i)) if y_fill is not None else 0
        out.append(b"FRAME\n")
        out.append(bytes([fill]) * y_bytes)
        out.append(b"\x80" * (frame_bytes - y_bytes))
    return b"".join(out)


def parse_y4m(blob: bytes, strict: bool = True):
    """(width, height, fps_num, fps_den, colorspace, n_frames) from a
    YUV4MPEG2 stream, walking every FRAME marker so truncated or misaligned
    frame data is rejected — or None in tolerant mode."""
    try:
        width, height, fps, cs, body = _parse_y4m_header(blob)
        n = sum(1 for _ in _iter_y4m_frames(blob, body, width, height, cs))
        return (width, height, fps[0], fps[1], cs, n)
    except Exception:
        if strict:
            raise
        return None


def _parse_y4m_header(blob: bytes):
    if not blob.startswith(_Y4M_SIG):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = blob.index(b"\n", 0, 512)  # spec: single ASCII header line
    width = height = None
    fps = (25, 1)
    cs = "420jpeg"  # spec default when no C parameter is present
    for tok in blob[len(_Y4M_SIG): nl].split():
        key, val = tok[:1], tok[1:]
        if key == b"W":
            width = int(val)
        elif key == b"H":
            height = int(val)
        elif key == b"F":
            num, den = val.split(b":")
            fps = (int(num), int(den))
        elif key == b"C":
            cs = val.decode("ascii")
    if not width or not height:
        raise ValueError("Y4M header missing W/H")
    return width, height, fps, cs, nl + 1


def _iter_y4m_frames(blob: bytes, pos: int, width: int, height: int, cs: str):
    """Yield (frame_idx, frame_bytes_memoryview); raises on a malformed or
    truncated frame so corrupt streams fail instead of silently yielding
    garbage."""
    frame_bytes, _ = _y4m_plane_sizes(width, height, cs)
    view = memoryview(blob)
    idx = 0
    while pos < len(blob):
        if blob[pos: pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at offset {pos}")
        nl = blob.index(b"\n", pos, pos + 256)  # frame params line
        start = nl + 1
        if start + frame_bytes > len(blob):
            raise ValueError("truncated Y4M frame")
        yield idx, view[start: start + frame_bytes]
        pos = start + frame_bytes
        idx += 1


def iter_y4m_frames(blob: bytes):
    """Public frame iterator: yields (frame_idx, width, height, frame_view,
    y_plane_view)."""
    width, height, _fps, cs, body = _parse_y4m_header(blob)
    _, y_bytes = _y4m_plane_sizes(width, height, cs)
    for idx, frame in _iter_y4m_frames(blob, body, width, height, cs):
        yield idx, width, height, frame, frame[:y_bytes]


# --- decoders ---------------------------------------------------------------

def parse_image(blob: bytes, validate_pixels: bool = True, strict: bool = True):
    """(format, width, height) from real container bytes; None if not a
    recognized image. PNG additionally inflates IDAT and checks the exact
    scanline byte count for grayscale-8, so corrupt pixel data fails.

    ``strict=False`` maps EVERY malformed blob (truncated header, bad zlib
    stream, contradictory dimensions) to None instead of raising — the
    invalid-record tolerance mode the Spark stage runs in, so one corrupt
    blob can never fail a whole task."""
    try:
        if blob.startswith(_PNG_SIG) and blob[12:16] == b"IHDR":
            width, height = struct.unpack(">II", blob[16:24])
            bit_depth, color_type = blob[24], blob[25]
            if validate_pixels and (bit_depth, color_type) == (8, 0):
                idat = b"".join(_png_chunks(blob, b"IDAT"))
                if len(zlib.decompress(idat)) != height * (1 + width):
                    raise ValueError("PNG pixel data does not match IHDR dimensions")
            return ("png", width, height)
        if blob[:6] in (b"GIF87a", b"GIF89a"):
            width, height = struct.unpack("<HH", blob[6:10])
            return ("gif", width, height)
        if blob[:2] == b"\xff\xd8":
            i = 2
            while i + 9 < len(blob):
                if blob[i] != 0xFF:
                    break
                # JPEG allows any number of 0xFF fill bytes before a marker
                # (ITU T.81 §B.1.1.2) — skip them, or a padded stream reads
                # marker=0xFF and misparses the real marker byte as length.
                while i + 9 < len(blob) and blob[i + 1] == 0xFF:
                    i += 1
                marker = blob[i + 1]
                if marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
                    height, width = struct.unpack(">HH", blob[i + 5: i + 9])
                    return ("jpeg", width, height)
                seg_len = struct.unpack(">H", blob[i + 2: i + 4])[0]
                i += 2 + seg_len
            return None
        return None
    except Exception:
        if strict:
            raise
        return None


def _png_chunks(blob: bytes, typ: bytes):
    i = 8
    while i + 8 <= len(blob):
        (length,) = struct.unpack(">I", blob[i: i + 4])
        if blob[i + 4: i + 8] == typ:
            yield blob[i + 8: i + 8 + length]
        i += 12 + length


def parse_wav(blob: bytes) -> tuple[int, int]:
    """(n_samples, sample_rate) via the stdlib wave reader."""
    import wave

    with wave.open(io.BytesIO(blob), "rb") as w:
        return w.getnframes(), w.getframerate()


# --- Spark stages ------------------------------------------------------------

def decode_image_meta(df: DataFrame, blob_col: str = "blob", id_col: str = "doc_id") -> DataFrame:
    """Image decode → (format, width, height) metadata, Arrow-batched.
    Container parsing is inherently per-blob Python — the honest cost of
    codec work — but it happens inside a pandas batch, bounded per batch."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [parse_image(b, strict=False) for b in pdf[blob_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "format": [m[0] if m else None for m in metas],
                    "width": pd.array(
                        [m[1] if m else None for m in metas], dtype="Int32"
                    ),
                    "height": pd.array(
                        [m[2] if m else None for m in metas], dtype="Int32"
                    ),
                    "n_bytes": pdf[blob_col].str.len().astype("int64"),
                }
            )

    return df.select(id_col, blob_col).mapInPandas(batches, schema=IMAGE_META_SCHEMA)


LUMA_STATS_SCHEMA = (
    "doc_id bigint, width int, height int, mean_luma double, "
    "min_luma int, max_luma int"
)


def decode_image_luma_stats(
    df: DataFrame, blob_col: str = "blob", id_col: str = "doc_id"
) -> DataFrame:
    """REAL pixel feature extraction: inflate the PNG's IDAT, strip the
    per-scanline filter bytes, and compute luma statistics with vectorized
    numpy over the raw pixel array — the decode/feature-extract stage of a
    multimodal pipeline, Arrow-batched (peak memory one pandas batch).
    Non-PNG / malformed blobs yield null stats instead of failing the task
    (same tolerance mode as decode_image_meta)."""
    import numpy as np

    def stats(b):
        meta = parse_image(b, strict=False)
        if not meta or meta[0] != "png":
            return None
        _, w, h = meta
        raw = zlib.decompress(b"".join(_png_chunks(b, b"IDAT")))
        arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + w)[:, 1:]
        return (w, h, float(arr.mean()), int(arr.min()), int(arr.max()))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [stats(b) for b in pdf[blob_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": pd.array(
                        [r[0] if r else None for r in rows], dtype="Int32"
                    ),
                    "height": pd.array(
                        [r[1] if r else None for r in rows], dtype="Int32"
                    ),
                    "mean_luma": pd.array(
                        [r[2] if r else None for r in rows], dtype="Float64"
                    ),
                    "min_luma": pd.array(
                        [r[3] if r else None for r in rows], dtype="Int32"
                    ),
                    "max_luma": pd.array(
                        [r[4] if r else None for r in rows], dtype="Int32"
                    ),
                }
            )

    return df.select(id_col, blob_col).mapInPandas(batches, schema=LUMA_STATS_SCHEMA)


AUDIO_STATS_SCHEMA = (
    "doc_id bigint, n_samples bigint, mean_amp double, peak_amp int, rms double"
)


def decode_audio_pcm_stats(
    df: DataFrame, blob_col: str = "blob", id_col: str = "doc_id"
) -> DataFrame:
    """REAL PCM feature extraction: decode the WAV's 16-bit mono frames and
    compute amplitude statistics (mean, peak |x|, RMS) with vectorized numpy
    — the audio leg of multimodal feature extraction, Arrow-batched. Sums
    stay far below 2^53 so float64 statistics are exact and engine-portable.
    Malformed blobs yield null stats (same tolerance as the other decoders)."""
    import wave

    import numpy as np

    def stats(b):
        try:
            with wave.open(io.BytesIO(b), "rb") as w:
                n = w.getnframes()
                raw = w.readframes(n)
            arr = np.frombuffer(raw, dtype="<i2").astype(np.float64)
            if arr.size == 0:
                return (0, 0.0, 0, 0.0)
            return (
                n,
                float(arr.mean()),
                int(np.abs(arr).max()),
                float(np.sqrt((arr * arr).mean())),
            )
        except Exception:
            return None

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [stats(b) for b in pdf[blob_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_samples": pd.array(
                        [r[0] if r else None for r in rows], dtype="Int64"
                    ),
                    "mean_amp": pd.array(
                        [r[1] if r else None for r in rows], dtype="Float64"
                    ),
                    "peak_amp": pd.array(
                        [r[2] if r else None for r in rows], dtype="Int32"
                    ),
                    "rms": pd.array(
                        [r[3] if r else None for r in rows], dtype="Float64"
                    ),
                }
            )

    return df.select(id_col, blob_col).mapInPandas(batches, schema=AUDIO_STATS_SCHEMA)


def decode_audio_meta(df: DataFrame, blob_col: str = "blob", id_col: str = "doc_id") -> DataFrame:
    """WAV decode → (n_samples, sample_rate, duration_ms), Arrow-batched."""

    def _safe(b):
        try:
            return parse_wav(b)
        except Exception:  # invalid-record tolerance: corrupt blob → nulls
            return None

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [_safe(b) for b in pdf[blob_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_samples": pd.array(
                        [m[0] if m else None for m in metas], dtype="Int64"
                    ),
                    "sample_rate": pd.array(
                        [m[1] if m else None for m in metas], dtype="Int32"
                    ),
                    "duration_ms": pd.array(
                        [m[0] * 1000 // m[1] if m and m[1] else None for m in metas],
                        dtype="Int64",
                    ),
                    "n_bytes": pdf[blob_col].str.len().astype("int64"),
                }
            )

    return df.select(id_col, blob_col).mapInPandas(batches, schema=AUDIO_META_SCHEMA)


def _sampled_frames(pdf: pd.DataFrame, every_n: int, blob_col: str, id_col: str):
    """Per-batch frame walk shared by both sampling stages: yields
    (doc_id, frame_idx, width, height, frame_view, y_view) for every
    every_n-th frame of each parseable Y4M blob. Unparseable blobs yield
    nothing (invalid-record tolerance); a compressed container (mp4/mkv)
    would route to av/ffmpeg here — not installed, so those blobs are
    skipped the same way."""
    for doc, blob in zip(pdf[id_col], pdf[blob_col]):
        try:
            frames = iter_y4m_frames(blob)
            for idx, width, height, frame, y in frames:
                if idx % every_n == 0:
                    yield int(doc), idx, width, height, frame, y
        except Exception:
            continue


def sample_frames(df: DataFrame, every_n: int = 30, blob_col: str = "blob",
                  id_col: str = "doc_id") -> DataFrame:
    """REAL video frame sampling over Y4M streams — one input blob row fans
    out to one row per every_n-th frame, raw frame bytes attached; the
    declared schema keeps downstream pruning intact. At 100 TB the fan-out
    happens where the blob lives (mapInPandas, no pre-shuffle) and peak
    memory is one Arrow batch of frames, not one video."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = list(_sampled_frames(pdf, every_n, blob_col, id_col))
            yield pd.DataFrame(
                {
                    "doc_id": pd.array([r[0] for r in rows], dtype="int64"),
                    "frame_idx": pd.array([r[1] for r in rows], dtype="int32"),
                    "width": pd.array([r[2] for r in rows], dtype="int32"),
                    "height": pd.array([r[3] for r in rows], dtype="int32"),
                    "frame": [bytes(r[4]) for r in rows],
                }
            )

    return df.select(id_col, blob_col).mapInPandas(batches, schema=FRAME_SAMPLE_SCHEMA)


def sample_frame_features(df: DataFrame, every_n: int = 30, blob_col: str = "blob",
                          id_col: str = "doc_id") -> DataFrame:
    """Frame sampling fused with luma feature extraction: emits mean
    brightness per sampled frame instead of raw bytes, so only a few doubles
    per frame ever leave the scan stage — the at-scale shape when downstream
    wants features, not pixels."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [
                (d, i, w, h, float(np.frombuffer(y, dtype=np.uint8).mean()))
                for d, i, w, h, _f, y in _sampled_frames(
                    pdf, every_n, blob_col, id_col
                )
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pd.array([r[0] for r in rows], dtype="int64"),
                    "frame_idx": pd.array([r[1] for r in rows], dtype="int32"),
                    "width": pd.array([r[2] for r in rows], dtype="int32"),
                    "height": pd.array([r[3] for r in rows], dtype="int32"),
                    "y_mean": pd.array([r[4] for r in rows], dtype="float64"),
                }
            )

    return df.select(id_col, blob_col).mapInPandas(
        batches, schema=FRAME_FEATURE_SCHEMA
    )


def make_png_from_array(arr) -> bytes:
    """Grayscale-8 PNG directly from a 2-D uint8 numpy array — the
    vectorized encoder for transform stages (make_png's per-index ``fill``
    is the closed-form fixture path; this one takes pixels that already
    exist). Scanlines use filter 0, matching make_png byte-for-byte."""
    import numpy as np

    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w = arr.shape

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    # prepend the filter-0 byte per scanline without a Python loop
    filtered = np.zeros((h, 1 + w), dtype=np.uint8)
    filtered[:, 1:] = arr
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(filtered.tobytes()))
        + chunk(b"IEND", b"")
    )


def resize_images_nn(
    df: DataFrame, factor: int = 2, blob_col: str = "blob", id_col: str = "doc_id"
) -> DataFrame:
    """Nearest-neighbor downsample of grayscale-8 PNG blobs by an integer
    factor, RE-ENCODED as PNG — a real transform stage (decode → resample →
    encode), not just feature extraction. Output keeps the blob column name
    so stages chain: resize_images_nn(...) feeds decode_image_luma_stats
    unchanged. The resample is a numpy stride slice ``arr[::f, ::f]``
    (output dims ceil(w/f) × ceil(h/f) — sample points 0, f, 2f, …), fully
    vectorized; malformed/non-PNG blobs pass through as NULL rows rather
    than failing the task. Arrow-batched; peak memory one pandas batch."""
    import numpy as np

    def resize(b):
        meta = parse_image(b, strict=False)
        if not meta or meta[0] != "png":
            return None
        _, w, h = meta
        raw = zlib.decompress(b"".join(_png_chunks(b, b"IDAT")))
        arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + w)[:, 1:]
        return make_png_from_array(arr[::factor, ::factor])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "blob": [resize(b) for b in pdf[blob_col]],
                }
            )

    return df.select(id_col, blob_col).mapInPandas(
        batches, schema=f"{id_col} bigint, {blob_col} binary"
    )


AHASH_SCHEMA = "doc_id bigint, width int, height int, hash_lo bigint, hash_hi bigint"


def decode_image_ahash(
    df: DataFrame, blob_col: str = "blob", id_col: str = "doc_id"
) -> DataFrame:
    """Perceptual average-hash over REAL decoded pixels: nearest-neighbor
    8×8 resample (sample point (i,j) = pixel ((i·w)//8, (j·h)//8)), bit k =
    (sample > mean) with k = j·8 + i row-major, split into two 32-bit
    halves so downstream Hamming arithmetic stays in signed BIGINT range in
    any engine. The 64-sample mean is sum/64 — a power-of-two division, so
    it is EXACT in float64 and the > comparison is engine-unambiguous.
    Images smaller than 8×8 (no valid resample grid) yield NULL hashes."""
    import numpy as np

    def ahash(b):
        meta = parse_image(b, strict=False)
        if not meta or meta[0] != "png":
            return None
        _, w, h = meta
        if w < 8 or h < 8:
            return (w, h, None, None)
        raw = zlib.decompress(b"".join(_png_chunks(b, b"IDAT")))
        arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + w)[:, 1:]
        ys = (np.arange(8) * h) // 8
        xs = (np.arange(8) * w) // 8
        samples = arr[np.ix_(ys, xs)].astype(np.int64)
        mean = samples.sum() / 64.0
        bits = (samples > mean).ravel()  # k = j*8 + i (row-major)
        lo = int(sum(1 << k for k in range(32) if bits[k]))
        hi = int(sum(1 << (k - 32) for k in range(32, 64) if bits[k]))
        return (w, h, lo, hi)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [ahash(b) for b in pdf[blob_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": pd.array(
                        [r[0] if r else None for r in rows], dtype="Int32"
                    ),
                    "height": pd.array(
                        [r[1] if r else None for r in rows], dtype="Int32"
                    ),
                    "hash_lo": pd.array(
                        [r[2] if r else None for r in rows], dtype="Int64"
                    ),
                    "hash_hi": pd.array(
                        [r[3] if r else None for r in rows], dtype="Int64"
                    ),
                }
            )

    return df.select(id_col, blob_col).mapInPandas(batches, schema=AHASH_SCHEMA)


SILENCE_SCHEMA = (
    "doc_id bigint, n_samples bigint, n_silent bigint, n_runs bigint, "
    "longest_run bigint"
)


def decode_audio_silence(
    df: DataFrame, threshold: int = 50, blob_col: str = "blob",
    id_col: str = "doc_id"
) -> DataFrame:
    """Silence segmentation over REAL decoded PCM: |amp| < threshold marks a
    silent sample; maximal silent runs are found with a vectorized numpy
    run-length pass INSIDE the decode stage, so per-sample data never
    leaves the scan — only 4 counters per document cross the shuffle (the
    at-scale audio-segmentation shape)."""
    import numpy as np

    def silence(b):
        try:
            n, _sr = parse_wav(b)
        except Exception:
            return None
        import wave

        with wave.open(io.BytesIO(b), "rb") as w:
            pcm = np.frombuffer(w.readframes(n), dtype="<i2").astype(np.int64)
        silent = np.abs(pcm) < threshold
        if silent.size == 0:
            return (0, 0, 0, 0)
        # run-length: boundaries where the silent flag changes
        change = np.diff(silent.astype(np.int8))
        starts = np.flatnonzero(change == 1) + 1
        ends = np.flatnonzero(change == -1) + 1
        if silent[0]:
            starts = np.concatenate(([0], starts))
        if silent[-1]:
            ends = np.concatenate((ends, [silent.size]))
        runs = ends - starts
        return (
            int(silent.size),
            int(silent.sum()),
            int(len(runs)),
            int(runs.max()) if len(runs) else 0,
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [silence(b) for b in pdf[blob_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_samples": pd.array(
                        [r[0] if r else None for r in rows], dtype="Int64"
                    ),
                    "n_silent": pd.array(
                        [r[1] if r else None for r in rows], dtype="Int64"
                    ),
                    "n_runs": pd.array(
                        [r[2] if r else None for r in rows], dtype="Int64"
                    ),
                    "longest_run": pd.array(
                        [r[3] if r else None for r in rows], dtype="Int64"
                    ),
                }
            )

    return df.select(id_col, blob_col).mapInPandas(batches, schema=SILENCE_SCHEMA)


def make_png_with_text(width: int, height: int, texts: dict[str, str],
                       fill=None) -> bytes:
    """make_png plus tEXt metadata chunks (keyword → latin-1 value), the
    PNG container's native key/value metadata (the EXIF analog) — inserted
    between IHDR and IDAT per the spec's ordering rules."""
    blob = make_png(width, height, fill=fill)

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    text_chunks = b"".join(
        chunk(b"tEXt", k.encode("latin-1") + b"\x00" + v.encode("latin-1"))
        for k, v in sorted(texts.items())
    )
    # splice after the IHDR chunk (8-byte sig + 25-byte IHDR chunk)
    head = 8 + 12 + 13
    return blob[:head] + text_chunks + blob[head:]


def parse_png_text(blob: bytes) -> dict[str, str]:
    """All tEXt keyword→value pairs from a PNG (empty dict if none or not
    a PNG)."""
    if not blob.startswith(_PNG_SIG):
        return {}
    out: dict[str, str] = {}
    for data in _png_chunks(blob, b"tEXt"):
        if b"\x00" in data:
            k, v = data.split(b"\x00", 1)
            out[k.decode("latin-1")] = v.decode("latin-1")
    return out


PNG_TEXT_SCHEMA = "doc_id bigint, n_keys int, title string, creator string"


def decode_png_text(df: DataFrame, blob_col: str = "blob",
                    id_col: str = "doc_id") -> DataFrame:
    """Container-metadata extraction stage: tEXt keyword/value pairs from
    each PNG (the 'Title'/'Author'-class metadata a curation pipeline
    filters on), Arrow-batched."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [parse_png_text(b) for b in pdf[blob_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_keys": pd.array([len(m) for m in metas], dtype="Int32"),
                    "title": [m.get("Title") for m in metas],
                    "creator": [m.get("Creator") for m in metas],
                }
            )

    return df.select(id_col, blob_col).mapInPandas(batches, schema=PNG_TEXT_SCHEMA)


RESAMPLE_STATS_SCHEMA = (
    "doc_id bigint, n_samples bigint, sample_rate int,"
    " mean_amp double, peak_amp int, rms double"
)


def downsample_audio_stats(
    df: DataFrame, factor: int, blob_col: str = "blob", id_col: str = "doc_id"
) -> DataFrame:
    """REAL audio decimation round-trip: decode 16-bit mono PCM, keep every
    ``factor``-th frame, RE-ENCODE a real WAV at rate/factor, then re-decode
    the new container and emit its statistics — the re-decode proves the
    re-encoded header/frames parse, not just that the array math ran. One
    Arrow-batched pass; per-sample data never leaves the stage."""
    import wave

    import numpy as np

    def one(b):
        try:
            with wave.open(io.BytesIO(b), "rb") as w:
                rate = w.getframerate()
                raw = w.readframes(w.getnframes())
            arr = np.frombuffer(raw, dtype="<i2")[::factor]
            out = io.BytesIO()
            with wave.open(out, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(rate // factor)
                w.writeframes(arr.astype("<i2").tobytes())
            with wave.open(io.BytesIO(out.getvalue()), "rb") as w:
                rate2 = w.getframerate()
                n2 = w.getnframes()
                raw2 = w.readframes(n2)
            a = np.frombuffer(raw2, dtype="<i2").astype(np.float64)
            if a.size == 0:
                return (0, rate2, 0.0, 0, 0.0)
            return (
                n2,
                rate2,
                float(a.mean()),
                int(np.abs(a).max()),
                float(np.sqrt((a * a).mean())),
            )
        except Exception:
            return None

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [one(b) for b in pdf[blob_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_samples": pd.array(
                        [r[0] if r else None for r in rows], dtype="Int64"
                    ),
                    "sample_rate": pd.array(
                        [r[1] if r else None for r in rows], dtype="Int32"
                    ),
                    "mean_amp": pd.array(
                        [r[2] if r else None for r in rows], dtype="Float64"
                    ),
                    "peak_amp": pd.array(
                        [r[3] if r else None for r in rows], dtype="Int32"
                    ),
                    "rms": pd.array(
                        [r[4] if r else None for r in rows], dtype="Float64"
                    ),
                }
            )

    return df.select(id_col, blob_col).mapInPandas(
        batches, schema=RESAMPLE_STATS_SCHEMA
    )


def stretch_contrast_images(
    df: DataFrame, blob_col: str = "blob", id_col: str = "doc_id"
) -> DataFrame:
    """Min-max contrast stretch of grayscale-8 PNG blobs: y' =
    floor((y−min)·255/(max−min) + 0.5) (round-half-up, matching SQL round on
    non-negative values — numpy's default rounding is banker's and would
    diverge on exact .5), re-encoded as PNG. Flat images (max == min) pass
    through unchanged. Keeps the (doc_id, blob) contract so the stats
    decoder chains unchanged."""
    import numpy as np

    def stretch(b):
        meta = parse_image(b, strict=False)
        if not meta or meta[0] != "png":
            return None
        _, w, h = meta
        raw = zlib.decompress(b"".join(_png_chunks(b, b"IDAT")))
        arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + w)[:, 1:]
        lo, hi = int(arr.min()), int(arr.max())
        if hi > lo:
            arr = np.floor(
                (arr.astype(np.float64) - lo) * 255.0 / (hi - lo) + 0.5
            ).astype(np.uint8)
        return make_png_from_array(arr)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "blob": [stretch(b) for b in pdf[blob_col]],
                }
            )

    return df.select(id_col, blob_col).mapInPandas(
        batches, schema="doc_id bigint, blob binary"
    )
