"""Multimodal decode stages (north-star §2.5): Arrow-batched ``mapInPandas``
stages with declared output schemas.

Real, dependency-free codecs (stdlib ``struct``/``zlib``/``wave``):
- PNG: signature + IHDR parse, and full IDAT inflate with a scanline-length
  check, so a truncated or corrupt pixel stream is rejected, not just a bad
  header. Plus a minimal grayscale-8 PNG *encoder* for fixtures/round-trips.
- GIF87a/89a: logical screen descriptor.
- JPEG: marker walk to the first SOF0/1/2 frame header.
- WAV (PCM): stdlib ``wave`` for both synthesis and decode.

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
FRAME_SAMPLE_SCHEMA = "doc_id bigint, frame_idx int, frame bytes, n_bytes bigint"

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

try:  # pragma: no cover - optional accelerator, not present in this container
    from PIL import Image  # type: ignore  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


# --- encoders (fixture/round-trip side) ------------------------------------

def make_png(width: int, height: int) -> bytes:
    """Minimal valid grayscale-8 PNG of the given dimensions (black)."""

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(width) for _ in range(height))  # filter 0 rows
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def make_wav(n_samples: int, sample_rate: int = 16000) -> bytes:
    """Mono 16-bit PCM silence via the stdlib wave module."""
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(b"\x00\x00" * n_samples)
    return buf.getvalue()


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


def sample_frames(df: DataFrame, every_n: int = 30, blob_col: str = "blob",
                  id_col: str = "doc_id") -> DataFrame:
    """Video frame sampling — one input blob row fans out to multiple frame
    rows; declared schema keeps downstream pruning intact. Requires av/ffmpeg
    (not installed here); the contract is defined for deployment."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "video decoding requires av/ffmpeg, not installed here; "
            "schema/batch contract defined for deployment"
        )

    return df.select(id_col, blob_col).mapInPandas(batches, schema=FRAME_SAMPLE_SCHEMA)
