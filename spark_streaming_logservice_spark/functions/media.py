"""Multimodal decode stages (north-star §2.5): real Spark plumbing, stubbed
codecs.

The image/audio libraries are not available in this container, so each
decoder body is gated behind an import-try and raises NotImplementedError
with a clear message when the codec is missing. The Spark-side contract —
Arrow-batched ``mapInPandas`` stages with declared output schemas — is real
and is what matters at scale: blobs travel once, per-batch memory is bounded,
and Catalyst can prune around the declared schema.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

IMAGE_META_SCHEMA = "doc_id bigint, width int, height int, mode string, n_bytes bigint"
AUDIO_META_SCHEMA = "doc_id bigint, n_samples bigint, sample_rate int, n_bytes bigint"
FRAME_SAMPLE_SCHEMA = "doc_id bigint, frame_idx int, frame bytes, n_bytes bigint"

try:  # pragma: no cover - not present in this container
    from PIL import Image  # type: ignore

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def decode_image_meta(df: DataFrame, blob_col: str = "blob", id_col: str = "doc_id") -> DataFrame:
    """Image decode → (width, height, mode) metadata, Arrow-batched."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not _HAS_PIL:
            raise NotImplementedError(
                "image decoding requires Pillow, which is not installed in "
                "this environment; the mapInPandas plumbing is exercised via "
                "the deterministic stand-in in operators/multimodal.py"
            )
        import io

        for pdf in it:  # pragma: no cover
            rows = []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                img = Image.open(io.BytesIO(blob))
                rows.append((doc_id, img.width, img.height, img.mode, len(blob)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "mode", "n_bytes"]
            )

    return df.select(id_col, blob_col).mapInPandas(batches, schema=IMAGE_META_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 30, blob_col: str = "blob",
                  id_col: str = "doc_id") -> DataFrame:
    """Video frame sampling — same shape: one input blob row fans out to
    multiple frame rows; declared schema keeps downstream pruning intact."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "video decoding requires av/ffmpeg, not installed here; "
            "schema/batch contract defined for deployment"
        )

    return df.select(id_col, blob_col).mapInPandas(batches, schema=FRAME_SAMPLE_SCHEMA)
