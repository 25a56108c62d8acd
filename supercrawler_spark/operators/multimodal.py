"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
``media_type`` and metadata struct; decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` stages. The decode step is
STUBBED (no image/audio libraries ship in this sandbox — see
``_decode_image``), but the Spark-side plumbing is real and tested: schema,
partitioning, UDF signature, bounded batch shape.

At 100 TB the binary column dominates I/O: keep it in its own parquet column
(column pruning skips it unless a stage needs bytes), partition by content
bucket, and cap Arrow batch sizes (session.py) so a batch of blobs fits in
the Python worker.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, LongType, StringType, StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("media_type", StringType()),     # image/png, audio/wav, …
    StructField("payload", BinaryType()),
    StructField("meta_width", LongType()),
    StructField("meta_height", LongType()),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("media_type", StringType()),
    StructField("byte_len", LongType()),
    StructField("payload_hash", StringType()),
    StructField("feature", ArrayType(FloatType())),
])

_HAVE_PIL = False
try:  # pragma: no cover - not present in sandbox
    import PIL  # type: ignore  # noqa: F401
    _HAVE_PIL = True
except ImportError:
    pass


def _decode_image(payload: bytes):
    """Real decode requires an image library (not in this sandbox)."""
    if _HAVE_PIL:  # pragma: no cover
        import io

        from PIL import Image  # type: ignore
        return Image.open(io.BytesIO(payload))
    raise NotImplementedError(
        "image decode requires PIL/opencv — not available in this sandbox; "
        "feature extraction below uses a deterministic byte-level fake")


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in feature: byte-histogram moments. Replaces the
    model-based embedding while keeping shapes/types/partitioning real."""
    if not payload:
        return [0.0] * dim
    acc = [0] * dim
    for i, b in enumerate(payload):
        acc[i % dim] += b
    n = len(payload)
    return [round(a / n, 6) for a in acc]


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction over binary payloads (Arrow batches).
    Tries real decode, falls back to the deterministic byte-level feature."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        for pdf in batches:
            feats, hashes, lens = [], [], []
            for payload, mtype in zip(pdf["payload"], pdf["media_type"]):
                raw = bytes(payload) if payload is not None else b""
                lens.append(len(raw))
                hashes.append(hashlib.md5(raw).hexdigest())
                # image decode only for image payloads; ANY decode failure
                # (stub NotImplementedError here, UnidentifiedImageError /
                # OSError with PIL installed on corrupt bytes) falls back to
                # the deterministic fake — one bad payload must never kill
                # the whole mapInPandas stage
                if isinstance(mtype, str) and mtype.startswith("image/"):
                    try:
                        _decode_image(raw)
                    except Exception:
                        pass
                feats.append(_fake_feature(raw, dim))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "byte_len": lens,
                "payload_hash": hashes,
                "feature": feats,
            })

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: one row per requested frame index with
    deterministic offsets; the actual frame decode is the stubbed step. This
    keeps the row-explosion topology (1 video → many frames) real."""
    n_frames = (F.coalesce(F.col("meta_width"), F.lit(0)) / every_n).cast("long")
    return (media
            .filter(F.col("media_type").startswith("video/"))
            # zero planned frames ⇒ zero rows (greatest(n-1, 0) alone would
            # emit a spurious frame 0 for short/metadata-less videos)
            .filter(n_frames > 0)
            .select("media_id",
                    F.explode(F.sequence(F.lit(0), (n_frames - 1).cast("int")))
                    .alias("frame_idx"))
            .withColumn("frame_offset_ms", F.col("frame_idx") * 1000 * every_n))


def docs_as_media(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Reshape the documents table into a media table (text bytes standing in
    for opaque payloads) — used by tests/bench and the driver contract."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.when(F.col(id_col) % 3 == 0, F.lit("image/png"))
         .when(F.col(id_col) % 3 == 1, F.lit("audio/wav"))
         .otherwise(F.lit("video/mp4")).alias("media_type"),
        F.col(text_col).cast("binary").alias("payload"),
        F.length(F.col(text_col)).cast("long").alias("meta_width"),
        F.lit(None).cast("long").alias("meta_height"),
    )
