"""Multimodal (image/audio/video) columns for training-data pipelines
[EXT] (SURVEY.md §2.10).

Media assets are opaque ``binary`` payloads plus a typed metadata struct —
the layout that scales: payload bytes stay columnar in parquet (no
per-row Python until a UDF genuinely needs the bytes), metadata is
pushdown-filterable, and every transform is an Arrow-batched
``mapInPandas`` over a bounded number of rows per batch.

Decode reality in this build environment (no PIL/opencv/librosa):

* **Audio** is REAL: PCM16 decoding needs only numpy (``frombuffer``),
  so :func:`audio_features` computes true RMS/duration/peak.
* **Image decode is a STUB** — :func:`decode_image` raises
  ``NotImplementedError`` unless ``fake=True``, which substitutes a
  deterministic md5-seeded pixel array so the downstream plumbing
  (schemas, batch shapes, histogram features, resize) is fully
  exercised.  Swapping in PIL later changes ONE function.
* **Video** is modeled as metadata-only frame sampling (frame offsets
  into the payload) — the partition/explode plumbing is real.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "MEDIA_META_SCHEMA",
    "MEDIA_SCHEMA",
    "synthesize_media_assets",
    "decode_image",
    "image_features",
    "resize_images",
    "audio_features",
    "sample_video_frames",
]

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_type", StringType()),  # image | audio | video
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("data", BinaryType()),
        StructField("meta", MEDIA_META_SCHEMA),
    ]
)


def synthesize_media_assets(docs: DataFrame) -> DataFrame:
    """Deterministic fake assets from the documents table (test corpus):
    payload = text bytes cycled; media_type rotates image/audio/video.
    Real pipelines would read parquet/webdataset with identical schema."""
    t = F.col("doc_id") % 3
    payload = F.encode(F.col("text"), "UTF-8")
    meta = F.struct(
        F.when(t == 0, "image").when(t == 1, "audio").otherwise("video").alias("media_type"),
        F.when(t == 0, "fake-rgb").when(t == 1, "pcm16").otherwise("fake-frames").alias("format"),
        F.when(t == 0, (F.col("doc_id") % 8 + 4) * 4).otherwise(F.lit(None)).cast("int").alias("width"),
        F.when(t == 0, (F.col("doc_id") % 6 + 3) * 4).otherwise(F.lit(None)).cast("int").alias("height"),
        F.when(t == 1, 16000).otherwise(F.lit(None)).cast("int").alias("sample_rate"),
        F.when(t == 2, F.col("doc_id") % 50 + 10).otherwise(F.lit(None)).cast("int").alias("n_frames"),
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"), payload.alias("data"), meta.alias("meta")
    )


def decode_image(data: bytes, width: int, height: int, *, fake: bool = False) -> np.ndarray:
    """Decode an image payload to an (H, W, 3) uint8 array.

    STUB: real decoding requires PIL/opencv, absent from this build
    environment.  ``fake=True`` produces a deterministic md5-seeded
    array with the correct shape/dtype so downstream feature plumbing is
    fully testable; the default raises to make the stub impossible to
    mistake for a real decoder."""
    if not fake:
        raise NotImplementedError(
            "real image decode needs PIL/opencv (not in build env); "
            "pass fake=True for the deterministic test decoder"
        )
    n = width * height * 3
    seed = hashlib.md5(bytes(data or b"")).digest()
    reps = n // len(seed) + 1
    buf = (seed * reps)[:n]
    return np.frombuffer(buf, dtype=np.uint8).reshape(height, width, 3)


IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_rgb", ArrayType(DoubleType())),
        StructField("histogram", ArrayType(FloatType())),
    ]
)


def image_features(assets: DataFrame, *, bins: int = 16) -> DataFrame:
    """Per-image mean-RGB + luminance histogram via ``mapInPandas``.

    Batches stream through Arrow (no whole-partition materialization);
    only image-typed rows reach Python thanks to the pushed-down filter."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                w, h = int(row["width"]), int(row["height"])
                img = decode_image(row["data"], w, h, fake=True)
                lum = img.mean(axis=2)
                hist, _ = np.histogram(lum, bins=bins, range=(0, 255))
                hist = hist.astype(np.float32)
                hist /= max(hist.sum(), 1.0)
                out.append(
                    {
                        "asset_id": row["asset_id"],
                        "width": w,
                        "height": h,
                        "mean_rgb": img.reshape(-1, 3).mean(axis=0).tolist(),
                        "histogram": hist.tolist(),
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in IMAGE_FEATURES_SCHEMA])

    images = assets.filter(F.col("meta.media_type") == "image").select(
        "asset_id", "data", F.col("meta.width").alias("width"), F.col("meta.height").alias("height")
    )
    return images.mapInPandas(extract, IMAGE_FEATURES_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("data", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def resize_images(assets: DataFrame, *, width: int, height: int) -> DataFrame:
    """Nearest-neighbor resize of the (fake-)decoded pixels — the exact
    plumbing a PIL-backed resize would use: decode → transform →
    re-encode bytes, one Arrow batch at a time."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                img = decode_image(
                    row["data"], int(row["width"]), int(row["height"]), fake=True
                )
                ys = (np.arange(height) * img.shape[0] // height).clip(0, img.shape[0] - 1)
                xs = (np.arange(width) * img.shape[1] // width).clip(0, img.shape[1] - 1)
                resized = img[ys][:, xs]
                out.append(
                    {
                        "asset_id": row["asset_id"],
                        "data": resized.tobytes(),
                        "width": width,
                        "height": height,
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in RESIZED_SCHEMA])

    images = assets.filter(F.col("meta.media_type") == "image").select(
        "asset_id", "data", F.col("meta.width").alias("width"), F.col("meta.height").alias("height")
    )
    return images.mapInPandas(resize, RESIZED_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("n_samples", LongType()),
        StructField("duration_s", DoubleType()),
        StructField("rms", DoubleType()),
        StructField("peak", DoubleType()),
    ]
)


def audio_features(assets: DataFrame) -> DataFrame:
    """REAL PCM16 audio feature extraction (numpy-only decode):
    sample count, duration, RMS, and peak amplitude (normalized)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                raw = bytes(row["data"] or b"")
                raw = raw[: len(raw) - (len(raw) % 2)]
                samples = (
                    np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
                    if raw
                    else np.zeros(0)
                )
                sr = int(row["sample_rate"]) or 1
                out.append(
                    {
                        "asset_id": row["asset_id"],
                        "n_samples": len(samples),
                        "duration_s": round(len(samples) / sr, 6),
                        "rms": round(float(np.sqrt((samples**2).mean())) if len(samples) else 0.0, 6),
                        "peak": round(float(np.abs(samples).max()) if len(samples) else 0.0, 6),
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in AUDIO_FEATURES_SCHEMA])

    audio = assets.filter(F.col("meta.media_type") == "audio").select(
        "asset_id", "data", F.col("meta.sample_rate").alias("sample_rate")
    )
    return audio.mapInPandas(extract, AUDIO_FEATURES_SCHEMA)


def sample_video_frames(assets: DataFrame, *, every_n: int = 10) -> DataFrame:
    """Frame sampling: one row per kept frame index (0, n, 2n, …) with a
    byte-offset slice of the payload as the (stub) frame handle — pure
    native explode, no Python; a real codec plugs into the slice."""
    videos = assets.filter(F.col("meta.media_type") == "video").select(
        "asset_id", "data", F.col("meta.n_frames").alias("n_frames")
    )
    frame_idx = F.explode(
        F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
    ).alias("frame_idx")
    chunk = F.greatest((F.length("data") / F.col("n_frames")).cast("int"), F.lit(1))
    return videos.select("asset_id", "n_frames", F.col("data"), frame_idx).select(
        "asset_id",
        "frame_idx",
        F.substring(
            F.col("data"), (F.col("frame_idx") * chunk + 1).cast("int"), chunk
        ).alias("frame_data"),
    )
