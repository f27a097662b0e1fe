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
* **Image decode is REAL for binary PPM/PGM** (P6/P5, maxval ≤ 255):
  :func:`decode_image` is a pure-numpy netpbm decoder and
  :func:`encode_ppm` the matching encoder, so the decode → feature →
  resize → re-encode path runs on genuine image bytes end-to-end.
  Compressed formats (JPEG/PNG/…) need PIL/opencv and raise
  ``NotImplementedError`` — swapping in PIL later changes ONE function.
* **Video** is modeled as metadata-only frame sampling (frame offsets
  into the payload) — the partition/explode plumbing is real.
"""

from __future__ import annotations

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
    "encode_ppm",
    "image_features",
    "resize_images",
    "audio_features",
    "audio_energy_segments",
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
    media_type rotates image/audio/video.  Image payloads are VALID
    binary PPM (P6) files — header + raster of the document's printable
    ASCII bytes cycled to ``width*height*3`` — built entirely with native
    expressions so synthesis stays JVM-side.  Audio/video payloads are
    raw text bytes (PCM16-interpretable / frame-sliceable).  Real
    pipelines would read parquet/webdataset with identical schema."""
    t = F.col("doc_id") % 3
    w = (F.col("doc_id") % 8 + 4) * 4
    h = (F.col("doc_id") % 6 + 3) * 4
    # Printable-ASCII raster source: 1 char == 1 byte, so native string
    # repeat/substring arithmetic is exact byte arithmetic.
    ascii_src = F.regexp_replace(F.col("text"), "[^ -~]", "")
    ascii_src = F.coalesce(F.nullif(ascii_src, F.lit("")), F.lit("spark"))
    n_pix = (w * h * 3).cast("int")
    raster = F.substring(
        F.repeat(ascii_src, (n_pix / F.length(ascii_src)).cast("int") + 1), 1, n_pix
    )
    ppm = F.concat(
        F.lit("P6\n"), w.cast("string"), F.lit(" "), h.cast("string"), F.lit("\n255\n"), raster
    )
    payload = F.encode(F.when(t == 0, ppm).otherwise(F.col("text")), "UTF-8")
    meta = F.struct(
        F.when(t == 0, "image").when(t == 1, "audio").otherwise("video").alias("media_type"),
        F.when(t == 0, "ppm").when(t == 1, "pcm16").otherwise("fake-frames").alias("format"),
        F.when(t == 0, w).otherwise(F.lit(None)).cast("int").alias("width"),
        F.when(t == 0, h).otherwise(F.lit(None)).cast("int").alias("height"),
        F.when(t == 1, 16000).otherwise(F.lit(None)).cast("int").alias("sample_rate"),
        F.when(t == 2, F.col("doc_id") % 50 + 10).otherwise(F.lit(None)).cast("int").alias("n_frames"),
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"), payload.alias("data"), meta.alias("meta")
    )


def decode_image(data: bytes) -> np.ndarray:
    """Decode an image payload to an (H, W, 3) uint8 array.

    REAL decoder for binary netpbm (P6 RGB, P5 grayscale; maxval ≤ 255),
    pure numpy — header tokens parsed with ``#``-comment handling, raster
    via zero-copy ``frombuffer``.  Grayscale is expanded to 3 channels so
    downstream features see one shape.  Compressed formats (JPEG/PNG/…)
    require PIL/opencv, absent from this build environment, and raise
    ``NotImplementedError`` — swapping in PIL later changes only this
    function."""
    buf = bytes(data or b"")
    magic = buf[:2]
    if magic not in (b"P6", b"P5"):
        raise NotImplementedError(
            f"only binary PPM/PGM (P6/P5) decode is implemented without "
            f"PIL/opencv; payload starts with {magic!r}"
        )
    toks: list[bytes] = []
    i = 2
    while len(toks) < 3:
        while i < len(buf) and buf[i : i + 1].isspace():
            i += 1
        if i < len(buf) and buf[i : i + 1] == b"#":  # comment to end-of-line
            while i < len(buf) and buf[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(buf) and not buf[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated netpbm header")
        toks.append(buf[i:j])
        i = j
    width, height, maxval = (int(t) for t in toks)
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm rasters are not supported")
    i += 1  # exactly one whitespace byte separates maxval from the raster
    channels = 3 if magic == b"P6" else 1
    raster = np.frombuffer(buf, dtype=np.uint8, count=width * height * channels, offset=i)
    img = raster.reshape(height, width, channels)
    return np.repeat(img, 3, axis=2) if channels == 1 else img


def encode_ppm(img: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 array as a binary PPM (P6) payload —
    the inverse of :func:`decode_image`, used by :func:`resize_images`
    so transformed assets remain valid, re-decodable image files."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(img, dtype=np.uint8).tobytes()


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
                img = decode_image(row["data"])
                h, w = img.shape[:2]
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

    # Only asset_id + payload cross the Arrow boundary; dimensions come
    # from the decoded header itself.
    images = assets.filter(F.col("meta.media_type") == "image").select("asset_id", "data")
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
    """Nearest-neighbor resize over really-decoded pixels: decode PPM →
    index-map resample → re-encode PPM, one Arrow batch at a time — the
    exact plumbing a PIL-backed resize would use."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                img = decode_image(row["data"])
                ys = (np.arange(height) * img.shape[0] // height).clip(0, img.shape[0] - 1)
                xs = (np.arange(width) * img.shape[1] // width).clip(0, img.shape[1] - 1)
                resized = img[ys][:, xs]
                out.append(
                    {
                        "asset_id": row["asset_id"],
                        "data": encode_ppm(resized),
                        "width": width,
                        "height": height,
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in RESIZED_SCHEMA])

    images = assets.filter(F.col("meta.media_type") == "image").select("asset_id", "data")
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


AUDIO_RESAMPLE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("n_samples", LongType()),
        StructField("sum_abs", LongType()),
        StructField("peak_i16", LongType()),
    ]
)


def resample_audio(assets: DataFrame, *, factor: int = 4) -> DataFrame:
    """REAL PCM16 decimation (numpy decode → keep every ``factor``-th
    sample → re-encode little-endian → decode AGAIN for the features):
    the downsampling step of an audio-preprocessing pipeline, with the
    encode/decode ROUNDTRIP inside the kernel so the emitted features
    witness the re-encoded payload, not the intermediate array.

    Emits integer features only (count, Σ|s| as int64 — order-free —
    and the peak int16 magnitude): the same decimal-tie-avoidance
    contract as the ``multimodal_audio_features`` surface, making the
    resample hash-checkable byte-for-byte in a SQL replay (sample 2k
    of the payload is hex chars [4k, 4k+2) — kept iff k ≡ 0 mod
    ``factor``).
    """
    if factor < 1:
        raise ValueError("factor must be >= 1")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                raw = bytes(row["data"] or b"")
                raw = raw[: len(raw) - (len(raw) % 2)]
                samples = np.frombuffer(raw, dtype="<i2") if raw else np.zeros(0, "<i2")
                kept = samples[::factor]
                reenc = kept.astype("<i2").tobytes()
                again = np.frombuffer(reenc, dtype="<i2").astype(np.int64)
                out.append(
                    {
                        "asset_id": row["asset_id"],
                        "n_samples": len(again),
                        "sum_abs": int(np.abs(again).sum()) if len(again) else 0,
                        "peak_i16": int(np.abs(again).max()) if len(again) else 0,
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in AUDIO_RESAMPLE_SCHEMA])

    audio = assets.filter(F.col("meta.media_type") == "audio").select(
        "asset_id", "data"
    )
    return audio.mapInPandas(kernel, AUDIO_RESAMPLE_SCHEMA)


IMAGE_TILES_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("tile_row", LongType()),
        StructField("tile_col", LongType()),
        StructField("n_pix", LongType()),
        StructField("sum_rgb", LongType()),
    ]
)


def image_tile_stats(assets: DataFrame, *, tiles: int = 2) -> DataFrame:
    """REAL image tiling (the crop/patch step of a vision-data
    pipeline): decode the PPM payload, split the raster into a
    ``tiles × tiles`` grid (image dims here are multiples of 4, so the
    grid divides evenly), and emit per-tile INTEGER statistics — pixel
    count and the int64 sum of all channel bytes.  Integer-only
    outputs make the real decode+tile hash-checkable (the
    ``resample_audio`` contract applied to images).

    One row per (asset, tile): 4× fan-out of the asset table at the
    default grid, computed inside the same Arrow batch as the decode —
    no per-tile Python round trips.
    """
    if tiles < 1:
        raise ValueError("tiles must be >= 1")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                img = decode_image(bytes(row["data"]))
                h, w = img.shape[0], img.shape[1]
                th, tw = max(1, h // tiles), max(1, w // tiles)
                for tr in range(tiles):
                    for tc in range(tiles):
                        r0, r1 = tr * th, (tr + 1) * th if tr < tiles - 1 else h
                        c0, c1 = tc * tw, (tc + 1) * tw if tc < tiles - 1 else w
                        tile = img[r0:r1, c0:c1]
                        out.append(
                            {
                                "asset_id": row["asset_id"],
                                "tile_row": tr,
                                "tile_col": tc,
                                "n_pix": int(tile.shape[0] * tile.shape[1]),
                                "sum_rgb": int(tile.astype(np.int64).sum()),
                            }
                        )
            yield pd.DataFrame(out, columns=[f.name for f in IMAGE_TILES_SCHEMA])

    imgs = assets.filter(F.col("meta.media_type") == "image").select(
        "asset_id", "data"
    )
    return imgs.mapInPandas(kernel, IMAGE_TILES_SCHEMA)


AUDIO_FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("energy", LongType()),
    ]
)


def audio_energy_segments(assets: DataFrame, *, frame: int = 32) -> DataFrame:
    """Energy-based audio segmentation (VAD-style): PCM16 payloads are
    framed into non-overlapping ``frame``-sample windows (partial tail
    dropped), each frame's energy is the EXACT int64 sum of squared
    int16 samples, frames louder than the asset's mean frame energy are
    active (compared by integer cross-multiplication — no division
    anywhere), and consecutive active frames merge into segments
    (gaps-and-islands).  The speech-detection pass of an audio
    training-data pipeline, with the decode step real (numpy int16) and
    everything after it native Catalyst.

    Fully integer arithmetic end to end, so the DuckDB oracle replays
    the byte decode (hex pairs), framing, energy, threshold and merge
    bit-for-bit.

    Scale: the Arrow decode emits one row per frame (payload-bounded);
    threshold needs one per-asset aggregate joined back (AQE broadcasts
    when small); the island merge is one window over the per-asset
    frame order.

    Returns ``(asset_id, seg_id, start_frame, end_frame, n_frames,
    seg_energy)``.
    """
    from pyspark.sql import Window

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                raw = bytes(row["data"] or b"")
                raw = raw[: len(raw) - (len(raw) % 2)]
                s = np.frombuffer(raw, dtype="<i2").astype(np.int64)
                n = len(s) // frame
                if not n:
                    continue
                e = (s[: n * frame].reshape(n, frame) ** 2).sum(axis=1)
                for i in range(n):
                    out.append(
                        {
                            "asset_id": row["asset_id"],
                            "frame_idx": i,
                            "energy": int(e[i]),
                        }
                    )
            yield pd.DataFrame(out, columns=[f.name for f in AUDIO_FRAME_SCHEMA])

    audio = assets.filter(F.col("meta.media_type") == "audio").select(
        "asset_id", "data"
    )
    fr = audio.mapInPandas(frames, AUDIO_FRAME_SCHEMA)
    tot = fr.groupBy("asset_id").agg(
        F.sum("energy").alias("_tot"), F.count(F.lit(1)).alias("_n")
    )
    act = fr.join(tot, "asset_id").filter(
        F.col("energy") * F.col("_n") > F.col("_tot")
    )
    w = Window.partitionBy("asset_id").orderBy("frame_idx")
    segs = (
        act.withColumn("_grp", F.col("frame_idx") - (F.row_number().over(w) - 1))
        .groupBy("asset_id", "_grp")
        .agg(
            F.min("frame_idx").alias("start_frame"),
            F.max("frame_idx").alias("end_frame"),
            F.count(F.lit(1)).alias("n_frames"),
            F.sum("energy").alias("seg_energy"),
        )
    )
    ws = Window.partitionBy("asset_id").orderBy("start_frame")
    return segs.select(
        "asset_id",
        F.row_number().over(ws).cast("int").alias("seg_id"),
        "start_frame",
        "end_frame",
        F.col("n_frames").cast("long").alias("n_frames"),
        F.col("seg_energy").cast("long").alias("seg_energy"),
    )
