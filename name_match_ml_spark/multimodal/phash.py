"""Perceptual image near-dup dedup: integer-DCT pHash + Hamming banding.

The multimodal twin of SimHash text dedup (``operators/dedup.py``): each
image becomes a 63-bit perceptual fingerprint; near-duplicate pairs are
mined with the same pigeonhole band-join discipline (never all-pairs),
then verified with an exact Hamming-distance filter.

Reference parity: the reference engine (``main.py``) has no image
operators — this family is part of the LLM-training-data surface the
engine adds (perceptual dedup of crawled image corpora).

pHash recipe (Zauner 2010 "Implementation and Benchmarking of
Perceptual Image Hash Functions"; imagehash's phash), made EXACTLY
integer so any engine replays it bit-for-bit:

1. decode the image (real PPM decode, :func:`..columns.decode_image`);
2. integer grayscale ``(r + g + b) // 3``;
3. downsample to an 8×8 grid of block means — pixel (x, y) belongs to
   block ``(x*8 // w, y*8 // h)``; block value is ``sum // count``
   (all int64);
4. 2-D DCT-II via an INTEGER cosine matrix ``C[u][x] =
   round(cos((2x+1)·u·π/16) · 64)`` — ``T = C·G·Cᵀ`` is an exact int64
   matmul (|T| ≤ 8²·64²·126 ≈ 3.3e7, nowhere near overflow);
5. the 63 AC coefficients (row-major, DC dropped) threshold against
   their integer median (the 32nd-smallest, 0-based index 31):
   bit ``i`` set iff ``ac[i] > median`` — 63 bits, so the hash always
   fits a non-negative int64.

Pair mining: 7 bands × 9 bits.  Two hashes within Hamming distance 6
differ in at most 6 bands, so by pigeonhole they COLLIDE in at least
one band — banding has perfect recall at ``max_hamming = 6`` and the
verify step is an exact ``bit_count(xor)`` filter.

Scale design (100 TB): the per-image work is one Arrow ``mapInPandas``
pass (decode + integer DCT in numpy — the only part that genuinely
needs Python); everything after the 8-byte hash is narrow JVM-side
codegen.  The band join shuffles three longs per (image, band); bucket
sizes are bounded by duplicate-group sizes, and identical-hash groups
are exactly the exact-dup groups.  No CartesianProduct anywhere.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType, StructField, StructType

from .columns import decode_image

__all__ = [
    "DCT_C",
    "phash_images",
    "phash_pairs",
    "phash_near_dup_summary",
    "frame_phashes",
    "video_phash_dedup",
]

# Integer 8-point DCT-II matrix, scale 64: C[u][x] = round(cos((2x+1)uπ/16)·64).
# Shared verbatim by the numpy kernel and the generated DuckDB oracle
# (suite.py::_phash_oracle_sql) so both engines do the IDENTICAL matmul.
DCT_C: list[list[int]] = [
    [round(math.cos((2 * x + 1) * u * math.pi / 16) * 64) for x in range(8)]
    for u in range(8)
]

PHASH_SCHEMA = StructType(
    [StructField("asset_id", LongType()), StructField("phash", LongType())]
)


def _phash_of(img: np.ndarray) -> int:
    gray = img.astype(np.int64).sum(axis=2) // 3  # (H, W) ints ≤ 126
    h, w = gray.shape
    if h < 8 or w < 8:
        # An image narrower/shorter than the 8×8 grid leaves empty
        # blocks (count 0 → silent junk under integer floor-divide);
        # fail loudly instead (ADVICE r9).
        raise ValueError(f"phash requires images of at least 8x8 pixels, got {h}x{w}")
    bx = (np.arange(w, dtype=np.int64) * 8) // w
    by = (np.arange(h, dtype=np.int64) * 8) // h
    idx = (by[:, None] * 8 + bx[None, :]).ravel()
    sums = np.zeros(64, dtype=np.int64)
    np.add.at(sums, idx, gray.ravel())
    counts = np.bincount(idx, minlength=64)
    grid = (sums // counts).reshape(8, 8)  # every block non-empty: w, h ≥ 8
    c = np.asarray(DCT_C, dtype=np.int64)
    t = c @ grid @ c.T
    ac = t.ravel()[1:]  # 63 AC coefficients, row-major
    med = int(np.sort(ac)[31])
    bits = np.flatnonzero(ac > med)
    return int(sum(1 << int(i) for i in bits))


def phash_images(assets: DataFrame) -> DataFrame:
    """``(asset_id, phash)`` for every image asset — one Arrow pass;
    only id + payload cross the Python boundary."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                {"asset_id": row["asset_id"], "phash": _phash_of(decode_image(row["data"]))}
                for _, row in pdf.iterrows()
            ]
            yield pd.DataFrame(out, columns=["asset_id", "phash"])

    images = assets.filter(F.col("meta.media_type") == "image").select("asset_id", "data")
    return images.mapInPandas(kernel, PHASH_SCHEMA)


def phash_pairs(
    hashes: DataFrame,
    *,
    max_hamming: int = 6,
    bands: int = 7,
    band_bits: int = 9,
) -> DataFrame:
    """``(asset_a, asset_b, hamming)`` pairs within ``max_hamming`` from
    a ``(asset_id, phash)`` table.  Requires ``max_hamming < bands`` so
    the pigeonhole recall guarantee holds."""
    if max_hamming >= bands:
        raise ValueError(
            f"max_hamming={max_hamming} needs at least max_hamming+1 bands "
            f"for pigeonhole recall (got bands={bands})"
        )
    mask = (1 << band_bits) - 1
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("phash"), band_bits * b)
                .bitwiseAND(F.lit(mask))
                .alias("bv"),
            )
            for b in range(bands)
        ]
    )
    flat = hashes.select(
        "asset_id", "phash", F.explode(band_structs).alias("bs")
    ).select("asset_id", "phash", "bs.band", "bs.bv")
    a = flat.select(
        "band", "bv", F.col("asset_id").alias("asset_a"), F.col("phash").alias("ph_a")
    )
    b = flat.select(
        "band", "bv", F.col("asset_id").alias("asset_b"), F.col("phash").alias("ph_b")
    )
    return (
        a.join(b, ["band", "bv"])
        .filter(F.col("asset_a") < F.col("asset_b"))
        .select("asset_a", "asset_b", "ph_a", "ph_b")
        .dropDuplicates(["asset_a", "asset_b"])
        .select(
            "asset_a",
            "asset_b",
            F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def phash_near_dup_summary(
    assets: DataFrame, *, max_hamming: int = 6, bands: int = 7, band_bits: int = 9
) -> DataFrame:
    """Per-image summary ``(asset_id, phash, n_near_dups, keeper_id)``:
    every image row with its fingerprint, its Hamming-≤r neighbor count,
    and the smallest asset id in its neighborhood (itself when unique) —
    non-empty by construction, so the full decode → DCT → banding →
    verify algebra is hash-checkable even when a corpus has no dups."""
    hashes = phash_images(assets).localCheckpoint(eager=False)
    pairs = phash_pairs(
        hashes, max_hamming=max_hamming, bands=bands, band_bits=band_bits
    )
    nb = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("asset_a").alias("asset_id"), F.col("asset_b").alias("nb")),
                F.struct(F.col("asset_b").alias("asset_id"), F.col("asset_a").alias("nb")),
            )
        ).alias("_e")
    ).select("_e.asset_id", "_e.nb")
    agg = nb.groupBy("asset_id").agg(
        F.count(F.lit(1)).alias("n_near_dups"), F.min("nb").alias("_mn")
    )
    return hashes.join(agg, "asset_id", "left").select(
        "asset_id",
        "phash",
        F.coalesce(F.col("n_near_dups"), F.lit(0)).cast("long").alias("n_near_dups"),
        F.least(F.col("asset_id"), F.coalesce(F.col("_mn"), F.col("asset_id")))
        .cast("long")
        .alias("keeper_id"),
    )


# Fixed fake-decode frame geometry: a sampled frame's byte chunk is read
# as a FRAME_H x FRAME_W grayscale raster (byte p -> pixel p, cycled) —
# the deterministic stand-in for a codec decode, byte-computable in SQL
# via the hex-slice device (suite.multimodal_frame_sample), so the whole
# video pipeline replays in the DuckDB oracle.  Both dims >= 8 (the
# _phash_of precondition).
FRAME_W = 16
FRAME_H = 12

FRAME_PHASH_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("phash", LongType()),
    ]
)


def _frame_phash_of(buf: bytes) -> int:
    """pHash of one sampled frame chunk under the fake-decode
    convention: pixel ``p`` = byte ``p mod len(buf)``, replicated to 3
    channels so :func:`_phash_of`'s integer grayscale ``(3v)//3 == v``
    — the DCT/median/banding algebra is shared verbatim with the image
    path."""
    b = np.frombuffer(bytes(buf), dtype=np.uint8)
    if b.size == 0:
        raise ValueError("empty frame chunk — filter length(frame_data) > 0 first")
    gray = b[np.arange(FRAME_H * FRAME_W) % b.size].reshape(FRAME_H, FRAME_W)
    return _phash_of(np.repeat(gray[:, :, None], 3, axis=2))


# Constants of the fixed FRAME_H × FRAME_W fake-decode geometry, hoisted
# so the batch kernel computes them once per module import: the 192-pixel
# → 64-block one-hot map (every frame shares it), the per-block counts,
# and the 63 bit weights.
_FRAME_PIXELS = FRAME_H * FRAME_W
_FRAME_BLOCK_IDX = (
    ((np.arange(FRAME_H, dtype=np.int64) * 8) // FRAME_H)[:, None] * 8
    + ((np.arange(FRAME_W, dtype=np.int64) * 8) // FRAME_W)[None, :]
).ravel()
_FRAME_BLOCK_ONEHOT = (
    _FRAME_BLOCK_IDX[:, None] == np.arange(64, dtype=np.int64)[None, :]
).astype(np.int64)
_FRAME_BLOCK_COUNTS = _FRAME_BLOCK_ONEHOT.sum(axis=0)
_FRAME_BIT_WEIGHTS = np.int64(1) << np.arange(63, dtype=np.int64)


def _frame_phashes_np(bufs: list[bytes]) -> np.ndarray:
    """Vectorized :func:`_frame_phash_of` over a whole Arrow batch
    (optimization round 11, guide §4.2 — no per-row Python loop): every
    step runs as one numpy op over all frames.  Bit-identical to the
    scalar path (pinned by ``tests/test_video_phash.py``): the fake
    decode is a pure gather, block means reduce over a constant one-hot
    map, the DCT is the same exact int64 matmul batched with einsum,
    and the median/threshold algebra is unchanged.  Only the gather
    index depends on the chunk length, so frames are grouped by length
    (video chunks are fixed-size except tails — a handful of groups)."""
    n = len(bufs)
    gray = np.empty((n, _FRAME_PIXELS), dtype=np.int64)
    base = np.arange(_FRAME_PIXELS, dtype=np.int64)
    by_len: dict[int, list[int]] = {}
    for i, buf in enumerate(bufs):
        by_len.setdefault(len(buf), []).append(i)
    if 0 in by_len:
        raise ValueError("empty frame chunk — filter length(frame_data) > 0 first")
    for length, idxs in by_len.items():
        arr = np.frombuffer(
            b"".join(bytes(bufs[i]) for i in idxs), dtype=np.uint8
        ).reshape(len(idxs), length)
        gray[idxs] = arr[:, base % length]
    sums = gray @ _FRAME_BLOCK_ONEHOT
    grid = (sums // _FRAME_BLOCK_COUNTS).reshape(n, 8, 8)
    c = np.asarray(DCT_C, dtype=np.int64)
    t = np.einsum("ux,nxy,vy->nuv", c, grid, c)  # exact: |t| ≤ 8²·64²·255
    ac = t.reshape(n, 64)[:, 1:]
    med = np.sort(ac, axis=1)[:, 31]
    return ((ac > med[:, None]) * _FRAME_BIT_WEIGHTS).sum(axis=1)


def frame_phashes(frames: DataFrame) -> DataFrame:
    """``(asset_id, frame_idx, phash)`` for every sampled frame — one
    Arrow pass; only ids + frame bytes cross the Python boundary, and
    the kernel is fully vectorized over each batch (guide §4.2)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].to_numpy(),
                    "frame_idx": pdf["frame_idx"].to_numpy(),
                    "phash": _frame_phashes_np(list(pdf["frame_data"])),
                }
            )

    return frames.mapInPandas(kernel, FRAME_PHASH_SCHEMA)


def video_phash_dedup(
    assets: DataFrame,
    *,
    every_n: int = 10,
    max_hamming: int = 6,
    bands: int = 7,
    band_bits: int = 9,
    min_match_pct: int = 50,
) -> DataFrame:
    """Perceptual VIDEO near-dup dedup — :func:`..columns.
    sample_video_frames` composed with the pHash kernel (VERDICT r9
    #4): per-sampled-frame fingerprints, frame-level Hamming banding
    (pigeonhole-perfect recall at ``max_hamming < bands``), exact
    ``bit_count`` verify, and video-pair similarity = the fraction of
    sampled frames (across both videos) with a Hamming-≤``max_hamming``
    match in the other video.  A pair is a near-dup when
    ``(matched_a + matched_b) * 100 >= min_match_pct * (n_a + n_b)`` —
    pure int64, so the threshold replays exactly in the oracle.

    Returns one summary row per video (non-empty even on a dup-free
    corpus, the phash_near_dup_summary device): ``(asset_id, n_frames,
    frames_sig, n_near_dups, keeper_id)`` with ``n_frames`` the hashed
    (non-empty) sampled-frame count and ``frames_sig`` the xor of the
    frame fingerprints — the whole sample → decode → DCT → band →
    verify algebra feeds the output.

    Scale shape: frames shuffle only on (band, band-value) — never an
    all-pairs frame join; per-pair match counting is one aggregate over
    verified candidates; Python touches only the per-frame Arrow
    kernel.  At 100 TB the band join is the same banded-dedup shape as
    simhash/minhash text dedup, with |frames| ≈ |videos| · samples."""
    if max_hamming >= bands:
        raise ValueError(
            f"max_hamming={max_hamming} needs at least max_hamming+1 bands "
            f"for pigeonhole recall (got bands={bands})"
        )
    from .columns import sample_video_frames

    frames = sample_video_frames(assets, every_n=every_n).filter(
        F.length("frame_data") > 0
    )
    fh = frame_phashes(frames).localCheckpoint(eager=False)

    per_video = fh.groupBy("asset_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_frames"),
        F.expr("bit_xor(phash)").cast("long").alias("frames_sig"),
    )

    mask = (1 << band_bits) - 1
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("phash"), band_bits * b)
                .bitwiseAND(F.lit(mask))
                .alias("bv"),
            )
            for b in range(bands)
        ]
    )
    flat = fh.select(
        "asset_id", "frame_idx", "phash", F.explode(band_structs).alias("bs")
    ).select("asset_id", "frame_idx", "phash", "bs.band", "bs.bv")
    a = flat.select(
        "band",
        "bv",
        F.col("asset_id").alias("asset_a"),
        F.col("frame_idx").alias("fi_a"),
        F.col("phash").alias("ph_a"),
    )
    b = flat.select(
        "band",
        "bv",
        F.col("asset_id").alias("asset_b"),
        F.col("frame_idx").alias("fi_b"),
        F.col("phash").alias("ph_b"),
    )
    # Hamming verify + narrow projection BEFORE the frame-pair dedup
    # (the simhash_pairs ordering, optimization round 10): the phashes
    # are functions of (asset, frame_idx), so every duplicate row of a
    # quadruple carries the same Hamming value and the filter commutes
    # with the distinct — the dedup exchange then carries only verified
    # matches as four longs, not every band collision with both hashes.
    verified = (
        a.join(b, ["band", "bv"])
        .filter(F.col("asset_a") < F.col("asset_b"))
        .filter(
            F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b"))) <= max_hamming
        )
        .select("asset_a", "fi_a", "asset_b", "fi_b")
        .dropDuplicates(["asset_a", "fi_a", "asset_b", "fi_b"])
    )
    matched = verified.groupBy("asset_a", "asset_b").agg(
        F.countDistinct("fi_a").alias("m_a"), F.countDistinct("fi_b").alias("m_b")
    )
    na = per_video.select(F.col("asset_id").alias("asset_a"), F.col("n_frames").alias("n_a"))
    nb_ = per_video.select(F.col("asset_id").alias("asset_b"), F.col("n_frames").alias("n_b"))
    pairs = (
        matched.join(na, "asset_a")
        .join(nb_, "asset_b")
        .filter(
            (F.col("m_a") + F.col("m_b")) * 100
            >= F.lit(min_match_pct) * (F.col("n_a") + F.col("n_b"))
        )
        .select("asset_a", "asset_b")
    )
    nb = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("asset_a").alias("asset_id"), F.col("asset_b").alias("nb")),
                F.struct(F.col("asset_b").alias("asset_id"), F.col("asset_a").alias("nb")),
            )
        ).alias("_e")
    ).select("_e.asset_id", "_e.nb")
    agg = nb.groupBy("asset_id").agg(
        F.count(F.lit(1)).alias("n_near_dups"), F.min("nb").alias("_mn")
    )
    return per_video.join(agg, "asset_id", "left").select(
        "asset_id",
        "n_frames",
        "frames_sig",
        F.coalesce(F.col("n_near_dups"), F.lit(0)).cast("long").alias("n_near_dups"),
        F.least(F.col("asset_id"), F.coalesce(F.col("_mn"), F.col("asset_id")))
        .cast("long")
        .alias("keeper_id"),
    )
