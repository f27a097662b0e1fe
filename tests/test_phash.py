"""Perceptual image dedup tests (multimodal/phash.py): fingerprint
determinism, near-dup detection on constructed images, pigeonhole
banding recall, and the bands/max_hamming contract."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from name_match_ml_spark.multimodal.columns import encode_ppm
from name_match_ml_spark.multimodal.phash import (
    _phash_of,
    phash_images,
    phash_pairs,
    phash_near_dup_summary,
)


def _img(seed: int, w: int = 32, h: int = 24) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)


def _assets(spark, imgs: dict[int, np.ndarray]):
    rows = [
        (i, bytearray(encode_ppm(img)), ("image", "ppm"))
        for i, img in imgs.items()
    ]
    return spark.createDataFrame(
        rows,
        "asset_id long, data binary, meta struct<media_type: string, format: string>",
    )


def test_phash_deterministic_and_63_bits():
    img = _img(1)
    h1, h2 = _phash_of(img), _phash_of(img.copy())
    assert h1 == h2
    assert 0 <= h1 < (1 << 63)


def test_identical_images_pair_at_hamming_zero(spark):
    img = _img(2)
    out = phash_pairs(phash_images(_assets(spark, {1: img, 2: img.copy()}))).collect()
    assert [(r.asset_a, r.asset_b, r.hamming) for r in out] == [(1, 2, 0)]


def test_small_perturbation_pairs_unrelated_does_not(spark):
    base = _img(3, w=40, h=32)
    near = base.copy()
    near[0, 0] = 255 - near[0, 0]  # flip one pixel — perceptually identical
    other = _img(99, w=40, h=32)
    out = phash_pairs(
        phash_images(_assets(spark, {1: base, 2: near, 3: other}))
    ).collect()
    got = {(r.asset_a, r.asset_b) for r in out}
    assert (1, 2) in got
    assert (1, 3) not in got and (2, 3) not in got


def test_banding_pigeonhole_recall_exact_at_boundary(spark):
    """Hashes differing in exactly max_hamming bits spread across bands
    must still collide in at least one band (pigeonhole); one more bit
    flipped in the last untouched band must be rejected by the verify
    step."""
    base = (1 << 62) | (1 << 40) | (1 << 3)
    at6 = base
    for b in range(6):  # one flip in each of bands 0..5
        at6 ^= 1 << (9 * b)
    at7 = at6 ^ (1 << (9 * 6))  # 7th flip lands in band 6
    hashes = spark.createDataFrame(
        [(1, base), (2, at6), (3, at7)], "asset_id long, phash long"
    )
    out = {(r.asset_a, r.asset_b): r.hamming for r in phash_pairs(hashes).collect()}
    assert out[(1, 2)] == 6
    assert (1, 3) not in out  # hamming 7 > max


def test_max_hamming_needs_enough_bands(spark):
    hashes = spark.createDataFrame([(1, 5)], "asset_id long, phash long")
    with pytest.raises(ValueError, match="pigeonhole"):
        phash_pairs(hashes, max_hamming=7, bands=7)


def test_summary_counts_and_keeper(spark):
    img = _img(4)
    other = _img(5)
    out = phash_near_dup_summary(
        _assets(spark, {10: img, 20: img.copy(), 30: other})
    ).collect()
    by_id = {r.asset_id: r for r in out}
    assert by_id[10].n_near_dups == 1 and by_id[10].keeper_id == 10
    assert by_id[20].n_near_dups == 1 and by_id[20].keeper_id == 10
    assert by_id[30].n_near_dups == 0 and by_id[30].keeper_id == 30
    assert by_id[10].phash == by_id[20].phash
