"""Video perceptual dedup tests (multimodal/phash.py::video_phash_dedup):
constructed near-dup video pair recovered, distinct video untouched,
matched-fraction threshold respected, and kernel edge cases."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from name_match_ml_spark.multimodal.columns import synthesize_media_assets
from name_match_ml_spark.multimodal.phash import (
    _frame_phash_of,
    _frame_phashes_np,
    frame_phashes,
    video_phash_dedup,
)


def _assets(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return synthesize_media_assets(docs)


BODY = "the quick brown fox jumps over the lazy dog again and again " * 8


def test_constructed_near_dup_video_pair(spark):
    """Identical payloads with identical frame geometry (doc_ids 2 and
    152: both % 3 == 2 → video, both % 50 == 2 → same n_frames, so the
    same chunking) must pair up; the unrelated video 8 stays unique.
    The chunking is doc-id-derived, so only geometry-matched twins are
    byte-identical per frame — the deliberate property this pins."""
    assets = _assets(
        spark,
        [(2, BODY), (152, BODY), (8, "0123456789" * 40)],
    )
    rows = {r.asset_id: r for r in video_phash_dedup(assets).collect()}
    assert rows[2].n_near_dups >= 1
    assert rows[152].n_near_dups >= 1
    assert rows[2].keeper_id == 2 and rows[152].keeper_id == 2
    assert rows[8].n_near_dups == 0 and rows[8].keeper_id == 8


def test_threshold_excludes_weak_overlap(spark):
    """min_match_pct=101 can never be met — no pairs survive even for
    identical payloads, but the per-video summary rows remain."""
    assets = _assets(spark, [(2, BODY), (152, BODY)])
    rows = {r.asset_id: r
            for r in video_phash_dedup(assets, min_match_pct=101).collect()}
    assert rows[2].n_near_dups == 0 and rows[152].n_near_dups == 0


def test_frame_phashes_deterministic_and_nonempty(spark):
    assets = _assets(spark, [(2, BODY), (8, "0123456789" * 40)])
    from name_match_ml_spark.multimodal.columns import sample_video_frames

    frames = sample_video_frames(assets, every_n=10).filter(
        F.length("frame_data") > 0
    )
    r1 = sorted(map(tuple, frame_phashes(frames).collect()))
    r2 = sorted(map(tuple, frame_phashes(frames).collect()))
    assert r1 == r2 and len(r1) > 0
    assert all(0 <= ph < (1 << 63) for _, _, ph in r1)


def test_frame_kernel_rejects_empty_chunk(spark):
    with pytest.raises(ValueError, match="empty frame chunk"):
        _frame_phash_of(b"")
    with pytest.raises(ValueError, match="empty frame chunk"):
        _frame_phashes_np([b"abc", b""])


def test_vectorized_frame_kernel_matches_scalar():
    """The batched numpy kernel (optimization round 11) must be
    bit-identical to the per-frame reference across chunk lengths
    (1-byte degenerate, shorter/equal/longer than the 192-pixel grid,
    and mixed lengths in one batch — the grouped-gather path)."""
    import random

    random.seed(11)
    bufs = [
        bytes(random.randrange(256) for _ in range(length))
        for length in [1, 2, 7, 50, 191, 192, 193, 256, 1000]
        for _ in range(4)
    ]
    expected = [_frame_phash_of(b) for b in bufs]
    assert _frame_phashes_np(bufs).tolist() == expected
    assert _frame_phashes_np([]).shape == (0,)


def test_bands_pigeonhole_validation(spark):
    assets = _assets(spark, [(2, BODY)])
    with pytest.raises(ValueError, match="pigeonhole"):
        video_phash_dedup(assets, max_hamming=7, bands=7)
