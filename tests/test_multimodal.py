"""Multimodal column plumbing tests (SURVEY.md §2.10 [EXT]): schema,
batch shape, REAL PPM image decode, REAL PCM16 audio decode, native
frame sampling."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from name_match_ml_spark.multimodal.columns import (
    audio_features,
    decode_image,
    encode_ppm,
    image_features,
    resize_images,
    sample_video_frames,
    synthesize_media_assets,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def assets(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(90)
    df = synthesize_media_assets(docs)
    df.cache().count()
    return df


def test_media_schema(assets):
    assert [f.name for f in assets.schema.fields] == ["asset_id", "data", "meta"]
    meta_fields = {f.name for f in assets.schema["meta"].dataType.fields}
    assert meta_fields == {"media_type", "format", "width", "height", "sample_rate", "n_frames"}
    types = {r.t for r in assets.select(F.col("meta.media_type").alias("t")).distinct().collect()}
    assert types == {"image", "audio", "video"}


def test_decode_image_real_ppm_roundtrip():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(3, 4, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_ppm(img)), img)
    # header comments + P5 grayscale expansion
    gray = b"P5\n# a comment\n2 2\n255\n\x00\x40\x80\xff"
    g = decode_image(gray)
    assert g.shape == (2, 2, 3)
    assert np.array_equal(g[:, :, 0], np.array([[0, 0x40], [0x80, 0xFF]], dtype=np.uint8))
    assert np.array_equal(g[:, :, 0], g[:, :, 2])  # channels replicated
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n")  # compressed formats need PIL
    with pytest.raises(NotImplementedError):
        decode_image(b"P6\n1 1\n65535\n\x00\x00\x00\x00\x00\x00")  # 16-bit


def test_synthesized_image_payloads_are_valid_ppm(assets):
    rows = assets.filter(F.col("meta.media_type") == "image").collect()
    assert rows
    for r in rows:
        img = decode_image(bytes(r.data))
        assert img.shape == (r.meta.height, r.meta.width, 3)
        assert img.dtype == np.uint8


def test_image_features(assets):
    feats = image_features(assets, bins=16).collect()
    n_images = assets.filter(F.col("meta.media_type") == "image").count()
    assert len(feats) == n_images > 0
    raw = {
        r.asset_id: bytes(r.data)
        for r in assets.filter(F.col("meta.media_type") == "image").collect()
    }
    for r in feats:
        assert len(r.mean_rgb) == 3
        assert len(r.histogram) == 16
        assert abs(sum(r.histogram) - 1.0) < 1e-5
        # mean_rgb really comes from the decoded raster
        img = decode_image(raw[r.asset_id])
        assert (r.height, r.width) == img.shape[:2]
        np.testing.assert_allclose(r.mean_rgb, img.reshape(-1, 3).mean(axis=0), atol=1e-9)


def test_resize_images(assets):
    out = resize_images(assets, width=8, height=6).collect()
    assert out
    for r in out:
        assert (r.width, r.height) == (8, 6)
        resized = decode_image(bytes(r.data))  # output is itself valid PPM
        assert resized.shape == (6, 8, 3)


def test_audio_features_real_pcm(assets, spark):
    got = {r.asset_id: r for r in audio_features(assets).collect()}
    raw = {
        r.asset_id: bytes(r.data)
        for r in assets.filter(F.col("meta.media_type") == "audio").collect()
    }
    assert set(got) == set(raw) and got
    for aid, data in raw.items():
        data = data[: len(data) - (len(data) % 2)]
        samples = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
        assert got[aid].n_samples == len(samples)
        assert got[aid].duration_s == pytest.approx(len(samples) / 16000, abs=1e-6)
        assert got[aid].rms == pytest.approx(float(np.sqrt((samples**2).mean())), abs=1e-5)


def test_sample_video_frames(assets):
    frames = sample_video_frames(assets, every_n=10).collect()
    videos = {
        r.asset_id: r.n_frames
        for r in assets.filter(F.col("meta.media_type") == "video")
        .select("asset_id", F.col("meta.n_frames").alias("n_frames"))
        .collect()
    }
    by_asset = {}
    for r in frames:
        by_asset.setdefault(r.asset_id, []).append(r.frame_idx)
    assert set(by_asset) == set(videos)
    for aid, idxs in by_asset.items():
        want = list(range(0, videos[aid], 10))
        assert sorted(idxs) == want, aid
        for r in frames:
            if r.asset_id == aid:
                assert len(bytes(r.frame_data)) >= 1


def test_resample_audio_factor1_is_identity_and_counts(spark, assets):
    from name_match_ml_spark.multimodal.columns import audio_features, resample_audio

    full = {r.asset_id: r.n_samples for r in audio_features(assets).collect()}
    r1 = {r.asset_id: r for r in resample_audio(assets, factor=1).collect()}
    r4 = {r.asset_id: r for r in resample_audio(assets, factor=4).collect()}
    for aid, n in full.items():
        assert r1[aid].n_samples == n
        assert r4[aid].n_samples == (n + 3) // 4  # ceil: indices 0,4,8,...
        assert r4[aid].peak_i16 <= r1[aid].peak_i16
        assert r4[aid].sum_abs <= r1[aid].sum_abs
    import pytest as _pytest

    with _pytest.raises(ValueError):
        resample_audio(assets, factor=0)


def test_image_tiles_partition_the_image_exactly(spark, assets):
    from name_match_ml_spark.multimodal.columns import (
        image_features,
        image_tile_stats,
    )
    import collections

    feats = {r.asset_id: r for r in image_features(assets).collect()}
    tiles = image_tile_stats(assets, tiles=2).collect()
    per_asset = collections.defaultdict(lambda: [0, 0, 0])
    for t in tiles:
        per_asset[t.asset_id][0] += t.n_pix
        per_asset[t.asset_id][1] += t.sum_rgb
        per_asset[t.asset_id][2] += 1
    for aid, (n_pix, sum_rgb, n_tiles) in per_asset.items():
        f = feats[aid]
        assert n_tiles == 4
        assert n_pix == f.width * f.height  # tiles partition all pixels
        # tile channel sums reassemble the full-image per-channel means
        # (mean_rgb is the [r, g, b] list of 6-dp channel means)
        expect_sum = round(sum(f.mean_rgb) * n_pix)
        assert abs(sum_rgb - expect_sum) <= 1
