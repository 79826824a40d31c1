"""Multimodal plumbing tests — deterministic FakeCodec end to end."""

import numpy as np
import pytest

from cloud_volume_spark.multimodal import (
    ASSET_SCHEMA, FakeCodec, audio_features, image_features, image_resize,
    video_frame_sample,
)


@pytest.fixture()
def assets(spark, rng):
    rows = []
    for i in range(6):
        blob = bytes(rng.integers(0, 256, 64, dtype=np.uint8).tolist())
        rows.append((i, "image", blob, "fake", 64, 48, None, None))
    for i in range(6, 9):
        blob = bytes(rng.integers(0, 256, 64, dtype=np.uint8).tolist())
        rows.append((i, "audio", blob, "fake", None, None, 16000, 500))
    for i in range(9, 11):
        blob = bytes(rng.integers(0, 256, 64, dtype=np.uint8).tolist())
        rows.append((i, "video", blob, "fake", 64, 48, None, 3500))
    return spark.createDataFrame(rows, schema=ASSET_SCHEMA)


def test_fake_codec_deterministic():
    a = FakeCodec.decode_image(b"hello", 16, 8)
    b = FakeCodec.decode_image(b"hello", 16, 8)
    c = FakeCodec.decode_image(b"world", 16, 8)
    assert a.shape == (8, 16, 3)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


def test_image_features_match_local(assets, rng):
    pdf = assets.where("kind = 'image'").toPandas()
    got = {r.asset_id: r for r in image_features(assets).collect()}
    assert len(got) == 6
    for r in pdf.itertuples(index=False):
        img = FakeCodec.decode_image(bytes(r.blob), r.width, r.height)
        luma = img.astype(np.float64).mean(axis=2)
        assert abs(got[r.asset_id].mean_luma - luma.mean()) < 1e-9
        assert abs(got[r.asset_id].aspect_ratio - r.width / r.height) < 1e-9


def test_image_resize_shapes(assets):
    out = image_resize(assets, 16, 12).collect()
    assert len(out) == 6
    for r in out:
        px = np.frombuffer(r.pixels, dtype=np.uint8)
        assert px.size == 16 * 12 * 3
        assert r.width == 16 and r.height == 12


def test_video_frame_fanout(assets):
    frames = video_frame_sample(assets, every_ms=1000, frame_w=8, frame_h=8).collect()
    # 3500ms → 3 frames each for 2 videos
    assert len(frames) == 6
    idx = {(r.asset_id, r.frame_idx) for r in frames}
    assert (9, 0) in idx and (9, 2) in idx and (10, 1) in idx
    for r in frames:
        assert len(r.pixels) == 8 * 8 * 3
        assert r.ts_ms == r.frame_idx * 1000


def test_audio_features(assets):
    got = {r.asset_id: r for r in audio_features(assets).collect()}
    assert set(got) == {6, 7, 8}
    for r in got.values():
        assert r.n_samples == 16000 * 500 // 1000
        assert 0 < r.rms < 1
        assert r.zero_crossings > 0
