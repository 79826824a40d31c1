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


# ---------------------------------------------------------------------------
# independent exact-value oracles: recompute every operator's expected
# output from the spec with hashlib directly (no FakeCodec reuse), so a
# codec regression cannot self-verify.
# ---------------------------------------------------------------------------

def _stream_hex(seed_hex: str, n: int) -> np.ndarray:
    import hashlib
    reps = (n + 15) // 16
    raw = b"".join(
        hashlib.md5((seed_hex + "|" + str(i)).encode()).digest()
        for i in range(reps)
    )
    return np.frombuffer(raw, dtype=np.uint8)[:n]


def _stream(blob: bytes, n: int) -> np.ndarray:
    import hashlib
    return _stream_hex(hashlib.md5(blob).hexdigest(), n)


FIXED_BLOB = b"multimodal-oracle-fixture"


def test_image_features_exact_oracle(spark):
    w, h = 16, 8
    df = spark.createDataFrame(
        [(1, "image", FIXED_BLOB, "fake", w, h, None, None)],
        schema=ASSET_SCHEMA,
    )
    r = image_features(df).collect()[0]
    img = _stream(FIXED_BLOB, w * h * 3).reshape(h, w, 3)
    # spec: exact integer sums + one fixed float expression (bit-
    # deterministic across engines), entropy from the byte histogram
    import math
    s3 = img.astype(np.int64).sum(axis=2)
    s1, s2, npx = int(s3.sum()), int((s3 * s3).sum()), w * h
    mean = s1 / (3.0 * npx)
    hist = np.bincount(img.ravel(), minlength=256)
    p = hist[hist > 0] / hist.sum()
    assert r.mean_luma == mean
    assert r.std_luma == math.sqrt(s2 / (9.0 * npx) - mean * mean)
    assert r.entropy_bits == -(p * np.log2(p)).sum()
    assert r.aspect_ratio == w / h
    # sanity vs the numpy-float formulation (different rounding path)
    luma = img.astype(np.float64).mean(axis=2)
    assert abs(r.mean_luma - luma.mean()) < 1e-9
    assert abs(r.std_luma - luma.std()) < 1e-9


def test_image_resize_exact_oracle(spark):
    w, h, ow, oh = 16, 8, 4, 4
    df = spark.createDataFrame(
        [(1, "image", FIXED_BLOB, "fake", w, h, None, None)],
        schema=ASSET_SCHEMA,
    )
    r = image_resize(df, ow, oh).collect()[0]
    img = _stream(FIXED_BLOB, w * h * 3).reshape(h, w, 3)
    ys = (np.arange(oh) * h // oh).astype(np.int64)
    xs = (np.arange(ow) * w // ow).astype(np.int64)
    assert bytes(r.pixels) == img[np.ix_(ys, xs)].tobytes()


def test_video_frames_exact_oracle(spark):
    df = spark.createDataFrame(
        [(1, "video", FIXED_BLOB, "fake", 64, 48, None, 2500)],
        schema=ASSET_SCHEMA,
    )
    rows = sorted(
        video_frame_sample(df, every_ms=1000, frame_w=8, frame_h=8).collect(),
        key=lambda r: r.frame_idx,
    )
    assert [r.frame_idx for r in rows] == [0, 1]
    import hashlib
    for r in rows:
        fseed = hashlib.md5(
            (hashlib.md5(FIXED_BLOB).hexdigest() + "#" + str(r.frame_idx)).encode()
        ).hexdigest()
        want = _stream_hex(fseed, 8 * 8 * 3)
        assert bytes(r.pixels) == want.tobytes()


def test_audio_features_exact_oracle(spark):
    sr, dur = 8000, 250
    df = spark.createDataFrame(
        [(1, "audio", FIXED_BLOB, "fake", None, None, sr, dur)],
        schema=ASSET_SCHEMA,
    )
    r = audio_features(df).collect()[0]
    n = sr * dur // 1000
    raw = _stream(FIXED_BLOB, n)
    # spec: rms of x=(b-127.5)/127.5 via the exact-sum closed form;
    # zero crossing = sign flip of x, i.e. of (b <= 127)
    import math
    s = float(((raw.astype(np.float64) - 127.5) ** 2).sum())
    neg = raw <= 127
    assert r.n_samples == n
    assert r.rms == math.sqrt(s / (127.5 * 127.5 * n))
    assert r.zero_crossings == int(np.sum(neg[1:] != neg[:-1]))
    # sanity vs the per-sample float32 normalization (decode_audio path)
    x = (raw.astype(np.float32) - 127.5) / 127.5
    assert abs(r.rms - float(np.sqrt((x.astype(np.float64) ** 2).mean()))) < 1e-6


@pytest.fixture()
def real_assets(spark, rng):
    """Assets whose blobs are ACTUAL encoded images (pure-Python PNG and
    JPEG encoders), so decode='real' exercises a genuine decode."""
    from cloud_volume_spark import jpeg_io, png_io

    imgs, rows = {}, []
    # smooth gradient (JPEG-friendly) and noise (PNG exact)
    y, x = np.mgrid[0:48, 0:64]
    grad = np.stack(
        [(x * 2) % 256, (y * 3) % 256, ((x + y) * 2) % 256], axis=-1
    ).astype(np.uint8)
    noise = rng.integers(0, 256, (32, 40, 3)).astype(np.uint8)
    gray = rng.integers(0, 256, (24, 24)).astype(np.uint8)
    imgs[0] = grad
    rows.append((0, "image", png_io.encode(grad), "png", 64, 48, None, None))
    imgs[1] = noise
    rows.append((1, "image", png_io.encode(noise), "png", 40, 32, None, None))
    imgs[2] = np.stack([gray] * 3, axis=-1)
    rows.append((2, "image", png_io.encode(gray), "png", 24, 24, None, None))
    imgs[3] = grad  # lossy — compared with tolerance
    rows.append(
        (3, "image", jpeg_io.encode(grad, quality=95), "jpeg", 64, 48, None, None)
    )
    return spark.createDataFrame(rows, schema=ASSET_SCHEMA), imgs


def test_real_decode_image_features(real_assets):
    assets, imgs = real_assets
    got = {r.asset_id: r for r in image_features(assets, decode="real").collect()}
    assert len(got) == 4
    for aid in (0, 1, 2):  # PNG: lossless, features must match exactly
        img = imgs[aid]
        luma = img.astype(np.float64).mean(axis=2)
        assert abs(got[aid].mean_luma - luma.mean()) < 1e-9
        assert abs(got[aid].aspect_ratio - img.shape[1] / img.shape[0]) < 1e-9
    # JPEG of a smooth gradient: decoded luma close to the source
    luma = imgs[3].astype(np.float64).mean(axis=2)
    assert abs(got[3].mean_luma - luma.mean()) < 2.0


def test_real_decode_image_resize(real_assets):
    assets, imgs = real_assets
    out = {
        r.asset_id: r
        for r in image_resize(assets, 16, 12, decode="real").collect()
    }
    img = imgs[1]  # PNG noise: resize must equal numpy nearest-neighbor
    h, w = img.shape[:2]
    ys = (np.arange(12) * h // 12).astype(np.int64)
    xs = (np.arange(16) * w // 16).astype(np.int64)
    want = img[np.ix_(ys, xs)]
    got = np.frombuffer(out[1].pixels, dtype=np.uint8).reshape(12, 16, 3)
    assert np.array_equal(got, want)


def test_real_decode_unknown_magic_raises():
    from cloud_volume_spark.multimodal import decode_image_real

    with pytest.raises(NotImplementedError, match="unrecognized image magic"):
        decode_image_real(b"\x00\x01\x02\x03 not an image")


def test_fake_queries_unchanged_by_real_path(assets):
    """The registered mm_* queries stay on the FakeCodec stream: default
    decode must be 'fake' and produce the oracle-parity values."""
    a = image_features(assets).collect()
    b = image_features(assets, decode="fake").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_decode_rgb_normalizes_depth_and_alpha(rng):
    """_decode_rgb's (H, W, 3) uint8 contract must hold for 16-bit and
    gray+alpha PNGs, not just 8-bit gray/RGB/RGBA."""
    from cloud_volume_spark import png_io
    from cloud_volume_spark.multimodal import _decode_rgb

    g16 = rng.integers(0, 2 ** 16, (10, 12)).astype(np.uint16)
    out = _decode_rgb("real", png_io.encode(g16), 12, 10)
    assert out.shape == (10, 12, 3) and out.dtype == np.uint8
    assert np.array_equal(out[:, :, 0], (g16 >> 8).astype(np.uint8))

    ga = rng.integers(0, 256, (8, 9, 2)).astype(np.uint8)
    out = _decode_rgb("real", png_io.encode(ga), 9, 8)
    assert out.shape == (8, 9, 3) and out.dtype == np.uint8
    assert np.array_equal(out[:, :, 0], ga[:, :, 0])  # alpha dropped

    rgba16 = rng.integers(0, 2 ** 16, (6, 7, 4)).astype(np.uint16)
    out = _decode_rgb("real", png_io.encode(rgba16), 7, 6)
    assert out.shape == (6, 7, 3) and out.dtype == np.uint8
    assert np.array_equal(out, (rgba16[:, :, :3] >> 8).astype(np.uint8))
