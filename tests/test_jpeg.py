"""Pure-Python baseline JPEG codec tests.

Lossy roundtrip tolerance mirrors the reference's jpeg behavior test
(``/root/reference/test/test_cloudvolume.py:1676``): encode, decode,
assert the reconstruction stays within a small per-pixel error bound.
"""

import struct

import numpy as np
import pytest

from cloud_volume_spark import codecs, jpeg_io


def _smooth(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return (
        128 + 80 * np.sin(xx / 9.0) * np.cos(yy / 7.0) + 20 * (xx / max(w, 1))
    ).clip(0, 255).astype(np.uint8)


def test_gray_roundtrip_tolerance():
    img = _smooth(40, 56)
    out = jpeg_io.decode(jpeg_io.encode(img, quality=90))
    assert out.shape == img.shape and out.dtype == np.uint8
    d = np.abs(out.astype(int) - img.astype(int))
    assert d.max() <= 4 and d.mean() <= 1.5


def test_rgb_roundtrip_tolerance():
    base = _smooth(40, 56)
    img = np.stack([base, 255 - base, base // 2 + 64], axis=-1).astype(np.uint8)
    out = jpeg_io.decode(jpeg_io.encode(img, quality=95))
    d = np.abs(out.astype(int) - img.astype(int))
    assert out.shape == img.shape
    assert d.max() <= 8 and d.mean() <= 2.0


def test_chroma_subsampled_roundtrip():
    """4:2:0 files (libjpeg's default geometry) must decode: exercises
    the decoder's multi-block MCU and upsampling paths."""
    base = _smooth(37, 43)
    img = np.stack([base, base, base], axis=-1).astype(np.uint8)
    blob = jpeg_io.encode(img, quality=92, subsample=True)
    out = jpeg_io.decode(blob)
    assert out.shape == img.shape
    # gray content -> chroma flat -> subsampling nearly lossless
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4


def test_quality_trades_size_for_error():
    img = _smooth(48, 48)
    lo, hi = jpeg_io.encode(img, quality=30), jpeg_io.encode(img, quality=95)
    assert len(lo) < len(hi)
    err_lo = np.abs(jpeg_io.decode(lo).astype(int) - img.astype(int)).mean()
    err_hi = np.abs(jpeg_io.decode(hi).astype(int) - img.astype(int)).mean()
    assert err_hi <= err_lo


def test_encode_deterministic():
    img = _smooth(24, 32)
    assert jpeg_io.encode(img, 85) == jpeg_io.encode(img, 85)


def test_noise_survives_q100():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (24, 24), dtype=np.uint8)
    out = jpeg_io.decode(jpeg_io.encode(img, quality=100))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_odd_dimensions_pad_and_crop():
    img = _smooth(13, 21)
    out = jpeg_io.decode(jpeg_io.encode(img, 92))
    assert out.shape == (13, 21)


def test_progressive_rejected_with_clear_error():
    img = _smooth(16, 16)
    blob = bytearray(jpeg_io.encode(img, 90))
    i = blob.find(b"\xFF\xC0")
    blob[i + 1] = 0xC2  # flip SOF0 -> SOF2
    with pytest.raises(jpeg_io.JpegError, match="progressive"):
        jpeg_io.decode(bytes(blob))


def test_not_a_jpeg_rejected():
    with pytest.raises(jpeg_io.JpegError, match="SOI"):
        jpeg_io.decode(b"\x00\x01\x02")


def test_encode_requires_uint8():
    with pytest.raises(ValueError, match="uint8"):
        jpeg_io.encode(np.zeros((8, 8), dtype=np.uint16))


def test_dri_restart_markers_decode():
    """Insert a DRI segment and restart markers by re-encoding the
    entropy stream in two restart intervals — the decoder must resync
    and reset DC predictors."""
    # craft via encoder internals: encode two MCU rows separately
    img = _smooth(16, 8)
    top = jpeg_io.encode(img[:8], 90)
    bot = jpeg_io.encode(img[8:], 90)

    def entropy(blob):
        i = blob.find(b"\xFF\xDA")
        ln = struct.unpack(">H", blob[i + 2:i + 4])[0]
        return blob[i + 4 + ln - 2:-2]

    i = top.find(b"\xFF\xDA")
    header = top[:i]
    ln = struct.unpack(">H", top[i + 2:i + 4])[0]
    sos = top[i:i + 2 + ln]
    # patch SOF height 8 -> 16
    j = header.find(b"\xFF\xC0")
    header = (
        header[:j + 5] + struct.pack(">H", 16) + header[j + 7:]
    )
    dri = b"\xFF\xDD" + struct.pack(">H", 4) + struct.pack(">H", 1)
    stitched = (
        header + dri + sos + entropy(top) + b"\xFF\xD0" + entropy(bot)
        + b"\xFF\xD9"
    )
    out = jpeg_io.decode(stitched)
    assert out.shape == (16, 8)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4


def test_codecs_jpeg_chunk_roundtrip():
    """Chunk-level contract: (sx, sy, sz, 1) uint8 -> jpeg -> back,
    tolerance-bounded (the reference's lossy transcode behavior)."""
    rng = np.random.default_rng(7)
    sx, sy, sz = 16, 16, 4
    # smooth volumetric data (EM-like), not pure noise
    x, y, z = np.mgrid[0:sx, 0:sy, 0:sz]
    vol = (
        120 + 60 * np.sin(x / 5.0) * np.cos(y / 4.0) + 10 * z
        + rng.normal(0, 3, (sx, sy, sz))
    ).clip(0, 255).astype(np.uint8)[..., np.newaxis]
    blob = codecs.encode(vol, "jpeg")
    back = codecs.decode(blob, "jpeg", (sx, sy, sz, 1), np.uint8)
    assert back.shape == vol.shape
    d = np.abs(back.astype(int) - vol.astype(int))
    assert d.max() <= 15 and d.mean() <= 3.0


def test_codecs_jpeg_no_second_stage_compression():
    assert codecs.should_compress("jpeg", "image") is None


def test_volume_jpeg_end_to_end(spark, tmp_path):
    """Volume written with encoding='jpeg' reads back within lossy
    tolerance through the full Spark write/read path."""
    from cloud_volume_spark import Bbox, Volume

    x, y, z = np.mgrid[0:64, 0:64, 0:16]
    arr = (
        120 + 60 * np.sin(x / 5.0) * np.cos(y / 4.0) + 5 * z
    ).clip(0, 255).astype(np.uint8)[..., np.newaxis]
    vol = Volume.from_numpy(
        spark, arr, str(tmp_path / "jvol"), chunk_size=(32, 32, 8),
        encoding="jpeg", layer_type="image",
    )
    out = vol.cutout(Bbox((0, 0, 0), (64, 64, 16)))
    d = np.abs(out.astype(int) - arr.astype(int))
    assert d.max() <= 15 and d.mean() <= 3.0


def test_transfer_transcode_raw_to_jpeg(spark, tmp_path):
    """Lossy transcode transfer (the reference's transcode strategy,
    xfer.py + chunks.py transcode): raw uint8 volume re-encoded to
    jpeg on copy, destination reads back within lossy tolerance."""
    from cloud_volume_spark import Bbox, Volume

    x, y, z = np.mgrid[0:32, 0:32, 0:8]
    arr = (
        100 + 70 * np.sin(x / 6.0) * np.cos(y / 5.0) + 6 * z
    ).clip(0, 255).astype(np.uint8)[..., np.newaxis]
    vol = Volume.from_numpy(
        spark, arr, str(tmp_path / "src"), chunk_size=(16, 16, 4),
        layer_type="image",
    )
    dest = vol.transfer_to(
        str(tmp_path / "dst"), encoding="jpeg", compression=None
    )
    assert dest.info.encoding(0) == "jpeg"
    out = dest.cutout(Bbox((0, 0, 0), (32, 32, 8)))
    d = np.abs(out.astype(int) - arr.astype(int))
    assert d.max() <= 15 and d.mean() <= 3.0


def test_fill_bytes_before_markers_are_skipped():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
    code; the decoder must not treat a fill 0xFF as the marker."""
    img = _smooth(24, 24)
    blob = jpeg_io.encode(img, quality=90)
    # inject fill bytes before every non-entropy marker after SOI
    out = bytearray(blob[:2])
    pos = 2
    # headers run until SOS; pad each marker there with 0xFF 0xFF
    while pos < len(blob):
        assert blob[pos] == 0xFF
        marker = blob[pos + 1]
        out += b"\xFF\xFF" + blob[pos:pos + 2]
        seglen = struct.unpack(">H", blob[pos + 2:pos + 4])[0]
        out += blob[pos + 2:pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDA:  # SOS: rest is entropy-coded + EOI
            out += blob[pos:]
            break
    padded = jpeg_io.decode(bytes(out))
    assert np.array_equal(padded, jpeg_io.decode(blob))


def test_transfer_encoding_level_drives_jpeg_quality(spark, tmp_path):
    """A declared jpeg_quality must actually change the bytes written
    (reference metadata.py:556-599 plumbs per-scale codec params into
    encode): transcoding the same volume at quality 20 vs 95 yields
    different chunk streams (lower quality smaller), the destination
    info records the declared level, and it survives commit/reload."""
    from cloud_volume_spark import Volume
    from cloud_volume_spark.catalog import VolumeInfo

    x, y, z = np.mgrid[0:32, 0:32, 0:8]
    arr = (
        100 + 70 * np.sin(x / 6.0) * np.cos(y / 5.0) + 6 * z
    ).clip(0, 255).astype(np.uint8)[..., np.newaxis]
    vol = Volume.from_numpy(
        spark, arr, str(tmp_path / "qsrc"), chunk_size=(16, 16, 4),
        layer_type="image",
    )
    lo = vol.transfer_to(str(tmp_path / "qlo"), encoding="jpeg",
                         compression=None, encoding_level=20)
    hi = vol.transfer_to(str(tmp_path / "qhi"), encoding="jpeg",
                         compression=None, encoding_level=95)
    assert lo.info.scale(0)["jpeg_quality"] == 20
    assert hi.info.scale(0)["jpeg_quality"] == 95
    lo_bytes = sum(len(r.blob) for r in lo.chunks_df().collect())
    hi_bytes = sum(len(r.blob) for r in hi.chunks_df().collect())
    assert lo_bytes < hi_bytes
    # quality 95 must track the source much closer than quality 20
    from cloud_volume_spark import Bbox
    full = Bbox((0, 0, 0), (32, 32, 8))
    d_hi = np.abs(hi.cutout(full).astype(int) - arr.astype(int)).mean()
    d_lo = np.abs(lo.cutout(full).astype(int) - arr.astype(int)).mean()
    assert d_hi < d_lo

    # info roundtrip: declared params survive commit + reload
    reloaded = Volume.open(spark, str(tmp_path / "qlo")).info
    assert reloaded.scale(0)["jpeg_quality"] == 20
    assert reloaded.compression_params(0) == {"level": 20}

    # create() maps encoding_level to the encoding's tuning key
    info = VolumeInfo.create(
        layer_type="image", data_type="uint8", num_channels=1,
        resolution=(1, 1, 1), voxel_offset=(0, 0, 0),
        volume_size=(64, 64, 8), chunk_size=(16, 16, 4),
        encoding="png", encoding_level=3, max_mip=1,
    )
    assert all(s["png_level"] == 3 for s in info.info["scales"])
