"""Codec kernel fidelity (reference test/test_chunks.py pattern)."""

import numpy as np
import pytest

from cloud_volume_spark import codecs


@pytest.mark.parametrize("dtype", ["uint8", "uint16", "uint32", "uint64", "float32"])
@pytest.mark.parametrize("compression", [None, "gzip", "zlib"])
def test_raw_roundtrip(dtype, compression):
    rng = np.random.default_rng(7)
    if np.issubdtype(np.dtype(dtype), np.integer):
        arr = rng.integers(0, 200, size=(17, 13, 9, 2)).astype(dtype)
    else:
        arr = rng.random(size=(17, 13, 9, 2)).astype(dtype)
    blob = codecs.compress_stream(codecs.encode(arr, "raw"), compression)
    back = codecs.decode(
        codecs.decompress_stream(blob, compression), "raw", arr.shape, dtype
    )
    assert np.array_equal(arr, back)


def test_raw_is_fortran_order_bytes():
    arr = np.arange(8, dtype=np.uint8).reshape((2, 2, 2, 1))
    blob = codecs.encode(arr, "raw")
    # F-order: x varies fastest
    assert blob == bytes(np.asfortranarray(arr).ravel(order="F"))


def test_read_voxel_raw_matches_decode():
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 255, size=(10, 11, 12, 3)).astype(np.uint8)
    blob = codecs.encode(arr, "raw")
    for pt in [(0, 0, 0), (9, 10, 11), (4, 5, 6)]:
        got = codecs.read_voxel(blob, "raw", arr.shape, "uint8", pt)
        assert np.array_equal(got, arr[pt[0], pt[1], pt[2], :])


def test_labels_and_contains():
    arr = np.zeros((8, 8, 8, 1), dtype=np.uint32)
    arr[0, 0, 0] = 7
    arr[3, 3, 3] = 42
    blob = codecs.encode(arr, "raw")
    assert set(codecs.labels(blob, "raw", arr.shape, "uint32")) == {0, 7, 42}
    assert codecs.contains(blob, "raw", arr.shape, "uint32", 42)
    assert not codecs.contains(blob, "raw", arr.shape, "uint32", 43)


def test_remap_array():
    arr = np.array([[1, 2], [3, 1]], dtype=np.uint32)
    out = codecs.remap_array(arr, {1: 10, 2: 20})
    assert out.tolist() == [[10, 20], [3, 10]]
    with pytest.raises(KeyError):
        codecs.remap_array(arr, {1: 10}, preserve_missing=False)


def test_mask_except():
    arr = np.array([0, 1, 2, 3, 1], dtype=np.uint32)
    out = codecs.mask_except(arr, [1])
    assert out.tolist() == [0, 1, 0, 0, 1]
    out2 = codecs.mask_except(arr, [2], preserve_zeros=True)
    assert out2.tolist() == [0, 0, 2, 0, 0]


def test_deterministic_gzip():
    data = b"hello world" * 100
    assert codecs.compress_stream(data, "gzip") == codecs.compress_stream(data, "gzip")


def test_npz_roundtrip_dtypes():
    import numpy as np
    from cloud_volume_spark import codecs

    rng = np.random.default_rng(9)
    for dt in (np.uint8, np.uint16, np.uint32, np.uint64, np.float32):
        if np.issubdtype(dt, np.floating):
            arr = rng.random((9, 7, 5, 1)).astype(dt)
        else:
            arr = rng.integers(0, 200, (9, 7, 5, 1)).astype(dt)
        blob = codecs.encode(arr, "npz")
        back = codecs.decode(blob, "npz", arr.shape, dt)
        assert np.array_equal(back, arr), dt


def test_npz_uint8_scales_unit_floats():
    import numpy as np
    from cloud_volume_spark import codecs

    arr = np.linspace(0.0, 1.0, 3 * 3 * 2).reshape(3, 3, 2, 1).astype(np.float32)
    blob = codecs.encode(arr, "npz_uint8")
    back = codecs.decode(blob, "npz_uint8", arr.shape, np.uint8)
    assert back.dtype == np.uint8
    assert np.array_equal(back, (arr * 255).astype(np.uint8))


def test_npz_decodes_reference_channel_first_layout():
    """A reference-produced npz stores a 3D chunk as (1, sx, sy, sz)
    (chunks.py:296-297); decode must map it back to (sx, sy, sz, 1)."""
    import io
    import zlib
    import numpy as np
    from cloud_volume_spark import codecs

    rng = np.random.default_rng(4)
    chunk = rng.integers(0, 99, (6, 5, 4), dtype=np.uint16)
    buf = io.BytesIO()
    np.save(buf, chunk[np.newaxis, ...])
    blob = zlib.compress(buf.getvalue())
    back = codecs.decode(blob, "npz", (6, 5, 4, 1), np.uint16)
    assert np.array_equal(back[..., 0], chunk)


def test_npz_no_second_stage():
    from cloud_volume_spark import codecs

    assert codecs.should_compress("npz", "image") is None
    assert codecs.should_compress("npz_uint8", "image") is None


def test_brotli_second_stage_gated():
    from cloud_volume_spark import codecs

    if codecs.HAS_BROTLI:
        data = b"chunk payload " * 100
        assert codecs.decompress_stream(
            codecs.compress_stream(data, "br"), "br"
        ) == data
    else:
        import pytest as _pytest
        with _pytest.raises(codecs.EncodingUnavailable, match="brotli"):
            codecs.compress_stream(b"x", "br")
        with _pytest.raises(codecs.EncodingUnavailable, match="brotli"):
            codecs.decompress_stream(b"x", "br")


def test_encode_params_drive_jpeg_and_png_bytes():
    """The per-scale tuning dict (VolumeInfo.compression_params) must
    actually change the bytes: lower jpeg quality -> different (and
    smaller) stream; png level 0 -> larger-than-default stream."""
    from cloud_volume_spark import codecs

    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, size=(64, 64, 4, 1)).astype(np.uint8)
    hi = codecs.encode(img, "jpeg", params={"level": 95})
    lo = codecs.encode(img, "jpeg", params={"level": 20})
    default = codecs.encode(img, "jpeg")
    assert hi != lo and len(lo) < len(hi)
    assert default not in (hi, lo)

    p9 = codecs.encode(img, "png", params={"level": 9})
    p0 = codecs.encode(img, "png", params={"level": 0})
    assert len(p0) > len(p9)
    assert np.array_equal(
        codecs.decode(p0, "png", (64, 64, 4, 1), np.uint8),
        codecs.decode(p9, "png", (64, 64, 4, 1), np.uint8),
    )


def test_cseg_block_size_param_roundtrip():
    """A non-default compressed_segmentation_block_size must thread
    through params to BOTH encode and decode — decoding with the
    (8,8,8) default would garble the volume."""
    from cloud_volume_spark import codecs

    rng = np.random.default_rng(6)
    img = rng.integers(0, 500, size=(32, 32, 16, 1)).astype(np.uint32)
    params = {"block_size": (16, 16, 8)}
    blob = codecs.encode(img, "compressed_segmentation", params=params)
    out = codecs.decode(blob, "compressed_segmentation",
                        (32, 32, 16, 1), np.uint32, params=params)
    assert np.array_equal(out, img)
    blob8 = codecs.encode(img, "compressed_segmentation")
    assert blob != blob8  # block size genuinely changes the stream

def test_cseg_block_size_param_reaches_labels_contains_read_voxel():
    """labels/contains/read_voxel share decode's params plumbing — with
    the (8,8,8) default they would return garbage label stats (which
    drive pruning) and wrong point reads for a non-default layer."""
    from cloud_volume_spark import codecs

    rng = np.random.default_rng(7)
    img = rng.integers(0, 300, size=(32, 32, 16, 1)).astype(np.uint32)
    params = {"block_size": (16, 16, 8)}
    blob = codecs.encode(img, "compressed_segmentation", params=params)

    got = codecs.labels(blob, "compressed_segmentation",
                        (32, 32, 16, 1), np.uint32, params=params)
    assert np.array_equal(got, np.unique(img))
    lbl = int(img[3, 5, 7, 0])
    assert codecs.contains(blob, "compressed_segmentation",
                           (32, 32, 16, 1), np.uint32, lbl, params=params)
    vox = codecs.read_voxel(blob, "compressed_segmentation",
                            (32, 32, 16, 1), np.uint32, (3, 5, 7),
                            params=params)
    assert int(vox[0]) == lbl


def test_encoding_level_keys_accept_both_jxl_spellings():
    """The reference spells JPEG-XL 'jxl' in compression_params but
    'jpegxl' in add_scale — a level declared under either spelling
    must round-trip to the codec params."""
    from cloud_volume_spark.catalog import ENCODING_LEVEL_KEYS, VolumeInfo

    assert ENCODING_LEVEL_KEYS["jxl"] == "jxl_quality"
    assert ENCODING_LEVEL_KEYS["jpegxl"] == "jxl_quality"
    for spelling in ("jxl", "jpegxl"):
        info = VolumeInfo.create(
            layer_type="image", data_type="uint8", num_channels=1,
            resolution=(4, 4, 40), voxel_offset=(0, 0, 0),
            volume_size=(64, 64, 64), chunk_size=(32, 32, 32),
            encoding=spelling, encoding_level=90,
        )
        assert info.scale(0)["jxl_quality"] == 90
        assert info.compression_params(0)["level"] == 90


def test_multichannel_png_jpeg_decode_is_true_inverse():
    """The ravel→F-reshape decode trick only inverts the 2D image
    layout for single-channel chunks; c>1 png (lossless: exact) and
    RGB jpeg (lossy: close) must round-trip through the explicit
    (sz,sy,sx,c) inverse, not return scrambled channels."""
    rng = np.random.default_rng(9)
    a = rng.integers(0, 255, (6, 5, 4, 3)).astype(np.uint8)
    back = codecs.decode(codecs.encode(a, "png"), "png", a.shape, np.uint8)
    assert np.array_equal(back, a)
    # jpeg is lossy — structure must survive (mean abs error small,
    # channels not swapped)
    smooth = np.zeros((16, 16, 2, 3), np.uint8)
    smooth[..., 0] = 200  # red-ish everywhere
    smooth[..., 2] = 30
    back = codecs.decode(
        codecs.encode(smooth, "jpeg"), "jpeg", smooth.shape, np.uint8)
    assert abs(int(back[..., 0].mean()) - 200) < 12
    assert abs(int(back[..., 2].mean()) - 30) < 12


def test_remap_honors_codec_params():
    """remap() must decode AND re-encode with the scale's declared
    codec params — a non-default cseg block size mis-decoded before
    (reshape error or silent garbage), and the rewritten blob fell
    back to the default dialect."""
    rng = np.random.default_rng(11)
    a = rng.integers(1, 50, (8, 8, 4, 1)).astype(np.uint32)
    params = {"block_size": (4, 4, 4)}
    blob = codecs.encode(a, "compressed_segmentation", params=params)
    out = codecs.remap(
        blob, "compressed_segmentation", a.shape, np.uint32,
        {1: 1001}, params=params)
    back = codecs.decode(out, "compressed_segmentation", a.shape,
                         np.uint32, params=params)
    want = a.copy()
    want[a == 1] = 1001
    assert np.array_equal(back, want)


def test_multichannel_single_label_codecs_refuse():
    """crackle/compresso encode one channel at a time: a 2-channel
    chunk must raise, not silently store channel 0 only."""
    a = np.ones((4, 4, 4, 2), np.uint32)
    with pytest.raises((ValueError, codecs.EncodingUnavailable)):
        codecs.encode(a, "crackle")
    with pytest.raises(ValueError, match="one channel"):
        codecs.encode(a, "compresso")
