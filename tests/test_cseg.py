"""Pure-numpy compressed_segmentation codec tests: roundtrip sweeps,
LUT-only labels fast path, and the codecs.py integration (raw vs cseg
volume equality)."""

import numpy as np
import pytest

from cloud_volume_spark import codecs, cseg


@pytest.mark.parametrize("dtype", ["uint32", "uint64"])
@pytest.mark.parametrize("shape", [(8, 8, 8), (16, 16, 16), (13, 9, 5), (8, 8, 1)])
def test_roundtrip(dtype, shape, rng):
    arr = rng.integers(0, 50, size=shape).astype(dtype)
    blob = cseg.compress(arr)
    back = cseg.decompress(blob, shape, dtype)
    assert np.array_equal(back, arr)


@pytest.mark.parametrize("n_labels", [1, 2, 3, 16, 17, 256, 257, 70000])
def test_bit_widths(n_labels, rng):
    arr = rng.integers(0, n_labels, size=(8, 8, 8)).astype(np.uint32)
    blob = cseg.compress(arr)
    assert np.array_equal(cseg.decompress(blob, (8, 8, 8), "uint32"), arr)


def test_constant_block_zero_bits():
    arr = np.full((16, 16, 16), 7, dtype=np.uint32)
    blob = cseg.compress(arr)
    # 1 channel-table word + 8 blocks x (2 header + 1 LUT word)
    assert len(blob) == 4 * (1 + 8 * 2 + 8 * 1)
    assert np.array_equal(cseg.decompress(blob, (16, 16, 16), "uint32"), arr)


def test_channel_offset_table():
    # Neuroglancer spec: file opens with one uint32 per channel giving
    # the channel's word offset; single-channel files start with 1
    # (reference test/test_chunks.py asserts compressed[0] == 1).
    arr = np.arange(8 * 8 * 8, dtype=np.uint32).reshape((8, 8, 8))
    words = np.frombuffer(cseg.compress(arr), dtype=np.uint32)
    assert words[0] == 1


@pytest.mark.parametrize("dtype", ["uint32", "uint64"])
def test_cross_validate_c_wheel(dtype, rng):
    """Byte-level cross-check against the C compressed_segmentation
    wheel when installed (optional dep, mirroring the reference's
    gating at chunks.py:22-68)."""
    cs = pytest.importorskip("compressed_segmentation")
    arr = rng.integers(0, 1000, size=(16, 13, 9)).astype(dtype)
    ours = cseg.compress(arr)
    # theirs decodes ours …
    theirs_view = cs.decompress(
        ours, arr.shape, dtype=np.dtype(dtype), block_size=(8, 8, 8),
        order="F",
    )
    assert np.array_equal(np.asarray(theirs_view).reshape(arr.shape, order="F"), arr)
    # … and we decode theirs
    theirs = cs.compress(np.asfortranarray(arr), block_size=(8, 8, 8), order="F")
    assert np.array_equal(cseg.decompress(theirs, arr.shape, dtype), arr)


def test_labels_fast_path(rng):
    arr = rng.integers(0, 30, size=(16, 16, 8)).astype(np.uint64)
    blob = cseg.compress(arr)
    got = cseg.labels(blob, (16, 16, 8), "uint64")
    assert np.array_equal(got, np.unique(arr))


def test_codecs_integration(rng):
    arr = rng.integers(0, 100, size=(16, 12, 10, 1)).astype(np.uint32)
    blob = codecs.encode(arr, "compressed_segmentation")
    back = codecs.decode(blob, "compressed_segmentation", arr.shape, "uint32")
    assert np.array_equal(back, arr)
    got = codecs.labels(blob, "compressed_segmentation", arr.shape, "uint32")
    assert np.array_equal(got, np.unique(arr))


def test_volume_with_cseg_encoding(spark, rng, tmp_path):
    from cloud_volume_spark.geometry import Bbox
    from cloud_volume_spark.volume import Volume

    arr = rng.integers(0, 300, size=(64, 64, 32, 1)).astype(np.uint32)
    vol = Volume.from_numpy(
        spark, arr, str(tmp_path / "csegvol"), chunk_size=(32, 32, 32),
        encoding="compressed_segmentation",
    )
    out = vol.cutout(Bbox((5, 9, 3), (60, 50, 30)))
    assert np.array_equal(out, arr[5:60, 9:50, 3:30, :])
    got = {r.label for r in vol.unique().collect()}
    assert got == set(np.unique(arr).tolist())


def test_rejects_float():
    with pytest.raises(ValueError):
        cseg.compress(np.zeros((8, 8, 8), dtype=np.float32))
