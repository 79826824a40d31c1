"""Volume engine golden tests — numpy as oracle, mirroring the
reference's own strategy (test/layer_harness.py, test_cloudvolume.py)."""

import numpy as np
import pytest

from cloud_volume_spark.geometry import AlignmentError, Bbox, OutOfBoundsError
from cloud_volume_spark.volume import EmptyVolumeException, Volume


@pytest.fixture()
def image_vol(spark, rng, tmp_path):
    """F1 fixture: 128^3 uint8 image, chunk 64^3 (FIXTURES.md)."""
    arr = rng.integers(0, 255, size=(128, 128, 128, 1)).astype(np.uint8)
    vol = Volume.from_numpy(
        spark, arr, str(tmp_path / "image"), chunk_size=(64, 64, 64)
    )
    return vol, arr


@pytest.fixture()
def seg_vol(spark, rng, tmp_path):
    """F2 fixture: 128x128x64 uint32 segmentation, ~200 labels."""
    arr = rng.integers(0, 200, size=(128, 128, 64, 1)).astype(np.uint32)
    vol = Volume.from_numpy(
        spark, arr, str(tmp_path / "seg"), chunk_size=(64, 64, 64)
    )
    return vol, arr


def test_roundtrip_whole_volume(image_vol):
    vol, arr = image_vol
    out = vol.cutout(Bbox((0, 0, 0), (128, 128, 128)))
    assert out.dtype == arr.dtype
    assert np.array_equal(out, arr)


def test_roundtrip_unaligned_cutout(image_vol):
    vol, arr = image_vol
    out = vol.cutout(Bbox((10, 20, 30), (100, 90, 80)))
    assert np.array_equal(out, arr[10:100, 20:90, 30:80, :])


def test_getitem_slices(image_vol):
    vol, arr = image_vol
    assert np.array_equal(vol[5:20, 7:31, 64:70], arr[5:20, 7:31, 64:70, :])
    assert np.array_equal(vol[:, :, :], arr)


def test_bounded_raises(image_vol):
    vol, _ = image_vol
    with pytest.raises(OutOfBoundsError):
        vol.cutout(Bbox((0, 0, 0), (256, 128, 128)))


def test_autocrop(image_vol):
    vol, arr = image_vol
    vol.autocrop = True
    out = vol.cutout(Bbox((100, 100, 100), (200, 200, 200)))
    assert np.array_equal(out, arr[100:128, 100:128, 100:128, :])
    vol.autocrop = False


def test_aligned_write(image_vol, rng):
    vol, arr = image_vol
    patch = rng.integers(0, 255, size=(64, 64, 64, 1)).astype(np.uint8)
    vol.upload(patch, offset=(64, 64, 0))
    out = vol.cutout(Bbox((0, 0, 0), (128, 128, 128)))
    arr = arr.copy()
    arr[64:128, 64:128, 0:64, :] = patch
    assert np.array_equal(out, arr)


def test_non_aligned_write(image_vol, rng):
    vol, arr = image_vol
    patch = rng.integers(0, 255, size=(30, 30, 30, 1)).astype(np.uint8)
    vol.upload(patch, offset=(50, 50, 50))
    out = vol.cutout(Bbox((0, 0, 0), (128, 128, 128)))
    expected = arr.copy()
    expected[50:80, 50:80, 50:80, :] = patch
    assert np.array_equal(out, expected)


def test_setitem_scalar_broadcast(image_vol):
    vol, arr = image_vol
    vol[0:64, 0:64, 0:64] = 7
    out = vol[0:64, 0:64, 0:64]
    assert np.all(out == 7)


def test_setitem_shape_mismatch(image_vol, rng):
    vol, _ = image_vol
    with pytest.raises(AlignmentError):
        vol[0:10, 0:10, 0:10] = rng.integers(0, 255, size=(5, 5, 5, 1)).astype(np.uint8)


def test_fill_missing(spark, rng, tmp_path):
    arr = rng.integers(1, 255, size=(64, 64, 64, 1)).astype(np.uint8)
    vol = Volume.from_numpy(spark, arr, str(tmp_path / "fm"), chunk_size=(64, 64, 64))
    # widen the declared volume so chunks beyond the written one are missing
    vol.info.info["scales"][0]["size"] = [128, 128, 128]
    vol.info.commit(vol.base_path)
    with pytest.raises(EmptyVolumeException):
        vol.cutout(Bbox((0, 0, 0), (128, 128, 128)), fill_missing=False)
    out = vol.cutout(Bbox((0, 0, 0), (128, 128, 128)), fill_missing=True)
    assert np.array_equal(out[:64, :64, :64], arr)
    assert np.all(out[64:, :, :] == 0)


def test_background_color(spark, rng, tmp_path):
    arr = rng.integers(1, 255, size=(64, 64, 64, 1)).astype(np.uint8)
    vol = Volume.from_numpy(spark, arr, str(tmp_path / "bg"), chunk_size=(64, 64, 64))
    vol.info.info["background_color"] = 111
    vol.info.info["scales"][0]["size"] = [128, 64, 64]
    vol.info.commit(vol.base_path)
    out = vol.cutout(Bbox((0, 0, 0), (128, 64, 64)), fill_missing=True)
    assert np.all(out[64:, :, :] == 111)


def test_exists_and_delete(image_vol):
    vol, _ = image_vol
    ex = vol.exists(Bbox((0, 0, 0), (128, 128, 128)))
    assert len(ex) == 8 and all(ex.values())
    vol.delete(Bbox((0, 0, 0), (64, 128, 128)))
    ex = vol.exists(Bbox((0, 0, 0), (128, 128, 128)))
    assert sum(ex.values()) == 4
    assert not ex[(0, 0, 0)] and ex[(1, 1, 1)]


def test_delete_black_uploads(spark, tmp_path):
    arr = np.zeros((128, 64, 64, 1), dtype=np.uint8)
    arr[0:64] = 5
    vol = Volume.from_numpy(spark, arr, str(tmp_path / "dbu"), chunk_size=(64, 64, 64))
    vol.delete_all()
    vol.upload(arr, offset=(0, 0, 0), delete_black_uploads=True)
    ex = vol.exists(Bbox((0, 0, 0), (128, 64, 64)))
    assert ex[(0, 0, 0)] and not ex[(1, 0, 0)]
    out = vol.cutout(Bbox((0, 0, 0), (128, 64, 64)), fill_missing=True)
    assert np.array_equal(out, arr)


def test_delete_black_rewrite_removes_stale_chunks(spark, tmp_path):
    """An all-black rewrite of a previously-nonblack chunk must delete
    it even when its slab receives no surviving writes."""
    arr = np.full((128, 64, 64, 1), 5, dtype=np.uint8)
    vol = Volume.from_numpy(spark, arr, str(tmp_path / "dbr"), chunk_size=(64, 64, 64))
    black = np.zeros_like(arr)
    vol.upload(black, offset=(0, 0, 0), delete_black_uploads=True)
    ex = vol.exists(Bbox((0, 0, 0), (128, 64, 64)))
    assert not any(ex.values()), f"stale chunks survived: {ex}"
    out = vol.cutout(Bbox((0, 0, 0), (128, 64, 64)), fill_missing=True)
    assert np.array_equal(out, black)


def test_read_voxel(image_vol):
    vol, arr = image_vol
    for pt in [(0, 0, 0), (127, 127, 127), (63, 64, 65)]:
        assert np.array_equal(vol.read_voxel(pt), arr[pt[0], pt[1], pt[2], :])


def test_download_points(seg_vol, rng):
    vol, arr = seg_vol
    pts = [(int(x), int(y), int(z)) for x, y, z in
           rng.integers(0, (128, 128, 64), size=(20, 3))]
    got = {(r.x, r.y, r.z): r.value for r in vol.download_points(pts).collect()}
    for p in pts:
        assert got[p] == arr[p[0], p[1], p[2], 0]


def test_unique_whole_and_bbox(seg_vol):
    vol, arr = seg_vol
    got = {r.label for r in vol.unique().collect()}
    assert got == set(np.unique(arr).tolist())
    bbox = Bbox((10, 10, 10), (100, 70, 50))
    got2 = {r.label for r in vol.unique(bbox).collect()}
    assert got2 == set(np.unique(arr[10:100, 10:70, 10:50]).tolist())


def test_unique_approx(seg_vol):
    vol, arr = seg_vol
    n = vol.unique(approx=True).collect()[0].approx_labels
    true_n = len(np.unique(arr))
    assert abs(n - true_n) / true_n < 0.15


def test_label_mask_read(seg_vol):
    vol, arr = seg_vol
    lbl = int(arr[5, 5, 5, 0])
    mask = vol.cutout(Bbox((0, 0, 0), (128, 128, 64)), label=lbl)
    assert mask.dtype == bool
    assert np.array_equal(mask, arr == lbl)


def test_mask_except_read(seg_vol):
    vol, arr = seg_vol
    keep = [int(arr[0, 0, 0, 0]), int(arr[60, 60, 30, 0])]
    out = vol.cutout(Bbox((0, 0, 0), (128, 128, 64)), mask_except=keep)
    expected = np.where(np.isin(arr, keep), arr, 0)
    assert np.array_equal(out, expected)


def test_renumber(seg_vol):
    vol, arr = seg_vol
    out, remap = vol.cutout(Bbox((0, 0, 0), (64, 64, 64)), renumber=True)
    sub = arr[:64, :64, :64]
    assert len(remap) == len(np.unique(sub))
    # applying the inverse map restores the original
    inv = {v: k for k, v in remap.items()}
    restored = np.vectorize(inv.get)(out)
    assert np.array_equal(restored, sub)


def test_apply_remap(seg_vol):
    vol, arr = seg_vol
    mapping = {int(l): int(l) + 1000 for l in np.unique(arr)[:50]}
    vol.apply_remap(mapping)
    out = vol.cutout(Bbox((0, 0, 0), (128, 128, 64)))
    import cloud_volume_spark.codecs as codecs
    expected = codecs.remap_array(arr, mapping)
    assert np.array_equal(out, expected)


def test_downsample_image(spark, rng, tmp_path):
    arr = rng.integers(0, 255, size=(64, 64, 32, 1)).astype(np.uint8)
    vol = Volume.from_numpy(spark, arr, str(tmp_path / "ds"), chunk_size=(32, 32, 32))
    mip1 = vol.downsample(0, factor=(2, 2, 1))
    out = vol.cutout(Bbox((0, 0, 0), (32, 32, 32)), mip=mip1)
    expected = (
        arr.reshape(32, 2, 32, 2, 32, 1, 1).mean(axis=(1, 3, 5)).astype(np.uint8)
    )
    assert np.array_equal(out, expected)


def _mode_expect(arr, fx, fy, fz):
    """Independent mode oracle: majority label per block, ties to the
    smallest label; partial edge blocks reduce over present voxels."""
    from collections import Counter

    sx, sy, sz, nc = arr.shape
    ox, oy, oz = -(-sx // fx), -(-sy // fy), -(-sz // fz)
    out = np.zeros((ox, oy, oz, nc), dtype=arr.dtype)
    for i in range(ox):
        for j in range(oy):
            for k in range(oz):
                for c in range(nc):
                    block = arr[i * fx:(i + 1) * fx, j * fy:(j + 1) * fy,
                                k * fz:(k + 1) * fz, c].ravel()
                    cnt = Counter(block.tolist())
                    best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
                    out[i, j, k, c] = best[0]
    return out


def test_downsample_segmentation(spark, rng, tmp_path):
    """Segmentation downsample is block MODE (majority label, ties to
    smallest) — corner-sample striding loses thin structures whose
    labels miss block corners."""
    arr = rng.integers(0, 5, size=(64, 64, 32, 1)).astype(np.uint32)
    vol = Volume.from_numpy(spark, arr, str(tmp_path / "dsseg"), chunk_size=(32, 32, 32))
    mip1 = vol.downsample(0, factor=(2, 2, 1))
    out = vol.cutout(Bbox((0, 0, 0), (32, 32, 32)), mip=mip1)
    assert np.array_equal(out, _mode_expect(arr, 2, 2, 1))


def test_downsample_edge_partial_blocks(spark, rng, tmp_path):
    """Non-factor-multiple dimensions: the trailing partial block of
    edge chunks must be represented at the target mip (x-size 65 at
    factor 2 → 33 columns), for both mean and mode reductions."""
    # segmentation, 65 wide (chunk 32 → edge chunk width 1)
    arr = rng.integers(0, 5, size=(65, 32, 16, 1)).astype(np.uint32)
    vol = Volume.from_numpy(spark, arr, str(tmp_path / "dsp"),
                            chunk_size=(32, 32, 16))
    mip1 = vol.downsample(0, factor=(2, 2, 1))
    assert list(vol.info.volume_size(mip1)) == [33, 16, 16]
    out = vol.cutout(Bbox((0, 0, 0), (33, 16, 16)), mip=mip1)
    assert np.array_equal(out, _mode_expect(arr, 2, 2, 1))
    # image mean over partial tail (present voxels only)
    img = rng.integers(0, 255, size=(65, 32, 16, 1)).astype(np.uint8)
    ivol = Volume.from_numpy(spark, img, str(tmp_path / "dspi"),
                             chunk_size=(32, 32, 16))
    imip1 = ivol.downsample(0, factor=(2, 2, 1))
    iout = ivol.cutout(Bbox((0, 0, 0), (33, 16, 16)), mip=imip1)
    full = img[:64].reshape(32, 2, 16, 2, 16, 1, 1).mean(axis=(1, 3, 5)).astype(np.uint8)
    tail = img[64:65].reshape(1, 1, 16, 2, 16, 1, 1).mean(axis=(1, 3, 5)).astype(np.uint8)
    assert np.array_equal(iout[:32], full)
    assert np.array_equal(iout[32:], tail)


def test_downsample_with_voxel_offset(spark, rng, tmp_path):
    """Nonzero voxel_offset must not shift parent chunk keys (the grid
    is offset-relative; a floor(x0/(f*cs)) key would misplace every
    chunk for offset 128, chunk 64, factor 2)."""
    arr = rng.integers(0, 255, size=(128, 128, 64, 1)).astype(np.uint8)
    vol = Volume.from_numpy(
        spark, arr, str(tmp_path / "dsoff"), chunk_size=(64, 64, 64),
        voxel_offset=(128, 64, 32),
    )
    mip1 = vol.downsample(0, factor=(2, 2, 1))
    voff1 = vol.info.voxel_offset(mip1)
    size1 = vol.info.volume_size(mip1)
    out = vol.cutout(Bbox(voff1, np.add(voff1, size1)), mip=mip1)
    expected = (
        arr.reshape(64, 2, 64, 2, 64, 1, 1).mean(axis=(1, 3, 5)).astype(np.uint8)
    )
    assert np.array_equal(out, expected)


def test_transfer_roundtrip(image_vol, tmp_path):
    vol, arr = image_vol
    dest = vol.transfer_to(str(tmp_path / "xfer"), compression="zlib")
    out = dest.cutout(Bbox((0, 0, 0), (128, 128, 128)))
    assert np.array_equal(out, arr)


def test_multichannel_float(spark, rng, tmp_path):
    """F3 fixture: float32 3-channel affinities."""
    arr = rng.random(size=(64, 64, 64, 3)).astype(np.float32)
    vol = Volume.from_numpy(spark, arr, str(tmp_path / "aff"), chunk_size=(32, 32, 32))
    out = vol.cutout(Bbox((0, 0, 0), (64, 64, 64)))
    assert np.array_equal(out, arr)
    sub = vol[10:20, 10:20, 10:20]
    assert np.array_equal(sub, arr[10:20, 10:20, 10:20, :])


def test_voxels_df(spark, rng, tmp_path):
    arr = rng.integers(0, 9, size=(8, 8, 8, 1)).astype(np.uint32)
    vol = Volume.from_numpy(spark, arr, str(tmp_path / "vox"), chunk_size=(8, 8, 8))
    rows = vol.voxels_df().collect()
    assert len(rows) == 512
    for r in rows[:50]:
        assert r.value == arr[r.x, r.y, r.z, r.c]


def test_voxels_df_uint64_above_signed_range(spark, rng, tmp_path):
    """graphene-style ids above 2^63 must survive the relational view
    (Decimal(20,0), not a wrapped-negative signed long)."""
    big = np.uint64(2**63 + 12345)
    arr = np.full((8, 8, 8, 1), big, dtype=np.uint64)
    arr[0, 0, 0, 0] = np.uint64(7)
    vol = Volume.from_numpy(spark, arr, str(tmp_path / "vox64"), chunk_size=(8, 8, 8))
    rows = vol.voxels_df().collect()
    assert len(rows) == 512
    got = {int(r.value) for r in rows}
    assert got == {7, 2**63 + 12345}
    # unique() surfaces true unsigned values too
    labels = {int(r.label) for r in vol.unique().collect()}
    assert labels == {7, 2**63 + 12345}
    # label mask uses the same representation for stats skipping
    mask = vol.cutout(Bbox((0, 0, 0), (8, 8, 8)), label=int(big))
    assert mask[0, 0, 0, 0] == False  # noqa: E712
    assert mask[1:, :, :, :].all()


def test_mip_locks(image_vol, rng):
    vol, _ = image_vol
    vol.info.lock_mips([0])
    with pytest.raises(PermissionError):
        vol.upload(np.zeros((64, 64, 64, 1), dtype=np.uint8), offset=(0, 0, 0))
    vol.info.unlock_mips([0])


def test_blocks_df_large_path(image_vol):
    vol, arr = image_vol
    df = vol.blocks_df(Bbox((0, 0, 0), (128, 128, 128)))
    total = sum(
        (r.x1 - r.x0) * (r.y1 - r.y0) * (r.z1 - r.z0) for r in df.collect()
    )
    assert total == 128 ** 3


def test_downsample_background_init_and_no_phantom_scale(spark, rng, tmp_path):
    """(1) Sparse parents fill uncovered regions with background_color,
    agreeing with what the base mip serves there; (2) a downsample
    whose reduce job dies must NOT leave the scale advertised in the
    on-disk info (phantom empty mip)."""
    arr = np.full((32, 32, 16, 1), 200, dtype=np.uint8)
    vol = Volume.from_numpy(spark, arr, str(tmp_path / "dsbg"),
                            chunk_size=(16, 16, 16))
    vol.info.info["background_color"] = 255
    vol.info.commit(vol.base_path)
    # remove half the base chunks: the parent cell is sparsely covered
    vol.delete(Bbox((16, 0, 0), (32, 32, 16)))
    mip1 = vol.downsample(0, factor=(2, 2, 1))
    out = vol.cutout(Bbox((0, 0, 0), (16, 16, 16)), mip=mip1,
                     fill_missing=True)
    assert (out[:8] == 200).all()
    assert (out[8:] == 255).all()  # uncovered region = background, not 0

    # failed job → no phantom scale in the committed info
    from cloud_volume_spark.catalog import VolumeInfo
    vol2 = Volume.from_numpy(spark, arr, str(tmp_path / "dsfail"),
                             chunk_size=(16, 16, 16))
    n_scales = len(VolumeInfo.load(vol2.base_path).info["scales"])
    import cloud_volume_spark.volume as volmod
    orig = volmod._block_reduce

    def boom(*a, **k):
        raise RuntimeError("injected reduce failure")

    volmod._block_reduce = boom
    try:
        with pytest.raises(Exception):
            vol2.downsample(0, factor=(2, 2, 1))
    finally:
        volmod._block_reduce = orig
    assert len(VolumeInfo.load(vol2.base_path).info["scales"]) == n_scales
    # ... and not in the in-memory handle either: a later unrelated
    # info.commit must not publish the phantom scale
    assert len(vol2.info.info["scales"]) == n_scales
    vol2.info.commit(vol2.base_path)
    assert len(VolumeInfo.load(vol2.base_path).info["scales"]) == n_scales
    # a lock-refused downsample rolls back the registration the same way
    ok_mip = vol2.downsample(0, factor=(2, 2, 1))  # repair path works
    n_scales = len(vol2.info.info["scales"])
    vol2.info.lock_mips([ok_mip])
    with pytest.raises(PermissionError):
        vol2.downsample(0, factor=(2, 2, 1))
    vol2.info.unlock_mips([ok_mip])
    assert len(vol2.info.info["scales"]) == n_scales


def test_downsample_factor_must_divide_grid(spark, rng, tmp_path):
    """cs % factor != 0 would make interior chunks reduce to OVERLAPPING
    parent windows (nondeterministic winner) — refused loudly."""
    arr = rng.integers(0, 5, size=(30, 16, 16, 1)).astype(np.uint8)
    vol = Volume.from_numpy(spark, arr, str(tmp_path / "dsdiv"),
                            chunk_size=(15, 16, 16))
    with pytest.raises(ValueError, match="must divide"):
        vol.downsample(0, factor=(2, 1, 1))
    assert len(vol.info.info["scales"]) == 1  # nothing registered


def test_write_paths_validate_and_honor_locks(spark, rng, tmp_path):
    """upload_with_overwrite_partial_chunks gets upload()'s dtype and
    bounds gates; write_blocks_df refuses misaligned/mis-sized blocks;
    delete(None) is refused; every mutation path honors mip locks."""
    from cloud_volume_spark.volume import OutOfBoundsError

    arr = rng.integers(0, 100, size=(32, 32, 16, 1)).astype(np.uint32)
    vol = Volume.from_numpy(spark, arr, str(tmp_path / "wv"),
                            chunk_size=(16, 16, 16))
    with pytest.raises(ValueError, match="dtype"):
        vol.upload_with_overwrite_partial_chunks(
            np.zeros((16, 16, 16, 1), dtype=np.uint64), (0, 0, 0))
    with pytest.raises(OutOfBoundsError):
        vol.upload_with_overwrite_partial_chunks(
            np.zeros((32, 32, 16, 1), dtype=np.uint32), (16, 0, 0))
    with pytest.raises(ValueError, match="explicit bbox"):
        vol.delete(None)

    # write_blocks_df: wrong blob size and misaligned origin refuse
    good = np.zeros((16, 16, 16, 1), dtype=np.uint32)
    bad_rows = [(0, 16, 0, 16, 0, 16,
                 bytes(good.tobytes()[:-4]))]  # short blob
    bdf = spark.createDataFrame(
        bad_rows, "x0 int, x1 int, y0 int, y1 int, z0 int, z1 int, blob binary")
    with pytest.raises(Exception, match="bytes"):
        vol.write_blocks_df(bdf, merge=True)
    mis_rows = [(1, 17, 0, 16, 0, 16,
                 bytes(np.ascontiguousarray(good.transpose()).tobytes()))]
    mdf = spark.createDataFrame(
        mis_rows, "x0 int, x1 int, y0 int, y1 int, z0 int, z1 int, blob binary")
    with pytest.raises(Exception, match="grid"):
        vol.write_blocks_df(mdf, merge=True)
    # an INTERIOR sub-cell tile must refuse too: length-matched blob,
    # aligned origin, hi < cell_hi — committing it would make voxels
    # 8..15 of the cell silently read as background (the cell counts
    # as present) while read_voxel indexes past the stored extent
    half = np.zeros((8, 16, 16, 1), dtype=np.uint32)
    sub_rows = [(0, 8, 0, 16, 0, 16,
                 bytes(np.ascontiguousarray(half.transpose()).tobytes()))]
    sdf = spark.createDataFrame(
        sub_rows, "x0 int, x1 int, y0 int, y1 int, z0 int, z1 int, blob binary")
    with pytest.raises(Exception, match="whole chunk cell"):
        vol.write_blocks_df(sdf, merge=True)

    # grid-multiple but BELOW voxel_offset must refuse at the gate, not
    # uint64-wrap inside morton encoding
    ovol = Volume.from_numpy(spark, arr, str(tmp_path / "wvoff"),
                             chunk_size=(16, 16, 16), voxel_offset=(16, 0, 0))
    below = [(0, 16, 0, 16, 0, 16,
              bytes(np.ascontiguousarray(good.transpose()).tobytes()))]
    bldf = spark.createDataFrame(
        below, "x0 int, x1 int, y0 int, y1 int, z0 int, z1 int, blob binary")
    with pytest.raises(Exception, match="grid"):
        ovol.write_blocks_df(bldf, merge=True)

    # mip locks hold on every mutation path
    vol.info.lock_mips([0])
    blk = [(0, 16, 0, 16, 0, 16,
            bytes(np.ascontiguousarray(good.transpose()).tobytes()))]
    okdf = spark.createDataFrame(
        blk, "x0 int, x1 int, y0 int, y1 int, z0 int, z1 int, blob binary")
    for call in (
        lambda: vol.upload(arr[:16, :16, :16], (0, 0, 0)),
        lambda: vol.upload_with_overwrite_partial_chunks(
            arr[:16, :16, :16], (0, 0, 0)),
        lambda: vol.write_blocks_df(okdf),
        lambda: vol.delete(Bbox((0, 0, 0), (16, 16, 16))),
        lambda: vol.apply_remap({1: 2}),
    ):
        with pytest.raises(PermissionError):
            call()
    vol.info.unlock_mips([0])
    vol.delete(Bbox((0, 0, 0), (16, 16, 16)))  # unlocked works again
