"""VolumeInfo catalog tests (create/add_scale/mip transforms/locks/
validation — reference metadata.py semantics)."""

import numpy as np
import pytest

from cloud_volume_spark.catalog import VolumeInfo
from cloud_volume_spark.geometry import Bbox


def _info(**kw):
    defaults = dict(
        layer_type="segmentation", data_type="uint32", num_channels=1,
        resolution=(4, 4, 40), voxel_offset=(0, 0, 0),
        volume_size=(2048, 2048, 512), chunk_size=(128, 128, 64),
        encoding="raw", max_mip=2,
    )
    defaults.update(kw)
    return VolumeInfo.create(**defaults)


def test_create_scales():
    info = _info()
    assert info.num_mips == 3
    assert info.key(0) == "4_4_40"
    assert info.key(1) == "8_8_40"  # factor (2,2,1)
    assert list(info.volume_size(1)) == [1024, 1024, 512]
    assert list(info.chunk_size(2)) == [128, 128, 64]


def test_bounds_and_grid():
    info = _info()
    assert info.bounds(0) == Bbox((0, 0, 0), (2048, 2048, 512))
    assert list(info.grid_shape(0)) == [16, 16, 8]


def test_mip_transforms():
    info = _info()
    b = Bbox((100, 100, 100), (300, 260, 200))
    b1 = info.bbox_to_mip(b, 0, 1)
    assert b1 == Bbox((50, 50, 100), (150, 130, 200))
    assert list(info.point_to_mip((101, 99, 77), 0, 1)) == [50, 49, 77]
    assert list(info.downsample_ratio(2)) == [4, 4, 1]


def test_add_scale_idempotent():
    info = _info(max_mip=0)
    s = info.add_scale((2, 2, 1))
    assert info.num_mips == 2
    # re-registering the same factor replaces, not duplicates
    info.add_scale((2, 2, 1))
    assert info.num_mips == 2
    assert s["size"] == [1024, 1024, 512]


def test_validation_cseg_dtype():
    with pytest.raises(ValueError):
        _info(data_type="float32", encoding="compressed_segmentation")
    # allowed for uint32
    _info(data_type="uint32", encoding="compressed_segmentation")


def test_validation_layer_type():
    with pytest.raises(ValueError):
        _info(layer_type="tensor")


def test_json_roundtrip(tmp_path):
    info = _info()
    info.lock_mips([1])
    info.commit(str(tmp_path))
    back = VolumeInfo.load(str(tmp_path))
    assert back.to_json() == info.to_json()
    assert back.locked_mips() == {1}
    with pytest.raises(PermissionError):
        back.check_mip_writable(1)
    back.unlock_mips([1])
    back.check_mip_writable(1)


def test_float_resolution_key():
    info = VolumeInfo.create(
        layer_type="image", data_type="uint8", num_channels=1,
        resolution=(4.5, 4.5, 40), voxel_offset=(0, 0, 0),
        volume_size=(64, 64, 64), chunk_size=(32, 32, 32),
    )
    assert info.key(0) == "4.5_4.5_40"


# ---- info redirects (reference metadata.py:224-293, test 1891) --------

def _commit_with_redirect(path, target=None):
    info = _info()
    if target is not None:
        info.info["redirect"] = target
    info.commit(path)
    return info


def test_redirect_chain_resolves(tmp_path):
    for i in range(5):
        _commit_with_redirect(
            str(tmp_path / f"r{i}"), target=str(tmp_path / f"r{i+1}"))
    _commit_with_redirect(str(tmp_path / "r5"))
    got = VolumeInfo.load(str(tmp_path / "r0"))
    assert got.base_path == str(tmp_path / "r5")
    assert len(got.redirected_from) == 5


def test_redirect_self_terminates(tmp_path):
    p = str(tmp_path / "self")
    _commit_with_redirect(p, target=p)
    got = VolumeInfo.load(p)
    assert got.base_path == p


def test_redirect_cycle_raises(tmp_path):
    from cloud_volume_spark.catalog import CyclicRedirectError
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    _commit_with_redirect(a, target=b)
    _commit_with_redirect(b, target=a)
    with pytest.raises(CyclicRedirectError):
        VolumeInfo.load(a)


def test_redirect_too_many_raises(tmp_path):
    from cloud_volume_spark.catalog import TooManyRedirectsError
    for i in range(12):
        _commit_with_redirect(
            str(tmp_path / f"t{i}"), target=str(tmp_path / f"t{i+1}"))
    _commit_with_redirect(str(tmp_path / "t12"))
    with pytest.raises(TooManyRedirectsError):
        VolumeInfo.load(str(tmp_path / "t0"), max_redirects=10)


def test_redirect_max_zero_skips_following(tmp_path):
    p = str(tmp_path / "z0")
    _commit_with_redirect(p, target=str(tmp_path / "z1"))
    got = VolumeInfo.load(p, max_redirects=0)
    assert got.base_path == p  # redirect not followed


def test_redirect_pure_stub_followed(tmp_path):
    """The reference's documented stub form — an info that is ONLY
    {"redirect": target}, no type/data_type/scales — must be followed,
    not rejected by validation before the redirect key is read."""
    import json as _json
    import os as _os

    final = str(tmp_path / "real")
    _commit_with_redirect(final)
    stub_dir = str(tmp_path / "stub")
    _os.makedirs(stub_dir)
    with open(_os.path.join(stub_dir, "info"), "w") as f:
        _json.dump({"redirect": final}, f)
    got = VolumeInfo.load(stub_dir)
    assert got.base_path == final
    assert got.redirected_from == [stub_dir]
    assert got.info["type"] == "segmentation"


def test_redirect_slash_variant_cycle_raises(tmp_path):
    """A cycle whose links differ only by a trailing slash must be
    caught as CyclicRedirectError, not burn the whole hop budget into
    TooManyRedirectsError."""
    from cloud_volume_spark.catalog import CyclicRedirectError

    a, b = str(tmp_path / "ca"), str(tmp_path / "cb")
    _commit_with_redirect(a, target=b)
    _commit_with_redirect(b, target=a + "/")
    with pytest.raises(CyclicRedirectError):
        VolumeInfo.load(a + "/")
