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
