"""Catalog/provenance parsing of the reference's checked-in real
metadata (``test/test_cv``, ``test/test_cv_sharded``) — the info files
production layers actually carry."""

import os

import pytest

from cloud_volume_spark.catalog import VolumeInfo
from cloud_volume_spark.sharding import ShardingSpecification

TEST_CV = "/root/reference/test/test_cv"
TEST_CV_SHARDED = "/root/reference/test/test_cv_sharded"


@pytest.mark.skipif(not os.path.isdir(TEST_CV), reason="fixture absent")
def test_load_real_multiscale_info():
    info = VolumeInfo.load(TEST_CV)
    assert info.layer_type == "segmentation"
    assert info.data_type == "uint32"
    assert info.num_mips == 5
    s0 = info.scale(0)
    assert s0["encoding"] == "compressed_segmentation"
    assert s0["compressed_segmentation_block_size"] == [8, 8, 8]
    assert s0["size"] == [2048, 2048, 512]
    # anisotropic pyramid: only x/y halve, z stays 40
    assert [s["resolution"] for s in info.info["scales"]][:3] == [
        [4, 4, 40], [8, 8, 40], [16, 16, 40]]
    assert info.info["mesh"] == "mesh_info"
    assert info.info["skeletons"] == "skeletons_mip_2"


@pytest.mark.skipif(not os.path.isdir(TEST_CV_SHARDED),
                    reason="fixture absent")
def test_load_real_sharded_info():
    info = VolumeInfo.load(TEST_CV_SHARDED)
    s0 = info.scale(0)
    assert s0["encoding"] == "compresso"
    spec = ShardingSpecification.from_dict(s0["sharding"])
    assert spec.preshift_bits == 9
    assert spec.hash == "identity"
    spec.validate()


@pytest.mark.skipif(not os.path.isdir(TEST_CV_SHARDED),
                    reason="fixture absent")
def test_load_real_provenance():
    from cloud_volume_spark.provenance import Provenance

    prov = Provenance.load(TEST_CV_SHARDED)
    d = prov.to_dict() if hasattr(prov, "to_dict") else prov.__dict__
    assert d  # parses without loss
