"""Multi-LOD mesh manifest wire format + quantization transforms."""

import struct

import numpy as np
import pytest

from cloud_volume_spark.multilod import (
    MultiLodManifest, from_stored_model_space, to_stored_model_space,
)


def _sample():
    return MultiLodManifest(
        chunk_shape=(64, 64, 40),
        grid_origin=(0, 0, 0),
        lod_scales=(1.0, 2.0, 4.0),
        vertex_offsets=np.zeros((3, 3), np.float32),
        fragment_positions=[
            [(0, 0, 0), (1, 0, 0), (0, 1, 0), (1, 1, 1)],
            [(0, 0, 0), (0, 0, 1)],
            [(0, 0, 0)],
        ],
        fragment_offsets=[[100, 220, 0, 48], [300, 52], [512]],
        segment_id=77,
    )


def test_manifest_binary_roundtrip():
    m = _sample()
    blob = m.to_binary()
    assert len(blob) == len(m)
    back = MultiLodManifest.from_binary(blob, segment_id=77)
    assert back == m
    assert back.num_lods == 3
    assert list(back.num_fragments_per_lod) == [4, 2, 1]
    assert np.array_equal(back.fragment_positions[0][3], [1, 1, 1])
    assert list(back.fragment_offsets[1]) == [300, 52]


def test_manifest_header_layout():
    """Field-by-field against the spec: chunk_shape, grid_origin,
    num_lods, lod_scales, vertex_offsets, num_fragments_per_lod."""
    m = _sample()
    blob = m.to_binary()
    assert struct.unpack_from("<3f", blob, 0) == (64.0, 64.0, 40.0)
    assert struct.unpack_from("<3f", blob, 12) == (0.0, 0.0, 0.0)
    assert struct.unpack_from("<I", blob, 24) == (3,)
    assert struct.unpack_from("<3f", blob, 28) == (1.0, 2.0, 4.0)
    # num_fragments_per_lod sits after lod_scales + vertex_offsets
    off = 28 + 12 + 36
    assert struct.unpack_from("<3I", blob, off) == (4, 2, 1)
    # lod-0 fragment positions are column-major (all x, all y, all z)
    xs = struct.unpack_from("<4I", blob, off + 12)
    assert xs == (0, 1, 0, 1)


def test_manifest_truncation_detected():
    blob = _sample().to_binary()
    with pytest.raises(ValueError, match="size mismatch"):
        MultiLodManifest.from_binary(blob + b"\x00" * 4)


def test_fragment_byte_ranges():
    m = _sample()
    # lod 0 fragments start at 0 in manifest order
    assert m.fragment_byte_ranges(0) == [
        (0, 100), (100, 320), (320, 320), (320, 368)
    ]
    # lod 1 starts after all lod-0 bytes (368)
    assert m.fragment_byte_ranges(1) == [(368, 668), (668, 720)]
    assert m.fragment_byte_ranges(2) == [(720, 1232)]


def test_stored_model_space_roundtrip():
    m = _sample()
    rng = np.random.default_rng(11)
    bits = 10
    quantized = rng.integers(0, 2 ** bits, size=(64, 3)).astype(np.uint32)
    for lod, frag in [(0, 0), (0, 3), (1, 1), (2, 0)]:
        model = from_stored_model_space(quantized, m, lod, bits, frag)
        back = to_stored_model_space(model, m, lod, bits, frag)
        assert back.dtype == np.uint16
        assert np.array_equal(back.astype(np.uint32), quantized), (lod, frag)


def test_stored_model_space_scaling():
    """lod doubles the chunk extent; quant max maps to the far corner."""
    m = _sample()
    bits = 8
    corner = np.full((1, 3), 255, np.uint32)
    v0 = from_stored_model_space(corner, m, 0, bits, 0)
    assert np.allclose(v0, [64, 64, 40])
    v1 = from_stored_model_space(corner, m, 1, bits, 0)
    assert np.allclose(v1, [128, 128, 80])


def test_draco_fragment_raises_precise_unsupported_error():
    """Externally produced draco fragments must fail with a precise,
    actionable error when DracoPy is absent — not a garbage parse."""
    from cloud_volume_spark.multilod import (
        UnsupportedMeshEncoding, decode_lod_fragment,
    )

    with pytest.raises(UnsupportedMeshEncoding, match="draco-encoded"):
        decode_lod_fragment(b"DRACO\x02\x02" + b"\x00" * 64)


def test_garbage_fragment_raises_unsupported_error():
    from cloud_volume_spark.multilod import (
        UnsupportedMeshEncoding, decode_lod_fragment,
    )

    with pytest.raises(UnsupportedMeshEncoding, match="unsupported codec"):
        decode_lod_fragment(b"\x05\x00\x00\x00\x01\x00\x00\x00" + b"\x00" * 7)
    with pytest.raises(UnsupportedMeshEncoding, match="too short"):
        decode_lod_fragment(b"\x01\x02")


def test_multilod_reput_keeps_latest_and_sidecar_persists(
        spark, tmp_path):
    """Re-putting a segid serves the NEW mesh deterministically
    (versioned keep-latest, not collect-order roulette), and the
    quantization width persists in a sidecar so a reopened layer
    cannot silently dequantize at the wrong bit width."""
    from cloud_volume_spark.multilod import (
        MultiLodMeshLayer, encode_lod_fragment,
    )

    vqb = 10
    layer = MultiLodMeshLayer(spark, str(tmp_path / "mlv"), vqb)
    rng = np.random.default_rng(5)

    def one_mesh(scale):
        v = rng.uniform(0, scale, (9, 3)).astype(np.float64)
        f = rng.integers(0, 9, (12, 3)).astype(np.uint32)
        manifest = MultiLodManifest(
            chunk_shape=(scale, scale, scale),
            grid_origin=(0, 0, 0),
            lod_scales=(1.0,),
            vertex_offsets=np.zeros((1, 3), np.float32),
            fragment_positions=[[(0, 0, 0)]],
            fragment_offsets=[[0]],
            segment_id=3,
        )
        qv = to_stored_model_space(v, manifest, 0, vqb, 0)
        payload = encode_lod_fragment(qv, f, vqb)
        manifest.fragment_offsets = [np.array([len(payload)])]
        return manifest, [[payload]], v

    m1, frags1, _ = one_mesh(10.0)
    layer.put(3, m1, frags1)
    m2, frags2, v2 = one_mesh(100.0)
    layer.put(3, m2, frags2)
    got_v, _ = layer.get(3)[3]
    # the SECOND mesh wins: its extent is ~100, the first's ~10
    assert got_v.max() > 20

    # reopened without the argument: sidecar supplies the width
    reopened = MultiLodMeshLayer(spark, str(tmp_path / "mlv"))
    assert reopened.vertex_quantization_bits == vqb
    # a contradicting explicit width refuses loudly
    with pytest.raises(ValueError, match="fact of the data"):
        MultiLodMeshLayer(spark, str(tmp_path / "mlv"), 16)


def test_multilod_import_refuses_compressed_data_encoding(
        spark, tmp_path):
    """A sharded archive with data_encoding='gzip' cannot have LOD
    byte ranges sliced from its values — import must refuse, not
    persist silently corrupt fragfiles."""
    import json as _json
    import os as _os

    from cloud_volume_spark.multilod import MultiLodMeshLayer

    src = str(tmp_path / "gz_arch")
    _os.makedirs(src)
    with open(_os.path.join(src, "info"), "w") as f:
        _json.dump({
            "@type": "neuroglancer_multilod_draco",
            "vertex_quantization_bits": 16,
            "sharding": {
                "@type": "neuroglancer_uint64_sharded_v1",
                "preshift_bits": 0, "hash": "murmurhash3_x86_128",
                "minishard_bits": 3, "shard_bits": 4,
                "minishard_index_encoding": "gzip",
                "data_encoding": "gzip",
            },
        }, f)
    layer = MultiLodMeshLayer(spark, str(tmp_path / "gz_in"))
    with pytest.raises(ValueError, match="data_encoding='raw'"):
        layer.import_sharded(src)


def test_multilod_write_guard_via_volume(spark, tmp_path):
    """vol.multilod_mesh inherits the volume's writability guard like
    mesh/skeleton do: a time-travel-pinned volume refuses multi-LOD
    writes."""
    from cloud_volume_spark.volume import Volume

    arr = np.zeros((32, 32, 32, 1), np.uint8)
    vol = Volume.from_numpy(spark, arr, str(tmp_path / "mlg"),
                            chunk_size=(32, 32, 32))
    pinned = Volume.open(spark, str(tmp_path / "mlg"), generation=1)
    with pytest.raises(Exception, match="read-only|pinned|time-travel"):
        pinned.multilod_mesh.put(1, None, [])
