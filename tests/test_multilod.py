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
