"""Morton code golden constants — pinned to the reference's own test
values (test/test_sharding.py:70-98)."""

import numpy as np
import pytest

from cloud_volume_spark.chunking import compressed_morton_code, decode_morton


def test_golden_constants_3x3x3():
    cmc = lambda c: compressed_morton_code(c, (3, 3, 3))
    assert cmc((0, 0, 0)) == 0b000000
    assert cmc((1, 0, 0)) == 0b000001
    assert cmc((2, 0, 0)) == 0b001000
    assert cmc((2, 2, 0)) == 0b011000
    assert cmc((2, 2, 1)) == 0b011100
    with pytest.raises(ValueError):
        cmc((3, 0, 0))


def test_golden_constants_anisotropic():
    cmc = lambda c: compressed_morton_code(c, (2, 3, 1))
    assert cmc((0, 0, 0)) == 0b000000
    assert cmc((1, 0, 0)) == 0b000001
    assert cmc((1, 2, 0)) == 0b000101
    with pytest.raises(ValueError):
        cmc((0, 0, 7))
    assert np.array_equal(
        compressed_morton_code([(0, 0, 0), (1, 2, 0)], (2, 3, 1)),
        [0b000000, 0b000101],
    )
    assert compressed_morton_code((3, 3, 0), (4, 4, 1)) == 0b1111
    assert compressed_morton_code((5, 5, 0), (8, 8, 2)) == 0b1100011


def test_decode_inverse():
    grid = (8, 8, 2)
    for pt in [(0, 0, 0), (5, 5, 0), (7, 7, 1), (3, 1, 1)]:
        code = compressed_morton_code(pt, grid)
        assert decode_morton(int(code), grid) == pt
