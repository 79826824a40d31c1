"""Bbox/Vec algebra unit tests (reference test/test_lib.py semantics)."""

import numpy as np
import pytest

from cloud_volume_spark.geometry import (
    Bbox, OutOfBoundsError, Vec, reify_slices,
)


def test_vec_basic():
    v = Vec(1, 2, 3)
    assert v.x == 1 and v.y == 2 and v.z == 3
    assert tuple(v + 1) == (2, 3, 4)


def test_bbox_expand_to_chunk_size():
    b = Bbox((5, 5, 5), (10, 10, 10))
    e = b.expand_to_chunk_size((8, 8, 8))
    assert e == Bbox((0, 0, 0), (16, 16, 16))
    # anchored at offset
    e2 = Bbox((5, 5, 5), (10, 10, 10)).expand_to_chunk_size((8, 8, 8), (1, 1, 1))
    assert e2 == Bbox((1, 1, 1), (17, 17, 17))


def test_bbox_shrink_to_chunk_size():
    b = Bbox((5, 5, 5), (17, 17, 17))
    s = b.shrink_to_chunk_size((8, 8, 8))
    assert s == Bbox((8, 8, 8), (16, 16, 16))
    tiny = Bbox((1, 1, 1), (3, 3, 3)).shrink_to_chunk_size((8, 8, 8))
    assert tiny.empty()


def test_bbox_intersection_overlap():
    a = Bbox((0, 0, 0), (10, 10, 10))
    b = Bbox((5, 5, 5), (15, 15, 15))
    assert a.overlaps(b)
    assert Bbox.intersection(a, b) == Bbox((5, 5, 5), (10, 10, 10))
    c = Bbox((20, 20, 20), (30, 30, 30))
    assert not a.overlaps(c)
    assert Bbox.intersection(a, c).empty()


def test_bbox_filename_roundtrip():
    b = Bbox((0, 64, 128), (64, 128, 192))
    assert b.to_filename() == "0-64_64-128_128-192"
    assert Bbox.from_filename("prefix/0-64_64-128_128-192") == b
    assert Bbox.from_filename("0-64_64-128_128-192.gz") == b


def test_grid_coords_and_ranges():
    b = Bbox((0, 0, 0), (100, 100, 50))
    coords = list(b.grid_coords((64, 64, 64)))
    assert len(coords) == 4  # 2x2x1
    assert b.grid_ranges((64, 64, 64)) == ((0, 1), (0, 1), (0, 0))
    assert b.num_chunks((64, 64, 64)) == 4


def test_reify_slices_bounded():
    bounds = Bbox((0, 0, 0), (128, 128, 128))
    bbox, ch = reify_slices(np.s_[0:10, 5:20, 3], bounds)
    assert bbox == Bbox((0, 5, 3), (10, 20, 4))
    with pytest.raises(OutOfBoundsError):
        reify_slices(np.s_[0:999, 0:10, 0:10], bounds, bounded=True)
    clamped, _ = reify_slices(np.s_[0:999, 0:10, 0:10], bounds, autocrop=True)
    assert clamped == Bbox((0, 0, 0), (128, 10, 10))


def test_reify_negative_and_open():
    bounds = Bbox((0, 0, 0), (128, 128, 128))
    bbox, _ = reify_slices(np.s_[-10:, :, :64], bounds)
    assert bbox == Bbox((118, 0, 0), (128, 128, 64))


def test_scale_by():
    b = Bbox((3, 3, 3), (10, 10, 10))
    assert b.scale_by((2, 2, 1)) == Bbox((1, 1, 3), (5, 5, 10))


def test_negative_int_index_reifies_last_plane():
    """vol[-1] must mean the LAST plane: converting int -1 to
    slice(-1, 0) inverted the box (start normalized, stop=0 kept) and
    silently returned an empty region."""
    import numpy as np

    from cloud_volume_spark.geometry import reify_slices

    bounds = Bbox((0, 0, 0), (128, 128, 128))
    bbox, _ = reify_slices((-1, slice(None), slice(None)), bounds)
    assert list(bbox.minpt) == [127, 0, 0]
    assert list(bbox.maxpt) == [128, 128, 128]
    # other negatives keep working
    bbox, _ = reify_slices((-2, -1, 5), bounds)
    assert list(bbox.minpt) == [126, 127, 5]
    assert list(bbox.maxpt) == [127, 128, 6]
