"""Property-based tests (hypothesis) for the pure kernels: Bbox
algebra, codecs, morton codes, crc32c — invariants rather than
examples. The reference has no property-based coverage (SURVEY §5);
these harden exactly the layers every Spark job leans on."""

import gzip

import numpy as np
from hypothesis import given, settings, strategies as st

from cloud_volume_spark import codecs
from cloud_volume_spark.chunking import compressed_morton_code
from cloud_volume_spark.geometry import Bbox
from cloud_volume_spark.zarr_io import crc32c

coords = st.integers(min_value=-512, max_value=512)
sizes = st.integers(min_value=1, max_value=257)
chunk_dims = st.integers(min_value=1, max_value=64)


@st.composite
def bboxes(draw):
    mins = [draw(coords) for _ in range(3)]
    return Bbox(mins, [m + draw(sizes) for m in mins])


@given(bboxes(), bboxes())
@settings(max_examples=200, deadline=None)
def test_intersection_commutes_and_contains(a, b):
    i1 = Bbox.intersection(a, b)
    i2 = Bbox.intersection(b, a)
    assert (i1.empty() and i2.empty()) or i1 == i2
    if not i1.empty():
        assert a.contains_bbox(i1) and b.contains_bbox(i1)


@given(bboxes(), st.tuples(chunk_dims, chunk_dims, chunk_dims))
@settings(max_examples=200, deadline=None)
def test_expand_shrink_alignment(bbox, cs):
    grown = bbox.expand_to_chunk_size(cs)
    assert grown.contains_bbox(bbox)
    for i in range(3):
        assert int(grown.minpt[i]) % cs[i] == 0
        assert int(grown.maxpt[i]) % cs[i] == 0
    shrunk = bbox.shrink_to_chunk_size(cs)
    if not shrunk.empty():
        assert bbox.contains_bbox(shrunk)


@given(bboxes(), st.tuples(chunk_dims, chunk_dims, chunk_dims))
@settings(max_examples=200, deadline=None)
def test_grid_ranges_cover_grid_coords(bbox, cs):
    (xlo, xhi), (ylo, yhi), (zlo, zhi) = bbox.grid_ranges(cs)
    pts = list(bbox.grid_coords(cs))
    assert pts, bbox
    for (cx, cy, cz) in pts:
        assert xlo <= cx <= xhi and ylo <= cy <= yhi and zlo <= cz <= zhi
    # range product equals the enumerated count (no phantom cells)
    assert len(pts) == (xhi - xlo + 1) * (yhi - ylo + 1) * (zhi - zlo + 1)


@given(
    st.sampled_from(["uint8", "uint16", "uint32", "uint64", "float32"]),
    st.tuples(
        st.integers(1, 16), st.integers(1, 16), st.integers(1, 16),
        st.integers(1, 3),
    ),
    st.integers(0, 2**31),
)
@settings(max_examples=100, deadline=None)
def test_raw_codec_roundtrip(dtype, shape, seed):
    rng = np.random.default_rng(seed)
    dt = np.dtype(dtype)
    if dt.kind == "f":
        arr = rng.standard_normal(shape).astype(dt)
    else:
        arr = rng.integers(0, np.iinfo(dt).max, size=shape, dtype=dt)
    blob = codecs.encode(arr, "raw")
    back = codecs.decode(blob, "raw", shape, dt)
    assert np.array_equal(back, arr)
    # voxel random access agrees with the full decode
    pt = tuple(rng.integers(0, s) for s in shape[:3])
    vox = codecs.read_voxel(blob, "raw", shape, dt, pt)
    assert np.array_equal(vox, arr[pt[0], pt[1], pt[2], :])


@given(st.binary(min_size=0, max_size=4096))
@settings(max_examples=100, deadline=None)
def test_gzip_stream_roundtrip(data):
    z = codecs.compress_stream(data, "gzip")
    assert codecs.decompress_stream(z, "gzip") == data
    # deterministic bytes (mtime pinned)
    assert codecs.compress_stream(data, "gzip") == z


@given(st.binary(min_size=0, max_size=2048))
@settings(max_examples=100, deadline=None)
def test_crc32c_matches_composition(data):
    # crc of concatenation differs from crc of parts unless empty —
    # sanity: appending a byte always changes the crc
    c = crc32c(data)
    assert crc32c(data + b"\x00") != c or data == b""
    assert 0 <= c <= 0xFFFFFFFF


@given(
    st.tuples(st.integers(1, 64), st.integers(1, 64), st.integers(1, 64)),
    st.integers(0, 2**31),
)
@settings(max_examples=150, deadline=None)
def test_morton_codes_bijective_on_grid(grid, seed):
    rng = np.random.default_rng(seed)
    n = min(64, grid[0] * grid[1] * grid[2])
    pts = np.stack([
        rng.integers(0, grid[i], size=n) for i in range(3)
    ], axis=1)
    codes = compressed_morton_code(pts, grid)
    uniq_pts = len({tuple(p) for p in pts.tolist()})
    assert len(set(codes.tolist())) == uniq_pts
    # codes fit the grid's bit budget
    import math
    bits = sum(int(math.ceil(math.log2(max(g, 1)))) for g in grid)
    assert all(int(c) < 2 ** max(bits, 1) for c in codes)


@given(
    st.sampled_from(["uint32", "uint64"]),
    st.tuples(st.integers(1, 20), st.integers(1, 20), st.integers(1, 12)),
    st.integers(1, 64),   # distinct label count: stresses LUT widths
    st.integers(0, 2**31),
)
@settings(max_examples=60, deadline=None)
def test_cseg_roundtrip_and_labels(dtype, shape, nlabels, seed):
    """Pure-numpy compressed_segmentation: roundtrip + LUT-only label
    listing agree with the array for arbitrary shapes (incl. non-
    block-aligned edges) and label cardinalities (bit-width sweep)."""
    from cloud_volume_spark import cseg

    rng = np.random.default_rng(seed)
    pool = rng.integers(0, 2**40, size=nlabels).astype(dtype)
    arr = np.asfortranarray(
        pool[rng.integers(0, nlabels, size=shape)][..., np.newaxis]
    )
    blob = cseg.compress(arr[..., 0], block_size=(8, 8, 8))
    back = cseg.decompress(blob, shape, np.dtype(dtype), block_size=(8, 8, 8))
    assert np.array_equal(back.reshape(shape), arr[..., 0])
    got = set(cseg.labels(blob, shape, np.dtype(dtype)).tolist())
    assert set(np.unique(arr).tolist()) == got


# ---------------------------------------------------------------------------
# codec properties: npz is lossless for any array; jpeg decode is total
# on encoder output with bounded error for any uint8 image
# ---------------------------------------------------------------------------

@given(
    st.tuples(
        st.integers(1, 24), st.integers(1, 24), st.integers(1, 6),
    ),
    st.sampled_from(["uint8", "uint16", "uint32", "float32"]),
    st.integers(0, 2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_npz_roundtrip_lossless(shape, dtype, seed):
    from cloud_volume_spark import codecs

    rng = np.random.default_rng(seed)
    full = shape + (1,)
    if dtype == "float32":
        arr = rng.standard_normal(full).astype(dtype)
    else:
        arr = rng.integers(0, np.iinfo(dtype).max, full).astype(dtype)
    blob = codecs.encode(arr, "npz")
    assert np.array_equal(codecs.decode(blob, "npz", full, dtype), arr)


@given(
    st.integers(1, 40), st.integers(1, 40),
    st.integers(1, 100), st.integers(0, 2**31 - 1),
)
@settings(max_examples=25, deadline=None)
def test_jpeg_decode_total_and_bounded(h, w, quality, seed):
    from cloud_volume_spark import jpeg_io

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    out = jpeg_io.decode(jpeg_io.encode(img, quality))
    assert out.shape == (h, w) and out.dtype == np.uint8
    # error bounded by quantization: q<=100 keeps every coefficient
    # within its table step; even pure noise stays within ~2x the
    # largest Annex-K luma step at the chosen quality
    if quality >= 95:
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 40


seg_dtypes = st.sampled_from(["uint16", "uint32", "uint64"])


@given(
    st.integers(min_value=1, max_value=20),
    st.integers(min_value=1, max_value=20),
    st.integers(min_value=1, max_value=6),
    st.integers(min_value=1, max_value=6),
    seg_dtypes,
    st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=60, deadline=None)
def test_compresso_roundtrip_property(sx, sy, sz, nlabels, dtype, seed):
    from cloud_volume_spark import compresso_io

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, nlabels, size=(sx, sy, sz)).astype(dtype)
    blob = compresso_io.compress(arr)
    assert np.array_equal(compresso_io.decompress(blob), arr)
    assert np.array_equal(compresso_io.labels(blob), np.unique(arr))


@given(
    st.integers(min_value=0, max_value=2**60 - 1),
    st.sets(st.integers(min_value=0, max_value=59), max_size=3),
)
@settings(max_examples=300, deadline=None)
def test_hamming_k_pigeonhole_property(print_a, flips):
    """The wide Hamming join's completeness rests on band arithmetic:
    with SIMHASH_K_BANDS bands over SIMHASH_K_BITS bits, ANY pair
    within distance SIMHASH_K_MAX_HAMMING must agree on at least one
    full band (k flips spoil at most k of k+1 bands). This pins the
    constants to each other — changing band count or width without
    re-deriving max-hamming breaks this long before the Spark test
    would notice."""
    from cloud_volume_spark.operators.dedup import (
        SIMHASH_K_BAND_BITS, SIMHASH_K_BAND_MASK, SIMHASH_K_BANDS,
        SIMHASH_K_BITS, SIMHASH_K_MAX_HAMMING,
    )

    assert SIMHASH_K_BANDS * SIMHASH_K_BAND_BITS == SIMHASH_K_BITS
    assert SIMHASH_K_MAX_HAMMING == SIMHASH_K_BANDS - 1
    print_b = print_a
    for f in flips:
        print_b ^= 1 << f
    assert bin(print_a ^ print_b).count("1") <= SIMHASH_K_MAX_HAMMING

    def bands(p):
        return [(p >> (j * SIMHASH_K_BAND_BITS)) & SIMHASH_K_BAND_MASK
                for j in range(SIMHASH_K_BANDS)]

    assert any(x == y for x, y in zip(bands(print_a), bands(print_b)))
    # and every band value stays a positive signed 64-bit int on both
    # engines (the 60-bit design point)
    assert all(0 <= v < 2**63 for v in bands(print_a) + [print_a])
