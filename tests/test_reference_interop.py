"""Reference-EXECUTED interop oracle (SURVEY §7.4 oracle 3).

Every other interop test checks against checked-in fixture goldens —
strong but static. This module goes further: it imports modules of the
reference implementation at ``/root/reference/cloudvolume`` and runs
the reference's OWN code against ours on randomized inputs. Only the
reference's cloud-service dependencies absent from this container
(tqdm, cloudfiles, osteoid) are replaced with inert stubs — none of
the logic under comparison lives in those packages.

Reference-executed surfaces:
  - ``lib.Bbox`` algebra (``lib.py:345``) vs ``geometry.Bbox``
  - vendored pure-python mmh3 (``datasource/precomputed/mmh3.py``) vs
    ``sharding.murmurhash3_x86_128`` / ``mmh3_hash64_low``
  - ``ShardingSpecification.compute_shard_location``
    (``sharding.py:154``) vs ``sharding.ShardingSpecification``
  - ``compressed_morton_code`` (``common.py:55``) vs
    ``chunking.compressed_morton_code``
  - ``PrecomputedAnnotationMetadata.annotation_dtype``
    (``annotation/metadata.py:432``) decoding OUR exported
    annotation layer — the reference's record layout over our bytes.

Skips cleanly when the reference checkout is absent.
"""
from __future__ import annotations

import gzip
import importlib.util
import json
import os
import struct
import sys
import types

import numpy as np
import pandas as pd
import pytest

REF_ROOT = "/root/reference/cloudvolume"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_ROOT), reason="reference checkout not present"
)


def _stub_module(name: str, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def _install_stubs():
    """Inert stand-ins for the reference's cloud-service deps. None of
    the logic under test lives in these packages: tqdm is a progress
    bar, cloudfiles is object-store IO (we never touch storage through
    the reference), osteoid contributes only skeleton exception
    types."""
    _stub_module("tqdm", tqdm=lambda it=None, **k: it)
    cf = _stub_module("cloudfiles", CloudFiles=object)
    exc = _stub_module(
        "cloudfiles.exceptions",
        CompressionError=type("CompressionError", (Exception,), {}),
        DecompressionError=type("DecompressionError", (Exception,), {}),
    )
    comp = _stub_module("cloudfiles.compression")
    # module-level `ALLOWED_PROTOCOLS = cloudfiles.paths.ALLOWED_PROTOCOLS`
    # in reference paths.py; never consumed by the code under test
    paths = _stub_module(
        "cloudfiles.paths",
        ALLOWED_PROTOCOLS=("gs", "s3", "file", "http", "https", "mem"),
    )
    cf.exceptions, cf.compression, cf.paths = exc, comp, paths
    _stub_module("osteoid")
    sys.modules["osteoid"].exceptions = _stub_module(
        "osteoid.exceptions",
        **{n: type(n, (Exception,), {}) for n in (
            "SkeletonUnassignedEdgeError", "SkeletonDecodeError",
            "SkeletonEncodeError", "SkeletonTransformError",
            "SkeletonAttributeMixingError")},
    )


def _synthetic_pkg(name: str, path: str):
    """Register a package WITHOUT executing the reference's
    ``__init__.py`` (those pull the full frontend stack); submodules
    still import normally via ``__path__``."""
    if name not in sys.modules:
        m = types.ModuleType(name)
        m.__path__ = [path]
        m.__package__ = name
        sys.modules[name] = m


_REF_CACHE: dict = {}


def load_ref(modname: str):
    """Import ``refcv.<modname>`` — the reference's own source file,
    executed, with relative imports resolving inside the reference
    tree."""
    if modname in _REF_CACHE:
        return _REF_CACHE[modname]
    _install_stubs()
    _synthetic_pkg("refcv", REF_ROOT)
    _synthetic_pkg("refcv.datasource", f"{REF_ROOT}/datasource")
    _synthetic_pkg("refcv.datasource.precomputed",
                   f"{REF_ROOT}/datasource/precomputed")
    _synthetic_pkg("refcv.datasource.precomputed.annotation",
                   f"{REF_ROOT}/datasource/precomputed/annotation")
    full = f"refcv.{modname}"
    if full not in sys.modules:
        spec = importlib.util.find_spec(full)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[full] = mod
        try:
            spec.loader.exec_module(mod)
        except Exception:
            del sys.modules[full]
            raise
    _REF_CACHE[modname] = sys.modules[full]
    return _REF_CACHE[modname]


def _rand_boxes(rng, n=150):
    """Random int boxes with assorted sizes/offsets, incl. degenerate."""
    mins = rng.integers(-512, 512, size=(n, 3))
    sizes = rng.integers(0, 300, size=(n, 3))
    return [(tuple(int(v) for v in mins[i]),
             tuple(int(mins[i][j] + sizes[i][j]) for j in range(3)))
            for i in range(n)]


def test_bbox_algebra_parity():
    """expand/shrink/round_to_chunk_size, intersection, containment,
    volume and filename grammar: the reference's own Bbox computes the
    same answers as geometry.Bbox over randomized boxes."""
    from cloud_volume_spark.geometry import Bbox as OurBbox

    ref = load_ref("lib")
    RefBbox = ref.Bbox
    rng = np.random.default_rng(99)

    def eq(rb, ob):
        return (np.array_equal(np.asarray(rb.minpt), ob.minpt)
                and np.array_equal(np.asarray(rb.maxpt), ob.maxpt))

    chunks = [(64, 64, 64), (128, 128, 32), (17, 33, 5), (1, 1, 1)]
    offsets = [(0, 0, 0), (7, -3, 11)]
    boxes = _rand_boxes(rng)
    for mn, mx in boxes:
        rb, ob = RefBbox(mn, mx), OurBbox(mn, mx)
        assert int(rb.volume()) == ob.volume()
        assert np.array_equal(np.asarray(rb.size3()), ob.size3())
        for cs in chunks:
            for off in offsets:
                assert eq(rb.expand_to_chunk_size(cs, offset=off),
                          ob.expand_to_chunk_size(cs, offset=off)), (
                    mn, mx, cs, off)
                assert eq(rb.shrink_to_chunk_size(cs, offset=off),
                          ob.shrink_to_chunk_size(cs, offset=off)), (
                    mn, mx, cs, off)
                assert eq(rb.round_to_chunk_size(cs, offset=off),
                          ob.round_to_chunk_size(cs, offset=off)), (
                    mn, mx, cs, off)
    # pairwise intersection + containment over a subsample
    for i in range(0, len(boxes) - 1, 2):
        (amn, amx), (bmn, bmx) = boxes[i], boxes[i + 1]
        ra, oa = RefBbox(amn, amx), OurBbox(amn, amx)
        rb, ob = RefBbox(bmn, bmx), OurBbox(bmn, bmx)
        ri = RefBbox.intersection(ra, rb)
        oi = OurBbox.intersection(oa, ob)
        # the reference returns Bbox((0,0,0),(0,0,0)) for disjoint
        # boxes; ours mirrors that contract
        assert eq(ri, oi), (boxes[i], boxes[i + 1])
        assert ra.contains_bbox(rb) == oa.contains_bbox(ob)
        pt = tuple(int(v) for v in np.asarray(bmn))
        assert ra.contains(pt) == oa.contains(pt)


def test_bbox_filename_grammar_cross_parses():
    """Filenames our Bbox writes parse in the reference's from_filename
    and vice versa — the on-disk chunk-naming contract."""
    from cloud_volume_spark.geometry import Bbox as OurBbox

    RefBbox = load_ref("lib").Bbox
    rng = np.random.default_rng(7)
    for mn, mx in _rand_boxes(rng, n=40):
        ours = OurBbox(mn, mx)
        theirs = RefBbox(mn, mx)
        # our filename → their parser
        rb = RefBbox.from_filename(ours.to_filename())
        assert np.array_equal(np.asarray(rb.minpt), ours.minpt)
        assert np.array_equal(np.asarray(rb.maxpt), ours.maxpt)
        # their filename → our parser
        ob = OurBbox.from_filename(theirs.to_filename())
        assert np.array_equal(ob.minpt, np.asarray(theirs.minpt))
        assert np.array_equal(ob.maxpt, np.asarray(theirs.maxpt))


def test_mmh3_parity_with_vendored_reference():
    """Our pure-python murmurhash3_x86_128 agrees with the reference's
    vendored pymmh3 (the exact module its sharded reads hash with) on
    uint64 keys and arbitrary byte strings."""
    from cloud_volume_spark.sharding import (
        mmh3_hash64_low, murmurhash3_x86_128)

    ref_mmh3 = load_ref("datasource.precomputed.mmh3")
    rng = np.random.default_rng(3)
    keys = [0, 1, 2**64 - 1, 12345678901234567]
    keys += [int(x) for x in rng.integers(0, 2**63, 64, dtype=np.int64)]
    for k in keys:
        ref_low = ref_mmh3.hash64(
            struct.pack("<Q", k), x64arch=False)[0] & (2**64 - 1)
        assert mmh3_hash64_low(k) == ref_low, k
    # arbitrary-length byte strings: full 128-bit digest comparison
    for n in (0, 1, 3, 4, 15, 16, 17, 64, 1000):
        data = rng.bytes(n)
        ref128 = ref_mmh3.hash128(data, x64arch=False) & (2**128 - 1)
        ours = int.from_bytes(murmurhash3_x86_128(data), "little")
        assert ours == ref128, n


def test_sharding_spec_parity():
    """The reference's ShardingSpecification maps the same labels to
    the same (shard hex, minishard) as ours, for both hash modes."""
    from cloud_volume_spark.sharding import (
        ShardingSpecification as OurSpec)

    ref_sh = load_ref("datasource.precomputed.sharding")
    rng = np.random.default_rng(17)
    labels = [0, 1, 2**40, 2**64 - 1]
    labels += [int(x) for x in rng.integers(0, 2**63, 200, dtype=np.int64)]
    for hashfn in ("identity", "murmurhash3_x86_128"):
        for (pre, mini, shard) in ((0, 6, 4), (3, 5, 9), (9, 0, 0)):
            ref_spec = ref_sh.ShardingSpecification(
                type="neuroglancer_uint64_sharded_v1",
                preshift_bits=pre, hash=hashfn,
                minishard_bits=mini, shard_bits=shard)
            our_spec = OurSpec(
                preshift_bits=pre, hash=hashfn,
                minishard_bits=mini, shard_bits=shard)
            for lab in labels:
                loc = ref_spec.compute_shard_location(lab)
                shard_hex, minishard = our_spec.compute_shard_location(lab)
                assert shard_hex == loc.shard_number, (hashfn, pre, lab)
                assert minishard == int(loc.minishard_number), (
                    hashfn, pre, lab)


def test_compressed_morton_code_parity():
    """Grid point → compressed morton code matches the reference's
    common.compressed_morton_code on random grids (the spatial-index
    and sharded-chunk key function)."""
    from cloud_volume_spark.chunking import (
        compressed_morton_code as ours)

    ref_common = load_ref("datasource.precomputed.common")
    rng = np.random.default_rng(23)
    for _ in range(30):
        grid = tuple(int(g) for g in rng.integers(1, 50, 3))
        pts = np.stack([rng.integers(0, g, 40) for g in grid], axis=1)
        ref_codes = ref_common.compressed_morton_code(pts, grid)
        our_codes = ours(pts, grid)
        assert np.array_equal(
            np.asarray(ref_codes, dtype=np.uint64),
            np.asarray(our_codes, dtype=np.uint64)), grid
        one = tuple(int(v) for v in pts[0])
        assert int(ref_common.compressed_morton_code(one, grid)) == int(
            ours(one, grid))


@pytest.fixture(scope="module")
def exported_layer(spark, tmp_path_factory):
    """A small exported annotation layer (points + enum property +
    relationship), written by OUR exporter."""
    from cloud_volume_spark.annotations import AnnotationLayer
    from cloud_volume_spark.annotation_io import export_precomputed

    rng = np.random.default_rng(41)
    n = 120
    pdf = pd.DataFrame({
        "id": np.arange(1, n + 1, dtype=np.int64),
        "x": rng.random(n) * 500,
        "y": rng.random(n) * 400,
        "z": rng.random(n) * 150,
        "score": rng.random(n).astype(np.float32),
        "class_label": rng.integers(0, 3, n).astype(np.int32),
        "rel_parent": [
            [int(v) for v in rng.integers(1, 20, rng.integers(0, 3))]
            for _ in range(n)
        ],
    })
    base = tmp_path_factory.mktemp("refio")
    layer = AnnotationLayer(
        spark, str(base / "layer"),
        annotation_type="POINT",
        properties={
            "score": {"type": "float32"},
            "class_label": {
                "type": "int32",
                "enum_values": [0, 1, 2],
                "enum_labels": ["a", "b", "c"],
            },
        },
        relationships=["parent"],
        grid_cell=(128, 128, 64),
    )
    layer.write(spark.createDataFrame(pdf))
    out = str(base / "precomputed")
    export_precomputed(layer, out)
    return pdf, out


def _ref_annotation_meta(out_dir):
    """Reference PrecomputedAnnotationMetadata over OUR exported info —
    built without its cloud-IO __init__ (which requires cloudfiles);
    every property/dtype method below is reference code."""
    ref_meta_mod = load_ref("datasource.precomputed.annotation.metadata")
    Meta = ref_meta_mod.PrecomputedAnnotationMetadata
    meta = object.__new__(Meta)
    meta.info = json.load(open(os.path.join(out_dir, "info")))
    assert meta.info["@type"] == "neuroglancer_annotations_v1"
    return Meta, meta


def test_reference_annotation_dtype_matches_ours(exported_layer):
    """The reference's annotation_dtype over our exported info equals
    the record dtype our writer/reader use — the byte-layout
    contract."""
    from cloud_volume_spark.annotation_io import annotation_record_dtype

    pdf, out = exported_layer
    Meta, meta = _ref_annotation_meta(out)
    ref_dtype = np.dtype(meta.annotation_dtype(b""))
    ours = annotation_record_dtype(
        "POINT", meta.ndim, meta.info["properties"])
    assert ref_dtype == np.dtype(ours)
    assert meta.ndim == 3
    assert [p["id"] for p in meta.properties] == ["score", "class_label"]
    # enum mapping the reference derives from our info
    enums = meta.properties_enum
    assert enums and dict(enums["class_label"]) == {0: "a", 1: "b", 2: "c"}


def test_reference_decodes_our_spatial_cells(exported_layer):
    """Decode OUR exported spatial cells using the reference's dtype
    and the multi-annotation layout its reader implements
    (``reader.py:152-181``): count header, packed records, trailing
    uint64 ids. Every annotation must round-trip."""
    pdf, out = exported_layer
    Meta, meta = _ref_annotation_meta(out)
    ref_dtype = np.dtype(meta.annotation_dtype(b""))

    got = {}
    spatial_dir = os.path.join(out, "spatial0")
    for cell in os.listdir(spatial_dir):
        binary = open(os.path.join(spatial_dir, cell), "rb").read()
        if cell.endswith(".gz"):
            binary = gzip.decompress(binary)
        num = int.from_bytes(binary[:8], "little")
        decoded = np.frombuffer(binary, offset=8, count=num,
                                dtype=ref_dtype)
        offset = 8 + decoded.nbytes
        ids = np.frombuffer(binary, offset=offset, count=num, dtype="<u8")
        assert offset + ids.nbytes == len(binary)  # reference's assert
        for i, ann_id in enumerate(ids):
            got[int(ann_id)] = (
                decoded["_pt1"][i].copy(),
                float(decoded["score"][i]),
                int(decoded["class_label"][i]),
            )
    assert set(got) == set(pdf["id"].tolist())
    for row in pdf.itertuples(index=False):
        pt, score, label = got[int(row.id)]
        assert np.array_equal(
            pt, np.array([row.x, row.y, row.z], dtype=np.float32))
        assert score == np.float32(row.score)
        assert label == int(row.class_label)


def test_reference_decodes_our_by_id_records(exported_layer):
    """Decode OUR by_id records with the reference's single-annotation
    layout (``reader.py:107-137``): one packed record, then per
    relationship a uint32 count + uint64 ids."""
    pdf, out = exported_layer
    Meta, meta = _ref_annotation_meta(out)
    ref_dtype = np.dtype(meta.annotation_dtype(b""))
    rels = meta.info["relationships"]
    assert [r["id"] for r in rels] == ["parent"]

    by_id_dir = os.path.join(out, "by_id")
    sample = pdf.sample(n=20, random_state=5)
    for row in sample.itertuples(index=False):
        name = str(int(row.id))
        path = os.path.join(by_id_dir, name)
        if os.path.exists(path + ".gz"):
            binary = gzip.decompress(open(path + ".gz", "rb").read())
        else:
            binary = open(path, "rb").read()
        decoded = np.frombuffer(binary, count=1, dtype=ref_dtype)
        offset = decoded.nbytes
        assert np.array_equal(
            decoded["_pt1"][0],
            np.array([row.x, row.y, row.z], dtype=np.float32))
        assert decoded["score"][0] == np.float32(row.score)
        assert int(decoded["class_label"][0]) == int(row.class_label)
        for rel in rels:
            cnt = int.from_bytes(binary[offset:offset + 4], "little")
            offset += 4
            ids = np.frombuffer(binary, offset=offset, count=cnt,
                                dtype=np.uint64)
            offset += ids.nbytes
            assert sorted(int(v) for v in ids) == sorted(row.rel_parent)
        assert offset == len(binary)  # reference's trailing assert


def test_shard_files_cross_parse_with_reference():
    """Shard files synthesized by EITHER implementation parse in the
    OTHER: our synthesize_shard_file → the reference's own
    ShardReader.disassemble_shard, and the reference's
    ShardingSpecification.synthesize_shard → our ShardFileReader —
    label→bytes maps identical to the input both ways. (raw encodings:
    the gzip paths route through cloudfiles, which is stubbed.)"""
    from cloud_volume_spark.sharding import (
        ShardFileReader, ShardingSpecification as OurSpec,
        synthesize_shard_file)

    ref_sh = load_ref("datasource.precomputed.sharding")
    rng = np.random.default_rng(31)

    for hashfn in ("identity", "murmurhash3_x86_128"):
        params = dict(preshift_bits=2, hash=hashfn,
                      minishard_bits=3, shard_bits=0)
        our_spec = OurSpec(**params)
        ref_spec = ref_sh.ShardingSpecification(
            type="neuroglancer_uint64_sharded_v1", **params)
        # one shard's worth of labels (shard_bits=0 → all labels in
        # shard 0), arbitrary value sizes incl. empty
        labels = {
            int(lab): rng.bytes(int(n))
            for lab, n in zip(
                rng.choice(2**40, size=40, replace=False),
                rng.integers(0, 200, size=40))
        }

        # ours → reference reader
        blob = synthesize_shard_file(our_spec, labels)
        ref_reader = object.__new__(ref_sh.ShardReader)
        ref_reader.spec = ref_spec
        got = ref_reader.disassemble_shard(blob)
        assert {int(k): bytes(v) for k, v in got.items()} == labels

        # reference writer → our reader
        ref_blob = ref_spec.synthesize_shard(labels)
        ours = dict(ShardFileReader(our_spec, bytes(ref_blob)).items())
        assert ours == labels
        # and spot point-lookups through our 3-level index walk
        rdr = ShardFileReader(our_spec, bytes(ref_blob))
        for lab in list(labels)[:5]:
            assert rdr.get(lab) == labels[lab]


def test_chunk_codec_bytes_cross_decode_with_reference():
    """raw / npz chunk encodings cross-decode: bytes our codecs write
    decode through the reference's own chunks.encode/decode and vice
    versa (gzip differs only by a zlib container parameter and is
    covered by the raw path it wraps). fastremap/codec wheels are
    absent, so only their import is stubbed — raw and npz never call
    them."""
    import sys as _sys
    import types as _types

    if "fastremap" not in _sys.modules:
        _sys.modules["fastremap"] = _types.ModuleType("fastremap")
    ref_chunks = load_ref("chunks")

    from cloud_volume_spark import codecs as ours

    rng = np.random.default_rng(61)
    shape = (16, 8, 4, 1)
    for dtype in (np.uint8, np.uint16, np.uint32, np.uint64):
        hi = min(np.iinfo(dtype).max, 2**31 - 1)
        arr = rng.integers(0, hi, size=shape).astype(dtype)

        # raw: byte-identical both ways (F-order buffer)
        ref_raw = ref_chunks.encode(arr, "raw")
        our_raw = ours.encode(arr, "raw")
        assert bytes(ref_raw) == bytes(our_raw)
        back = ref_chunks.decode(our_raw, "raw", shape=shape, dtype=dtype)
        assert np.array_equal(back, arr)
        back = ours.decode(bytes(ref_raw), "raw", shape=shape,
                           dtype=np.dtype(dtype))
        assert np.array_equal(back, arr)

        # npz: containers may differ byte-wise (zlib level); semantic
        # cross-decode is the contract
        ref_npz = ref_chunks.encode(arr, "npz")
        back = ours.decode(bytes(ref_npz), "npz", shape=shape,
                           dtype=np.dtype(dtype))
        assert np.array_equal(back, arr)
        our_npz = ours.encode(arr, "npz")
        back = ref_chunks.decode(bytes(our_npz), "npz", shape=shape,
                                 dtype=dtype)
        assert np.array_equal(back.reshape(shape, order="F")
                              if back.shape != shape else back, arr)


def test_graphene_label_codec_matches_reference():
    """The reference's own GrapheneMetadata.encode_label/decode_label
    (datasource/graphene/metadata.py:183-346) executed against our
    GrapheneLabelCodec: identical packed uint64 for every (layer, x, y,
    z, segid) across per-layer spatial bit widths, and our decoder
    recovers the reference's fields from the reference's labels."""
    from cloud_volume_spark.graphene import GrapheneLabelCodec

    load_ref("lib")  # installs stubs + synthetic packages
    _stub_module("refcv.secrets", cave_credentials=lambda *a, **k: None)
    # GrapheneMetadata subclasses PrecomputedMetadata but the codec
    # methods never touch the base class; importing the real base needs
    # json5 (absent), so the synthetic package carries a placeholder
    sys.modules["refcv.datasource.precomputed"].PrecomputedMetadata = object
    _synthetic_pkg("refcv.datasource.graphene",
                   f"{REF_ROOT}/datasource/graphene")
    gm = load_ref("datasource.graphene.metadata")

    masks = {str(lv): (10 if lv <= 2 else 8) for lv in range(1, 13)}
    meta = object.__new__(gm.GrapheneMetadata)
    meta.info = {"graph": {"n_bits_for_layer_id": 8, "n_layers": 12,
                           "spatial_bit_masks": masks}}
    ours = GrapheneLabelCodec(
        layer_bits=8,
        spatial_bits_per_layer={int(k): v for k, v in masks.items()},
    )

    rng = np.random.default_rng(7)
    for layer in (1, 2, 3, 12):
        ct = int(masks[str(layer)])
        segid_bits = 64 - 8 - 3 * ct
        for _ in range(40):
            x = int(rng.integers(0, 1 << ct))
            y = int(rng.integers(0, 1 << ct))
            z = int(rng.integers(0, 1 << ct))
            segid = int(rng.integers(0, 1 << segid_bits))
            ref_label = int(meta.encode_label(layer, x, y, z, segid))
            assert ours.pack_py(layer, x, y, z, segid) == ref_label, (
                layer, x, y, z, segid)
            d = ours.unpack_py(ref_label)
            rl = meta.decode_label(gm.uint64(ref_label))
            assert (d["layer"], d["x"], d["y"], d["z"], d["segid"]) == (
                int(rl.level), int(rl.x), int(rl.y), int(rl.z),
                int(rl.segid)), ref_label
