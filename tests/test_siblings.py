"""Annotations, skeletons, meshes, spatial index, precomputed IO —
golden tests with numpy/pandas oracles (reference test_annotations.py,
test_skeletons.py, test_meshing.py patterns)."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from cloud_volume_spark.annotations import AnnotationLayer
from cloud_volume_spark.geometry import Bbox
from cloud_volume_spark.meshes import (
    MeshLayer, consolidate,
    decode_precomputed as mesh_decode, encode_precomputed as mesh_encode,
)
from cloud_volume_spark.skeletons import (
    SkeletonLayer,
    decode_precomputed as skel_decode, encode_precomputed as skel_encode,
)
from cloud_volume_spark.spatial_index import SpatialIndex
from cloud_volume_spark.volume import Volume


# ---------------------------------------------------------------------------
# annotations (F4 fixture shape: POINT + enum property + relationship)
# ---------------------------------------------------------------------------

@pytest.fixture()
def ann_layer(spark, rng, tmp_path):
    n = 2000
    pdf = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "x": rng.uniform(0, 1024, n),
        "y": rng.uniform(0, 1024, n),
        "z": rng.uniform(0, 512, n),
        "class_label": rng.integers(0, 12, n).astype(np.int32),
        "rel_skeleton": [
            [int(v) for v in rng.integers(0, 50, rng.integers(1, 4))]
            for _ in range(n)
        ],
    })
    layer = AnnotationLayer(
        spark, str(tmp_path / "ann"),
        annotation_type="POINT",
        properties={"class_label": "int32"},
        relationships=["skeleton"],
    )
    layer.write(spark.createDataFrame(pdf))
    return layer, pdf


def test_annotation_by_id(ann_layer):
    layer, pdf = ann_layer
    got = layer.get_by_id([5, 10, 1999]).toPandas().sort_values("id")
    assert list(got["id"]) == [5, 10, 1999]
    assert np.allclose(got["x"].to_numpy(), pdf.loc[[5, 10, 1999], "x"].to_numpy())


def test_annotation_bbox(ann_layer):
    layer, pdf = ann_layer
    bbox = Bbox((100, 100, 50), (400, 300, 200))
    got = set(layer.get_by_bbox(bbox).toPandas()["id"])
    mask = (
        (pdf.x >= 100) & (pdf.x < 400)
        & (pdf.y >= 100) & (pdf.y < 300)
        & (pdf.z >= 50) & (pdf.z < 200)
    )
    assert got == set(pdf[mask]["id"])


def test_annotation_relationship(ann_layer):
    layer, pdf = ann_layer
    got = set(layer.get_by_relationship("skeleton", [7]).toPandas()["id"])
    expected = {int(i) for i, rels in zip(pdf.id, pdf.rel_skeleton) if 7 in rels}
    assert got == expected


def test_annotation_relationship_index(ann_layer):
    layer, pdf = ann_layer
    idx = layer.relationship_index("skeleton").toPandas()
    row = idx[idx.segid == 7]
    expected = sorted(
        int(i) for i, rels in zip(pdf.id, pdf.rel_skeleton) if 7 in rels
    )
    assert list(row.iloc[0]["annotation_ids"]) == expected


def test_annotation_reopen(ann_layer, spark):
    layer, pdf = ann_layer
    layer2 = AnnotationLayer.open(spark, layer.base_path)
    assert layer2.relationships == ["skeleton"]
    assert layer2.count() == len(pdf)


# ---------------------------------------------------------------------------
# skeletons
# ---------------------------------------------------------------------------

def _mk_skeleton(rng, nv=20):
    verts = rng.uniform(0, 100, (nv, 3)).astype(np.float32)
    edges = np.stack([np.arange(nv - 1), np.arange(1, nv)], axis=1).astype(np.uint32)
    radii = rng.uniform(0.5, 5, nv).astype(np.float32)
    vtypes = rng.integers(0, 4, nv).astype(np.uint8)
    return verts, edges, radii, vtypes


def test_skeleton_codec_roundtrip(rng):
    v, e, r, t = _mk_skeleton(rng)
    blob = skel_encode(v, e, r, t)
    d = skel_decode(blob)
    assert np.array_equal(d["vertices"], v)
    assert np.array_equal(d["edges"], e)
    assert np.array_equal(d["radii"], r)
    assert np.array_equal(d["vertex_types"], t)


@pytest.fixture()
def skel_layer(spark, rng, tmp_path):
    rows, originals = [], {}
    for segid in range(10):
        v, e, r, t = _mk_skeleton(rng)
        originals[segid] = (v, e, r, t)
        rows.append((
            segid, v.tolist(), e.astype(np.int64).tolist(),
            r.tolist(), t.astype(np.int64).tolist(),
        ))
    layer = SkeletonLayer(spark, str(tmp_path / "skel"))
    layer.write(spark.createDataFrame(
        rows,
        schema="segid long, vertices array<array<float>>, "
               "edges array<array<int>>, radii array<float>, "
               "vertex_types array<int>",
    ))
    return layer, originals


def test_skeleton_get(skel_layer):
    layer, originals = skel_layer
    got = {r.segid: r for r in layer.get([2, 5]).collect()}
    assert set(got) == {2, 5}
    v, e, _, _ = originals[2]
    assert np.allclose(np.array(got[2].vertices), v)
    assert np.array_equal(np.array(got[2].edges), e)


def test_skeleton_transform(skel_layer, spark):
    layer, originals = skel_layer
    layer.transform = [2, 0, 0, 10, 0, 2, 0, 0, 0, 0, 2, 0]
    got = layer.get([3], physical=True).collect()[0]
    v = originals[3][0]
    expected = v * 2 + np.array([10, 0, 0], dtype=np.float32)
    assert np.allclose(np.array(got.vertices), expected, atol=1e-4)


def test_skeleton_cable_length(skel_layer):
    layer, originals = skel_layer
    got = {r.segid: r.cable_length for r in layer.cable_length().collect()}
    for segid, (v, e, _, _) in originals.items():
        expected = float(np.sum(np.linalg.norm(
            v[e[:, 0]].astype(np.float64) - v[e[:, 1]].astype(np.float64), axis=1
        )))
        assert abs(got[segid] - expected) < 0.01


def test_skeleton_export_import(skel_layer, spark, tmp_path):
    layer, originals = skel_layer
    out = str(tmp_path / "skel_export")
    n = layer.export_precomputed(out)
    assert n == 10
    layer2 = SkeletonLayer(spark, str(tmp_path / "skel2"))
    layer2.import_precomputed(out)
    got = layer2.get([4]).collect()[0]
    assert np.allclose(np.array(got.vertices), originals[4][0])
    assert np.array_equal(np.array(got.edges), originals[4][1])


# ---------------------------------------------------------------------------
# meshes
# ---------------------------------------------------------------------------

def test_mesh_codec_roundtrip(rng):
    v = rng.uniform(0, 10, (30, 3)).astype(np.float32)
    f = rng.integers(0, 30, (50, 3)).astype(np.uint32)
    d = mesh_decode(mesh_encode(v, f))
    assert np.array_equal(d["vertices"], v)
    assert np.array_equal(d["faces"], f)


def test_consolidate():
    v = np.array([[0, 0, 0], [1, 1, 1], [0, 0, 0], [2, 2, 2]], dtype=np.float32)
    f = np.array([[0, 1, 2], [2, 3, 1]], dtype=np.uint32)
    cv, cf = consolidate(v, f)
    assert len(cv) == 3
    # face vertex coordinates must be preserved through reindexing
    assert np.array_equal(cv[cf[0]], v[[0, 1, 2]])
    assert np.array_equal(cv[cf[1]], v[[2, 3, 1]])


@pytest.fixture()
def mesh_layer(spark, rng, tmp_path):
    rows = []
    originals = {}
    for segid in (100, 200):
        frags = []
        for frag in range(3):
            v = rng.uniform(0, 10, (12, 3)).astype(np.float32)
            f = rng.integers(0, 12, (20, 3)).astype(np.int64)
            frags.append((v, f))
            rows.append((segid, frag, v.tolist(), f.tolist()))
        originals[segid] = frags
    layer = MeshLayer(spark, str(tmp_path / "mesh"))
    layer.write(spark.createDataFrame(
        rows,
        schema="segid long, fragment int, vertices array<array<float>>, "
               "faces array<array<int>>",
    ))
    return layer, originals


def test_mesh_fuse(mesh_layer):
    layer, originals = mesh_layer
    got = layer.get([100], fuse=True, remove_duplicate_vertices=False).collect()
    assert len(got) == 1
    r = got[0]
    expected_v = np.concatenate([v for v, _ in originals[100]])
    assert np.allclose(np.array(r.vertices), expected_v)
    # faces re-offset: fragment 1 faces shifted by 12, fragment 2 by 24
    faces = np.array(r.faces)
    assert faces.min() >= 0 and faces.max() < 36
    expected_f = np.concatenate([
        f + 12 * i for i, (_, f) in enumerate(originals[100])
    ])
    assert np.array_equal(faces, expected_f)


def test_mesh_fuse_consolidate_preserves_triangles(mesh_layer):
    layer, originals = mesh_layer
    r = layer.get([200], fuse=True, remove_duplicate_vertices=True).collect()[0]
    v = np.array(r.vertices, dtype=np.float32)
    f = np.array(r.faces)
    raw_v = np.concatenate([vv for vv, _ in originals[200]])
    raw_f = np.concatenate([ff + 12 * i for i, (_, ff) in enumerate(originals[200])])
    got_tris = np.sort(v[f].reshape(len(f), -1), axis=0)
    want_tris = np.sort(raw_v[raw_f].reshape(len(raw_f), -1), axis=0)
    assert np.allclose(got_tris, want_tris)


def test_mesh_surface_stats(mesh_layer):
    layer, originals = mesh_layer
    stats = {r.segid: r for r in layer.surface_stats().collect()}
    assert stats[100].n_vertices == 36 and stats[100].n_faces == 60
    allv = np.concatenate([v for v, _ in originals[100]])
    assert abs(stats[100].x0 - allv[:, 0].min()) < 1e-5


def test_mesh_export_import(mesh_layer, spark, tmp_path):
    layer, originals = mesh_layer
    out = str(tmp_path / "mesh_export")
    layer.export_precomputed(out)
    assert os.path.exists(os.path.join(out, "100:0"))
    layer2 = MeshLayer(spark, str(tmp_path / "mesh2"))
    layer2.import_precomputed(out)
    assert layer2.df().count() == 6
    r = layer2.get([100], fuse=True, remove_duplicate_vertices=False).collect()[0]
    expected_v = np.concatenate([v for v, _ in originals[100]])
    assert np.allclose(np.array(r.vertices), expected_v, atol=1e-5)


# ---------------------------------------------------------------------------
# spatial index
# ---------------------------------------------------------------------------

def test_spatial_index(spark, rng, tmp_path):
    n = 5000
    pdf = pd.DataFrame({
        "label": rng.integers(0, 100, n).astype(np.int64),
        "x": rng.uniform(0, 1000, n),
        "y": rng.uniform(0, 1000, n),
        "z": rng.uniform(0, 500, n),
    })
    idx = SpatialIndex(spark, str(tmp_path / "sidx"), cell_size=(100, 100, 100))
    idx.build_from_points(spark.createDataFrame(pdf))

    bbox = Bbox((200, 200, 100), (500, 400, 300))
    got = set(r.label for r in idx.query(bbox).collect())
    mask = (
        (pdf.x >= 200) & (pdf.x < 500)
        & (pdf.y >= 200) & (pdf.y < 400)
        & (pdf.z >= 100) & (pdf.z < 300)
    )
    expected = set(pdf[mask].label)
    # coarse-cell query may over-approximate, never under
    assert expected <= got
    # exact per-point containment: every extra label has a bbox
    # overlapping the query cellwise (sanity on over-approximation rate)
    assert len(got) <= 100

    lbl = int(pdf.label.iloc[0])
    env = idx.get_bbox(lbl)
    pts = pdf[pdf.label == lbl]
    assert env.minpt[0] <= pts.x.min() + 1e-9
    assert env.maxpt[0] >= pts.x.max() - 1e-9

    assert idx.all_labels().count() == pdf.label.nunique()
    locs = idx.file_locations_per_label([lbl]).collect()[0]
    assert locs.n_cells >= 1


# ---------------------------------------------------------------------------
# precomputed image IO
# ---------------------------------------------------------------------------

def test_precomputed_roundtrip(spark, rng, tmp_path):
    from cloud_volume_spark.precomputed_io import export_unsharded, import_unsharded

    arr = rng.integers(0, 200, size=(100, 80, 60, 1)).astype(np.uint32)
    vol = Volume.from_numpy(
        spark, arr, str(tmp_path / "vol"), chunk_size=(64, 64, 64)
    )
    out = str(tmp_path / "precomp")
    n = export_unsharded(vol, out, gzip_files=True)
    assert n == 4  # 2x2x1 grid
    # layout: info + <key>/x0-x1_y0-y1_z0-z1.gz
    assert os.path.exists(os.path.join(out, "info"))
    key = vol.info.key(0)
    files = sorted(os.listdir(os.path.join(out, key)))
    assert "0-64_0-64_0-60.gz" in files

    vol2 = import_unsharded(spark, out, str(tmp_path / "vol2"))
    back = vol2.cutout(Bbox((0, 0, 0), (100, 80, 60)))
    assert np.array_equal(back, arr)
    # labels_stats regenerated on import (segmentation dtype)
    got = {r.label for r in vol2.unique().collect()}
    assert got == set(np.unique(arr).tolist())


def test_boundary_dedup_merges_only_doubled_boundary_vertices():
    from cloud_volume_spark.meshes import deduplicate_chunk_boundaries

    # two triangles sharing an edge on the x=64 chunk boundary plane,
    # written as 6 vertices (each boundary vertex appears twice)
    v = np.array([
        [60, 10, 10], [64, 10, 10], [64, 20, 10],   # left-chunk tri
        [64, 10, 10], [64, 20, 10], [70, 15, 10],   # right-chunk tri
        [30, 30, 30], [30, 30, 30], [40, 40, 40],   # interior duplicate pair
    ], dtype=np.float32)
    f = np.array([[0, 1, 2], [3, 4, 5], [6, 7, 8]], dtype=np.uint32)

    nv, nf = deduplicate_chunk_boundaries(v, f, (64, 64, 64))
    # the two boundary pairs fuse; the interior duplicate (not on a
    # boundary plane) must NOT fuse
    assert nf.shape == (3, 3)
    tris = nv[nf.ravel()].reshape(3, 3, 3)
    orig = v[f.ravel()].reshape(3, 3, 3)
    assert np.allclose(np.sort(tris.reshape(-1, 3), axis=0),
                       np.sort(orig.reshape(-1, 3), axis=0))
    # 9 verts - 2 fused pairs = 7 distinct rows referenced
    assert len(nv) == 7
    # interior pair kept both copies: rows equal to (30,30,30) appear twice
    assert int((nv == np.float32(30)).all(axis=1).sum()) == 2


def test_boundary_dedup_respects_occurrence_count():
    from cloud_volume_spark.meshes import deduplicate_chunk_boundaries

    # boundary vertex appearing 3 times must not merge (reference
    # merges only count==2)
    v = np.array([
        [64, 0, 0], [64, 0, 0], [64, 0, 0],
        [1, 2, 3], [4, 5, 6], [7, 8, 9],
    ], dtype=np.float32)
    f = np.array([[0, 3, 4], [1, 4, 5], [2, 3, 5]], dtype=np.uint32)
    nv, nf = deduplicate_chunk_boundaries(v, f, (64, 64, 64))
    assert int((nv == np.array([64, 0, 0], np.float32)).all(axis=1).sum()) == 3


def test_mesh_get_boundary_dedup(mesh_layer):
    layer, originals = mesh_layer
    r = layer.get([100], boundary_chunk_size=(64, 64, 64)).collect()[0]
    v = np.array(r.vertices, dtype=np.float32)
    f = np.array(r.faces)
    raw_v = np.concatenate([vv for vv, _ in originals[100]])
    raw_f = np.concatenate(
        [ff + 12 * i for i, (_, ff) in enumerate(originals[100])]
    )
    # triangle soup is geometrically unchanged
    got = np.sort(v[f.ravel()].reshape(len(f), -1), axis=0)
    want = np.sort(raw_v[raw_f.ravel()].reshape(len(raw_f), -1), axis=0)
    assert np.allclose(got, want)


def test_shard_params_hashed_golden():
    """Golden constants from reference test_sharding.py:474-556."""
    from cloud_volume_spark.sharding import compute_shard_params_for_hashed

    assert compute_shard_params_for_hashed(10**9, 2**13, 2**15) == (11, 9, 0)
    assert compute_shard_params_for_hashed(10**6, 2**13, 2**15) == (1, 9, 0)
    assert compute_shard_params_for_hashed(10**7, 2**13, 2**15) == (4, 9, 0)
    assert compute_shard_params_for_hashed(1000, 2**13, 2**15) == (0, 0, 0)
    assert compute_shard_params_for_hashed(0, 0, 0) == (0, 0, 0)
    assert compute_shard_params_for_hashed(10000, 2**13, 2**15) == (0, 3, 0)
    assert compute_shard_params_for_hashed(10**9, 2**10, 2**15) == (14, 6, 0)
    assert compute_shard_params_for_hashed(10**9, 2**13, 2**13) == (13, 9, 0)
    assert compute_shard_params_for_hashed(
        1000, 2**13, 2**15, min_shards=1000
    ) == (10, 0, 0)


def test_shard_params_image_golden():
    """Reference test_broken_dataset (test_sharding.py:448-472): the
    bit allocation must cover all 20 morton bits; jpeg forces raw
    data encoding."""
    from cloud_volume_spark.sharding import compute_shard_params_for_image

    spec = compute_shard_params_for_image(
        (10240, 10240, 990), (128, 128, 20), encoding="jpeg", dtype="uint8"
    )
    assert spec.shard_bits + spec.minishard_bits + spec.preshift_bits == 20
    assert spec.data_encoding == "raw"
    # round-trips through spec validation
    spec2 = compute_shard_params_for_image(
        (1024, 1024, 1024), (64, 64, 64), encoding="raw", dtype="uint64"
    )
    assert spec2.shard_bits >= 0 and spec2.preshift_bits >= 0


# ---------------------------------------------------------------------------
# interchange formats: obj / ply / swc (reference mesh.py:208-314)
# ---------------------------------------------------------------------------

def test_mesh_to_obj_golden():
    from cloud_volume_spark.meshes import from_obj, to_obj
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], dtype=np.float32)
    f = np.array([[0, 1, 2]], dtype=np.uint32)
    data = to_obj(v, f)
    assert data == (
        b"v 0.00000 0.00000 0.00000\n"
        b"v 1.00000 0.00000 0.00000\n"
        b"v 0.00000 1.00000 0.00000\n"
        b"f 1 2 3\n"
    )
    back = from_obj(data)
    assert np.array_equal(back["vertices"], v)
    assert np.array_equal(back["faces"], f)


def test_mesh_from_obj_complex_faces():
    from cloud_volume_spark.meshes import from_obj
    text = "v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1/4/7 2/5/8 3/6/9\n"
    back = from_obj(text)
    assert np.array_equal(back["faces"], [[0, 1, 2]])


def test_mesh_to_ply_golden():
    from cloud_volume_spark.meshes import to_ply
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], dtype=np.float32)
    f = np.array([[0, 1, 2]], dtype=np.uint32)
    data = to_ply(v, f)
    header, _, body = data.partition(b"end_header\n")
    assert b"element vertex 3" in header
    assert b"element face 1" in header
    assert body[:36] == v.tobytes("C")
    assert np.array_equal(
        np.frombuffer(body[36:], dtype=np.int32), [3, 0, 1, 2]
    )


def test_mesh_layer_save_formats(mesh_layer, tmp_path):
    from cloud_volume_spark.meshes import from_obj
    layer, frames = mesh_layer
    data = layer.save(100, file_format="obj")
    back = from_obj(data)
    assert len(back["vertices"]) > 0
    ply = layer.save(100, filepath=str(tmp_path / "m.ply"), file_format="ply")
    assert ply.startswith(b"ply\nformat binary_little_endian 1.0\n")
    assert (tmp_path / "m.ply").read_bytes() == ply
    pre = layer.save(100, file_format="precomputed")
    d = mesh_decode(pre)
    # obj serializes %.5f — compare within that precision
    assert np.allclose(d["vertices"], back["vertices"], atol=1e-5)


def test_swc_golden_and_roundtrip():
    from cloud_volume_spark.skeletons import from_swc, to_swc
    v = np.array([[0, 0, 0], [2, 0, 0], [2, 2, 0], [5, 5, 5]], dtype=np.float64)
    e = np.array([[0, 1], [1, 2]], dtype=np.int64)  # vertex 3 isolated root
    radii = np.array([1.0, 0.5, 0.25, 2.0])
    types = np.array([1, 3, 3, 0])
    text = to_swc(v, e, radii, types)
    assert text == (
        "# id type x y z radius parent\n"
        "1 1 0.000000 0.000000 0.000000 1.000000 -1\n"
        "2 3 2.000000 0.000000 0.000000 0.500000 1\n"
        "3 3 2.000000 2.000000 0.000000 0.250000 2\n"
        "4 0 5.000000 5.000000 5.000000 2.000000 -1\n"
    )
    back = from_swc(text)
    assert np.allclose(back["vertices"], v)
    assert np.array_equal(back["edges"], e)
    assert np.allclose(back["radii"], radii)
    assert np.array_equal(back["vertex_types"], types)


def test_skeleton_save_swc(skel_layer, tmp_path):
    from cloud_volume_spark.skeletons import from_swc
    layer, data = skel_layer
    text = layer.save_swc(1, filepath=str(tmp_path / "s.swc"))
    assert (tmp_path / "s.swc").read_text() == text
    back = from_swc(text)
    want_v = np.asarray(data[1][0], dtype=np.float32)
    assert len(back["vertices"]) == len(want_v)
    # BFS reorders vertices; compare as sets of rounded rows
    got = {tuple(np.round(r, 3)) for r in back["vertices"]}
    want = {tuple(np.round(r, 3)) for r in want_v}
    assert got == want


# ---------------------------------------------------------------------------
# multi-LOD fetch (reference multilod.py:99-164)
# ---------------------------------------------------------------------------

def test_multilod_layer_lod_selective_fetch(spark, tmp_path):
    from cloud_volume_spark.multilod import (
        MultiLodManifest, MultiLodMeshLayer, encode_lod_fragment,
        to_stored_model_space,
    )
    vqb = 16
    # lod0: two fragments; lod1: one fragment
    rngl = np.random.default_rng(3)
    frag_meshes = {
        (0, 0): (rngl.uniform(0, 1, (10, 3)), rngl.integers(0, 10, (6, 3))),
        (0, 1): (rngl.uniform(0, 1, (8, 3)), rngl.integers(0, 8, (4, 3))),
        (1, 0): (rngl.uniform(0, 1, (5, 3)), rngl.integers(0, 5, (2, 3))),
    }
    q = 2 ** vqb - 1
    payloads = {
        k: encode_lod_fragment(np.round(m[0] * q).astype(np.uint32), m[1], vqb)
        for k, m in frag_meshes.items()
    }
    manifest = MultiLodManifest(
        chunk_shape=(10, 10, 10), grid_origin=(0, 0, 0),
        lod_scales=[1.0, 2.0], vertex_offsets=[[0, 0, 0], [0, 0, 0]],
        fragment_positions=[[[0, 0, 0], [1, 0, 0]], [[0, 0, 0]]],
        fragment_offsets=[
            [len(payloads[(0, 0)]), len(payloads[(0, 1)])],
            [len(payloads[(1, 0)])],
        ],
        segment_id=77,
    )
    layer = MultiLodMeshLayer(spark, str(tmp_path / "ml"), vqb)
    layer.put(77, manifest, [
        [payloads[(0, 0)], payloads[(0, 1)]],
        [payloads[(1, 0)]],
    ])

    got1 = layer.get(77, lod=1)[77]
    assert len(got1[0]) == 5 and len(got1[1]) == 2
    # dequantized lod1 vertices: chunk_shape * 2 * (pos + q/qmax)
    qv = np.round(frag_meshes[(1, 0)][0] * q)
    want = 10 * 2 * (0 + qv / q)
    assert np.allclose(got1[0], want)

    got0 = layer.get(77, lod=0)[77]
    assert len(got0[0]) == 18 and len(got0[1]) == 10
    # fragment 1 of lod0 is shifted by its grid position (1,0,0)
    assert got0[0][10:, 0].min() >= 10.0 - 1e-6

    with pytest.raises(ValueError):
        layer.get(77, lod=2)
    with pytest.raises(KeyError):
        layer.get_manifest(99)
    m = layer.get_manifest(77)
    assert m == manifest


# ---------------------------------------------------------------------------
# POLYLINE + enum-labeled properties (annotation/metadata.py:18-39,390)
# ---------------------------------------------------------------------------

def test_polyline_and_enum_roundtrip(spark, rng, tmp_path):
    n = 50
    enum_values = list(range(12))
    enum_labels = [f"class_{i}" for i in range(12)]
    pdf = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "x": rng.uniform(0, 256, n),
        "y": rng.uniform(0, 256, n),
        "z": rng.uniform(0, 256, n),
        "points": [
            [[float(a), float(b), float(c)] for a, b, c in
             rng.uniform(0, 256, (4, 3))]
            for _ in range(n)
        ],
        "cell_type": rng.integers(0, 12, n).astype(np.int32),
    })
    layer = AnnotationLayer(
        spark, str(tmp_path / "poly"),
        annotation_type="POLYLINE",
        properties={"cell_type": {
            "type": "int32",
            "enum_values": enum_values,
            "enum_labels": enum_labels,
        }},
    )
    layer.write(spark.createDataFrame(pdf))

    back = AnnotationLayer.open(spark, str(tmp_path / "poly"))
    assert back.annotation_type == "POLYLINE"
    assert back.properties["cell_type"]["enum_labels"] == enum_labels
    assert back.properties_enum() == {
        "cell_type": dict(zip(enum_values, enum_labels))
    }
    out = back.to_pandas().sort_values("id").reset_index(drop=True)
    assert out["cell_type"].dtype.name == "category"
    want = pdf["cell_type"].map(dict(zip(enum_values, enum_labels)))
    assert list(out["cell_type"]) == list(want)
    # storage is the canonical FLAT [x0,y0,z0,...] run (4 vertices =
    # 12 floats), even when write() received nested vertex lists
    assert len(out["points"][0]) == 12


def test_enum_property_validation(spark, tmp_path):
    with pytest.raises(ValueError):
        AnnotationLayer(
            spark, str(tmp_path / "bad1"),
            properties={"p": {"type": "int32", "enum_values": [1]}},
        )
    with pytest.raises(ValueError):
        AnnotationLayer(
            spark, str(tmp_path / "bad2"),
            properties={"p": {
                "type": "int32", "enum_values": [1], "enum_labels": ["a", "b"],
            }},
        )
    with pytest.raises(ValueError):
        AnnotationLayer(
            spark, str(tmp_path / "bad3"), annotation_type="SPLINE",
        )


def test_skeleton_sharded_roundtrip(skel_layer, spark, tmp_path):
    """Sharded archive (murmur-hashed segids, reference
    skeleton/sharded.py): export shards distributed, read them back,
    and recover every skeleton bit-exactly."""
    layer, originals = skel_layer
    out = str(tmp_path / "skel_sharded")
    n_shards = layer.export_sharded(out)
    assert n_shards >= 1
    import os as _os
    assert _os.path.isfile(_os.path.join(out, "info"))
    assert any(p.endswith(".shard") for p in _os.listdir(out))

    layer2 = SkeletonLayer(spark, str(tmp_path / "skel_sharded_back"))
    layer2.import_sharded(out)
    for segid, (v, e, r, t) in originals.items():
        got = layer2.get([segid]).collect()
        assert len(got) == 1, segid
        assert np.allclose(np.array(got[0].vertices), v)
        assert np.array_equal(np.array(got[0].edges), e)
        assert np.allclose(np.array(got[0].radii), r)
        assert np.array_equal(np.array(got[0].vertex_types), t)


def test_multilod_sharded_roundtrip(spark, tmp_path):
    """Sharded multi-LOD archive: manifests indexed, fragment files in
    the unindexed bytes before them (neuroglancer layout, reference
    mesh/multilod.py:187-325). Export, re-import, and fetch both LODs
    with identical geometry."""
    from cloud_volume_spark.multilod import (
        MultiLodManifest, MultiLodMeshLayer, encode_lod_fragment,
    )
    vqb = 16
    rngl = np.random.default_rng(9)
    layer = MultiLodMeshLayer(spark, str(tmp_path / "mls"), vqb)
    truth = {}
    for segid in [5, 88, 4097]:
        frag_meshes = {
            (0, 0): (rngl.uniform(0, 1, (10, 3)), rngl.integers(0, 10, (6, 3))),
            (1, 0): (rngl.uniform(0, 1, (5, 3)), rngl.integers(0, 5, (2, 3))),
        }
        q = 2 ** vqb - 1
        payloads = {
            k: encode_lod_fragment(
                np.round(m[0] * q).astype(np.uint32), m[1], vqb
            )
            for k, m in frag_meshes.items()
        }
        manifest = MultiLodManifest(
            chunk_shape=(10, 10, 10), grid_origin=(0, 0, 0),
            lod_scales=[1.0, 2.0], vertex_offsets=[[0, 0, 0], [0, 0, 0]],
            fragment_positions=[[[0, 0, 0]], [[0, 0, 0]]],
            fragment_offsets=[
                [len(payloads[(0, 0)])], [len(payloads[(1, 0)])],
            ],
            segment_id=segid,
        )
        layer.put(segid, manifest, [
            [payloads[(0, 0)]], [payloads[(1, 0)]],
        ])
        truth[segid] = {
            lod: layer.get(segid, lod=lod)[segid] for lod in (0, 1)
        }

    out = str(tmp_path / "ml_shards")
    n = layer.export_sharded(out)
    assert n >= 1

    layer2 = MultiLodMeshLayer(spark, str(tmp_path / "mls_back"), 4)
    layer2.import_sharded(out)
    assert layer2.vertex_quantization_bits == vqb  # from info
    for segid, per_lod in truth.items():
        for lod, (v, f) in per_lod.items():
            gv, gf = layer2.get(segid, lod=lod)[segid]
            assert np.allclose(gv, v), (segid, lod)
            assert np.array_equal(gf, f), (segid, lod)


def test_import_foreign_spatial_files(spark, tmp_path):
    """Ingest the reference's own checked-in .spatial index file and
    reproduce the golden values its test_integer_spatial_index asserts
    (reference test/test_skeletons.py:774-800)."""
    import json
    import os

    from cloud_volume_spark.spatial_index import import_spatial_files

    src = "/root/reference/test/test_cv/skeletons_mip_2"
    if not os.path.isdir(src):
        pytest.skip("reference test_cv fixture not present")
    idx = import_spatial_files(spark, src, str(tmp_path / "spidx"))
    assert idx.cell_size == (8192.0, 8192.0, 20480.0)

    gt = json.load(open(os.path.join(src, "0-8192_0-8192_0-20480.spatial")))
    gt_labels = sorted(int(k) for k in gt)

    labels = sorted(
        r.label for r in idx.query(
            Bbox((0, 0, 0), (8192, 8192, 20480))).collect()
    )
    assert labels == gt_labels

    locs = {r.label: r for r in
            idx.file_locations_per_label([71297420]).collect()}
    assert 71297420 in locs
    assert [tuple(c) for c in locs[71297420].cells] == [(0, 0, 0)]

    bbox = idx.get_bbox(59524925)
    assert np.allclose(bbox.minpt, [80, 6864, 19960])
    assert np.allclose(bbox.maxpt, [400, 8176, 20440])


def test_import_foreign_legacy_mesh_fixture(spark, tmp_path):
    """Ingest the reference's checked-in graphene mesh fixture
    (manifest 648518346349515986:0 + 22 gzipped supervoxel fragments)
    and reproduce the golden its test_graphene_mesh_get_precomputed
    asserts: the fused mesh's vertex graph has exactly 3 connected
    components (reference test/test_graphene.py:478-487)."""
    import json
    import os

    src = "/root/reference/test/test_cv/mesh_mip_2_err_40_sv16"
    if not os.path.isdir(src):
        pytest.skip("reference test_cv fixture not present")
    manifest = json.load(open(os.path.join(src, "648518346349515986:0")))

    layer = MeshLayer(spark, str(tmp_path / "foreign_mesh"))
    layer.import_precomputed(src)
    frags = layer.df().toPandas()
    assert set(frags.segid) == {648518346349515986}
    assert len(frags) == len(manifest["fragments"]) == 22

    got = layer.get(
        [648518346349515986], fuse=True, remove_duplicate_vertices=True
    ).collect()[0]
    v = np.array(got.vertices, dtype=np.float32)
    f = np.array(got.faces, dtype=np.int64)
    assert len(v) and len(f)

    # union-find connected components over the vertex graph
    parent = np.arange(len(v))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for tri in f:
        ra = find(int(tri[0]))
        parent[find(int(tri[1]))] = ra
        parent[find(int(tri[2]))] = ra
    assert len({find(i) for i in range(len(v))}) == 3


def test_spatial_files_roundtrip(spark, tmp_path):
    """Export .spatial JSON files from the parquet index and re-ingest
    them; and re-exporting the reference's own fixture must reproduce
    its exact content."""
    import json
    import os

    from cloud_volume_spark.spatial_index import (
        export_spatial_files, import_spatial_files,
    )

    src = "/root/reference/test/test_cv/skeletons_mip_2"
    if not os.path.isdir(src):
        pytest.skip("reference test_cv fixture not present")
    idx = import_spatial_files(spark, src, str(tmp_path / "in"))
    out = str(tmp_path / "out")
    n_cells = export_spatial_files(idx, out)
    assert n_cells == 1
    name = "0-8192_0-8192_0-20480.spatial"
    got = json.load(open(os.path.join(out, name)))
    gt = json.load(open(os.path.join(src, name)))
    assert set(got) == set(gt)
    for k in gt:
        assert got[k] == [float(v) for v in gt[k]], k
    # and the exported dir ingests back identically
    idx2 = import_spatial_files(spark, out, str(tmp_path / "in2"))
    a = idx.df().toPandas().sort_values(["label", "gx", "gy", "gz"])
    b = idx2.df().toPandas().sort_values(["label", "gx", "gy", "gz"])
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_spatial_files_roundtrip_large_and_negative_coords(spark, tmp_path):
    """Cell names must render as the reference's Bbox.to_filename does
    (plain integers at any magnitude — never ':g' scientific notation,
    which kicked in at >= 1e6 and made exported indexes unmatchable by
    the reference's exact-string lookups), and the parser must accept
    negative origins ('-8192-0', str()-rendered per the reference)."""
    import os

    from cloud_volume_spark.spatial_index import (
        SpatialIndex, export_spatial_files, import_spatial_files,
    )

    cs = 8192.0
    idx = SpatialIndex(spark, str(tmp_path / "big"), (cs, cs, cs))
    pts = spark.createDataFrame(
        [
            # gx=123 -> x range 1007616-1015808: ':g' rendered 1.00762e+06
            (1, 123 * cs + 5.0, 10.0, 10.0),
            # negative origin cell gx=-1
            (2, -100.0, 20.0, 30.0),
        ],
        "label long, x double, y double, z double",
    )
    idx.build_from_points(pts)
    out = str(tmp_path / "bigout")
    assert export_spatial_files(idx, out) == 2
    names = sorted(os.listdir(out))
    assert "1007616-1015808_0-8192_0-8192.spatial" in names
    assert "-8192-0_0-8192_0-8192.spatial" in names
    for n in names:  # reference-format: no scientific notation anywhere
        assert "e" not in n.replace(".spatial", "")

    idx2 = import_spatial_files(spark, out, str(tmp_path / "bigin"))
    # the imported grid anchors at the minimum file origin (-8192,
    # the reference's physical_bounds.minpt convention), so raw g
    # coordinates renumber; the PHYSICAL cell ranges must be identical
    a = idx.df().toPandas().sort_values("label").reset_index(drop=True)
    b = idx2.df().toPandas().sort_values("label").reset_index(drop=True)
    assert idx2.grid_origin == (-8192.0, 0.0, 0.0)
    for ax, g in (("x", "gx"), ("y", "gy"), ("z", "gz")):
        i = "xyz".index(ax)
        phys_a = a[g] * idx.cell_size[i] + idx.grid_origin[i]
        phys_b = b[g] * idx2.cell_size[i] + idx2.grid_origin[i]
        assert (phys_a == phys_b).all(), ax
    for c in ["x0", "y0", "z0", "x1", "y1", "z1"]:
        assert (a[c] == b[c]).all(), c
    # and a re-export reproduces the reference-format names verbatim
    out2 = str(tmp_path / "bigout2")
    assert export_spatial_files(idx2, out2) == 2
    assert sorted(os.listdir(out2)) == names


def test_pyramid_import_export_roundtrip(spark, tmp_path):
    """Whole-pyramid precomputed interop in one call each way: export
    every mip with data, reimport ALL mips in a single Spark job, and
    cut out correctly at each level."""
    from cloud_volume_spark.precomputed_io import (
        export_pyramid, import_pyramid,
    )

    rng = np.random.default_rng(23)
    arr = rng.integers(0, 50, (64, 64, 32, 1)).astype(np.uint32)
    vol = Volume.from_numpy(
        spark, arr, str(tmp_path / "pyr"), chunk_size=(32, 32, 32))
    vol.generate_pyramid(2)  # mips 1 and 2 (2x2x1 each)
    n = export_pyramid(vol, str(tmp_path / "pre"))
    # mip0: 2*2*1=4 chunks; mip1: 1 (32x32x32); mip2: 1 (16x16x32)
    assert n == 6
    vol2 = import_pyramid(
        spark, str(tmp_path / "pre"), str(tmp_path / "pyr2"))
    for m in (0, 1, 2):
        want = vol.cutout(vol.info.bounds(m), mip=m)
        got = vol2.cutout(vol2.info.bounds(m), mip=m)
        assert np.array_equal(got, want), f"mip {m}"
    # explicit subset import still works (the old single-mip path)
    vol3 = import_pyramid(
        spark, str(tmp_path / "pre"), str(tmp_path / "pyr3"), mips=[1])
    assert vol3.has_data(1) and not vol3.has_data(0)


def test_spatial_import_reference_offset_and_clipped_layouts(
        spark, tmp_path):
    """The reference anchors its spatial grid at physical_bounds.minpt
    and clamps edge-cell NAMES to bounds.maxpt (reference
    spatial_index.py:367,379-381). Import must (a) not assume a
    0-anchored grid for offset datasets, (b) not take cell size from
    the lexicographically-first file — a clipped edge cell can sort
    first ('118784-...' < '53248-...'), and (c) honor float-rendered
    names. Export must reproduce the source names verbatim."""
    import json as _json
    import os

    from cloud_volume_spark.spatial_index import (
        export_spatial_files, import_spatial_files,
    )

    src = str(tmp_path / "refsp")
    os.makedirs(src)
    # origin 53248 (NOT a multiple of cs=8192), cells at 53248..118784,
    # last cell clipped to bounds.maxpt=120000 — and that clipped name
    # sorts lexicographically FIRST
    cs = 8192.0
    # gapped grid (gaps are legal): full cells at 53248..94208, plus
    # the clipped edge cell at 118784 whose name sorts FIRST ('1' < '5')
    origins = [53248.0 + k * cs for k in (0, 1, 2, 3, 4, 5, 8)]
    for k, lo in enumerate(origins):
        hi = min(lo + cs, 120000.0)
        name = (f"{int(lo)}-{int(hi)}_0-8192_0-8192.spatial")
        with open(os.path.join(src, name), "w") as f:
            _json.dump({str(k + 1): [lo + 0.2, 1, 1, lo + 0.4, 2, 2]}, f)
    assert sorted(os.listdir(src))[0].startswith("118784-")  # the trap

    idx = import_spatial_files(spark, src, str(tmp_path / "refsp_idx"))
    assert idx.cell_size == (cs, cs, cs)          # not 1216 from the trap
    assert idx.grid_origin == (53248.0, 0.0, 0.0)  # not 0-anchored
    assert idx.bounds_max[0] == 120000.0

    # a point-sized query inside the LAST (clipped) cell finds its label
    got = {r.label for r in idx.query(
        Bbox((118784.1, 1.0, 1.0), (118784.5, 2.0, 2.0),
             dtype="float64")).collect()}
    assert got == {7}
    # a query whose float maxpt lands fractionally inside cell k=1
    # keeps that cell (the old int((x1-1)//cs) dropped it)
    # maxpt 61440.5 reaches 0.5 units into cell k=1 whose label-2 bbox
    # starts at 61440.2 — the old int((x1-1)//cs) upper bound dropped
    # the cell entirely for fractional maxpts
    got = {r.label for r in idx.query(
        Bbox((53248.0, 0.0, 0.0), (61440.5, 8192.0, 8192.0),
             dtype="float64")).collect()}
    assert 2 in got

    # export reproduces the reference's names, clamp included
    out = str(tmp_path / "refsp_out")
    assert export_spatial_files(idx, out) == 7
    assert sorted(os.listdir(out)) == sorted(os.listdir(src))

    # float-rendered names ('8192.0-16384.0') round-trip in kind
    src2 = str(tmp_path / "refsp_f")
    os.makedirs(src2)
    fname = "8192.0-16384.0_0.0-8192.0_0.0-8192.0.spatial"
    with open(os.path.join(src2, fname), "w") as f:
        _json.dump({"5": [9000, 1, 1, 9001, 2, 2]}, f)
    idx2 = import_spatial_files(spark, src2, str(tmp_path / "refsp_fi"))
    assert idx2.float_names
    out2 = str(tmp_path / "refsp_fo")
    assert export_spatial_files(idx2, out2) == 1
    assert os.listdir(out2) == [fname]


def test_skeleton_vertex_types_without_radii_roundtrips(rng):
    """The skeleton attribute layout is positional (radius THEN
    vertex_type): encoding vertex_types with radii=None must emit a
    parseable blob (zero radii), not bytes the decoder misreads as
    float32 radii and crashes on."""
    v, e, _, t = _mk_skeleton(rng)
    blob = skel_encode(v, e, None, t)
    d = skel_decode(blob)
    assert np.array_equal(d["vertices"], v)
    assert np.array_equal(d["vertex_types"], t)
    assert np.allclose(d["radii"], 0.0)


def test_skeleton_import_gz_values(spark, rng, tmp_path):
    """A legacy unsharded skeleton dir storing values as '<segid>.gz'
    (the CloudFiles local convention the mesh importer handles)
    imports fully — it used to import as an EMPTY table silently."""
    import gzip as _gzip

    v, e, r, t = _mk_skeleton(rng)
    src = str(tmp_path / "skgz")
    os.makedirs(src)
    with open(os.path.join(src, "42.gz"), "wb") as f:
        f.write(_gzip.compress(skel_encode(v, e, r, t), mtime=0))
    layer = SkeletonLayer(spark, str(tmp_path / "skgz_in"))
    layer.import_precomputed(src)
    got = layer.get([42]).collect()[0]
    assert np.allclose(np.array(got.vertices), v)


def test_skeleton_import_sharded_foreign_attributes_refused(
        spark, tmp_path):
    """An archive declaring a different vertex_attributes layout is
    refused loudly — decoding its uint8 attribute as float32 radii
    would be a silent misparse."""
    import json as _json

    src = str(tmp_path / "skfa")
    os.makedirs(src)
    with open(os.path.join(src, "info"), "w") as f:
        _json.dump({
            "@type": "neuroglancer_skeletons",
            "transform": [1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0],
            "vertex_attributes": [
                {"id": "confidence", "data_type": "uint8",
                 "num_components": 1},
            ],
            "sharding": {
                "@type": "neuroglancer_uint64_sharded_v1",
                "preshift_bits": 0, "hash": "murmurhash3_x86_128",
                "minishard_bits": 2, "shard_bits": 2,
                "minishard_index_encoding": "raw",
                "data_encoding": "raw",
            },
        }, f)
    layer = SkeletonLayer(spark, str(tmp_path / "skfa_in"))
    with pytest.raises(ValueError, match="vertex_attributes"):
        layer.import_sharded(src)


def test_mesh_fuse_skips_empty_fragments(spark, tmp_path, rng):
    """A fragment row with zero vertices (nv=0 files are legal
    precomputed content) must not crash the per-segid fuse."""
    v = rng.uniform(0, 10, (6, 3)).astype(np.float32)
    f = rng.integers(0, 6, (8, 3)).astype(np.int64)
    rows = [
        (7, 0, v.tolist(), f.tolist()),
        (7, 1, [], []),  # empty fragment
    ]
    layer = MeshLayer(spark, str(tmp_path / "meshempty"))
    layer.write(spark.createDataFrame(
        rows,
        schema="segid long, fragment long, "
               "vertices array<array<float>>, faces array<array<long>>",
    ))
    got = layer.get([7]).collect()[0]
    assert len(got.vertices) > 0


def test_annotation_bbox_subunit_and_boundary_exactness(
        spark, tmp_path):
    """Sub-unit float boxes straddling a grid-cell boundary must scan
    the right cell (the old (x1-1)//cs upper bound returned EMPTY),
    and the exclusive max bound must be exact at nm-scale coordinate
    magnitudes where the old hi-1e-9 epsilon was absorbed by double
    rounding."""
    pdf = pd.DataFrame({
        "id": np.array([1, 2, 3], dtype=np.int64),
        "x": [128.2, 9_000_128.0, 9_000_127.9999],
        "y": [1.0, 1.0, 1.0],
        "z": [1.0, 1.0, 1.0],
    })
    layer = AnnotationLayer(spark, str(tmp_path / "annsub"),
                            annotation_type="POINT")
    layer.write(spark.createDataFrame(pdf))

    # sub-unit box [128.0, 128.5) catches the annotation at 128.2
    got = set(layer.get_by_bbox(
        Bbox((128.0, 0.0, 0.0), (128.5, 8.0, 8.0),
             dtype="float64")).toPandas()["id"])
    assert got == {1}
    # exclusive max at ~9e6: x == x1 excluded, x just below included
    got = set(layer.get_by_bbox(
        Bbox((9_000_000.0, 0.0, 0.0), (9_000_128.0, 8.0, 8.0),
             dtype="float64")).toPandas()["id"])
    assert got == {3}


def test_export_unsharded_strips_stale_sharding_key(spark, tmp_path):
    """A volume whose info carries a per-scale 'sharding' key (e.g.
    imported from a sharded layer) must export UNSHARDED with the key
    stripped — readers seeing scale.sharding next to loose chunk files
    take the shard path and fail."""
    from cloud_volume_spark.precomputed_io import (
        export_unsharded, import_pyramid,
    )

    rng = np.random.default_rng(3)
    arr = rng.integers(0, 255, (32, 32, 32, 1)).astype(np.uint8)
    vol = Volume.from_numpy(spark, arr, str(tmp_path / "sh"),
                            chunk_size=(16, 16, 16))
    vol.info.info["scales"][0]["sharding"] = {
        "@type": "neuroglancer_uint64_sharded_v1", "preshift_bits": 0,
        "hash": "identity", "minishard_bits": 2, "shard_bits": 2,
        "minishard_index_encoding": "raw", "data_encoding": "raw",
    }
    out = str(tmp_path / "sh_out")
    export_unsharded(vol, out)
    info = json.load(open(os.path.join(out, "info")))
    assert all("sharding" not in sc for sc in info["scales"])
    back = import_pyramid(spark, out, str(tmp_path / "sh_back"))
    assert np.array_equal(
        back.cutout(Bbox((0, 0, 0), (32, 32, 32))), arr)


def test_import_pyramid_skips_stray_files(spark, tmp_path):
    """Partial uploads / Thumbs.db in a scale dir must be skipped, not
    crash the whole pyramid import in Bbox.from_filename."""
    from cloud_volume_spark.precomputed_io import (
        export_unsharded, import_pyramid,
    )

    rng = np.random.default_rng(5)
    arr = rng.integers(0, 255, (32, 32, 32, 1)).astype(np.uint8)
    vol = Volume.from_numpy(spark, arr, str(tmp_path / "st"),
                            chunk_size=(16, 16, 16))
    out = str(tmp_path / "st_out")
    export_unsharded(vol, out)
    scale_dir = os.path.join(out, vol.info.key(0))
    for stray in ("Thumbs.db", "0-16_0-16_0-16.gz.tmp"):
        with open(os.path.join(scale_dir, stray), "wb") as f:
            f.write(b"junk")
    back = import_pyramid(spark, out, str(tmp_path / "st_back"))
    assert np.array_equal(
        back.cutout(Bbox((0, 0, 0), (32, 32, 32))), arr)


def test_skeleton_import_sharded_radius_only_accepted(spark, tmp_path):
    """A sharded archive declaring only [radius] (a valid PREFIX of the
    positional layout) imports cleanly — decode_precomputed already
    handles the missing vertex_types via its off<len probe; only a
    layout with different ids/dtypes/order is refused."""
    import json as _json

    from cloud_volume_spark.sharding import (
        ShardingSpecification, synthesize_shard_file,
    )
    from cloud_volume_spark.skeletons import (
        SkeletonLayer, encode_precomputed,
    )

    rng = np.random.default_rng(11)
    spec = ShardingSpecification(
        preshift_bits=0, hash="murmurhash3_x86_128",
        minishard_bits=1, shard_bits=0,
        minishard_index_encoding="raw", data_encoding="raw",
    )
    originals = {}
    values = {}
    for segid in (7, 12, 40):
        v = rng.random((5, 3)).astype(np.float32) * 100
        e = np.array([[0, 1], [1, 2], [2, 3], [3, 4]], dtype=np.uint32)
        r = rng.random(5).astype(np.float32)
        originals[segid] = (v, e, r)
        values[segid] = encode_precomputed(v, e, radii=r)

    src = str(tmp_path / "sk_ronly")
    os.makedirs(src)
    with open(os.path.join(src, "0.shard"), "wb") as f:
        f.write(synthesize_shard_file(spec, values))
    with open(os.path.join(src, "info"), "w") as f:
        _json.dump({
            "@type": "neuroglancer_skeletons",
            "transform": [1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0],
            "vertex_attributes": [
                {"id": "radius", "data_type": "float32",
                 "num_components": 1},
            ],
            "sharding": spec.to_dict(),
        }, f)

    layer = SkeletonLayer(spark, str(tmp_path / "sk_ronly_in"))
    layer.import_sharded(src)
    for segid, (v, e, r) in originals.items():
        got = layer.get([segid]).collect()
        assert len(got) == 1, segid
        assert np.allclose(np.array(got[0].vertices), v)
        assert np.array_equal(np.array(got[0].edges), e)
        assert np.allclose(np.array(got[0].radii), r)
        assert got[0].vertex_types is None

    # an empty declaration (no attributes at all) is also a valid prefix
    values2 = {9: encode_precomputed(originals[7][0], originals[7][1])}
    src2 = str(tmp_path / "sk_noattr")
    os.makedirs(src2)
    with open(os.path.join(src2, "0.shard"), "wb") as f:
        f.write(synthesize_shard_file(spec, values2))
    with open(os.path.join(src2, "info"), "w") as f:
        _json.dump({
            "@type": "neuroglancer_skeletons",
            "transform": [1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0],
            "vertex_attributes": [],
            "sharding": spec.to_dict(),
        }, f)
    layer2 = SkeletonLayer(spark, str(tmp_path / "sk_noattr_in"))
    layer2.import_sharded(src2)
    assert layer2.get([9]).count() == 1


def test_spatial_index_sidecar_rides_store_layer(spark, tmp_path,
                                                 monkeypatch):
    """The _spatial_meta.json sidecar must go through PathOps like the
    index data: on a ``file://`` base path (the JVM branch — the same
    code path a gs:///s3a:// index takes) the sidecar lands inside the
    real index dir, and a reopen recovers the grid instead of silently
    defaulting.  A raw open() would have written './file:/...'."""
    monkeypatch.chdir(tmp_path)  # any stray local dir shows up here
    base = "file://" + str(tmp_path / "sidx_uri")
    idx = SpatialIndex(spark, base, cell_size=(50, 50, 50),
                       grid_origin=(10, 10, 10))
    pts = spark.createDataFrame(
        [(1, 20.0, 30.0, 40.0), (2, 90.0, 90.0, 90.0)],
        "label long, x double, y double, z double")
    idx.build_from_points(pts)
    assert os.path.isfile(str(tmp_path / "sidx_uri" / "_spatial_meta.json"))
    assert not os.path.exists(str(tmp_path / "file:")), \
        "sidecar written to a stray local './file:/...' dir"
    reopened = SpatialIndex(spark, base)
    assert reopened.cell_size == (50.0, 50.0, 50.0)
    assert reopened.grid_origin == (10.0, 10.0, 10.0)
    with pytest.raises(ValueError, match="mismatch"):
        SpatialIndex(spark, base, cell_size=(128, 128, 128))


def test_multilod_meta_rides_store_layer(spark, tmp_path, monkeypatch):
    """multilod_meta.json goes through PathOps: a ``file://`` layer
    persists vertex_quantization_bits inside the layer dir (not a stray
    local 'file:' dir) and a reopen recovers it instead of silently
    defaulting to 16 bits."""
    from cloud_volume_spark.multilod import MultiLodMeshLayer

    monkeypatch.chdir(tmp_path)
    base = "file://" + str(tmp_path / "ml_uri")
    layer = MultiLodMeshLayer(spark, base, vertex_quantization_bits=10)
    layer._write_meta()
    assert os.path.isfile(str(tmp_path / "ml_uri" / "multilod_meta.json"))
    assert not os.path.exists(str(tmp_path / "file:"))
    reopened = MultiLodMeshLayer(spark, base)
    assert reopened.vertex_quantization_bits == 10
    with pytest.raises(ValueError, match="vertex_quantization_bits"):
        MultiLodMeshLayer(spark, base, vertex_quantization_bits=16)


def test_spatial_files_interop_file_uri(spark, tmp_path):
    """The .spatial cell-file interop must survive a remote-style base
    path (round-10 advice/verdict item): export to a file:// URI goes
    through PathOps' Hadoop branch from the DRIVER (executor-side
    open() on a joined URI would scatter cells into stray local dirs
    on a real cluster), import reads any scheme through one
    distributed spark.read.text scan — and the round trip is
    bit-faithful against the posix-path export of the same index."""
    import json
    import os

    from cloud_volume_spark.spatial_index import (
        SpatialIndex, export_spatial_files, import_spatial_files,
    )

    idx = SpatialIndex(spark, str(tmp_path / "idx"),
                       cell_size=(128.0, 128.0, 128.0))
    pts = spark.createDataFrame(
        [(7, 10.0, 20.0, 30.0), (7, 200.0, 20.0, 30.0),
         (9, 10.0, 300.0, 30.0)],
        "label long, x double, y double, z double")
    idx.build_from_points(pts)

    out_posix = str(tmp_path / "out_posix")
    out_uri = f"file://{tmp_path}/out_uri"
    assert export_spatial_files(idx, out_posix) == 3
    assert export_spatial_files(idx, out_uri) == 3

    posix_files = sorted(os.listdir(out_posix))
    # the Hadoop branch's ChecksumFileSystem adds hidden .crc sidecars
    # — dotfiles, skipped by globs and the reference's exact-name
    # lookups alike
    uri_files = sorted(f for f in os.listdir(f"{tmp_path}/out_uri")
                       if not f.startswith("."))
    assert uri_files == posix_files
    for name in posix_files:
        a = json.load(open(os.path.join(out_posix, name)))
        b = json.load(open(f"{tmp_path}/out_uri/{name}"))
        assert a == b, name

    # import back from the file:// URI, parquet + sidecar also at a
    # file:// base path — the full Hadoop-branch loop
    idx2 = import_spatial_files(spark, out_uri,
                                f"file://{tmp_path}/idx2")
    assert idx2.cell_size == idx.cell_size
    a = idx.df().toPandas().sort_values(
        ["label", "gx", "gy", "gz"]).reset_index(drop=True)
    b = idx2.df().toPandas().sort_values(
        ["label", "gx", "gy", "gz"]).reset_index(drop=True)
    assert a.equals(b)
    got = sorted(r["label"] for r in idx2.query(
        __import__("cloud_volume_spark").Bbox(
            (0, 0, 0), (64, 64, 64))).collect())
    assert got == [7]
    # a re-import over the same base path replaces the sidecar through
    # PathOps (no stray local 'file:...' dir anywhere under cwd)
    idx3 = import_spatial_files(spark, out_uri,
                                f"file://{tmp_path}/idx2")
    assert idx3.grid_origin == idx2.grid_origin
    assert not os.path.exists("file:")
