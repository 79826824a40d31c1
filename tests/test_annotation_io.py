"""Precomputed annotation binary interop: codec roundtrips, the
reference's own fixture layer with its published golden values
(``/root/reference/test/test_annotations.py``), export → foreign-read,
and foreign-layer ingest into the parquet-native AnnotationLayer."""

import gzip
import json
import math
import os

import numpy as np
import pandas as pd
import pytest

from cloud_volume_spark.annotation_io import (
    AnnotationFormatError,
    PrecomputedAnnotationReader,
    annotation_record_dtype,
    decode_multi_buffer,
    decode_single_buffer,
    encode_multi_buffer,
    encode_single_buffer,
    export_precomputed,
)
from cloud_volume_spark.annotations import AnnotationLayer
from cloud_volume_spark.geometry import Bbox

FIXTURE = "/root/reference/test/test_precomputed_annotation"

PROPS = [{"id": "class_label", "type": "int32"},
         {"id": "score", "type": "float32"}]


# ---------------------------------------------------------------------------
# codec


def test_record_dtype_padding():
    # 3 f4 geometry + int32 + float32 = aligned, no padding
    dt = annotation_record_dtype("POINT", 3, PROPS)
    assert dt.itemsize == 12 + 4 + 4
    # uint8 prop → property block pads to 4
    dt = annotation_record_dtype("POINT", 3, [{"id": "c", "type": "uint8"}])
    assert dt.itemsize == 12 + 4
    # two-point types carry _pt2
    dt = annotation_record_dtype("LINE", 3, [])
    assert dt.itemsize == 24
    with pytest.raises(AnnotationFormatError):
        annotation_record_dtype("POLYLINE", 3, [])


def test_multi_buffer_roundtrip():
    rng = np.random.default_rng(7)
    n = 23
    geo = rng.random((n, 3)).astype(np.float32) * 100
    ids = rng.integers(1, 2**40, n).astype(np.uint64)
    props = {"class_label": rng.integers(0, 5, n).astype(np.int32),
             "score": rng.random(n).astype(np.float32)}
    blob = encode_multi_buffer(geo, ids, props, "POINT", 3, PROPS)
    g2, i2, p2 = decode_multi_buffer(blob, "POINT", 3, PROPS)
    assert np.array_equal(g2, geo) and np.array_equal(i2, ids)
    assert np.array_equal(p2["class_label"], props["class_label"])
    assert np.array_equal(p2["score"], props["score"])


def test_multi_buffer_two_point_roundtrip():
    rng = np.random.default_rng(8)
    n = 9
    geo = rng.random((n, 3, 2)).astype(np.float32)
    ids = np.arange(1, n + 1, dtype=np.uint64)
    blob = encode_multi_buffer(geo, ids, {}, "LINE", 3, [])
    g2, i2, _ = decode_multi_buffer(blob, "LINE", 3, [])
    assert g2.shape == (n, 3, 2)
    assert np.array_equal(g2, geo) and np.array_equal(i2, ids)


def test_single_buffer_roundtrip_with_relationships():
    geo = np.array([1.5, 2.5, 3.5], np.float32)
    props = {"class_label": 4, "score": 0.25}
    rels = {"skeleton_id": [9, 11], "cell_id": []}
    blob = encode_single_buffer(geo, props, rels, "POINT", 3, PROPS,
                                ["skeleton_id", "cell_id"])
    g2, p2, r2 = decode_single_buffer(blob, "POINT", 3, PROPS,
                                      ["skeleton_id", "cell_id"])
    assert np.array_equal(g2, geo)
    assert p2["class_label"] == 4 and p2["score"] == np.float32(0.25)
    assert list(r2["skeleton_id"]) == [9, 11] and len(r2["cell_id"]) == 0


def test_malformed_buffers_raise():
    blob = encode_multi_buffer(
        np.zeros((2, 3), np.float32), np.array([1, 2], np.uint64), {
            "class_label": np.zeros(2, np.int32),
            "score": np.zeros(2, np.float32)}, "POINT", 3, PROPS)
    with pytest.raises(AnnotationFormatError):
        decode_multi_buffer(blob[:-4], "POINT", 3, PROPS)
    with pytest.raises(AnnotationFormatError):
        decode_multi_buffer(b"\x01", "POINT", 3, PROPS)
    single = encode_single_buffer(
        np.zeros(3, np.float32), {"class_label": 0, "score": 0.0},
        {"r": [1]}, "POINT", 3, PROPS, ["r"])
    with pytest.raises(AnnotationFormatError):
        decode_single_buffer(single[:-2], "POINT", 3, PROPS, ["r"])
    with pytest.raises(AnnotationFormatError):
        decode_single_buffer(single + b"\x00", "POINT", 3, PROPS, ["r"])


try:
    from hypothesis import given, settings, strategies as st

    HAS_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAS_HYPOTHESIS = False

if HAS_HYPOTHESIS:
    _PTYPES = ["uint8", "uint16", "uint32", "int8", "int16", "int32",
               "float32", "rgb", "rgba"]

    @st.composite
    def _prop_specs(draw):
        names = draw(st.lists(
            st.sampled_from(["p", "q", "r", "s"]), unique=True,
            min_size=0, max_size=4))
        return [{"id": n, "type": draw(st.sampled_from(_PTYPES))}
                for n in names]

    @given(
        specs=_prop_specs(),
        atype=st.sampled_from(["POINT", "LINE",
                               "AXIS_ALIGNED_BOUNDING_BOX", "ELLIPSOID"]),
        n=st.integers(min_value=0, max_value=40),
        seed=st.integers(min_value=0, max_value=2**31),
    )
    @settings(max_examples=60, deadline=None)
    def test_multi_buffer_roundtrip_property(specs, atype, n, seed):
        """Any property-type combination, any record count, any
        geometry arity: encode→decode is the identity, including the
        padding the property block needs for 4-byte alignment."""
        rng = np.random.default_rng(seed)
        shape = (n, 3, 2) if atype != "POINT" else (n, 3)
        geo = rng.random(shape).astype(np.float32) * 1e4
        ids = rng.integers(1, 2**60, n).astype(np.uint64)
        props = {}
        for p in specs:
            if p["type"] == "float32":
                props[p["id"]] = rng.random(n).astype(np.float32)
            elif p["type"] in ("rgb", "rgba"):
                w = 3 if p["type"] == "rgb" else 4
                props[p["id"]] = rng.integers(
                    0, 256, (n, w)).astype(np.uint8)
            else:
                dt = np.dtype(p["type"])
                lo, hi = (0, 255) if dt.kind == "u" else (-100, 100)
                props[p["id"]] = rng.integers(lo, hi, n).astype(dt)
        blob = encode_multi_buffer(geo, ids, props, atype, 3, specs)
        g2, i2, p2 = decode_multi_buffer(blob, atype, 3, specs)
        assert np.array_equal(i2, ids)
        assert g2.shape == geo.shape and np.array_equal(g2, geo)
        for p in specs:
            assert np.array_equal(p2[p["id"]], props[p["id"]]), p


# ---------------------------------------------------------------------------
# the reference's own fixture layer + its published golden values


@pytest.fixture(scope="module")
def fixture_reader(spark):
    if not os.path.isdir(FIXTURE):
        pytest.skip("reference annotation fixture not present")
    return PrecomputedAnnotationReader(spark, FIXTURE)


def test_fixture_info(fixture_reader):
    assert fixture_reader.info["@type"] == "neuroglancer_annotations_v1"
    assert fixture_reader.annotation_type == "POINT"
    assert fixture_reader.ndim == 3


def test_fixture_get_by_id_golden(fixture_reader):
    # reference test_annotations.py: get_by_id(3867588737)
    row = fixture_reader.get_by_id([3867588737]).collect()[0]
    assert np.allclose([row.x, row.y, row.z],
                       [1.937760e6, 1.318752e6, 9.69210e4])
    assert row.rel_skeleton_id  # carries its relationship ids


def test_fixture_relationship_golden(fixture_reader):
    # reference: skeleton_id 243895108 → 4 annotations, all 'axon'
    rows = fixture_reader.get_by_relationship(
        "skeleton_id", [243895108]).collect()
    assert len(rows) == 4
    enum = fixture_reader.properties_enum()["class_label"]
    assert {enum[r.class_label] for r in rows} == {"axon"}


def test_fixture_get_all_golden(fixture_reader):
    # reference: 10043 points, 7 distinct class labels AFTER enum map
    df = fixture_reader.get_all(mip=0)
    assert df.count() == 10043
    enum = fixture_reader.properties_enum()["class_label"]
    vals = [r.class_label for r in
            df.select("class_label").distinct().collect()]
    assert len({enum[v] for v in vals}) == 7


def test_fixture_ids_listing(fixture_reader):
    ids = fixture_reader.ids()
    assert 3867588737 in ids


def test_fixture_ingest_to_layer(fixture_reader, spark, tmp_path):
    # mip=0 — the fixture (like the reference's own test) ships only
    # the spatial0 level; finer levels exist in info but not on disk.
    # Note the fixture's three index dirs carry DISJOINT sample ids
    # (the by_id / skeleton_id examples are not in the spatial set), so
    # only the spatial content lands; relationship-array ingest on a
    # coherent layer is proven by test_export_by_id_and_relationships.
    layer = fixture_reader.to_layer(str(tmp_path / "ingested"), mip=0)
    assert layer.count() == 10043
    assert layer.annotation_type == "POINT"
    assert layer.relationships == ["skeleton_id"]
    # enum property metadata survives the ingest
    enum = layer.properties_enum()["class_label"]
    vals = [r.class_label for r in
            layer.df().select("class_label").distinct().collect()]
    assert len({enum[v] for v in vals}) == 7
    # the rel column exists as an (empty-array) column, queryable
    assert layer.get_by_relationship("skeleton_id", [243895108]).count() == 0


# ---------------------------------------------------------------------------
# export → re-read (our writer, our reader: both speak the public format)


@pytest.fixture(scope="module")
def exported(spark, tmp_path_factory):
    rng = np.random.default_rng(11)
    n = 400
    pdf = pd.DataFrame({
        "id": np.arange(1, n + 1, dtype=np.int64),
        "x": rng.random(n) * 1000,
        "y": rng.random(n) * 800,
        "z": rng.random(n) * 300,
        "class_label": rng.integers(0, 5, n).astype(np.int32),
        "rel_skel": [
            [int(v) for v in rng.integers(1, 40, rng.integers(0, 4))]
            for _ in range(n)
        ],
    })
    base = tmp_path_factory.mktemp("annio")
    layer = AnnotationLayer(
        spark, str(base / "layer"),
        annotation_type="POINT",
        properties={"class_label": {
            "type": "int32",
            "enum_values": [0, 1, 2, 3, 4],
            "enum_labels": ["a", "b", "c", "d", "e"],
        }},
        relationships=["skel"],
        grid_cell=(256, 256, 128),
    )
    layer.write(spark.createDataFrame(pdf))
    out = str(base / "precomputed")
    stats = export_precomputed(layer, out)
    return layer, pdf, out, stats


def test_export_layout(exported):
    _, pdf, out, stats = exported
    assert stats["annotations"] == len(pdf)
    info = json.load(open(os.path.join(out, "info")))
    assert info["@type"] == "neuroglancer_annotations_v1"
    assert info["by_id"]["key"] == "by_id"
    assert [p["id"] for p in info["properties"]] == ["class_label"]
    # values are gzipped with the CloudFiles .gz convention
    cell = next(f for f in os.listdir(os.path.join(out, "spatial0")))
    assert cell.endswith(".gz")
    raw = open(os.path.join(out, "spatial0", cell), "rb").read()
    gzip.decompress(raw)  # must be valid gzip


def test_export_reimport_matches(exported, spark):
    layer, pdf, out, _ = exported
    rdr = PrecomputedAnnotationReader(spark, out)
    got = rdr.get_all(mip=0).toPandas().sort_values("id").reset_index(drop=True)
    exp = pdf.sort_values("id").reset_index(drop=True)
    assert len(got) == len(exp)
    assert np.array_equal(got["id"].to_numpy(), exp["id"].to_numpy())
    # geometry survives the f4 roundtrip
    for c in ("x", "y", "z"):
        assert np.allclose(got[c], exp[c].astype(np.float32), atol=0)
    assert np.array_equal(got["class_label"], exp["class_label"])


def test_export_by_id_and_relationships(exported, spark):
    layer, pdf, out, _ = exported
    rdr = PrecomputedAnnotationReader(spark, out)
    some = [5, 77, 399]
    rows = {r.id: r for r in rdr.get_by_id(some).collect()}
    assert set(rows) == set(some)
    for i in some:
        exp = pdf[pdf.id == i].iloc[0]
        assert np.isclose(rows[i].x, np.float32(exp.x))
        assert sorted(rows[i].rel_skel) == sorted(exp.rel_skel)
    # relationship dir inverts correctly
    seg = 7
    got = {r.id for r in rdr.get_by_relationship("skel", [seg]).collect()}
    exp_ids = {int(i) for i, rels in zip(pdf.id, pdf.rel_skel) if seg in rels}
    assert got == exp_ids


def test_export_bbox_query(exported, spark):
    layer, pdf, out, _ = exported
    rdr = PrecomputedAnnotationReader(spark, out)
    bbox = Bbox((100, 100, 50), (600, 500, 250))
    got = {r.id for r in rdr.get_by_bbox(bbox, mip=0).select("id").collect()}
    g = pdf[["x", "y", "z"]].astype(np.float32)
    mask = (
        (g.x >= 100) & (g.x <= 600)
        & (g.y >= 100) & (g.y <= 500)
        & (g.z >= 50) & (g.z <= 250)
    )
    assert got == {int(i) for i in pdf[mask.to_numpy()]["id"]}


def test_sharded_spatial_and_by_id(spark, tmp_path):
    """Sharded spatial cells + sharded by_id read through the same
    neuroglancer_uint64_sharded_v1 machinery as image shards."""
    from cloud_volume_spark.chunking import compressed_morton_code
    from cloud_volume_spark.sharding import (
        ShardingSpecification, synthesize_shard_file,
    )

    rng = np.random.default_rng(5)
    props = [{"id": "class_label", "type": "int32"}]
    grid = [2, 2, 1]
    spec = ShardingSpecification(
        preshift_bits=0, hash="identity", minishard_bits=1, shard_bits=0,
        minishard_index_encoding="gzip", data_encoding="gzip",
    )
    base = tmp_path / "sharded"
    (base / "spatial0").mkdir(parents=True)
    (base / "by_id").mkdir()

    cell_values, by_id_values, total = {}, {}, 0
    next_id = 1
    for gz in range(grid[2]):
        for gy in range(grid[1]):
            for gx in range(grid[0]):
                n = int(rng.integers(3, 8))
                geo = (rng.random((n, 3)).astype(np.float32)
                       + np.array([gx, gy, gz], np.float32)) * 100
                ids = np.arange(next_id, next_id + n, dtype=np.uint64)
                next_id += n
                pr = {"class_label": rng.integers(0, 3, n).astype(np.int32)}
                code = int(compressed_morton_code(
                    np.array([gx, gy, gz]), grid))
                cell_values[code] = encode_multi_buffer(
                    geo, ids, pr, "POINT", 3, props)
                for k in range(n):
                    by_id_values[int(ids[k])] = encode_single_buffer(
                        geo[k], {"class_label": pr["class_label"][k]},
                        {}, "POINT", 3, props, [])
                total += n

    with open(base / "spatial0" / "0.shard", "wb") as f:
        f.write(synthesize_shard_file(spec, cell_values))
    with open(base / "by_id" / "0.shard", "wb") as f:
        f.write(synthesize_shard_file(spec, by_id_values))
    info = {
        "@type": "neuroglancer_annotations_v1",
        "annotation_type": "POINT",
        "dimensions": {"x": [1, "nm"], "y": [1, "nm"], "z": [1, "nm"]},
        "lower_bound": [0, 0, 0], "upper_bound": [200, 200, 100],
        "properties": props, "relationships": [],
        "by_id": {"key": "by_id", "sharding": spec.to_dict()},
        "spatial": [{"key": "spatial0", "chunk_size": [100, 100, 100],
                     "grid_shape": grid, "limit": 100,
                     "sharding": spec.to_dict()}],
    }
    with open(base / "info", "w") as f:
        json.dump(info, f)

    rdr = PrecomputedAnnotationReader(spark, str(base))
    assert rdr.get_all(mip=0).count() == total
    assert rdr.ids() == sorted(by_id_values)
    some = sorted(by_id_values)[:3]
    rows = {r.id: r for r in rdr.get_by_id(some).collect()}
    assert set(rows) == set(some)


def test_export_lod_pyramid(spark, tmp_path):
    """Multi-level export: every annotation lands at exactly one
    level, coarse cells respect the per-cell limit, the union over
    levels is the complete set, and get_union/to_layer see it all."""
    rng = np.random.default_rng(17)
    n, limit, levels = 3000, 100, 3
    pdf = pd.DataFrame({
        "id": np.arange(1, n + 1, dtype=np.int64),
        "x": rng.random(n) * 1000, "y": rng.random(n) * 1000,
        "z": rng.random(n) * 1000,
    })
    layer = AnnotationLayer(
        spark, str(tmp_path / "pyr_layer"), grid_cell=(125, 125, 125),
    )
    layer.write(spark.createDataFrame(pdf))
    out = str(tmp_path / "pyr")
    stats = export_precomputed(layer, out, limit=limit, levels=levels,
                               write_by_id=False)
    assert len(stats["level_counts"]) == levels
    assert sum(stats["level_counts"]) == n
    # level 0 = one cell over the bounds, capped at limit
    assert stats["level_counts"][0] == limit
    rdr = PrecomputedAnnotationReader(spark, out)
    info = rdr.info
    assert len(info["spatial"]) == levels
    assert info["spatial"][1]["grid_shape"] == [2, 2, 2]
    # per-cell limit holds on every non-final level (count rows in
    # each cell file directly)
    for mip in range(levels - 1):
        spec = info["spatial"][mip]
        for fname in os.listdir(os.path.join(out, spec["key"])):
            blob = gzip.decompress(
                open(os.path.join(out, spec["key"], fname), "rb").read()
            )
            assert int.from_bytes(blob[:8], "little") <= limit
    ids_by_level = [
        {r.id for r in rdr.get_all(mip=m).select("id").collect()}
        for m in range(levels)
    ]
    # disjoint levels, complete union
    assert sum(len(s) for s in ids_by_level) == n
    union = set().union(*ids_by_level)
    assert union == set(range(1, n + 1))
    assert rdr.get_union().count() == n
    # deterministic: re-export assigns identically
    out2 = str(tmp_path / "pyr2")
    export_precomputed(layer, out2, limit=limit, levels=levels,
                       write_by_id=False)
    rdr2 = PrecomputedAnnotationReader(spark, out2)
    assert {r.id for r in rdr2.get_all(mip=0).select("id").collect()} \
        == ids_by_level[0]
    # full ingest via to_layer default (union of levels)
    ing = rdr.to_layer(str(tmp_path / "pyr_ingested"))
    assert ing.count() == n


def test_export_sharded_spatial_roundtrip(spark, tmp_path):
    """shard_spatial=True writes each level's cells as morton-keyed
    values in .shard files (the production layout); the reader's
    sharded path reads them back byte-identically."""
    rng = np.random.default_rng(23)
    n = 800
    pdf = pd.DataFrame({
        "id": np.arange(1, n + 1, dtype=np.int64),
        "x": rng.random(n) * 400, "y": rng.random(n) * 400,
        "z": rng.random(n) * 400,
        "class_label": rng.integers(0, 4, n).astype(np.int32),
    })
    layer = AnnotationLayer(
        spark, str(tmp_path / "sh_layer"),
        annotation_type="POINT",
        properties={"class_label": "int32"},
        grid_cell=(100, 100, 100),
    )
    layer.write(spark.createDataFrame(pdf))
    out = str(tmp_path / "sh_pre")
    stats = export_precomputed(layer, out, limit=60, levels=3,
                               write_by_id=False, shard_spatial=True)
    assert sum(stats["level_counts"]) == n
    # only .shard files in the spatial dirs
    info = json.load(open(os.path.join(out, "info")))
    for spec in info["spatial"]:
        assert spec.get("sharding") is not None
        files = os.listdir(os.path.join(out, spec["key"]))
        assert files and all(f.endswith(".shard") for f in files)
    rdr = PrecomputedAnnotationReader(spark, out)
    got = rdr.get_union().toPandas().sort_values("id").reset_index(drop=True)
    exp = pdf.sort_values("id").reset_index(drop=True)
    assert len(got) == n
    assert np.array_equal(got["id"].to_numpy(), exp["id"].to_numpy())
    assert np.array_equal(got["class_label"], exp["class_label"])
    for c in ("x", "y", "z"):
        assert np.allclose(got[c], exp[c].astype(np.float32))


def test_reader_missing_cells_and_outside_bbox(spark, exported):
    """Cells absent on disk decode as empty (the reference treats a
    missing spatial value as no annotations, reader.py:258/268); a
    bbox fully outside the bounds clamps to edge cells and the exact
    filter leaves nothing."""
    _, pdf, out, _ = exported
    rdr = PrecomputedAnnotationReader(spark, out)
    # delete one cell file: layer still reads, minus that cell's rows
    spatial = os.path.join(out, "spatial0")
    victim = sorted(os.listdir(spatial))[0]
    blob = gzip.decompress(open(os.path.join(spatial, victim), "rb").read())
    n_victim = int.from_bytes(blob[:8], "little")
    os.rename(os.path.join(spatial, victim),
              os.path.join(spatial, victim + ".bak"))
    try:
        assert rdr.get_all(mip=0).count() == len(pdf) - n_victim
    finally:
        os.rename(os.path.join(spatial, victim + ".bak"),
                  os.path.join(spatial, victim))
    # bbox entirely outside the data
    far = Bbox((90000, 90000, 90000), (90010, 90010, 90010))
    assert rdr.get_by_bbox(far, mip=0).count() == 0
    # unknown ids simply yield no rows
    assert rdr.get_by_id([10**12]).count() == 0


def test_export_roundtrip_two_point(spark, tmp_path):
    rng = np.random.default_rng(3)
    n = 60
    pdf = pd.DataFrame({
        "id": np.arange(1, n + 1, dtype=np.int64),
        "x": rng.random(n) * 100, "y": rng.random(n) * 100,
        "z": rng.random(n) * 100,
        "x2": rng.random(n) * 100, "y2": rng.random(n) * 100,
        "z2": rng.random(n) * 100,
    })
    layer = AnnotationLayer(
        spark, str(tmp_path / "lines"),
        annotation_type="LINE", grid_cell=(64, 64, 64),
    )
    layer.write(spark.createDataFrame(pdf))
    out = str(tmp_path / "lines_pre")
    export_precomputed(layer, out)
    rdr = PrecomputedAnnotationReader(spark, out)
    got = rdr.get_all(mip=0).toPandas().sort_values("id").reset_index(drop=True)
    exp = pdf.sort_values("id").reset_index(drop=True)
    for c in ("x", "y", "z", "x2", "y2", "z2"):
        assert np.allclose(got[c], exp[c].astype(np.float32))


def test_export_bounds_cover_second_endpoints(spark, tmp_path):
    """info's lower/upper_bound must cover BOTH endpoints of two-point
    geometries: a LINE whose second endpoint lies beyond every first
    endpoint previously exported bounds that excluded it, so bbox
    queries overlapping only that endpoint missed the annotation."""
    import json
    import os

    pdf = pd.DataFrame({
        "id": np.array([1, 2], dtype=np.int64),
        "x": [10.0, 20.0], "y": [10.0, 20.0], "z": [10.0, 20.0],
        # endpoint far outside the first-endpoint envelope, one axis
        # also NEGATIVE to exercise the lower bound
        "x2": [500.0, -40.0], "y2": [30.0, 15.0], "z2": [12.0, 18.0],
    })
    layer = AnnotationLayer(
        spark, str(tmp_path / "wide_lines"),
        annotation_type="LINE", grid_cell=(64, 64, 64),
    )
    layer.write(spark.createDataFrame(pdf))
    out = str(tmp_path / "wide_pre")
    export_precomputed(layer, out)
    info = json.load(open(os.path.join(out, "info")))
    assert info["lower_bound"][0] <= -40
    assert info["upper_bound"][0] >= 500
    assert info["upper_bound"][1] >= 30


# ---------------------------------------------------------------------------
# POLYLINE variable-length records (exceeds the reference: its own
# POLYLINE branch references undefined variables and NameErrors,
# annotation/metadata.py:436-444)


def test_polyline_multi_buffer_roundtrip_mixed_lengths():
    from cloud_volume_spark.annotation_io import (
        decode_polyline_multi_buffer, encode_polyline_multi_buffer,
    )

    props_spec = [{"id": "score", "type": "uint8"},
                  {"id": "color", "type": "rgb"}]
    lines = [
        np.array([[0, 0, 0], [1, 2, 3]], dtype=np.float32),
        np.array([[5, 5, 5], [6, 6, 6], [7, 8, 9], [1, 1, 1],
                  [2, 2, 2]], dtype=np.float32),
        np.array([[9, 9, 9], [8, 8, 8], [7, 7, 7]], dtype=np.float32),
    ]
    ids = np.array([11, 22, 33], dtype=np.uint64)
    props = {"score": np.array([1, 2, 250], dtype=np.uint8),
             "color": np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]],
                               dtype=np.uint8)}
    blob = encode_polyline_multi_buffer(lines, ids, props, 3, props_spec)

    # structural golden: count header, then per record u32 k + k*3 f4
    # + props padded to 4 (1 + 3 -> no pad), trailing ids
    assert blob[:8] == (3).to_bytes(8, "little")
    assert blob[8:12] == (2).to_bytes(4, "little")  # first record k=2
    expected_len = 8 + sum(4 + 4 * 3 * k + 4 for k in (2, 5, 3)) + 8 * 3
    assert len(blob) == expected_len

    glines, gids, gprops = decode_polyline_multi_buffer(blob, 3, props_spec)
    assert [g.shape for g in glines] == [(2, 3), (5, 3), (3, 3)]
    for g, l in zip(glines, lines):
        assert np.array_equal(g, l)
    assert np.array_equal(gids, ids)
    assert np.array_equal(gprops["score"], props["score"])
    assert np.array_equal(gprops["color"], props["color"])


def test_polyline_multi_buffer_no_props_and_truncation():
    from cloud_volume_spark.annotation_io import (
        AnnotationFormatError, decode_polyline_multi_buffer,
        encode_polyline_multi_buffer,
    )

    lines = [np.zeros((4, 3), np.float32), np.ones((1, 3), np.float32)]
    ids = np.array([7, 8], dtype=np.uint64)
    blob = encode_polyline_multi_buffer(lines, ids, {}, 3, [])
    glines, gids, gprops = decode_polyline_multi_buffer(blob, 3, [])
    assert [g.shape for g in glines] == [(4, 3), (1, 3)]
    assert gprops == {}
    with pytest.raises(AnnotationFormatError):
        decode_polyline_multi_buffer(blob[:-3], 3, [])
    with pytest.raises(AnnotationFormatError):
        decode_polyline_multi_buffer(blob[:14], 3, [])


def test_polyline_single_buffer_roundtrip_with_relationships():
    from cloud_volume_spark.annotation_io import (
        decode_polyline_single_buffer, encode_polyline_single_buffer,
    )

    props_spec = [{"id": "kind", "type": "uint16"}]
    pts = np.array([[1, 2, 3], [4, 5, 6], [7, 8, 9]], dtype=np.float32)
    blob = encode_polyline_single_buffer(
        pts, {"kind": 42}, {"skel": [5, 6], "syn": []}, 3,
        props_spec, ["skel", "syn"],
    )
    gpts, gprops, grels = decode_polyline_single_buffer(
        blob, 3, props_spec, ["skel", "syn"])
    assert np.array_equal(gpts, pts)
    assert gprops["kind"] == 42
    assert list(grels["skel"]) == [5, 6]
    assert list(grels["syn"]) == []


def test_polyline_fixed_dtype_still_refused():
    from cloud_volume_spark.annotation_io import (
        AnnotationFormatError, annotation_record_dtype,
    )

    with pytest.raises(AnnotationFormatError, match="POLYLINE"):
        annotation_record_dtype("POLYLINE", 3, [])


def test_polyline_layer_export_read_reimport(spark, tmp_path):
    """End-to-end POLYLINE: parquet layer -> precomputed binary export
    (spatial + by_id + relationships) -> reader -> re-ingested layer,
    with mixed vertex counts, a property, and a relationship. Exceeds
    the reference, which cannot read POLYLINE layers at all."""
    rng = np.random.default_rng(17)
    n = 40
    lines = [
        rng.random(3 * int(k)).astype(np.float64) * 100.0
        for k in rng.integers(2, 7, n)
    ]
    pdf = pd.DataFrame({
        "id": np.arange(1, n + 1, dtype=np.int64),
        "points": [list(l) for l in lines],
        "score": rng.integers(0, 200, n).astype(np.int32),
        # sorted unique: to_layer rebuilds these from the inverted
        # relationship index, which collapses duplicates and sorts
        "rel_skel": [
            sorted({int(v) for v in rng.integers(1, 9, rng.integers(0, 3))})
            for _ in range(n)
        ],
    })
    layer = AnnotationLayer(
        spark, str(tmp_path / "poly_layer"),
        annotation_type="POLYLINE",
        properties={"score": {"type": "int32"}},
        relationships=["skel"],
        grid_cell=(64, 64, 64),
    )
    layer.write(spark.createDataFrame(pdf))
    # first-vertex axis columns derived at write
    got = layer.df().toPandas().sort_values("id").reset_index(drop=True)
    assert np.allclose(got["x"], [l[0] for l in lines])

    out = str(tmp_path / "poly_pre")
    stats = export_precomputed(layer, out)
    assert stats["annotations"] == n
    # bounds cover every vertex, not just the firsts
    import json as _json
    info = _json.load(open(os.path.join(out, "info")))
    allv = np.concatenate(lines).reshape(-1, 3)
    for i in range(3):
        assert info["lower_bound"][i] <= allv[:, i].min()
        assert info["upper_bound"][i] >= allv[:, i].max()

    rdr = PrecomputedAnnotationReader(spark, out)
    back = rdr.get_all(mip=0).toPandas().sort_values("id") \
        .reset_index(drop=True)
    assert len(back) == n
    for i in range(n):
        assert np.allclose(
            back["points"][i], lines[i].astype(np.float32)), i
    assert np.array_equal(back["score"], pdf["score"])

    # by-id path returns vertices + relationships
    one = rdr.get_by_id([3]).collect()[0]
    assert np.allclose(one.points, lines[2].astype(np.float32))
    assert list(one.rel_skel) == list(pdf["rel_skel"][2])

    # relationship path
    seg = int(pdf["rel_skel"][4][0]) if len(pdf["rel_skel"][4]) else 1
    rel_rows = rdr.get_by_relationship("skel", [seg]).toPandas()
    expect_ids = {int(pdf["id"][i]) for i in range(n)
                  if seg in pdf["rel_skel"][i]}
    assert set(rel_rows["id"]) == expect_ids

    # full reimport equals the original layer
    layer2 = rdr.to_layer(str(tmp_path / "poly_back"), mip=0)
    a = layer2.df().toPandas().sort_values("id").reset_index(drop=True)
    for i in range(n):
        assert np.allclose(a["points"][i], lines[i].astype(np.float32))
    assert np.array_equal(a["score"], pdf["score"])
    assert [list(v) for v in a["rel_skel"]] == list(pdf["rel_skel"])


def test_polyline_invalid_points_rejected_at_write(spark, tmp_path):
    """Zero-vertex / wrong-arity points fail LOUDLY at write time
    (raise_error inside the write plan), not deep inside a later
    reader or export task."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    def layer(name):
        return AnnotationLayer(
            spark, str(tmp_path / name), annotation_type="POLYLINE",
            grid_cell=(64, 64, 64),
        )

    # flat run whose length is not a multiple of 3
    bad_flat = pd.DataFrame({
        "id": [1], "points": [[1.0, 2.0, 3.0, 4.0]],
    })
    with pytest.raises(SparkRuntimeException, match="invalid points"):
        layer("bad_flat").write(spark.createDataFrame(bad_flat))

    # empty vertex list
    bad_empty = pd.DataFrame({"id": [1], "points": [[]]})
    bad_empty["points"] = bad_empty["points"].astype(object)
    sdf = spark.createDataFrame(
        [(1, [])], schema="id long, points array<double>")
    with pytest.raises(SparkRuntimeException, match="invalid points"):
        layer("bad_empty").write(sdf)

    # nested vertices with wrong inner arity
    sdf = spark.createDataFrame(
        [(1, [[1.0, 2.0, 3.0], [4.0, 5.0]])],
        schema="id long, points array<array<double>>")
    with pytest.raises(SparkRuntimeException, match="invalid points"):
        layer("bad_nested").write(sdf)

    # the python codec guards too
    from cloud_volume_spark.annotation_io import (
        encode_polyline_multi_buffer,
    )
    with pytest.raises(ValueError, match="POLYLINE vertices"):
        encode_polyline_multi_buffer([np.zeros((0,))], [1], {}, 3, [])


# hypothesis property tests: the POLYLINE dialect has no reference
# interop oracle (the reference's own POLYLINE branch NameErrors), so
# the repo's dialect is pinned by exhaustive roundtrip fidelity over
# mixed-length polylines x every property dtype x relationships
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAVE_HYP = True
except ImportError:  # pragma: no cover
    _HAVE_HYP = False

_ALL_PROP_TYPES = ["uint8", "uint16", "uint32", "int8", "int16",
                   "int32", "float32", "rgb", "rgba"]

if _HAVE_HYP:

    def _prop_array(rng_ints, ptype, n):
        """Deterministic per-type values built from a drawn int list."""
        if ptype == "rgb":
            return np.array(rng_ints, dtype=np.uint8)[: n * 3].reshape(n, 3)
        if ptype == "rgba":
            return np.array(rng_ints, dtype=np.uint8)[: n * 4].reshape(n, 4)
        dt = np.dtype(ptype)
        return np.array(rng_ints[:n], dtype=np.int64).astype(dt)

    @st.composite
    def _polyline_corpus(draw):
        ndim = draw(st.sampled_from([2, 3, 4]))
        ks = draw(st.lists(st.integers(1, 8), min_size=1, max_size=6))
        n = len(ks)
        coords = draw(st.lists(
            st.floats(allow_nan=False, allow_infinity=False, width=32),
            min_size=sum(ks) * ndim, max_size=sum(ks) * ndim))
        lines, at = [], 0
        for k in ks:
            lines.append(np.asarray(
                coords[at:at + k * ndim], dtype="<f4").reshape(k, ndim))
            at += k * ndim
        ptypes = draw(st.lists(st.sampled_from(_ALL_PROP_TYPES),
                               unique=True, max_size=len(_ALL_PROP_TYPES)))
        raw = draw(st.lists(st.integers(0, 127), min_size=4 * n,
                            max_size=4 * n))
        spec = [{"id": f"p{i}_{t}", "type": t}
                for i, t in enumerate(ptypes)]
        props = {s["id"]: _prop_array(raw, s["type"], n) for s in spec}
        ids = np.asarray(
            draw(st.lists(st.integers(0, 2**64 - 1), min_size=n,
                          max_size=n, unique=True)), dtype=np.uint64)
        return ndim, lines, ids, spec, props

    @settings(max_examples=25, deadline=None)
    @given(_polyline_corpus())
    def test_polyline_multi_buffer_property_roundtrip(corpus):
        from cloud_volume_spark.annotation_io import (
            decode_polyline_multi_buffer, encode_polyline_multi_buffer,
        )

        ndim, lines, ids, spec, props = corpus
        blob = encode_polyline_multi_buffer(lines, ids, props, ndim, spec)
        glines, gids, gprops = decode_polyline_multi_buffer(
            blob, ndim, spec)
        assert [g.shape for g in glines] == [l.shape for l in lines]
        for g, l in zip(glines, lines):
            assert np.array_equal(g, l)
        assert np.array_equal(gids, ids)
        assert set(gprops) == set(props)
        for k in props:
            assert np.array_equal(gprops[k], props[k]), k

    @settings(max_examples=25, deadline=None)
    @given(_polyline_corpus(),
           st.lists(st.tuples(
               st.text("abcdefgh", min_size=1, max_size=6),
               st.lists(st.integers(0, 2**64 - 1), max_size=5)),
               max_size=3))
    def test_polyline_single_buffer_property_roundtrip(corpus, rel_spec):
        from cloud_volume_spark.annotation_io import (
            decode_polyline_single_buffer, encode_polyline_single_buffer,
        )

        ndim, lines, _, spec, props = corpus
        pts = lines[0]
        one = {s["id"]: np.asarray(props[s["id"]])[0] for s in spec}
        rel_names, rels = [], {}
        for name, vals in rel_spec:
            if name in rels:
                continue
            rel_names.append(name)
            rels[name] = np.asarray(vals, dtype=np.uint64)
        blob = encode_polyline_single_buffer(
            pts, one, rels, ndim, spec, rel_names)
        gpts, gprops, grels = decode_polyline_single_buffer(
            blob, ndim, spec, rel_names)
        assert np.array_equal(gpts, pts)
        for k in one:
            assert np.array_equal(gprops[k], one[k]), k
        assert set(grels) == set(rels)
        for k in rels:
            assert np.array_equal(grels[k], rels[k])


def test_export_ellipsoid_bounds_use_radii(spark, tmp_path):
    """ELLIPSOID's second vector is per-axis RADII, not a coordinate:
    declared bounds must be center ± radius. The old least/greatest of
    (center, radius) put the lower bound near the radius magnitude —
    thousands of empty grid cells — and excluded every ellipsoid's far
    side from the upper bound."""
    pdf = pd.DataFrame({
        "id": np.array([1, 2], dtype=np.int64),
        "x": [10000.0, 10100.0], "y": [10000.0, 10050.0],
        "z": [5000.0, 5020.0],
        "x2": [5.0, 8.0], "y2": [5.0, 8.0], "z2": [5.0, 8.0],  # radii
    })
    layer = AnnotationLayer(
        spark, str(tmp_path / "ell"), annotation_type="ELLIPSOID",
        grid_cell=(256, 256, 256))
    layer.write(spark.createDataFrame(pdf))
    out = str(tmp_path / "ell_out")
    export_precomputed(layer, out)
    info = json.load(open(os.path.join(out, "info")))
    assert info["lower_bound"][0] == math.floor(10000 - 5)
    assert info["upper_bound"][0] >= 10100 + 8
    assert info["lower_bound"][2] == math.floor(5000 - 5)
    # the grid covers the ~100-unit data extent, not a 10000-unit
    # span down to the radius values
    assert all(g <= 2 for g in info["spatial"][0]["grid_shape"])


def test_export_property_named_like_python_keyword(spark, tmp_path):
    """A property id that is a Python keyword ('class' is valid per the
    neuroglancer grammar) must survive the by_id export — namedtuple
    field renaming turned it into '_4' and KeyError'd every record."""
    pdf = pd.DataFrame({
        "id": np.arange(1, 6, dtype=np.int64),
        "x": np.linspace(0, 10, 5), "y": np.linspace(0, 10, 5),
        "z": np.linspace(0, 10, 5),
        "class": np.arange(5, dtype=np.int32),
    })
    layer = AnnotationLayer(
        spark, str(tmp_path / "kw"), annotation_type="POINT",
        properties={"class": {"type": "int32"}})
    layer.write(spark.createDataFrame(pdf))
    out = str(tmp_path / "kw_out")
    export_precomputed(layer, out)
    rdr = PrecomputedAnnotationReader(spark, out)
    got = rdr.get_by_id([3]).collect()[0]
    assert int(got["class"]) == 2


def test_export_empty_layer_is_valid(spark, tmp_path):
    """Zero annotations export as a valid empty layer (unit bounds, one
    cell), not a TypeError on floor(None)."""
    layer = AnnotationLayer(
        spark, str(tmp_path / "empty"), annotation_type="POINT")
    layer.write(spark.createDataFrame(
        [], "id long, x double, y double, z double"))
    out = str(tmp_path / "empty_out")
    stats = export_precomputed(layer, out)
    assert stats["annotations"] == 0
    rdr = PrecomputedAnnotationReader(spark, out)
    assert rdr.get_all(mip=0).count() == 0
    assert rdr.ids() == []


def test_read_value_gzip_magic_collision(tmp_path):
    """An UNCOMPRESSED buffer whose first two bytes coincide with the
    gzip magic (count n with n % 65536 == 35615) must read back raw,
    not crash in gzip.decompress."""
    import struct

    from cloud_volume_spark.annotation_io import _read_value

    d = str(tmp_path)
    n = 35615  # 0x8b1f → little-endian bytes 1f 8b
    payload = struct.pack("<Q", n) + b"\x00" * 16
    assert payload[:2] == b"\x1f\x8b"
    with open(os.path.join(d, "cellkey"), "wb") as f:
        f.write(payload)
    assert _read_value(d, "cellkey") == payload
    # gzip.decompress raises OSError for that payload (bad method byte);
    # a VALID 10-byte header with a non-deflate body raises zlib.error,
    # and a bare truncated header raises EOFError — all three are the
    # same 1f 8b coincidence and must fall back to raw bytes
    zpayload = bytes.fromhex("1f8b08000000000000ff") + b"\xff\xff\xfe\x01"
    with open(os.path.join(d, "zkey"), "wb") as f:
        f.write(zpayload)
    assert _read_value(d, "zkey") == zpayload
    epayload = bytes.fromhex("1f8b08000000000000ff")
    with open(os.path.join(d, "ekey"), "wb") as f:
        f.write(epayload)
    assert _read_value(d, "ekey") == epayload
    # real gzip under a plain name still decompresses
    with open(os.path.join(d, "gzkey"), "wb") as f:
        f.write(gzip.compress(b"hello", mtime=0))
    assert _read_value(d, "gzkey") == b"hello"


def test_stray_files_do_not_crash_id_listing(spark, tmp_path):
    """'.DS_Store'-style stray files in by_id/rel dirs of a foreign
    layer are skipped, not int()-crashed."""
    rng = np.random.default_rng(3)
    pdf = pd.DataFrame({
        "id": np.arange(1, 4, dtype=np.int64),
        "x": rng.random(3), "y": rng.random(3), "z": rng.random(3),
        "rel_p": [[1], [2], []],
    })
    layer = AnnotationLayer(
        spark, str(tmp_path / "stray"), annotation_type="POINT",
        relationships=["p"])
    layer.write(spark.createDataFrame(pdf))
    out = str(tmp_path / "stray_out")
    export_precomputed(layer, out)
    for sub in ("by_id", "rel_p"):
        with open(os.path.join(out, sub, ".DS_Store"), "wb") as f:
            f.write(b"junk")
    rdr = PrecomputedAnnotationReader(spark, out)
    assert rdr.ids() == [1, 2, 3]
    assert rdr.relationship_segids("p") == [1, 2]
