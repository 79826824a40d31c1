"""Graphene semantics tests (reference test_graphene.py patterns:
label codec golden checks, roots/leaves resolution, timestamped
agglomeration, masked reads)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cloud_volume_spark.geometry import Bbox
from cloud_volume_spark.graphene import GrapheneLabelCodec, GrapheneLayer
from cloud_volume_spark.volume import Volume


def test_codec_py_roundtrip():
    codec = GrapheneLabelCodec(layer_bits=8, spatial_bits=(10, 10, 10))
    for vals in [(1, 0, 0, 0, 7), (4, 1023, 5, 900, 123456), (12, 3, 3, 3, 1)]:
        packed = codec.pack_py(*vals)
        d = codec.unpack_py(packed)
        assert (d["layer"], d["x"], d["y"], d["z"], d["segid"]) == vals


def test_codec_sql_matches_py(spark):
    codec = GrapheneLabelCodec(layer_bits=8, spatial_bits=(10, 10, 10))
    rows = [(2, 17, 40, 999, 424242), (1, 0, 0, 0, 1)]
    df = spark.createDataFrame(
        rows, schema="layer int, x int, y int, z int, segid long"
    )
    packed = df.select(
        codec.pack(F.col("layer"), F.col("x"), F.col("y"), F.col("z"),
                   F.col("segid")).alias("label"),
        "layer", "x", "y", "z", "segid",
    )
    un = packed.select("label", "layer", "x", "y", "z", "segid",
                       *[v.alias(f"u_{k}") for k, v in
                         codec.unpack(F.col("label")).items()])
    for r in un.collect():
        assert r.u_layer == r.layer and r.u_x == r.x and r.u_y == r.y
        assert r.u_z == r.z and r.u_segid == r.segid
        assert r.label == codec.pack_py(r.layer, r.x, r.y, r.z, r.segid)


@pytest.fixture()
def graphene(spark, tmp_path):
    layer = GrapheneLayer(spark, str(tmp_path / "graph"))
    # supervoxels 1..10; before T1: roots 100/200; edit at T1 moves
    # supervoxel 5 from root 100 to root 200
    rows = []
    for sv in range(1, 6):
        if sv == 5:
            rows.append((sv, 100, "2024-01-01 00:00:00", "2024-06-01 00:00:00"))
            rows.append((sv, 200, "2024-06-01 00:00:00", None))
        else:
            rows.append((sv, 100, "2024-01-01 00:00:00", None))
    for sv in range(6, 11):
        rows.append((sv, 200, "2024-01-01 00:00:00", None))
    df = spark.createDataFrame(
        rows, schema="supervoxel long, root long, valid_from string, valid_to string"
    )
    layer.write_mapping(
        df.withColumn("valid_from", F.col("valid_from").cast("timestamp"))
        .withColumn("valid_to", F.col("valid_to").cast("timestamp"))
    )
    return layer


def test_get_roots_current(graphene):
    got = {r.supervoxel: r.root for r in graphene.get_roots(range(1, 11)).collect()}
    assert got[1] == 100 and got[4] == 100
    assert got[5] == 200  # after the edit
    assert got[6] == 200


def test_get_roots_asof(graphene):
    got = {
        r.supervoxel: r.root
        for r in graphene.get_roots(range(1, 11), timestamp="2024-03-01").collect()
    }
    assert got[5] == 100  # before the edit


def test_unmapped_supervoxel_identity(graphene):
    got = {r.supervoxel: r.root for r in graphene.get_roots([999]).collect()}
    assert got[999] == 999


def test_get_leaves(graphene):
    now_leaves = {r.supervoxel for r in graphene.get_leaves(200).collect()}
    assert now_leaves == {5, 6, 7, 8, 9, 10}
    old_leaves = {
        r.supervoxel
        for r in graphene.get_leaves(200, timestamp="2024-03-01").collect()
    }
    assert old_leaves == {6, 7, 8, 9, 10}


def test_roots_histogram(graphene):
    got = {r.root: r.n_supervoxels for r in graphene.roots_histogram().collect()}
    assert got == {100: 4, 200: 6}


def test_agglomerate_cutout(graphene, spark, rng, tmp_path):
    arr = rng.integers(1, 11, size=(64, 64, 32, 1)).astype(np.uint32)
    vol = Volume.from_numpy(spark, arr, str(tmp_path / "segvol"),
                            chunk_size=(32, 32, 32))
    bbox = Bbox((0, 0, 0), (64, 64, 32))
    out = graphene.agglomerate_cutout(vol, bbox)
    expected = np.where(
        (arr <= 4), 100, 200
    ).astype(np.uint32)
    assert np.array_equal(out, expected)
    # as-of: supervoxel 5 still maps to 100
    out_old = graphene.agglomerate_cutout(vol, bbox, timestamp="2024-03-01")
    expected_old = np.where(arr <= 5, 100, 200).astype(np.uint32)
    assert np.array_equal(out_old, expected_old)


def test_mask_by_root(graphene, spark, rng, tmp_path):
    arr = rng.integers(1, 11, size=(32, 32, 32, 1)).astype(np.uint32)
    vol = Volume.from_numpy(spark, arr, str(tmp_path / "segvol2"),
                            chunk_size=(32, 32, 32))
    out = graphene.mask_by_root(vol, Bbox((0, 0, 0), (32, 32, 32)), root=100)
    expected = np.where(arr <= 4, arr, 0).astype(np.uint32)
    assert np.array_equal(out, expected)


def test_resolve_column_scale_path(graphene, spark):
    df = spark.createDataFrame(
        [(i,) for i in range(1, 11)], schema="label long"
    )
    got = {
        r.label: r.root
        for r in graphene.resolve_column(df, "label").collect()
    }
    assert got[3] == 100 and got[5] == 200 and got[10] == 200


def test_pack_overflow_is_loud_not_corrupting(spark):
    """An out-of-range field must not carry into the adjacent
    bit-field: pack_py raises, the Catalyst pack masks each field to
    its own width (segid=2**segid_bits no longer decodes as z+1)."""
    from cloud_volume_spark.graphene import GrapheneLabelCodec

    c = GrapheneLabelCodec(layer_bits=8, spatial_bits=(10, 10, 10))
    with pytest.raises(ValueError, match="segid.*out of range"):
        c.pack_py(1, 0, 0, 5, 2 ** c.segid_bits)
    with pytest.raises(ValueError, match="x=.*out of range"):
        c.pack_py(1, 1 << 10, 0, 0, 7)

    from pyspark.sql import functions as F
    df = spark.createDataFrame(
        [(1, 0, 0, 5, 2 ** c.segid_bits)],
        "layer long, x long, y long, z long, segid long")
    packed = df.select(c.pack(
        F.col("layer"), F.col("x"), F.col("y"), F.col("z"),
        F.col("segid")).alias("label"))
    out = packed.select(
        *[v.alias(k) for k, v in c.unpack(F.col("label")).items()]
    ).collect()[0]
    assert out.z == 5  # neighbor field preserved (masked, not carried)
    assert out.segid == 0


def test_get_roots_broadcasts_the_filtered_mapping(graphene):
    """get_roots must plan a broadcast join of the isin-filtered
    mapping — the old hint on the LEFT of a left-outer join was
    silently dropped and shuffled the whole mapping."""
    plan = graphene.get_roots([1, 2, 999])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_codec_sign_bit_safe(spark):
    """Layer values with the top bit set pack to a NEGATIVE BIGINT (the
    signed bit pattern of the uint64) and still decode exactly — the
    unpack path must use unsigned shifts or the sign would smear into
    every field."""
    from cloud_volume_spark.graphene import (
        GrapheneLabelCodec, _to_signed64, _to_unsigned64,
    )

    codec = GrapheneLabelCodec(layer_bits=8, spatial_bits=(10, 10, 10))
    vals = (255, 1023, 2, 900, 123456)
    packed = codec.pack_py(*vals)
    assert packed >= (1 << 63)  # top bit set
    signed = _to_signed64(packed)
    assert signed < 0 and _to_unsigned64(signed) == packed
    # python decode accepts both representations
    for rep in (packed, signed):
        d = codec.unpack_py(rep)
        assert (d["layer"], d["x"], d["y"], d["z"], d["segid"]) == vals
    # Spark decode of the negative long matches
    df = spark.createDataFrame(
        [vals], schema="layer int, x int, y int, z int, segid long"
    )
    row = df.select(
        codec.pack(F.col("layer"), F.col("x"), F.col("y"), F.col("z"),
                   F.col("segid")).alias("label"),
        *[v.alias(f"u_{k}") for k, v in codec.unpack(
            codec.pack(F.col("layer"), F.col("x"), F.col("y"), F.col("z"),
                       F.col("segid"))).items()],
    ).collect()[0]
    assert row.label == signed
    assert (row.u_layer, row.u_x, row.u_y, row.u_z, row.u_segid) == vals


def test_codec_per_layer_spark_matches_py(spark):
    """Per-layer spatial widths: the Catalyst when-chain layout agrees
    with pack_py/unpack_py for every registered layer."""
    from cloud_volume_spark.graphene import GrapheneLabelCodec, _to_signed64

    codec = GrapheneLabelCodec(
        layer_bits=8, spatial_bits_per_layer={1: 10, 2: 10, 3: 8})
    rows = [(1, 1023, 5, 900, 123), (2, 0, 0, 0, 1), (3, 255, 7, 9, 4096)]
    df = spark.createDataFrame(
        rows, schema="layer int, x int, y int, z int, segid long"
    )
    packed_col = codec.pack(F.col("layer"), F.col("x"), F.col("y"),
                            F.col("z"), F.col("segid"))
    out = df.select(
        "layer", "x", "y", "z", "segid", packed_col.alias("label"),
        *[v.alias(f"u_{k}") for k, v in codec.unpack(packed_col).items()],
    )
    for r in out.collect():
        assert r.label == _to_signed64(
            codec.pack_py(r.layer, r.x, r.y, r.z, r.segid))
        assert (r.u_layer, r.u_x, r.u_y, r.u_z, r.u_segid) == (
            r.layer, r.x, r.y, r.z, r.segid)


def test_resolve_column_reresolve_and_unsigned_mapping(spark, tmp_path):
    """resolve_column on a frame that ALREADY has a 'root' column (a
    re-resolve at another timestamp) must not hit an ambiguous
    reference; mask_except/remap handle supervoxel ids >= 2^63."""
    from cloud_volume_spark import codecs

    layer = GrapheneLayer(spark, str(tmp_path / "g2"))
    big = (1 << 63) + 5  # uint64 id stored as negative long
    big_signed = big - (1 << 64)
    df = spark.createDataFrame(
        [(1, 100, "2024-01-01 00:00:00", None),
         (big_signed, 200, "2024-01-01 00:00:00", None)],
        schema="supervoxel long, root long, valid_from string, valid_to string",
    )
    layer.write_mapping(df)
    labels = spark.createDataFrame([(1,), (big_signed,)], "label long")
    once = layer.resolve_column(labels, "label")
    twice = layer.resolve_column(once, "label")  # must not raise
    got = {r.label: r.root for r in twice.collect()}
    assert got == {1: 100, big_signed: 200}
    # numpy boundary: negative signed patterns into uint64 arrays
    arr = np.array([[1, big]], dtype=np.uint64)
    out = codecs.remap_array(arr, {1: 100, big_signed: 200})
    assert out.tolist() == [[100, 200]]
    kept = codecs.mask_except(arr, [big_signed])
    assert kept.tolist() == [[0, big]]


def test_codec_unregistered_layer_raises_not_null(spark):
    """pack/unpack on a layer with no spatial_bit_masks entry must
    raise like pack_py/_layout — a silent NULL label would drop rows
    from downstream joins and could be persisted by a write path."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from cloud_volume_spark.graphene import GrapheneLabelCodec

    codec = GrapheneLabelCodec(
        layer_bits=8, spatial_bits_per_layer={1: 10, 2: 10})
    df = spark.createDataFrame(
        [(3, 1, 1, 1, 7)], schema="layer int, x int, y int, z int, segid long"
    )
    with pytest.raises(Exception, match="unregistered layer"):
        df.select(codec.pack(F.col("layer"), F.col("x"), F.col("y"),
                             F.col("z"), F.col("segid")).alias("label")
                  ).collect()
    with pytest.raises(ValueError, match="no spatial_bit_masks"):
        codec.pack_py(3, 1, 1, 1, 7)
    # unpack of a label carrying an unregistered layer raises too
    bad = spark.createDataFrame([( (3 << 56) | 5,)], schema="label long")
    with pytest.raises(Exception, match="unregistered"):
        bad.select(*[v.alias(k) for k, v in
                     codec.unpack(F.col("label")).items()]).collect()


def test_codec_null_inputs_propagate_null(spark):
    """NULL layer (pack) / NULL label (unpack) propagate NULL per SQL
    semantics — e.g. the unmatched side of an outer join feeding the
    codec — instead of tripping the unregistered-layer raise."""
    from cloud_volume_spark.graphene import GrapheneLabelCodec

    codec = GrapheneLabelCodec(
        layer_bits=8, spatial_bits_per_layer={1: 10, 2: 10})
    df = spark.createDataFrame(
        [(None, 1, 1, 1, 7), (1, 2, 3, 4, 5)],
        schema="layer int, x int, y int, z int, segid long")
    out = df.select(codec.pack(
        F.col("layer"), F.col("x"), F.col("y"), F.col("z"),
        F.col("segid")).alias("label")).collect()
    labels = sorted((r.label is None) for r in out)
    assert labels == [False, True]

    bad = spark.createDataFrame(
        [(None,), (codec.pack_py(1, 2, 3, 4, 5),)], schema="label long")
    rows = bad.select(*[v.alias(k) for k, v in
                        codec.unpack(F.col("label")).items()]).collect()
    by_null = {r.x is None: r for r in rows}
    assert by_null[True].segid is None and by_null[True].y is None
    assert by_null[False].segid == 5
