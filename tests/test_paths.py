"""Cloudpath grammar — golden cases mirroring the reference's
``test_paths.py`` expectations, plus the Spark-scheme mapping."""

import pytest

from cloud_volume_spark.paths import (
    ExtractedPath,
    UnsupportedProtocolError,
    ascloudpath,
    extract,
    resolve_cloudpath,
    strict_extract,
    to_spark_path,
)


def test_ok_google():
    for url in (
        "gs://bucket/dataset/layer",
        "precomputed://gs://bucket/dataset/layer",
    ):
        p = extract(url)
        assert p.format == "precomputed"
        assert p.protocol == "gs"
        assert p.bucket == "bucket"
        assert p.basepath == "bucket/dataset"
        assert p.no_bucket_basepath == "dataset"
        assert p.dataset == "dataset"
        assert p.layer == "layer"


def test_bad_paths_error():
    for url in (
        "s4://dataset/layer",        # unknown protocol
        "dataset/layer",             # no protocol at all
        "gs://gs://bucket/x",        # double protocol
        "gs://graphene://bucket/x",  # format after protocol
        "gs://gs://gs://b/x",        # triple
        "graphene://bucket/x",       # format without protocol
    ):
        with pytest.raises(UnsupportedProtocolError):
            strict_extract(url)


def test_single_segment_bucket_is_dataset_and_layer():
    assert strict_extract("precomputed://gs://bucket32_24") == ExtractedPath(
        "precomputed", "gs", "bucket32_24", "", "",
        "bucket32_24", "bucket32_24")


def test_graphene_http_port():
    got = strict_extract(
        "graphene://http://localhost:8080/segmentation/1.0/testvol")
    assert got == ExtractedPath(
        "graphene", "http", "localhost:8080",
        "localhost:8080/segmentation/1.0", "segmentation/1.0",
        "1.0", "testvol")


def test_two_segments():
    assert strict_extract(
        "precomputed://gs://fafb-ffn1-1234567/segmentation"
    ) == ExtractedPath(
        "precomputed", "gs", "fafb-ffn1-1234567",
        "fafb-ffn1-1234567", "", "fafb-ffn1-1234567", "segmentation")


def test_s3_intermediate_path_defaults_to_precomputed():
    assert extract(
        "s3://seunglab-test/intermediate/path/dataset/layer"
    ) == ExtractedPath(
        "precomputed", "s3", "seunglab-test",
        "seunglab-test/intermediate/path/dataset",
        "intermediate/path/dataset", "dataset", "layer")


def test_file_path_absolute():
    p = extract("file:///tmp/dataset/layer")
    assert p == ExtractedPath(
        "precomputed", "file", "/tmp", "/tmp/dataset", "dataset",
        "dataset", "layer")
    assert ascloudpath(p) == "precomputed://file:///tmp/dataset/layer"


def test_zarr_and_n5_formats():
    assert extract("zarr://s3://bucket/ds/arr").format == "zarr"
    assert extract("zarr3://gs://bucket/ds").format == "zarr3"
    assert extract("n5://file:///tmp/ds").format == "n5"


def test_middleauth_compound_protocol():
    p = extract("graphene://middleauth+https://example.com/seg/v1/vol")
    assert p.protocol == "middleauth+https"


def test_to_spark_path_scheme_mapping():
    # s3 maps to the Hadoop s3a client
    assert to_spark_path("s3://bucket/ds/layer") == "s3a://bucket/ds/layer"
    assert to_spark_path("precomputed://s3://b/x") == "s3a://b/x"
    # gs/hdfs/s3a pass through
    assert to_spark_path("gs://bucket/x") == "gs://bucket/x"
    assert to_spark_path("hdfs://nn:8020/x") == "hdfs://nn:8020/x"
    # file becomes a plain local path (PathOps fast path)
    assert to_spark_path("file:///tmp/x/y") == "/tmp/x/y"
    # service protocols have no filesystem semantics
    for url in ("https://example.com/x", "mem://bucket/x"):
        with pytest.raises(UnsupportedProtocolError):
            to_spark_path(url)


def test_resolve_cloudpath():
    # plain paths pass through untouched
    assert resolve_cloudpath("/tmp/foo") == "/tmp/foo"
    assert resolve_cloudpath("relative/dir") == "relative/dir"
    # format-prefixed and bare-protocol cloudpaths resolve
    assert resolve_cloudpath("precomputed://file:///tmp/v") == "/tmp/v"
    assert resolve_cloudpath("gs://b/v") == "gs://b/v"
    # wrong format for the opener errors precisely
    with pytest.raises(UnsupportedProtocolError, match="declares format"):
        resolve_cloudpath("zarr://gs://b/v")  # precomputed opener
    assert resolve_cloudpath(
        "zarr://file:///tmp/z", formats=("zarr", "zarr3")) == "/tmp/z"


def test_volume_open_accepts_cloudpath(spark, tmp_path):
    import numpy as np

    from cloud_volume_spark.volume import Volume
    from cloud_volume_spark.geometry import Bbox

    arr = np.arange(32 * 32 * 32, dtype=np.uint32).reshape(32, 32, 32, 1)
    Volume.from_numpy(spark, arr, str(tmp_path / "v"), chunk_size=(32, 32, 32))
    vol = Volume.open(spark, f"precomputed://file://{tmp_path}/v")
    out = vol.cutout(Bbox((0, 0, 0), (32, 32, 32)))
    assert np.array_equal(out, arr)
    with pytest.raises(UnsupportedProtocolError):
        Volume.open(spark, f"zarr://file://{tmp_path}/v")


def test_importers_gate_remote_sources_precisely(spark, tmp_path):
    """A remote importer source must raise a precise error, not
    silently import an empty volume (driver-side os.listdir on a URI
    sees nothing)."""
    from cloud_volume_spark.precomputed_io import import_pyramid
    from cloud_volume_spark.zarr_io import import_n5, import_zarr2

    for fn, src in (
        (lambda: import_pyramid(
            spark, "precomputed://gs://bucket/layer", str(tmp_path / "d1")),
         "gs"),
        (lambda: import_zarr2(
            spark, "zarr://s3://bucket/ds", str(tmp_path / "d2")), "s3"),
        (lambda: import_n5(
            spark, "n5://gs://bucket/ds", str(tmp_path / "d3")), "gs"),
    ):
        with pytest.raises(UnsupportedProtocolError, match="driver-side"):
            fn()


def test_graphene_layer_accepts_cloudpath(spark, tmp_path):
    from cloud_volume_spark.graphene import GrapheneLayer

    g = GrapheneLayer(spark, f"graphene://file://{tmp_path}/g")
    assert g.base_path == f"{tmp_path}/g"


def test_graphene_service_protocol_errors_precisely(spark):
    from cloud_volume_spark.graphene import GrapheneLayer

    with pytest.raises(UnsupportedProtocolError, match="filesystem"):
        GrapheneLayer(spark, "graphene://https://example.com/seg/1.0/vol")
