"""Sharded-format tests: golden hash constants pinned from the
reference's own test suite, shard file synthesis/parse roundtrip, and
the full volume export→import roundtrip."""

import numpy as np
import pytest

from cloud_volume_spark.chunking import compressed_morton_code
from cloud_volume_spark.geometry import Bbox
from cloud_volume_spark.sharding import (
    ShardFileReader, ShardingSpecification, SpecViolation,
    mmh3_hash64_low, murmurhash3_x86_128, synthesize_shard_file,
)
from cloud_volume_spark.volume import Volume


def test_actual_example_hash_golden():
    """reference test_sharding.py:34."""
    spec = ShardingSpecification.from_dict({
        "@type": "neuroglancer_uint64_sharded_v1",
        "data_encoding": "gzip",
        "hash": "murmurhash3_x86_128",
        "minishard_bits": 11,
        "minishard_index_encoding": "gzip",
        "preshift_bits": 6,
        "shard_bits": 7,
    })
    shard_no, minishard_no = spec.compute_shard_location(1822975381)
    assert shard_no == "42"
    assert minishard_no == 18


def test_image_sharding_hash_golden():
    """reference test_sharding.py:100 — identity hash, image geometry."""
    spec = ShardingSpecification(
        hash="identity", minishard_bits=6, preshift_bits=9, shard_bits=16,
        data_encoding="gzip", minishard_index_encoding="gzip",
    )
    point = np.array([144689, 52487, 2829])
    volume_size = np.array([248832, 134144, 7063])
    chunk_size = np.array([128, 128, 16])
    grid = np.ceil(volume_size / chunk_size).astype(np.uint32)
    gridpt = np.ceil(point / chunk_size).astype(np.int64)
    code = compressed_morton_code(gridpt, grid)
    assert spec.compute_shard_location(int(code))[0] == "458d"


def test_identity_bit_split_golden():
    """reference test_sharding.py:60 — identity hash bit splitting."""
    spec = ShardingSpecification(
        hash="identity", preshift_bits=0, minishard_bits=3, shard_bits=3,
    )
    shard_no, minishard_no = spec.compute_shard_location(0b10101010)
    assert minishard_no == 0b010
    assert int(shard_no, 16) == 0b101


def test_murmur_known_vectors():
    # cross-checked against mmh3.hash_bytes/hash64 (x86_128) semantics:
    # hash of empty input with seed 0 is all zeros
    assert murmurhash3_x86_128(b"") == b"\x00" * 16
    # determinism + avalanche sanity
    a = mmh3_hash64_low(1822975381 >> 6)
    b = mmh3_hash64_low((1822975381 >> 6) + 1)
    assert a != b


def test_spec_validation():
    with pytest.raises(SpecViolation):
        ShardingSpecification(hash="sha1")
    with pytest.raises(SpecViolation):
        ShardingSpecification(minishard_bits=33, shard_bits=32)
    # boundary cases accepted (reference test_sharding_spec_validation)
    ShardingSpecification(minishard_bits=0, shard_bits=64)
    ShardingSpecification(minishard_bits=64, shard_bits=0)


@pytest.mark.parametrize("data_encoding", ["raw", "gzip"])
@pytest.mark.parametrize("index_encoding", ["raw", "gzip"])
def test_shard_file_roundtrip(rng, data_encoding, index_encoding):
    spec = ShardingSpecification(
        preshift_bits=0, hash="murmurhash3_x86_128",
        minishard_bits=4, shard_bits=0,
        minishard_index_encoding=index_encoding,
        data_encoding=data_encoding,
    )
    payloads = {
        int(label): bytes(rng.integers(0, 256, rng.integers(10, 200)).tolist())
        for label in rng.integers(0, 10_000, 40)
    }
    blob = synthesize_shard_file(spec, payloads)
    reader = ShardFileReader(spec, blob)
    assert set(reader.list_labels().tolist()) == set(payloads)
    for label, want in payloads.items():
        assert reader.get(label) == want
    assert reader.get(999_999) is None
    got = dict(reader.items())
    assert got == payloads


def test_sharded_volume_roundtrip(spark, rng, tmp_path):
    from cloud_volume_spark.precomputed_io import export_sharded, import_sharded

    arr = rng.integers(0, 300, size=(96, 64, 48, 1)).astype(np.uint32)
    vol = Volume.from_numpy(spark, arr, str(tmp_path / "v"), chunk_size=(32, 32, 32))
    out = str(tmp_path / "sharded")
    n_shards = export_sharded(vol, out)
    assert n_shards >= 1
    import os
    key = vol.info.key(0)
    assert any(f.endswith(".shard") for f in os.listdir(os.path.join(out, key)))

    vol2 = import_sharded(spark, out, str(tmp_path / "v2"))
    back = vol2.cutout(Bbox((0, 0, 0), (96, 64, 48)))
    assert np.array_equal(back, arr)
    got = {r.label for r in vol2.unique().collect()}
    assert got == set(np.unique(arr).tolist())


def test_prefix_data_requires_raw_encoding():
    from cloud_volume_spark.sharding import (
        ShardFileReader, ShardingSpecification, SpecViolation,
        synthesize_shard_file,
    )
    import pytest as _pytest

    gz = ShardingSpecification(
        preshift_bits=0, hash="identity", minishard_bits=2, shard_bits=2,
        data_encoding="gzip",
    )
    with _pytest.raises(SpecViolation):
        synthesize_shard_file(gz, {1: b"v"}, {1: b"prefix"})

    raw = ShardingSpecification(
        preshift_bits=0, hash="identity", minishard_bits=2, shard_bits=2,
        data_encoding="raw",
    )
    blob = synthesize_shard_file(
        raw, {1: b"value1", 9: b"value9"}, {1: b"AAAA", 9: b"BB"}
    )
    r = ShardFileReader(raw, blob)
    v, off = r.get_with_offset(1)
    assert v == b"value1"
    # the prefix bytes sit immediately before the indexed value
    assert blob[off - 4:off] == b"AAAA"
    v9, off9 = r.get_with_offset(9)
    assert v9 == b"value9" and blob[off9 - 2:off9] == b"BB"
    assert r.get(5) is None and r.get_with_offset(5) == (None, None)


def test_spec_rejects_unknown_encodings():
    """Unknown minishard_index_encoding/data_encoding would silently be
    treated as raw by the codec helpers (they compare == 'gzip') — the
    spec must refuse them at construction, as the reference does."""
    import pytest

    from cloud_volume_spark.sharding import (
        ShardingSpecification, SpecViolation,
    )

    for field in ("minishard_index_encoding", "data_encoding"):
        for bad in ("br", "zstd", "GZIP"):
            with pytest.raises(SpecViolation, match=field):
                ShardingSpecification(**{field: bad})
    # the two legal values still construct
    ShardingSpecification(minishard_index_encoding="gzip",
                          data_encoding="gzip")
