"""zarr2/zarr3/n5 interop round-trips (numpy oracle, mirroring the
reference's test_zarr.py strategy of random-volume roundtrips)."""

import gzip
import json
import os

import numpy as np
import pytest

from cloud_volume_spark.geometry import Bbox
from cloud_volume_spark.volume import Volume
from cloud_volume_spark.zarr_io import (
    crc32c,
    decode_zarr3_chunk,
    encode_zarr3_chunk,
    export_zarr2,
    export_zarr3,
    import_n5,
    import_zarr2,
    import_zarr3,
)


def test_crc32c_golden():
    # RFC 3720 check value for "123456789"
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0


def test_zarr3_chunk_codec_roundtrip():
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 1 << 16, size=(2, 4, 6, 8)).astype(np.uint16)
    for codecs in (
        [{"name": "bytes", "configuration": {"endian": "little"}}],
        [{"name": "bytes", "configuration": {"endian": "big"}},
         {"name": "gzip", "configuration": {"level": 1}}],
        [{"name": "bytes", "configuration": {"endian": "little"}},
         {"name": "gzip", "configuration": {"level": 5}},
         {"name": "crc32c"}],
    ):
        blob = encode_zarr3_chunk(arr, codecs)
        back = decode_zarr3_chunk(blob, codecs, np.uint16, arr.shape)
        assert np.array_equal(back, arr), codecs


def test_zarr3_crc_detects_corruption():
    arr = np.arange(24, dtype=np.uint8).reshape(1, 2, 3, 4)
    codecs = [{"name": "bytes", "configuration": {"endian": "little"}},
              {"name": "crc32c"}]
    blob = bytearray(encode_zarr3_chunk(arr, codecs))
    blob[0] ^= 0xFF
    with pytest.raises(ValueError, match="crc32c"):
        decode_zarr3_chunk(bytes(blob), codecs, np.uint8, arr.shape)


def test_zarr3_roundtrip(spark, tmp_path):
    rng = np.random.default_rng(31)
    arr = rng.integers(0, 1000, size=(50, 40, 30, 1)).astype(np.uint32)
    vol = Volume.from_numpy(
        spark, arr, str(tmp_path / "vol"), chunk_size=(32, 32, 16)
    )
    n = export_zarr3(vol, str(tmp_path / "z3"))
    assert n == 2 * 2 * 2  # ceil(50/32) x ceil(40/32) x ceil(30/16)

    vol2 = import_zarr3(spark, str(tmp_path / "z3"), str(tmp_path / "vol2"))
    assert vol2.info.layer_type == "segmentation"
    out = vol2.cutout(Bbox((0, 0, 0), (50, 40, 30)))
    assert np.array_equal(out, arr)
    # partial cutout across the padded-edge chunk
    out = vol2.cutout(Bbox((20, 20, 10), (50, 40, 30)))
    assert np.array_equal(out, arr[20:, 20:, 10:, :])


def test_zarr3_roundtrip_with_offset_and_channels(spark, tmp_path):
    rng = np.random.default_rng(32)
    arr = rng.integers(0, 255, size=(40, 32, 20, 3)).astype(np.uint8)
    vol = Volume.from_numpy(
        spark, arr, str(tmp_path / "vol"), chunk_size=(16, 16, 16),
        voxel_offset=(64, 32, 16),
    )
    export_zarr3(vol, str(tmp_path / "z3"))
    vol2 = import_zarr3(spark, str(tmp_path / "z3"), str(tmp_path / "vol2"))
    assert [int(v) for v in vol2.info.voxel_offset(0)] == [64, 32, 16]
    out = vol2.cutout(Bbox((64, 32, 16), (104, 64, 36)))
    assert np.array_equal(out, arr)


def test_zarr2_roundtrip(spark, tmp_path):
    rng = np.random.default_rng(21)
    arr = rng.integers(0, 60000, size=(33, 47, 25, 1)).astype(np.uint16)
    vol = Volume.from_numpy(
        spark, arr, str(tmp_path / "vol"), chunk_size=(16, 16, 16)
    )
    n = export_zarr2(vol, str(tmp_path / "z2"))
    assert n == 3 * 3 * 2
    assert os.path.isfile(str(tmp_path / "z2" / ".zarray"))

    vol2 = import_zarr2(spark, str(tmp_path / "z2"), str(tmp_path / "vol2"))
    out = vol2.cutout(Bbox((0, 0, 0), (33, 47, 25)))
    assert np.array_equal(out, arr)


def test_import_n5(spark, tmp_path):
    """Synthesize a spec-conformant n5 layout by hand: big-endian
    payload, dimension 0 fastest, clamped edge blocks, gzip."""
    rng = np.random.default_rng(5)
    size = (40, 30, 20)
    bs = (16, 16, 16)
    arr = rng.integers(0, 1 << 30, size=size).astype(np.uint32)

    sdir = tmp_path / "n5" / "s0"
    os.makedirs(sdir)
    with open(sdir / "attributes.json", "w") as f:
        json.dump({
            "dimensions": list(size),
            "blockSize": list(bs),
            "dataType": "uint32",
            "compression": {"type": "gzip"},
        }, f)

    for cx in range((size[0] + bs[0] - 1) // bs[0]):
        for cy in range((size[1] + bs[1] - 1) // bs[1]):
            for cz in range((size[2] + bs[2] - 1) // bs[2]):
                x0, y0, z0 = cx * bs[0], cy * bs[1], cz * bs[2]
                block = arr[x0:x0 + bs[0], y0:y0 + bs[1], z0:z0 + bs[2]]
                dims = block.shape
                header = (0).to_bytes(2, "big") + (3).to_bytes(2, "big")
                for d in dims:
                    header += int(d).to_bytes(4, "big")
                payload = block.astype(">u4").tobytes(order="F")
                os.makedirs(sdir / str(cx) / str(cy), exist_ok=True)
                with open(sdir / str(cx) / str(cy) / str(cz), "wb") as f:
                    f.write(header + gzip.compress(payload))

    vol = import_n5(spark, str(tmp_path / "n5"), str(tmp_path / "vol"))
    out = vol.cutout(Bbox((0, 0, 0), size))
    assert np.array_equal(out[..., 0], arr)
    # label analytics work on the imported volume (stats got built)
    labels = {
        r.label for r in vol.unique(Bbox((0, 0, 0), (16, 16, 16))).collect()
    }
    assert labels == set(np.unique(arr[:16, :16, :16]).tolist())


def test_transpose_codec_roundtrip(rng):
    """Encode/decode with a transpose codec must invert exactly — the
    decode path applies the inverse permutation to the transposed-dims
    byte stream (zarr v3 spec: codecs run in reverse on decode)."""
    from cloud_volume_spark.zarr_io import decode_zarr3_chunk, encode_zarr3_chunk
    arr = rng.integers(0, 1000, size=(4, 6, 8)).astype(np.uint16)
    codecs_list = [
        {"name": "transpose", "configuration": {"order": [2, 0, 1]}},
        {"name": "bytes", "configuration": {"endian": "little"}},
        {"name": "gzip", "configuration": {"level": 5}},
    ]
    blob = encode_zarr3_chunk(arr, codecs_list)
    back = decode_zarr3_chunk(blob, codecs_list, "uint16", (4, 6, 8))
    assert np.array_equal(back, arr)


def test_transpose_codec_external_layout(rng):
    """A non-identity transpose serializes axis-permuted bytes; verify
    against a hand-built reference byte stream (what an external zarr3
    writer would produce)."""
    from cloud_volume_spark.zarr_io import decode_zarr3_chunk
    arr = rng.integers(0, 255, size=(3, 4, 5)).astype(np.uint8)
    order = [1, 2, 0]
    external = np.transpose(arr, axes=order).tobytes(order="C")
    codecs_list = [
        {"name": "transpose", "configuration": {"order": order}},
        {"name": "bytes", "configuration": {"endian": "little"}},
    ]
    back = decode_zarr3_chunk(external, codecs_list, "uint8", (3, 4, 5))
    assert np.array_equal(back, arr)


SHARD_CODECS = [{
    "name": "sharding_indexed",
    "configuration": {
        "chunk_shape": [1, 8, 8, 8],
        "codecs": [
            {"name": "bytes", "configuration": {"endian": "little"}},
            {"name": "gzip", "configuration": {"level": 5}},
        ],
        "index_codecs": [
            {"name": "bytes", "configuration": {"endian": "little"}},
            {"name": "crc32c"},
        ],
        "index_location": "end",
    },
}]


def test_sharding_indexed_chunk_roundtrip(rng):
    from cloud_volume_spark.zarr_io import decode_zarr3_chunk, encode_zarr3_chunk
    arr = rng.integers(0, 65535, size=(1, 16, 16, 16)).astype(np.uint16)
    blob = encode_zarr3_chunk(arr, SHARD_CODECS)
    out = decode_zarr3_chunk(blob, SHARD_CODECS, np.uint16, (1, 16, 16, 16))
    assert np.array_equal(out, arr)


def test_sharding_indexed_elides_fill_chunks(rng):
    from cloud_volume_spark.zarr_io import decode_zarr3_chunk, encode_zarr3_chunk
    arr = np.zeros((1, 16, 16, 16), dtype=np.uint16)
    arr[0, :8, :8, :8] = rng.integers(1, 100, size=(8, 8, 8))
    full = encode_zarr3_chunk(arr, SHARD_CODECS)
    elided = encode_zarr3_chunk(arr, SHARD_CODECS, fill_value=0)
    assert len(elided) < len(full)  # 7 of 8 inner chunks dropped
    out = decode_zarr3_chunk(elided, SHARD_CODECS, np.uint16, (1, 16, 16, 16))
    assert np.array_equal(out, arr)  # missing chunks -> fill_value


def test_sharding_indexed_index_location_start(rng):
    from cloud_volume_spark.zarr_io import decode_zarr3_chunk, encode_zarr3_chunk
    import copy
    codecs = copy.deepcopy(SHARD_CODECS)
    codecs[0]["configuration"]["index_location"] = "start"
    arr = rng.integers(0, 255, size=(1, 8, 16, 8)).astype(np.uint8)
    blob = encode_zarr3_chunk(arr, codecs)
    out = decode_zarr3_chunk(blob, codecs, np.uint8, (1, 8, 16, 8))
    assert np.array_equal(out, arr)


def test_sharding_indexed_corrupt_index_detected(rng):
    from cloud_volume_spark.zarr_io import decode_zarr3_chunk, encode_zarr3_chunk
    arr = rng.integers(0, 255, size=(1, 8, 8, 8)).astype(np.uint8)
    blob = bytearray(encode_zarr3_chunk(arr, SHARD_CODECS))
    blob[-6] ^= 0xFF  # flip a bit inside the index
    with pytest.raises(ValueError, match="shard index"):
        decode_zarr3_chunk(bytes(blob), SHARD_CODECS, np.uint8, (1, 8, 8, 8))


def test_zarr3_sharded_export_import_roundtrip(spark, tmp_path):
    """Full volume roundtrip through a sharded zarr3 store — the format
    the reference refuses (zarr3/image.py:150)."""
    rng = np.random.default_rng(47)
    arr = rng.integers(0, 1000, size=(40, 40, 24, 1)).astype(np.uint32)
    vol = Volume.from_numpy(
        spark, arr, str(tmp_path / "vol"), chunk_size=(16, 16, 16)
    )
    codecs = [{
        "name": "sharding_indexed",
        "configuration": {
            "chunk_shape": [1, 8, 8, 8],
            "codecs": [
                {"name": "bytes", "configuration": {"endian": "little"}},
                {"name": "gzip", "configuration": {"level": 5}},
            ],
            "index_codecs": [
                {"name": "bytes", "configuration": {"endian": "little"}},
                {"name": "crc32c"},
            ],
        },
    }]
    export_zarr3(vol, str(tmp_path / "z3"), codec_list=codecs)
    vol2 = import_zarr3(spark, str(tmp_path / "z3"), str(tmp_path / "vol2"))
    out = vol2.cutout(Bbox((0, 0, 0), (40, 40, 24)))
    assert np.array_equal(out, arr)
    out = vol2.cutout(Bbox((10, 10, 10), (40, 40, 24)))
    assert np.array_equal(out, arr[10:, 10:, 10:, :])


def test_export_n5_roundtrip(spark, tmp_path):
    from cloud_volume_spark.zarr_io import export_n5

    rng = np.random.default_rng(55)
    arr = rng.integers(0, 9000, size=(33, 47, 25, 1)).astype(np.uint32)
    vol = Volume.from_numpy(
        spark, arr, str(tmp_path / "vol"), chunk_size=(16, 16, 16)
    )
    n = export_n5(vol, str(tmp_path / "n5"))
    assert n == 3 * 3 * 2
    assert os.path.isfile(str(tmp_path / "n5" / "s0" / "attributes.json"))
    vol2 = import_n5(spark, str(tmp_path / "n5"), str(tmp_path / "vol2"))
    out = vol2.cutout(Bbox((0, 0, 0), (33, 47, 25)))
    assert np.array_equal(out, arr)


def test_export_n5_multichannel(spark, tmp_path):
    from cloud_volume_spark.zarr_io import export_n5

    rng = np.random.default_rng(56)
    arr = rng.random(size=(20, 18, 10, 3)).astype(np.float32)
    vol = Volume.from_numpy(
        spark, arr, str(tmp_path / "vol"), chunk_size=(16, 16, 8)
    )
    export_n5(vol, str(tmp_path / "n5"))
    vol2 = import_n5(spark, str(tmp_path / "n5"), str(tmp_path / "vol2"))
    out = vol2.cutout(Bbox((0, 0, 0), (20, 18, 10)))
    assert np.array_equal(out, arr)


def test_export_zarr3_cseg_nondefault_block_size(spark, tmp_path):
    """The zarr/n5 export decode must honor the layer's declared
    compressed_segmentation_block_size — decoding with the (8,8,8)
    default silently garbles every chunk of a (16,16,8) layer."""
    from cloud_volume_spark.catalog import VolumeInfo
    from cloud_volume_spark.zarr_io import export_zarr3

    rng = np.random.default_rng(57)
    arr = rng.integers(0, 700, size=(32, 32, 16, 1)).astype(np.uint32)
    info = VolumeInfo.create(
        layer_type="segmentation", data_type="uint32", num_channels=1,
        resolution=(1, 1, 1), voxel_offset=(0, 0, 0),
        volume_size=(32, 32, 16), chunk_size=(32, 32, 16),
        encoding="compressed_segmentation",
        compressed_segmentation_block_size=(16, 16, 8),
    )
    vol = Volume.create(spark, str(tmp_path / "vol"), info)
    vol.upload(arr, offset=(0, 0, 0))
    export_zarr3(vol, str(tmp_path / "z3"))
    vol2 = import_zarr3(spark, str(tmp_path / "z3"), str(tmp_path / "vol2"))
    out = vol2.cutout(Bbox((0, 0, 0), (32, 32, 16)))
    assert np.array_equal(out, arr)


def test_import_zarr3_dot_separator_flat_keys(spark, tmp_path):
    """zarr3 'default' chunk-key encoding with separator '.' stores
    chunks as FLAT 'c.0.0.0' files in the array dir — the old 'c/'
    walk silently imported such stores as EMPTY volumes."""
    import json
    import shutil

    rng = np.random.default_rng(41)
    arr = rng.integers(0, 900, size=(40, 30, 20, 1)).astype(np.uint32)
    vol = Volume.from_numpy(
        spark, arr, str(tmp_path / "vol"), chunk_size=(16, 16, 16))
    export_zarr3(vol, str(tmp_path / "z3"))

    # rewrite to the '.'-separator layout (the array dir is the
    # group's mip-0 member, z3/0/)
    src = str(tmp_path / "z3")
    arr_dir = os.path.join(src, "0")
    meta = json.load(open(os.path.join(arr_dir, "zarr.json")))
    meta["chunk_key_encoding"] = {
        "name": "default", "configuration": {"separator": "."}}
    json.dump(meta, open(os.path.join(arr_dir, "zarr.json"), "w"))
    croot = os.path.join(arr_dir, "c")
    for dirpath, _, files in os.walk(croot):
        for fname in files:
            p = os.path.join(dirpath, fname)
            key = os.path.relpath(p, croot).replace(os.sep, ".")
            shutil.move(p, os.path.join(arr_dir, f"c.{key}"))
    shutil.rmtree(croot)

    vol2 = import_zarr3(spark, src, str(tmp_path / "vol2"))
    out = vol2.cutout(Bbox((0, 0, 0), (40, 30, 20)))
    assert np.array_equal(out, arr)


def test_import_zarr2_nested_separator_and_filters_refusal(
        spark, tmp_path):
    """dimension_separator '/' (nested chunk dirs) imports correctly,
    and a non-null 'filters' list refuses loudly instead of importing
    filter-transformed bytes as garbage."""
    import json
    import shutil

    rng = np.random.default_rng(43)
    arr = rng.integers(0, 200, size=(24, 20, 16, 1)).astype(np.uint16)
    vol = Volume.from_numpy(
        spark, arr, str(tmp_path / "vol"), chunk_size=(8, 8, 8))
    export_zarr2(vol, str(tmp_path / "z2"))

    src = str(tmp_path / "z2")
    za = json.load(open(os.path.join(src, ".zarray")))
    sep = za.get("dimension_separator", ".")
    za["dimension_separator"] = "/"
    json.dump(za, open(os.path.join(src, ".zarray"), "w"))
    for n in list(os.listdir(src)):
        if n.startswith("."):
            continue
        parts = n.split(sep)
        if not all(p.isdigit() for p in parts):
            continue
        dst = os.path.join(src, *parts)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.move(os.path.join(src, n), dst)

    vol2 = import_zarr2(spark, src, str(tmp_path / "vol2"))
    out = vol2.cutout(Bbox((0, 0, 0), (24, 20, 16)))
    assert np.array_equal(out, arr)

    # filters refusal
    za["filters"] = [{"id": "delta", "dtype": "<u2"}]
    json.dump(za, open(os.path.join(src, ".zarray"), "w"))
    with pytest.raises(NotImplementedError, match="filters"):
        import_zarr2(spark, src, str(tmp_path / "vol3"))


def test_import_zarr_fill_value_becomes_background(spark, tmp_path):
    """zarr elides all-fill chunks: the store's fill_value must become
    the imported volume's background_color, or sparse regions read
    back as 0 instead of the fill."""
    import json

    rng = np.random.default_rng(47)
    arr = rng.integers(1, 200, size=(32, 16, 16, 1)).astype(np.uint16)
    vol = Volume.from_numpy(
        spark, arr, str(tmp_path / "vol"), chunk_size=(16, 16, 16))
    export_zarr3(vol, str(tmp_path / "z3"))
    src = str(tmp_path / "z3")
    arr_dir = os.path.join(src, "0")
    meta = json.load(open(os.path.join(arr_dir, "zarr.json")))
    meta["fill_value"] = 255
    json.dump(meta, open(os.path.join(arr_dir, "zarr.json"), "w"))
    # elide the non-origin chunk entirely (all-fill in the source
    # store); key order follows the exported dimension_names, so find
    # it by key != all-zeros rather than assuming an axis order
    croot = os.path.join(arr_dir, "c")
    elided = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(croot) for f in fs
        if any(p != "0" for p in
               os.path.relpath(os.path.join(dp, f), croot).split(os.sep))
    ]
    assert len(elided) == 1
    os.remove(elided[0])
    vol2 = import_zarr3(spark, src, str(tmp_path / "vol2"))
    assert vol2.info.background_color() == 255
    out = vol2.cutout(Bbox((0, 0, 0), (32, 16, 16)), fill_missing=True)
    assert (out[16:, :, :, :] == 255).all()
    assert np.array_equal(out[:16], arr[:16])


def test_import_n5_channel_split_blocks_refused(spark, tmp_path):
    """An n5 dataset splitting channels across blocks (nonzero 4th
    block coordinate) refuses loudly — collapsing it onto (cx,cy,cz)
    wrote duplicate chunk keys with misread channel bytes."""
    import json

    src = str(tmp_path / "n5cs")
    os.makedirs(os.path.join(src, "s0", "0", "0", "0"))
    with open(os.path.join(src, "attributes.json"), "w") as f:
        json.dump({"n5": "2.0.0"}, f)
    with open(os.path.join(src, "s0", "attributes.json"), "w") as f:
        json.dump({"dimensions": [16, 16, 16, 2],
                   "blockSize": [16, 16, 16, 1],
                   "dataType": "uint8",
                   "compression": {"type": "raw"}}, f)
    blk = (np.zeros(2, ">u2").tobytes()  # mode... built below properly
           )
    # minimal raw n5 block: mode=0, ndim=4, dims 16,16,16,1, payload
    import struct as _struct
    hdr = _struct.pack(">HH", 0, 4) + _struct.pack(">IIII", 16, 16, 16, 1)
    payload = hdr + bytes(16 * 16 * 16)
    for c in ("0", "1"):
        p = os.path.join(src, "s0", "0", "0", "0", c)
        with open(p, "wb") as f:
            f.write(payload)
    from cloud_volume_spark.zarr_io import import_n5
    with pytest.raises(Exception, match="channel-split|4th"):
        import_n5(spark, src, str(tmp_path / "n5in"))
