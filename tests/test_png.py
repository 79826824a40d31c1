"""Pure-Python PNG codec tests: roundtrips, all five scanline filters
(fixtures filtered by an independent in-test implementation), 16-bit,
and the volume-level png encoding path."""

import struct
import zlib

import numpy as np
import pytest

from cloud_volume_spark import codecs, png_io


@pytest.mark.parametrize("shape", [(8, 5), (1, 1), (16, 16, 3), (7, 3, 4), (4, 9, 2)])
def test_roundtrip_uint8(shape, rng):
    img = rng.integers(0, 256, size=shape).astype(np.uint8)
    back = png_io.decode(png_io.encode(img))
    assert np.array_equal(back, img)
    assert back.dtype == np.uint8


@pytest.mark.parametrize("shape", [(6, 4), (5, 5, 3)])
def test_roundtrip_uint16(shape, rng):
    img = rng.integers(0, 65536, size=shape).astype(np.uint16)
    back = png_io.decode(png_io.encode(img))
    assert np.array_equal(back, img)
    assert back.dtype == np.uint16


def _filter_line(ftype, line, prev, bpp):
    """Independent (encoder-side) filter implementation from the spec."""
    line = line.astype(np.int64)
    prev = prev.astype(np.int64)
    out = np.zeros_like(line)
    for x in range(len(line)):
        left = line[x - bpp] if x >= bpp else 0
        up = prev[x]
        ul = prev[x - bpp] if x >= bpp else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = left
        elif ftype == 2:
            pred = up
        elif ftype == 3:
            pred = (left + up) >> 1
        else:
            p = left + up - ul
            pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
            pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
        out[x] = (line[x] - pred) & 0xFF
    return out.astype(np.uint8)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 3])
def test_decode_each_filter_type(ftype, channels, rng):
    h, w = 6, 7
    shape = (h, w) if channels == 1 else (h, w, channels)
    img = rng.integers(0, 256, size=shape).astype(np.uint8)
    flat = img.reshape(h, w * channels)
    bpp = channels
    raw = bytearray()
    prev = np.zeros(w * channels, dtype=np.uint8)
    for y in range(h):
        raw.append(ftype)
        raw += _filter_line(ftype, flat[y], prev, bpp).tobytes()
        prev = flat[y]
    ihdr = struct.pack(
        ">IIBBBBB", w, h, 8, {1: 0, 3: 2}[channels], 0, 0, 0
    )
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + png_io._chunk(b"IHDR", ihdr)
        + png_io._chunk(b"IDAT", zlib.compress(bytes(raw)))
        + png_io._chunk(b"IEND", b"")
    )
    assert np.array_equal(png_io.decode(blob), img)


def test_codecs_png_chunk_roundtrip(rng):
    arr = rng.integers(0, 256, size=(16, 12, 10, 1)).astype(np.uint8)
    blob = codecs.encode(arr, "png")
    assert blob[:8] == b"\x89PNG\r\n\x1a\n"
    back = codecs.decode(blob, "png", arr.shape, "uint8")
    assert np.array_equal(back, arr)


def test_codecs_png_uint16_chunk(rng):
    arr = rng.integers(0, 65536, size=(8, 6, 4, 1)).astype(np.uint16)
    back = codecs.decode(codecs.encode(arr, "png"), "png", arr.shape, "uint16")
    assert np.array_equal(back, arr)


def test_volume_with_png_encoding(spark, rng, tmp_path):
    from cloud_volume_spark.geometry import Bbox
    from cloud_volume_spark.volume import Volume

    arr = rng.integers(0, 256, size=(64, 64, 32, 1)).astype(np.uint8)
    vol = Volume.from_numpy(
        spark, arr, str(tmp_path / "pngvol"), chunk_size=(32, 32, 32),
        encoding="png", compression=None,
    )
    out = vol.cutout(Bbox((3, 7, 1), (60, 50, 30)))
    assert np.array_equal(out, arr[3:60, 7:50, 1:30, :])


def test_png_rejects_bad_input():
    with pytest.raises(ValueError):
        png_io.encode(np.zeros((4, 4), dtype=np.float32))
    with pytest.raises(ValueError):
        png_io.decode(b"not a png at all")
