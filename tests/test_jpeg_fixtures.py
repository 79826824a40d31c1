"""Foreign-encoder JPEG fixtures: byte streams produced by real
libjpeg-family encoders (none of our code wrote them), decoded by
``jpeg_io`` — the interop anchor the reference gets from its libjpeg
lossy-roundtrip test (``/root/reference/test/test_cloudvolume.py:1676``).

Fixture provenance (all public content, checked in verbatim):

- ``cpython_logo_420.jpg`` — CPython test suite
  (``Lib/test/imghdrdata/python.jpg``): 16x16 RGB Python logo,
  **4:2:0 chroma subsampling** (Y h=v=2).
- ``requests_flower_444_odd.jpg`` — requests docs
  (``ext/flower-of-life.jpg``): 161x161 RGB, 4:4:4, **odd dimensions**
  (partial right/bottom MCUs).
- ``ipython_2x2_gray.jpg`` — IPython test suite
  (``IPython/core/tests/2x2.jpg``): 2x2 single-component grayscale.
- ``nodejs_progressive.jpg`` — Node.js docs: **progressive (SOF2)**
  stream, must be rejected with the precise unsupported-process error.

No independent JPEG decoder (libjpeg/PIL/ffmpeg) exists in this
container, so exact per-pixel ground truth can't be generated here;
the sha256 goldens anchor this decoder's output at fixture-introduction
time (regression detection), and the semantic assertions check the
decode against externally-known image content — the logo's yellow/blue,
the flower's white background, the uniform mid-gray 2x2 — which a
misdecoded DCT, chroma upsample, or color transform would not survive.
"""

import hashlib
import os

import numpy as np
import pytest

from cloud_volume_spark import jpeg_io

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures", "jpeg")


def _decode(name):
    with open(os.path.join(FIXDIR, name), "rb") as f:
        return jpeg_io.decode(f.read())


def _sha(img):
    return hashlib.sha256(np.ascontiguousarray(img).tobytes()).hexdigest()


def test_cpython_logo_420():
    img = _decode("cpython_logo_420.jpg")
    assert img.shape == (16, 16, 3) and img.dtype == np.uint8
    # Python-logo content: yellow at center, near-black corners, and
    # some logo-blue pixel present
    assert img[8, 8, 0] > 200 and img[8, 8, 1] > 200 and img[8, 8, 2] < 120
    assert img[0, 0].max() < 30 and img[15, 15].max() < 30
    blue = (img[..., 2].astype(int) - img[..., 0].astype(int)) > 60
    assert blue.any()
    assert _sha(img) == (
        "84f2bff049f6447eafcee49a6821a90e4045fbd60424053af81009aed488f090"
    )


def test_requests_flower_444_odd_dims():
    img = _decode("requests_flower_444_odd.jpg")
    assert img.shape == (161, 161, 3) and img.dtype == np.uint8
    # line art on white: all four corners white, globally bright, and
    # the partial bottom/right MCUs decode to image content (white-ish),
    # not garbage
    for y, x in [(0, 0), (0, 160), (160, 0), (160, 160)]:
        assert (img[y, x] > 240).all(), (y, x, img[y, x])
    assert img.reshape(-1, 3).mean() > 180
    assert _sha(img) == (
        "cde6803b81d9b41fd014fda33e09d559881a91829dada6ae0dd31b5b6f95e5d3"
    )


def test_ipython_2x2_grayscale():
    img = _decode("ipython_2x2_gray.jpg")
    assert img.shape == (2, 2) and img.dtype == np.uint8
    # uniform mid-gray: one DC coefficient, no AC — exact value
    assert (img == 128).all()
    assert _sha(img) == (
        "8d65a89d33fc69d31f85fd8ed396d6dd5672cd59f80bd2ced560d4bbaeb43222"
    )


def test_progressive_rejected_precisely():
    with open(os.path.join(FIXDIR, "nodejs_progressive.jpg"), "rb") as f:
        data = f.read()
    with pytest.raises(jpeg_io.JpegError, match="progressive"):
        jpeg_io.decode(data)
