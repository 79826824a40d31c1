"""Slice-series image export: serialize a 3D/4D volume as one image
file per slice for eyeball inspection.

Re-derivation of the reference's ``save_images``
(``lib.py:1015-1118``): same directory layout, file naming
(``{level:05d}.{ext}``, ``{channel}-`` prefix when multi-channel),
dtype handling (uint8/uint16 grayscale, bool -> 0/255, float ->
min-max normalized, other ints -> RGBA with forced opaque alpha), and
the z-axis viewing orientation (rot90 counterclockwise then vertical
flip). Encoding goes through the pure-Python ``png_io``/``jpeg_io``
codecs, so the export works with no imaging libraries installed and
the PNG bytes are deterministic (golden-testable).
"""

from __future__ import annotations

import os

import numpy as np

from cloud_volume_spark import jpeg_io, png_io
from cloud_volume_spark.geometry import Bbox

_AXIS_INDEX = {"x": 0, "y": 1, "z": 2}


def _normalize_float(img: np.ndarray) -> np.ndarray:
    img = np.copy(img)
    img[~np.isfinite(img)] = 0
    lo, hi = img.min(), img.max()
    if hi > lo:
        img = (img - lo) / (hi - lo) * 255.0
    else:
        img = np.zeros_like(img)
    return img.astype(np.uint8)


def _encode_slice(img2d: np.ndarray, image_format: str) -> bytes:
    fmt = image_format.upper()
    if fmt == "JPEG":
        if img2d.dtype == np.dtype(np.uint8):
            return jpeg_io.encode(img2d)
        if img2d.dtype == np.dtype(np.uint16):
            # fixed dtype-based mapping (high byte), NOT per-slice
            # min-max: identical voxel values must encode to identical
            # pixels across slices and volumes
            return jpeg_io.encode((img2d >> 8).astype(np.uint8))
        # floats never reach here: save_images (the only caller)
        # normalizes float volumes to uint8 before encoding — globally
        # under global_norm, else per slice — so a float branch here
        # would be a second, divergent normalization path
        raise ValueError(
            f"JPEG export does not support dtype {img2d.dtype}: JPEG is "
            "lossy and has no defined mapping for label volumes — use "
            "image_format='PNG' (RGBA label mapping) instead"
        )
    if fmt != "PNG":
        raise ValueError(
            f"unsupported image_format {image_format!r}: PNG and JPEG "
            "are available without imaging libraries"
        )
    if img2d.dtype in (np.dtype(np.uint8), np.dtype(np.uint16)):
        return png_io.encode(img2d)
    # other integer dtypes: RGBA with opaque alpha (the reference's
    # little-endian ABGR trick, expressed as an explicit channel view)
    arr32 = (img2d.astype(np.uint32) | 0xFF000000).astype("<u4")
    rgba = arr32.view(np.uint8).reshape(img2d.shape[0], img2d.shape[1], 4)
    return png_io.encode(rgba)


def save_images(
    image: np.ndarray,
    directory: str | None = None,
    axis: str = "z",
    channel: int | None = None,
    global_norm: bool = True,
    image_format: str = "PNG",
    progress: bool = False,
) -> str:
    """Write one image per slice of ``image`` along ``axis`` into
    ``directory`` (created if needed); returns the absolute path.

    ``channel=None`` exports every channel (files prefixed
    ``{channel}-`` when more than one); ``global_norm`` controls
    whether float volumes are min-max normalized over the whole volume
    or per slice.
    """
    image = np.asarray(image)
    if axis not in _AXIS_INDEX:
        raise ValueError(f"axis must be x, y or z, got {axis!r}")
    index = _AXIS_INDEX[axis]

    if directory is None:
        directory = os.path.join(
            "./saved_images", "default", "default", "0",
            Bbox((0, 0, 0), image.shape[:3]).to_filename(),
        )
    os.makedirs(directory, exist_ok=True)
    if progress:
        print(f"Saving to {directory}")

    while image.ndim < 4:
        image = image[..., np.newaxis]
    chan_sel = slice(None) if channel is None else channel

    if global_norm and np.issubdtype(image.dtype, np.floating):
        image = _normalize_float(image)

    ext = image_format.lower()
    for level in range(image.shape[index]):
        img = np.take(image, level, axis=index)[:, :, chan_sel]
        while img.ndim < 3:
            img = img[..., np.newaxis]
        n_channels = img.shape[2]
        for ci in range(n_channels):
            img2d = img[:, :, ci]
            if not global_norm and np.issubdtype(img2d.dtype, np.floating):
                img2d = _normalize_float(img2d)
            if img2d.dtype == bool:
                img2d = img2d.astype(np.uint8) * 255
            if axis == "z":
                # match the reference's downloaded-cube viewing
                # orientation: 90 deg ccw rotation then vertical flip
                img2d = np.flipud(np.rot90(img2d, 1))
            blob = _encode_slice(np.ascontiguousarray(img2d), image_format)
            filename = f"{level:05d}.{ext}"
            if n_channels > 1:
                filename = f"{ci}-{filename}"
            with open(os.path.join(directory, filename), "wb") as f:
                f.write(blob)
    return os.path.abspath(directory)
