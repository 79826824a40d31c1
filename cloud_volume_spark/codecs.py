"""Per-chunk codec kernels — the UDF surface of the engine.

Re-derivation of the reference's ``chunks.py`` contract (encode :83-130,
decode :132-179, labels :362-393, read_voxel :423-457, remap :395-421,
contains :459-484): a chunk blob is the Fortran-order serialization of a
``(sx, sy, sz, channels)`` array (``chunks.py:323-325`` encode_raw), with
an optional second-stage stream compression (gzip — the cloudfiles
layer in the reference).

These are plain numpy functions; ``volume.py`` wraps them in
``mapInPandas`` pandas UDFs so execution is Arrow-batched. Optional
C codecs are gated behind try-imports exactly like the reference gates
its optional deps (``chunks.py:22-68``); compressed_segmentation, png,
and jpeg fall back to pure-Python/numpy implementations (``cseg.py``,
``png_io.py``, ``jpeg_io.py``) when the C wheel is absent, while
compresso/crackle raise a clear error at use, not import, time.
"""

from __future__ import annotations

import gzip
import io
import zlib
from typing import Optional, Sequence

import numpy as np

# ---- optional codec gating (reference chunks.py:22-68) -----------------

try:  # pragma: no cover - optional dep
    import compressed_segmentation as cseg  # noqa: F401

    HAS_CSEG = True
except ImportError:  # pragma: no cover
    cseg = None
    HAS_CSEG = False

try:  # pragma: no cover - optional dep
    import simplejpeg  # noqa: F401

    HAS_JPEG = True
except ImportError:  # pragma: no cover
    simplejpeg = None
    HAS_JPEG = False

try:  # pragma: no cover - optional dep
    import pyspng  # noqa: F401

    HAS_PYSPNG = True
except ImportError:  # pragma: no cover
    pyspng = None
    HAS_PYSPNG = False

try:  # pragma: no cover - optional dep
    import crackle  # noqa: F401

    HAS_CRACKLE = True
except ImportError:  # pragma: no cover
    crackle = None
    HAS_CRACKLE = False

try:  # pragma: no cover - optional dep
    import compresso  # noqa: F401

    HAS_COMPRESSO = True
except ImportError:  # pragma: no cover
    compresso = None
    HAS_COMPRESSO = False


ENCODINGS = (
    "raw", "compressed_segmentation", "jpeg", "png", "compresso", "crackle",
    "npz", "npz_uint8",
)

# second-stage stream compression applied after encoding
# (reference: cloudfiles compress= plumbing; should_compress
#  datasource/precomputed/common.py:18-29)
COMPRESSIONS = (None, "", "gzip", "zlib", "br")

try:  # pragma: no cover - optional dep (reference: cloudfiles br support)
    import brotli

    HAS_BROTLI = True
except ImportError:  # pragma: no cover
    brotli = None
    HAS_BROTLI = False


class EncodingUnavailable(RuntimeError):
    """Optional codec library is not installed in this environment."""


# ---- second stage ------------------------------------------------------

def compress_stream(data: bytes, method: Optional[str]) -> bytes:
    if method in (None, "", "none"):
        return data
    if method == "gzip":
        # mtime=0 for deterministic bytes (golden tests); level 6 =
        # zlib default — GzipFile's own default of 9 costs ~2-3x CPU
        # for <1% size on chunk data
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0, compresslevel=6) as f:
            f.write(data)
        return buf.getvalue()
    if method == "zlib":
        return zlib.compress(data)
    if method == "br":
        if not HAS_BROTLI:
            raise EncodingUnavailable(
                "brotli second-stage compression requires the brotli "
                "package; use gzip/zlib in this environment"
            )
        return brotli.compress(data)
    raise ValueError(f"Unknown compression: {method}")


def decompress_stream(data: bytes, method: Optional[str]) -> bytes:
    if method in (None, "", "none"):
        return data
    if method == "gzip":
        return gzip.decompress(data)
    if method == "zlib":
        return zlib.decompress(data)
    if method == "br":
        if not HAS_BROTLI:
            raise EncodingUnavailable(
                "this chunk is brotli-compressed but the brotli package "
                "is not installed"
            )
        return brotli.decompress(data)
    if method == "zstd":
        try:
            import zstandard
        except ImportError:
            raise EncodingUnavailable(
                "this chunk is zstd-compressed but the zstandard "
                "package is not installed"
            ) from None
        return zstandard.ZstdDecompressor().decompress(data)
    raise ValueError(f"Unknown compression: {method}")


def should_compress(encoding: str, layer_type: str) -> Optional[str]:
    """Default second-stage choice: gzip only where it helps
    (reference ``datasource/precomputed/common.py:18-29``) — raw and
    cseg compress well; jpeg/png are already entropy-coded."""
    if encoding in ("jpeg", "png", "crackle", "compresso", "npz", "npz_uint8"):
        return None
    return "gzip"


# ---- first stage (chunk encodings) -------------------------------------

def _cseg_block_size(params: Optional[dict],
                     default=(8, 8, 8)) -> tuple:
    """The cseg sub-block size a scale declares, or ``default`` — the
    ONE place the params key is read, so encode/decode/labels can
    never disagree on it."""
    if params and params.get("block_size") is not None:
        return tuple(params["block_size"])
    return tuple(default)


def encode(
    img: np.ndarray,
    encoding: str,
    block_size: Sequence[int] = (8, 8, 8),
    params: Optional[dict] = None,
) -> bytes:
    """Serialize a (sx,sy,sz,c) array → bytes (reference ``chunks.py:83``).

    ``params`` carries the per-scale codec tuning the catalog declares
    (``VolumeInfo.compression_params``, mirroring reference
    ``metadata.py:556-574``): ``level`` (jpeg quality / png compression
    level / fpzip precision), ``block_size`` (cseg sub-blocks,
    overriding the positional default)."""
    params = params or {}
    block_size = _cseg_block_size(params, block_size)
    level = params.get("level")
    img = np.ascontiguousarray(img.transpose())  # F-order serialization
    if encoding == "raw":
        return img.tobytes()
    if encoding == "compressed_segmentation":
        arr = np.asfortranarray(img.transpose())
        if HAS_CSEG:
            return cseg.compress(arr, block_size=tuple(block_size), order="F")
        from cloud_volume_spark import cseg as np_cseg

        return np_cseg.compress(arr, block_size=block_size)
    if encoding == "crackle":
        if not HAS_CRACKLE:
            raise EncodingUnavailable("crackle not installed")
        arr = np.asfortranarray(img.transpose())
        if arr.ndim == 4 and arr.shape[3] != 1:
            raise ValueError(
                f"crackle encodes one channel at a time, got {arr.shape}")
        return crackle.compress(arr[..., 0])
    if encoding == "compresso":
        arr = np.asfortranarray(img.transpose())
        if arr.ndim == 4 and arr.shape[3] != 1:
            raise ValueError(
                f"compresso encodes one channel at a time, got {arr.shape}")
        arr = arr[..., 0]
        if HAS_COMPRESSO:
            return compresso.compress(arr)
        from cloud_volume_spark import compresso_io

        return compresso_io.compress(arr)
    if encoding == "png":
        arr2d = _as2d_image(img.transpose())  # back to (sx,sy,sz,c)
        if HAS_PYSPNG:
            if level is not None:
                return pyspng.encode(np.ascontiguousarray(arr2d),
                                     compress_level=int(level))
            return pyspng.encode(np.ascontiguousarray(arr2d))
        from cloud_volume_spark import png_io

        return png_io.encode(
            arr2d, compress_level=9 if level is None else int(level))
    if encoding in ("npz", "npz_uint8"):
        # zlib-wrapped .npy of the chunk (reference chunks.py:286-301):
        # the npy header carries shape/dtype/order, so the blob is
        # self-describing and readable with numpy alone
        arr = np.asfortranarray(img.transpose())  # (sx, sy, sz, c)
        if encoding == "npz_uint8":
            arr = (arr * 255).astype(np.uint8)
        buf = io.BytesIO()
        np.save(buf, arr)
        return zlib.compress(buf.getvalue())
    if encoding == "jpeg":
        arr2d = np.ascontiguousarray(_as2d_image(img.transpose()))
        if arr2d.dtype != np.uint8:
            raise ValueError("jpeg requires uint8")
        quality = 85 if level is None else int(level)
        if HAS_JPEG:
            if arr2d.shape[2] == 1:
                return simplejpeg.encode_jpeg(
                    arr2d, quality=quality,
                    colorspace="GRAY", colorsubsampling="GRAY"
                )
            return simplejpeg.encode_jpeg(
                arr2d, quality=quality, colorspace="RGB")
        from cloud_volume_spark import jpeg_io

        return jpeg_io.encode(arr2d, quality=quality)
    raise ValueError(f"Unknown encoding: {encoding}")


def _as2d_image(arr: np.ndarray) -> np.ndarray:
    """(sx, sy, sz, c) → (sz·sy, sx, c) image matrix — the reference's
    ``as2d`` layout (``chunks.py:207-218``), whose C-order raveled bytes
    equal the F-order voxel sequence for single-channel chunks."""
    while arr.ndim < 4:
        arr = arr[..., np.newaxis]
    nc = arr.shape[3]
    r = np.moveaxis(arr.T, 0, -1)  # (sz, sy, sx, c)
    return r.reshape(r.shape[0] * r.shape[1], r.shape[2], nc)


def _from2d_image(img, shape, dtype) -> np.ndarray:
    """Inverse of :func:`_as2d_image`: a (sz·sy, sx, c) image matrix →
    (sx,sy,sz,c) F-contiguous chunk. For single-channel chunks this
    equals the reference's ravel→F-order reshape (``chunks.py:348``);
    for c>1 the ravel trick interleaves channels into the voxel stream
    and scrambles the chunk — the explicit (sz,sy,sx,c) split is the
    true inverse at any channel count."""
    sx, sy, sz = int(shape[0]), int(shape[1]), int(shape[2])
    c = int(shape[3]) if len(shape) > 3 else 1
    a = np.asarray(img)
    if a.ndim == 2:
        a = a[..., np.newaxis]
    a = a.reshape(sz, sy, sx, c)
    out = np.asfortranarray(np.transpose(a, (2, 1, 0, 3)))
    return out.astype(dtype, copy=False).reshape(shape, order="F")


def decode(
    blob: bytes,
    encoding: str,
    shape: Sequence[int],
    dtype,
    block_size: Sequence[int] = (8, 8, 8),
    params: Optional[dict] = None,
) -> np.ndarray:
    """bytes → (sx,sy,sz,c) F-contiguous array (reference ``chunks.py:132``).
    ``params["block_size"]`` (from ``VolumeInfo.compression_params``)
    overrides the cseg sub-block default — a layer declaring a
    non-default ``compressed_segmentation_block_size`` mis-decodes
    without it."""
    block_size = _cseg_block_size(params, block_size)
    shape = tuple(int(s) for s in shape)
    dtype = np.dtype(dtype)
    if encoding == "raw":
        arr = np.frombuffer(blob, dtype=dtype)
        expected = int(np.prod(shape))
        if arr.size != expected:
            raise ValueError(
                f"raw chunk size mismatch: got {arr.size} elems, want {expected} "
                f"for shape {shape}"
            )
        return arr.reshape(shape[::-1]).transpose()
    if encoding == "compressed_segmentation":
        if HAS_CSEG:
            return cseg.decompress(
                bytes(blob), shape[:3], dtype, block_size=tuple(block_size),
                order="F",
            ).reshape(shape)
        from cloud_volume_spark import cseg as np_cseg

        return np_cseg.decompress(
            bytes(blob), shape[:3], dtype, block_size=block_size
        ).reshape(shape)
    if encoding == "crackle":
        if not HAS_CRACKLE:
            raise EncodingUnavailable("crackle not installed")
        return np.asarray(crackle.decompress(bytes(blob))).reshape(shape)
    if encoding == "compresso":
        from cloud_volume_spark import compresso_io

        # route by the header's version byte: the C wheel's streams
        # (version 0/1) and this repo's pure-python streams (version
        # 128) fix the open sub-encodings differently under the same
        # 'cpso' magic. The wheel decodes its own streams when
        # installed; otherwise compresso_io handles BOTH dialects (its
        # wheel path was verified against the reference's golden
        # chunks and self-checks its stream-consumption invariants).
        raw = bytes(blob)
        ver = raw[4] if len(raw) > 4 else -1
        if ver in compresso_io.WHEEL_FORMAT_VERSIONS and HAS_COMPRESSO:
            return np.asarray(compresso.decompress(raw)).reshape(shape)
        return compresso_io.decompress(raw).reshape(shape)
    if encoding == "png":
        if HAS_PYSPNG:
            img = pyspng.load(bytes(blob))
        else:
            from cloud_volume_spark import png_io

            img = png_io.decode(bytes(blob))
        return _from2d_image(img, shape, dtype)
    if encoding in ("npz", "npz_uint8"):
        arr = np.load(
            io.BytesIO(zlib.decompress(bytes(blob))), allow_pickle=False
        )
        arr = np.asarray(arr)
        if arr.shape == shape:
            return arr.astype(dtype, copy=False)
        # reference-produced npz of a 3D chunk is saved channel-first
        # with a prepended singleton axis (chunks.py:296-297)
        if (
            arr.ndim == 4 and arr.shape[0] == 1
            and len(shape) == 4 and shape[3] == 1
            and arr.shape[1:] == shape[:3]
        ):
            return np.moveaxis(arr, 0, -1).astype(dtype, copy=False)
        raise ValueError(
            f"npz chunk shape mismatch: stored {arr.shape}, want {shape}"
        )
    if encoding == "jpeg":
        if HAS_JPEG:
            colorspace = "RGB" if len(shape) > 3 and shape[3] > 1 else "GRAY"
            data = simplejpeg.decode_jpeg(bytes(blob), colorspace=colorspace)
        else:
            from cloud_volume_spark import jpeg_io

            data = jpeg_io.decode(bytes(blob))
        return _from2d_image(data, shape, dtype)
    raise ValueError(f"Unknown encoding: {encoding}")


# ---- partial-decode operators (reference chunks.py:362-484) ------------

def labels(blob: bytes, encoding: str, shape, dtype,
           params: Optional[dict] = None) -> np.ndarray:
    """Distinct labels in a chunk without materializing a full cutout
    (reference ``chunks.py:362-393``). Codec-native fast paths when the
    codec supports it; raw falls back to decode+unique (vectorized).
    ``params`` carries the scale's codec tuning (``block_size`` for
    cseg) exactly as for :func:`decode` — a non-default cseg block size
    yields garbage labels without it."""
    if encoding == "crackle" and HAS_CRACKLE:
        return crackle.labels(bytes(blob))
    if encoding == "compresso" and not HAS_COMPRESSO:
        # pure-python stream: the ids + explicit-correction streams
        # enumerate every label without unpacking windows or running CC
        from cloud_volume_spark import compresso_io

        return compresso_io.labels(bytes(blob)).astype(dtype, copy=False)
    if encoding == "compressed_segmentation" and not HAS_CSEG:
        from cloud_volume_spark import cseg as np_cseg

        return np_cseg.labels(bytes(blob), shape, dtype,
                              block_size=_cseg_block_size(params))
    arr = decode(blob, encoding, shape, dtype, params=params)
    return np.unique(arr)


def contains(blob: bytes, encoding: str, shape, dtype, label,
             params: Optional[dict] = None) -> bool:
    """Early-exit membership probe (reference ``chunks.py:459-484``)."""
    if encoding == "crackle" and HAS_CRACKLE:
        return bool(crackle.contains(bytes(blob), label))
    return bool(np.isin(label, labels(blob, encoding, shape, dtype,
                                      params=params)))


def read_voxel(blob: bytes, encoding: str, shape, dtype, xyz,
               params: Optional[dict] = None) -> np.ndarray:
    """Random-access single-voxel read (reference ``chunks.py:423-457``).

    For ``raw`` this is a strided offset computation — O(channels) bytes
    touched, no full decode. That property is what makes point lookups
    cheap even for large chunks.
    """
    shape = tuple(int(s) for s in shape)
    dtype = np.dtype(dtype)
    x, y, z = (int(v) for v in xyz)
    sx, sy, sz, nc = shape
    if encoding == "raw":
        out = np.empty((nc,), dtype=dtype)
        for c in range(nc):
            # F-order linear index over (x,y,z,c)
            idx = x + sx * (y + sy * (z + sz * c))
            off = idx * dtype.itemsize
            out[c] = np.frombuffer(blob[off : off + dtype.itemsize], dtype=dtype)[0]
        return out
    arr = decode(blob, encoding, shape, dtype, params=params)
    return np.asarray(arr[x, y, z, :])


def remap(
    blob: bytes, encoding: str, shape, dtype, mapping: dict,
    preserve_missing: bool = True, params: Optional[dict] = None,
) -> bytes:
    """Rewrite labels through ``{old: new}`` and re-encode
    (reference ``chunks.py:395-421``). ``params`` carries the scale's
    declared codec tuning exactly as for :func:`decode`/:func:`encode`
    — without it a non-default cseg block size mis-decodes, and the
    rewritten blob would no longer match the catalog's decode params."""
    arr = decode(blob, encoding, shape, dtype, params=params).copy()
    arr = remap_array(arr, mapping, preserve_missing=preserve_missing)
    return encode(arr, encoding, params=params)


def _coerce_labels(values, dtype):
    """Fold signed bit patterns back into unsigned label space: ids
    >= 2^63 round-trip through Spark BIGINT columns as negative Python
    ints, and ``np.fromiter(..., dtype=uint64)`` would raise
    OverflowError on them instead of reinterpreting the bits."""
    dtype = np.dtype(dtype)
    if dtype.kind != "u":
        return list(values)
    span = 1 << (dtype.itemsize * 8)
    return [int(v) + span if int(v) < 0 else int(v) for v in values]


def remap_array(arr: np.ndarray, mapping: dict, preserve_missing: bool = True) -> np.ndarray:
    """Vectorized dictionary remap (the ``fastremap.remap`` role).

    Implemented with sorted-key binary search: O(n log k) with pure
    numpy, no Python-level loop over voxels.
    """
    if not mapping:
        return arr
    keys = np.fromiter(_coerce_labels(mapping.keys(), arr.dtype),
                       dtype=arr.dtype, count=len(mapping))
    vals = np.fromiter(_coerce_labels(mapping.values(), arr.dtype),
                       dtype=arr.dtype, count=len(mapping))
    order = np.argsort(keys)
    keys, vals = keys[order], vals[order]
    flat = arr.ravel()
    idx = np.searchsorted(keys, flat)
    idx = np.clip(idx, 0, len(keys) - 1)
    matched = keys[idx] == flat
    if not preserve_missing and not matched.all():
        missing = np.unique(flat[~matched])
        raise KeyError(f"labels missing from mapping: {missing[:10]}")
    out = np.where(matched, vals[idx], flat)
    return out.reshape(arr.shape)


def mask_except(
    arr: np.ndarray, keep_labels, mask_value=0, preserve_zeros: bool = False
) -> np.ndarray:
    """Zero every voxel whose label is not in ``keep_labels``
    (reference ``frontends/precomputed.py:852-871``)."""
    keep = np.asarray(
        sorted(set(_coerce_labels(keep_labels, arr.dtype))), dtype=arr.dtype
    )
    keep_mask = np.isin(arr, keep)
    if preserve_zeros:
        keep_mask |= arr == 0
    out = np.where(keep_mask, arr, arr.dtype.type(mask_value))
    return out
