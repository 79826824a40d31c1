"""Pure-Python PNG codec (stdlib zlib only).

Implements the subset of the public PNG spec (RFC 2083) the chunk
engine needs: 8/16-bit grayscale, 8/16-bit RGB/RGBA, non-interlaced.
Decode handles all five scanline filters; encode emits filter 0 with a
deterministic zlib stream, so output bytes are stable for golden tests.

This is the installable-anywhere fallback for the reference's
``pyspng`` optional dep (``chunks.py:279-284`` encode_png,
``chunks.py:348-352`` decode_png): EM imagery is commonly stored as
png/jpeg, and a volume written with encoding="png" must be readable in
an environment without C codec wheels. When pyspng is present,
``codecs.py`` prefers it; both produce spec-conformant files the other
can read.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type codes
_GRAY, _RGB, _GRAY_ALPHA, _RGBA = 0, 2, 4, 6
_CHANNELS = {_GRAY: 1, _RGB: 3, _GRAY_ALPHA: 2, _RGBA: 4}
_COLOR_TYPE = {1: _GRAY, 2: _GRAY_ALPHA, 3: _RGB, 4: _RGBA}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload)) + tag + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode(img: np.ndarray, compress_level: int = 9) -> bytes:
    """(H, W) or (H, W, C) uint8/uint16 → PNG bytes (filter 0)."""
    img = np.asarray(img)
    if img.dtype not in (np.dtype("uint8"), np.dtype("uint16")):
        raise ValueError(f"png supports uint8/uint16, got {img.dtype}")
    if img.ndim == 2:
        img = img[:, :, np.newaxis]
    if img.ndim != 3 or img.shape[2] not in _COLOR_TYPE:
        raise ValueError(f"unsupported png image shape {img.shape}")
    h, w, c = img.shape
    depth = img.dtype.itemsize * 8
    ihdr = struct.pack(">IIBBBBB", w, h, depth, _COLOR_TYPE[c], 0, 0, 0)
    # scanlines: filter byte 0 + big-endian samples
    body = img.astype(f">u{img.dtype.itemsize}").tobytes()
    row_bytes = w * c * img.dtype.itemsize
    raw = bytearray()
    for y in range(h):
        raw.append(0)
        raw += body[y * row_bytes:(y + 1) * row_bytes]
    idat = zlib.compress(bytes(raw), compress_level)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: bytes, h: int, row_bytes: int, bpp: int) -> np.ndarray:
    """Undo per-scanline filters → (h, row_bytes) uint8 matrix."""
    out = np.zeros((h, row_bytes), dtype=np.uint8)
    stride = row_bytes + 1
    for y in range(h):
        ftype = raw[y * stride]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=row_bytes, offset=y * stride + 1
        ).astype(np.int64)
        prev = out[y - 1].astype(np.int64) if y > 0 else np.zeros(
            row_bytes, dtype=np.int64
        )
        if ftype == 0:
            rec = line
        elif ftype == 1:  # Sub
            rec = line.copy()
            for x in range(bpp, row_bytes):
                rec[x] = (rec[x] + rec[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            rec = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            rec = line.copy()
            for x in range(row_bytes):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (rec[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            rec = line.copy()
            for x in range(row_bytes):
                left = int(rec[x - bpp]) if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                rec[x] = (rec[x] + _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise ValueError(f"unknown png filter type {ftype}")
        out[y] = rec.astype(np.uint8)
    return out


def decode(blob: bytes) -> np.ndarray:
    """PNG bytes → (H, W) uint8/uint16 for grayscale, (H, W, C) else."""
    if blob[:8] != _SIGNATURE:
        raise ValueError("not a png: bad signature")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos < len(blob):
        (length,) = struct.unpack_from(">I", blob, pos)
        tag = blob[pos + 4:pos + 8]
        payload = blob[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("png missing IHDR")
    w, h, depth, color_type, _comp, _filt, interlace = ihdr
    if interlace:
        raise ValueError("interlaced png not supported")
    if depth not in (8, 16) or color_type not in _CHANNELS:
        raise ValueError(
            f"unsupported png: depth={depth} color_type={color_type}"
        )
    c = _CHANNELS[color_type]
    itemsize = depth // 8
    bpp = c * itemsize
    row_bytes = w * bpp
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (row_bytes + 1):
        raise ValueError("png IDAT length mismatch")
    mat = _unfilter(raw, h, row_bytes, bpp)
    img = np.frombuffer(mat.tobytes(), dtype=f">u{itemsize}").astype(
        f"u{itemsize}"
    ).reshape(h, w, c)
    return img[:, :, 0] if c == 1 else img
