"""Pure-numpy compressed_segmentation codec (Neuroglancer block-LUT
format, uint32/uint64).

Layout per the public format description (offset-addressed): the file
opens with a per-channel offset table — one uint32 per channel giving
the word offset of that channel's data from the start of the file (a
single-channel file therefore begins with the word ``1``).  Within a
channel the volume is cut into ``block_size`` blocks on a grid with x
varying fastest; each block has a 2×uint32 header —

    word0 = lut_offset_in_words | (encoded_bits << 24)
    word1 = encoded_values_offset_in_words

offsets are uint32-word offsets from the channel start (so a reader
indexes the file at ``channel_offset + stored_offset``). Block voxels
are flattened x-fastest (Fortran), dictionary-encoded against a sorted
LUT of the block's distinct values, and bit-packed LSB-first into
uint32 words with ``encoded_bits`` ∈ {0,1,2,4,8,16,32}. LUT entries
are 1 word (uint32) or 2 little-endian words (uint64). Partial edge
blocks are padded by edge replication; the decoder crops them away.

Because the format is offset-addressed, any conforming reader can
follow this writer's offsets. Fidelity is pinned by roundtrip tests
(tests/test_cseg.py); byte-level cross-validation against the C
``compressed_segmentation`` wheel runs automatically if that optional
dep is present (reference gates the same way, ``chunks.py:22-68``).

Reference behavior being matched: ``chunks.py:306-318`` (cseg is
restricted to uint32/uint64; block_size default 8×8×8).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

VALID_BITS = (0, 1, 2, 4, 8, 16, 32)


def _encoded_bits(n_distinct: int) -> int:
    need = 0 if n_distinct <= 1 else int(np.ceil(np.log2(n_distinct)))
    for b in VALID_BITS:
        if b >= need:
            return b
    raise ValueError(f"cannot encode {n_distinct} distinct values")


def _pack_bits(indices: np.ndarray, bits: int) -> np.ndarray:
    """LSB-first pack of small ints into uint32 words (vectorized)."""
    if bits == 0:
        return np.zeros(0, dtype=np.uint32)
    per_word = 32 // bits
    n = len(indices)
    n_words = (n + per_word - 1) // per_word
    padded = np.zeros(n_words * per_word, dtype=np.uint64)
    padded[:n] = indices.astype(np.uint64)
    padded = padded.reshape(n_words, per_word)
    shifts = (np.arange(per_word, dtype=np.uint64) * np.uint64(bits))
    words = (padded << shifts).sum(axis=1, dtype=np.uint64) & np.uint64(0xFFFFFFFF)
    return words.astype(np.uint32)


def _unpack_bits(words: np.ndarray, bits: int, count: int) -> np.ndarray:
    if bits == 0:
        return np.zeros(count, dtype=np.uint32)
    per_word = 32 // bits
    shifts = (np.arange(per_word, dtype=np.uint32) * np.uint32(bits))
    mask = np.uint32((1 << bits) - 1)
    expanded = (words[:, None] >> shifts[None, :]) & mask
    return expanded.reshape(-1)[:count]


def compress(arr: np.ndarray, block_size: Sequence[int] = (8, 8, 8)) -> bytes:
    """``arr``: (sx, sy, sz) or (sx, sy, sz, 1) array, uint32/uint64."""
    if arr.ndim == 4:
        if arr.shape[3] != 1:
            raise ValueError("one channel at a time")
        arr = arr[..., 0]
    if arr.dtype not in (np.dtype("uint32"), np.dtype("uint64")):
        raise ValueError("compressed_segmentation requires uint32/uint64")
    is64 = arr.dtype == np.dtype("uint64")
    bx, by, bz = (int(b) for b in block_size)
    sx, sy, sz = arr.shape
    gx = (sx + bx - 1) // bx
    gy = (sy + by - 1) // by
    gz = (sz + bz - 1) // bz

    n_blocks = gx * gy * gz
    headers = np.zeros(n_blocks * 2, dtype=np.uint32)
    body: list = []
    body_words = 0
    header_words = n_blocks * 2

    bi = 0
    for z0 in range(0, gz * bz, bz):
        for y0 in range(0, gy * by, by):
            for x0 in range(0, gx * bx, bx):
                block = arr[x0:x0 + bx, y0:y0 + by, z0:z0 + bz]
                # pad partial edge blocks by edge replication
                if block.shape != (bx, by, bz):
                    px = ((0, bx - block.shape[0]),
                          (0, by - block.shape[1]),
                          (0, bz - block.shape[2]))
                    block = np.pad(block, px, mode="edge")
                flat = np.asfortranarray(block).ravel(order="F")
                lut, inverse = np.unique(flat, return_inverse=True)
                bits = _encoded_bits(len(lut))
                packed = _pack_bits(inverse, bits)

                values_offset = header_words + body_words
                body.append(packed)
                body_words += len(packed)
                lut_offset = header_words + body_words
                if is64:
                    lut_words = lut.view(np.uint32)  # little-endian pairs
                else:
                    lut_words = lut.astype(np.uint32)
                body.append(lut_words.copy())
                body_words += len(lut_words)

                if lut_offset >= (1 << 24):
                    raise ValueError("lut offset exceeds 24-bit header field")
                headers[bi * 2] = np.uint32(lut_offset | (bits << 24))
                headers[bi * 2 + 1] = np.uint32(values_offset)
                bi += 1

    # channel offset table: single channel starting right after the table
    channel_table = np.array([1], dtype=np.uint32)
    out = np.concatenate([channel_table, headers] + body)
    return out.astype(np.uint32).tobytes()


def decompress(
    blob: bytes, shape: Sequence[int], dtype,
    block_size: Sequence[int] = (8, 8, 8),
) -> np.ndarray:
    """→ (sx, sy, sz) array."""
    dtype = np.dtype(dtype)
    is64 = dtype == np.dtype("uint64")
    words = np.frombuffer(blob, dtype=np.uint32)
    bx, by, bz = (int(b) for b in block_size)
    sx, sy, sz = (int(s) for s in shape[:3])
    gx = (sx + bx - 1) // bx
    gy = (sy + by - 1) // by
    gz = (sz + bz - 1) // bz

    out = np.zeros((sx, sy, sz), dtype=dtype)
    bi = 0
    block_voxels = bx * by * bz
    ch = int(words[0])  # channel offset table (single channel)
    for z0 in range(0, gz * bz, bz):
        for y0 in range(0, gy * by, by):
            for x0 in range(0, gx * bx, bx):
                w0 = int(words[ch + bi * 2])
                values_offset = ch + int(words[ch + bi * 2 + 1])
                lut_offset = ch + (w0 & 0xFFFFFF)
                bits = w0 >> 24
                n_words = (
                    (block_voxels * bits + 31) // 32 if bits else 0
                )
                idx = _unpack_bits(
                    words[values_offset:values_offset + n_words],
                    bits, block_voxels,
                )
                n_lut = int(idx.max()) + 1 if len(idx) else 1
                if is64:
                    lut = words[lut_offset:lut_offset + 2 * n_lut].view(np.uint64)
                else:
                    lut = words[lut_offset:lut_offset + n_lut].astype(np.uint64)
                block = lut[idx].astype(dtype).reshape((bx, by, bz), order="F")
                xe = min(x0 + bx, sx)
                ye = min(y0 + by, sy)
                ze = min(z0 + bz, sz)
                out[x0:xe, y0:ye, z0:ze] = block[:xe - x0, :ye - y0, :ze - z0]
                bi += 1
    return out


def labels(blob: bytes, shape: Sequence[int], dtype,
           block_size: Sequence[int] = (8, 8, 8)) -> np.ndarray:
    """Distinct labels straight from the per-block LUTs — no value
    unpacking (the codec-native ``labels()`` fast path the reference
    exposes, ``chunks.py:362-393``)."""
    dtype = np.dtype(dtype)
    is64 = dtype == np.dtype("uint64")
    words = np.frombuffer(blob, dtype=np.uint32)
    bx, by, bz = (int(b) for b in block_size)
    sx, sy, sz = (int(s) for s in shape[:3])
    gx = (sx + bx - 1) // bx
    gy = (sy + by - 1) // by
    gz = (sz + bz - 1) // bz
    n_blocks = gx * gy * gz
    block_voxels = bx * by * bz

    luts = []
    ch = int(words[0])  # channel offset table (single channel)
    for bi in range(n_blocks):
        w0 = int(words[ch + bi * 2])
        values_offset = ch + int(words[ch + bi * 2 + 1])
        lut_offset = ch + (w0 & 0xFFFFFF)
        bits = w0 >> 24
        if bits == 0:
            n_lut = 1
        else:
            # LUT spans from lut_offset to the next section; size is
            # bounded by 2**bits — recover exact size from the packed
            # index range lazily: scan indices' max
            n_words = (block_voxels * bits + 31) // 32
            idx = _unpack_bits(
                words[values_offset:values_offset + n_words], bits, block_voxels
            )
            n_lut = int(idx.max()) + 1
        if is64:
            luts.append(words[lut_offset:lut_offset + 2 * n_lut].view(np.uint64))
        else:
            luts.append(words[lut_offset:lut_offset + n_lut].astype(np.uint64))
    if not luts:
        return np.zeros(0, dtype=dtype)
    return np.unique(np.concatenate(luts)).astype(dtype)
