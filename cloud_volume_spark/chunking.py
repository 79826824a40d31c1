"""Chunk-grid addressing: morton codes and grid enumeration.

The compressed morton code is the chunk address used by the sharded
Precomputed format (reference
``datasource/precomputed/common.py:55-86``); we re-derive its semantics
here (bit-interleave each axis only while ``2**i < grid_size[axis]``)
for (a) export/import fidelity and (b) Z-order clustering of the native
Parquet chunk table, so spatially-adjacent chunks land in the same row
groups and bbox scans prune well.

Behavioral contract pinned by reference golden constants
(``test/test_sharding.py:70-98``) — see ``tests/test_chunking.py``.
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np


def compressed_morton_code(gridpt, grid_size: Sequence[int]):
    """Interleave grid-coordinate bits, skipping exhausted axes.

    ``gridpt``: (3,) or (N,3) integer array-like; returns uint64 scalar
    or (N,) uint64 array. Raises ValueError when a point falls outside
    ``grid_size`` or the grid needs >64 bits — same contract as the
    reference implementation.
    """
    gridpt = np.asarray(gridpt, dtype=np.uint64)
    single = gridpt.ndim == 1
    if single:
        gridpt = gridpt[np.newaxis, :]
    if gridpt.size == 0:
        return np.zeros((0,), dtype=np.uint64)

    grid_size = np.asarray(grid_size, dtype=np.uint64)
    num_bits = [int(math.ceil(math.log2(max(int(s), 1)))) for s in grid_size]
    if sum(num_bits) > 64:
        raise ValueError(
            f"Grid size {grid_size.tolist()} requires {num_bits} bits (>64)."
        )
    if np.any(np.max(gridpt, axis=0) >= grid_size):
        raise ValueError(
            f"Grid point outside grid. size={grid_size.tolist()} pts={gridpt.tolist()}"
        )

    code = np.zeros((gridpt.shape[0],), dtype=np.uint64)
    one = np.uint64(1)
    j = np.uint64(0)
    for i in range(max(num_bits) if num_bits else 0):
        for dim in range(3):
            if 2**i < int(grid_size[dim]):
                bit = ((gridpt[:, dim] >> np.uint64(i)) & one) << j
                code |= bit
                j += one
    return code[0] if single else code


def morton_codes_for_grid(grid_coords, grid_size: Sequence[int]) -> np.ndarray:
    """Vectorized morton codes for an (N,3) array of chunk coords."""
    return np.atleast_1d(compressed_morton_code(grid_coords, grid_size))


def decode_morton(code: int, grid_size: Sequence[int]) -> tuple[int, int, int]:
    """Inverse of :func:`compressed_morton_code` for a single code."""
    num_bits = [int(math.ceil(math.log2(max(int(s), 1)))) for s in grid_size]
    coords = [0, 0, 0]
    j = 0
    for i in range(max(num_bits) if num_bits else 0):
        for dim in range(3):
            if 2**i < int(grid_size[dim]):
                coords[dim] |= ((int(code) >> j) & 1) << i
                j += 1
    return tuple(coords)
