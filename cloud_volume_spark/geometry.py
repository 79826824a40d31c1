"""Vec / Bbox geometry algebra — the engine's predicate language.

Driver-side re-derivation of the reference semantics in
``lib.py:263-1013`` (``Vec`` :263, ``Bbox`` :345; expand :794,
shrink :815, intersection :448, contains :? , to/from_filename
:520/:584, reify slices :618). A ``Bbox`` never touches executors: it
compiles to ``WHERE cx BETWEEN … AND cy BETWEEN … AND cz BETWEEN …``
filters that Catalyst pushes into the parquet scan.

Coordinates are integer voxel coordinates (Fortran x,y,z order to match
the reference's array layout). All boxes are half-open: [minpt, maxpt).
"""

from __future__ import annotations

import re
from typing import Iterable, Sequence

import numpy as np


class Vec(np.ndarray):
    """Small integer/float coordinate vector (reference ``lib.py:263``)."""

    def __new__(cls, *args, dtype=None):
        if len(args) == 1 and isinstance(args[0], (list, tuple, np.ndarray)):
            args = tuple(args[0])
        arr = np.array(args, dtype=dtype if dtype is not None else None)
        return arr.view(cls)

    @property
    def x(self):
        return self[0]

    @property
    def y(self):
        return self[1]

    @property
    def z(self):
        return self[2]

    def clone(self) -> "Vec":
        return Vec(np.copy(self))

    def __hash__(self):  # type: ignore[override]
        return hash(tuple(self))


class OutOfBoundsError(ValueError):
    """Requested region lies outside the dataset bounds (bounded mode)."""


class AlignmentError(ValueError):
    """Write shape does not match the destination slice."""


_FILENAME_RE = re.compile(
    r"(-?\d+)-(-?\d+)_(-?\d+)-(-?\d+)_(-?\d+)-(-?\d+)(?:\.gz|\.br|\.zstd)?$"
)


class Bbox:
    """Integer axis-aligned box [minpt, maxpt) (reference ``lib.py:345``)."""

    __slots__ = ("minpt", "maxpt", "dtype")

    def __init__(self, minpt: Sequence, maxpt: Sequence, dtype=None):
        if dtype is None:
            dtype = np.int64
        self.minpt = Vec(*minpt, dtype=dtype)
        self.maxpt = Vec(*maxpt, dtype=dtype)
        self.dtype = np.dtype(dtype)

    # ---- constructors -------------------------------------------------

    @classmethod
    def from_delta(cls, minpt: Sequence, sizes: Sequence) -> "Bbox":
        minpt = np.asarray(minpt)
        return cls(minpt, minpt + np.asarray(sizes))

    @classmethod
    def from_list(cls, lst: Sequence) -> "Bbox":
        n = len(lst) // 2
        return cls(lst[:n], lst[n:])

    @classmethod
    def from_slices(cls, slices: Sequence[slice]) -> "Bbox":
        return cls(
            [s.start for s in slices],
            [s.stop for s in slices],
        )

    @classmethod
    def from_filename(cls, filename: str) -> "Bbox":
        """Parse ``…/x0-x1_y0-y1_z0-z1`` (reference ``lib.py:520``)."""
        match = _FILENAME_RE.search(filename)
        if match is None:
            raise ValueError(f"Unparsable chunk filename: {filename}")
        x0, x1, y0, y1, z0, z1 = map(int, match.groups())
        return cls((x0, y0, z0), (x1, y1, z1))

    @classmethod
    def intersection(cls, a: "Bbox", b: "Bbox") -> "Bbox":
        """Overlap region; degenerate (zero) box if disjoint
        (reference ``lib.py:448``)."""
        if not a.overlaps(b):
            return cls((0,) * a.ndim, (0,) * a.ndim)
        return cls(
            np.maximum(a.minpt, b.minpt),
            np.minimum(a.maxpt, b.maxpt),
        )

    @classmethod
    def expand(cls, *boxes: "Bbox") -> "Bbox":
        """Smallest box containing all inputs (union envelope)."""
        minpt = np.min([b.minpt for b in boxes], axis=0)
        maxpt = np.max([b.maxpt for b in boxes], axis=0)
        return cls(minpt, maxpt)

    # ---- geometry -----------------------------------------------------

    @property
    def ndim(self) -> int:
        return len(self.minpt)

    def size3(self) -> Vec:
        return Vec(*(np.asarray(self.maxpt) - np.asarray(self.minpt)))

    def volume(self) -> int:
        size = np.maximum(self.size3(), 0)
        return int(np.prod(size))

    def empty(self) -> bool:
        return bool(np.any(self.maxpt <= self.minpt))

    def valid(self) -> bool:
        return bool(np.all(self.maxpt >= self.minpt))

    def overlaps(self, other: "Bbox") -> bool:
        return bool(
            np.all(self.minpt < other.maxpt) and np.all(other.minpt < self.maxpt)
        )

    def contains(self, point: Sequence) -> bool:
        point = np.asarray(point)
        return bool(np.all(point >= self.minpt) and np.all(point < self.maxpt))

    def contains_bbox(self, other: "Bbox") -> bool:
        return bool(
            np.all(other.minpt >= self.minpt) and np.all(other.maxpt <= self.maxpt)
        )

    def clamp(self, bounds: "Bbox") -> "Bbox":
        """Intersect with bounds (autocrop; reference ``lib.py:477-505``)."""
        return Bbox(
            np.clip(self.minpt, bounds.minpt, bounds.maxpt),
            np.clip(self.maxpt, bounds.minpt, bounds.maxpt),
        )

    def expand_to_chunk_size(self, chunk_size: Sequence, offset: Sequence = (0, 0, 0)) -> "Bbox":
        """Grow outward to chunk-grid alignment (reference ``lib.py:794``):
        floor minpt and ceil maxpt to multiples of chunk_size anchored at
        offset."""
        chunk_size = np.asarray(chunk_size, dtype=np.int64)
        offset = np.asarray(offset, dtype=np.int64)
        minpt = np.floor_divide(self.minpt - offset, chunk_size) * chunk_size + offset
        maxpt = (
            np.ceil((self.maxpt - offset) / chunk_size).astype(np.int64) * chunk_size
            + offset
        )
        return Bbox(minpt, maxpt)

    def shrink_to_chunk_size(self, chunk_size: Sequence, offset: Sequence = (0, 0, 0)) -> "Bbox":
        """Shrink inward to chunk-grid alignment (reference ``lib.py:815``).
        May produce an empty box; callers must check ``.empty()``."""
        chunk_size = np.asarray(chunk_size, dtype=np.int64)
        offset = np.asarray(offset, dtype=np.int64)
        minpt = (
            np.ceil((self.minpt - offset) / chunk_size).astype(np.int64) * chunk_size
            + offset
        )
        maxpt = np.floor_divide(self.maxpt - offset, chunk_size) * chunk_size + offset
        # collapse to a point only when an axis INVERTS (box inside a
        # single chunk); a zero-width slab (minpt == maxpt on an axis)
        # survives as-is — the reference's exact contract
        # (lib.py:836-840), verified by test_reference_interop's
        # randomized sweep against the reference's own Bbox.
        if np.any(minpt > maxpt):
            return Bbox(minpt, minpt)
        return Bbox(minpt, maxpt)

    def round_to_chunk_size(self, chunk_size: Sequence, offset: Sequence = (0, 0, 0)) -> "Bbox":
        """Round each face to the nearest chunk boundary."""
        chunk_size = np.asarray(chunk_size, dtype=np.int64)
        offset = np.asarray(offset, dtype=np.int64)
        minpt = np.round((self.minpt - offset) / chunk_size).astype(np.int64) * chunk_size + offset
        maxpt = np.round((self.maxpt - offset) / chunk_size).astype(np.int64) * chunk_size + offset
        return Bbox(minpt, maxpt)

    def grid_coords(self, chunk_size: Sequence, offset: Sequence = (0, 0, 0)):
        """Yield (cx, cy, cz) grid coordinates of every chunk overlapping
        this box (reference ``image/common.py:137-155`` chunknames).
        Driver-side; at scale callers should use :meth:`grid_ranges` and
        let Catalyst prune instead of enumerating."""
        aligned = self.expand_to_chunk_size(chunk_size, offset)
        chunk_size = np.asarray(chunk_size, dtype=np.int64)
        offset = np.asarray(offset, dtype=np.int64)
        lo = np.floor_divide(aligned.minpt - offset, chunk_size)
        hi = np.floor_divide(aligned.maxpt - offset - 1, chunk_size) + 1
        for cz in range(int(lo[2]), int(hi[2])):
            for cy in range(int(lo[1]), int(hi[1])):
                for cx in range(int(lo[0]), int(hi[0])):
                    yield (cx, cy, cz)

    def grid_ranges(self, chunk_size: Sequence, offset: Sequence = (0, 0, 0)):
        """Inclusive (lo, hi) chunk-coordinate ranges per axis — the
        pushdown predicate form of :meth:`grid_coords`."""
        aligned = self.expand_to_chunk_size(chunk_size, offset)
        chunk_size = np.asarray(chunk_size, dtype=np.int64)
        offset = np.asarray(offset, dtype=np.int64)
        lo = np.floor_divide(aligned.minpt - offset, chunk_size)
        hi = np.floor_divide(aligned.maxpt - offset - 1, chunk_size)
        return tuple(
            (int(lo[i]), int(hi[i])) for i in range(3)
        )

    def num_chunks(self, chunk_size: Sequence, offset: Sequence = (0, 0, 0)) -> int:
        ranges = self.grid_ranges(chunk_size, offset)
        n = 1
        for lo, hi in ranges:
            n *= max(0, hi - lo + 1)
        return n

    # ---- conversions --------------------------------------------------

    def to_filename(self) -> str:
        """``x0-x1_y0-y1_z0-z1`` (reference ``lib.py:584``)."""
        return "_".join(
            f"{int(self.minpt[i])}-{int(self.maxpt[i])}" for i in range(self.ndim)
        )

    def to_slices(self) -> tuple:
        return tuple(
            slice(int(self.minpt[i]), int(self.maxpt[i])) for i in range(self.ndim)
        )

    def to_list(self) -> list:
        return [int(v) for v in self.minpt] + [int(v) for v in self.maxpt]

    def offset_by(self, delta: Sequence) -> "Bbox":
        delta = np.asarray(delta)
        return Bbox(self.minpt + delta, self.maxpt + delta)

    def scale_by(self, factor: Sequence) -> "Bbox":
        """Divide coordinates by per-axis factor (mip transform,
        reference ``metadata.py:675-700``): floor min, ceil max."""
        factor = np.asarray(factor, dtype=np.float64)
        return Bbox(
            np.floor(self.minpt / factor).astype(np.int64),
            np.ceil(self.maxpt / factor).astype(np.int64),
        )

    # ---- dunder -------------------------------------------------------

    def __eq__(self, other) -> bool:
        if not isinstance(other, Bbox):
            return NotImplemented
        return bool(
            np.array_equal(self.minpt, other.minpt)
            and np.array_equal(self.maxpt, other.maxpt)
        )

    def __hash__(self):
        return hash(tuple(self.to_list()))

    def __repr__(self):
        return f"Bbox({list(map(int, self.minpt))}, {list(map(int, self.maxpt))})"

    def clone(self) -> "Bbox":
        return Bbox(self.minpt.clone(), self.maxpt.clone())


def reify_slices(
    slices, bounds: Bbox, bounded: bool = True, autocrop: bool = False
) -> tuple[Bbox, tuple]:
    """Normalize numpy-style slices against dataset bounds (reference
    ``lib.py:618-700`` + ``frontends/precomputed.py:569``).

    Accepts int / slice / tuple of them (≤3 spatial axes + optional
    channel slice). Returns (Bbox, channel_slice). Steps != 1 are
    rejected, matching the frontend's behavior for writes.
    """
    if isinstance(slices, (slice, int, np.integer)):
        slices = (slices,)
    slices = list(slices)

    channel = slice(None)
    if len(slices) == 4:
        channel = slices.pop()
    if len(slices) > 3:
        raise ValueError(f"Too many dimensions: {slices}")

    while len(slices) < 3:
        slices.append(slice(None))

    minpt, maxpt = [], []
    for i, sl in enumerate(slices):
        lo_bound = int(bounds.minpt[i])
        hi_bound = int(bounds.maxpt[i])
        if isinstance(sl, (int, np.integer)):
            # normalize a negative int BEFORE widening to a slice:
            # slice(-1, 0) inverts (start += hi_bound but stop=0 stays),
            # silently yielding an empty region for vol[-1] instead of
            # the last plane
            k = int(sl)
            if k < 0:
                k += hi_bound
            sl = slice(k, k + 1)
        if sl.step not in (None, 1):
            raise ValueError(f"Step slicing is not supported: {sl}")
        start = lo_bound if sl.start is None else int(sl.start)
        stop = hi_bound if sl.stop is None else int(sl.stop)
        if start < 0:
            start += hi_bound
        if stop < 0:
            stop += hi_bound
        minpt.append(start)
        maxpt.append(stop)

    bbox = Bbox(minpt, maxpt)
    if autocrop:
        bbox = bbox.clamp(bounds)
    elif bounded and not bounds.contains_bbox(bbox):
        raise OutOfBoundsError(f"{bbox} is not contained in dataset bounds {bounds}")
    return bbox, channel
