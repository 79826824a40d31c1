"""Neuroglancer multi-resolution mesh manifests (multi-LOD).

Wire format (reference ``datasource/precomputed/mesh/multilod.py:327-466``;
spec: neuroglancer ``meshes.md`` multi-resolution manifest):

    chunk_shape            3 × float32 (le)
    grid_origin            3 × float32
    num_lods               uint32
    lod_scales             num_lods × float32
    vertex_offsets         num_lods × 3 float32 (C order)
    num_fragments_per_lod  num_lods × uint32
    per lod:
        fragment_positions n × 3 uint32, column-major (x..., y..., z...)
        fragment_offsets   n × uint32 (encoded fragment byte sizes)

The draco-encoded fragment payloads themselves need the draco codec
(absent in this container — decode stays gated); the manifest octree
and the stored-model-space quantization transforms
(``multilod.py:468-524``) are pure struct/math and fully implemented.
"""

from __future__ import annotations

import struct

import numpy as np


class MultiLodManifest:
    def __init__(self, chunk_shape, grid_origin, lod_scales,
                 vertex_offsets, fragment_positions, fragment_offsets,
                 segment_id: int = 0):
        self.chunk_shape = np.asarray(chunk_shape, dtype=np.float32)
        self.grid_origin = np.asarray(grid_origin, dtype=np.float32)
        self.lod_scales = np.asarray(lod_scales, dtype=np.float32)
        self.vertex_offsets = np.asarray(
            vertex_offsets, dtype=np.float32
        ).reshape(len(self.lod_scales), 3)
        self.fragment_positions = [
            np.asarray(p, dtype=np.uint32).reshape(-1, 3)
            for p in fragment_positions
        ]
        self.fragment_offsets = [
            np.asarray(o, dtype=np.uint32).ravel()
            for o in fragment_offsets
        ]
        self.segment_id = int(segment_id)
        if len(self.fragment_positions) != self.num_lods or \
                len(self.fragment_offsets) != self.num_lods:
            raise ValueError("per-lod lists must match num_lods")

    @property
    def num_lods(self) -> int:
        return len(self.lod_scales)

    @property
    def num_fragments_per_lod(self) -> np.ndarray:
        return np.array(
            [len(p) for p in self.fragment_positions], dtype=np.uint32
        )

    def fragment_byte_ranges(self, lod: int):
        """(start, end) byte offsets of each fragment within the
        concatenated fragment file, ordered lod 0 first."""
        start = 0
        for lower in range(lod):
            start += int(self.fragment_offsets[lower].sum())
        offs = self.fragment_offsets[lod]
        ends = start + np.cumsum(offs)
        starts = ends - offs
        return list(zip(starts.tolist(), ends.tolist()))

    def to_binary(self) -> bytes:
        parts = [
            self.chunk_shape.astype("<f4").tobytes(),
            self.grid_origin.astype("<f4").tobytes(),
            struct.pack("<I", self.num_lods),
            self.lod_scales.astype("<f4").tobytes(),
            self.vertex_offsets.astype("<f4").tobytes(order="C"),
            self.num_fragments_per_lod.astype("<u4").tobytes(),
        ]
        for lod in range(self.num_lods):
            parts.append(
                self.fragment_positions[lod].astype("<u4").tobytes(order="F")
            )
            parts.append(self.fragment_offsets[lod].astype("<u4").tobytes())
        return b"".join(parts)

    @classmethod
    def from_binary(cls, binary: bytes, segment_id: int = 0) -> "MultiLodManifest":
        (num_lods,) = struct.unpack_from("<I", binary, 24)
        off = 28
        lod_scales = np.frombuffer(binary, "<f4", num_lods, off)
        off += 4 * num_lods
        vertex_offsets = np.frombuffer(
            binary, "<f4", 3 * num_lods, off
        ).reshape(num_lods, 3)
        off += 12 * num_lods
        nfrags = np.frombuffer(binary, "<u4", num_lods, off)
        off += 4 * num_lods

        positions, offsets = [], []
        for lod in range(num_lods):
            n = int(nfrags[lod])
            positions.append(
                np.frombuffer(binary, "<u4", 3 * n, off)
                .reshape(n, 3, order="F").copy()
            )
            off += 12 * n
            offsets.append(np.frombuffer(binary, "<u4", n, off).copy())
            off += 4 * n
        if off != len(binary):
            raise ValueError(
                f"multi-LOD manifest size mismatch: parsed {off} of "
                f"{len(binary)} bytes"
            )
        return cls(
            chunk_shape=np.frombuffer(binary, "<f4", 3, 0),
            grid_origin=np.frombuffer(binary, "<f4", 3, 12),
            lod_scales=lod_scales,
            vertex_offsets=vertex_offsets,
            fragment_positions=positions,
            fragment_offsets=offsets,
            segment_id=segment_id,
        )

    def __len__(self) -> int:
        # 28 fixed + (lod_scales 4 + vertex_offsets 12 + nfrags 4) per
        # lod + (position 12 + offset 4) per fragment
        nf = int(self.num_fragments_per_lod.sum())
        return 28 + 20 * self.num_lods + 16 * nf

    def __eq__(self, other) -> bool:
        return isinstance(other, MultiLodManifest) and \
            self.to_binary() == other.to_binary()


def from_stored_model_space(vertices: np.ndarray, manifest: MultiLodManifest,
                            lod: int, vertex_quantization_bits: int,
                            frag: int) -> np.ndarray:
    """Quantized fragment vertices → stored model space (reference
    ``multilod.py:468-500``): grid_origin + vertex_offsets[lod] +
    chunk_shape·2^lod·(frag_pos + x/(2^bits − 1))."""
    q = 2.0 ** vertex_quantization_bits - 1
    return np.asarray(
        manifest.grid_origin
        + manifest.vertex_offsets[lod]
        + manifest.chunk_shape * (2 ** lod) * (
            manifest.fragment_positions[lod][frag, :] + vertices / q
        )
    )


def to_stored_model_space(vertices: np.ndarray, manifest: MultiLodManifest,
                          lod: int, vertex_quantization_bits: int,
                          frag: int) -> np.ndarray:
    """Inverse quantization (reference ``multilod.py:502-524``)."""
    q = 2 ** vertex_quantization_bits - 1
    out = vertices.astype(np.float64, copy=True)
    out -= manifest.grid_origin + manifest.vertex_offsets[lod]
    out /= manifest.chunk_shape * (2 ** lod)
    out -= manifest.fragment_positions[lod][frag, :]
    out *= q
    np.round(out, out=out)
    np.clip(out, 0, q, out=out)
    dtype = np.uint16 if q <= 0xFFFF else np.uint32
    return out.astype(dtype)
