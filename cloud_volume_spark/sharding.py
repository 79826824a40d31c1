"""Neuroglancer sharded-format interop: spec, hashing, shard file
synthesis and parsing.

Behavioral contract re-derived from the reference
(``datasource/precomputed/sharding.py``): a ``.shard`` file is

    [ fixed index | data (minishards) | minishard indices ]

- fixed index: ``2**minishard_bits`` rows of (start, end) uint64 byte
  ranges for each minishard index, relative to the END of the fixed
  index (``decode_index`` adds ``index_length``; :393-400).
- minishard index: C-order uint64 array of shape (3, N) — row 0
  delta-encoded labels, row 1 delta-encoded offsets, row 2 sizes;
  decoded offsets are relative to the end of the fixed index
  (:402-418). Optionally gzip.
- addressing (:152-166): ``chunkid = label >> preshift_bits`` →
  ``hash`` (identity or murmurhash3_x86_128 low half) →
  ``minishard = h & (2**minishard_bits - 1)``,
  ``shard = (h >> minishard_bits) & (2**shard_bits - 1)`` rendered as
  zero-padded hex. Golden constants pinned from the reference's own
  tests (``test_sharding.py:34`` shard '42'/minishard 18;
  ``:100`` image shard '458d').

MurmurHash3_x86_128 is implemented here in pure Python from the public
algorithm (Austin Appleby, public domain) since ``mmh3`` is not in this
container; only the low 64 bits are used, matching
``mmh3.hash64(key, x64arch=False)[0]``.

Native storage remains Parquet (SURVEY §1: the sharded format's role —
packing + index + byte ranges — is played by row groups and footer
stats); this module exists for import/export fidelity only.
"""

from __future__ import annotations

import gzip
import struct
from typing import Dict, Optional

import numpy as np

MASK32 = 0xFFFFFFFF
MASK64 = 0xFFFFFFFFFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & MASK32


def murmurhash3_x86_128(data: bytes, seed: int = 0) -> bytes:
    """MurmurHash3 x86 128-bit variant → 16-byte digest (little-endian
    lane order, as mmh3 serializes it)."""
    c1, c2, c3, c4 = 0x239B961B, 0xAB0E9789, 0x38B34AE5, 0xA1E38B93
    h1 = h2 = h3 = h4 = seed & MASK32
    length = len(data)
    nblocks = length // 16

    for i in range(nblocks):
        k1, k2, k3, k4 = struct.unpack_from("<4I", data, i * 16)

        k1 = (k1 * c1) & MASK32
        k1 = _rotl32(k1, 15)
        k1 = (k1 * c2) & MASK32
        h1 ^= k1
        h1 = _rotl32(h1, 19)
        h1 = (h1 + h2) & MASK32
        h1 = (h1 * 5 + 0x561CCD1B) & MASK32

        k2 = (k2 * c2) & MASK32
        k2 = _rotl32(k2, 16)
        k2 = (k2 * c3) & MASK32
        h2 ^= k2
        h2 = _rotl32(h2, 17)
        h2 = (h2 + h3) & MASK32
        h2 = (h2 * 5 + 0x0BCAA747) & MASK32

        k3 = (k3 * c3) & MASK32
        k3 = _rotl32(k3, 17)
        k3 = (k3 * c4) & MASK32
        h3 ^= k3
        h3 = _rotl32(h3, 15)
        h3 = (h3 + h4) & MASK32
        h3 = (h3 * 5 + 0x96CD1C35) & MASK32

        k4 = (k4 * c4) & MASK32
        k4 = _rotl32(k4, 18)
        k4 = (k4 * c1) & MASK32
        h4 ^= k4
        h4 = _rotl32(h4, 13)
        h4 = (h4 + h1) & MASK32
        h4 = (h4 * 5 + 0x32AC3B17) & MASK32

    # tail
    tail = data[nblocks * 16:]
    k1 = k2 = k3 = k4 = 0
    t = len(tail)
    if t >= 13:
        for i in range(t - 1, 11, -1):
            k4 = (k4 << 8) | tail[i]
    if t >= 9:
        for i in range(min(t, 12) - 1, 7, -1):
            k3 = (k3 << 8) | tail[i]
    if t >= 5:
        for i in range(min(t, 8) - 1, 3, -1):
            k2 = (k2 << 8) | tail[i]
    if t >= 1:
        for i in range(min(t, 4) - 1, -1, -1):
            k1 = (k1 << 8) | tail[i]

    if t:
        k1 = (k1 * c1) & MASK32
        k1 = _rotl32(k1, 15)
        k1 = (k1 * c2) & MASK32
        h1 ^= k1
    if t > 4:
        k2 = (k2 * c2) & MASK32
        k2 = _rotl32(k2, 16)
        k2 = (k2 * c3) & MASK32
        h2 ^= k2
    if t > 8:
        k3 = (k3 * c3) & MASK32
        k3 = _rotl32(k3, 17)
        k3 = (k3 * c4) & MASK32
        h3 ^= k3
    if t > 12:
        k4 = (k4 * c4) & MASK32
        k4 = _rotl32(k4, 18)
        k4 = (k4 * c1) & MASK32
        h4 ^= k4

    h1 ^= length
    h2 ^= length
    h3 ^= length
    h4 ^= length

    h1 = (h1 + h2 + h3 + h4) & MASK32
    h2 = (h2 + h1) & MASK32
    h3 = (h3 + h1) & MASK32
    h4 = (h4 + h1) & MASK32

    def fmix(h: int) -> int:
        h ^= h >> 16
        h = (h * 0x85EBCA6B) & MASK32
        h ^= h >> 13
        h = (h * 0xC2B2AE35) & MASK32
        h ^= h >> 16
        return h

    h1, h2, h3, h4 = fmix(h1), fmix(h2), fmix(h3), fmix(h4)

    h1 = (h1 + h2 + h3 + h4) & MASK32
    h2 = (h2 + h1) & MASK32
    h3 = (h3 + h1) & MASK32
    h4 = (h4 + h1) & MASK32

    return struct.pack("<4I", h1, h2, h3, h4)


def mmh3_hash64_low(x: int) -> int:
    """= uint64(mmh3.hash64(uint64(x).tobytes(), x64arch=False)[0])."""
    digest = murmurhash3_x86_128(struct.pack("<Q", x & MASK64))
    return struct.unpack("<Q", digest[:8])[0]


class SpecViolation(ValueError):
    pass


class ShardingSpecification:
    """Addressing + layout parameters (reference ``sharding.py:38``)."""

    def __init__(
        self,
        type: str = "neuroglancer_uint64_sharded_v1",
        preshift_bits: int = 0,
        hash: str = "identity",
        minishard_bits: int = 0,
        shard_bits: int = 0,
        minishard_index_encoding: str = "raw",
        data_encoding: str = "raw",
    ):
        self.type = type
        self.preshift_bits = int(preshift_bits)
        self.hash = hash
        self.minishard_bits = int(minishard_bits)
        self.shard_bits = int(shard_bits)
        self.minishard_index_encoding = minishard_index_encoding
        self.data_encoding = data_encoding
        self.validate()

    def validate(self) -> None:
        if self.type != "neuroglancer_uint64_sharded_v1":
            raise SpecViolation(f"unknown type {self.type}")
        if self.hash not in ("identity", "murmurhash3_x86_128"):
            raise SpecViolation(f"unknown hash {self.hash}")
        # unknown encodings would be silently read/written as raw (the
        # codec helpers compare == 'gzip'): a spec advertising 'br' or
        # a case typo like 'GZIP' must be refused, as the reference does
        for f in ("minishard_index_encoding", "data_encoding"):
            if getattr(self, f) not in ("raw", "gzip"):
                raise SpecViolation(
                    f"{f} must be 'raw' or 'gzip', got {getattr(self, f)!r}")
        if self.minishard_bits + self.shard_bits > 64:
            raise SpecViolation("minishard_bits + shard_bits > 64")
        for f in ("preshift_bits", "minishard_bits", "shard_bits"):
            if not (0 <= getattr(self, f) <= 64):
                raise SpecViolation(f"{f} out of range")

    @classmethod
    def from_dict(cls, d: dict) -> "ShardingSpecification":
        d = dict(d)
        d["type"] = d.pop("@type")
        return cls(**d)

    def to_dict(self) -> dict:
        return {
            "@type": self.type,
            "preshift_bits": self.preshift_bits,
            "hash": self.hash,
            "minishard_bits": self.minishard_bits,
            "shard_bits": self.shard_bits,
            "minishard_index_encoding": self.minishard_index_encoding,
            "data_encoding": self.data_encoding,
        }

    def index_length(self) -> int:
        return (2 ** self.minishard_bits) * 16

    def hashed(self, label: int) -> int:
        chunkid = (int(label) & MASK64) >> self.preshift_bits
        if self.hash == "identity":
            return chunkid
        return mmh3_hash64_low(chunkid)

    def compute_shard_location(self, label: int) -> tuple:
        """→ (shard_number_hex, minishard_number)."""
        h = self.hashed(label)
        minishard = h & ((1 << self.minishard_bits) - 1)
        shard = (h >> self.minishard_bits) & ((1 << self.shard_bits) - 1)
        width = int(np.ceil(self.shard_bits / 4.0))
        return format(shard, "x").zfill(width), int(minishard)


def _maybe_compress(data: bytes, encoding: str) -> bytes:
    return gzip.compress(data, mtime=0) if encoding == "gzip" else data


def _maybe_decompress(data: bytes, encoding: str) -> bytes:
    return gzip.decompress(data) if encoding == "gzip" else data


def synthesize_shard_file(spec: ShardingSpecification,
                          label_group: Dict[int, bytes],
                          prefix_group: Optional[Dict[int, bytes]] = None
                          ) -> bytes:
    """Assemble one ``.shard``: [fixed index | minishard data | minishard
    indices] (reference ``synthesize_shard_file`` :868-983 semantics).

    ``prefix_group`` places extra *unindexed* bytes immediately before a
    label's value — the neuroglancer sharded multi-LOD mesh layout,
    where fragment data precedes the indexed manifest and readers
    locate it as ``manifest_offset - total_fragment_size`` (reference
    ``mesh/multilod.py:262-283``). The minishard offset column is
    delta-encoded, so a prefix is just a nonzero delta; requires
    ``data_encoding == 'raw'`` (ranged fragment reads cannot span a
    compressed value)."""
    if prefix_group and spec.data_encoding != "raw":
        raise SpecViolation(
            "prefix data requires data_encoding == 'raw'"
        )
    prefix_group = prefix_group or {}
    by_minishard: Dict[int, Dict[int, bytes]] = {}
    for label, binary in label_group.items():
        _, minishard_no = spec.compute_shard_location(label)
        by_minishard.setdefault(minishard_no, {})[int(label)] = binary

    minishardnos, indices, datas = [], [], []
    for minishard_no in sorted(by_minishard):
        grp = by_minishard[minishard_no]
        labels = sorted(grp)
        index = np.zeros((3, len(labels)), dtype=np.uint64, order="C")
        components = []
        last_label = 0
        for i, label in enumerate(labels):
            binary = _maybe_compress(grp[label], spec.data_encoding)
            prefix = prefix_group.get(label, b"")
            index[0, i] = label - last_label
            index[1, i] = len(prefix)
            index[2, i] = len(binary)
            components.append(prefix + binary)
            last_label = label
        minishardnos.append(minishard_no)
        indices.append(index)
        datas.append(b"".join(components))

    cum = 0
    for idx, data in zip(indices, datas):
        if idx.shape[1]:
            idx[1, 0] += cum
        cum += len(data)

    encoded_indices = [
        _maybe_compress(idx.tobytes("C"), spec.minishard_index_encoding)
        for idx in indices
    ]
    data_part = b"".join(datas)

    fixed = np.zeros((2 ** spec.minishard_bits, 2), dtype=np.uint64, order="C")
    end = len(data_part)
    for no, enc in zip(minishardnos, encoded_indices):
        start = end
        end += len(enc)
        fixed[no, 0] = start
        fixed[no, 1] = end

    return fixed.tobytes("C") + data_part + b"".join(encoded_indices)


class ShardFileReader:
    """Parse one in-memory shard file (the reference ShardReader's
    index walk, minus the network/byte-range layer — executors hold the
    whole file when importing)."""

    def __init__(self, spec: ShardingSpecification, blob: bytes):
        self.spec = spec
        self.blob = blob
        ilen = spec.index_length()
        if len(blob) < ilen:
            raise SpecViolation("shard file shorter than its fixed index")
        fixed = np.frombuffer(blob[:ilen], dtype=np.uint64).reshape(-1, 2)
        self.fixed_index = fixed + np.uint64(ilen)  # decode_index :393
        self._msi_cache: dict = {}

    def minishard_index(self, minishard_no: int) -> np.ndarray:
        """→ uint64 (N,3) of [label, byte_start, byte_end-ish (size)]
        decoded per ``decode_minishard_index`` :402-418. Decoded (and
        for gzip-encoded indices, gunzipped) ONCE per minishard: the
        list_labels()-then-get-per-label import loops (multilod,
        skeleton shard ingest) would otherwise re-decode the same
        index per label — quadratic in labels per minishard."""
        cached = self._msi_cache.get(int(minishard_no))
        if cached is not None:
            return cached
        start, end = (int(v) for v in self.fixed_index[minishard_no])
        if start == end:
            return np.zeros((0, 3), dtype=np.uint64)
        raw = _maybe_decompress(
            self.blob[start:end], self.spec.minishard_index_encoding
        )
        idx = np.copy(np.frombuffer(raw, dtype=np.uint64))
        idx = idx.reshape((3, idx.size // 3), order="C").T
        idx[:, 0] = np.cumsum(idx[:, 0])
        idx[:, 1] = np.cumsum(idx[:, 1])
        idx[1:, 1] += np.cumsum(idx[:-1, 2])
        idx[:, 1] += np.uint64(self.spec.index_length())
        self._msi_cache[int(minishard_no)] = idx
        return idx

    def get(self, label: int) -> Optional[bytes]:
        return self.get_with_offset(label)[0]

    def get_with_offset(self, label: int):
        """→ (value bytes, absolute byte offset) — the offset lets
        multi-LOD mesh readers slice the unindexed fragment data that
        precedes the manifest (reference's 'tweak to sharding.py',
        ``mesh/multilod.py:140,262``)."""
        _, minishard_no = self.spec.compute_shard_location(label)
        idx = self.minishard_index(minishard_no)
        match = idx[idx[:, 0] == np.uint64(label)]
        if len(match) == 0:
            return None, None
        offset, size = int(match[0, 1]), int(match[0, 2])
        return (
            _maybe_decompress(
                self.blob[offset:offset + size], self.spec.data_encoding
            ),
            offset,
        )

    def list_labels(self) -> np.ndarray:
        """All labels from the indices alone — no data bytes touched
        (reference ``list_labels`` :790-820)."""
        out = []
        for m in range(2 ** self.spec.minishard_bits):
            idx = self.minishard_index(m)
            if len(idx):
                out.append(idx[:, 0])
        if not out:
            return np.zeros((0,), dtype=np.uint64)
        return np.sort(np.concatenate(out))

    def items(self):
        for m in range(2 ** self.spec.minishard_bits):
            idx = self.minishard_index(m)
            for row in idx:
                label, offset, size = int(row[0]), int(row[1]), int(row[2])
                yield label, _maybe_decompress(
                    self.blob[offset:offset + size], self.spec.data_encoding
                )


# ---------------------------------------------------------------------------
# shard packing parameter solvers (export fidelity; reference
# sharding.py:985-1058 hashed, :1060-1213 image). Native storage is
# Parquet, where row-group sizing plays this role — these exist so
# export_sharded can emit ecosystem-standard layouts.
# ---------------------------------------------------------------------------

def compute_shard_params_for_hashed(
    num_labels: int,
    shard_index_bytes: int = 2 ** 13,
    minishard_index_bytes: int = 2 ** 15,
    min_shards: int = 1,
) -> tuple:
    """(shard_bits, minishard_bits, preshift_bits) for uniformly hashed
    keys (meshes/skeletons). Index-size model: a minishard index row is
    3 uint64s, a shard index row 2 uint64s; preshift bits carry no
    information for random keys, so they stay 0."""
    import math

    assert min_shards >= 1
    if num_labels <= 0:
        return (0, 0, 0)

    mini_per_shard = shard_index_bytes / 16.0
    labels_per_mini = minishard_index_bytes / 24.0
    labels_per_shard = mini_per_shard * labels_per_mini

    if num_labels >= labels_per_shard:
        minishard_bits = math.ceil(math.log2(mini_per_shard))
        shard_bits = math.ceil(math.log2(
            num_labels / (labels_per_mini * (2 ** minishard_bits))
        ))
    elif num_labels >= labels_per_mini:
        minishard_bits = math.ceil(math.log2(num_labels / labels_per_mini))
        shard_bits = 0
    else:
        minishard_bits = 0
        shard_bits = 0

    # pack shards near capacity; tolerate ~10% overflow before
    # splitting, halve the shard count when under ~55% utilized
    utilization = num_labels / (labels_per_shard * (2 ** shard_bits))
    if utilization <= 0.55:
        shard_bits -= 1
    shard_bits = max(shard_bits, 0)

    min_shard_bits = int(round(math.log2(min_shards)))
    grow = max(min_shard_bits - shard_bits, 0)
    shard_bits = max(shard_bits + grow, min_shard_bits)
    minishard_bits = max(minishard_bits - grow, 0)
    return (int(shard_bits), int(minishard_bits), 0)


def compute_shard_params_for_image(
    dataset_size,
    chunk_size,
    encoding: str = "raw",
    dtype="uint8",
    uncompressed_shard_bytesize: int = int(3.5e9),
    max_shard_index_bytes: int = 8192,
    max_minishard_index_bytes: int = 40000,
    max_labels_per_minishard: int = 4000,
    minishard_index_encoding: str = "gzip",
    data_encoding: str = "gzip",
) -> "ShardingSpecification":
    """Recommend an image sharding spec: shards ≲3.5 GB uncompressed,
    shard index ≲8 KiB, minishard index ≲40 KB with hundreds-to-
    thousands of morton-coded chunks each; every bit of the compressed
    morton code is allocated to preshift/minishard/shard."""
    import math

    dataset_size = [int(v) for v in dataset_size]
    chunk_size = [int(v) for v in chunk_size]
    byte_width = np.dtype(dtype).itemsize

    grid = [
        int(math.ceil(dataset_size[i] / chunk_size[i])) for i in range(3)
    ]
    num_chunks = 1
    for g in grid:
        num_chunks *= g
    # information content of the compressed morton code
    max_bits = sum(int(math.ceil(math.log2(max(g, 1)))) for g in grid)

    chunk_voxels = chunk_size[0] * chunk_size[1] * chunk_size[2]
    chunks_per_shard = math.ceil(
        uncompressed_shard_bytesize / (chunk_voxels * byte_width)
    )
    chunks_per_shard = 2 ** int(math.log2(chunks_per_shard))
    if num_chunks < chunks_per_shard:
        chunks_per_shard = 2 ** int(math.ceil(math.log2(num_chunks)))

    num_shards = num_chunks / chunks_per_shard

    def solve_bits():
        sb = int(math.ceil(math.log2(max(num_shards, 1))))
        pb = int(math.ceil(math.log2(chunks_per_shard)))
        return sb, min(pb, max_bits - sb)

    shard_bits, preshift_bits = solve_bits()

    labels_per_mini = float(chunks_per_shard)
    minishard_bits = 0
    while labels_per_mini > max_labels_per_minishard:
        labels_per_mini /= 2.0
        minishard_bits += 1
        mini_index_size = 24 * labels_per_mini
        shard_index_size = 16 * (2 ** minishard_bits)
        mini_too_big = (
            mini_index_size > max_minishard_index_bytes
            and minishard_bits > preshift_bits
        )
        if mini_too_big or shard_index_size > max_shard_index_bytes:
            # back off one minishard level and split shards instead
            minishard_bits -= 1
            num_shards *= 2
            shard_bits, preshift_bits = solve_bits()

    # minishard bits are carved out of the preshift allocation; rounding
    # slack lands in shard bits below
    preshift_bits -= minishard_bits
    if dataset_size[2] == chunk_size[2]:
        # single-chunk z (2D-ish datasets): morton codes exhaust z
        # quickly, so extra xy bits become available to preshift
        extra = preshift_bits // 3
        i = 0
        while i < extra:
            max_bits += 1
            preshift_bits += 1
            if preshift_bits % 3 != 0:
                i += 1

    shard_bits = max(max_bits - preshift_bits - minishard_bits, 0)

    if max_bits > 64:
        raise ValueError(
            f"chunk grid needs {max_bits} morton bits (>64); increase "
            f"chunk size. dataset={dataset_size} chunk={chunk_size}"
        )
    if preshift_bits < 0:
        raise ValueError(
            f"negative preshift_bits: ({shard_bits}, {minishard_bits}, "
            f"{preshift_bits}) of {max_bits}"
        )
    if preshift_bits + shard_bits + minishard_bits > max_bits:
        raise ValueError(
            f"bit allocation {preshift_bits}+{shard_bits}+{minishard_bits} "
            f"exceeds {max_bits} morton bits"
        )

    if encoding in ("jpeg", "png", "kempressed", "fpzip", "zfpc"):
        data_encoding = "raw"  # already entropy-coded

    return ShardingSpecification(
        "neuroglancer_uint64_sharded_v1",
        hash="identity",
        minishard_bits=minishard_bits,
        minishard_index_encoding=minishard_index_encoding,
        preshift_bits=preshift_bits,
        shard_bits=shard_bits,
        data_encoding=data_encoding,
    )
