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


# --------------------------------------------------------------------------
# fragment payload codec + LOD-selective fetch
# --------------------------------------------------------------------------
# The reference's fragment payloads are draco-encoded
# (multilod.py:99-164 via extract_lod_meshes); draco is an optional
# C dep absent here, so fragments use a raw quantized codec with the
# same information content (quantized uint16/uint32 vertices + uint32
# faces). A draco payload decode hook stays gated behind try-import.

def encode_lod_fragment(qvertices: np.ndarray, faces: np.ndarray,
                        vertex_quantization_bits: int = 16) -> bytes:
    dtype = np.uint16 if vertex_quantization_bits <= 16 else np.uint32
    qv = np.asarray(qvertices, dtype=dtype).reshape(-1, 3)
    fc = np.asarray(faces, dtype=np.uint32).reshape(-1, 3)
    return (
        struct.pack("<II", len(qv), len(fc))
        + qv.astype("<u2" if dtype == np.uint16 else "<u4").tobytes()
        + fc.astype("<u4").tobytes()
    )


class UnsupportedMeshEncoding(NotImplementedError):
    """Fragment payload uses a codec not available in this environment."""


def decode_lod_fragment(blob: bytes,
                        vertex_quantization_bits: int = 16) -> tuple:
    blob = bytes(blob)
    if blob[:5] == b"DRACO":
        # externally produced neuroglancer precomputed multi-LOD data
        # (the reference decodes via DracoPy, multilod.py:99-164)
        try:
            import DracoPy
        except ImportError:
            raise UnsupportedMeshEncoding(
                "fragment payload is draco-encoded (DRACO bitstream "
                "magic) but DracoPy is not installed in this "
                "environment. Install DracoPy to import externally "
                "produced neuroglancer multi-LOD meshes, or re-encode "
                "the fragments with encode_lod_fragment's raw "
                "quantized format."
            ) from None
        mesh = DracoPy.decode(blob)  # pragma: no cover - dep absent here
        qv = np.asarray(mesh.points).reshape(-1, 3)
        fc = np.asarray(mesh.faces, dtype=np.uint32).reshape(-1, 3)
        return qv, fc
    if len(blob) < 8:
        raise UnsupportedMeshEncoding(
            f"fragment payload too short ({len(blob)} bytes) to carry "
            "the raw quantized header — unknown fragment codec"
        )
    nv, nf = struct.unpack_from("<II", blob, 0)
    dtype = "<u2" if vertex_quantization_bits <= 16 else "<u4"
    itemsize = 2 if vertex_quantization_bits <= 16 else 4
    expected = 8 + nv * 3 * itemsize + nf * 3 * 4
    if len(blob) != expected:
        raise UnsupportedMeshEncoding(
            f"fragment payload length {len(blob)} does not match the "
            f"raw quantized layout for nv={nv}, nf={nf} (expected "
            f"{expected} bytes) — the payload likely uses an "
            "unsupported codec"
        )
    qv = np.frombuffer(blob, dtype, nv * 3, 8).reshape(nv, 3)
    fc = np.frombuffer(blob, "<u4", nf * 3, 8 + nv * 3 * itemsize).reshape(nf, 3)
    return qv, fc


class MultiLodMeshLayer:
    """Parquet-backed multi-resolution meshes: one row per segid holding
    the manifest binary and the concatenated fragment file, fetched
    LOD-selectively via ``fragment_byte_ranges`` — the Spark analog of
    the reference's ranged read (``multilod.py:99-164``: byte-range GET
    of one LOD span from the fragment file, then per-fragment decode +
    dequantize)."""

    def __init__(self, spark, base_path: str,
                 vertex_quantization_bits: int = None,
                 check_writable=None):
        import json as _json

        from cloud_volume_spark.paths import resolve_cloudpath

        self.spark = spark
        self.base_path = resolve_cloudpath(base_path)
        self._check_writable = check_writable or (lambda: None)
        # the quantization width is a FACT of the stored data: a layer
        # reopened with the wrong default would silently dequantize to
        # wrong coordinates (2^16-1 vs 2^10-1 denominators) — persist
        # it in a sidecar on every write and refuse a contradiction.
        # PathOps, not raw open(): put()/get ride Spark (remote URIs
        # work), so the sidecar must too — on a remote base_path a raw
        # open() would land it in a stray local dir and a reopen on
        # another machine would silently default to 16 bits
        stored = None
        try:
            ops = self._ops()
            meta_path = f"{self.base_path}/multilod_meta.json"
            if ops.exists(meta_path):
                stored = int(_json.loads(ops.read_bytes(meta_path))
                             ["vertex_quantization_bits"])
        except (OSError, ValueError, KeyError):
            pass
        if vertex_quantization_bits is not None:
            explicit = int(vertex_quantization_bits)
            if stored is not None and stored != explicit:
                raise ValueError(
                    f"layer stores vertex_quantization_bits={stored} "
                    f"but {explicit} was passed — the stored width is "
                    "a fact of the data; reopen without the argument")
            self.vertex_quantization_bits = explicit
        else:
            self.vertex_quantization_bits = (
                stored if stored is not None else 16)

    def _ops(self):
        from cloud_volume_spark.fs import PathOps

        return PathOps(self.base_path, spark=self.spark)

    def _write_meta(self) -> None:
        import json as _json

        ops = self._ops()
        ops.makedirs(self.base_path)
        ops.write_bytes(
            f"{self.base_path}/multilod_meta.json",
            _json.dumps({"vertex_quantization_bits":
                         self.vertex_quantization_bits}).encode("utf-8"))

    @property
    def data_path(self) -> str:
        return f"{self.base_path}/multilod_meshes"

    def _table(self):
        """The parquet table with keep-latest semantics: put() appends
        a versioned row per segid, readers keep the max version
        (mergeSchema tolerates pre-version files, which read as 0)."""
        from pyspark.sql import Window, functions as sf

        df = (self.spark.read.option("mergeSchema", "true")
              .parquet(self.data_path))
        if "version" not in df.columns:
            return df
        v = sf.coalesce(sf.col("version"), sf.lit(0))
        w = Window.partitionBy("segid")
        return (df.withColumn("_mx", sf.max(v).over(w))
                .where(v == sf.col("_mx"))
                .drop("_mx", "version"))

    def put(self, segid: int, manifest: MultiLodManifest,
            fragments_per_lod) -> None:
        """``fragments_per_lod``: list (per lod) of lists of encoded
        fragment payload bytes; sizes must match the manifest's
        fragment_offsets."""
        for lod, frags in enumerate(fragments_per_lod):
            sizes = [len(b) for b in frags]
            want = manifest.fragment_offsets[lod].tolist()
            if sizes != want:
                raise ValueError(
                    f"lod {lod}: fragment sizes {sizes} != manifest {want}"
                )
        self._check_writable()
        fragfile = b"".join(
            b for frags in fragments_per_lod for b in frags
        )
        import time as _time

        df = self.spark.createDataFrame(
            [(int(segid), bytearray(manifest.to_binary()),
              bytearray(fragfile), _time.time_ns())],
            schema="segid long, manifest binary, fragfile binary, "
                   "version long",
        )
        df.write.mode("append").partitionBy().parquet(self.data_path)
        self._write_meta()

    def get_manifest(self, segid: int) -> MultiLodManifest:
        row = (
            self._table()
            .where(f"segid = {int(segid)}").select("manifest").head()
        )
        if row is None:
            raise KeyError(f"no multi-LOD manifest for segid {segid}")
        return MultiLodManifest.from_binary(bytes(row[0]), segment_id=segid)

    def get(self, segids, lod: int = 0) -> dict:
        """{segid: (vertices float64[n,3] model space, faces uint32)}
        for one LOD — only that LOD's byte span of each fragment file is
        decoded (reference ``multilod.py:120-152`` semantics, including
        the lod >= num_lods error)."""
        if np.isscalar(segids):
            segids = [segids]
        segids = [int(s) for s in segids]
        # keyed filter; isin keeps the predicate pushable
        from pyspark.sql import functions as sf
        rows = (
            self._table()
            .where(sf.col("segid").isin(segids))
            .collect()
        )
        out = {}
        for r in rows:
            manifest = MultiLodManifest.from_binary(
                bytes(r.manifest), segment_id=r.segid
            )
            if lod < 0 or lod >= manifest.num_lods:
                raise ValueError(
                    f"lod ({lod}) out of range (0 - {manifest.num_lods - 1})"
                    f" for segment {r.segid}"
                )
            frag = bytes(r.fragfile)
            all_v, all_f, off = [], [], 0
            for i, (start, end) in enumerate(
                manifest.fragment_byte_ranges(lod)
            ):
                if start == end:
                    continue  # zero-size fragments are legal content
                qv, fc = decode_lod_fragment(
                    frag[start:end], self.vertex_quantization_bits
                )
                v = from_stored_model_space(
                    qv.astype(np.float64), manifest, lod,
                    self.vertex_quantization_bits, i,
                )
                all_v.append(v)
                all_f.append(fc.astype(np.int64) + off)
                off += len(v)
            v = (
                np.concatenate(all_v) if all_v else np.zeros((0, 3))
            )
            fcs = (
                np.concatenate(all_f).astype(np.uint32)
                if all_f else np.zeros((0, 3), np.uint32)
            )
            out[r.segid] = (v, fcs)
        return out

    # ---- sharded archives (reference mesh/multilod.py:187-325) --------

    def export_sharded(self, out_dir: str, spec=None) -> int:
        """Sharded multi-LOD archive in the neuroglancer layout: the
        minishard entry for a segid indexes its *manifest*; the
        concatenated fragment file sits unindexed immediately before it
        in the same shard (readers compute ``manifest_offset -
        total_fragment_size``, reference ``mesh/multilod.py:262-283``).
        ``data_encoding`` must be raw so LOD byte ranges stay sliceable.

        Fragments here are the layer's raw-quantized encoding — a
        neuroglancer client would expect draco payloads (decode of
        foreign draco stays gated on DracoPy); the written ``info``
        records ``fragment_encoding`` honestly. One applyInPandas group
        per shard, like the skeleton/image paths."""
        import json
        import os

        import pandas as pd
        from pyspark.sql import functions as sf

        from cloud_volume_spark.sharding import (
            ShardingSpecification, synthesize_shard_file,
        )

        if spec is None:
            spec = ShardingSpecification(
                preshift_bits=0, hash="murmurhash3_x86_128",
                minishard_bits=3, shard_bits=4,
                minishard_index_encoding="gzip", data_encoding="raw",
            )
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "info"), "w") as f:
            json.dump({
                "@type": "neuroglancer_multilod_draco",
                "vertex_quantization_bits": self.vertex_quantization_bits,
                "transform": [1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0],
                "lod_scale_multiplier": 1,
                "fragment_encoding": "cloud_volume_spark_raw_quantized",
                "sharding": spec.to_dict(),
            }, f, indent=2)

        spec_dict = spec.to_dict()

        def shard_no_of(segid: int) -> str:
            return spec.compute_shard_location(segid)[0]

        shard_udf = sf.udf(shard_no_of, "string")

        def write_shard(keyvals, pdf):
            sp = ShardingSpecification.from_dict(spec_dict)
            manifests, prefixes = {}, {}
            for r in pdf.itertuples(index=False):
                manifests[int(r.segid)] = bytes(r.manifest)
                prefixes[int(r.segid)] = bytes(r.fragfile)
            blob = synthesize_shard_file(sp, manifests, prefixes)
            shard_no = str(keyvals[0])
            with open(os.path.join(out_dir, f"{shard_no}.shard"), "wb") as f:
                f.write(blob)
            return pd.DataFrame({"shard": [shard_no], "n": [len(manifests)]})

        counts = (
            self._table()
            .withColumn("shard_no", shard_udf("segid"))
            .groupBy("shard_no")
            .applyInPandas(write_shard, schema="shard string, n long")
            .collect()
        )
        return len(counts)

    def import_sharded(self, src_dir: str) -> None:
        """Read a sharded multi-LOD archive back: walk every shard's
        minishard indices, parse each manifest, and slice its fragment
        file from the bytes preceding the manifest. Shard files parse
        in parallel — one task per ``.shard``."""
        import json
        import os

        import pandas as pd

        from cloud_volume_spark.sharding import (
            ShardFileReader, ShardingSpecification,
        )

        self._check_writable()
        with open(os.path.join(src_dir, "info")) as f:
            info = json.load(f)
        spec_dict = info["sharding"]
        if spec_dict.get("data_encoding", "raw") != "raw":
            # the manifest offset points into RAW value bytes; slicing
            # uncompressed fragment sizes out of gzip-compressed shard
            # data would persist silently corrupt fragfiles (export
            # enforces the same invariant via SpecViolation)
            raise ValueError(
                "sharded multi-LOD import requires data_encoding='raw' "
                f"(archive declares {spec_dict.get('data_encoding')!r}) "
                "— LOD byte ranges are not sliceable from compressed "
                "values")
        if "vertex_quantization_bits" in info:
            self.vertex_quantization_bits = int(
                info["vertex_quantization_bits"]
            )
        paths = sorted(
            os.path.join(src_dir, p) for p in os.listdir(src_dir)
            if p.endswith(".shard")
        )
        files_df = self.spark.createDataFrame(
            [(p,) for p in paths], schema="path string"
        ).repartition(max(1, min(len(paths), 64)))

        def read_shards(batches):
            sp = ShardingSpecification.from_dict(spec_dict)
            for pdf in batches:
                rows = []
                for r in pdf.itertuples(index=False):
                    with open(r.path, "rb") as f:
                        blob = f.read()
                    reader = ShardFileReader(sp, blob)
                    for segid in reader.list_labels():
                        mbytes, off = reader.get_with_offset(int(segid))
                        manifest = MultiLodManifest.from_binary(
                            mbytes, segment_id=int(segid)
                        )
                        total = int(sum(
                            int(o.sum()) for o in manifest.fragment_offsets
                        ))
                        frag = blob[off - total:off]
                        rows.append((
                            int(segid), bytearray(mbytes), bytearray(frag),
                        ))
                yield pd.DataFrame(
                    rows, columns=["segid", "manifest", "fragfile"]
                )

        out = files_df.mapInPandas(
            read_shards, schema="segid long, manifest binary, fragfile binary"
        )
        out.write.mode("overwrite").parquet(self.data_path)
        self._write_meta()
