"""Meshes as keyed fragment tables with the Precomputed legacy codec.

Reference model: per-segid triangle meshes arrive as fragment files
listed by a ``{segid}:0`` JSON manifest (``mesh.py:30/:175``,
``mesh/unsharded.py:32-217``); fetch = manifest → fragments → decode →
concat → optional vertex dedup ("consolidate", ``mesh.py:148-172``).

Spark model:

    mesh_fragments(segid LONG, fragment INT,
                   vertices ARRAY<ARRAY<FLOAT>>,
                   faces ARRAY<ARRAY<INT>>)

- fetch       → keyed filter; fuse = groupBy(segid).applyInPandas
                (concat + face reindex + exact-dup vertex dedup)
- consolidate → np.unique(axis=0) inside the same UDF, exactly the
                reference kernel
- crop        → explode-less vertex filter driver (mesh.py:421-470)
- codec       → legacy precomputed binary: nv uint32, vertices
                float32[nv,3], faces uint32[nf,3] (mesh.py:175)
"""

from __future__ import annotations

import json
import os
import struct
from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType, FloatType, IntegerType, LongType, StructField, StructType,
)


# ---- Precomputed legacy binary codec (mesh.py:175 from_precomputed) ----

def encode_precomputed(vertices: np.ndarray, faces: np.ndarray) -> bytes:
    vertices = np.asarray(vertices, dtype=np.float32).reshape(-1, 3)
    faces = np.asarray(faces, dtype=np.uint32).reshape(-1, 3)
    return struct.pack("<I", len(vertices)) + vertices.tobytes() + faces.tobytes()


def decode_precomputed(blob: bytes) -> dict:
    (nv,) = struct.unpack("<I", blob[:4])
    vertices = np.frombuffer(blob, dtype=np.float32, count=nv * 3, offset=4)
    faces = np.frombuffer(blob, dtype=np.uint32, offset=4 + nv * 12)
    return {
        "vertices": vertices.reshape(nv, 3),
        "faces": faces.reshape(-1, 3),
    }


# ---- interchange formats (reference mesh.py:208-314) -------------------

def to_obj(vertices: np.ndarray, faces: np.ndarray) -> bytes:
    """Wavefront OBJ export, matching the reference's layout exactly
    (``mesh.py:278-284``): ``v %.5f %.5f %.5f`` lines then 1-indexed
    ``f a b c`` lines, newline-terminated, utf-8."""
    vertices = np.asarray(vertices, dtype=np.float32).reshape(-1, 3)
    faces = np.asarray(faces, dtype=np.int64).reshape(-1, 3)
    objdata = []
    objdata += [
        "v {:.5f} {:.5f} {:.5f}".format(*vertex) for vertex in vertices
    ]
    objdata += ["f {} {} {}".format(*face) for face in (faces + 1)]
    return ("\n".join(objdata) + "\n").encode("utf8")


def from_obj(data) -> dict:
    """OBJ import (reference ``mesh.py:222-275``): supports plain
    ``f a b c`` and ``f a/t/n ...`` face syntax; returns 0-indexed
    faces."""
    import re
    if isinstance(data, bytes):
        data = data.decode("utf8")
    vertices, faces = [], []
    # every legal OBJ face-vertex form: v, v/vt, v//vn, v/vt/vn —
    # the position index is group 1/3/5; the old two-slash-only regex
    # returned None (AttributeError) on the common 'f 1/1 2/2 3/3'
    face_cplx = re.compile(
        r"f\s+(\d+)(?:/\d*(?:/\d+)?)?"
        r"\s+(\d+)(?:/\d*(?:/\d+)?)?"
        r"\s+(\d+)(?:/\d*(?:/\d+)?)?"
    )
    face_simple = re.compile(r"f\s+(\d+)\s+(\d+)\s+(\d+)")
    vertex_re = re.compile(r"v\s+([-\d\.e]+)\s+([-\d\.e]+)\s+([-\d\.e]+)")
    for line in data.split("\n"):
        line = line.strip()
        if not line or line[0] == "#":
            continue
        if line[0] == "f":
            if "/" in line:
                m = face_cplx.match(line)
                if m is None:
                    raise ValueError(f"unparseable OBJ face line {line!r}")
                g = m.groups()
                faces.append((int(g[0]), int(g[1]), int(g[2])))
            else:
                g = face_simple.match(line).groups()
                faces.append((int(g[0]), int(g[1]), int(g[2])))
        elif line[0] == "v" and line[1] not in ("t", "n"):
            g = vertex_re.match(line).groups()
            vertices.append(tuple(float(x) for x in g))
    return {
        "vertices": np.array(vertices, dtype=np.float32).reshape(-1, 3),
        "faces": (np.array(faces, dtype=np.int64) - 1)
        .astype(np.uint32).reshape(-1, 3),
    }


def to_ply(vertices: np.ndarray, faces: np.ndarray) -> bytes:
    """Binary little-endian PLY export, byte-identical to the
    reference's layout (``mesh.py:286-314``): ascii header, float32
    vertex triples, then int32 faces each prefixed by a count of 3."""
    vertices = np.asarray(vertices, dtype=np.float32).reshape(-1, 3)
    faces = np.asarray(faces, dtype=np.int32).reshape(-1, 3)
    header = (
        "ply\n"
        "format binary_little_endian 1.0\n"
        f"element vertex {len(vertices)}\n"
        "property float x\n"
        "property float y\n"
        "property float z\n"
        f"element face {len(faces)}\n"
        "property list int int vertex_indices\n"
        "end_header\n"
    )
    plydata = bytearray(header.encode("utf8"))
    plydata.extend(vertices.tobytes("C"))
    plydata.extend(np.insert(faces, 0, 3, axis=1).tobytes("C"))
    return bytes(plydata)


def consolidate(vertices: np.ndarray, faces: np.ndarray) -> tuple:
    """Exact-duplicate vertex dedup + face reindex (mesh.py:148-172)."""
    uniq, inverse = np.unique(vertices, axis=0, return_inverse=True)
    new_faces = inverse[faces.reshape(-1)].reshape(-1, 3).astype(np.uint32)
    return uniq, new_faces


def deduplicate_chunk_boundaries(
    vertices: np.ndarray,
    faces: np.ndarray,
    chunk_size,
    offset=(0, 0, 0),
) -> tuple:
    """Fuse the crack vertices per-chunk meshing leaves behind: a
    vertex is merged only when it (a) lies exactly on a chunk boundary
    plane and (b) occurs exactly twice — once from each side (reference
    ``mesh.py:379-419``, non-draco path; the draco-grid variant needs
    the absent draco codec and stays gated). Interior duplicates, e.g.
    intentional seams, are preserved."""
    vertices = np.asarray(vertices, dtype=np.float32).reshape(-1, 3)
    faces = np.asarray(faces).reshape(-1, 3)
    if len(vertices) == 0:
        return vertices, faces.astype(np.uint32)

    rel = vertices - np.asarray(offset, dtype=np.float32)
    on_boundary = np.any(np.mod(rel, np.asarray(chunk_size)) == 0, axis=1)
    _, inverse, counts = np.unique(
        vertices, axis=0, return_inverse=True, return_counts=True
    )
    merge = (counts[inverse] == 2) & on_boundary

    # 4th column: a unique serial keeps non-merged rows distinct under
    # np.unique; merged pairs share (x, y, z, -1) and collapse
    keyed = np.hstack([vertices, np.arange(len(vertices))[:, None]])
    keyed[merge, 3] = -1.0
    new_keyed, new_faces = np.unique(
        keyed[faces.ravel()], axis=0, return_inverse=True
    )
    return (
        new_keyed[:, :3].astype(np.float32),
        new_faces.astype(np.uint32).reshape(-1, 3),
    )


MESH_SCHEMA = StructType([
    StructField("segid", LongType(), False),
    StructField("vertices", ArrayType(ArrayType(FloatType())), False),
    StructField("faces", ArrayType(ArrayType(IntegerType())), False),
])


class MeshLayer:
    def __init__(self, spark: SparkSession, base_path: str,
                 check_writable=None):
        self.spark = spark
        self.base_path = base_path
        # writability guard inherited from the owning Volume handle so
        # a read-only / time-travel-pinned volume's mesh layer refuses
        # writes too (reference ReadOnlyException covers sibling layers)
        self._check_writable = check_writable or (lambda: None)

    @property
    def data_path(self) -> str:
        return os.path.join(self.base_path, "mesh_fragments")

    def write(self, df: DataFrame, mode: str = "overwrite") -> None:
        self._check_writable()
        df.repartition("segid").write.mode(mode).parquet(self.data_path)

    def df(self) -> DataFrame:
        return self.spark.read.parquet(self.data_path)

    def get(self, segids: Iterable[int], fuse: bool = True,
            remove_duplicate_vertices: bool = True,
            boundary_chunk_size=None, boundary_offset=(0, 0, 0)) -> DataFrame:
        """Keyed fetch; ``fuse`` merges fragments per segid with face
        index re-offsetting (mesh.py:130-146) and optional consolidate
        (``remove_duplicate_vertices``). ``boundary_chunk_size`` applies
        the chunk-boundary crack fuse instead (mesh.py:379-419)."""
        frags = self.df().where(F.col("segid").isin([int(s) for s in segids]))
        if not fuse:
            return frags

        dedup = remove_duplicate_vertices and boundary_chunk_size is None
        bcs, boff = boundary_chunk_size, boundary_offset

        def fuse_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
            all_v, all_f, off = [], [], 0
            for r in pdf.sort_values("fragment").itertuples(index=False):
                # Arrow hands nested lists as object arrays of arrays;
                # EMPTY fragments (nv=0 files are legal precomputed
                # content) would crash np.vstack — skip them
                vlist, flist = list(r.vertices), list(r.faces)
                if not vlist:
                    continue
                v = np.vstack(vlist).astype(np.float32)
                f = (np.vstack(flist).astype(np.int64) + off
                     if flist else np.zeros((0, 3), np.int64))
                all_v.append(v)
                all_f.append(f)
                off += len(v)
            v = np.concatenate(all_v) if all_v else np.zeros((0, 3), np.float32)
            f = (
                np.concatenate(all_f).astype(np.uint32)
                if all_f else np.zeros((0, 3), np.uint32)
            )
            if dedup and len(v):
                v, f = consolidate(v, f)
            if bcs is not None and len(v):
                v, f = deduplicate_chunk_boundaries(v, f, bcs, boff)
            return pd.DataFrame({
                "segid": [int(key[0])],
                "vertices": [v.tolist()],
                "faces": [f.astype(np.int64).tolist()],
            })

        return frags.groupBy("segid").applyInPandas(fuse_group, MESH_SCHEMA)

    def save(self, segids, filepath=None, file_format: str = "ply") -> bytes:
        """Export one-or-more segids as a single obj/ply/precomputed
        file (reference ``mesh/unsharded.py:284-340`` save semantics:
        fuse + dedup, segids concatenated into one mesh, default
        filename ``{first}.{fmt}`` or ``{first}_{last}.{fmt}``).
        Returns the encoded bytes; writes them when ``filepath`` (path
        or file-like) is given."""
        segids = [int(s) for s in (
            [segids] if np.isscalar(segids) else segids
        )]
        rows = sorted(self.get(segids).collect(), key=lambda r: r.segid)
        all_v, all_f, off = [], [], 0
        for r in rows:
            v = np.array(r.vertices, dtype=np.float32).reshape(-1, 3)
            f = np.array(r.faces, dtype=np.int64).reshape(-1, 3) + off
            all_v.append(v)
            all_f.append(f)
            off += len(v)
        v = np.concatenate(all_v) if all_v else np.zeros((0, 3), np.float32)
        f = np.concatenate(all_f) if all_f else np.zeros((0, 3), np.int64)

        if file_format == "obj":
            data = to_obj(v, f)
        elif file_format == "ply":
            data = to_ply(v, f)
        elif file_format == "precomputed":
            data = encode_precomputed(v, f.astype(np.uint32))
        else:
            raise NotImplementedError(
                "Only .obj, .ply, and precomputed are currently supported."
            )

        if filepath is not None:
            try:
                filepath.write(data)
            except AttributeError:
                with open(filepath, "wb") as fh:
                    fh.write(data)
        return data

    # ---- relational mesh analytics -----------------------------------

    def surface_stats(self) -> DataFrame:
        """Per-segid vertex/face counts and bbox — catalog-style stats
        the reference cannot produce without downloading every mesh."""
        df = self.df()
        verts = df.select("segid", F.explode("vertices").alias("v"))
        counts = df.groupBy("segid").agg(
            F.sum(F.size("vertices")).alias("n_vertices"),
            F.sum(F.size("faces")).alias("n_faces"),
        )
        bbox = verts.groupBy("segid").agg(
            F.min(F.col("v")[0]).alias("x0"), F.max(F.col("v")[0]).alias("x1"),
            F.min(F.col("v")[1]).alias("y0"), F.max(F.col("v")[1]).alias("y1"),
            F.min(F.col("v")[2]).alias("z0"), F.max(F.col("v")[2]).alias("z1"),
        )
        return counts.join(bbox, "segid")

    # ---- interop ------------------------------------------------------

    def export_precomputed(self, out_dir: str) -> int:
        """Legacy unsharded layout: ``{segid}:0`` manifest +
        ``{segid}:0:{frag}`` fragment files (mesh/unsharded.py:219)."""
        os.makedirs(out_dir, exist_ok=True)
        n = 0
        frag_names: dict = {}
        for r in self.df().toLocalIterator():
            frag = frag_names.get(r.segid, 0)
            frag_names[r.segid] = frag + 1
            name = f"{r.segid}:0:{frag}"
            blob = encode_precomputed(
                np.array(r.vertices, dtype=np.float32),
                np.array(r.faces, dtype=np.uint32),
            )
            with open(os.path.join(out_dir, name), "wb") as f:
                f.write(blob)
            n += 1
        for segid, nfrag in frag_names.items():
            manifest = {"fragments": [f"{segid}:0:{i}" for i in range(nfrag)]}
            with open(os.path.join(out_dir, f"{segid}:0"), "w") as f:
                f.write(json.dumps(manifest))
        return n

    def import_precomputed(self, src_dir: str) -> None:
        """Ingest a foreign legacy mesh directory. Handles the real
        on-disk variations the reference's own fixtures exhibit
        (``test/test_cv/mesh_mip_2_err_40_sv16``): values stored
        verbatim or as ``<name>.gz``, and graphene-style layers where
        fragment files are themselves named ``<supervoxel>:0`` — a
        name alone cannot distinguish manifest from fragment, so each
        ``:0`` file is sniffed (JSON object → manifest). Manifests
        list their fragments; executors decode fragment binaries in
        parallel via mapInPandas."""
        import gzip as _gzip

        def read_value(name: str):
            p = os.path.join(src_dir, name)
            if os.path.exists(p):
                with open(p, "rb") as f:
                    data = f.read()
                return (
                    _gzip.decompress(data)
                    if data[:2] == b"\x1f\x8b" else data
                )
            if os.path.exists(p + ".gz"):
                with open(p + ".gz", "rb") as f:
                    return _gzip.decompress(f.read())
            return None

        manifests = []  # (segid, [fragment names])
        for name in sorted(os.listdir(src_dir)):
            base = name[:-3] if name.endswith(".gz") else name
            if base.count(":") != 1 or not base.endswith(":0"):
                continue
            blob = read_value(base)
            if blob is None or not blob.lstrip()[:1] == b"{":
                continue
            try:
                manifest = json.loads(blob)
            except ValueError:
                continue
            if "fragments" not in manifest:
                continue
            manifests.append((int(base.split(":")[0]),
                              list(manifest["fragments"])))

        work = [
            (segid, i, frag)
            for segid, frags in manifests
            for i, frag in enumerate(frags)
        ]
        schema = (
            "segid long, fragment int, vertices array<array<float>>, "
            "faces array<array<int>>"
        )

        def decode_frags(batches):
            for pdf in batches:
                rows = []
                for r in pdf.itertuples(index=False):
                    blob = read_value(r.frag)
                    if blob is None:
                        raise FileNotFoundError(
                            f"fragment {r.frag} missing under {src_dir}"
                        )
                    d = decode_precomputed(blob)
                    rows.append((
                        int(r.segid), int(r.fragment),
                        [[float(x) for x in v] for v in d["vertices"]],
                        [[int(x) for x in fc] for fc in d["faces"]],
                    ))
                if rows:
                    yield pd.DataFrame(
                        rows,
                        columns=["segid", "fragment", "vertices", "faces"],
                    )

        work_df = self.spark.createDataFrame(
            work, "segid long, fragment int, frag string"
        )
        if len(work) > 1:
            work_df = work_df.repartition(min(len(work), 64))
        self.write(work_df.mapInPandas(decode_frags, schema=schema))
