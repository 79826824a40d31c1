"""Skeletons as keyed tables with a Precomputed binary codec.

Reference model (``datasource/precomputed/skeleton/unsharded.py:48``,
``sharded.py:38``; format doc in the Neuroglancer spec): per-segid
graph of vertices (float32 xyz), edges (uint32 pairs), plus per-vertex
attributes (radius float32, vertex_type uint8 by convention).

Spark model:

    skeletons(segid LONG,
              vertices ARRAY<ARRAY<FLOAT>>,   -- [ [x,y,z], ... ]
              edges ARRAY<ARRAY<INT>>,        -- [ [a,b], ... ]
              radii ARRAY<FLOAT>,
              vertex_types ARRAY<INT>)

- keyed fetch   → ``WHERE segid IN (...)``
- physical-space transform (the reference's 4×4 matrix apply) →
  JVM-side ``transform()`` over the vertices column
- cable length  → relational reduction over edges (beyond-reference
  analytics the keyed files can't answer without a full scan)
- import/export → :func:`encode_precomputed` / :func:`decode_precomputed`
  byte-compatible with the unsharded skeleton files
"""

from __future__ import annotations

import os
import struct
from typing import Iterable, Optional, Sequence

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F


# ---- Precomputed binary codec -----------------------------------------

def encode_precomputed(
    vertices: np.ndarray,
    edges: np.ndarray,
    radii: Optional[np.ndarray] = None,
    vertex_types: Optional[np.ndarray] = None,
) -> bytes:
    """Neuroglancer skeleton binary: nv uint32, ne uint32, vertices
    float32[nv,3], edges uint32[ne,2], then vertex attributes in
    declaration order (radius float32, vertex_type uint8)."""
    vertices = np.asarray(vertices, dtype=np.float32).reshape(-1, 3)
    edges = np.asarray(edges, dtype=np.uint32).reshape(-1, 2)
    nv, ne = len(vertices), len(edges)
    parts = [struct.pack("<II", nv, ne), vertices.tobytes(), edges.tobytes()]
    if radii is None and vertex_types is not None:
        # the attribute layout is positional (radius THEN vertex_type):
        # emitting vertex_types without radii would make the decoder
        # read nv uint8 bytes as float32 radii and crash/corrupt —
        # encode a zero radius run to keep the layout parseable
        radii = np.zeros(nv, dtype=np.float32)
    if radii is not None:
        parts.append(np.asarray(radii, dtype=np.float32).reshape(nv).tobytes())
    if vertex_types is not None:
        parts.append(np.asarray(vertex_types, dtype=np.uint8).reshape(nv).tobytes())
    return b"".join(parts)


def decode_precomputed(
    blob: bytes, has_radii: bool = True, has_vertex_types: bool = True
) -> dict:
    nv, ne = struct.unpack("<II", blob[:8])
    off = 8
    vertices = np.frombuffer(blob, dtype=np.float32, count=nv * 3, offset=off)
    vertices = vertices.reshape(nv, 3)
    off += nv * 12
    edges = np.frombuffer(blob, dtype=np.uint32, count=ne * 2, offset=off)
    edges = edges.reshape(ne, 2)
    off += ne * 8
    radii = None
    vertex_types = None
    if has_radii and off < len(blob):
        radii = np.frombuffer(blob, dtype=np.float32, count=nv, offset=off)
        off += nv * 4
    if has_vertex_types and off < len(blob):
        vertex_types = np.frombuffer(blob, dtype=np.uint8, count=nv, offset=off)
    return {
        "vertices": vertices, "edges": edges,
        "radii": radii, "vertex_types": vertex_types,
    }


# ---- SWC interchange (public format: id type x y z radius parent) -----

def to_swc(vertices, edges, radii=None, vertex_types=None,
           offset=(0, 0, 0)) -> str:
    """Standard SWC text: one ``id type x y z radius parent`` line per
    vertex, ids 1-based in traversal order, root parent = -1. The
    edge graph becomes a parent tree by BFS from the lowest-index
    vertex of each connected component (the interchange surface the
    reference exposes through its skeleton object's ``to_swc``)."""
    vertices = np.asarray(vertices, dtype=np.float64).reshape(-1, 3)
    edges = np.asarray(edges, dtype=np.int64).reshape(-1, 2)
    n = len(vertices)
    radii = (
        np.asarray(radii, dtype=np.float64).reshape(n)
        if radii is not None else np.full(n, 1.0)
    )
    vertex_types = (
        np.asarray(vertex_types, dtype=np.int64).reshape(n)
        if vertex_types is not None else np.zeros(n, dtype=np.int64)
    )
    adj: list = [[] for _ in range(n)]
    for a, b in edges:
        adj[a].append(int(b))
        adj[b].append(int(a))

    order: list = []          # traversal order of vertex indices
    parent = np.full(n, -1, dtype=np.int64)  # parent VERTEX index
    seen = np.zeros(n, dtype=bool)
    for root in range(n):
        if seen[root]:
            continue
        seen[root] = True
        queue = [root]
        while queue:
            cur = queue.pop(0)
            order.append(cur)
            for nxt in sorted(adj[cur]):
                if not seen[nxt]:
                    seen[nxt] = True
                    parent[nxt] = cur
                    queue.append(nxt)

    swc_id = np.zeros(n, dtype=np.int64)  # vertex index → 1-based swc id
    for i, vi in enumerate(order):
        swc_id[vi] = i + 1
    ox, oy, oz = (float(o) for o in offset)
    lines = ["# id type x y z radius parent"]
    for vi in order:
        p = -1 if parent[vi] < 0 else int(swc_id[parent[vi]])
        x, y, z = vertices[vi]
        lines.append(
            f"{int(swc_id[vi])} {int(vertex_types[vi])} "
            f"{x + ox:.6f} {y + oy:.6f} {z + oz:.6f} "
            f"{radii[vi]:.6f} {p}"
        )
    return "\n".join(lines) + "\n"


def from_swc(text) -> dict:
    """SWC text → vertices/edges/radii/vertex_types arrays (0-indexed
    edges; vertex order = line order)."""
    if isinstance(text, bytes):
        text = text.decode("utf8")
    ids, rows = [], []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split()
        ids.append(int(parts[0]))
        rows.append((
            int(parts[1]), float(parts[2]), float(parts[3]),
            float(parts[4]), float(parts[5]), int(parts[6]),
        ))
    index = {sid: i for i, sid in enumerate(ids)}
    vertices = np.array([[r[1], r[2], r[3]] for r in rows], dtype=np.float32)
    radii = np.array([r[4] for r in rows], dtype=np.float32)
    vertex_types = np.array([r[0] for r in rows], dtype=np.uint8)
    edges = np.array(
        [
            sorted((index[sid], index[r[5]]))
            for sid, r in zip(ids, rows) if r[5] != -1
        ],
        dtype=np.uint32,
    ).reshape(-1, 2)
    return {
        "vertices": vertices.reshape(-1, 3), "edges": edges,
        "radii": radii, "vertex_types": vertex_types,
    }


# ---- layer ------------------------------------------------------------

class SkeletonLayer:
    def __init__(self, spark: SparkSession, base_path: str,
                 transform: Optional[Sequence[float]] = None,
                 check_writable=None):
        self.spark = spark
        self.base_path = base_path
        # writability guard inherited from the owning Volume handle so
        # a read-only / time-travel-pinned volume's skeleton layer
        # refuses writes too (ReadOnlyException covers sibling layers)
        self._check_writable = check_writable or (lambda: None)
        # 3x4 row-major voxel→physical transform (reference skeleton
        # metadata transform field); identity by default
        self.transform = list(transform) if transform is not None else [
            1, 0, 0, 0,
            0, 1, 0, 0,
            0, 0, 1, 0,
        ]

    @property
    def data_path(self) -> str:
        return os.path.join(self.base_path, "skeletons")

    def write(self, df: DataFrame, mode: str = "overwrite") -> None:
        """Bucketing analog: repartition by segid hash so keyed fetches
        and joins co-locate."""
        self._check_writable()
        df.repartition("segid").sortWithinPartitions("segid").write.mode(
            mode
        ).parquet(self.data_path)

    def df(self) -> DataFrame:
        return self.spark.read.parquet(self.data_path)

    def get(self, segids: Iterable[int], physical: bool = False) -> DataFrame:
        """Keyed fetch (reference ``skeleton/unsharded.py:48-107``);
        ``physical=True`` applies the layer transform to vertices —
        JVM-side arithmetic over the array column, no UDF."""
        out = self.df().where(F.col("segid").isin([int(s) for s in segids]))
        if physical:
            out = self.apply_transform(out)
        return out

    def apply_transform(self, df: DataFrame) -> DataFrame:
        t = [float(v) for v in self.transform]
        return df.withColumn(
            "vertices",
            F.transform(
                "vertices",
                lambda v: F.array(
                    t[0] * v[0] + t[1] * v[1] + t[2] * v[2] + t[3],
                    t[4] * v[0] + t[5] * v[1] + t[6] * v[2] + t[7],
                    t[8] * v[0] + t[9] * v[1] + t[10] * v[2] + t[11],
                ).cast("array<float>"),
            ),
        )

    # ---- analytics (beyond-reference, relational) ---------------------

    def cable_length(self) -> DataFrame:
        """Per-skeleton cable length: sum of edge euclidean lengths —
        a groupBy over exploded edges, fully distributed."""
        df = self.df()
        edges = df.select(
            "segid", "vertices", F.explode("edges").alias("e")
        ).select(
            "segid",
            F.element_at("vertices", F.col("e")[0] + 1).alias("va"),
            F.element_at("vertices", F.col("e")[1] + 1).alias("vb"),
        )
        dist = F.sqrt(
            (F.col("va")[0] - F.col("vb")[0]) ** 2
            + (F.col("va")[1] - F.col("vb")[1]) ** 2
            + (F.col("va")[2] - F.col("vb")[2]) ** 2
        )
        return edges.groupBy("segid").agg(
            F.round(F.sum(dist), 4).alias("cable_length"),
            F.count(F.lit(1)).alias("n_edges"),
        )

    def vertex_bboxes(self) -> DataFrame:
        """Per-segid spatial envelope — feeds the spatial index table."""
        df = self.df()
        verts = df.select("segid", F.explode("vertices").alias("v"))
        return verts.groupBy("segid").agg(
            F.min(F.col("v")[0]).alias("x0"), F.max(F.col("v")[0]).alias("x1"),
            F.min(F.col("v")[1]).alias("y0"), F.max(F.col("v")[1]).alias("y1"),
            F.min(F.col("v")[2]).alias("z0"), F.max(F.col("v")[2]).alias("z1"),
        )

    # ---- interop ------------------------------------------------------

    def export_precomputed(self, out_dir: str) -> int:
        """One ``{segid}`` binary file per skeleton (unsharded layout,
        reference ``skeleton/unsharded.py:110-136``). Driver-side loop —
        export is an interop utility, not a hot path."""
        os.makedirs(out_dir, exist_ok=True)
        n = 0
        for r in self.df().toLocalIterator():
            blob = encode_precomputed(
                np.array(r.vertices, dtype=np.float32),
                np.array(r.edges, dtype=np.uint32),
                np.array(r.radii, dtype=np.float32) if r.radii else None,
                np.array(r.vertex_types, dtype=np.uint8) if r.vertex_types else None,
            )
            with open(os.path.join(out_dir, str(r.segid)), "wb") as f:
                f.write(blob)
            n += 1
        return n

    def save_swc(self, segid: int, filepath=None,
                 physical: bool = False) -> str:
        """Export one skeleton as SWC text (optionally in physical
        space via the layer transform)."""
        rows = self.get([int(segid)], physical=physical).collect()
        if not rows:
            raise KeyError(f"no skeleton for segid {segid}")
        r = rows[0]
        text = to_swc(
            np.array(r.vertices, dtype=np.float64),
            np.array(r.edges, dtype=np.int64).reshape(-1, 2),
            np.array(r.radii, dtype=np.float64) if r.radii else None,
            np.array(r.vertex_types, dtype=np.int64)
            if r.vertex_types else None,
        )
        if filepath is not None:
            try:
                filepath.write(text)
            except AttributeError:
                with open(filepath, "w") as f:
                    f.write(text)
        return text

    def export_sharded(self, out_dir: str, spec=None) -> int:
        """Sharded skeleton archive (reference
        ``skeleton/sharded.py:22-106``): segids murmur-hashed into
        ``.shard`` files; an ``info`` JSON carries the sharding spec,
        transform, and vertex-attribute declarations. One
        ``applyInPandas`` group per shard synthesizes its file —
        shard-parallel like the image path
        (:func:`precomputed_io.export_sharded`). Returns shard count."""
        import json

        import pandas as pd

        from cloud_volume_spark.sharding import (
            ShardingSpecification, synthesize_shard_file,
        )

        if spec is None:
            spec = ShardingSpecification(
                preshift_bits=0, hash="murmurhash3_x86_128",
                minishard_bits=3, shard_bits=4,
                minishard_index_encoding="gzip", data_encoding="gzip",
            )
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "info"), "w") as f:
            json.dump({
                "@type": "neuroglancer_skeletons",
                "transform": [float(v) for v in self.transform],
                "vertex_attributes": [
                    {"id": "radius", "data_type": "float32",
                     "num_components": 1},
                    {"id": "vertex_types", "data_type": "uint8",
                     "num_components": 1},
                ],
                "sharding": spec.to_dict(),
            }, f, indent=2)

        spec_dict = spec.to_dict()

        def shard_no_of(segid: int) -> str:
            return spec.compute_shard_location(segid)[0]

        shard_udf = F.udf(shard_no_of, "string")

        def write_shard(keyvals, pdf):
            sp = ShardingSpecification.from_dict(spec_dict)
            group = {}
            for r in pdf.itertuples(index=False):
                # arrow hands array<array<float>> to pandas as an
                # object array of per-row arrays — stack, don't cast
                group[int(r.segid)] = encode_precomputed(
                    np.stack([
                        np.asarray(v, dtype=np.float32) for v in r.vertices
                    ]) if len(r.vertices) else
                    np.zeros((0, 3), dtype=np.float32),
                    np.stack([
                        np.asarray(e, dtype=np.uint32) for e in r.edges
                    ]) if len(r.edges) else
                    np.zeros((0, 2), dtype=np.uint32),
                    np.asarray(r.radii, dtype=np.float32)
                    if r.radii is not None else None,
                    np.asarray(r.vertex_types, dtype=np.uint8)
                    if r.vertex_types is not None else None,
                )
            blob = synthesize_shard_file(sp, group)
            shard_no = str(keyvals[0])
            with open(os.path.join(out_dir, f"{shard_no}.shard"), "wb") as f:
                f.write(blob)
            return pd.DataFrame(
                {"shard": [shard_no], "n": [len(group)]}
            )

        counts = (
            self.df()
            .withColumn("shard_no", shard_udf("segid"))
            .groupBy("shard_no")
            .applyInPandas(write_shard, schema="shard string, n long")
            .collect()
        )
        return len(counts)

    def import_sharded(self, src_dir: str) -> None:
        """Read a sharded skeleton archive back into the table
        (reference ``skeleton/sharded.py``: spec from the layer info,
        label→shard via the murmur hash, 3-level index walk). Shard
        files parse in parallel — one executor task per ``.shard``."""
        import json

        import pandas as pd

        from cloud_volume_spark.sharding import (
            ShardFileReader, ShardingSpecification,
        )

        with open(os.path.join(src_dir, "info")) as f:
            info = json.load(f)
        spec_dict = info["sharding"]
        # the attribute layout below is positional (radius float32,
        # vertex_type uint8) — an archive declaring anything else would
        # be silently misparsed (uint8 bytes read as float32 radii),
        # so refuse loudly instead
        attrs = info.get("vertex_attributes")
        if attrs is not None:
            declared = [
                (a.get("id"), a.get("data_type"),
                 int(a.get("num_components", 1)))
                for a in attrs
            ]
            expected = [("radius", "float32", 1),
                        ("vertex_types", "uint8", 1)]
            # decode_precomputed already handles archives carrying only
            # radius, or neither attribute (its off<len probes) — any
            # PREFIX of the expected layout is valid; only a layout
            # with different ids/dtypes/order would be misparsed
            if declared != expected[:len(declared)]:
                raise ValueError(
                    f"unsupported skeleton vertex_attributes {declared} "
                    f"— this importer decodes a prefix of {expected}; "
                    "other layouts would be silently misparsed")
        if info.get("transform"):
            self.transform = [float(v) for v in info["transform"]]
        paths = sorted(
            os.path.join(src_dir, p) for p in os.listdir(src_dir)
            if p.endswith(".shard")
        )
        files_df = self.spark.createDataFrame(
            [(p,) for p in paths], schema="path string"
        ).repartition(max(1, min(len(paths), 64)))

        schema = (
            "segid long, vertices array<array<float>>, "
            "edges array<array<int>>, radii array<float>, "
            "vertex_types array<int>"
        )

        def read_shards(batches):
            sp = ShardingSpecification.from_dict(spec_dict)
            for pdf in batches:
                rows = []
                for r in pdf.itertuples(index=False):
                    with open(r.path, "rb") as f:
                        reader = ShardFileReader(sp, f.read())
                    for segid, blob in reader.items():
                        d = decode_precomputed(blob)
                        rows.append((
                            int(segid),
                            [[float(x) for x in v] for v in d["vertices"]],
                            [[int(a) for a in e] for e in d["edges"]],
                            [float(x) for x in d["radii"]]
                            if d["radii"] is not None else None,
                            [int(x) for x in d["vertex_types"]]
                            if d["vertex_types"] is not None else None,
                        ))
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "segid", "vertices", "edges", "radii",
                        "vertex_types",
                    ],
                )

        self.write(files_df.mapInPandas(read_shards, schema=schema))

    def import_precomputed(self, src_dir: str) -> None:
        """Read unsharded skeleton files back into the table."""
        import gzip as _gzip

        rows = []
        for name in sorted(os.listdir(src_dir)):
            # values may be stored verbatim ('123') or gzipped
            # ('123.gz', the CloudFiles local convention the mesh
            # importer already handles) — skipping .gz silently
            # imported such directories as EMPTY tables
            stem = name[:-3] if name.endswith(".gz") else name
            if not stem.isdigit():
                continue
            with open(os.path.join(src_dir, name), "rb") as f:
                blob = f.read()
            if name.endswith(".gz"):
                blob = _gzip.decompress(blob)
            d = decode_precomputed(blob)
            rows.append((
                int(stem),
                [[float(x) for x in v] for v in d["vertices"]],
                [[int(a) for a in e] for e in d["edges"]],
                [float(x) for x in d["radii"]] if d["radii"] is not None else None,
                [int(x) for x in d["vertex_types"]]
                if d["vertex_types"] is not None else None,
            ))
        schema = (
            "segid long, vertices array<array<float>>, edges array<array<int>>, "
            "radii array<float>, vertex_types array<int>"
        )
        self.write(self.spark.createDataFrame(rows, schema=schema))
