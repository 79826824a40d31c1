"""Graphene-style proofreading-graph semantics on Spark.

The reference's ``graphene://`` frontend talks to an HTTP graph server
that resolves watershed supervoxels ↔ agglomerated roots with
timestamps (``frontends/graphene.py:721`` get_roots, ``:918``
get_leaves, ``:648`` agglomerate_cutout) and packs labels as
``(layer, x, y, z, segid)`` bit-fields
(``datasource/graphene/metadata.py:183-318``).

Spark recasting:
- the graph server becomes an SCD-2 **mapping table**
  ``supervoxel_root(supervoxel, root, valid_from, valid_to)`` —
  proofreading edits close one interval and open another;
- ``get_roots(ts)`` = broadcast as-of join against that table;
- ``get_leaves`` = the inverse groupBy;
- agglomeration of a cutout = distinct labels → broadcast-join remap →
  vectorized dictionary rewrite;
- the label codec is pure Catalyst bit arithmetic — no UDF.

True dynamic proofreading (server-side graph mutation) is out of
scope; snapshots of the mapping table give identical read semantics.
"""

from __future__ import annotations

import os
from typing import Iterable, Optional, Sequence

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from cloud_volume_spark import codecs
from cloud_volume_spark.geometry import Bbox
from cloud_volume_spark.volume import Volume


class GrapheneLabelCodec:
    """Bit-field label codec (reference graphene/metadata.py:183-318):
    uint64 = [layer: layer_bits][x|y|z: spatial_bits each][segid: rest]."""

    def __init__(self, layer_bits: int = 8, spatial_bits: Sequence[int] = (10, 10, 10)):
        self.layer_bits = int(layer_bits)
        self.spatial_bits = tuple(int(b) for b in spatial_bits)
        # segid takes the remainder of 63 bits: the top (sign) bit stays
        # clear so SQL BIGINT bit ops behave like uint64 in the reference
        self.segid_bits = 63 - self.layer_bits - sum(self.spatial_bits)
        if self.segid_bits <= 0:
            raise ValueError("bit budget exceeds 63 (sign-safe) bits")

    # offsets from the top (bit 62 downward; bit 63 = sign stays clear)
    @property
    def _offsets(self):
        o_layer = 63 - self.layer_bits
        o_x = o_layer - self.spatial_bits[0]
        o_y = o_x - self.spatial_bits[1]
        o_z = o_y - self.spatial_bits[2]
        return o_layer, o_x, o_y, o_z

    def pack(self, layer: Column, x: Column, y: Column, z: Column,
             segid: Column) -> Column:
        """Each field is masked to its own bit width BEFORE shifting:
        with addition and no masks, an out-of-range segid/x/y/z would
        silently carry into the adjacent field (segid=2**segid_bits
        decoding as z+1, segid=0). Masking bounds the damage to the
        offending field; the scalar :meth:`pack_py` validates and
        raises instead."""
        o_layer, o_x, o_y, o_z = self._offsets

        def m(col, bits):
            return col.cast("long").bitwiseAND(F.lit((1 << bits) - 1))

        return (
            F.shiftleft(m(layer, self.layer_bits), o_layer)
            .bitwiseOR(F.shiftleft(m(x, self.spatial_bits[0]), o_x))
            .bitwiseOR(F.shiftleft(m(y, self.spatial_bits[1]), o_y))
            .bitwiseOR(F.shiftleft(m(z, self.spatial_bits[2]), o_z))
            .bitwiseOR(m(segid, self.segid_bits))
        )

    def unpack(self, label: Column) -> dict:
        o_layer, o_x, o_y, o_z = self._offsets
        mask = lambda bits: (1 << bits) - 1
        return {
            "layer": F.shiftright(label, o_layer).bitwiseAND(
                F.lit(mask(self.layer_bits))),
            "x": F.shiftright(label, o_x).bitwiseAND(
                F.lit(mask(self.spatial_bits[0]))),
            "y": F.shiftright(label, o_y).bitwiseAND(
                F.lit(mask(self.spatial_bits[1]))),
            "z": F.shiftright(label, o_z).bitwiseAND(
                F.lit(mask(self.spatial_bits[2]))),
            "segid": label.bitwiseAND(F.lit(mask(self.segid_bits))),
        }

    def pack_py(self, layer: int, x: int, y: int, z: int, segid: int) -> int:
        fields = (("layer", layer, self.layer_bits),
                  ("x", x, self.spatial_bits[0]),
                  ("y", y, self.spatial_bits[1]),
                  ("z", z, self.spatial_bits[2]),
                  ("segid", segid, self.segid_bits))
        for name, v, bits in fields:
            if not (0 <= int(v) < (1 << bits)):
                raise ValueError(
                    f"{name}={v} out of range for {bits} bits — packing "
                    "would corrupt the adjacent bit-field")
        o_layer, o_x, o_y, o_z = self._offsets
        return (
            (layer << o_layer) | (x << o_x) | (y << o_y) | (z << o_z) | segid
        )

    def unpack_py(self, label: int) -> dict:
        o_layer, o_x, o_y, o_z = self._offsets
        mask = lambda bits: (1 << bits) - 1
        return {
            "layer": (label >> o_layer) & mask(self.layer_bits),
            "x": (label >> o_x) & mask(self.spatial_bits[0]),
            "y": (label >> o_y) & mask(self.spatial_bits[1]),
            "z": (label >> o_z) & mask(self.spatial_bits[2]),
            "segid": label & mask(self.segid_bits),
        }


class GrapheneLayer:
    """Supervoxel→root resolution over an SCD-2 mapping table."""

    MAPPING_SCHEMA = (
        "supervoxel long, root long, valid_from timestamp, valid_to timestamp"
    )

    def __init__(self, spark: SparkSession, base_path: str):
        from cloud_volume_spark.paths import resolve_cloudpath

        self.spark = spark
        self.base_path = resolve_cloudpath(
            base_path, formats=("graphene", "precomputed"))

    @property
    def mapping_path(self) -> str:
        return os.path.join(self.base_path, "supervoxel_root")

    def write_mapping(self, df: DataFrame, mode: str = "overwrite") -> None:
        """``valid_to`` NULL = current version. Partition-friendly:
        bucketed by supervoxel hash via repartition."""
        df.repartition("supervoxel").write.mode(mode).parquet(self.mapping_path)

    def mapping_df(self) -> DataFrame:
        return self.spark.read.parquet(self.mapping_path)

    def _as_of(self, timestamp: Optional[str]) -> DataFrame:
        m = self.mapping_df()
        if timestamp is None:
            return m.where(F.col("valid_to").isNull())
        ts = F.lit(timestamp).cast("timestamp")
        return m.where(
            (F.col("valid_from") <= ts)
            & (F.col("valid_to").isNull() | (F.col("valid_to") > ts))
        )

    # ---- get_roots (frontends/graphene.py:721-916) --------------------

    def get_roots(self, supervoxels: Iterable[int],
                  timestamp: Optional[str] = None) -> DataFrame:
        """Batch supervoxel→root resolution at a timestamp — the HTTP
        batch call becomes one broadcast join."""
        svs = [int(s) for s in supervoxels]
        sv_df = self.spark.createDataFrame(
            [(s,) for s in svs], schema="supervoxel long"
        )
        # Spark cannot BUILD the left side of a left-outer join, so a
        # broadcast hint on sv_df is silently dropped and the whole
        # mapping shuffles. Instead: isin-filter the mapping (predicate
        # pushdown; at most len(svs) rows survive) and broadcast THAT
        # as the right side — plannable, one scan, no shuffle. Very
        # large batches skip the isin expression and let AQE plan it.
        mapping = self._as_of(timestamp)
        if len(svs) <= 100_000:
            matches = F.broadcast(
                mapping.where(F.col("supervoxel").isin(svs)))
        else:
            matches = mapping
        return (
            sv_df.join(matches, "supervoxel", "left")
            .select(
                "supervoxel",
                F.coalesce("root", "supervoxel").alias("root"),
            )
        )

    def resolve_column(self, df: DataFrame, col: str,
                       timestamp: Optional[str] = None) -> DataFrame:
        """Resolve an arbitrary label column through the mapping —
        the scale path (mapping broadcast if small, shuffle join if not;
        left to Catalyst/AQE)."""
        m = self._as_of(timestamp).select(
            F.col("supervoxel").alias(col), F.col("root")
        )
        return df.join(m, col, "left").withColumn(
            "root", F.coalesce("root", F.col(col))
        )

    # ---- get_leaves (frontends/graphene.py:918-980) -------------------

    def get_leaves(self, root: int, timestamp: Optional[str] = None) -> DataFrame:
        return (
            self._as_of(timestamp)
            .where(F.col("root") == int(root))
            .select("supervoxel")
        )

    def roots_histogram(self, timestamp: Optional[str] = None) -> DataFrame:
        """Supervoxel count per root — proofreading QA metric."""
        return self._as_of(timestamp).groupBy("root").agg(
            F.count(F.lit(1)).alias("n_supervoxels")
        )

    # ---- agglomerate (frontends/graphene.py:648-688) ------------------

    def agglomerate_cutout(self, vol: Volume, bbox: Bbox, mip: int = 0,
                           timestamp: Optional[str] = None) -> np.ndarray:
        """Cutout with labels resolved to roots: distinct labels in the
        region (stats-column fast path) → as-of join → dictionary remap
        of the assembled array."""
        labels_df = vol.unique(bbox, mip=mip)
        mapping_rows = (
            labels_df.join(
                self._as_of(timestamp).withColumnRenamed("supervoxel", "label"),
                "label", "inner",
            )
            .select("label", "root")
            .collect()
        )
        mapping = {int(r.label): int(r.root) for r in mapping_rows}
        out = vol.cutout(bbox, mip=mip)
        return codecs.remap_array(out, mapping)

    def mask_by_root(self, vol: Volume, bbox: Bbox, root: int, mip: int = 0,
                     timestamp: Optional[str] = None) -> np.ndarray:
        """``label=`` read against a root id: leaves → mask_except
        (reference ``frontends/graphene.py:623-646``)."""
        leaves = [r.supervoxel for r in self.get_leaves(root, timestamp).collect()]
        out = vol.cutout(bbox, mip=mip)
        return codecs.mask_except(out, leaves)
