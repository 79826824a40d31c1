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


_U64 = 1 << 64


def _to_signed64(v: int) -> int:
    """uint64 value → the signed-BIGINT bit pattern Spark stores."""
    v = int(v) & (_U64 - 1)
    return v - _U64 if v >= (1 << 63) else v


def _to_unsigned64(v: int) -> int:
    """signed-BIGINT bit pattern → the uint64 value it represents."""
    return int(v) & (_U64 - 1)


class GrapheneLabelCodec:
    """Bit-field label codec (reference graphene/metadata.py:183-346):
    uint64 = [layer: layer_bits][x|y|z: ct bits each][segid: rest],
    packed from bit 64 down — ``layer`` occupies the TOP bits exactly
    as ``encode_label`` does (``layer_offset = 64 - n_bits_for_layer_id``).

    The spatial bit count ``ct`` is per-LAYER in the reference
    (``info['graph']['spatial_bit_masks'][level]``); pass
    ``spatial_bits_per_layer={layer: ct}`` for that behaviour, or the
    legacy ``spatial_bits=(bx, by, bz)`` triple for a single fixed
    layout.  Spark BIGINT is the signed bit pattern of the uint64:
    ``pack`` can legitimately produce negative longs (layer values with
    the top bit set), and ``unpack`` uses ``shiftrightunsigned`` so the
    sign bit never smears into the decoded fields.  ``pack_py`` returns
    the true unsigned value; :func:`_to_signed64` converts to the
    BIGINT pattern when comparing against Spark output."""

    def __init__(self, layer_bits: int = 8,
                 spatial_bits: Sequence[int] = (10, 10, 10),
                 spatial_bits_per_layer: Optional[dict] = None):
        self.layer_bits = int(layer_bits)
        if spatial_bits_per_layer is not None:
            self.per_layer = {
                int(k): int(v) for k, v in spatial_bits_per_layer.items()
            }
            if not self.per_layer:
                raise ValueError("spatial_bits_per_layer is empty")
            self.spatial_bits = None
            for layer, ct in self.per_layer.items():
                if 64 - self.layer_bits - 3 * ct <= 0:
                    raise ValueError(
                        f"layer {layer}: 3*{ct} spatial bits + "
                        f"{self.layer_bits} layer bits exceed 64")
        else:
            self.per_layer = None
            self.spatial_bits = tuple(int(b) for b in spatial_bits)
            self.segid_bits = 64 - self.layer_bits - sum(self.spatial_bits)
            if self.segid_bits <= 0:
                raise ValueError("bit budget exceeds 64 bits")

    def _layout(self, layer: int):
        """(o_x, o_y, o_z, bx, by, bz, segid_bits) for a layer value."""
        o_layer = 64 - self.layer_bits
        if self.per_layer is not None:
            if int(layer) not in self.per_layer:
                raise ValueError(
                    f"layer {layer} has no spatial_bit_masks entry")
            ct = self.per_layer[int(layer)]
            bx = by = bz = ct
        else:
            bx, by, bz = self.spatial_bits
        o_x = o_layer - bx
        o_y = o_x - by
        o_z = o_y - bz
        return o_x, o_y, o_z, bx, by, bz, o_z  # segid_bits == o_z

    def pack(self, layer: Column, x: Column, y: Column, z: Column,
             segid: Column) -> Column:
        """Each field is masked to its own bit width BEFORE shifting:
        with addition and no masks, an out-of-range segid/x/y/z would
        silently carry into the adjacent field (segid=2**segid_bits
        decoding as z+1, segid=0). Masking bounds the damage to the
        offending field; the scalar :meth:`pack_py` validates and
        raises instead.  Per-layer layouts branch on the layer VALUE
        (a when-chain over the registered layers — bounded, JVM-side)."""
        o_layer = 64 - self.layer_bits

        def m(col, bits):
            return col.cast("long").bitwiseAND(F.lit((1 << bits) - 1))

        def packed_for(bx, by, bz, segid_bits):
            o_x = o_layer - bx
            o_y = o_x - by
            o_z = o_y - bz
            return (
                F.shiftleft(m(layer, self.layer_bits), o_layer)
                .bitwiseOR(F.shiftleft(m(x, bx), o_x))
                .bitwiseOR(F.shiftleft(m(y, by), o_y))
                .bitwiseOR(F.shiftleft(m(z, bz), o_z))
                .bitwiseOR(m(segid, segid_bits))
            )

        if self.per_layer is None:
            bx, by, bz = self.spatial_bits
            return packed_for(bx, by, bz, self.segid_bits)
        expr = None
        for lv in sorted(self.per_layer):
            ct = self.per_layer[lv]
            branch = packed_for(ct, ct, ct, 64 - self.layer_bits - 3 * ct)
            cond = layer.cast("long") == lv
            expr = F.when(cond, branch) if expr is None else (
                expr.when(cond, branch))
        # NULL layer input propagates NULL (SQL semantics — e.g. the
        # unmatched side of an outer join feeding the codec); a NON-NULL
        # unregistered layer raises like pack_py's ValueError — a NULL
        # label for it would silently drop from downstream equi-joins/
        # groupBys and could be persisted by a write path. concat_ws,
        # not concat: concat would NULL the whole diagnostic if the
        # cast ever returned NULL.
        return (
            F.when(layer.isNull(), F.lit(None).cast("long"))
            .otherwise(expr.otherwise(F.raise_error(F.concat_ws(
                " ", F.lit("graphene pack: unregistered layer"),
                layer.cast("string")))))
        )

    def unpack(self, label: Column) -> dict:
        """Decode with ``shiftrightunsigned`` throughout: labels whose
        layer sets bit 63 are negative BIGINTs and an arithmetic shift
        would sign-extend into every field."""
        o_layer = 64 - self.layer_bits
        mask = lambda bits: (1 << bits) - 1
        layer_col = F.shiftrightunsigned(label, o_layer).bitwiseAND(
            F.lit(mask(self.layer_bits)))

        def fields_for(bx, by, bz, segid_bits):
            o_x = o_layer - bx
            o_y = o_x - by
            o_z = o_y - bz
            return {
                "x": F.shiftrightunsigned(label, o_x).bitwiseAND(
                    F.lit(mask(bx))),
                "y": F.shiftrightunsigned(label, o_y).bitwiseAND(
                    F.lit(mask(by))),
                "z": F.shiftrightunsigned(label, o_z).bitwiseAND(
                    F.lit(mask(bz))),
                "segid": label.bitwiseAND(F.lit(mask(segid_bits))),
            }

        if self.per_layer is None:
            bx, by, bz = self.spatial_bits
            out = fields_for(bx, by, bz, self.segid_bits)
        else:
            out = {}
            for key in ("x", "y", "z", "segid"):
                expr = None
                for lv in sorted(self.per_layer):
                    ct = self.per_layer[lv]
                    branch = fields_for(
                        ct, ct, ct, 64 - self.layer_bits - 3 * ct)[key]
                    cond = layer_col == lv
                    expr = F.when(cond, branch) if expr is None else (
                        expr.when(cond, branch))
                # NULL label propagates NULL fields (SQL semantics); a
                # non-NULL label carrying an unregistered layer is
                # corruption in the DATA: raise like unpack_py (via
                # _layout), don't emit NULL fields
                out[key] = (
                    F.when(label.isNull(), F.lit(None).cast("long"))
                    .otherwise(expr.otherwise(F.raise_error(F.concat_ws(
                        " ",
                        F.lit("graphene unpack: label has unregistered"
                              " layer"), layer_col.cast("string")))))
                )
        out["layer"] = layer_col
        return {k: out[k] for k in ("layer", "x", "y", "z", "segid")}

    def pack_py(self, layer: int, x: int, y: int, z: int, segid: int) -> int:
        o_x, o_y, o_z, bx, by, bz, segid_bits = self._layout(layer)
        fields = (("layer", layer, self.layer_bits), ("x", x, bx),
                  ("y", y, by), ("z", z, bz), ("segid", segid, segid_bits))
        for name, v, bits in fields:
            if not (0 <= int(v) < (1 << bits)):
                raise ValueError(
                    f"{name}={v} out of range for {bits} bits — packing "
                    "would corrupt the adjacent bit-field")
        return (
            (layer << (64 - self.layer_bits))
            | (x << o_x) | (y << o_y) | (z << o_z) | segid
        )

    def unpack_py(self, label: int) -> dict:
        label = _to_unsigned64(label)  # accept the signed bit pattern too
        mask = lambda bits: (1 << bits) - 1
        layer = (label >> (64 - self.layer_bits)) & mask(self.layer_bits)
        o_x, o_y, o_z, bx, by, bz, segid_bits = self._layout(layer)
        return {
            "layer": layer,
            "x": (label >> o_x) & mask(bx),
            "y": (label >> o_y) & mask(by),
            "z": (label >> o_z) & mask(bz),
            "segid": label & mask(segid_bits),
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
        bucketed by supervoxel hash via repartition.  The frame is
        coerced to MAPPING_SCHEMA on the way in — a string valid_from
        would otherwise persist and silently break ``_as_of``'s
        timestamp comparisons on reopen."""
        df = df.select(*[
            F.col(name).cast(typ).alias(name)
            for name, typ in (
                f.split() for f in self.MAPPING_SCHEMA.split(", ")
            )
        ])
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
        # the mapping's root lands in a temp column first: if the input
        # already carries a 'root' (a re-resolve at another timestamp),
        # a bare join would make F.coalesce("root", ...) ambiguous
        m = self._as_of(timestamp).select(
            F.col("supervoxel").alias(col), F.col("root").alias("_new_root")
        )
        out = df.drop("root") if "root" in df.columns else df
        return out.join(m, col, "left").withColumn(
            "root", F.coalesce("_new_root", F.col(col))
        ).drop("_new_root")

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
        # unique() presents uint64 volumes as true-unsigned DECIMAL(20,0)
        # at the API edge; the mapping stores the signed BIGINT bit
        # pattern — normalize back before the join or ids >= 2^63 would
        # silently never resolve (decimal +2^63.. vs negative long)
        if dict(labels_df.dtypes)["label"].startswith("decimal"):
            labels_df = labels_df.select(
                F.expr(
                    "CAST(CASE WHEN label >= 9223372036854775808 "
                    "THEN label - 18446744073709551616 "
                    "ELSE label END AS BIGINT)"
                ).alias("label")
            )
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
