"""Volumetric operators in relational form, oracle-checkable.

The native volumetric engine (:mod:`cloud_volume_spark.volume`) is
verified against numpy (tests/test_volume.py). This module exposes the
SAME operator semantics — bbox cutout scans, distinct labels, label
envelopes, point lookups, broadcast remaps, existence probes,
downsample reductions, graphene bit-field codecs — over a deterministic
voxel table derived from ``lineitem``, so each operator also runs under
the driver's duckdb-oracle gate (SURVEY.md §2.1/§2.3/§2.4 rows:
unique ``rx.py:898``, label bbox ``spatial_index.py:697``, scattered
points ``frontends/precomputed.py:873``, remap ``chunks.py:395``,
exists ``image/__init__.py:484``, graphene codec
``datasource/graphene/metadata.py:183``).

The derivation: every lineitem row becomes a voxel
``(x, y, z, label) = (l_orderkey%32, l_partkey%32, l_suppkey%16,
l_partkey%97)``; collisions are resolved by MIN(label) where a unique
voxel value is required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cloud_volume_spark.operators.common import load

VOXELS_SQL = """
    SELECT (l_orderkey % 32)::INT AS x,
           (l_partkey % 32)::INT AS y,
           (l_suppkey % 16)::INT AS z,
           (l_partkey % 97)::BIGINT AS label
    FROM lineitem
"""


def _voxels(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        (F.col("l_orderkey") % 32).cast("int").alias("x"),
        (F.col("l_partkey") % 32).cast("int").alias("y"),
        (F.col("l_suppkey") % 16).cast("int").alias("z"),
        (F.col("l_partkey") % 97).cast("long").alias("label"),
    )


# -- unique labels in bbox (reference rx.unique) ---------------------------

def vox_unique_bbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = _voxels(spark, sf_dir)
    return (
        v.where(F.col("x").between(4, 20))
        .where(F.col("y").between(8, 24))
        .where(F.col("z").between(2, 10))
        .select("label")
        .distinct()
    )


VOX_UNIQUE_SQL = f"""
WITH voxels AS ({VOXELS_SQL})
SELECT DISTINCT label FROM voxels
WHERE x BETWEEN 4 AND 20 AND y BETWEEN 8 AND 24 AND z BETWEEN 2 AND 10
"""


# -- per-label bounding envelope (reference spatial_index.get_bbox) --------

def vox_label_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = _voxels(spark, sf_dir)
    return v.groupBy("label").agg(
        F.min("x").alias("x0"), F.max("x").alias("x1"),
        F.min("y").alias("y0"), F.max("y").alias("y1"),
        F.min("z").alias("z0"), F.max("z").alias("z1"),
        F.count(F.lit(1)).alias("n_voxels"),
    )


VOX_ENVELOPE_SQL = f"""
WITH voxels AS ({VOXELS_SQL})
SELECT label,
       MIN(x) AS x0, MAX(x) AS x1,
       MIN(y) AS y0, MAX(y) AS y1,
       MIN(z) AS z0, MAX(z) AS z1,
       COUNT(*) AS n_voxels
FROM voxels GROUP BY label
"""


# -- scattered point lookup (reference download_points) --------------------

_POINTS = [(1, 1, 1), (5, 9, 2), (17, 3, 11), (31, 31, 15), (8, 16, 4)]


def vox_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = _voxels(spark, sf_dir)
    pts = spark.createDataFrame(_POINTS, schema="x int, y int, z int")
    return (
        v.join(F.broadcast(pts), on=["x", "y", "z"], how="inner")
        .groupBy("x", "y", "z")
        .agg(F.min("label").alias("value"))
    )


VOX_POINTS_SQL = f"""
WITH voxels AS ({VOXELS_SQL}),
pts(x, y, z) AS (VALUES {", ".join(str(p) for p in _POINTS)})
SELECT v.x, v.y, v.z, MIN(v.label) AS value
FROM voxels v JOIN pts USING (x, y, z)
GROUP BY v.x, v.y, v.z
"""


# -- broadcast-join label remap (reference chunks.remap / graphene agglomerate)

def vox_remap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary remap through a mapping table (supervoxel→root
    pattern): labels whose (label % 25) matches a nation key < 10 are
    re-rooted to nationkey+1000."""
    v = _voxels(spark, sf_dir)
    nation = load(spark, sf_dir, "nation")
    mapping = nation.where(F.col("n_nationkey") < 10).select(
        F.col("n_nationkey").cast("long").alias("old_label"),
        (F.col("n_nationkey") + 1000).cast("long").alias("new_label"),
    )
    return (
        v.join(
            F.broadcast(mapping),
            (F.col("label") % 25) == F.col("old_label"),
            "left",
        )
        .select(
            F.coalesce("new_label", "label").alias("resolved_label"),
        )
        .groupBy("resolved_label")
        .agg(F.count(F.lit(1)).alias("n_voxels"))
    )


VOX_REMAP_SQL = f"""
WITH voxels AS ({VOXELS_SQL}),
mapping AS (
    SELECT n_nationkey::BIGINT AS old_label,
           (n_nationkey + 1000)::BIGINT AS new_label
    FROM nation WHERE n_nationkey < 10
)
SELECT COALESCE(new_label, label) AS resolved_label,
       COUNT(*) AS n_voxels
FROM voxels LEFT JOIN mapping ON (label % 25) = old_label
GROUP BY COALESCE(new_label, label)
"""


# -- existence probe (reference image exists; anti-join vs generated grid) --

def vox_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which 8x8x8 grid cells of the full 64x64x32 declared grid hold no
    voxels — generated grid anti-joined against observed cells."""
    v = _voxels(spark, sf_dir)
    cells = v.select(
        (F.col("x") / 8).cast("int").alias("gx"),
        (F.col("y") / 8).cast("int").alias("gy"),
        (F.col("z") / 8).cast("int").alias("gz"),
    ).distinct()
    gx = spark.range(8).select(F.col("id").cast("int").alias("gx"))
    gy = spark.range(8).select(F.col("id").cast("int").alias("gy"))
    gz = spark.range(4).select(F.col("id").cast("int").alias("gz"))
    grid = gx.crossJoin(gy).crossJoin(gz)
    return grid.join(cells, on=["gx", "gy", "gz"], how="left_anti")


VOX_EXISTS_SQL = f"""
WITH voxels AS ({VOXELS_SQL}),
cells AS (
    SELECT DISTINCT (x // 8)::INT AS gx, (y // 8)::INT AS gy, (z // 8)::INT AS gz
    FROM voxels
),
grid AS (
    SELECT gx.range::INT AS gx, gy.range::INT AS gy, gz.range::INT AS gz
    FROM range(8) gx, range(8) gy, range(4) gz
)
SELECT g.gx, g.gy, g.gz
FROM grid g LEFT JOIN cells c USING (gx, gy, gz)
WHERE c.gx IS NULL
"""


# -- relational downsample (reference downsample; groupBy reduction) -------

def vox_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = _voxels(spark, sf_dir)
    return (
        v.groupBy(
            (F.col("x") / 2).cast("int").alias("px"),
            (F.col("y") / 2).cast("int").alias("py"),
            F.col("z").alias("pz"),
        )
        .agg(
            F.round(F.avg("label"), 4).alias("mean_label"),
            F.count(F.lit(1)).alias("n_voxels"),
        )
    )


VOX_DOWNSAMPLE_SQL = f"""
WITH voxels AS ({VOXELS_SQL})
SELECT (x // 2)::INT AS px, (y // 2)::INT AS py, z AS pz,
       ROUND(AVG(label), 4) AS mean_label,
       COUNT(*) AS n_voxels
FROM voxels GROUP BY 1, 2, 3
"""


# -- graphene label bit-field codec (reference graphene/metadata.py:183) ---

def graphene_label_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack (layer, x, y, z, segid) bit-fields into a uint64-style id
    and unpack them with pure SQL bit ops — the graphene label codec
    as Catalyst expressions (layer:4 | x:8 | y:8 | z:8 | segid:32)."""
    li = load(spark, sf_dir, "lineitem")
    packed = li.select(
        (
            F.shiftleft((F.col("l_orderkey") % 15) + 1, 56)
            + F.shiftleft(F.col("l_partkey") % 256, 48)
            + F.shiftleft(F.col("l_suppkey") % 256, 40)
            + F.shiftleft((F.col("l_linenumber") % 256).cast("long"), 32)
            + (F.col("l_orderkey") * 7 + F.col("l_partkey")) % 4294967296
        ).alias("packed_id")
    )
    return (
        packed.select(
            "packed_id",
            F.shiftright("packed_id", 56).bitwiseAND(F.lit(15)).alias("layer"),
            F.shiftright("packed_id", 48).bitwiseAND(F.lit(255)).alias("cx"),
            F.shiftright("packed_id", 40).bitwiseAND(F.lit(255)).alias("cy"),
            F.shiftright("packed_id", 32).bitwiseAND(F.lit(255)).alias("cz"),
            F.col("packed_id").bitwiseAND(F.lit(4294967295)).alias("segid"),
        )
        .groupBy("layer")
        .agg(
            F.count(F.lit(1)).alias("n_labels"),
            F.max("cx").alias("max_cx"),
            F.max("cy").alias("max_cy"),
            F.max("cz").alias("max_cz"),
            F.max("segid").alias("max_segid"),
        )
    )


GRAPHENE_SQL = """
WITH packed AS (
    SELECT ((l_orderkey % 15) + 1) << 56
           | ((l_partkey % 256) << 48)
           | ((l_suppkey % 256) << 40)
           | ((l_linenumber % 256)::BIGINT << 32)
           | ((l_orderkey * 7 + l_partkey) % 4294967296) AS packed_id
    FROM lineitem
)
SELECT (packed_id >> 56) & 15 AS layer,
       COUNT(*) AS n_labels,
       MAX((packed_id >> 48) & 255) AS max_cx,
       MAX((packed_id >> 40) & 255) AS max_cy,
       MAX((packed_id >> 32) & 255) AS max_cz,
       MAX(packed_id & 4294967295) AS max_segid
FROM packed GROUP BY layer
"""


# -- slab-level change feed (Volume.changes / stream_changes analog) --------

def vox_changes_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The snapshot-diff change feed in relational form — the oracle-
    checkable analog of ``Volume.changes(g0, g1)`` (volume.py), itself
    the Delta-CDF-style diff of two manifest generations (the
    reference has no change feed at all; this is beyond-reference
    surface). Generation 1 is the slab partitioning of the voxel table
    restricted to ``x < 28``; generation 2 shifts the domain to
    ``x >= 4`` and remaps ``label % 7 == 0`` labels inside ODD slabs —
    so the feed must classify slab 0 ``removed``, slab 7 ``added``,
    odd common slabs ``rewritten``, and stay SILENT on the even common
    slabs whose content is untouched (the property that makes
    incremental maintenance cheap: unchanged slabs cost nothing).

    Scale shape: two partial-aggregating ``groupBy(slab)`` passes over
    the fact table (map-side combine into 8 groups) and a full outer
    join of two 8-row summaries — no window, no driver loop; at 100 TB
    the real feed is a driver-side manifest diff and this relational
    form stays two map-reduce aggregations."""
    v = _voxels(spark, sf_dir)
    slab = F.floor(F.col("x") / F.lit(4.0)).cast("int")
    # multiset content fingerprint: order-independent SUM of a per-
    # voxel mix; bounded by 32*131071 * 2098 * rows — no BIGINT
    # overflow through sf1000 (ANSI mode would throw, not wrap)
    def summarize(df):
        mix = ((F.col("x") * 131071 + F.col("y") * 8191
                + F.col("z") * 127 + 1)
               * (F.col("label") + 1)).cast("bigint")
        return df.groupBy("slab").agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(mix).cast("bigint").alias("fp"))

    g1 = summarize(v.where(F.col("x") < 28).withColumn("slab", slab))
    g2src = (v.where(F.col("x") >= 4).withColumn("slab", slab)
             .withColumn("label", F.when(
                 (F.col("slab") % 2 == 1) & (F.col("label") % 7 == 0),
                 F.col("label") + 1000).otherwise(F.col("label"))))
    g2 = summarize(g2src)
    j = g1.alias("o").join(g2.alias("n"), on="slab", how="full_outer")
    return (
        j.select(
            F.col("slab"),
            F.when(F.col("o.n").isNull(), F.lit("added"))
             .when(F.col("n.n").isNull(), F.lit("removed"))
             .otherwise(F.lit("rewritten")).alias("change"),
            F.coalesce(F.col("o.n"), F.lit(0)).alias("n_old"),
            F.coalesce(F.col("n.n"), F.lit(0)).alias("n_new"),
        ).where(
            F.col("o.n").isNull() | F.col("n.n").isNull()
            | (F.col("o.fp") != F.col("n.fp"))
            | (F.col("o.n") != F.col("n.n"))
        )
    )


VOX_CHANGES_SQL = f"""
WITH voxels AS ({VOXELS_SQL}),
g1 AS (
  SELECT FLOOR(x / 4.0)::INT AS slab,
         COUNT(*)::BIGINT AS n,
         SUM((x*131071 + y*8191 + z*127 + 1) * (label + 1))::BIGINT AS fp
  FROM voxels WHERE x < 28 GROUP BY 1
),
g2src AS (
  SELECT FLOOR(x / 4.0)::INT AS slab, x, y, z,
         CASE WHEN FLOOR(x / 4.0)::INT % 2 = 1 AND label % 7 = 0
              THEN label + 1000 ELSE label END AS label
  FROM voxels WHERE x >= 4
),
g2 AS (
  SELECT slab, COUNT(*)::BIGINT AS n,
         SUM((x*131071 + y*8191 + z*127 + 1) * (label + 1))::BIGINT AS fp
  FROM g2src GROUP BY 1
)
SELECT COALESCE(g1.slab, g2.slab) AS slab,
       CASE WHEN g1.slab IS NULL THEN 'added'
            WHEN g2.slab IS NULL THEN 'removed'
            ELSE 'rewritten' END AS change,
       COALESCE(g1.n, 0) AS n_old,
       COALESCE(g2.n, 0) AS n_new
FROM g1 FULL OUTER JOIN g2 ON g1.slab = g2.slab
WHERE g1.slab IS NULL OR g2.slab IS NULL
   OR g1.fp <> g2.fp OR g1.n <> g2.n
"""


def vox_label_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label voxel counts + share within a bbox — the counts
    companion of ``vox_unique_bbox`` (the reference materializes the
    same statistic per label through its spatial index,
    ``spatial_index.py:763-835``; here it is one partial-aggregated
    groupBy over the pruned scan). Share emitted in basis points via
    the repo's portable floor(x+0.5) chain."""
    v = _voxels(spark, sf_dir).where(
        F.col("x").between(4, 20)
        & F.col("y").between(8, 24)
        & F.col("z").between(2, 10)
    )
    counts = v.groupBy("label").agg(F.count(F.lit(1)).alias("n_voxels"))
    total = counts.agg(F.sum("n_voxels").alias("n_total"))
    return counts.crossJoin(F.broadcast(total)).select(
        "label",
        "n_voxels",
        F.floor(F.col("n_voxels") * 10000 / F.col("n_total") + 0.5)
        .cast("bigint").alias("share_bp"),
    )


VOX_HISTOGRAM_SQL = f"""
WITH voxels AS ({VOXELS_SQL}),
win AS (
    SELECT * FROM voxels
    WHERE x BETWEEN 4 AND 20 AND y BETWEEN 8 AND 24 AND z BETWEEN 2 AND 10
),
counts AS (
    SELECT label, COUNT(*) AS n_voxels FROM win GROUP BY label
),
total AS (SELECT SUM(n_voxels) AS n_total FROM counts)
SELECT label, n_voxels,
       FLOOR(n_voxels * 10000.0 / n_total + 0.5)::BIGINT AS share_bp
FROM counts CROSS JOIN total
"""


QUERIES = {
    # new-this-round first: registration order feeds the driver's
    # 50-query correctness window, and voxel_rel's first two entries
    # sit inside it under the round-8 rotation
    "vox_changes_feed": vox_changes_feed,
    "vox_label_histogram": vox_label_histogram,
    "vox_unique_bbox": vox_unique_bbox,
    "vox_label_envelope": vox_label_envelope,
    "vox_point_lookup": vox_point_lookup,
    "vox_remap": vox_remap,
    "vox_exists": vox_exists,
    "vox_downsample": vox_downsample,
    "graphene_label_decode": graphene_label_decode,
}

ORACLE_SQL = {
    "vox_changes_feed": VOX_CHANGES_SQL,
    "vox_label_histogram": VOX_HISTOGRAM_SQL,
    "vox_unique_bbox": VOX_UNIQUE_SQL,
    "vox_label_envelope": VOX_ENVELOPE_SQL,
    "vox_point_lookup": VOX_POINTS_SQL,
    "vox_remap": VOX_REMAP_SQL,
    "vox_exists": VOX_EXISTS_SQL,
    "vox_downsample": VOX_DOWNSAMPLE_SQL,
    "graphene_label_decode": GRAPHENE_SQL,
}
