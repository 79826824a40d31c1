"""Similarity search over the ``embeddings`` table
(``embedding ARRAY<FLOAT>``, dim 64).

- ``ann_topk_cosine``: brute-force cosine top-k — the exactness
  baseline. JVM-side only: the dot product is
  ``aggregate(zip_with(a, b, *), 0.0, +)``; embeddings are cast to
  double so Spark and the duckdb oracle agree bitwise; ordering ties
  are broken on (rounded sim, neighbor id) so ranks are deterministic.
- ``embedding_neardup_pairs``: cosine near-duplicate pairs ≥ threshold.
- ``srp_ann_topk``: the scale path — signed-random-projection (SRP)
  LSH bucketing with exact rerank inside the bucket. At 100 TB the
  brute-force product is infeasible; SRP buckets turn it into a
  bucket-local join. (No SQL oracle: the projection matrix is
  generated; the driver records a rows-only check.)
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from cloud_volume_spark.operators.common import load

TOP_K = 5
N_QUERIES = 10  # vec_id < 10 are the query set
NEARDUP_THRESHOLD = 0.8
SRP_BITS = 8


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def ann_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("embedding")
    )
    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    pairs = emb.crossJoin(F.broadcast(q)).where(F.col("vec_id") != F.col("query_id"))
    sim = _dot(F.col("embedding"), F.col("qvec")) / (
        _norm(F.col("embedding")) * _norm(F.col("qvec"))
    )
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(sim, 6).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "rnk", "sim")
    )


ANN_TOPK_SQL = f"""
WITH emb AS (
    SELECT vec_id, embedding::DOUBLE[] AS embedding FROM embeddings
), q AS (
    SELECT vec_id AS query_id, embedding AS qvec FROM emb WHERE vec_id < {N_QUERIES}
), scored AS (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           ROUND(
             LIST_SUM(LIST_TRANSFORM(LIST_ZIP(e.embedding, q.qvec),
                                     p -> p[1] * p[2]))
             / (SQRT(LIST_SUM(LIST_TRANSFORM(e.embedding, x -> x * x)))
                * SQRT(LIST_SUM(LIST_TRANSFORM(q.qvec, x -> x * x)))),
             6
           ) AS sim
    FROM emb e CROSS JOIN q
    WHERE e.vec_id <> q.query_id
), ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC
    ) AS rnk
    FROM scored
)
SELECT query_id, neighbor_id, rnk, sim FROM ranked WHERE rnk <= {TOP_K}
"""


def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a<b, sim ≥ threshold).
    Self-join shape; the SRP variant bounds it at scale."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("embedding")
    )
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    sim = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(sim, 6).alias("sim"))
        .where(F.col("sim") >= NEARDUP_THRESHOLD)
    )


NEARDUP_SQL = f"""
WITH emb AS (
    SELECT vec_id, embedding::DOUBLE[] AS embedding FROM embeddings
), scored AS (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(
             LIST_SUM(LIST_TRANSFORM(LIST_ZIP(a.embedding, b.embedding),
                                     p -> p[1] * p[2]))
             / (SQRT(LIST_SUM(LIST_TRANSFORM(a.embedding, x -> x * x)))
                * SQRT(LIST_SUM(LIST_TRANSFORM(b.embedding, x -> x * x)))),
             6
           ) AS sim
    FROM emb a JOIN emb b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, sim FROM scored WHERE sim >= {NEARDUP_THRESHOLD}
"""


def srp_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path ANN: signed random projections (seed=42) hash each
    vector to an SRP_BITS bucket; queries search only their bucket,
    with exact cosine rerank. Bucket join replaces the cross join —
    at 1000 executors this shuffles on bucket id, not N×Q."""
    emb = load(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    rng = np.random.default_rng(42)
    planes = rng.standard_normal((SRP_BITS, dim))

    bucket = F.lit(0)
    for j in range(SRP_BITS):
        plane_lit = F.array(*[F.lit(float(v)) for v in planes[j]])
        bucket = bucket + F.when(
            _dot(plane_lit, F.col("embedding")) > 0, F.lit(1 << j)
        ).otherwise(F.lit(0))

    withb = emb.select(
        "vec_id", _as_double("embedding").alias("embedding")
    ).withColumn("bucket", bucket)
    q = withb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
        F.col("bucket"),
    )
    cand = withb.join(q, on="bucket").where(F.col("vec_id") != F.col("query_id"))
    sim = _dot(F.col("embedding"), F.col("qvec")) / (
        _norm(F.col("embedding")) * _norm(F.col("qvec"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        cand.select(
            "query_id", F.col("vec_id").alias("neighbor_id"),
            F.round(sim, 6).alias("sim"),
        )
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= TOP_K)
    )


NLIST = 16       # IVF coarse centroids: vec_id in [100, 100+NLIST)
NPROBE = 4       # probed inverted lists per query


def ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: every vector is assigned to its nearest coarse
    centroid (inverted list); a query searches only the NPROBE nearest
    lists with exact cosine rerank. Centroids are a deterministic
    sample (vec_id 100..100+NLIST) standing in for k-means — which
    keeps the whole operator SQL-expressible, so unlike SRP it gets a
    full duckdb oracle. At scale: assignment is O(N·NLIST) map-side
    work against broadcast centroids; the candidate join shuffles on
    centroid id — inverted lists, never the N×Q product."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("embedding")
    )
    cents = emb.where(
        (F.col("vec_id") >= 100) & (F.col("vec_id") < 100 + NLIST)
    ).select(F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cvec"))

    csim = F.round(
        _dot(F.col("embedding"), F.col("cvec"))
        / (_norm(F.col("embedding")) * _norm(F.col("cvec"))),
        6,
    )
    wv = Window.partitionBy("vec_id").orderBy(F.desc("csim"), F.asc("cent_id"))
    assign = (
        emb.crossJoin(F.broadcast(cents))
        .select("vec_id", "embedding", "cent_id", csim.alias("csim"))
        .withColumn("crnk", F.row_number().over(wv))
        .where(F.col("crnk") == 1)
        .select("vec_id", "embedding", "cent_id")
    )

    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("qsim"), F.asc("cent_id"))
    qsim = F.round(
        _dot(F.col("qvec"), F.col("cvec"))
        / (_norm(F.col("qvec")) * _norm(F.col("cvec"))),
        6,
    )
    probe = (
        q.crossJoin(F.broadcast(cents))
        .select("query_id", "qvec", "cent_id", qsim.alias("qsim"))
        .withColumn("qrnk", F.row_number().over(wq))
        .where(F.col("qrnk") <= NPROBE)
        .select("query_id", "qvec", "cent_id")
    )

    cand = assign.join(probe, on="cent_id").where(
        F.col("vec_id") != F.col("query_id")
    )
    sim = _dot(F.col("embedding"), F.col("qvec")) / (
        _norm(F.col("embedding")) * _norm(F.col("qvec"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        cand.select(
            "query_id", F.col("vec_id").alias("neighbor_id"),
            F.round(sim, 6).alias("sim"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= TOP_K)
    )


_COS_SQL = (
    "ROUND(LIST_SUM(LIST_TRANSFORM(LIST_ZIP({a}, {b}), p -> p[1] * p[2]))"
    " / (SQRT(LIST_SUM(LIST_TRANSFORM({a}, x -> x * x)))"
    " * SQRT(LIST_SUM(LIST_TRANSFORM({b}, x -> x * x)))), 6)"
)

IVF_ANN_SQL = f"""
WITH emb AS (
    SELECT vec_id, embedding::DOUBLE[] AS embedding FROM embeddings
), cents AS (
    SELECT vec_id AS cent_id, embedding AS cvec FROM emb
    WHERE vec_id >= 100 AND vec_id < {100 + NLIST}
), assign AS (
    SELECT vec_id, embedding, cent_id FROM (
        SELECT e.vec_id, e.embedding, c.cent_id,
               ROW_NUMBER() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {_COS_SQL.format(a='e.embedding', b='c.cvec')} DESC,
                            c.cent_id ASC
               ) AS crnk
        FROM emb e CROSS JOIN cents c
    ) WHERE crnk = 1
), probe AS (
    SELECT query_id, qvec, cent_id FROM (
        SELECT q.vec_id AS query_id, q.embedding AS qvec, c.cent_id,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY {_COS_SQL.format(a='q.embedding', b='c.cvec')} DESC,
                            c.cent_id ASC
               ) AS qrnk
        FROM emb q CROSS JOIN cents c
        WHERE q.vec_id < {N_QUERIES}
    ) WHERE qrnk <= {NPROBE}
), cand AS (
    SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id,
           {_COS_SQL.format(a='a.embedding', b='p.qvec')} AS sim
    FROM assign a JOIN probe p ON a.cent_id = p.cent_id
    WHERE a.vec_id <> p.query_id
), ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC
    ) AS rnk
    FROM cand
)
SELECT query_id, neighbor_id, sim, rnk FROM ranked WHERE rnk <= {TOP_K}
"""


QUERIES = {
    "ann_topk_cosine": ann_topk_cosine,
    "embedding_neardup_pairs": embedding_neardup_pairs,
    "srp_ann_topk": srp_ann_topk,
    "ivf_ann_topk": ivf_ann_topk,
}

ORACLE_SQL = {
    "ann_topk_cosine": ANN_TOPK_SQL,
    "embedding_neardup_pairs": NEARDUP_SQL,
    # srp_ann_topk: generated projection matrix — rows-only check
    "ivf_ann_topk": IVF_ANN_SQL,
}
