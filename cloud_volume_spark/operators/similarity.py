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
  bucket-local join. The projection planes are fixed seed-42 literals
  embedded identically in the Spark plan and the duckdb oracle SQL, so
  it gets a full cross-engine oracle like IVF.
"""

from __future__ import annotations

import atexit

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from cloud_volume_spark.operators.common import load, load_spread

TOP_K = 5
N_QUERIES = 10  # vec_id < 10 are the query set
NEARDUP_THRESHOLD = 0.8
SRP_BITS = 8
DIM = 64  # embeddings table vector width (TESTDATA.md)

# fixed projection planes, embedded as float64 literals in BOTH engines
_SRP_PLANES = np.random.default_rng(42).standard_normal((SRP_BITS, DIM))

# OR-amplified banding for near-dup candidate generation: a pair is a
# candidate if any band's full bit pattern matches. Per-bit agreement
# is p = 1 - acos(s)/π, so recall = 1-(1-p^b)^L. Sizing is driven by
# the *threshold* (the operator's contract is "all pairs with sim ≥
# NEARDUP_THRESHOLD", verified against an exact all-pairs oracle), not
# by where "typical" near-dups live: at s = 0.80, p ≈ 0.795 and
# p^12 ≈ 0.064, so L = 180 bands leave a miss probability of
# (1-0.064)^180 ≈ 7e-6 — recall ≈ 1 at the contract boundary and
# better above it. Random-pair collisions stay 2^-12 per band
# (~N²·L·2^-b candidates), so b must grow ≳ log2(N) at scale: for a
# 100 TB corpus raise NEARDUP_BAND_BITS with log2(N) and re-solve
# L = ln(miss)/ln(1-p^b) at the threshold, or pre-shard by IVF
# centroid so N is per-shard.
NEARDUP_BANDS = 180
NEARDUP_BAND_BITS = 12
_ND_PLANES = np.random.default_rng(4242).standard_normal(
    (NEARDUP_BANDS * NEARDUP_BAND_BITS, DIM)
)


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    # r15 NOTE (measured, kept deliberately): an unrolled 64-term
    # element_at expression (identical fp op chain, codegen-friendly
    # in principle) was A/B'd against this fold on ann_topk_cosine in
    # an interleaved equal-steal window and LOST (min-of-6 1.52 s vs
    # 1.03 s): the heavy dots in this module live in projections above
    # BroadcastNestedLoopJoin/window stages where the 192-node tree
    # walks evaluate interpreted per pair, which is slower than the
    # fold's single tight loop over the zipped array. Guide §1
    # ("a fresh implementation of the ideal plan is usually slower
    # at first") — the fold stays.
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def _with_norm(df: DataFrame, vec_col: str = "embedding",
               out: str = "nrm") -> DataFrame:
    """Precompute each vector's norm once. Per-pair expressions then
    evaluate one 64-element fold (the dot) instead of three — the
    norms are just column references. sqrt/product are deterministic
    double ops, so sim values stay bitwise identical to an oracle that
    recomputes the norms inline."""
    return df.withColumn(out, _norm(F.col(vec_col)))


def ann_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _with_norm(load_spread(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("embedding")
    ))
    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
        F.col("nrm").alias("qnrm"),
    )
    pairs = emb.crossJoin(F.broadcast(q)).where(F.col("vec_id") != F.col("query_id"))
    sim = _dot(F.col("embedding"), F.col("qvec")) / (
        F.col("nrm") * F.col("qnrm")
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


# -- int8-quantized ANN (the memory-bound scale path) -----------------------

def int8_codes(df: DataFrame, vec_col: str,
               keep_scale: bool = False) -> DataFrame:
    """Append symmetric-int8 code columns ``q`` (array of quantized
    components, ``floor(x/scale + 0.5)`` with ``scale = max|x|/127``)
    and ``sq`` (the integer squared norm, floored at 1) — THE
    quantization contract shared by :func:`embedding_quantize_int8`,
    :func:`ivf_ann_topk_int8`, and the persisted int8 inverted lists
    (``ann_index.py``), so a rounding edit cannot silently diverge the
    serving index from the oracle-gated queries. ``floor(x+0.5)`` is
    the repo-wide portable rounding; every step is IEEE-identical
    across engines."""
    maxabs = F.greatest(
        F.aggregate(F.col(vec_col), F.lit(0.0),
                    lambda a, x: F.greatest(a, F.abs(x))),
        F.lit(1e-12))
    out = df.withColumn("scale", maxabs / F.lit(127.0))
    out = out.withColumn(
        "q", F.transform(
            F.col(vec_col),
            lambda x: F.floor(x / F.col("scale") + F.lit(0.5))))
    out = out.withColumn(
        "sq", F.greatest(
            F.aggregate(F.col("q"), F.lit(0).cast("long"),
                        lambda a, x: a + x * x),
            F.lit(1).cast("long")))
    return out if keep_scale else out.drop("scale")


def int8_qsim(q_a, q_b, sq_a, sq_b) -> F.Column:
    """The quantized cosine ``qdot / sqrt(sq_a·sq_b)`` rounded to 6 dp
    — a pure integer computation divided once, bit-identical across
    engines (the per-vector scales cancel in the ratio)."""
    qdot = F.aggregate(
        F.zip_with(q_a, q_b, lambda x, y: x * y),
        F.lit(0).cast("long"), lambda a, x: a + x).cast("double")
    return F.round(
        qdot / (F.sqrt(sq_a.cast("double")) * F.sqrt(sq_b.cast("double"))),
        6)


def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force top-k over SYMMETRIC INT8-QUANTIZED vectors — the
    memory-bandwidth scale path every production vector store ships
    (4× smaller vectors than float32, SIMD integer dot products): each
    vector is quantized per-row as ``q_i = floor(x_i/scale + 0.5)``
    with ``scale = max|x|/127``, and similarity is the quantized
    cosine ``qdot / sqrt(sq_a·sq_b)`` — the per-vector scales cancel
    in the ratio, so the score is a pure INTEGER computation divided
    once, bitwise identical across engines (no float-accumulation
    drift). Quantization uses ``floor(x+0.5)``, the repo-wide
    portable rounding (Spark ROUND and DuckDB ROUND disagree on
    half-way cases; floor does not).

    Scale shape: quantization is map-only (one fold per row); the
    query side is N_QUERIES rows broadcast; top-k is a per-query
    window over N_QUERIES bounded partitions. No corpus-sized shuffle
    anywhere — at 100 TB the cost is one scan at int8 bandwidth,
    which is the point of the operator."""
    emb = load_spread(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("v"))
    emb = int8_codes(emb, "v").select("vec_id", "q", "sq")
    qset = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("qq"),
        F.col("sq").alias("qsq"))
    pairs = emb.crossJoin(F.broadcast(qset)).where(
        F.col("vec_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id", F.col("vec_id").alias("neighbor_id"),
        int8_qsim(F.col("q"), F.col("qq"),
                  F.col("sq"), F.col("qsq")).alias("qsim"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("qsim"), F.asc("neighbor_id"))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= TOP_K)
            .select("query_id", "neighbor_id", "rnk", "qsim"))


QUANT_INT8_SQL = f"""
WITH emb0 AS (
    SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), emb AS (
    SELECT vec_id,
           LIST_TRANSFORM(
             v, x -> CAST(FLOOR(x / (GREATEST(
                 LIST_MAX(LIST_TRANSFORM(v, y -> ABS(y))), 1e-12
             ) / 127.0) + 0.5) AS BIGINT)) AS q
    FROM emb0
), emb2 AS (
    SELECT vec_id, q,
           GREATEST(CAST(LIST_SUM(
               LIST_TRANSFORM(q, x -> x * x)) AS BIGINT), 1) AS sq
    FROM emb
), qset AS (
    SELECT vec_id AS query_id, q AS qq, sq AS qsq
    FROM emb2 WHERE vec_id < {N_QUERIES}
), scored AS (
    SELECT qset.query_id, e.vec_id AS neighbor_id,
           ROUND(
             CAST(LIST_SUM(LIST_TRANSFORM(LIST_ZIP(e.q, qset.qq),
                                          p -> p[1] * p[2])) AS DOUBLE)
             / (SQRT(CAST(e.sq AS DOUBLE)) * SQRT(CAST(qset.qsq AS DOUBLE))),
             6
           ) AS qsim
    FROM emb2 e CROSS JOIN qset
    WHERE e.vec_id <> qset.query_id
), ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY qsim DESC, neighbor_id ASC
    ) AS rnk
    FROM scored
)
SELECT query_id, neighbor_id, rnk, qsim FROM ranked WHERE rnk <= {TOP_K}
"""


def _plane_array(plane) -> F.Column:
    return F.array(*[F.lit(float(v)) for v in plane])


def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a<b, sim ≥ threshold),
    generated through OR-amplified SRP bands — never an all-pairs
    product. Each vector hashes to NEARDUP_BANDS band codes of
    NEARDUP_BAND_BITS bits; pairs colliding in any band become
    candidates (shuffle on (band, code)), then exact cosine rerank
    keeps sim ≥ threshold. False positives are impossible (exact
    rerank); band width/count bound the false-negative rate (see the
    constant's sizing note; tests/test_plans.py pins full recall on a
    planted-duplicate fixture). The sf-bounded duckdb oracle remains
    the exact all-pairs SQL."""
    # plain load, not load_spread (r14 A/B): the Arrow UDF hashes the
    # whole corpus in one vectorized matmul, and the exact rerank runs
    # AFTER the candidate shuffle (already all-cores) — spreading the
    # scan only multiplied per-task Python/Arrow overhead
    emb = _with_norm(load(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("embedding")
    ))

    # all 32 plane projections in one Arrow-batched numpy matmul —
    # 32 interpreted aggregate() lambdas per row would dominate the
    # runtime. Candidate generation only: the exact JVM-side cosine
    # rerank below decides membership, so the engine-exactness
    # requirement stays on the rerank, not the hashing.
    planes_t = _ND_PLANES.T  # (DIM, 32)
    weights = (1 << np.arange(NEARDUP_BAND_BITS, dtype=np.int64))

    @F.pandas_udf("array<int>")
    def band_codes_udf(col: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in col])
        bits = (mat @ planes_t) > 0  # (n, BANDS*BITS)
        codes = (
            bits.reshape(len(mat), NEARDUP_BANDS, NEARDUP_BAND_BITS)
            @ weights
        ).astype(np.int32)
        return pd.Series(list(codes))

    # candidates carry ids only — vectors re-join by id afterwards, so
    # the band shuffle moves 12-byte rows, not 512-byte embeddings.
    # r15 (guide §2.4, replacing r14's eager localCheckpoint): the
    # self-join is forced to a shuffle join (merge hint) so both sides
    # plan the identical Exchange hashpartitioning(band, code) over
    # the identical scan→ArrowEval(matmul)→posexplode subtree and the
    # second side collapses to a ReusedExchange — the 180-plane Arrow
    # matmul UDF runs ONCE below the one exchange, with no blocking
    # materialization and no session-pinned checkpoint blocks.
    banded = emb.select(
        "vec_id", F.posexplode(band_codes_udf("embedding")).alias("band", "code")
    )
    a = banded.select(
        F.col("vec_id").alias("id_a"), "band", "code"
    )
    b = banded.select(
        F.col("vec_id").alias("id_b"), "band", "code"
    )
    cand = (
        a.hint("merge").join(b, on=["band", "code"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    va = emb.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"),
        F.col("nrm").alias("nrm_a"),
    )
    vb = emb.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"),
        F.col("nrm").alias("nrm_b"),
    )
    sim = _dot(F.col("va"), F.col("vb")) / (F.col("nrm_a") * F.col("nrm_b"))
    return (
        cand.join(va, on="id_a").join(vb, on="id_b")
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


def embedding_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-level dedup decision: connected components over the
    near-duplicate pair graph (sim ≥ NEARDUP_THRESHOLD, banded
    candidates + exact rerank), keep the minimum vec_id per component —
    the embedding-space analog of ``dedup_keep_best``. Reuses the
    shared :func:`~cloud_volume_spark.operators.dedup.connected_components`
    engine (driver union-find small, min-label propagation large)."""
    from cloud_volume_spark.operators.dedup import connected_components

    ids = load(spark, sf_dir, "embeddings").select("vec_id")
    pairs = embedding_neardup_pairs(spark, sf_dir).select("id_a", "id_b")
    cc = connected_components(spark, ids, pairs, "vec_id")
    return cc.select(
        "vec_id", "cluster_id",
        (F.col("vec_id") == F.col("cluster_id")).cast("int").alias("is_kept"),
    )


EMBEDDING_DEDUP_KEEP_SQL = f"""
WITH RECURSIVE emb AS (
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
), pairs AS (
    SELECT id_a, id_b FROM scored WHERE sim >= {NEARDUP_THRESHOLD}
), edges AS (
    SELECT id_a AS u, id_b AS v FROM pairs
    UNION ALL
    SELECT id_b AS u, id_a AS v FROM pairs
), walk (u, comp) AS (
    SELECT vec_id, vec_id FROM embeddings
    UNION
    SELECT e.u, w.comp FROM walk w JOIN edges e ON e.v = w.u
)
SELECT u AS vec_id, MIN(comp) AS cluster_id,
       (u = MIN(comp))::INT AS is_kept
FROM walk GROUP BY u
"""


SEMDEDUP_NLIST = 16       # coarse clusters (vec_id 100..115 incl. as centroids)
SEMDEDUP_T = 0.8          # within-cluster cosine threshold


def _centroid_frame(emb: DataFrame, base_id: int,
                    nlist: int) -> DataFrame:
    """(cent_id, cvec, cnrm): the deterministic coarse-centroid sample
    (vec_id in [base_id, base_id+nlist) — half-open, nlist centroids;
    the k-means stand-in) — shared by the assignment below and IVF's
    query-probe side."""
    return emb.where(
        (F.col("vec_id") >= base_id) & (F.col("vec_id") < base_id + nlist)
    ).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cvec"),
        F.col("nrm").alias("cnrm"),
    )


def rank_centroids(frame: DataFrame, cents: DataFrame,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   nrm_col: str = "nrm") -> DataFrame:
    """THE centroid-affinity contract, in one place: rounded-6dp cosine
    against the broadcast (cent_id, cvec, cnrm) frame, ranked per id by
    (sim desc, cent_id asc) into ``crnk``. Assignment is crnk == 1,
    IVF probing is crnk <= nprobe — both the per-call operators here
    AND the persistent index (:mod:`cloud_volume_spark.ann_index`)
    consume this function, so a tie-break or rounding edit cannot
    silently make "nearest centroid" mean two things across the
    oracle-gated query and a previously persisted index."""
    csim = F.round(
        _dot(F.col(vec_col), F.col("cvec"))
        / (F.col(nrm_col) * F.col("cnrm")),
        6,
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("_csim"), F.asc("cent_id"))
    return (
        frame.crossJoin(F.broadcast(cents))
        .withColumn("_csim", csim)
        .withColumn("crnk", F.row_number().over(w))
        .drop("_csim")
    )


def assign_fold(frame: DataFrame, cents: DataFrame,
                id_col: str = "vec_id", vec_col: str = "embedding",
                nrm_col: str = "nrm") -> DataFrame:
    """The crnk == 1 specialization of :func:`rank_centroids` as ONE
    map-side fold (r14, guide §2.4): the centroid table collapses to a
    single array row (cent_id-sorted), every vector folds over it
    keeping the entry with the strictly higher rounded-6dp cosine —
    iterating cent_id-ascending with a strict ``>`` reproduces the
    window's (sim DESC NULLS LAST, cent_id ASC) tie rule bit-for-bit
    in EVERY case (r15, closing the r14 advice note): the first
    entry is always taken (the window always ranks someone first), a
    non-NULL sim displaces a NULL-sim holder (NULLS LAST), and
    otherwise only a strictly greater sim wins — so an all-NULL row
    gets the LOWEST cent_id exactly as the window orders it, instead
    of the last. What
    it removes vs the window form: the nlist× row explosion AND the
    full-corpus Exchange+Sort the per-vector window needed — the
    assignment becomes a pure map over the scan, which is what O(N·k)
    against broadcast centroids is supposed to cost. Probing (crnk <=
    nprobe, a top-n) stays on :func:`rank_centroids` — it runs on the
    query rows only. Equality with the window form is pinned by
    tests/test_kmeans_assign.py::test_assign_fold_matches_rank_centroids."""
    carr = cents.agg(F.array_sort(F.collect_list(F.struct(
        F.col("cent_id"), F.col("cvec"), F.col("cnrm")))).alias("_cents"))
    return (
        frame.crossJoin(F.broadcast(carr))
        .withColumn("_b", _fold_best("_cents", vec_col, nrm_col))
        .withColumn("cent_id", F.col("_b.cid"))
        .drop("_b", "_cents")
    )


def _fold_best(cents_col, vec_col: str, nrm_col: str) -> F.Column:
    """The shared argmax-cosine fold over a (cent_id, cvec, cnrm)
    struct array — window-exact tie rule (see :func:`assign_fold`)."""
    init = F.struct(
        F.lit(-1).cast("long").alias("cid"),
        F.lit(None).cast("double").alias("best"),
    )

    def step(acc, c):
        sim = F.round(
            _dot(F.col(vec_col), c["cvec"]) / (F.col(nrm_col) * c["cnrm"]),
            6)
        # window-exact: take the first entry unconditionally, then a
        # non-NULL sim beats a NULL holder (NULLS LAST), then strict >
        better = (
            (acc["cid"] == F.lit(-1).cast("long"))
            | (acc["best"].isNull() & sim.isNotNull())
            | (sim > acc["best"])
        )
        return F.when(
            better, F.struct(c["cent_id"].alias("cid"), sim.alias("best"))
        ).otherwise(acc)

    return F.aggregate(cents_col, init, step)


def _assign_nearest_centroid(emb: DataFrame, base_id: int,
                             nlist: int) -> DataFrame:
    """(vec_id, embedding, nrm, cent_id): each vector assigned to its
    nearest coarse centroid — crnk == 1 of :func:`rank_centroids`,
    executed by the map-side :func:`assign_fold` (bit-identical)."""
    cents = _centroid_frame(emb, base_id, nlist)
    return assign_fold(emb, cents).select(
        "vec_id", "embedding", "nrm", "cent_id")


def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): assign every embedding to its nearest coarse
    centroid, then *within each cluster* drop any item that has a
    lower-id cluster-mate with cosine >= SEMDEDUP_T. The clustering
    bounds the pairwise comparison to cluster-sized blocks — the whole
    point of the method — so there is never an N x N product; at scale
    NLIST grows with N to hold cluster size ~constant, keeping the
    per-cluster self-join O(N * avg_cluster). Centroids are the same
    deterministic sample the IVF operator uses, which keeps the full
    operator SQL-expressible for the duckdb oracle.

    Unlike :func:`embedding_dedup_keep` (global LSH graph + connected
    components), the keep decision here is local to a cluster — the
    trade the SemDeDup paper makes for linear scaling."""
    emb = _with_norm(load_spread(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("embedding")
    ))
    # r15 (guide §2.4, replacing r14's eager localCheckpoint + third
    # consumer): the per-item verdict IS a grouped count over the
    # cluster-local LEFT self-join — every item keeps its row whether
    # or not a lower-id near-duplicate matches, so the old
    # inner-join → count → re-join-to-assign chain (three assignment
    # consumers, pinned behind a checkpoint) collapses to ONE left
    # join + ONE aggregate over TWO consumers. The merge hint forces a
    # shuffle join so both sides plan the identical
    # Exchange hashpartitioning(cent_id) over the identical
    # scan→assign_fold subtree and the second collapses to a
    # ReusedExchange — the assignment is computed once, with no
    # blocking materialization, no session-pinned blocks, and lineage
    # preserved for cluster recompute. (A literal-centroid variant —
    # collect NLIST rows at construction, embed as literals — was
    # built and A/B'd this round: it reads 1.4 s SLOWER in-list at
    # equal steal, the 16x64-double literal array evidently rebuilt
    # per row by the interpreted fold; the broadcast-array form keeps
    # the materialized array. Measured, rejected.)
    assign = _assign_nearest_centroid(emb, 100, SEMDEDUP_NLIST)
    a = assign.select(
        "cent_id", F.col("vec_id").alias("id_hi"),
        F.col("embedding").alias("e_hi"), F.col("nrm").alias("n_hi"),
    )
    b = assign.select(
        F.col("cent_id").alias("cent_b"), F.col("vec_id").alias("id_lo"),
        F.col("embedding").alias("e_lo"), F.col("nrm").alias("n_lo"),
    )
    sim = F.round(
        _dot(F.col("e_hi"), F.col("e_lo")) / (F.col("n_hi") * F.col("n_lo")), 6
    )
    cond = (
        (F.col("cent_id") == F.col("cent_b"))
        & (F.col("id_hi") > F.col("id_lo"))
        & (sim >= SEMDEDUP_T)
    )
    return (
        a.hint("merge").join(b, cond, "left")
        .groupBy(F.col("id_hi").alias("vec_id"), F.col("cent_id"))
        .agg(F.count("id_lo").alias("n_dups"))
        .select(
            "vec_id", "cent_id", F.col("n_dups").cast("long").alias("n_dups"),
            (F.col("n_dups") == 0).cast("int").alias("is_kept"),
        )
    )


SEMDEDUP_SQL = f"""
WITH emb AS (
    SELECT vec_id, embedding::DOUBLE[] AS embedding FROM embeddings
), cents AS (
    SELECT vec_id AS cent_id, embedding AS cvec FROM emb
    WHERE vec_id >= 100 AND vec_id < {100 + SEMDEDUP_NLIST}
), assign AS (
    SELECT vec_id, embedding, cent_id FROM (
        SELECT e.vec_id, e.embedding, c.cent_id,
               ROW_NUMBER() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {{cos}} DESC, c.cent_id ASC
               ) AS crnk
        FROM emb e CROSS JOIN cents c
    ) WHERE crnk = 1
), dups AS (
    SELECT hi.vec_id AS vec_id, COUNT(*) AS n_dups
    FROM assign hi JOIN assign lo
      ON hi.cent_id = lo.cent_id AND hi.vec_id > lo.vec_id
    WHERE {{sim}} >= {SEMDEDUP_T}
    GROUP BY hi.vec_id
)
SELECT a.vec_id, a.cent_id,
       COALESCE(d.n_dups, 0)::BIGINT AS n_dups,
       (COALESCE(d.n_dups, 0) = 0)::INT AS is_kept
FROM assign a LEFT JOIN dups d ON d.vec_id = a.vec_id
"""


def srp_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path ANN: signed random projections (seed=42) hash each
    vector to an SRP_BITS bucket; queries search only their bucket,
    with exact cosine rerank. Bucket join replaces the cross join —
    at 1000 executors this shuffles on bucket id, not N×Q."""
    emb = load_spread(spark, sf_dir, "embeddings")

    bucket = F.lit(0)
    for j in range(SRP_BITS):
        bucket = bucket + F.when(
            _dot(_plane_array(_SRP_PLANES[j]), F.col("embedding")) > 0,
            F.lit(1 << j),
        ).otherwise(F.lit(0))

    withb = _with_norm(
        emb.select("vec_id", _as_double("embedding").alias("embedding"))
    ).withColumn("bucket", bucket)
    q = withb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
        F.col("nrm").alias("qnrm"),
        F.col("bucket"),
    )
    cand = withb.join(q, on="bucket").where(F.col("vec_id") != F.col("query_id"))
    sim = _dot(F.col("embedding"), F.col("qvec")) / (
        F.col("nrm") * F.col("qnrm")
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
    emb = _with_norm(load_spread(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("embedding")
    ))
    assign = _assign_nearest_centroid(emb, 100, NLIST)
    cents = _centroid_frame(emb, 100, NLIST)  # the query probe side

    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec"),
        F.col("nrm").alias("qnrm"),
    )
    probe = (
        rank_centroids(q, cents, "query_id", "qvec", "qnrm")
        .where(F.col("crnk") <= NPROBE)
        .select("query_id", "qvec", "qnrm", "cent_id")
    )

    cand = assign.join(probe, on="cent_id").where(
        F.col("vec_id") != F.col("query_id")
    )
    sim = _dot(F.col("embedding"), F.col("qvec")) / (
        F.col("nrm") * F.col("qnrm")
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

SEMDEDUP_SQL = SEMDEDUP_SQL.format(
    cos=_COS_SQL.format(a="e.embedding", b="c.cvec"),
    sim=_COS_SQL.format(a="hi.embedding", b="lo.embedding"),
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


IVF_INT8_RERANK_R = 10  # int8-affinity candidates kept per query (2x TOP_K)


def ivf_ann_topk_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with INT8-QUANTIZED inverted lists (IVF-PQ-lite): candidate
    scoring inside the probed lists runs on symmetric-int8 codes (the
    :func:`int8_codes`/:func:`int8_qsim` contract — 4× less list IO
    than float64 at 100 TB, integer dot products), keeping the top
    IVF_INT8_RERANK_R per query; ONLY those survivors pay the exact
    float cosine rerank that produces the final top-k. This is the
    oracle-gated miniature of the persisted two-file design
    (``ann_index.py``: codes.parquet scanned for affinity,
    lists.parquet joined for rerank); here both stages stay inline so
    the whole operator is SQL-expressible.

    Determinism: the int8 affinity is an exact integer ratio rounded
    to 6 dp and ranked (qsim desc, neighbor_id asc); the float rerank
    reuses ``ivf_ann_topk``'s exact tie rules — both stages compare
    bit-identical values on both engines, so the approximation is the
    SAME approximation everywhere."""
    emb = _with_norm(load_spread(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("embedding")
    ))
    assign = _assign_nearest_centroid(emb, 100, NLIST)
    codes = int8_codes(assign, "embedding")
    cents = _centroid_frame(emb, 100, NLIST)

    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec"),
        F.col("nrm").alias("qnrm"),
    )
    q = (int8_codes(q, "qvec")
         .withColumnRenamed("q", "qq").withColumnRenamed("sq", "qsq"))
    probe = (
        rank_centroids(q, cents, "query_id", "qvec", "qnrm")
        .where(F.col("crnk") <= NPROBE)
        .select("query_id", "qvec", "qnrm", "qq", "qsq", "cent_id")
    )
    cand = codes.join(probe, on="cent_id").where(
        F.col("vec_id") != F.col("query_id"))
    w_r = Window.partitionBy("query_id").orderBy(
        F.desc("qsim"), F.asc("vec_id"))
    top_r = (cand.withColumn(
        "qsim", int8_qsim(F.col("q"), F.col("qq"),
                          F.col("sq"), F.col("qsq")))
        .withColumn("_rq", F.row_number().over(w_r))
        .where(F.col("_rq") <= IVF_INT8_RERANK_R))
    sim = _dot(F.col("embedding"), F.col("qvec")) / (
        F.col("nrm") * F.col("qnrm")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id"))
    return (
        top_r.select(
            "query_id", F.col("vec_id").alias("neighbor_id"),
            F.round(sim, 6).alias("sim"),
        )
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= TOP_K)
    )


_Q8_SQL = (
    "LIST_TRANSFORM({v}, x -> CAST(FLOOR(x / (GREATEST("
    "LIST_MAX(LIST_TRANSFORM({v}, y -> ABS(y))), 1e-12"
    ") / 127.0) + 0.5) AS BIGINT))"
)
_QSIM_SQL = (
    "ROUND(CAST(LIST_SUM(LIST_TRANSFORM(LIST_ZIP({a}, {b}),"
    " p -> p[1] * p[2])) AS DOUBLE)"
    " / (SQRT(CAST({sa} AS DOUBLE)) * SQRT(CAST({sb} AS DOUBLE))), 6)"
)

IVF_INT8_SQL = f"""
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
                   ORDER BY {{cos}} DESC,
                            c.cent_id ASC
               ) AS crnk
        FROM emb e CROSS JOIN cents c
    ) WHERE crnk = 1
), codes AS (
    SELECT vec_id, embedding, cent_id,
           {_Q8_SQL.format(v='embedding')} AS q
    FROM assign
), codes2 AS (
    SELECT vec_id, embedding, cent_id, q,
           GREATEST(CAST(LIST_SUM(
               LIST_TRANSFORM(q, x -> x * x)) AS BIGINT), 1) AS sq
    FROM codes
), qset AS (
    SELECT vec_id AS query_id, embedding AS qvec, q AS qq, sq AS qsq
    FROM codes2 WHERE vec_id < {N_QUERIES}
), probe AS (
    SELECT query_id, cent_id FROM (
        SELECT q.vec_id AS query_id, c.cent_id,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY {{qcos}} DESC,
                            c.cent_id ASC
               ) AS qrnk
        FROM emb q CROSS JOIN cents c
        WHERE q.vec_id < {N_QUERIES}
    ) WHERE qrnk <= {NPROBE}
), cand AS (
    SELECT p.query_id, c.vec_id AS neighbor_id,
           c.embedding AS nvec, qs.qvec,
           {_QSIM_SQL.format(a='c.q', b='qs.qq', sa='c.sq', sb='qs.qsq')}
               AS qsim
    FROM codes2 c
    JOIN probe p ON c.cent_id = p.cent_id
    JOIN qset qs ON qs.query_id = p.query_id
    WHERE c.vec_id <> p.query_id
), top_r AS (
    SELECT query_id, neighbor_id, nvec, qvec FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY qsim DESC, neighbor_id ASC
        ) AS rq FROM cand
    ) WHERE rq <= {IVF_INT8_RERANK_R}
), rer AS (
    SELECT query_id, neighbor_id,
           {{rcos}} AS sim
    FROM top_r
), ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC
    ) AS rnk
    FROM rer
)
SELECT query_id, neighbor_id, sim, rnk FROM ranked WHERE rnk <= {TOP_K}
"""

IVF_INT8_SQL = IVF_INT8_SQL.format(
    cos=_COS_SQL.format(a="e.embedding", b="c.cvec"),
    qcos=_COS_SQL.format(a="q.embedding", b="c.cvec"),
    rcos=_COS_SQL.format(a="nvec", b="qvec"),
)


# -- product quantization (the order-of-magnitude-compression scale path) ---

# Geometry: FINE subspaces win on weakly-clustered data — the r14
# sweep on the sf0.1 corpus (recall@10 vs the float search, rerank_r
# = 80 of a 5k-candidate pool): 8x16 0.42, 8x64 0.64, 16x16 0.69,
# 32x16 0.97. With dsub = 2 a 16-entry codebook tiles each 2-d
# subspace densely enough that ADC ranking survives even i.i.d.-ish
# vectors, while 32 one-byte codes + the stored norm still cut the
# affinity scan ~13x vs float64 lists (int8: 4x). At higher dims the
# same m keeps dsub proportional (dim 768 -> dsub 24) where the data's
# own structure carries the approximation (0.93 recall at 8x16 there).
PQ_M = 32                # subspaces per vector
PQ_DSUB = DIM // PQ_M    # components per subspace
PQ_KSUB = 16             # codebook entries per subspace (4-bit codes)
PQ_RERANK_R = 10         # ADC candidates surviving to the float rerank


def pq_codebook_frame(emb: DataFrame, m: int = PQ_M,
                      ksub: int = PQ_KSUB) -> DataFrame:
    """Deterministic sample-mode PQ codebook as a DataFrame
    ``(mi int, j int, sub array<double>)``: subspace ``mi``'s entries
    are the subvectors of the ``ksub`` corpus vectors ranked first by
    ``md5('pq|' || mi || ':' || vec_id)`` — the repo's md5-keyspace
    sampling house rule (never RAND), with a different slice per
    subspace so entries decorrelate across subspaces. Sample mode is
    what keeps the whole operator SQL-expressible (the ``centroids=
    "sample"`` IVF precedent); the serving index freezes this codebook
    at build time. ``emb`` must carry ``vec_id`` and a double-cast
    ``embedding``.

    Scale: the ranking shuffles ids-only rows (N·m keys, no vectors);
    the ksub·m winners join back to the corpus broadcast. A codebook
    is derived once per build — this is build-time cost, not serving
    cost."""
    spark = emb.sparkSession
    mis = spark.range(m).select(F.col("id").cast("int").alias("mi"))
    keyed = (emb.select("vec_id").crossJoin(F.broadcast(mis))
             .withColumn("k", F.md5(F.concat(
                 F.lit("pq|"), F.col("mi").cast("string"),
                 F.lit(":"), F.col("vec_id").cast("string")))))
    w = Window.partitionBy("mi").orderBy("k", "vec_id")
    # filter on the RAW row_number with <= (r15): that exact pattern
    # plans as a WindowGroupLimit — each map task keeps only its local
    # top-ksub rows per mi before the exchange — where the old
    # `row_number() - 1 < ksub` derived-column filter shipped every
    # (vec_id, mi) row into the sort
    seeds = (keyed.withColumn("_rn", F.row_number().over(w))
             .where(F.col("_rn") <= ksub)
             .select("mi", (F.col("_rn") - 1).alias("j"), "vec_id"))
    dsub = F.floor(F.size("embedding") / m).cast("int")
    return (seeds.join(emb.select("vec_id", "embedding"), "vec_id")
            .select("mi", "j",
                    F.slice("embedding",
                            F.col("mi") * dsub + 1, dsub).alias("sub")))


def collect_pq_codebook(emb: DataFrame, m: int = PQ_M,
                        ksub: int = PQ_KSUB) -> list:
    """Driver-side nested list ``cb[mi][j] -> [dsub floats]`` of the
    sample-mode codebook — m·ksub·dsub doubles (1024 at the default
    32x16x2), the ``embedding_kmeans`` centroids-as-literals pattern."""
    rows = pq_codebook_frame(emb, m, ksub).collect()
    cb = [[None] * ksub for _ in range(m)]
    for r in rows:
        cb[int(r["mi"])][int(r["j"])] = [float(x) for x in r["sub"]]
    missing = [(mi, j) for mi in range(m) for j in range(ksub)
               if cb[mi][j] is None]
    if missing:
        raise ValueError(
            f"PQ codebook underfull at {missing[:4]}... — the corpus "
            f"has fewer than ksub={ksub} vectors; shrink ksub or grow "
            "the corpus")
    return cb


def _sql_name(col, what: str) -> str:
    """The PQ expression builders are literal-heavy (m·ksub embedded
    codebook entries): constructed as Column objects they cost ~10 s
    of driver-side py4j round trips PER CALL (r14 measurement: the
    dominant cost of pq_ann_topk), so they emit ONE SQL string parsed
    server-side instead. That requires plain column names as inputs —
    every caller passes names."""
    if not isinstance(col, str):
        raise TypeError(
            f"{what} requires a column NAME (SQL-string expression "
            f"builder), got {type(col).__name__}")
    return f"`{col}`"


def _dlit(x) -> str:
    """Shortest-round-trip double literal: repr() digits re-parse to
    the identical IEEE double on the SQL side (D suffix keeps the type
    double, never decimal)."""
    return f"{float(x)!r}D"


def pq_encode_col(vec_col, cb) -> F.Column:
    """Encode an ``array<double>`` column into PQ codes
    (``array<tinyint>``, one code per subspace) against the literal
    codebook ``cb[mi][j]`` — a pure map-side Catalyst fold, the
    ``_assign_fold`` argmin shape per subspace: squared L2 distance
    rounded to 6 dp (the engines' last-bit summation differences can
    never flip a code), earliest ``j`` wins ties. The SAME expression
    encodes the oracle-gated operator, the persisted sidecar
    (``ann_index.py``), and every mutation's re-encode — one contract,
    no drift. Emitted as one server-parsed SQL string (see
    :func:`_sql_name`); the fold semantics are unchanged."""
    m, ksub, dsub = len(cb), len(cb[0]), len(cb[0][0])
    vec = _sql_name(vec_col, "pq_encode_col")
    outs = []
    for mi in range(m):
        sub = f"slice({vec}, {mi * dsub + 1}, {dsub})"
        entries = ", ".join(
            "named_struct('j', {j}, 'cv', array({cv}))".format(
                j=j, cv=", ".join(_dlit(x) for x in cb[mi][j]))
            for j in range(ksub))
        d = (f"round(aggregate(zip_with({sub}, ent.cv, "
             "(x, y) -> (x - y) * (x - y)), 0.0D, "
             "(acc2, x) -> acc2 + x), 6)")
        outs.append(
            "CAST(aggregate("
            f"array({entries}), "
            "named_struct('j', -1, 'd', CAST(NULL AS DOUBLE)), "
            f"(acc, ent) -> CASE WHEN acc.d IS NULL OR {d} < acc.d "
            f"THEN named_struct('j', ent.j, 'd', {d}) ELSE acc END"
            ").j AS TINYINT)")
    return F.expr(f"array({', '.join(outs)})")


def pq_recon_col(pq_col, cb) -> F.Column:
    """Reconstruct the PQ approximation (``array<double>``, full
    width) from a codes column: per subspace, ``element_at`` into that
    subspace's literal entry table, flattened in subspace order — so a
    dot product against the reconstruction sums components in exactly
    the order the duckdb oracle's ``FLATTEN(LIST(sub ORDER BY mi))``
    does (bit-identical affinities)."""
    m, ksub = len(cb), len(cb[0])
    pq = _sql_name(pq_col, "pq_recon_col")
    parts = []
    for mi in range(m):
        table = ", ".join(
            "array({})".format(", ".join(_dlit(x) for x in cb[mi][j]))
            for j in range(ksub))
        parts.append(
            f"element_at(array({table}), "
            f"CAST(element_at({pq}, {mi + 1}) AS INT) + 1)")
    return F.expr(f"flatten(array({', '.join(parts)}))")


def pq_lut_col(qvec_col, cb) -> F.Column:
    """Per-query ADC lookup table (``array<double>``, m·ksub entries,
    mi-major): entry ``mi·ksub + j`` is the dot of the query's
    ``mi``-th subvector with codebook entry ``j`` — computed once per
    query row, map-side. A candidate's approximate dot is then m
    array lookups (:func:`pq_adc_col`) instead of a dim-wide fold:
    the serving path's per-candidate cost is O(m), and the scan reads
    1-byte codes instead of 8-byte doubles."""
    qvec = _sql_name(qvec_col, "pq_lut_col")
    m, ksub, dsub = len(cb), len(cb[0]), len(cb[0][0])
    ents = []
    for mi in range(m):
        sub = f"slice({qvec}, {mi * dsub + 1}, {dsub})"
        for j in range(ksub):
            cv = ", ".join(_dlit(x) for x in cb[mi][j])
            ents.append(
                f"aggregate(zip_with({sub}, array({cv}), "
                "(x, y) -> x * y), 0.0D, (acc, x) -> acc + x)")
    return F.expr(f"array({', '.join(ents)})")


def pq_adc_col(pq_col, lut_col, m: int, ksub: int) -> F.Column:
    """Approximate dot product: sum over subspaces of the LUT entry
    the candidate's code selects — O(m) per candidate, all JVM."""
    pq = F.col(pq_col) if isinstance(pq_col, str) else pq_col
    lut = F.col(lut_col) if isinstance(lut_col, str) else lut_col
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)), F.lit(0.0),
        lambda acc, mi: acc + F.element_at(
            lut, mi * ksub + F.element_at(pq, mi + 1).cast("int") + 1))


def pq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantized ANN: every vector is encoded into PQ_M 4-bit
    codes against a deterministic sample-mode codebook (PQ_KSUB
    entries per subspace), candidates are scored by the APPROXIMATE
    cosine of the query against the codebook RECONSTRUCTION, the top
    PQ_RERANK_R per query survive to an exact float rerank — the
    oracle-gated miniature of the persisted PQ sidecar
    (``ann_index.py``: pq.parquet scanned for ADC affinity at ~1 byte
    per subspace vs 8-byte doubles, lists.parquet joined only for the
    rerank — a ~13x scan-IO cut vs float64 where int8 gives 4x; see
    the geometry note at ``PQ_M``).

    Determinism: codes are the :func:`pq_encode_col` contract (6-dp
    rounded L2 argmin, j-asc ties); the approximate sim divides the
    reconstruction dot by the TRUE stored norms and rounds to 6 dp;
    the rerank reuses the exact brute-force tie rules. Reference for
    the serving shape this miniaturizes: Jégou et al., "Product
    Quantization for Nearest Neighbor Search" (TPAMI 2011) — public
    literature, not reference-repo code."""
    emb = _with_norm(load_spread(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("embedding")
    ))
    cb = collect_pq_codebook(emb)
    # r15 restructure (guide §8 "decide with small rows, move big rows
    # once" + §1.2), replacing r14's eager corpus-sized localCheckpoint
    # (embedding + codes + recon pinned in executor storage for the
    # session):
    #  - the QUERY side derives from the raw scan — queries never pay
    #    the encode, and the encoded frame keeps exactly ONE consumer,
    #    so the ~32x16-entry argmin runs once per corpus vector with
    #    no materialization (nothing can re-trigger it);
    #  - the encoded frame carries only (vec_id, recon, nrm) into the
    #    pair stage — the raw embedding never rides the candidate path;
    #  - the ADC top-R window consumes (query_id, vec_id, psim) rows
    #    only (row_number <= R plans as a WindowGroupLimit: map-side
    #    top-R per task before the exchange), and the exact rerank
    #    re-joins the R survivors per query back to the cheap raw scan
    #    by id — the §8 attach step, 100 rows against a broadcast.
    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
        F.col("nrm").alias("qnrm"),
    )
    # two stacked projections: the recon gather references the code
    # array once per subspace, and CollapseProject refuses to inline a
    # multiply-referenced non-trivial alias — so the encode argmin
    # stays its own projection, evaluated once per vector, with the
    # raw embedding dropped right after it
    rec = emb.select(
        "vec_id", "nrm", pq_encode_col("embedding", cb).alias("pq"),
    ).select("vec_id", "nrm", pq_recon_col("pq", cb).alias("recon"))
    # broadcast of the N_QUERIES-row query set (the brute-ANN shape)
    pairs = rec.crossJoin(F.broadcast(q)).where(
        F.col("vec_id") != F.col("query_id"))
    psim = F.round(
        _dot(F.col("recon"), F.col("qvec"))
        / (F.col("nrm") * F.col("qnrm")), 6)
    w_r = Window.partitionBy("query_id").orderBy(
        F.desc("psim"), F.asc("vec_id"))
    top_r = (pairs.select("query_id", "vec_id", psim.alias("psim"))
             .withColumn("_rq", F.row_number().over(w_r))
             .where(F.col("_rq") <= PQ_RERANK_R)
             .select("query_id", F.col("vec_id").alias("neighbor_id")))
    nb = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("nvec"), F.col("nrm").alias("nnrm"))
    sim = _dot(F.col("nvec"), F.col("qvec")) / (
        F.col("nnrm") * F.col("qnrm"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id"))
    return (
        top_r.join(nb, "neighbor_id")
        .join(q, "query_id")
        .select("query_id", "neighbor_id", F.round(sim, 6).alias("sim"))
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= TOP_K)
    )


PQ_ANN_SQL = f"""
WITH emb AS (
    SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), mis AS (
    SELECT CAST(range AS INT) AS mi FROM range({PQ_M})
), seeds AS (
    SELECT m.mi, e.vec_id,
           ROW_NUMBER() OVER (
               PARTITION BY m.mi
               ORDER BY MD5('pq|' || CAST(m.mi AS VARCHAR) || ':'
                            || CAST(e.vec_id AS VARCHAR)),
                        e.vec_id
           ) AS rn
    FROM emb e CROSS JOIN mis m
), cb AS (
    SELECT s.mi, s.rn - 1 AS j,
           e.v[s.mi * {PQ_DSUB} + 1 : s.mi * {PQ_DSUB} + {PQ_DSUB}] AS sub
    FROM seeds s JOIN emb e ON e.vec_id = s.vec_id
    WHERE s.rn <= {PQ_KSUB}
), enc0 AS (
    SELECT e.vec_id, c.mi, c.j,
           ROUND(LIST_SUM(LIST_TRANSFORM(
               LIST_ZIP(e.v[c.mi * {PQ_DSUB} + 1 :
                            c.mi * {PQ_DSUB} + {PQ_DSUB}], c.sub),
               p -> (p[1] - p[2]) * (p[1] - p[2]))), 6) AS d
    FROM emb e CROSS JOIN cb c
), enc AS (
    SELECT vec_id, mi, j FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY vec_id, mi ORDER BY d ASC, j ASC) AS rn
        FROM enc0
    ) WHERE rn = 1
), recon AS (
    SELECT en.vec_id, FLATTEN(LIST(c.sub ORDER BY c.mi)) AS r
    FROM enc en JOIN cb c ON c.mi = en.mi AND c.j = en.j
    GROUP BY en.vec_id
), q AS (
    SELECT vec_id AS query_id, v AS qvec,
           SQRT(LIST_SUM(LIST_TRANSFORM(v, x -> x * x))) AS qnrm
    FROM emb WHERE vec_id < {N_QUERIES}
), scored AS (
    SELECT q.query_id, e.vec_id AS neighbor_id, e.v AS nvec, q.qvec,
           ROUND(
             LIST_SUM(LIST_TRANSFORM(LIST_ZIP(r.r, q.qvec),
                                     p -> p[1] * p[2]))
             / (SQRT(LIST_SUM(LIST_TRANSFORM(e.v, x -> x * x)))
                * q.qnrm), 6) AS psim
    FROM emb e JOIN recon r ON r.vec_id = e.vec_id CROSS JOIN q
    WHERE e.vec_id <> q.query_id
), top_r AS (
    SELECT query_id, neighbor_id, nvec, qvec FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY psim DESC, neighbor_id ASC
        ) AS rq FROM scored
    ) WHERE rq <= {PQ_RERANK_R}
), rer AS (
    SELECT query_id, neighbor_id,
           {_COS_SQL.format(a='nvec', b='qvec')} AS sim
    FROM top_r
), ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC
    ) AS rnk
    FROM rer
)
SELECT query_id, neighbor_id, sim, rnk FROM ranked WHERE rnk <= {TOP_K}
"""


def _plane_sql(plane) -> str:
    return "[" + ", ".join(repr(float(v)) for v in plane) + "]"


# the same seed-42 planes as float64 literals in duckdb SQL — signs of
# the projections (hence buckets) agree bit-for-bit across engines
_SRP_BUCKET_SQL = " + ".join(
    f"(CASE WHEN LIST_SUM(LIST_TRANSFORM("
    f"LIST_ZIP({_plane_sql(_SRP_PLANES[j])}, embedding::DOUBLE[]),"
    f" p -> p[1] * p[2])) > 0 THEN {1 << j} ELSE 0 END)"
    for j in range(SRP_BITS)
)

SRP_ANN_SQL = f"""
WITH emb AS (
    SELECT vec_id, embedding::DOUBLE[] AS vec,
           {_SRP_BUCKET_SQL} AS bucket
    FROM embeddings
), q AS (
    SELECT vec_id AS query_id, vec AS qvec, bucket
    FROM emb WHERE vec_id < {N_QUERIES}
), cand AS (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           {_COS_SQL.format(a='e.vec', b='q.qvec')} AS sim
    FROM emb e JOIN q ON e.bucket = q.bucket
    WHERE e.vec_id <> q.query_id
), ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC
    ) AS rnk
    FROM cand
)
SELECT query_id, neighbor_id, sim, rnk FROM ranked WHERE rnk <= {TOP_K}
"""


KMEANS_K = 8
KMEANS_ITERS = 3
# assignment strategy switch: the explicit when-chain argmin builds
# O(k^2) expression nodes (each branch wraps a least() over the
# remaining distances) — fine to ~16 clusters, hostile to codegen
# beyond; the array-fold argmin is O(k) nodes and holds to k in the
# hundreds/thousands
KMEANS_WHEN_CHAIN_MAX = 16


def _sqdist_lit(vcol, cvec) -> F.Column:
    """Rounded squared L2 distance between an array column and a
    literal centroid. Rounding to 6dp before the argmin keeps the
    engines' last-bit summation differences from ever flipping an
    assignment."""
    return F.round(
        F.aggregate(
            F.zip_with(
                vcol,
                F.array(*[F.lit(float(x)) for x in cvec]),
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )


def _assign_fold(df: DataFrame, cdict: dict) -> DataFrame:
    """Argmin over a literal array<struct<cid,cv>> via a single
    ``aggregate`` fold — the k≫16 assignment path. Semantics are
    bit-identical to the when-chain (rounded squared distances,
    earliest centroid id wins ties), so the two strategies are
    interchangeable under the SQL oracle; the plan stays O(k) nodes
    and map-side (broadcast-literal centroids, no join, no shuffle)."""
    cids = sorted(cdict)
    cents = F.array(*[
        F.struct(
            F.lit(int(c)).alias("cid"),
            F.array(*[F.lit(float(x)) for x in cdict[c]]).alias("cv"),
        )
        for c in cids
    ])

    def sqdist(cv):
        return F.round(
            F.aggregate(
                F.zip_with(F.col("v"), cv, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        )

    init = F.struct(
        F.lit(-1).cast("int").alias("cid"),
        F.lit(None).cast("double").alias("sq"),
    )

    def step(acc, cent):
        sq = sqdist(cent["cv"])
        better = acc["sq"].isNull() | (sq < acc["sq"])
        return F.when(
            better,
            F.struct(cent["cid"].alias("cid"), sq.alias("sq")),
        ).otherwise(acc)

    best = F.aggregate(cents, init, step)
    return (
        df.withColumn("_best", best)
        .withColumn("cluster", F.col("_best.cid"))
        .withColumn("sq_dist", F.col("_best.sq"))
        .drop("_best")
    )


_KMEANS_CACHE: dict = {}
_KMEANS_CACHE_MAX = 4


def clear_kmeans_cache() -> None:
    _KMEANS_CACHE.clear()


def embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means over the embedding column: deterministic init
    (the first KMEANS_K vectors by vec_id), KMEANS_ITERS fixed
    iterations, centroid means rounded to 6dp each round. The rounding
    is the cross-engine synchronization point: both engines feed the
    identical rounded centroids into the next round, so the iteration
    trajectories — and the final assignment — match bit-for-bit, which
    is what lets an inherently iterative algorithm carry a full SQL
    oracle (unrolled CTE rounds).

    Scale shape: centroids are driver-side literals (k·dim doubles),
    so assignment is pure map-side Catalyst expressions — argmin is a
    when-chain over k distance columns up to KMEANS_WHEN_CHAIN_MAX
    clusters and an O(k)-node array-fold argmin (:func:`_assign_fold`)
    beyond, NO shuffle and no window either way; the only shuffle per
    round is the partial-aggregated per-dimension mean. This is
    exactly how distributed Lloyd's is supposed to look: broadcast
    centroids out, tree-aggregate sums back.

    Compute-once per (session, dataset) — the ``materialized_clusters``
    pattern (``common.session_cached``): the trajectory is bit-exactly
    deterministic, so the checkpointed assignment IS the recomputation;
    composite consumers (``embedding_outliers`` rides it per query, and
    a bench/serving session runs both) pay the Lloyd rounds once."""
    from cloud_volume_spark.operators.common import (
        dataset_fingerprint, session_cached,
    )

    def build():
        emb = load_spread(spark, sf_dir, "embeddings").select(
            "vec_id", _as_double("embedding").alias("v")
        )
        # iterative algorithm: the parsed/casted vectors are read once
        # and cached across Lloyd rounds (KMEANS_ITERS mean jobs + the
        # final assignment all scan it) — the standard persist point
        # for distributed k-means; MEMORY_AND_DISK so a 100 TB run
        # degrades to spill, not recompute-from-parquet per round
        from pyspark import StorageLevel

        emb = emb.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            out = _kmeans_rounds(emb)
            # materialize the final assignment BEFORE releasing the
            # cache: the returned DataFrame is evaluated lazily by the
            # caller, i.e. after the finally unpersisted — the final
            # pass would silently rescan and re-cast the full parquet.
            # localCheckpoint stores just (vec_id, cluster, sq_dist).
            return out.localCheckpoint(eager=True)
        finally:
            emb.unpersist()

    return session_cached(
        _KMEANS_CACHE, spark, dataset_fingerprint(sf_dir, "embeddings"),
        build, _KMEANS_CACHE_MAX)


def _kmeans_rounds(emb: DataFrame) -> DataFrame:
    cents = {
        int(r.vec_id): [float(x) for x in r.v]
        for r in emb.where(F.col("vec_id") < KMEANS_K).collect()
    }

    def assign(df, cdict):
        if len(cdict) > KMEANS_WHEN_CHAIN_MAX:
            return _assign_fold(df, cdict)
        cids = sorted(cdict)
        dcols = {c: _sqdist_lit(F.col("v"), cdict[c]) for c in cids}
        cluster = F.lit(cids[-1])
        for idx in range(len(cids) - 2, -1, -1):
            c = cids[idx]
            rest = [dcols[c2] for c2 in cids[idx + 1:]]
            later_min = rest[0] if len(rest) == 1 else F.least(*rest)
            cluster = F.when(dcols[c] <= later_min, F.lit(c)).otherwise(cluster)
        sq = dcols[cids[-1]]
        for idx in range(len(cids) - 2, -1, -1):
            sq = F.least(dcols[cids[idx]], sq)
        return df.withColumn("cluster", cluster).withColumn("sq_dist", sq)

    # per-round means via posexplode + (cluster, pos) partial-agg: the
    # shuffle moves only partial aggregates (partitions × k × DIM rows)
    # — identical volume to a DIM-column agg, measured faster locally
    for _ in range(KMEANS_ITERS):
        means = (
            assign(emb, cents)
            .select("cluster", F.posexplode("v").alias("pos", "x"))
            .groupBy("cluster", "pos")
            # DECIMAL accumulation: double AVG sums in partial-agg
            # order, so the pre-rounding value can differ by 1 ulp
            # run-to-run and engine-to-engine, flipping ROUND(_, 6) at
            # a .5e-6 boundary. Exact order-independent decimal SUM,
            # then ONE double division + ROUND — the identical fp op
            # chain in both engines (decimal AVG itself divides with
            # engine-specific rounding, so sum/count it is)
            .agg(F.round(
                F.sum(F.col("x").cast("decimal(38,12)")).cast("double")
                / F.count("x"), 6
            ).alias("mv"))
            .collect()
        )
        nxt: dict = {}
        for r in means:
            nxt.setdefault(int(r.cluster), [0.0] * DIM)[int(r.pos)] = float(r.mv)
        cents = nxt
    return assign(emb, cents).select("vec_id", "cluster", "sq_dist")


_KM_DIST = (
    "ROUND(LIST_SUM(LIST_TRANSFORM(LIST_ZIP({v}, {c}), "
    "p -> (p[1] - p[2]) * (p[1] - p[2]))), 6)"
)


def _kmeans_sql() -> str:
    parts = [
        "emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
        f"c0 AS (SELECT vec_id AS cent_id, v AS cv FROM emb "
        f"WHERE vec_id < {KMEANS_K})",
    ]
    for t in range(KMEANS_ITERS):
        parts.append(f"""a{t} AS (
    SELECT vec_id, v, cent_id AS cluster FROM (
        SELECT e.vec_id, e.v, c.cent_id,
               ROW_NUMBER() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {_KM_DIST.format(v='e.v', c='c.cv')} ASC,
                            c.cent_id ASC
               ) AS rn
        FROM emb e CROSS JOIN c{t} c
    ) WHERE rn = 1)""")
        parts.append(f"""m{t} AS (
    SELECT cluster, i,
           ROUND(CAST(SUM(CAST(v[i] AS DECIMAL(38,12))) AS DOUBLE)
                 / COUNT(*), 6) AS mv
    FROM a{t}, UNNEST(GENERATE_SERIES(1, {DIM})) AS s(i)
    GROUP BY cluster, i)""")
        parts.append(f"""c{t + 1} AS (
    SELECT cluster AS cent_id, LIST(mv ORDER BY i) AS cv
    FROM m{t} GROUP BY cluster)""")
    final = KMEANS_ITERS
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT vec_id, cluster, sq_dist FROM (
    SELECT e.vec_id, c.cent_id AS cluster,
           {_KM_DIST.format(v='e.v', c='c.cv')} AS sq_dist,
           ROW_NUMBER() OVER (
               PARTITION BY e.vec_id
               ORDER BY {_KM_DIST.format(v='e.v', c='c.cv')} ASC,
                        c.cent_id ASC
           ) AS rn
    FROM emb e CROSS JOIN c{final} c
) WHERE rn = 1
"""
    )


KMEANS_SQL = _kmeans_sql()


def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding QA: mean, population std, min, max for
    every vector component — the table that catches dead dimensions
    (std ~ 0), mis-scaled encoders, and NaN-poisoned batches before
    they reach an index build.

    Scale: posexplode + groupBy(pos) — the dim-independent reduction
    shape shared with the kmeans paths; the shuffle carries partitions
    x dim partial rows through a constant-size plan at any embedding
    width. Determinism: exact decimal SUM then one double division +
    ROUND (the kmeans recipe — double partial-agg summation order
    could flip the 6dp rounding); std derives from the ROUNDED mean by
    the identical op chain in both engines."""
    emb = load_spread(spark, sf_dir, "embeddings").select(
        _as_double("embedding").alias("v"))
    x = emb.select(F.posexplode("v").alias("pos", "x"))
    n = F.count(F.lit(1))
    mean = F.round(
        F.sum(F.col("x").cast("decimal(38,12)")).cast("double") / n, 6)
    m2 = F.sum((F.col("x") * F.col("x"))
               .cast("decimal(38,12)")).cast("double") / n
    return (
        x.groupBy("pos")
        .agg(
            n.alias("n_vectors"),
            mean.alias("mean"),
            F.round(F.sqrt(F.greatest(m2 - mean * mean, F.lit(0.0))),
                    6).alias("std"),
            F.round(F.min("x"), 6).alias("min_x"),
            F.round(F.max("x"), 6).alias("max_x"),
        )
    )


DIM_STATS_SQL = """
WITH e AS (SELECT embedding::DOUBLE[] AS v FROM embeddings),
x AS (SELECT i - 1 AS pos, v[i] AS x
      FROM e, UNNEST(generate_series(1, len(v))) s(i))
SELECT pos, COUNT(*) AS n_vectors,
  ROUND(CAST(SUM(CAST(x AS DECIMAL(38,12))) AS DOUBLE)
        / COUNT(*), 6) AS mean,
  ROUND(SQRT(GREATEST(
    CAST(SUM(CAST(x * x AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*)
    - ROUND(CAST(SUM(CAST(x AS DECIMAL(38,12))) AS DOUBLE)
            / COUNT(*), 6)
      * ROUND(CAST(SUM(CAST(x AS DECIMAL(38,12))) AS DOUBLE)
              / COUNT(*), 6), 0)), 6) AS std,
  ROUND(MIN(x), 6) AS min_x, ROUND(MAX(x), 6) AS max_x
FROM x GROUP BY pos
"""


OUTLIER_SIGMA = 2.0  # flag vectors > mu + 2*sd from their centroid


def embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier flags: each vector's squared distance
    to its k-means centroid, z-scored against its OWN cluster's
    distance distribution — the curation signal that catches
    mis-embedded, off-distribution, or poisoned rows before they reach
    an index or a training mix (the embedding-space analog of the
    text-side quality filters). Rides :func:`embedding_kmeans`
    verbatim, so the assignment is the oracle-gated trajectory, not a
    second clustering.

    Engine-exact boundary: mu and the population sd derive from EXACT
    decimal sums of the identical sq_dist doubles (the kmeans recipe —
    a double partial-agg summation order could flip the 2-sigma cut),
    so the flag compares bit-identical values on both engines.
    Zero-variance clusters flag nothing. Scale: one |clusters|-sized
    aggregate and one broadcastable stats join over the
    already-checkpointed assignment — nothing rescans the corpus."""
    a = embedding_kmeans(spark, sf_dir)
    n = F.count(F.lit(1))
    dec = F.col("sq_dist").cast("decimal(38,12)")
    dec2 = (F.col("sq_dist") * F.col("sq_dist")).cast("decimal(38,12)")
    stats = a.groupBy("cluster").agg(
        (F.sum(dec).cast("double") / n).alias("mu"),
        F.sqrt(F.greatest(
            F.sum(dec2).cast("double") / n
            - (F.sum(dec).cast("double") / n)
            * (F.sum(dec).cast("double") / n),
            F.lit(0.0))).alias("sd"),
    )
    return (
        a.join(stats, "cluster")
        .select(
            "vec_id", "cluster",
            F.floor(F.col("sq_dist") * 10000 + 0.5).cast("bigint")
            .alias("sq_dist_e4"),
            ((F.col("sd") > 0)
             & (F.col("sq_dist") - F.col("mu")
                > OUTLIER_SIGMA * F.col("sd")))
            .cast("int").alias("is_outlier"),
        )
    )


EMBEDDING_OUTLIERS_SQL = f"""
WITH base AS (
{KMEANS_SQL}
), stats AS (
    SELECT cluster,
           CAST(SUM(CAST(sq_dist AS DECIMAL(38,12))) AS DOUBLE)
               / COUNT(*) AS mu,
           SQRT(GREATEST(
               CAST(SUM(CAST(sq_dist * sq_dist AS DECIMAL(38,12)))
                    AS DOUBLE) / COUNT(*)
               - (CAST(SUM(CAST(sq_dist AS DECIMAL(38,12))) AS DOUBLE)
                  / COUNT(*))
               * (CAST(SUM(CAST(sq_dist AS DECIMAL(38,12))) AS DOUBLE)
                  / COUNT(*)),
               0)) AS sd
    FROM base GROUP BY cluster
)
SELECT b.vec_id, b.cluster,
       FLOOR(b.sq_dist * 10000 + 0.5)::BIGINT AS sq_dist_e4,
       (CASE WHEN s.sd > 0
                  AND b.sq_dist - s.mu > {OUTLIER_SIGMA} * s.sd
             THEN 1 ELSE 0 END)::INT AS is_outlier
FROM base b JOIN stats s USING (cluster)
"""


# ---- fused embedding curation riding the persistent IVF index -------

_IVF_INDEX_CACHE: dict = {}
_IVF_INDEX_CACHE_MAX = 4


def clear_ivf_index_cache() -> None:
    """Drop every cached standing index AND its on-disk directory
    (mkdtemp artifacts are not reaped between reboots; registered
    atexit so a clean session exit leaves no index copies in /tmp)."""
    from cloud_volume_spark.operators.common import (
        drain_cache, evict_index_dir,
    )
    drain_cache(_IVF_INDEX_CACHE, evict_index_dir)


atexit.register(clear_ivf_index_cache)


def _standing_ivf_index(spark: SparkSession, sf_dir: str):
    """The standing embedding index with build-once semantics per
    (session, dataset) — sample centroids (the oracle-expressible
    quantizer) + the int8 sidecar, so every index-riding operator
    (curation here, plus ad-hoc ``search``/``search_int8``) shares ONE
    persisted assignment. Cache mechanics: ``common.session_cached``."""
    import tempfile

    from cloud_volume_spark.ann_index import build_ivf_index
    from cloud_volume_spark.operators.common import (
        dataset_fingerprint, evict_index_dir, session_cached,
    )

    def build():
        emb = load_spread(spark, sf_dir, "embeddings").select(
            "vec_id", "embedding")
        return build_ivf_index(
            emb, tempfile.mkdtemp(prefix="cvs_ivf_idx_"),
            nlist=SEMDEDUP_NLIST, centroid_base_id=100,
            centroids="sample", int8=True)

    return session_cached(
        _IVF_INDEX_CACHE, spark,
        dataset_fingerprint(sf_dir, "embeddings"), build,
        _IVF_INDEX_CACHE_MAX, evict=evict_index_dir)


def embedding_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fused embedding-curation flagship (the embedding analog of
    ``corpus_curate``): semantic-dedup keep flag ∧ centroid-affinity
    outlier flag ∧ int8 quantization scale, in ONE plan that RIDES the
    persisted IVF index — the assignment is READ from the index's
    inverted lists (``lists.parquet``), never recomputed, and the raw
    embeddings table never appears in the plan (plan-gated).

    Legs, all off the same lists scan:
    - dedup: within-cluster lower-id neighbor with cosine >=
      SEMDEDUP_T (the SemDeDup rule ``semantic_dedup`` oracles) —
      bounded per-cluster self-join, never N×N;
    - outlier: cosine to the OWN centroid, z-scored per cluster with
      exact decimal sums (the ``embedding_outliers`` recipe applied to
      centroid affinity — low affinity = off-distribution for its own
      list, the IVF-native outlier signal);
    - quantize: the per-row int8 scale factor (``int8_codes``
      contract), map-only.

    ``is_curated`` = kept by dedup ∧ not an outlier — the single flag
    a training-mix builder consumes. Scale: one pruned-column scan of
    the lists per leg + one |clusters|-row stats join + a broadcast
    centroid join; at 100 TB each leg is a map-side pass over the
    already-partitioned index, and the only shuffles are the
    cluster-bounded self-join and two tiny aggregates."""
    idx = _standing_ivf_index(spark, sf_dir)
    assign = idx.lists()  # vec_id, embedding, nrm, cent_id — persisted
    cents = idx.centroids()  # cent_id, cvec, cnrm

    # ---- dedup leg (SemDeDup within-cluster rule)
    a = assign.select(
        "cent_id", F.col("vec_id").alias("id_hi"),
        F.col("embedding").alias("e_hi"), F.col("nrm").alias("n_hi"))
    b = assign.select(
        "cent_id", F.col("vec_id").alias("id_lo"),
        F.col("embedding").alias("e_lo"), F.col("nrm").alias("n_lo"))
    pair_sim = F.round(
        _dot(F.col("e_hi"), F.col("e_lo"))
        / (F.col("n_hi") * F.col("n_lo")), 6)
    dups = (
        a.join(b, on="cent_id")
        .where(F.col("id_hi") > F.col("id_lo"))
        .where(pair_sim >= SEMDEDUP_T)
        .groupBy(F.col("id_hi").alias("vec_id"))
        .agg(F.count(F.lit(1)).alias("n_dups")))

    # ---- outlier leg (centroid affinity, decimal-exact z-score)
    csim = F.round(
        _dot(F.col("embedding"), F.col("cvec"))
        / (F.col("nrm") * F.col("cnrm")), 6)
    aff = (assign.join(F.broadcast(cents), on="cent_id")
           .select("vec_id", "cent_id", "embedding",
                   csim.alias("csim")))
    n = F.count(F.lit(1))
    dec = F.col("csim").cast("decimal(38,12)")
    dec2 = (F.col("csim") * F.col("csim")).cast("decimal(38,12)")
    stats = aff.groupBy("cent_id").agg(
        (F.sum(dec).cast("double") / n).alias("mu"),
        F.sqrt(F.greatest(
            F.sum(dec2).cast("double") / n
            - (F.sum(dec).cast("double") / n)
            * (F.sum(dec).cast("double") / n),
            F.lit(0.0))).alias("sd"))

    # ---- quantize leg (map-only int8 scale): THE shared contract —
    # int8_codes(keep_scale=True) — so a rounding edit there cannot
    # fork this flag's q_scale from the codes it describes; the
    # unused q/sq projections are pruned by Catalyst
    aff = int8_codes(aff, "embedding", keep_scale=True)

    return (
        aff.join(stats, "cent_id")
        .join(dups, "vec_id", "left")
        .select(
            "vec_id", "cent_id",
            F.coalesce("n_dups", F.lit(0)).cast("bigint")
            .alias("n_dups"),
            ((F.col("sd") > 0)
             & (F.col("mu") - F.col("csim")
                > OUTLIER_SIGMA * F.col("sd")))
            .cast("int").alias("is_outlier"),
            F.round("scale", 9).alias("q_scale"),
            ((F.coalesce("n_dups", F.lit(0)) == 0)
             & ~((F.col("sd") > 0)
                 & (F.col("mu") - F.col("csim")
                    > OUTLIER_SIGMA * F.col("sd"))))
            .cast("int").alias("is_curated")))


EMBEDDING_CURATE_SQL = f"""
WITH emb AS (
    SELECT vec_id, embedding::DOUBLE[] AS embedding FROM embeddings
), cents AS (
    SELECT vec_id AS cent_id, embedding AS cvec FROM emb
    WHERE vec_id >= 100 AND vec_id < {100 + SEMDEDUP_NLIST}
), assign AS (
    SELECT vec_id, embedding, cent_id FROM (
        SELECT e.vec_id, e.embedding, c.cent_id,
               ROW_NUMBER() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {{cos}} DESC, c.cent_id ASC
               ) AS crnk
        FROM emb e CROSS JOIN cents c
    ) WHERE crnk = 1
), dups AS (
    SELECT hi.vec_id AS vec_id, COUNT(*) AS n_dups
    FROM assign hi JOIN assign lo
      ON hi.cent_id = lo.cent_id AND hi.vec_id > lo.vec_id
    WHERE {{sim}} >= {SEMDEDUP_T}
    GROUP BY hi.vec_id
), aff AS (
    SELECT a.vec_id, a.cent_id, a.embedding,
           {{acos}} AS csim
    FROM assign a JOIN cents c ON a.cent_id = c.cent_id
), stats AS (
    SELECT cent_id,
           CAST(SUM(CAST(csim AS DECIMAL(38,12))) AS DOUBLE)
               / COUNT(*) AS mu,
           SQRT(GREATEST(
               CAST(SUM(CAST(csim * csim AS DECIMAL(38,12)))
                    AS DOUBLE) / COUNT(*)
               - (CAST(SUM(CAST(csim AS DECIMAL(38,12))) AS DOUBLE)
                  / COUNT(*))
               * (CAST(SUM(CAST(csim AS DECIMAL(38,12))) AS DOUBLE)
                  / COUNT(*)),
               0)) AS sd
    FROM aff GROUP BY cent_id
)
SELECT f.vec_id, f.cent_id,
       COALESCE(d.n_dups, 0)::BIGINT AS n_dups,
       (CASE WHEN s.sd > 0 AND s.mu - f.csim > {OUTLIER_SIGMA} * s.sd
             THEN 1 ELSE 0 END)::INT AS is_outlier,
       ROUND(GREATEST(
           LIST_MAX(LIST_TRANSFORM(f.embedding, y -> ABS(y))), 1e-12
       ) / 127.0, 9) AS q_scale,
       (CASE WHEN COALESCE(d.n_dups, 0) = 0
                  AND NOT (s.sd > 0
                           AND s.mu - f.csim > {OUTLIER_SIGMA} * s.sd)
             THEN 1 ELSE 0 END)::INT AS is_curated
FROM aff f
JOIN stats s ON f.cent_id = s.cent_id
LEFT JOIN dups d ON d.vec_id = f.vec_id
"""

EMBEDDING_CURATE_SQL = EMBEDDING_CURATE_SQL.format(
    cos=_COS_SQL.format(a="e.embedding", b="c.cvec"),
    sim=_COS_SQL.format(a="hi.embedding", b="lo.embedding"),
    acos=_COS_SQL.format(a="a.embedding", b="c.cvec"),
)


QUERIES = {
    # new-this-round first: registration order feeds the driver's
    # 50-query window (see operators/__init__.py)
    "pq_ann_topk": pq_ann_topk,
    "embedding_quantize_int8": embedding_quantize_int8,
    "ann_topk_cosine": ann_topk_cosine,
    "embedding_neardup_pairs": embedding_neardup_pairs,
    "embedding_dedup_keep": embedding_dedup_keep,
    "semantic_dedup": semantic_dedup,
    "srp_ann_topk": srp_ann_topk,
    "ivf_ann_topk": ivf_ann_topk,
    "ivf_ann_topk_int8": ivf_ann_topk_int8,
    "embedding_curate": embedding_curate,
    "embedding_kmeans": embedding_kmeans,
    "embedding_dim_stats": embedding_dim_stats,
    "embedding_outliers": embedding_outliers,
}

ORACLE_SQL = {
    "pq_ann_topk": PQ_ANN_SQL,
    "embedding_quantize_int8": QUANT_INT8_SQL,
    "ann_topk_cosine": ANN_TOPK_SQL,
    "embedding_neardup_pairs": NEARDUP_SQL,
    "embedding_dedup_keep": EMBEDDING_DEDUP_KEEP_SQL,
    "semantic_dedup": SEMDEDUP_SQL,
    "srp_ann_topk": SRP_ANN_SQL,
    "ivf_ann_topk": IVF_ANN_SQL,
    "ivf_ann_topk_int8": IVF_INT8_SQL,
    "embedding_curate": EMBEDDING_CURATE_SQL,
    "embedding_kmeans": KMEANS_SQL,
    "embedding_dim_stats": DIM_STATS_SQL,
    "embedding_outliers": EMBEDDING_OUTLIERS_SQL,
}
