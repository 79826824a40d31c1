"""kmeans assignment strategies: the when-chain (small k) and the
array-fold (large k) must agree exactly — same rounded distances, same
earliest-id tie rule."""

import numpy as np

from cloud_volume_spark.operators import similarity as S


def _run(spark, sf_dir):
    return {
        (r.vec_id, r.cluster, r.sq_dist)
        for r in S.embedding_kmeans(spark, sf_dir).collect()
    }


def test_fold_assignment_matches_when_chain(spark, sf_dir, monkeypatch):
    want = _run(spark, sf_dir)
    monkeypatch.setattr(S, "KMEANS_WHEN_CHAIN_MAX", 0)  # force fold path
    got = _run(spark, sf_dir)
    assert got == want


def test_fold_assignment_large_k_matches_numpy(spark, sf_dir):
    """k=40 (beyond the when-chain limit) against a numpy argmin with
    the same 6dp rounding — the plan the operator would use at real
    cluster counts."""
    from pyspark.sql import functions as F

    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        )
    )
    rows = emb.where(F.col("vec_id") < 40).collect()
    cdict = {int(r.vec_id): [float(x) for x in r.v] for r in rows}
    got = {
        (r.vec_id, r.cluster, r.sq_dist)
        for r in S._assign_fold(emb, cdict)
        .select("vec_id", "cluster", "sq_dist").collect()
    }

    V = np.array(
        [[float(x) for x in r.v] for r in emb.collect()], dtype=np.float64
    )
    ids = [int(r.vec_id) for r in emb.collect()]
    C = np.array([cdict[c] for c in sorted(cdict)], dtype=np.float64)
    cids = sorted(cdict)
    d = np.round(((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2), 6)
    arg = d.argmin(axis=1)  # numpy argmin keeps first on ties
    want = {
        (ids[i], cids[arg[i]], float(d[i, arg[i]])) for i in range(len(ids))
    }
    assert got == want


def test_assign_fold_matches_rank_centroids(spark, sf_dir):
    """The map-side assign_fold (r14) must reproduce the window form
    (rank_centroids crnk == 1) exactly: same rounded-6dp cosine argmax,
    same lowest-cent_id tie rule — on the real embeddings table."""
    from pyspark.sql import functions as F

    from cloud_volume_spark.operators.common import load
    from cloud_volume_spark.operators.similarity import (
        SEMDEDUP_NLIST, _as_double, _centroid_frame, _with_norm,
        assign_fold, rank_centroids,
    )

    emb = _with_norm(
        load(spark, sf_dir, "embeddings")
        .select("vec_id", _as_double("embedding").alias("embedding"))
    )
    cents = _centroid_frame(emb, 100, SEMDEDUP_NLIST)
    via_window = {
        (r.vec_id, r.cent_id)
        for r in rank_centroids(emb, cents)
        .where(F.col("crnk") == 1)
        .select("vec_id", "cent_id").collect()
    }
    via_fold = {
        (r.vec_id, r.cent_id)
        for r in assign_fold(emb, cents)
        .select("vec_id", "cent_id").collect()
    }
    assert via_fold == via_window
