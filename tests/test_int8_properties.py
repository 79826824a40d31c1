"""Properties of the shared int8 quantization contract
(similarity.int8_codes / int8_qsim) and its interaction with the
kmeans-mode IVF index — the mathematical guarantees the serving paths
lean on, checked against numpy on adversarial magnitudes."""

import os
import sys

import numpy as np
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cloud_volume_spark.ann_index import _codes_frame, build_ivf_index
from cloud_volume_spark.operators.common import load
from cloud_volume_spark.operators.similarity import int8_codes, int8_qsim


def test_int8_codes_mathematical_properties(spark):
    """For any input vector: components bounded by ±127, sq >= 1,
    scale > 0, and the reconstruction error per component is at most
    scale/2 (the round-to-nearest guarantee floor(x/s + .5) carries) —
    across magnitudes from denormal-adjacent to 1e4 and a constant
    vector."""
    rng = np.random.default_rng(5)
    vecs = [rng.standard_normal(32) * s for s in (1e-3, 1.0, 100.0, 1e4)]
    vecs += [np.full(16, 7.0), np.array([1e-15] * 8), -np.ones(4)]
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, v array<double>")
    rows = {r["vec_id"]: r
            for r in int8_codes(df, "v", keep_scale=True).collect()}
    assert len(rows) == len(vecs)
    for i, x in enumerate(vecs):
        r = rows[i]
        q = np.asarray(r["q"], dtype=np.float64)
        scale = float(r["scale"])
        assert scale > 0
        assert int(r["sq"]) >= 1
        assert np.all(np.abs(q) <= 127), (i, q)
        # round-to-nearest reconstruction: |q*scale - x| <= scale/2
        # (the 1e-12 floor in maxabs only ever LOOSENS the bound for
        # near-zero vectors, where scale/2 >> |x|)
        assert np.all(np.abs(q * scale - x) <= scale / 2 + 1e-18), i
        # sq is exactly the integer sum of squares (floored at 1)
        assert int(r["sq"]) == max(int((q * q).sum()), 1)


def test_int8_qsim_tracks_exact_cosine(spark):
    """The quantized cosine over well-conditioned unit-scale vectors
    stays within the analytic quantization envelope of the exact
    cosine (empirically << 0.02 at dim 64), and is exactly symmetric
    under argument swap."""
    rng = np.random.default_rng(11)
    vecs = [rng.standard_normal(64) for _ in range(12)]
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, v array<double>")
    coded = int8_codes(df, "v")
    a = coded.select(F.col("vec_id").alias("ia"),
                     F.col("q").alias("qa"), F.col("sq").alias("sa"))
    b = coded.select(F.col("vec_id").alias("ib"),
                     F.col("q").alias("qb"), F.col("sq").alias("sb"))
    got = {(r["ia"], r["ib"]): r["qsim"] for r in
           a.crossJoin(b).select(
               "ia", "ib",
               int8_qsim(F.col("qa"), F.col("qb"),
                         F.col("sa"), F.col("sb")).alias("qsim"))
           .collect()}
    V = np.stack(vecs)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    cos = Vn @ Vn.T
    for (i, j), q in got.items():
        assert abs(q - cos[i, j]) < 0.02, (i, j, q, cos[i, j])
        assert got[(j, i)] == q  # exact symmetry (integer dot)


def test_int8_sidecar_on_kmeans_index(spark, sf_dir, tmp_path):
    """The int8 sidecar is centroid-mode independent: on a
    kmeans-quantizer index the codes equal a fresh quantization of the
    lists, and search_int8 with full rerank equals the float search at
    every nprobe."""
    emb = load(spark, sf_dir, "embeddings")
    idx = build_ivf_index(emb, str(tmp_path / "km8"), nlist=8,
                          centroids="kmeans", kmeans_rounds=2,
                          int8=True)
    got = sorted((r["vec_id"], tuple(r["q"]), r["sq"], r["cent_id"])
                 for r in idx.codes().collect())
    want = sorted((r["vec_id"], tuple(r["q"]), r["sq"], r["cent_id"])
                  for r in _codes_frame(idx.lists()).collect())
    assert got == want and len(got) == idx.meta["count"]
    q = emb.where(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"))
    n = int(idx.meta["count"])
    for nprobe in (2, 8):
        a = sorted(map(tuple, idx.search_int8(
            q, k=4, nprobe=nprobe, rerank_r=n)
            .select("query_id", "rnk", "neighbor_id", "sim").collect()))
        b = sorted(map(tuple, idx.search(q, k=4, nprobe=nprobe)
                       .select("query_id", "rnk", "neighbor_id", "sim")
                       .collect()))
        assert a == b and len(a) > 0
