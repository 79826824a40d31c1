"""Connected-components paths: the driver union-find fast path and the
distributed min-label-propagation path must produce the identical
labeling, the distributed path must fail loudly on non-convergence,
and the materialized cluster map must be compute-once per session."""

import pytest

from cloud_volume_spark.operators import dedup


def _labels(df):
    return {(r.doc_id, r.cluster_id) for r in df.collect()}


def test_distributed_cc_matches_union_find(spark, sf_dir, monkeypatch):
    fast = _labels(dedup.dedup_clusters(spark, sf_dir))
    # force the >CC_SMALL_EDGES branch: same fixpoint, executor-side
    monkeypatch.setattr(dedup, "CC_SMALL_EDGES", -1)
    dist = _labels(dedup.dedup_clusters(spark, sf_dir))
    assert dist == fast
    # sanity: the fixture actually contains non-singleton clusters
    assert any(d != c for d, c in fast)


def test_distributed_cc_raises_on_nonconvergence(spark, sf_dir, monkeypatch):
    monkeypatch.setattr(dedup, "CC_SMALL_EDGES", -1)
    monkeypatch.setattr(dedup, "MAX_CC_ITERS", 0)
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.dedup_clusters(spark, sf_dir)


def test_materialized_clusters_is_compute_once(spark, sf_dir):
    a = dedup.materialized_clusters(spark, sf_dir)
    b = dedup.materialized_clusters(spark, sf_dir)
    assert a is b
    assert _labels(a) == _labels(dedup.dedup_clusters(spark, sf_dir))


def test_cluster_cache_evicts_and_unpersists(spark, sf_dir, monkeypatch):
    """The materialized-cluster cache is bounded: beyond
    _CLUSTER_CACHE_MAX the oldest entry is unpersisted and dropped."""
    from cloud_volume_spark.operators import dedup
    dedup.clear_cluster_cache()
    monkeypatch.setattr(dedup, "_CLUSTER_CACHE_MAX", 2)
    app = spark.sparkContext.applicationId
    d1 = spark.range(1).persist()
    d1.count()
    d2 = spark.range(2).persist()
    d2.count()
    dedup._CLUSTER_CACHE[(app, ("x", 0, 0))] = d1
    dedup._CLUSTER_CACHE[(app, ("y", 0, 0))] = d2
    df = dedup.materialized_clusters(spark, sf_dir)
    assert df is dedup.materialized_clusters(spark, sf_dir)  # cache hit
    assert (app, ("x", 0, 0)) not in dedup._CLUSTER_CACHE  # oldest out
    assert not d1.storageLevel.useMemory  # and unpersisted
    assert d2.storageLevel.useMemory  # newer synthetic entry survives
    dedup.clear_cluster_cache()
    assert not df.storageLevel.useMemory


def test_chain_graph_converges_via_pointer_jumping(spark, monkeypatch):
    """A 50-node path graph has diameter 49 — plain min-label
    propagation would need 49 rounds (> MAX_CC_ITERS) but pointer
    jumping collapses it in ~log2(49) label compositions. The labeling
    must still match the driver union-find answer (everything in one
    component labeled by the min id)."""
    monkeypatch.setattr(dedup, "CC_SMALL_EDGES", -1)
    n = 50
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "u long, v long"
    )
    out = _labels(dedup.connected_components(spark, nodes, pairs))
    assert out == {(i, 0) for i in range(n)}


def test_two_chains_and_singleton(spark, monkeypatch):
    monkeypatch.setattr(dedup, "CC_SMALL_EDGES", -1)
    nodes = spark.createDataFrame([(i,) for i in range(61)], "doc_id long")
    pairs = spark.createDataFrame(
        # chain 0..29 wired high-to-low, chain 30..59 low-to-high, 60 isolated
        [(i + 1, i) for i in range(29)] + [(i, i + 1) for i in range(30, 59)],
        "u long, v long",
    )
    out = _labels(dedup.connected_components(spark, nodes, pairs))
    want = {(i, 0) for i in range(30)} | {(i, 30) for i in range(30, 60)} | {(60, 60)}
    assert out == want


def test_hamming_k_banded_equals_bruteforce(spark, sf_dir):
    """Pigeonhole completeness of the generalized Hamming join: with
    k+1 bands, EVERY pair within distance k agrees on at least one
    full band, so the banded equi-join must return exactly the
    all-pairs truth (the band cap has headroom at this corpus size —
    if it ever binds here the construction, not the host, changed)."""
    from pyspark.sql import functions as F

    from cloud_volume_spark.operators.dedup import (
        SIMHASH_K_MAX_HAMMING, _simhash_wide, simhash_hamming_k_pairs)

    sims = _simhash_wide(spark, sf_dir).cache()
    try:
        a = sims.select(F.col("doc_id").alias("doc_a"),
                        F.col("simhash").alias("sh_a"))
        b = sims.select(F.col("doc_id").alias("doc_b"),
                        F.col("simhash").alias("sh_b"))
        brute = (
            a.crossJoin(b).where(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b",
                    F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
                    .cast("int").alias("hamming"))
            .where(F.col("hamming") <= SIMHASH_K_MAX_HAMMING))
        want = {tuple(r) for r in brute.collect()}
        got = {tuple(r) for r in
               simhash_hamming_k_pairs(spark, sf_dir).collect()}
        assert got == want and len(got) > 0
    finally:
        sims.unpersist()
