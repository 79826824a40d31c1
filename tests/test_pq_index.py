"""Product-quantization sidecar (full IVF-PQ): build → serve → mutate.

The PQ path is the third representation of one index (floats, int8,
PQ codes) and every contract here pins it to the others: codes are the
``similarity.pq_encode_col`` contract the oracle-gated ``pq_ann_topk``
runs, the ADC+rerank serving path degrades to EXACT equality with the
float search when nothing is pruned, and every mutation keeps the
sidecar equal to a fresh encode of the persisted float lists."""

import re
import shutil

import pytest
from pyspark.sql import functions as F

from cloud_volume_spark.ann_index import (
    _pq_frame, build_ivf_index,
)
from cloud_volume_spark.operators.common import load
from cloud_volume_spark.operators.similarity import (
    N_QUERIES, NLIST, NPROBE, PQ_KSUB, PQ_M, TOP_K,
    collect_pq_codebook, pq_encode_col, _as_double, _with_norm,
)


def _queries(spark, sf_dir):
    return load(spark, sf_dir, "embeddings").where(
        F.col("vec_id") < N_QUERIES
    ).select(F.col("vec_id").alias("query_id"),
             F.col("embedding").alias("qvec"))


def _canon(df):
    return sorted((r["query_id"], r["rnk"], r["neighbor_id"], r["sim"])
                  for r in df.collect())


@pytest.fixture(scope="module")
def indexpq(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ivfpq") / "idx")
    emb = load(spark, sf_dir, "embeddings")
    return build_ivf_index(emb, out, nlist=NLIST, centroid_base_id=100,
                           centroids="sample", pq=True)


def test_pq_full_rerank_equals_float_search(spark, sf_dir, indexpq):
    """With rerank_r >= every probed candidate the ADC stage prunes
    nothing and search_pq == the float search exactly — at
    nprobe=nlist that is the exact brute-force contract."""
    n = int(indexpq.meta["count"])
    got = _canon(indexpq.search_pq(
        _queries(spark, sf_dir), k=TOP_K, nprobe=NLIST, rerank_r=n))
    want = _canon(indexpq.search(
        _queries(spark, sf_dir), k=TOP_K, nprobe=NLIST))
    assert got == want and len(got) > 0


def test_pq_sidecar_is_the_operator_encode_contract(spark, sf_dir,
                                                    indexpq):
    """The persisted codes must equal ``pq_encode_col`` against the
    codebook the OPERATOR derives from the same corpus — serving and
    oracle share one encode, one tie-break, one codebook recipe."""
    emb = _with_norm(load(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("embedding")))
    cb = collect_pq_codebook(emb)
    want = sorted(
        (r["vec_id"], tuple(int(x) for x in r["pq"]))
        for r in emb.select(
            "vec_id",
            pq_encode_col("embedding", cb).alias("pq")).collect())
    got = sorted(
        (r["vec_id"], tuple(int(x) for x in r["pq"]))
        for r in indexpq.pq_codes().collect())
    assert got == want and len(got) == int(indexpq.meta["count"])
    # geometry is stamped in the meta and the codebook is full
    assert indexpq.meta["pq_m"] == PQ_M
    assert indexpq.meta["pq_ksub"] == PQ_KSUB
    assert indexpq.pq_codebook().count() == PQ_M * PQ_KSUB


def test_pq_codes_track_lifecycle(spark, sf_dir, tmp_path):
    """add/remove/compact/retrain maintain the PQ sidecar: after any
    mutation the persisted codes equal a fresh encode (FROZEN
    codebook) of the persisted float lists, and search_pq serves."""
    emb = load(spark, sf_dir, "embeddings")
    half_a = emb.where(F.col("vec_id") < 300)
    half_b = emb.where(F.col("vec_id") >= 300)
    idx = build_ivf_index(half_a, str(tmp_path / "ipq"), nlist=4,
                          centroid_base_id=100, pq=True)

    def cb_rows():
        return sorted(
            (int(r["mi"]), int(r["j"]), tuple(r["sub"]))
            for r in idx.pq_codebook().collect())

    cb_before = cb_rows()

    def pq_ok():
        got = sorted(
            (r["vec_id"], tuple(int(x) for x in r["pq"]),
             r["nrm"], r["cent_id"])
            for r in idx.pq_codes().collect())
        want = sorted(
            (r["vec_id"], tuple(int(x) for x in r["pq"]),
             r["nrm"], r["cent_id"])
            for r in _pq_frame(idx.lists(), idx._pq_cb()).collect())
        assert got == want and len(got) == idx.meta["count"]

    pq_ok()
    idx.add(half_b)
    pq_ok()
    victims = [int(r["vec_id"]) for r in half_b.limit(5).collect()]
    assert idx.remove(victims) == 5
    pq_ok()
    assert idx.pq_codes().where(
        F.col("vec_id").isin(victims)).count() == 0
    rewritten = idx.compact_lists(max_files_per_list=1)
    assert rewritten > 0
    assert 0 < idx.last_pq_compacted <= int(idx.meta["nlist"])
    pq_ok()
    # retrain migrates rows between partitions; the codebook must NOT
    # move (codes are centroid-independent) and the sidecar must
    # mirror the migration
    res = idx.retrain(sample_frac=1.0, rounds=1, move_threshold=-1.0)
    assert res["moved"], "forced-threshold retrain must move lists"
    pq_ok()
    assert cb_rows() == cb_before
    out = idx.search_pq(_queries(spark, sf_dir), k=3, nprobe=2)
    assert out.count() > 0


def test_sync_pq_heals_torn_mutations(spark, sf_dir, tmp_path):
    """The two-write crash window, PQ edition: a torn add (lists
    committed, pq not) and a torn remove (stale pq rows still serving
    removed ids) both detected and healed; consistent sidecar = 0."""
    emb = load(spark, sf_dir, "embeddings")
    idx = build_ivf_index(emb.where(F.col("vec_id") < 400),
                          str(tmp_path / "syncpq"), nlist=4,
                          centroid_base_id=100, pq=True)
    assert idx.sync_pq() == 0

    def pq_ok():
        got = sorted((r["vec_id"], r["cent_id"])
                     for r in idx.pq_codes().collect())
        want = sorted((r["vec_id"], r["cent_id"])
                      for r in idx.lists().collect())
        assert got == want

    victim = int(idx.pq_codes().select("cent_id").first()["cent_id"])
    shutil.rmtree(f"{idx.path}/pq.parquet/cent_id={victim}")
    assert idx.sync_pq() == 1
    pq_ok()

    stale = _pq_frame(
        idx.lists().where(F.col("cent_id") == victim).limit(3),
        idx._pq_cb())
    (stale.repartition("cent_id")
     .write.mode("append").partitionBy("cent_id")
     .parquet(f"{idx.path}/pq.parquet"))
    assert idx.sync_pq() == 1
    pq_ok()
    assert idx.sync_pq() == 0
    # break_lock heals a crashed writer's leftovers (the int8 rule)
    open(idx._lock_path, "w").close()
    with pytest.raises(RuntimeError, match="break_lock"):
        idx.sync_pq()
    assert idx.sync_pq(break_lock=True) == 0
    assert idx.search_pq(_queries(spark, sf_dir), k=3,
                         nprobe=2).count() > 0


def test_pq_guards(spark, sf_dir, tmp_path, indexpq):
    """Loud refusals: pq_m must tile the dimension, pq_ksub must fit
    tinyint, non-PQ indexes refuse the PQ surface, rerank_r >= k."""
    emb = load(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="divide"):
        build_ivf_index(emb, str(tmp_path / "bad1"), nlist=4,
                        centroid_base_id=100, pq=True, pq_m=7)
    with pytest.raises(ValueError, match="tinyint"):
        build_ivf_index(emb, str(tmp_path / "bad2"), nlist=4,
                        centroid_base_id=100, pq=True, pq_ksub=200)
    plain = build_ivf_index(emb.where(F.col("vec_id") < 200),
                            str(tmp_path / "plain"), nlist=4,
                            centroid_base_id=100)
    with pytest.raises(ValueError, match="pq"):
        plain.pq_codes()
    with pytest.raises(ValueError, match="pq"):
        plain.search_pq(_queries(spark, sf_dir))
    with pytest.raises(ValueError, match="pq"):
        plain.sync_pq()
    with pytest.raises(ValueError, match="rerank_r"):
        indexpq.search_pq(_queries(spark, sf_dir), k=5, rerank_r=2)


def test_pq_scan_prunes_and_skips_floats(spark, sf_dir, indexpq):
    """The 100 TB contract: the pq.parquet scan carries the probed
    cent_id literals as PartitionFilters and never reads the float
    embedding column (codes + nrm only); the float lists are read
    only by the rerank join. No cartesians, no Python eval."""
    df = indexpq.search_pq(_queries(spark, sf_dir), k=TOP_K,
                           nprobe=2, rerank_r=TOP_K)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    assert "pq.parquet" in plan
    assert "PartitionFilters" in plan
    blocks = re.split(r"\n\(\d+\) ", plan)
    pq_scans = [b for b in blocks if "pq.parquet" in b
                and "ReadSchema" in b]
    assert pq_scans, plan
    for b in pq_scans:
        assert "embedding" not in b, b
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
