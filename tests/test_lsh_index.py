"""Persistent MinHash-LSH band index lifecycle (lsh_index.py): the
search contract (lookup ≡ the oracle-gated recompute path,
bit-identically), the incremental contract (build(half)+add(rest) ≡
build(full)), delta-bounded remove/compact, the mutation lock, and the
pruned-scan plan gate."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cloud_volume_spark.lsh_index import LSHIndex, build_lsh_index
from cloud_volume_spark.operators.common import load
from cloud_volume_spark.operators.dedup import INGEST_MOD, dedup_incremental


def _corpus(spark, sf_dir):
    return load(spark, sf_dir, "documents").where(
        F.col("doc_id") % INGEST_MOD != 0).select("doc_id", "text")


def _batch(spark, sf_dir):
    return load(spark, sf_dir, "documents").where(
        F.col("doc_id") % INGEST_MOD == 0).select("doc_id", "text")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def built(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("lsh") / "idx")
    return build_lsh_index(_corpus(spark, sf_dir), path)


def test_lookup_matches_recompute_path_exactly(spark, sf_dir, built):
    got = _rows(built.lookup(_batch(spark, sf_dir)))
    want = _rows(dedup_incremental(spark, sf_dir))
    assert got == want


def test_meta_counts_and_reopen(spark, sf_dir, built):
    n = _corpus(spark, sf_dir).count()
    assert built.meta["count"] == n
    re = LSHIndex.open(spark, built.path)
    assert re.meta == built.meta
    assert re.indexed_ids().count() == n
    assert built.refresh_count() == n


def test_build_half_plus_add_equals_build_full(spark, sf_dir, tmp_path):
    corpus = _corpus(spark, sf_dir)
    half_a = corpus.where(F.col("doc_id") % 2 == 1)
    half_b = corpus.where(F.col("doc_id") % 2 == 0)
    idx = build_lsh_index(half_a, str(tmp_path / "inc"))
    added = idx.add(half_b)
    assert added == half_b.count()
    full = build_lsh_index(corpus, str(tmp_path / "full"))
    assert _rows(idx.bands()) == _rows(full.bands())
    assert idx.meta["count"] == full.meta["count"]
    got = _rows(idx.lookup(_batch(spark, sf_dir)))
    want = _rows(dedup_incremental(spark, sf_dir))
    assert got == want


def test_add_refuses_duplicates_and_empty_is_noop(spark, sf_dir, tmp_path):
    corpus = _corpus(spark, sf_dir)
    idx = build_lsh_index(corpus.limit(50), str(tmp_path / "dup"))
    with pytest.raises(ValueError, match="already indexed"):
        idx.add(corpus.limit(10))
    assert idx.add(corpus.limit(0)) == 0


def test_build_validates_batch(spark, tmp_path):
    bad = spark.createDataFrame(
        [(1, "alpha"), (1, "beta")], "doc_id long, text string")
    with pytest.raises(ValueError, match="duplicate doc_ids"):
        build_lsh_index(bad, str(tmp_path / "v1"))
    nulls = spark.createDataFrame(
        [(1, "alpha"), (2, None)], "doc_id long, text string")
    with pytest.raises(ValueError, match="NULL text"):
        build_lsh_index(nulls, str(tmp_path / "v2"))
    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="empty"):
        build_lsh_index(empty, str(tmp_path / "v3"))


def test_remove_rewrites_only_affected_partitions(spark, sf_dir, tmp_path):
    corpus = _corpus(spark, sf_dir)
    idx = build_lsh_index(corpus, str(tmp_path / "rm"))
    victims = [int(r["doc_id"]) for r in corpus.limit(3).collect()]
    base = f"{idx.path}/bands.parquet"
    # victim band rows name the partitions that MUST change; snapshot
    # mtimes of every partition dir
    victim_parts = {
        (int(r["band"]), int(r["bucket"]))
        for r in idx.bands()
        .where(F.col("doc_id").isin(victims))
        .select("band", "bucket").distinct().collect()}
    mtimes = {}
    for d1 in os.listdir(base):
        if not d1.startswith("band="):
            continue
        for d2 in os.listdir(f"{base}/{d1}"):
            if d2.startswith("bucket="):
                key = (int(d1.split("=")[1]), int(d2.split("=")[1]))
                mtimes[key] = os.stat(f"{base}/{d1}/{d2}").st_mtime_ns
    n = idx.remove(victims)
    assert n == 3
    assert idx.meta["count"] == corpus.count() - 3
    assert idx.bands().where(F.col("doc_id").isin(victims)).count() == 0
    # untouched partitions keep their files (delta-bounded rewrite)
    for key, old in mtimes.items():
        if key not in victim_parts and os.path.isdir(
                f"{base}/band={key[0]}/bucket={key[1]}"):
            assert os.stat(
                f"{base}/band={key[0]}/bucket={key[1]}"
            ).st_mtime_ns == old, key
    # missing refuses loudly; missing_ok tolerates
    with pytest.raises(ValueError, match="not indexed"):
        idx.remove(victims)
    assert idx.remove(victims, missing_ok=True) == 0
    # removed docs are re-addable (the changed-doc path)
    re_add = corpus.where(F.col("doc_id").isin(victims))
    assert idx.add(re_add) == 3
    full = build_lsh_index(corpus, str(tmp_path / "rm_full"))
    assert _rows(idx.bands()) == _rows(full.bands())


def test_compact_bands_merges_small_files(spark, sf_dir, tmp_path):
    corpus = _corpus(spark, sf_dir)
    parts = [corpus.where(F.col("doc_id") % 4 == k) for k in range(4)]
    idx = build_lsh_index(parts[0], str(tmp_path / "cp"))
    for p in parts[1:]:
        idx.add(p)
    before = _rows(idx.bands())
    rewritten = idx.compact_bands(max_files_per_part=2)
    assert rewritten > 0
    assert _rows(idx.bands()) == before
    assert idx.compact_bands(max_files_per_part=2) == 0
    # lookup is unaffected by compaction
    got = _rows(idx.lookup(_batch(spark, sf_dir)))
    want = _rows(dedup_incremental(spark, sf_dir))
    assert got == want


def test_mutation_lock_excludes_second_writer(spark, sf_dir, tmp_path):
    idx = build_lsh_index(
        _corpus(spark, sf_dir).limit(20), str(tmp_path / "lk"))
    with idx._mutation_lock():
        with pytest.raises(RuntimeError, match="holds the index lock"):
            idx.remove([999], missing_ok=True)


def test_open_refuses_foreign_params(spark, sf_dir, tmp_path):
    idx = build_lsh_index(
        _corpus(spark, sf_dir).limit(20), str(tmp_path / "pm"))
    meta = json.loads(open(f"{idx.path}/lsh_meta.json").read())
    meta["shingle_w"] = meta["shingle_w"] + 1
    open(f"{idx.path}/lsh_meta.json", "w").write(json.dumps(meta))
    with pytest.raises(ValueError, match="signature parameters"):
        LSHIndex.open(spark, idx.path)
    with pytest.raises(FileNotFoundError):
        LSHIndex.open(spark, str(tmp_path / "nowhere"))


def test_lookup_plan_prunes_partitions_and_broadcasts(spark, sf_dir, built):
    """The 100 TB contract: the corpus bands scan carries the batch's
    (band, bucket) literals as PartitionFilters (only touched buckets
    are read), the batch side broadcasts into the candidate equi-join,
    and no product/Python eval appears anywhere."""
    df = built.lookup(_batch(spark, sf_dir))
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    assert "PartitionFilters" in plan
    assert "bucket" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_self_pairs_matches_minhash_lsh_pairs(spark, sf_dir, tmp_path):
    """The full-corpus sweep through the persisted bands must produce
    exactly the oracle-gated minhash_lsh_pairs candidate set (over the
    whole documents table — build the index over everything here)."""
    from cloud_volume_spark.operators.dedup import minhash_lsh_pairs

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    idx = build_lsh_index(docs, str(tmp_path / "sp"))
    got = _rows(idx.self_pairs())
    want = _rows(minhash_lsh_pairs(spark, sf_dir))
    assert got == want and len(got) > 0


def test_band_bucket_golden_constants(spark):
    """The (band, bucket) partition layout is ON-DISK contract: an
    index written by one session must prune correctly in every later
    one, so the bucket function (crc32 % n_buckets) is pinned to
    golden values (cross-checked against zlib.crc32 — the same
    polynomial Spark's crc32 implements). A Spark upgrade that
    changed these would silently route lookups to the wrong
    partitions; this fails it loudly."""
    import zlib

    from cloud_volume_spark.lsh_index import (
        DEFAULT_N_BUCKETS, _band_bucket,
    )

    samples = ["abc", "0123456789abcdef0123456789abcdef", "deadbeef"]
    df = spark.createDataFrame([(s,) for s in samples],
                               "band_hash string")
    got = {r["band_hash"]: r["b"] for r in
           df.select("band_hash",
                     _band_bucket(DEFAULT_N_BUCKETS).alias("b"))
           .collect()}
    assert got == {"abc": 2,
                   "0123456789abcdef0123456789abcdef": 14,
                   "deadbeef": 4}
    for s in samples:
        assert got[s] == zlib.crc32(s.encode()) % DEFAULT_N_BUCKETS


def test_break_lock_heals_crashed_writer(spark, sf_dir, tmp_path):
    """r13 advice: the crash-heal flow was contradictory — a crashed
    add/remove leaves .lsh-lock behind and refresh_count itself takes
    the lock, so the prescribed heal refused until the user manually
    deleted the file. break_lock=True steals a confirmed-dead writer's
    lock; the heal releases it on the way out."""
    idx = build_lsh_index(
        _corpus(spark, sf_dir).limit(20), str(tmp_path / "crash"))
    open(idx._lock_path, "w").close()
    with pytest.raises(RuntimeError, match="break_lock"):
        idx.refresh_count()
    assert idx.refresh_count(break_lock=True) == 20
    assert not os.path.exists(idx._lock_path)
