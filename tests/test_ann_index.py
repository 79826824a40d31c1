"""Persistent IVF index lifecycle: build → open → search.

The search path must be BIT-IDENTICAL to the registered ivf_ann_topk
query when built with the same (sample-mode) centroids — the index is
the serving form of the same contract, not a second implementation —
and the probed-lists scan must show real partition pruning."""

import json

import pytest
from pyspark.sql import functions as F

from cloud_volume_spark.ann_index import IVFIndex, build_ivf_index
from cloud_volume_spark.operators.common import load
from cloud_volume_spark.operators.similarity import (
    N_QUERIES, NLIST, NPROBE, TOP_K, ivf_ann_topk,
)


def _queries(spark, sf_dir):
    return load(spark, sf_dir, "embeddings").where(
        F.col("vec_id") < N_QUERIES
    ).select(F.col("vec_id").alias("query_id"),
             F.col("embedding").alias("qvec"))


@pytest.fixture(scope="module")
def index(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ivf") / "idx")
    emb = load(spark, sf_dir, "embeddings")
    return build_ivf_index(emb, out, nlist=NLIST, centroid_base_id=100,
                           centroids="sample")


def test_search_equals_registered_query(spark, sf_dir, index):
    got = sorted(
        (r["query_id"], r["rnk"], r["neighbor_id"], r["sim"])
        for r in index.search(_queries(spark, sf_dir),
                              k=TOP_K, nprobe=NPROBE).collect())
    want = sorted(
        (r["query_id"], r["rnk"], r["neighbor_id"], r["sim"])
        for r in ivf_ann_topk(spark, sf_dir).collect())
    assert got == want and len(got) > 0


def test_meta_roundtrip_and_open_guards(spark, index, tmp_path):
    reopened = IVFIndex.open(spark, index.path)
    assert reopened.meta["nlist"] == NLIST
    assert reopened.meta["count"] == index.lists().count()
    assert reopened.meta["centroids"] == "sample"
    with pytest.raises(FileNotFoundError, match="ivf_meta"):
        IVFIndex.open(spark, str(tmp_path / "nope"))
    # version guard refuses loudly instead of misreading a future layout
    bad = tmp_path / "badver"
    bad.mkdir()
    (bad / "ivf_meta.json").write_text(json.dumps({"version": 99}))
    with pytest.raises(ValueError, match="version 99"):
        IVFIndex.open(spark, str(bad))


def test_search_scan_is_partition_pruned(spark, sf_dir, index):
    """The probed cent_id literal filter must reach the lists scan as
    PartitionFilters — only nprobe-ish of the nlist inverted-list
    directories are read, the whole point of persisting the index."""
    df = index.search(_queries(spark, sf_dir), k=TOP_K, nprobe=NPROBE)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    scan = [seg for seg in plan.split("(1) Scan parquet")
            if "lists.parquet" in seg]
    assert scan, plan
    assert "PartitionFilters" in scan[0]
    assert "cent_id" in scan[0].split("PartitionFilters", 1)[1].split(
        "\n", 2)[0] + scan[0].split("PartitionFilters", 1)[1].split(
        "\n", 2)[1]


def test_kmeans_mode_builds_deterministically(spark, sf_dir, tmp_path):
    emb = load(spark, sf_dir, "embeddings")
    a = build_ivf_index(emb, str(tmp_path / "a"), nlist=8,
                        centroids="kmeans", kmeans_rounds=2)
    b = build_ivf_index(emb, str(tmp_path / "b"), nlist=8,
                        centroids="kmeans", kmeans_rounds=2)
    ca = sorted(map(tuple, a.centroids().select("cent_id", "cvec")
                    .toPandas().itertuples(index=False)))
    cb = sorted(map(tuple, b.centroids().select("cent_id", "cvec")
                    .toPandas().itertuples(index=False)))
    assert [(c, list(v)) for c, v in ca] == [(c, list(v)) for c, v in cb]
    res = a.search(_queries(spark, sf_dir), k=3, nprobe=2)
    counts = {r["query_id"]: r["n"] for r in
              res.groupBy("query_id").agg(F.count("*").alias("n")).collect()}
    assert counts and all(n <= 3 for n in counts.values())


def test_build_guards(spark, sf_dir, tmp_path):
    emb = load(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="centroid mode"):
        build_ivf_index(emb, str(tmp_path / "x"), centroids="magic")
    with pytest.raises(ValueError, match="need 16"):
        build_ivf_index(emb.where(F.col("vec_id") < 50),
                        str(tmp_path / "y"), nlist=16,
                        centroid_base_id=100)


def test_incremental_add_equals_full_build(spark, sf_dir, tmp_path):
    """build(half) + add(rest) must search IDENTICALLY to build(full):
    assignment depends only on the persisted centroids, which the
    half-build already contains (the sample slice lives in the first
    half). Duplicate vec_ids refuse loudly; meta count tracks."""
    emb = load(spark, sf_dir, "embeddings")
    half = emb.where(F.col("vec_id") < 250)
    rest = emb.where(F.col("vec_id") >= 250)

    idx = build_ivf_index(half, str(tmp_path / "inc"), nlist=NLIST,
                          centroid_base_id=100, centroids="sample")
    n0 = idx.meta["count"]
    added = idx.add(rest)
    assert added == rest.count()
    assert idx.meta["count"] == n0 + added
    # reopened handle sees the appended meta
    assert IVFIndex.open(spark, idx.path).meta["count"] == n0 + added

    full = build_ivf_index(emb, str(tmp_path / "full"), nlist=NLIST,
                           centroid_base_id=100, centroids="sample")
    q = _queries(spark, sf_dir)
    got = sorted(map(tuple, idx.search(q, k=TOP_K, nprobe=NPROBE)
                     .select("query_id", "rnk", "neighbor_id", "sim")
                     .collect()))
    want = sorted(map(tuple, full.search(q, k=TOP_K, nprobe=NPROBE)
                      .select("query_id", "rnk", "neighbor_id", "sim")
                      .collect()))
    assert got == want and len(got) > 0

    with pytest.raises(ValueError, match="already indexed"):
        idx.add(emb.where(F.col("vec_id") == 300))

    stats = {r["cent_id"]: r["n_vectors"]
             for r in idx.list_stats().collect()}
    assert sum(stats.values()) == n0 + added
    assert set(stats) <= set(range(100, 100 + NLIST))


def test_add_batch_invariants_refuse_loudly(spark, sf_dir, tmp_path):
    """add()'s one-job batch validation: in-batch duplicate vec_ids,
    wrong-dimension vectors, and NULL embeddings all refuse with a
    clear error instead of silently landing with NULL affinity."""
    emb = load(spark, sf_dir, "embeddings")
    idx = build_ivf_index(emb.where(F.col("vec_id") < 250),
                          str(tmp_path / "g"), nlist=NLIST,
                          centroid_base_id=100, centroids="sample")
    one = emb.where(F.col("vec_id") == 300)
    with pytest.raises(ValueError, match="duplicate vec_ids"):
        idx.add(one.unionAll(one))
    with pytest.raises(ValueError, match="dimension"):
        idx.add(one.select("vec_id",
                           F.slice("embedding", 1, 8).alias("embedding")))
    with pytest.raises(ValueError, match="NULL"):
        idx.add(one.select(
            "vec_id",
            F.lit(None).cast("array<double>").alias("embedding")))
    # a clean batch still lands and reports its own size
    assert idx.add(one) == 1
    # nlist guard on build
    with pytest.raises(ValueError, match="nlist"):
        build_ivf_index(emb, str(tmp_path / "z"), nlist=0)


def test_incremental_refresh_loop(spark, sf_dir, tmp_path):
    """The round-10 pieces composed as the incremental-refresh loop a
    100 TB pipeline runs: corpus snapshot diff → delta doc ids →
    (embed; here: select their vectors) → IVFIndex.add →
    compact_lists — only the delta is assigned and appended, the
    compaction sweeps the small files the append fanned out, and the
    refreshed-then-compacted index serves the union corpus identically
    to a from-scratch build (the full daily sequence in one test)."""
    from cloud_volume_spark.operators.corpus import snapshot_diff

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = load(spark, sf_dir, "embeddings")
    n_emb = emb.count()

    # yesterday's corpus = docs with doc_id < 300; today adds the rest
    old = docs.where(F.col("doc_id") < 300)
    new = docs  # superset: no removed/changed docs in this run
    delta_ids = (snapshot_diff(old, new)
                 .where(F.col("status") == "added").select("doc_id"))
    # "embed the delta": embeddings keyed by the same id space
    delta_vecs = emb.join(
        delta_ids.withColumnRenamed("doc_id", "vec_id"), "vec_id")
    base_vecs = emb.join(delta_vecs.select("vec_id"), "vec_id",
                         "left_anti")
    assert delta_vecs.count() + base_vecs.count() == n_emb

    idx = build_ivf_index(base_vecs, str(tmp_path / "serve"),
                          nlist=NLIST, centroid_base_id=100,
                          centroids="sample")
    added = idx.add(delta_vecs)
    assert added == delta_vecs.count() and added > 0
    # the day's append fanned part files into the touched lists; the
    # maintenance step of the same loop sweeps them — and must not
    # change what the index serves (compared below) or holds
    n_before = idx.meta["count"]
    assert idx.compact_lists(max_files_per_list=1) > 0
    assert idx.meta["count"] == n_before == idx.lists().count()

    full = build_ivf_index(emb, str(tmp_path / "scratch"), nlist=NLIST,
                           centroid_base_id=100, centroids="sample")
    q = _queries(spark, sf_dir)
    got = sorted(map(tuple, idx.search(q, k=TOP_K, nprobe=NPROBE)
                     .select("query_id", "rnk", "neighbor_id", "sim")
                     .collect()))
    want = sorted(map(tuple, full.search(q, k=TOP_K, nprobe=NPROBE)
                      .select("query_id", "rnk", "neighbor_id", "sim")
                      .collect()))
    assert got == want and len(got) > 0


def test_remove_rewrites_only_affected_lists(spark, sf_dir, tmp_path):
    """remove() = the compact() analog at the lists layer: only the
    partitions holding removed ids are rewritten (untouched list files
    keep their mtimes), search thereafter equals a from-scratch build
    over the surviving vectors, and meta count tracks O(delta)."""
    import os

    emb = load(spark, sf_dir, "embeddings")
    idx = build_ivf_index(emb, str(tmp_path / "rm"), nlist=NLIST,
                          centroid_base_id=100, centroids="sample")
    n0 = idx.meta["count"]

    victims = [r["vec_id"] for r in
               idx.lists().where(F.col("cent_id") == 100)
               .select("vec_id").orderBy("vec_id").limit(3).collect()]
    assert len(victims) == 3
    untouched = sorted(
        c for c in os.listdir(f"{idx.path}/lists.parquet")
        if c.startswith("cent_id=") and c != "cent_id=100")
    mt_before = {
        c: sorted((f, os.path.getmtime(f"{idx.path}/lists.parquet/{c}/{f}"))
                  for f in os.listdir(f"{idx.path}/lists.parquet/{c}")
                  if f.endswith(".parquet"))
        for c in untouched}

    removed = idx.remove(victims)
    assert removed == 3
    assert idx.meta["count"] == n0 - 3
    assert IVFIndex.open(spark, idx.path).meta["count"] == n0 - 3
    mt_after = {
        c: sorted((f, os.path.getmtime(f"{idx.path}/lists.parquet/{c}/{f}"))
                  for f in os.listdir(f"{idx.path}/lists.parquet/{c}")
                  if f.endswith(".parquet"))
        for c in untouched}
    assert mt_after == mt_before, "untouched inverted lists were rewritten"

    scratch = build_ivf_index(
        emb.where(~F.col("vec_id").isin(victims)),
        str(tmp_path / "scratch"), nlist=NLIST,
        centroid_base_id=100, centroids="sample")
    q = _queries(spark, sf_dir)
    got = sorted(map(tuple, idx.search(q, k=TOP_K, nprobe=NPROBE)
                     .select("query_id", "rnk", "neighbor_id", "sim")
                     .collect()))
    want = sorted(map(tuple, scratch.search(q, k=TOP_K, nprobe=NPROBE)
                      .select("query_id", "rnk", "neighbor_id", "sim")
                      .collect()))
    assert got == want and len(got) > 0

    # strict mode refuses an unindexed id; recovery mode tolerates it
    with pytest.raises(ValueError, match="not indexed"):
        idx.remove(victims)
    assert idx.remove(victims, missing_ok=True) == 0
    assert idx.remove([]) == 0


def test_remove_emptied_list_drops_partition(spark, sf_dir, tmp_path):
    """Removing every vector of one inverted list must drop its
    partition directory (dynamic overwrite only replaces partitions
    present in the output), so list_stats and search never see stale
    rows."""
    import os

    emb = load(spark, sf_dir, "embeddings")
    idx = build_ivf_index(emb, str(tmp_path / "empty"), nlist=NLIST,
                          centroid_base_id=100, centroids="sample")
    whole = [r["vec_id"] for r in
             idx.lists().where(F.col("cent_id") == 101)
             .select("vec_id").collect()]
    assert whole
    assert idx.remove(whole) == len(whole)
    assert "cent_id=101" not in os.listdir(f"{idx.path}/lists.parquet")
    stats = {r["cent_id"] for r in idx.list_stats().collect()}
    assert 101 not in stats
    assert idx.lists().where(F.col("cent_id") == 101).count() == 0


def test_changed_doc_refresh_loop(spark, sf_dir, tmp_path):
    """snapshot_diff → remove(changed ∪ removed) → add(added ∪
    changed): the full incremental-refresh loop now covers CHANGED and
    REMOVED docs without a rebuild, and serves identically to a
    from-scratch build over the new snapshot."""
    from cloud_volume_spark.operators.corpus import snapshot_diff

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = load(spark, sf_dir, "embeddings")

    # old snapshot = docs 0..400; new drops [0,5), edits [5,10)
    # (simulated by negating their embeddings), adds the rest
    old = docs.where(F.col("doc_id") < 400)
    new = docs.where(F.col("doc_id") >= 5).withColumn(
        "text", F.when(F.col("doc_id") < 10,
                       F.concat(F.col("text"), F.lit(" v2")))
        .otherwise(F.col("text")))
    diff = snapshot_diff(old, new)
    by_status = {s: [r["doc_id"] for r in
                     diff.where(F.col("status") == s)
                     .select("doc_id").collect()]
                 for s in ("added", "removed", "changed")}
    assert by_status["removed"] and by_status["changed"] \
        and by_status["added"]

    new_emb = emb.join(new.select(F.col("doc_id").alias("vec_id")),
                       "vec_id").withColumn(
        "embedding",
        F.when(F.col("vec_id") < 10,
               F.transform("embedding", lambda x: -x))
        .otherwise(F.col("embedding")))

    old_emb = emb.join(old.select(F.col("doc_id").alias("vec_id")),
                       "vec_id")
    idx = build_ivf_index(old_emb, str(tmp_path / "serve"),
                          nlist=NLIST, centroid_base_id=100,
                          centroids="sample")
    gone = by_status["removed"] + by_status["changed"]
    assert idx.remove(gone) == len(gone)
    delta = new_emb.join(
        spark.createDataFrame(
            [(int(i),) for i in
             by_status["added"] + by_status["changed"]],
            "vec_id long"), "vec_id")
    assert idx.add(delta) == len(by_status["added"]) \
        + len(by_status["changed"])

    scratch = build_ivf_index(new_emb, str(tmp_path / "scr"),
                              nlist=NLIST, centroid_base_id=100,
                              centroids="sample")
    q = _queries(spark, sf_dir)
    got = sorted(map(tuple, idx.search(q, k=TOP_K, nprobe=NPROBE)
                     .select("query_id", "rnk", "neighbor_id", "sim")
                     .collect()))
    want = sorted(map(tuple, scratch.search(q, k=TOP_K, nprobe=NPROBE)
                      .select("query_id", "rnk", "neighbor_id", "sim")
                      .collect()))
    assert got == want and len(got) > 0


def test_mutation_lock_refuses_second_writer(spark, sf_dir, tmp_path):
    """add/remove/refresh_count take the exclusive lock file and
    release it on exit — a held lock refuses loudly, it is never
    silently stolen."""
    import os

    emb = load(spark, sf_dir, "embeddings")
    idx = build_ivf_index(emb.where(F.col("vec_id") < 250),
                          str(tmp_path / "lock"), nlist=NLIST,
                          centroid_base_id=100, centroids="sample")
    lock = f"{idx.path}/.ivf-lock"
    open(lock, "w").close()
    one = emb.where(F.col("vec_id") == 300)
    with pytest.raises(RuntimeError, match="index lock"):
        idx.add(one)
    with pytest.raises(RuntimeError, match="index lock"):
        idx.remove([0])
    with pytest.raises(RuntimeError, match="index lock"):
        idx.refresh_count()
    os.remove(lock)
    assert idx.add(one) == 1
    assert not os.path.exists(lock)
    assert idx.remove([300]) == 1
    assert not os.path.exists(lock)


def test_add_is_o_delta_and_refresh_heals(spark, sf_dir, tmp_path,
                                          monkeypatch):
    """add() reads the lists exactly once (the validation join) — no
    full recount per delta batch — and refresh_count() is the explicit
    self-heal for a count made stale by a crash between append and
    meta write."""
    emb = load(spark, sf_dir, "embeddings")
    idx = build_ivf_index(emb.where(F.col("vec_id") < 250),
                          str(tmp_path / "od"), nlist=NLIST,
                          centroid_base_id=100, centroids="sample")
    calls = []
    orig = IVFIndex.lists

    def counting(self):
        calls.append(1)
        return orig(self)

    monkeypatch.setattr(IVFIndex, "lists", counting)
    n0 = idx.meta["count"]
    assert idx.add(emb.where(F.col("vec_id") == 300)) == 1
    assert len(calls) == 1, "add() rescanned the lists beyond validation"
    assert idx.meta["count"] == n0 + 1
    monkeypatch.undo()

    # simulate the crash-between-append-and-meta staleness
    from cloud_volume_spark.fs import PathOps

    idx.meta = {**idx.meta, "count": 1}
    idx._write_meta(PathOps(idx.path, idx.spark))
    assert IVFIndex.open(spark, idx.path).meta["count"] == 1
    assert idx.refresh_count() == idx.lists().count() == n0 + 1
    assert IVFIndex.open(spark, idx.path).meta["count"] == n0 + 1


def test_build_validates_batch(spark, sf_dir, tmp_path):
    """build enforces the SAME batch contract as add (round-10
    advice): mixed dimensions, NULL embeddings, and duplicate vec_ids
    refuse loudly BEFORE any expensive work or on-disk state."""
    import os

    emb = load(spark, sf_dir, "embeddings")
    mixed = emb.withColumn(
        "embedding",
        F.when(F.col("vec_id") == 7, F.slice("embedding", 1, 8))
        .otherwise(F.col("embedding")))
    with pytest.raises(ValueError, match="mixed embedding dimensions"):
        build_ivf_index(mixed, str(tmp_path / "m"))
    nulled = emb.withColumn(
        "embedding",
        F.when(F.col("vec_id") == 7,
               F.lit(None).cast("array<double>"))
        .otherwise(F.transform("embedding",
                               lambda x: x.cast("double"))))
    with pytest.raises(ValueError, match="NULL"):
        build_ivf_index(nulled, str(tmp_path / "n"))
    dup = emb.unionAll(emb.where(F.col("vec_id") == 7))
    with pytest.raises(ValueError, match="duplicate vec_ids"):
        build_ivf_index(dup, str(tmp_path / "d"))
    with pytest.raises(ValueError, match="empty"):
        build_ivf_index(emb.where(F.lit(False)), str(tmp_path / "e"))
    # nothing was persisted by the refused builds
    for d in ("m", "n", "d", "e"):
        assert not os.path.exists(str(tmp_path / d / "lists.parquet"))


def test_kmeans_centroids_are_spherical(spark, sf_dir, tmp_path):
    """kmeans mode is spherical: refined centroids are unit-norm (to
    6dp component rounding), so the Lloyd rounds' Euclidean argmin is
    the same cosine contract assignment and probing use."""
    emb = load(spark, sf_dir, "embeddings")
    idx = build_ivf_index(emb, str(tmp_path / "sph"), nlist=8,
                          centroids="kmeans", kmeans_rounds=2)
    for r in idx.centroids().select("cnrm").collect():
        assert abs(r["cnrm"] - 1.0) < 1e-3, r["cnrm"]


def test_compact_lists_merges_small_files(spark, sf_dir, tmp_path):
    """A daily add() loop accumulates part files per touched list;
    compact_lists rewrites ONLY the crowded partitions down to one
    file each, leaves quiet lists' files alone, and search is
    bit-identical before and after."""
    import os

    emb = load(spark, sf_dir, "embeddings")
    idx = build_ivf_index(emb.where(F.col("vec_id") < 250),
                          str(tmp_path / "cp"), nlist=NLIST,
                          centroid_base_id=100, centroids="sample")
    # ten single-vector adds: each appends a part file to one list
    for vid in range(250, 260):
        assert idx.add(emb.where(F.col("vec_id") == vid)) == 1

    base = f"{idx.path}/lists.parquet"

    def files_per_list():
        return {
            d: sorted(f for f in os.listdir(f"{base}/{d}")
                      if f.endswith(".parquet"))
            for d in os.listdir(base) if d.startswith("cent_id=")
        }

    before = files_per_list()
    # the fresh build writes one file per list (repartition on the
    # partition key); every list an add() touched has >= 2
    crowded = {d for d, fl in before.items() if len(fl) > 1}
    assert crowded, "adds did not fan out enough part files"
    q = _queries(spark, sf_dir)
    want = sorted(map(tuple, idx.search(q, k=TOP_K, nprobe=NPROBE)
                      .select("query_id", "rnk", "neighbor_id", "sim")
                      .collect()))
    n0 = idx.meta["count"]

    assert idx.compact_lists(max_files_per_list=1) == len(crowded)
    after = files_per_list()
    for d in before:
        if d in crowded:
            assert len(after[d]) == 1, d
        else:
            assert after[d] == before[d], f"quiet list {d} rewritten"
    got = sorted(map(tuple, idx.search(q, k=TOP_K, nprobe=NPROBE)
                     .select("query_id", "rnk", "neighbor_id", "sim")
                     .collect()))
    assert got == want
    assert idx.meta["count"] == n0 == idx.lists().count()
    # idempotent: a second pass finds nothing crowded
    assert idx.compact_lists(max_files_per_list=1) == 0


def test_remove_everything_keeps_index_usable(spark, sf_dir, tmp_path):
    """Emptying EVERY inverted list (a full-corpus refresh between
    remove and re-add) must not brick the index: reads carry an
    explicit schema, so lists()/search()/add() keep working against
    the empty layout and the re-add restores full service."""
    emb = load(spark, sf_dir, "embeddings")
    idx = build_ivf_index(emb, str(tmp_path / "all"), nlist=NLIST,
                          centroid_base_id=100, centroids="sample")
    every = [r["vec_id"] for r in emb.select("vec_id").collect()]
    assert idx.remove(every) == len(every)
    assert idx.meta["count"] == 0
    assert idx.lists().count() == 0
    assert idx.list_stats().count() == 0
    q = _queries(spark, sf_dir)
    assert idx.search(q, k=TOP_K, nprobe=NPROBE).count() == 0
    # the documented follow-up: re-add the refreshed corpus
    assert idx.add(emb) == len(every)
    got = sorted(map(tuple, idx.search(q, k=TOP_K, nprobe=NPROBE)
                     .select("query_id", "rnk", "neighbor_id", "sim")
                     .collect()))
    want = sorted(map(tuple, build_ivf_index(
        emb, str(tmp_path / "fresh"), nlist=NLIST,
        centroid_base_id=100, centroids="sample")
        .search(q, k=TOP_K, nprobe=NPROBE)
        .select("query_id", "rnk", "neighbor_id", "sim").collect()))
    assert got == want and len(got) > 0


def test_zero_norm_embedding_refused(spark, sf_dir, tmp_path):
    """A zero-norm vector has no cosine direction: build (both
    centroid modes) and add must refuse it loudly instead of throwing
    a raw ANSI divide-by-zero mid-job."""
    emb = load(spark, sf_dir, "embeddings")
    zeroed = emb.withColumn(
        "embedding",
        F.when(F.col("vec_id") == 7,
               F.transform("embedding", lambda x: x * 0.0))
        .otherwise(F.transform("embedding",
                               lambda x: x.cast("double"))))
    with pytest.raises(ValueError, match="zero-norm"):
        build_ivf_index(zeroed, str(tmp_path / "z1"))
    with pytest.raises(ValueError, match="zero-norm"):
        build_ivf_index(zeroed, str(tmp_path / "z2"), centroids="kmeans",
                        kmeans_rounds=1)
    idx = build_ivf_index(emb.where(F.col("vec_id") >= 10),
                          str(tmp_path / "z3"), nlist=NLIST,
                          centroid_base_id=100, centroids="sample")
    with pytest.raises(ValueError, match="zero-norm"):
        idx.add(zeroed.where(F.col("vec_id") == 7))


def test_add_empty_delta_is_noop(spark, sf_dir, tmp_path):
    """A snapshot-diff round with nothing added/changed must not crash
    the refresh loop: add(empty) returns 0, touches nothing, and
    releases the lock."""
    import os

    emb = load(spark, sf_dir, "embeddings")
    idx = build_ivf_index(emb.where(F.col("vec_id") < 250),
                          str(tmp_path / "noop"), nlist=NLIST,
                          centroid_base_id=100, centroids="sample")
    n0 = idx.meta["count"]
    assert idx.add(emb.where(F.lit(False))) == 0
    assert idx.meta["count"] == n0
    assert not os.path.exists(f"{idx.path}/.ivf-lock")
    # build still refuses empty loudly
    with pytest.raises(ValueError, match="empty"):
        build_ivf_index(emb.where(F.lit(False)), str(tmp_path / "e"))


def test_nan_and_null_components_refused(spark, sf_dir, tmp_path):
    """Round-11 advice: a NULL element or NaN component INSIDE an
    embedding array passes the array-level NULL check but NULLs/NaNs
    its norm — NaN sorts above every real double under DESC, stealing
    crnk=1 — so the shared validator must refuse it in build AND add,
    and an all-bad batch must raise the contract error, not a raw
    TypeError off a NULL min_nrm."""
    emb = load(spark, sf_dir, "embeddings")
    as_dbl = F.transform("embedding", lambda x: x.cast("double"))
    nan_one = emb.withColumn(
        "embedding",
        F.when(F.col("vec_id") == 7,
               F.transform("embedding",
                           lambda x: x * F.lit(float("nan"))))
        .otherwise(as_dbl))
    null_one = emb.withColumn(
        "embedding",
        F.when(F.col("vec_id") == 7,
               F.transform("embedding",
                           lambda x: F.when(F.lit(False), x.cast("double"))))
        .otherwise(as_dbl))
    with pytest.raises(ValueError, match="NaN component"):
        build_ivf_index(nan_one, str(tmp_path / "n1"))
    with pytest.raises(ValueError, match="NaN component"):
        build_ivf_index(null_one, str(tmp_path / "n2"))
    idx = build_ivf_index(emb.where(F.col("vec_id") >= 10),
                          str(tmp_path / "n3"), nlist=NLIST,
                          centroid_base_id=100, centroids="sample")
    with pytest.raises(ValueError, match="NaN component"):
        idx.add(nan_one.where(F.col("vec_id") == 7))
    # every row bad: still the contract error (min_nrm is NULL here)
    with pytest.raises(ValueError, match="NaN component"):
        build_ivf_index(
            emb.withColumn(
                "embedding",
                F.transform("embedding",
                            lambda x: F.when(F.lit(False),
                                             x.cast("double")))),
            str(tmp_path / "n4"))


def test_remove_pins_nondeterministic_id_frame(spark, sf_dir, tmp_path):
    """Round-11 advice: remove() must evaluate a caller-supplied id
    frame exactly once — a LIMIT-without-ORDER plan may return a
    different id set per job, desynchronizing the hit count, the
    emptied-partition set, and the survivors rewrite. With the pinned
    collect, meta count, lists(), and search stay consistent."""
    emb = load(spark, sf_dir, "embeddings")
    idx = build_ivf_index(emb, str(tmp_path / "pin"), nlist=NLIST,
                          centroid_base_id=100, centroids="sample")
    n0 = int(idx.meta["count"])
    # non-deterministic by construction: LIMIT over a shuffled frame
    wobbly = (emb.select("vec_id")
              .repartition(8, "vec_id")
              .limit(25))
    n_rm = idx.remove(wobbly)
    assert n_rm == 25
    assert int(idx.meta["count"]) == n0 - 25
    assert idx.lists().count() == n0 - 25
    # NULL ids refuse loudly instead of a raw int(None) TypeError
    with pytest.raises(ValueError, match="NULL vec_id"):
        idx.remove(spark.createDataFrame([(None,)], "vec_id long"))


def test_recall_contract(spark, sf_dir, index):
    """The quality contract the index implies but never stated
    (round-11 verdict): at nprobe == nlist, search IS exact — recall
    1.0 against the brute-force truth by construction (identical
    6-dp/neighbor_id tie rules); at the default nprobe=4 it must hold
    a pinned empirical floor. The floor (0.4) is measured on this
    synthetic corpus — near-uniform vectors, the WORST case for IVF
    since there is no cluster structure for the coarse quantizer to
    exploit; real embedding corpora sit well above it (SCALE.md's
    recall table)."""
    from cloud_volume_spark.ann_index import brute_force_topk, recall_at_k

    emb = load(spark, sf_dir, "embeddings")
    q = _queries(spark, sf_dir)
    truth = brute_force_topk(emb, q, k=TOP_K).cache()
    try:
        assert truth.count() == N_QUERIES * TOP_K
        full = recall_at_k(index.search(q, k=TOP_K, nprobe=NLIST), truth)
        assert full == 1.0
        part = recall_at_k(index.search(q, k=TOP_K, nprobe=4), truth)
        assert part >= 0.4, part
        # recall is monotone in nprobe on this corpus
        one = recall_at_k(index.search(q, k=TOP_K, nprobe=1), truth)
        assert one <= part <= full
    finally:
        truth.unpersist()


# ---- int8 sidecar (IVF-PQ-lite) --------------------------------------


@pytest.fixture(scope="module")
def index8(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ivf8") / "idx")
    emb = load(spark, sf_dir, "embeddings")
    return build_ivf_index(emb, out, nlist=NLIST, centroid_base_id=100,
                           centroids="sample", int8=True)


def _canon(df):
    return sorted((r["query_id"], r["rnk"], r["neighbor_id"], r["sim"])
                  for r in df.collect())


def test_int8_search_equals_registered_int8_query(spark, sf_dir, index8):
    """The persisted two-file path must be BIT-IDENTICAL to the inline
    oracle-gated ivf_ann_topk_int8 at the same (nprobe, rerank_r, k)."""
    from cloud_volume_spark.operators.similarity import (
        IVF_INT8_RERANK_R, ivf_ann_topk_int8,
    )

    got = _canon(index8.search_int8(
        _queries(spark, sf_dir), k=TOP_K, nprobe=NPROBE,
        rerank_r=IVF_INT8_RERANK_R))
    want = _canon(ivf_ann_topk_int8(spark, sf_dir))
    assert got == want and len(got) > 0


def test_int8_full_rerank_equals_float_search(spark, sf_dir, index8):
    """With rerank_r >= every probed candidate, the int8 stage prunes
    nothing and search_int8 == the float search exactly — at
    nprobe=nlist that is the exact brute-force contract."""
    n = int(index8.meta["count"])
    got = _canon(index8.search_int8(
        _queries(spark, sf_dir), k=TOP_K, nprobe=NLIST, rerank_r=n))
    want = _canon(index8.search(
        _queries(spark, sf_dir), k=TOP_K, nprobe=NLIST))
    assert got == want and len(got) > 0


def test_int8_codes_track_lifecycle(spark, sf_dir, tmp_path):
    """add/remove/compact maintain the codes sidecar: after any
    mutation the persisted codes equal a fresh quantization of the
    persisted float lists, and search_int8 keeps serving."""
    from cloud_volume_spark.ann_index import _codes_frame

    emb = load(spark, sf_dir, "embeddings")
    # the first half must contain the sample-centroid slice [100, 104)
    half_a = emb.where(F.col("vec_id") < 300)
    half_b = emb.where(F.col("vec_id") >= 300)
    idx = build_ivf_index(half_a, str(tmp_path / "i8"), nlist=4,
                          centroid_base_id=100, int8=True)

    def codes_ok():
        got = sorted((r["vec_id"], tuple(r["q"]), r["sq"], r["cent_id"])
                     for r in idx.codes().collect())
        want = sorted((r["vec_id"], tuple(r["q"]), r["sq"], r["cent_id"])
                      for r in _codes_frame(idx.lists()).collect())
        assert got == want and len(got) == idx.meta["count"]

    codes_ok()
    idx.add(half_b)
    codes_ok()
    victims = [int(r["vec_id"]) for r in half_b.limit(5).collect()]
    assert idx.remove(victims) == 5
    codes_ok()
    assert idx.codes().where(F.col("vec_id").isin(victims)).count() == 0
    rewritten = idx.compact_lists(max_files_per_list=1)
    assert rewritten > 0
    # the return covers the LISTS only (r13 advice: a caller
    # asserting it against a crowded-list census must not see the
    # codes sidecar's rewrites folded in); the sidecar's own count
    # is exposed separately and bounded by nlist
    assert rewritten <= int(idx.meta["nlist"])
    assert 0 < idx.last_codes_compacted <= int(idx.meta["nlist"])
    codes_ok()
    out = idx.search_int8(_queries(spark, sf_dir), k=3, nprobe=2)
    assert out.count() > 0


def test_int8_requires_int8_index(spark, sf_dir, index, index8):
    with pytest.raises(ValueError, match="int8"):
        index.codes()
    with pytest.raises(ValueError, match="int8"):
        index.search_int8(_queries(spark, sf_dir))
    with pytest.raises(ValueError, match="rerank_r"):
        index8.search_int8(_queries(spark, sf_dir), k=5, rerank_r=2)


def test_int8_affinity_scan_prunes_and_skips_floats(spark, sf_dir, index8):
    """The 100 TB contract: the codes scan carries the probed cent_id
    literals as PartitionFilters and does NOT read the float embedding
    column (ReadSchema holds q/sq only); the float lists are read only
    by the rerank join."""
    df = index8.search_int8(_queries(spark, sf_dir), k=TOP_K,
                            nprobe=2, rerank_r=TOP_K)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    assert "codes.parquet" in plan
    assert "PartitionFilters" in plan
    # the codes scan's ReadSchema must not include the embedding
    # column: isolate the codes scan block
    import re
    blocks = re.split(r"\n\(\d+\) ", plan)
    code_scans = [b for b in blocks if "codes.parquet" in b
                  and "ReadSchema" in b]
    assert code_scans, plan
    for b in code_scans:
        assert "embedding" not in b, b
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_sync_codes_heals_torn_mutations(spark, sf_dir, tmp_path):
    """The two-write crash window: a torn add (lists committed, codes
    not) and a torn remove (stale codes still serving removed ids)
    must both be detected and healed by sync_codes(); a consistent
    sidecar reports 0."""
    import shutil

    from cloud_volume_spark.ann_index import _codes_frame

    emb = load(spark, sf_dir, "embeddings")
    idx = build_ivf_index(emb.where(F.col("vec_id") < 400),
                          str(tmp_path / "sync"), nlist=4,
                          centroid_base_id=100, int8=True)
    assert idx.sync_codes() == 0

    def codes_ok():
        got = sorted((r["vec_id"], r["cent_id"])
                     for r in idx.codes().collect())
        want = sorted((r["vec_id"], r["cent_id"])
                      for r in idx.lists().collect())
        assert got == want

    # torn ADD: the lists append landed, the codes append did not —
    # simulate by dropping one codes partition wholesale
    victim = int(idx.codes().select("cent_id").first()["cent_id"])
    shutil.rmtree(f"{idx.path}/codes.parquet/cent_id={victim}")
    assert idx.sync_codes() == 1
    codes_ok()

    # torn REMOVE: the lists partition was rewritten, the stale codes
    # still carry the removed ids — simulate by appending duplicate
    # code rows for one partition (codes ahead of lists)
    stale = (_codes_frame(
        idx.lists().where(F.col("cent_id") == victim).limit(3)))
    (stale.repartition("cent_id")
     .write.mode("append").partitionBy("cent_id")
     .parquet(f"{idx.path}/codes.parquet"))
    assert idx.sync_codes() == 1
    codes_ok()
    assert idx.sync_codes() == 0
    # search keeps serving after the heals
    assert idx.search_int8(_queries(spark, sf_dir), k=3,
                           nprobe=2).count() > 0


def test_break_lock_heals_crashed_writer(spark, sf_dir, tmp_path):
    """r13 advice: a crashed mutation leaves .ivf-lock behind, and the
    heal methods take the lock themselves — so the documented heal
    flow refused on its own prescription. break_lock=True (for a
    confirmed-dead writer) steals the stale lock; the heal still
    releases it on the way out."""
    import os

    emb = load(spark, sf_dir, "embeddings").where(F.col("vec_id") < 200)
    n = emb.count()
    idx = build_ivf_index(emb, str(tmp_path / "crash"), nlist=4,
                          centroid_base_id=100, centroids="sample",
                          int8=True)
    open(idx._lock_path, "w").close()  # the dead writer's leftovers
    with pytest.raises(RuntimeError, match="break_lock"):
        idx.refresh_count()
    with pytest.raises(RuntimeError, match="break_lock"):
        idx.sync_codes()
    assert idx.refresh_count(break_lock=True) == n
    assert not os.path.exists(idx._lock_path)
    open(idx._lock_path, "w").close()
    assert idx.sync_codes(break_lock=True) == 0
    assert not os.path.exists(idx._lock_path)
    # and a healthy mutation still refuses a LIVE lock
    with idx._mutation_lock():
        with pytest.raises(RuntimeError, match="holds the index lock"):
            idx.refresh_count()


def test_brute_force_topk_dim_mismatch_refused(spark, sf_dir):
    """r13 advice: an internally-consistent query set of a DIFFERENT
    dimension than the corpus would zip_with-pad NULL sims and
    silently corrupt the recall ground truth — the corpus dim is now
    cross-checked against the query frame."""
    from cloud_volume_spark.ann_index import brute_force_topk

    emb = load(spark, sf_dir, "embeddings").where(F.col("vec_id") < 20)
    q = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0])], "query_id long, qvec array<double>")
    with pytest.raises(ValueError, match="dimension"):
        brute_force_topk(emb, q, k=3).collect()


def _file_census(base):
    """{partition dir: sorted [(name, size, mtime_ns)]} — byte-level
    identity proxy for the untouched-lists contract."""
    import os

    out = {}
    for d in os.listdir(base):
        if not d.startswith("cent_id="):
            continue
        full = os.path.join(base, d)
        out[d] = sorted(
            (f, os.path.getsize(os.path.join(full, f)),
             os.stat(os.path.join(full, f)).st_mtime_ns)
            for f in os.listdir(full) if f.endswith(".parquet"))
    return out


def test_retrain_restores_recall_after_drift(spark, sf_dir, tmp_path):
    """The retrain lifecycle contract: a drifted add() stream decays
    recall at fixed nprobe (frozen centroids); retrain() warm-starts
    Lloyd on the indexed vectors, moves only drifted centroids, and
    restores recall to the fresh-build value — while every untouched
    list's files stay byte-identical (delta-bounded like add/remove)
    and the int8 sidecar stays in sync."""
    from cloud_volume_spark.ann_index import (
        _codes_frame, brute_force_topk, recall_at_k,
    )

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # drifted regime: negated vectors under fresh ids — maximally far
    # from every build-time centroid on the sphere
    drift = emb.select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform("embedding", lambda x: -x).alias("embedding"))
    idx = build_ivf_index(emb, str(tmp_path / "drift"), nlist=8,
                          centroid_base_id=100, centroids="kmeans",
                          kmeans_rounds=3, int8=True)
    idx.add(drift)

    q = drift.where(F.col("vec_id") % 37 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"))
    full = emb.unionByName(drift)
    truth = brute_force_topk(full, q, k=5)
    pre = recall_at_k(
        idx.search(q, k=5, nprobe=2).select("query_id", "neighbor_id"),
        truth)

    res = idx.retrain(sample_frac=1.0, rounds=3, move_threshold=0.01)
    assert res["moved"], "drift this large must move centroids"
    assert res["reassigned"] > 0
    post = recall_at_k(
        idx.search(q, k=5, nprobe=2).select("query_id", "neighbor_id"),
        truth)

    fresh = build_ivf_index(full, str(tmp_path / "fresh"), nlist=8,
                            centroid_base_id=100, centroids="kmeans",
                            kmeans_rounds=3)
    ref = recall_at_k(
        fresh.search(q, k=5, nprobe=2).select("query_id", "neighbor_id"),
        truth)
    assert post > pre, (pre, post, ref)
    # warm-started Lloyd converges to a (slightly) different local
    # optimum than the fresh seed — equality is not structural; the
    # contract is "restored to the fresh-build value" within the
    # resolution of this corpus (65 truth pairs => 0.05 ≈ 3 pairs).
    # Measured here: pre 0.385, post 0.446-0.462, fresh 0.477.
    assert post >= ref - 0.05, (pre, post, ref)

    # lifecycle invariants: count unchanged, codes ≡ fresh
    # quantization of the persisted lists, meta records the retrain
    assert idx.meta["count"] == full.count() == idx.lists().count()
    assert idx.meta["retrains"] == 1
    got = sorted((r["vec_id"], r["cent_id"])
                 for r in idx.codes().collect())
    want = sorted((r["vec_id"], r["cent_id"])
                  for r in _codes_frame(idx.lists()).collect())
    assert got == want


def test_retrain_is_delta_bounded_and_below_threshold_noop(
        spark, sf_dir, tmp_path):
    """Untouched lists' files are BYTE-IDENTICAL after a retrain (the
    plan-gate analog at the storage layer), and a retrain on an
    undrifted index writes nothing at all."""
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # LOCALIZED drift — 30 antipodal vectors concentrate in a couple
    # of lists. Boundary reshuffling still nudges every centroid
    # ~0.02-0.05 (measured), so the 0.05 threshold isolates the lists
    # with real drifted mass (0.078 on this data) and leaves the rest
    # unmoved
    drift = emb.where(F.col("vec_id") < 30).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform("embedding", lambda x: -x).alias("embedding"))
    idx = build_ivf_index(emb, str(tmp_path / "db"), nlist=16,
                          centroid_base_id=100, centroids="kmeans",
                          kmeans_rounds=3)
    idx.add(drift)
    before = _file_census(f"{idx.path}/lists.parquet")
    res = idx.retrain(sample_frac=1.0, rounds=3, move_threshold=0.05)
    # measured on this data: moved=2, touched=4, reassigned=58 — the
    # delta-bounded shape (at nlist=8 the migrants scatter into every
    # list and nothing is untouched, which proves nothing)
    assert res["moved"] and len(res["moved"]) < 16, res
    after = _file_census(f"{idx.path}/lists.parquet")
    touched = {f"cent_id={c}" for c in res["touched"]}
    untouched = set(before) - touched
    assert untouched, "retrain touched every list — test needs a " \
                      "bigger corpus to be meaningful"
    for d in untouched:
        assert after[d] == before[d], f"untouched list {d} rewritten"
    for c in res["emptied"]:
        assert f"cent_id={c}" not in after
    assert idx.lists().count() == idx.meta["count"]

    # below-threshold retrain: exact no-op — nothing moves, nothing
    # is written, the index stays byte-identical
    cents_before = sorted(map(tuple, (
        (r["cent_id"], tuple(r["cvec"])) for r in
        idx.centroids().collect())))
    again = idx.retrain(sample_frac=1.0, rounds=3, move_threshold=0.9)
    assert again == {"moved": [], "reassigned": 0, "emptied": [],
                     "touched": []}
    assert _file_census(f"{idx.path}/lists.parquet") == after
    cents_after = sorted(map(tuple, (
        (r["cent_id"], tuple(r["cvec"])) for r in
        idx.centroids().collect())))
    assert cents_after == cents_before

    with pytest.raises(ValueError, match="sample_frac"):
        idx.retrain(sample_frac=0.0)
