"""Persistent IVF ANN index: build once, query many.

The registered ``ivf_ann_topk`` query (``operators/similarity.py``)
recomputes centroid assignment per call — right for the oracle gate,
wrong for serving. This module is the production lifecycle around the
SAME primitives: ``similarity.rank_centroids`` is the single
centroid-affinity contract (assignment = crnk 1, probing = crnk <=
nprobe) consumed by BOTH paths, so a one-sided tie-break or rounding
edit cannot diverge a persisted index from the oracle-gated query:

- :func:`build_ivf_index` — assign every vector to its nearest coarse
  centroid and persist the inverted lists as parquet PARTITIONED BY
  ``cent_id``, plus a centroid parquet and a JSON meta sidecar
  (written through :class:`~cloud_volume_spark.fs.PathOps`, so remote
  URIs work — the spatial-index sidecar lesson).
- :class:`IVFIndex` — open the persisted index and :meth:`search` it:
  probe selection runs on the broadcast centroid table, the probed
  ``cent_id`` set is pushed into the lists scan as a LITERAL filter,
  so Spark's partition pruning reads ONLY the probed inverted lists
  from disk. That is the 100 TB shape: nprobe/nlist of the corpus per
  query batch instead of a full scan, with no index rebuild per query.

Centroid modes: ``"sample"`` (the deterministic vec_id slice the
oracle uses — search results are bit-identical to ``ivf_ann_topk``)
or ``"kmeans"`` (Lloyd's rounds from ``embedding_kmeans``'s engine for
better list balance; still deterministic — seeded from the same
sample).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from cloud_volume_spark.fs import PathOps

_META_VERSION = 1


def build_ivf_index(
    emb: DataFrame,
    out_path: str,
    nlist: int = 16,
    centroid_base_id: int = 100,
    centroids: str = "sample",
    kmeans_rounds: int = 5,
) -> "IVFIndex":
    """Build and persist an IVF index over ``emb`` (vec_id long,
    embedding array<numeric>). One assignment job + one partitioned
    write; the centroid table is tiny (nlist rows) and lands as a
    single parquet. Returns the opened index."""
    from cloud_volume_spark.operators.similarity import (
        _as_double, _centroid_frame, _with_norm, rank_centroids,
    )

    if centroids not in ("sample", "kmeans"):
        raise ValueError(f"unknown centroid mode {centroids!r}")
    if nlist < 1:
        raise ValueError(f"nlist must be >= 1, got {nlist}")
    spark = emb.sparkSession
    fs = PathOps(out_path, spark)
    e = _with_norm(emb.select(
        "vec_id", _as_double("embedding").alias("embedding")))

    if centroids == "kmeans":
        cents = _kmeans_centroids(e, nlist, centroid_base_id,
                                  kmeans_rounds)
    else:
        cents = _centroid_frame(e, centroid_base_id, nlist)
        n_cents = cents.count()
        if n_cents != nlist:
            raise ValueError(
                f"sample centroids: vec_id slice [{centroid_base_id}, "
                f"{centroid_base_id + nlist}) yielded {n_cents} rows, "
                f"need {nlist} — pick a base id inside the corpus")
    cents = cents.coalesce(1)
    cents.write.mode("overwrite").parquet(f"{out_path}/centroids.parquet")

    # re-read so the assignment broadcasts the PERSISTED centroids —
    # search must see byte-identical cvecs, not a recomputation
    cents_p = spark.read.parquet(f"{out_path}/centroids.parquet")
    assign = (
        rank_centroids(e, cents_p)
        .where(F.col("crnk") == 1)
        .select("vec_id", "embedding", "nrm", "cent_id")
    )
    (assign.repartition("cent_id")
     .write.mode("overwrite").partitionBy("cent_id")
     .parquet(f"{out_path}/lists.parquet"))

    # count + dim from the JUST-WRITTEN lists (records what was
    # actually persisted and avoids re-running the whole assignment
    # job — the dominant cost — a second time for a scalar). The
    # explicit schema keeps an all-empty write readable so the empty
    # case fails with OUR message, not a schema-inference error.
    lists_p = spark.read.schema(assign.schema).parquet(
        f"{out_path}/lists.parquet")
    first = lists_p.select("embedding").first()
    if first is None:
        raise ValueError("build_ivf_index: empty embedding frame")
    meta = {"version": _META_VERSION, "nlist": int(nlist),
            "dim": len(first[0]),
            "count": lists_p.count(), "centroids": centroids,
            "centroid_base_id": int(centroid_base_id)}
    fs.write_bytes(f"{out_path}/ivf_meta.json",
                   json.dumps(meta, sort_keys=True).encode())
    return IVFIndex.open(spark, out_path)


def _kmeans_centroids(e: DataFrame, nlist: int, base_id: int,
                      rounds: int) -> DataFrame:
    """Deterministic Lloyd's: seeded from the vec_id sample slice,
    refined with per-dimension means (the embedding_kmeans engine's
    shape: broadcast centroids, map-side argmin, partial-agg means)."""
    from cloud_volume_spark.operators.similarity import (
        _assign_fold, _with_norm,
    )

    cents = {
        int(r["cent_id"]): list(r["cvec"])
        for r in e.where((F.col("vec_id") >= base_id)
                         & (F.col("vec_id") < base_id + nlist))
        .select(F.col("vec_id").alias("cent_id"),
                F.col("embedding").alias("cvec")).collect()
    }
    if len(cents) != nlist:
        raise ValueError(
            f"kmeans seeds: vec_id slice [{base_id}, {base_id + nlist}) "
            f"yielded {len(cents)} rows, need {nlist}")
    dim = len(next(iter(cents.values())))
    # _assign_fold's contract names the vector column "v"
    work = e.select("vec_id", F.col("embedding").alias("v")).persist()
    try:
        for _ in range(rounds):
            assigned = _assign_fold(work, cents)
            rows = (
                assigned.groupBy("cluster")
                .agg(*[F.avg(F.col("v")[i]).alias(f"m{i}")
                       for i in range(dim)],
                     F.count(F.lit(1)).alias("n"))
                .collect()
            )
            for r in rows:
                if r["n"] > 0:
                    cents[int(r["cluster"])] = [
                        float(r[f"m{i}"]) for i in range(dim)]
    finally:
        work.unpersist()
    spark = e.sparkSession
    out = spark.createDataFrame(
        [(cid, vec) for cid, vec in sorted(cents.items())],
        "cent_id long, cvec array<double>")
    return _with_norm(out, "cvec", "cnrm")


class IVFIndex:
    """Handle over a persisted IVF index directory."""

    def __init__(self, spark: SparkSession, path: str, meta: dict):
        self.spark = spark
        self.path = path
        self.meta = meta

    @classmethod
    def open(cls, spark: SparkSession, path: str) -> "IVFIndex":
        fs = PathOps(path, spark)
        meta_path = f"{path}/ivf_meta.json"
        if not fs.exists(meta_path):
            raise FileNotFoundError(
                f"not an IVF index (no ivf_meta.json): {path}")
        meta = json.loads(fs.read_bytes(meta_path).decode())
        if meta.get("version") != _META_VERSION:
            raise ValueError(
                f"ivf_meta version {meta.get('version')} unsupported "
                f"(expected {_META_VERSION}); rebuild the index")
        return cls(spark, path, meta)

    def centroids(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.path}/centroids.parquet")

    def lists(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.path}/lists.parquet")

    def list_stats(self) -> DataFrame:
        """Per-inverted-list row counts — the list-balance observable
        (a skewed list is the IVF failure mode: its probes degrade
        toward brute force). One partial-aggregating scan, no vectors
        read (column pruning keeps the embedding bytes on disk)."""
        return (self.lists().groupBy("cent_id")
                .agg(F.count(F.lit(1)).alias("n_vectors"))
                .orderBy("cent_id"))

    def add(self, emb: DataFrame) -> int:
        """Incrementally index new vectors — the consumer of a corpus
        delta (``corpus.snapshot_diff``'s added/changed set → embed →
        add) without rebuilding: assignment runs ONLY over the new
        batch against the persisted centroids (the index's frozen
        quantizer — exactly how IVF indexes grow; recall degrades only
        as the data distribution drifts from the trained centroids,
        surfaced by :meth:`list_stats` imbalance), and the new rows
        parquet-append into their list partitions. Duplicate vec_ids
        are refused loudly: search's dropDuplicates would otherwise
        silently keep an arbitrary copy. Returns the number added."""
        from cloud_volume_spark.operators.similarity import (
            _as_double, _with_norm, rank_centroids,
        )

        e = _with_norm(emb.select(
            "vec_id", _as_double("embedding").alias("embedding")))
        # ONE validation job for all three batch invariants: a
        # wrong-dimension vector would NULL every csim (zip_with pads
        # with nulls) and land at the lowest cent_id with garbage
        # affinity; an in-batch duplicate would collapse to whichever
        # copy crnk==1 keeps; a vec_id already on disk would leave two
        # versions searchable under dropDuplicates' arbitrary pick.
        dim = int(self.meta["dim"])
        bad = (
            e.join(self.lists().select(
                "vec_id", F.lit(1).alias("_onx")), "vec_id", "left")
            .groupBy("vec_id")
            .agg(F.count(F.lit(1)).alias("_n"),
                 F.max(F.size("embedding")).alias("_dim"),
                 F.max("_onx").alias("_on"))
            .where((F.col("_n") > 1) | F.col("_dim").isNull()
                   | (F.col("_dim") != dim) | F.col("_on").isNotNull())
            .limit(1).collect())
        if bad:
            r = bad[0]
            if r["_on"] is not None:
                raise ValueError(
                    f"add(): vec_id {r['vec_id']} is already indexed — "
                    "re-embedding a changed doc needs a rebuild "
                    "(parquet partitions are append-only; an in-place "
                    "replace would leave both versions searchable)")
            if r["_n"] > 1:
                raise ValueError(
                    f"add(): vec_id {r['vec_id']} appears {r['_n']} "
                    "times in the batch — deduplicate the delta first")
            raise ValueError(
                f"add(): vec_id {r['vec_id']} has dimension "
                f"{r['_dim']}, index is {dim}-dimensional")
        n_new = e.count()
        assign = (
            rank_centroids(e, self.centroids())
            .where(F.col("crnk") == 1)
            .select("vec_id", "embedding", "nrm", "cent_id")
        )
        (assign.repartition("cent_id")
         .write.mode("append").partitionBy("cent_id")
         .parquet(f"{self.path}/lists.parquet"))
        # `added` comes from the BATCH, not a lists-count delta: a
        # crash after a previous append but before its meta write must
        # not inflate this call's report. meta recounts the lists, so
        # a stale count self-heals here.
        self.meta = {**self.meta, "count": self.lists().count()}
        fs = PathOps(self.path, self.spark)
        fs.write_bytes(f"{self.path}/ivf_meta.json",
                       json.dumps(self.meta, sort_keys=True).encode())
        return n_new

    def search(self, queries: DataFrame, k: int = 5,
               nprobe: int = 4,
               exclude_self: bool = True) -> DataFrame:
        """Top-k cosine neighbors per query row (query_id long, qvec
        array<numeric>). Probe selection is a tiny Q×nlist job on the
        broadcast centroid table; its distinct cent_id set (≤ nlist
        values) is collected and pushed into the lists scan as a
        literal isin — PartitionFilters in the plan, so only the
        probed inverted lists are read. Candidate scoring is an
        equi-join on cent_id with the query side broadcast, exact
        cosine rerank, row_number top-k — identical tie rules to
        ``ivf_ann_topk`` (sim desc, neighbor_id asc, 6-dp rounding)."""
        from cloud_volume_spark.operators.similarity import (
            _as_double, _dot, _with_norm, rank_centroids,
        )

        q = _with_norm(queries.select(
            "query_id", _as_double("qvec").alias("qvec")), "qvec", "qnrm")
        cents = self.centroids()
        probe = (
            rank_centroids(q, cents, "query_id", "qvec", "qnrm")
            .where(F.col("crnk") <= int(nprobe))
            .select("query_id", "qvec", "qnrm", "cent_id")
        )
        # bounded by nlist (the meta records it): the literal filter
        # is what turns probing into partition pruning; the probe
        # recomputation this collect implies is a Q×nlist flyweight
        probed = [r["cent_id"] for r in
                  probe.select("cent_id").distinct().collect()]
        lists = self.lists().where(F.col("cent_id").isin(probed))
        cand = lists.join(F.broadcast(probe), on="cent_id")
        if exclude_self:
            cand = cand.where(F.col("vec_id") != F.col("query_id"))
        sim = _dot(F.col("embedding"), F.col("qvec")) / (
            F.col("nrm") * F.col("qnrm"))
        w = Window.partitionBy("query_id").orderBy(
            F.desc("sim"), F.asc("neighbor_id"))
        return (
            cand.select(
                "query_id", F.col("vec_id").alias("neighbor_id"),
                F.round(sim, 6).alias("sim"))
            .dropDuplicates(["query_id", "neighbor_id"])
            .withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= int(k))
        )
