"""Persistent IVF ANN index: build once, query many, grow and shrink.

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
- :meth:`IVFIndex.add` / :meth:`IVFIndex.remove` — the incremental
  lifecycle: a corpus delta (``corpus.snapshot_diff``) appends its
  added docs into their list partitions (one assignment job over the
  DELTA only) and rewrites ONLY the list partitions containing removed
  docs (dynamic partition overwrite — the ``compact()`` analog at the
  lists layer). A changed doc is ``remove`` + ``add``. Both mutations
  take an exclusive lock file (the volume layer's ``_commit_lock``
  pattern), so two writers cannot interleave appends.

Centroid modes: ``"sample"`` (the deterministic vec_id slice the
oracle uses — search results are bit-identical to ``ivf_ann_topk``)
or ``"kmeans"`` (spherical Lloyd's rounds for better list balance;
deterministic — seeded from the same sample).
"""

from __future__ import annotations

import json
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from cloud_volume_spark.fs import PathOps

_META_VERSION = 1

# the inverted-lists layout, fixed at build time: reads always carry
# this schema explicitly, so an index whose every list was remove()d
# (a full-corpus refresh between remove and re-add) stays READABLE —
# schema inference over a dir holding only _SUCCESS would otherwise
# fail every subsequent lists()/search()/add() with
# UNABLE_TO_INFER_SCHEMA, bricking the index at its most fragile
# moment. cent_id is pinned bigint (inference would flip the partition
# column between int and bigint depending on the values present).
_LISTS_SCHEMA = ("vec_id bigint, embedding array<double>, "
                 "nrm double, cent_id bigint")

# the OPTIONAL int8 sidecar (IVF-PQ-lite): symmetric-int8 codes stored
# in their own parquet partitioned the same way, so the affinity scan
# reads 2-byte components instead of 8-byte doubles (4x less list IO)
# and the float lists are touched only for the top-R rerank join
_CODES_SCHEMA = ("vec_id bigint, q array<smallint>, sq bigint, "
                 "cent_id bigint")

# the OPTIONAL product-quantization sidecar (full IVF-PQ): 1-byte
# codes per subspace against a frozen sample-mode codebook, plus the
# TRUE float norm (ADC divides by it, and it rides along at 8 bytes
# so the approximate cosine never needs the float lists). At the
# default 32x16 geometry (see the sweep note at similarity.PQ_M) a
# dim-64 float64 vector's 512 bytes become 32 code bytes + the norm
# — a ~13x scan-IO cut where int8 gives 4x, at 0.97 recall@10 with
# rerank_r at 1.6% of the candidate pool.
_PQ_SCHEMA = ("vec_id bigint, pq array<tinyint>, nrm double, "
              "cent_id bigint")


def _cb_from_rows(rows, m: int, ksub: int) -> list:
    """Assemble the driver-side nested codebook ``cb[mi][j]`` from
    persisted ``pq_codebook.parquet`` rows, refusing holes loudly (an
    underfull codebook would argmin over None entries)."""
    cb = [[None] * ksub for _ in range(m)]
    for r in rows:
        cb[int(r["mi"])][int(r["j"])] = [float(x) for x in r["sub"]]
    missing = [(mi, j) for mi in range(m) for j in range(ksub)
               if cb[mi][j] is None]
    if missing:
        raise ValueError(
            f"pq codebook underfull at (mi, j) {missing[:4]} — the "
            f"build corpus had fewer than pq_ksub={ksub} vectors; "
            "rebuild with a smaller pq_ksub")
    return cb


def _pq_frame(lists_df: DataFrame, cb: list) -> DataFrame:
    """(vec_id, pq, nrm, cent_id) for a lists-shaped frame — THE
    encode contract (``similarity.pq_encode_col``: 6-dp rounded L2
    argmin per subspace, j-asc ties), shared with the oracle-gated
    ``pq_ann_topk`` so a tie-break edit cannot diverge a persisted
    sidecar from the query the driver validates."""
    from cloud_volume_spark.operators.similarity import pq_encode_col

    return lists_df.select(
        "vec_id", pq_encode_col("embedding", cb).alias("pq"),
        "nrm", "cent_id")


def _codes_frame(lists_df: DataFrame) -> DataFrame:
    """(vec_id, q, sq, cent_id) for a lists-shaped frame — THE
    quantization contract (``similarity.int8_codes``), with components
    narrowed to smallint (values are in [-127, 127]; the narrow type
    is the IO win)."""
    from cloud_volume_spark.operators.similarity import int8_codes

    c = int8_codes(
        lists_df.select("vec_id", "embedding", "cent_id"), "embedding")
    return c.select(
        "vec_id",
        F.transform("q", lambda x: x.cast("smallint")).alias("q"),
        F.col("sq").cast("long").alias("sq"),
        "cent_id")


def _validate_embedding_frame(e: DataFrame, dim: int | None = None,
                              context: str = "build_ivf_index",
                              allow_empty: bool = False) -> tuple:
    """ONE aggregate job enforcing the batch contract shared by build
    and add (the round-10 advice: build must refuse what add refuses):
    non-empty, no NULL embeddings, no NULL/NaN *components* inside an
    embedding, one uniform dimension (== ``dim`` when the index
    already fixes it), no duplicate vec_ids, no zero-norm vectors. A
    violator would otherwise NULL (or NaN — which sorts ABOVE every
    real double under DESC, stealing crnk=1) its cosine against every
    centroid and land in an arbitrary inverted list with garbage
    affinity (or, for a zero vector, throw a raw ANSI divide-by-zero
    mid-build). Returns ``(n_rows, dim)``."""
    # exists() is NULL on a NULL array; sum skips NULLs, so NULL
    # embeddings stay the n_null check's job
    bad_elem = F.exists("embedding", lambda x: x.isNull() | F.isnan(x))
    s = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("vec_id").alias("n_ids"),
        F.sum(F.col("embedding").isNull().cast("long")).alias("n_null"),
        F.sum(bad_elem.cast("long")).alias("n_bad_elem"),
        F.min(F.size("embedding")).alias("dmin"),
        F.max(F.size("embedding")).alias("dmax"),
        F.min("nrm").alias("min_nrm"),
    ).first()
    n = int(s["n"])
    if n == 0:
        if allow_empty:
            return 0, dim
        raise ValueError(f"{context}: empty embedding frame")
    if int(s["n_null"] or 0) > 0:
        raise ValueError(
            f"{context}: {s['n_null']} of {n} rows have a NULL "
            "embedding — drop or re-embed them first")
    if int(s["n_bad_elem"] or 0) > 0:
        raise ValueError(
            f"{context}: {s['n_bad_elem']} of {n} rows have a NULL or "
            "NaN component inside the embedding — its norm/cosine is "
            "NULL or NaN (garbage affinity); drop or re-embed first")
    if s["dmin"] != s["dmax"]:
        raise ValueError(
            f"{context}: mixed embedding dimensions in the batch "
            f"({s['dmin']}..{s['dmax']}) — one width per index")
    if dim is not None and int(s["dmax"]) != dim:
        raise ValueError(
            f"{context}: batch dimension {s['dmax']}, index is "
            f"{dim}-dimensional")
    if int(s["n_ids"]) != n:
        raise ValueError(
            f"{context}: {n - int(s['n_ids'])} duplicate vec_ids in "
            "the batch — deduplicate first (an indexed duplicate would "
            "leave search's dropDuplicates keeping an arbitrary copy)")
    # min_nrm can only be NULL if every row's norm is NULL/NaN-skipped
    # — the component check above fires first, but guard the float()
    # so a future reorder can't turn the contract error into a raw
    # TypeError (round-11 advice)
    if s["min_nrm"] is not None and float(s["min_nrm"]) == 0.0:
        # an all-zero vector has no cosine direction: every division
        # by its norm (unit-normalization in kmeans, csim in
        # rank_centroids) is a divide-by-zero under ANSI mode — refuse
        # it here with the contract's loud error instead
        raise ValueError(
            f"{context}: the batch contains a zero-norm embedding — "
            "cosine affinity is undefined for it; drop or re-embed")
    return n, int(s["dmax"])


def build_ivf_index(
    emb: DataFrame,
    out_path: str,
    nlist: int = 16,
    centroid_base_id: int = 100,
    centroids: str = "sample",
    kmeans_rounds: int = 5,
    int8: bool = False,
    pq: bool = False,
    pq_m: int | None = None,
    pq_ksub: int | None = None,
) -> "IVFIndex":
    """Build and persist an IVF index over ``emb`` (vec_id long,
    embedding array<numeric>). One validation job + one assignment job
    + one partitioned write; the centroid table is tiny (nlist rows)
    and lands as a single parquet. Returns the opened index.

    ``pq=True`` additionally trains a sample-mode PQ codebook
    (``pq_m`` subspaces x ``pq_ksub`` entries, defaults
    ``similarity.PQ_M``/``PQ_KSUB``) on the build batch, freezes it as
    ``pq_codebook.parquet``, and writes the ``pq.parquet`` codes
    sidecar — :meth:`IVFIndex.search_pq` then scans ~1-byte codes
    instead of 8-byte doubles inside the probed lists. ``int8`` and
    ``pq`` are independent sidecars and may coexist."""
    from cloud_volume_spark.operators.similarity import (
        PQ_KSUB, PQ_M, _as_double, _centroid_frame, _with_norm,
        rank_centroids,
    )

    if centroids not in ("sample", "kmeans"):
        raise ValueError(f"unknown centroid mode {centroids!r}")
    if nlist < 1:
        raise ValueError(f"nlist must be >= 1, got {nlist}")
    p_m = int(pq_m) if pq_m is not None else PQ_M
    p_k = int(pq_ksub) if pq_ksub is not None else PQ_KSUB
    if pq and not 1 <= p_k <= 127:
        raise ValueError(
            f"pq_ksub must be in [1, 127] (codes are tinyint), "
            f"got {p_k}")
    spark = emb.sparkSession
    fs = PathOps(out_path, spark)
    e = _with_norm(emb.select(
        "vec_id", _as_double("embedding").alias("embedding")))
    # validate BEFORE any expensive work or on-disk state: same
    # contract add() enforces, so a bad vector can't slip in through
    # the initial build either
    n_total, dim = _validate_embedding_frame(e)
    if pq and (p_m < 1 or dim % p_m != 0):
        raise ValueError(
            f"pq_m={p_m} must divide the embedding dimension {dim} "
            "evenly — pick a subspace count that tiles the vector")

    if centroids == "kmeans":
        cents = _kmeans_centroids(e, nlist, centroid_base_id,
                                  kmeans_rounds, dim)
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
    if int8:
        # codes derive from the PERSISTED floats (parquet round-trips
        # doubles exactly, but reading back keeps one source of truth)
        persisted = (spark.read.schema(_LISTS_SCHEMA)
                     .parquet(f"{out_path}/lists.parquet"))
        (_codes_frame(persisted).repartition("cent_id")
         .write.mode("overwrite").partitionBy("cent_id")
         .parquet(f"{out_path}/codes.parquet"))
    if pq:
        from cloud_volume_spark.operators.similarity import (
            pq_codebook_frame,
        )
        persisted = (spark.read.schema(_LISTS_SCHEMA)
                     .parquet(f"{out_path}/lists.parquet"))
        # freeze the codebook FROM the persisted floats, then encode
        # against the PERSISTED codebook parquet's driver copy — one
        # source of truth for every later add/sync re-encode
        (pq_codebook_frame(persisted, p_m, p_k)
         .coalesce(1).write.mode("overwrite")
         .parquet(f"{out_path}/pq_codebook.parquet"))
        cb = _cb_from_rows(
            spark.read.parquet(
                f"{out_path}/pq_codebook.parquet").collect(),
            p_m, p_k)
        (_pq_frame(persisted, cb).repartition("cent_id")
         .write.mode("overwrite").partitionBy("cent_id")
         .parquet(f"{out_path}/pq.parquet"))

    # count + dim come from the validated input: every validated row
    # yields exactly one crnk==1 row (NULL/mixed-dim rows — the only
    # drop modes — were refused above), so no post-write rescan is
    # needed to know what was persisted.
    meta = {"version": _META_VERSION, "nlist": int(nlist),
            "dim": dim, "count": n_total, "centroids": centroids,
            "centroid_base_id": int(centroid_base_id),
            "int8": bool(int8), "pq": bool(pq)}
    if pq:
        meta["pq_m"] = p_m
        meta["pq_ksub"] = p_k
    fs.write_bytes(f"{out_path}/ivf_meta.json",
                   json.dumps(meta, sort_keys=True).encode())
    return IVFIndex.open(spark, out_path)


def _kmeans_centroids(e: DataFrame, nlist: int, base_id: int,
                      rounds: int, dim: int) -> DataFrame:
    """Deterministic SPHERICAL Lloyd's: vectors are L2-normalized
    before the rounds, so the squared-Euclidean argmin inside
    refinement (``_assign_fold``) IS the cosine argmin used by list
    assignment and probing (``||u - c||^2 = 2 - 2 cos`` on unit
    vectors) — one metric everywhere, instead of refining by L2 and
    serving by cosine (the round-10 advice's mismatch). Centroid means
    are re-normalized each round (classic spherical k-means); the
    final cosine assignment is invariant to that scaling but the
    rounds stay metric-consistent.

    Mean reduction is posexplode + groupBy(cluster, pos) partial agg —
    the ``embedding_kmeans`` engine's shape — so plan width is
    DIM-INDEPENDENT: at real embedding widths (768-4096) a
    per-dimension ``F.avg(col[i])`` aggregate would generate
    thousand-column plans; this one shuffles partitions x k x dim
    partial rows through a constant-size plan."""
    import math

    from cloud_volume_spark.operators.similarity import (
        _assign_fold, _with_norm,
    )

    unit = e.select(
        "vec_id",
        F.transform("embedding", lambda x: x / F.col("nrm")).alias("v"))
    cents = {
        int(r["cent_id"]): list(r["cvec"])
        for r in unit.where((F.col("vec_id") >= base_id)
                            & (F.col("vec_id") < base_id + nlist))
        .select(F.col("vec_id").alias("cent_id"),
                F.col("v").alias("cvec")).collect()
    }
    if len(cents) != nlist:
        raise ValueError(
            f"kmeans seeds: vec_id slice [{base_id}, {base_id + nlist}) "
            f"yielded {len(cents)} rows, need {nlist}")
    # _assign_fold's contract names the vector column "v"
    work = unit.persist()
    try:
        _lloyd_refine(work, cents, rounds, dim)
    finally:
        work.unpersist()
    spark = e.sparkSession
    out = spark.createDataFrame(
        [(cid, vec) for cid, vec in sorted(cents.items())],
        "cent_id long, cvec array<double>")
    return _with_norm(out, "cvec", "cnrm")


def _lloyd_refine(work: DataFrame, cents: dict, rounds: int,
                  dim: int) -> dict:
    """The shared spherical-Lloyd refinement loop: ``work`` holds unit
    vectors in column "v" (``_assign_fold``'s contract), ``cents`` is
    mutated in place round by round. Mean reduction is posexplode +
    decimal partial agg (exact order-independent SUM, one double
    division + 6 dp ROUND) — the ``embedding_kmeans`` determinism
    recipe; empty / degenerate clusters keep their previous centroid.
    Used by the initial ``kmeans`` build mode AND :meth:`IVFIndex.
    retrain`'s warm start, so a tie-break or rounding edit cannot
    diverge the two."""
    import math

    from cloud_volume_spark.operators.similarity import _assign_fold

    for _ in range(rounds):
        rows = (
            _assign_fold(work, cents)
            .select("cluster", F.posexplode("v").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.round(
                F.sum(F.col("x").cast("decimal(38,12)"))
                .cast("double") / F.count("x"), 6).alias("mv"))
            .collect()
        )
        means: dict = {}
        for r in rows:
            means.setdefault(int(r["cluster"]),
                             [0.0] * dim)[int(r["pos"])] = float(r["mv"])
        for cid, m in means.items():
            nrm = math.sqrt(sum(x * x for x in m))
            if nrm > 0.0:
                cents[cid] = [round(x / nrm, 6) for x in m]
    return cents


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
        return (self.spark.read.schema(_LISTS_SCHEMA)
                .parquet(f"{self.path}/lists.parquet"))

    @property
    def int8(self) -> bool:
        return bool(self.meta.get("int8"))

    def codes(self) -> DataFrame:
        """The int8 sidecar (built with ``int8=True``): quantized
        codes per vector, partitioned like the float lists."""
        if not self.int8:
            raise ValueError(
                "this index has no int8 codes — rebuild with "
                "build_ivf_index(..., int8=True)")
        return (self.spark.read.schema(_CODES_SCHEMA)
                .parquet(f"{self.path}/codes.parquet"))

    @property
    def pq(self) -> bool:
        return bool(self.meta.get("pq"))

    def pq_codes(self) -> DataFrame:
        """The product-quantization sidecar (built with ``pq=True``):
        1-byte-per-subspace codes plus the true norm, partitioned
        like the float lists."""
        if not self.pq:
            raise ValueError(
                "this index has no PQ codes — rebuild with "
                "build_ivf_index(..., pq=True)")
        return (self.spark.read.schema(_PQ_SCHEMA)
                .parquet(f"{self.path}/pq.parquet"))

    def pq_codebook(self) -> DataFrame:
        """The frozen sample-mode codebook (mi, j, sub)."""
        if not self.pq:
            raise ValueError(
                "this index has no PQ codebook — rebuild with "
                "build_ivf_index(..., pq=True)")
        return self.spark.read.parquet(
            f"{self.path}/pq_codebook.parquet")

    def _pq_cb(self) -> list:
        """Driver-side nested codebook, loaded once per handle —
        m·ksub·dsub doubles (1 KiB-scale), frozen at build so the
        cache can never go stale within a handle's lifetime."""
        if getattr(self, "_pq_cb_cache", None) is None:
            self._pq_cb_cache = _cb_from_rows(
                self.pq_codebook().collect(),
                int(self.meta["pq_m"]), int(self.meta["pq_ksub"]))
        return self._pq_cb_cache

    def list_stats(self) -> DataFrame:
        """Per-inverted-list row counts — the list-balance observable
        (a skewed list is the IVF failure mode: its probes degrade
        toward brute force). One partial-aggregating scan, no vectors
        read (column pruning keeps the embedding bytes on disk)."""
        return (self.lists().groupBy("cent_id")
                .agg(F.count(F.lit(1)).alias("n_vectors"))
                .orderBy("cent_id"))

    # ---- mutation ----------------------------------------------------

    @property
    def _lock_path(self) -> str:
        return f"{self.path}/.ivf-lock"

    @contextmanager
    def _mutation_lock(self, break_lock: bool = False):
        """Exclusive index-mutation lock (the volume layer's
        ``_commit_lock`` pattern, ``volume.py:2398``): two concurrent
        ``add``/``remove`` calls would otherwise interleave their
        appends / partition rewrites and their meta writes. Crashed
        holders leave the lock file behind by design — loud beats a
        silent steal; the heal methods (``refresh_count`` /
        ``sync_codes``) accept ``break_lock=True`` to steal a DEAD
        writer's lock, since they take this lock themselves and would
        otherwise refuse exactly when they're needed."""
        fs = PathOps(self.path, self.spark)
        if break_lock:
            fs.remove(self._lock_path)
        if not fs.create_exclusive(self._lock_path):
            raise RuntimeError(
                f"another writer holds the index lock "
                f"{self._lock_path!r}; retry after its mutation "
                "finishes, or — if the writer crashed — run "
                "refresh_count(break_lock=True) / "
                "sync_codes(break_lock=True)")
        try:
            yield fs
        finally:
            fs.remove(self._lock_path)

    def _write_meta(self, fs: PathOps) -> None:
        fs.write_bytes(f"{self.path}/ivf_meta.json",
                       json.dumps(self.meta, sort_keys=True).encode())

    def refresh_count(self, break_lock: bool = False) -> int:
        """Recount the lists (ids-only, column-pruned scan) and
        persist — the self-heal for a crash between a data append /
        partition rewrite and its meta write. ``add``/``remove``
        themselves track the count incrementally (O(delta), not
        O(index)). On an int8 index, pair with :meth:`sync_codes`:
        the same crash window can leave the codes sidecar behind the
        lists. A crashed mutation leaves its ``.ivf-lock`` behind,
        which would make this heal refuse too — pass
        ``break_lock=True`` (after confirming the writer is dead) to
        steal the dead writer's lock."""
        with self._mutation_lock(break_lock=break_lock) as fs:
            self.meta = {**self.meta, "count": self.lists().count()}
            self._write_meta(fs)
        return int(self.meta["count"])

    def sync_codes(self, break_lock: bool = False) -> int:
        """Re-derive the int8 sidecar for every inverted list whose
        codes partition disagrees with its float lists partition — the
        crash heal for the TWO-write mutation window on an int8 index:
        ``add``/``remove`` commit the lists job first and the codes
        job second, so a crash between them leaves ``search_int8``
        silently behind ``search`` (missing the new batch, or still
        serving removed vectors' codes). Divergence detection is two
        ids-only row-count scans per cent_id (every mutation that can
        tear changes a partition's row count — appends add rows,
        removals delete them; compaction rewrites files only, equal
        content); mismatched partitions are re-quantized FROM the
        lists (dynamic overwrite), codes partitions with no surviving
        list are dropped. Returns the number of partitions healed —
        0 means the sidecar is consistent. ``break_lock=True`` steals
        a crashed (confirmed-dead) writer's ``.ivf-lock``, which would
        otherwise make this heal refuse (see :meth:`refresh_count`)."""
        if not self.int8:
            raise ValueError(
                "sync_codes() needs an int8 index — rebuild with "
                "build_ivf_index(..., int8=True)")
        with self._mutation_lock(break_lock=break_lock) as fs:
            l_ct = {int(r["cent_id"]): int(r["n"]) for r in
                    self.lists().groupBy("cent_id")
                    .agg(F.count(F.lit(1)).alias("n")).collect()}
            c_ct = {int(r["cent_id"]): int(r["n"]) for r in
                    self.codes().groupBy("cent_id")
                    .agg(F.count(F.lit(1)).alias("n")).collect()}
            bad = sorted(c for c in set(l_ct) | set(c_ct)
                         if l_ct.get(c) != c_ct.get(c))
            if not bad:
                return 0
            rewrite = [c for c in bad if c in l_ct]
            if rewrite:
                fresh = _codes_frame(
                    self.lists().where(F.col("cent_id").isin(rewrite))
                ).localCheckpoint(eager=True)
                (fresh.repartition("cent_id")
                 .write.mode("overwrite")
                 .option("partitionOverwriteMode", "dynamic")
                 .partitionBy("cent_id")
                 .parquet(f"{self.path}/codes.parquet"))
            for c in bad:
                if c not in l_ct:
                    fs.rmtree(f"{self.path}/codes.parquet/cent_id={c}")
        return len(bad)

    def sync_pq(self, break_lock: bool = False) -> int:
        """:meth:`sync_codes` for the PQ sidecar: re-encode (against
        the FROZEN codebook) every inverted list whose ``pq.parquet``
        partition's row count disagrees with its float lists partition
        — the heal for the two-write crash window on a ``pq=True``
        index (lists job commits, pq job doesn't; ``search_pq``
        silently lags ``search``). Returns partitions healed; 0 means
        consistent. ``break_lock=True`` steals a confirmed-dead
        writer's ``.ivf-lock``."""
        if not self.pq:
            raise ValueError(
                "sync_pq() needs a PQ index — rebuild with "
                "build_ivf_index(..., pq=True)")
        with self._mutation_lock(break_lock=break_lock) as fs:
            l_ct = {int(r["cent_id"]): int(r["n"]) for r in
                    self.lists().groupBy("cent_id")
                    .agg(F.count(F.lit(1)).alias("n")).collect()}
            p_ct = {int(r["cent_id"]): int(r["n"]) for r in
                    self.pq_codes().groupBy("cent_id")
                    .agg(F.count(F.lit(1)).alias("n")).collect()}
            bad = sorted(c for c in set(l_ct) | set(p_ct)
                         if l_ct.get(c) != p_ct.get(c))
            if not bad:
                return 0
            rewrite = [c for c in bad if c in l_ct]
            if rewrite:
                fresh = _pq_frame(
                    self.lists().where(F.col("cent_id").isin(rewrite)),
                    self._pq_cb()).localCheckpoint(eager=True)
                (fresh.repartition("cent_id")
                 .write.mode("overwrite")
                 .option("partitionOverwriteMode", "dynamic")
                 .partitionBy("cent_id")
                 .parquet(f"{self.path}/pq.parquet"))
            for c in bad:
                if c not in l_ct:
                    fs.rmtree(f"{self.path}/pq.parquet/cent_id={c}")
        return len(bad)

    def add(self, emb: DataFrame) -> int:
        """Incrementally index new vectors — the consumer of a corpus
        delta (``corpus.snapshot_diff``'s added set → embed → add)
        without rebuilding: assignment runs ONLY over the new batch
        against the persisted centroids (the index's frozen quantizer
        — exactly how IVF indexes grow; recall degrades only as the
        data distribution drifts from the trained centroids, surfaced
        by :meth:`list_stats` imbalance), and the new rows
        parquet-append into their list partitions. Duplicate vec_ids
        are refused loudly (a changed doc is :meth:`remove` then
        ``add``). Returns the number added.

        Atomicity: the append is ONE Spark job, published at job
        commit by the Hadoop committer — atomic on rename-based
        filesystems (local, HDFS); on object stores without atomic
        rename a crash mid-commit can leave a PREFIX of the batch
        visible. Recovery is ``remove(batch_ids, missing_ok=True)``
        then re-``add`` — the lock file this method takes marks the
        mutation in flight. A crash after the append but before the
        meta write leaves only the COUNT stale; :meth:`refresh_count`
        heals it (duplicate refusal reads the lists, never the count,
        so correctness is unaffected). On an int8 index the mutation
        is TWO jobs (lists first, then the codes sidecar): a crash
        between them leaves ``search_int8`` missing the batch that
        ``search`` already serves — :meth:`sync_codes` detects and
        heals exactly that window; run it (with ``refresh_count``)
        after any crashed mutation."""
        from cloud_volume_spark.operators.similarity import (
            _as_double, _with_norm, rank_centroids,
        )

        e = _with_norm(emb.select(
            "vec_id", _as_double("embedding").alias("embedding")))
        with self._mutation_lock() as fs:
            # THE shared batch validator (one agg job: NULL /
            # mixed-dim / duplicate / zero-norm — literally the same
            # function build runs, so a new invariant can never be
            # enforced on one path only), plus add()'s own invariant:
            # a vec_id already on disk would leave two versions
            # searchable under search's dropDuplicates arbitrary pick.
            # empty delta = no-op (a snapshot-diff round with nothing
            # added/changed must not crash the refresh loop)
            n_new, _ = _validate_embedding_frame(
                e, dim=int(self.meta["dim"]), context="add()",
                allow_empty=True)
            if n_new == 0:
                return 0
            clash = (e.select("vec_id")
                     .join(self.lists().select("vec_id"), "vec_id")
                     .limit(1).collect())
            if clash:
                raise ValueError(
                    f"add(): vec_id {clash[0]['vec_id']} is already "
                    "indexed — a changed doc is remove() then add() "
                    "(an in-place append would leave both versions "
                    "searchable)")
            assign = (
                rank_centroids(e, self.centroids())
                .where(F.col("crnk") == 1)
                .select("vec_id", "embedding", "nrm", "cent_id")
            )
            (assign.repartition("cent_id")
             .write.mode("append").partitionBy("cent_id")
             .parquet(f"{self.path}/lists.parquet"))
            if self.int8:
                # same delta, same assignment — one map-only quantize
                (_codes_frame(assign).repartition("cent_id")
                 .write.mode("append").partitionBy("cent_id")
                 .parquet(f"{self.path}/codes.parquet"))
            if self.pq:
                # frozen codebook, delta-only encode — map-only like
                # the int8 mirror (crash window healed by sync_pq)
                (_pq_frame(assign, self._pq_cb())
                 .repartition("cent_id")
                 .write.mode("append").partitionBy("cent_id")
                 .parquet(f"{self.path}/pq.parquet"))
            # O(delta) bookkeeping: the batch was validated disjoint
            # from the on-disk ids and drop-free, so count grows by
            # exactly n_new — recounting the whole index here would
            # pay O(index) per O(delta) work (refresh_count() is the
            # on-demand recount).
            self.meta = {**self.meta, "count":
                         int(self.meta["count"]) + n_new}
            self._write_meta(fs)
        return n_new

    def remove(self, vec_ids, missing_ok: bool = False) -> int:
        """Delete vectors by id, rewriting ONLY the inverted-list
        partitions that contain them — the ``compact()`` analog at the
        lists layer, closing the snapshot_diff→reindex loop for
        CHANGED and REMOVED docs (changed = ``remove`` + :meth:`add`)
        without a full rebuild.

        ``vec_ids``: an iterable of ints or a single-column DataFrame
        named ``vec_id``. Ids not in the index refuse loudly unless
        ``missing_ok=True`` (the torn-append recovery mode — see
        :meth:`add`). Returns the number of rows actually removed.

        Shape: one ids-only scan locates the affected cent_ids (the
        embedding bytes stay on disk — column pruning); the survivors
        of ONLY those partitions are materialized (bounded by the
        affected lists, delta-scale for a delta-sized remove) and
        written back with DYNAMIC partition overwrite, so untouched
        inverted lists are never rewritten; a fully-emptied list's
        directory is dropped explicitly (dynamic overwrite only
        replaces partitions present in the output). On an int8 index
        the codes sidecar rewrites in a SECOND job — a crash between
        the two leaves stale codes still serving the removed vectors;
        :meth:`sync_codes` is the heal (see :meth:`add`)."""
        spark = self.spark
        if isinstance(vec_ids, DataFrame):
            # materialize the id set ONCE (round-11 advice): the hit
            # count, missing probe, and survivors anti-join below are
            # separate jobs, and a non-deterministic input plan (limit/
            # sample) re-evaluated per job would desynchronize them.
            # Ids are delta-scale by contract, so a driver collect is
            # the cheap pin.
            rows = (vec_ids.select(F.col("vec_id").cast("long"))
                    .distinct().collect())
            if any(r["vec_id"] is None for r in rows):
                raise ValueError("remove(): NULL vec_id in the id frame")
            pinned = sorted(int(r["vec_id"]) for r in rows)
        else:
            pinned = sorted({int(v) for v in vec_ids})
        if not pinned:
            return 0
        ids = spark.createDataFrame([(v,) for v in pinned], "vec_id long")
        with self._mutation_lock() as fs:
            n_req = len(pinned)
            lists = self.lists()
            # per-affected-list hit counts: ≤ nlist rows, one
            # ids-only scan
            per_cent = (lists.select("vec_id", "cent_id")
                        .join(F.broadcast(ids), "vec_id")
                        .groupBy("cent_id")
                        .agg(F.count(F.lit(1)).alias("_hits"))
                        .collect())
            n_hit = sum(int(r["_hits"]) for r in per_cent)
            if n_hit != n_req and not missing_ok:
                missing = (ids.join(lists.select("vec_id"), "vec_id",
                                    "left_anti").limit(1).collect())
                raise ValueError(
                    f"remove(): vec_id {missing[0]['vec_id']} is not "
                    "indexed — pass missing_ok=True if this is a "
                    "torn-append recovery")
            if n_hit == 0:
                return 0
            affected = sorted(int(r["cent_id"]) for r in per_cent)
            before = {int(r["cent_id"]): int(r["n"]) for r in
                      lists.where(F.col("cent_id").isin(affected))
                      .groupBy("cent_id")
                      .agg(F.count(F.lit(1)).alias("n")).collect()}
            survivors = (
                lists.where(F.col("cent_id").isin(affected))
                .join(F.broadcast(ids), "vec_id", "left_anti")
                .select("vec_id", "embedding", "nrm", "cent_id")
                # materialize BEFORE the overwrite: Spark refuses a
                # write into a path its plan is reading from; bounded
                # by the affected lists only
                .localCheckpoint(eager=True))
            (survivors.repartition("cent_id")
             .write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("cent_id")
             .parquet(f"{self.path}/lists.parquet"))
            emptied = [c for r in per_cent
                       for c in [int(r["cent_id"])]
                       if before[c] == int(r["_hits"])]
            for c in emptied:
                fs.rmtree(f"{self.path}/lists.parquet/cent_id={c}")
            if self.int8:
                # the codes sidecar mirrors the SAME affected/emptied
                # partition set (vec_id→cent_id is identical by
                # construction) — dynamic overwrite, delta-bounded
                code_survivors = (
                    self.codes()
                    .where(F.col("cent_id").isin(affected))
                    .join(F.broadcast(ids), "vec_id", "left_anti")
                    .select("vec_id", "q", "sq", "cent_id")
                    .localCheckpoint(eager=True))
                (code_survivors.repartition("cent_id")
                 .write.mode("overwrite")
                 .option("partitionOverwriteMode", "dynamic")
                 .partitionBy("cent_id")
                 .parquet(f"{self.path}/codes.parquet"))
                for c in emptied:
                    fs.rmtree(f"{self.path}/codes.parquet/cent_id={c}")
            if self.pq:
                # same affected/emptied partition set (vec_id→cent_id
                # identical by construction) — dynamic overwrite
                pq_survivors = (
                    self.pq_codes()
                    .where(F.col("cent_id").isin(affected))
                    .join(F.broadcast(ids), "vec_id", "left_anti")
                    .select("vec_id", "pq", "nrm", "cent_id")
                    .localCheckpoint(eager=True))
                (pq_survivors.repartition("cent_id")
                 .write.mode("overwrite")
                 .option("partitionOverwriteMode", "dynamic")
                 .partitionBy("cent_id")
                 .parquet(f"{self.path}/pq.parquet"))
                for c in emptied:
                    fs.rmtree(f"{self.path}/pq.parquet/cent_id={c}")
            self.meta = {**self.meta, "count":
                         int(self.meta["count"]) - n_hit}
            self._write_meta(fs)
        return n_hit

    def compact_lists(self, max_files_per_list: int = 8) -> int:
        """Rewrite inverted lists whose partition directory has
        accumulated more than ``max_files_per_list`` parquet files —
        the small-files tax of a daily :meth:`add` loop (every append
        job adds its own part files to each touched partition; after
        months of deltas a probe opens dozens of tiny footers per
        list). Same dynamic-partition-overwrite shape as
        :meth:`remove`: ONLY the offending partitions are rewritten
        (``repartition("cent_id")`` leaves one task — one output file
        — per list), untouched lists keep their files, vector content
        and meta count are unchanged. Returns the number of LISTS
        partitions rewritten; on an int8 index the codes sidecar is
        compacted on the same pass (it accumulates the same
        small-files tax) but its rewrites are NOT in the return —
        callers assert the return against their crowded-list count
        (``last_codes_compacted`` carries the sidecar's count)."""
        def _compact(fs, base, reader, cols):
            crowded = []
            for d in fs.listdir(base):
                if not d.startswith("cent_id="):
                    continue
                n_files = sum(
                    1 for f in fs.listdir(f"{base}/{d}")
                    if f.endswith(".parquet"))
                if n_files > max_files_per_list:
                    crowded.append(int(d.split("=", 1)[1]))
            if not crowded:
                return 0
            survivors = (
                reader().where(F.col("cent_id").isin(crowded))
                .select(*cols)
                .localCheckpoint(eager=True))
            (survivors.repartition("cent_id")
             .write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("cent_id")
             .parquet(base))
            return len(crowded)

        with self._mutation_lock() as fs:
            n = _compact(fs, f"{self.path}/lists.parquet", self.lists,
                         ["vec_id", "embedding", "nrm", "cent_id"])
            self.last_codes_compacted = 0
            if self.int8:
                # the codes sidecar accumulates the same small-files
                # tax (every add appends to both); compact it on the
                # same pass — counted SEPARATELY, not in the return
                # (a caller asserting the return equals its
                # crowded-list count must not see an inflated value
                # on int8 indexes)
                self.last_codes_compacted = _compact(
                    fs, f"{self.path}/codes.parquet", self.codes,
                    ["vec_id", "q", "sq", "cent_id"])
            self.last_pq_compacted = 0
            if self.pq:
                # same rule for the PQ sidecar, same separate counter
                self.last_pq_compacted = _compact(
                    fs, f"{self.path}/pq.parquet", self.pq_codes,
                    ["vec_id", "pq", "nrm", "cent_id"])
        return n

    def retrain(self, sample_frac: float = 0.25, rounds: int = 3,
                move_threshold: float = 0.01) -> dict:
        """Re-center drifted lists — the lifecycle op for an index
        whose :meth:`add` stream has shifted the data distribution
        away from the FROZEN build-time centroids (lists skew, recall
        at fixed nprobe decays; :meth:`list_stats` is the
        observable). Warm-start spherical Lloyd (the build's own
        :func:`_lloyd_refine`) on a deterministic md5-keyspace sample
        of the indexed vectors, then delta-bounded like add/remove:

        - centroids whose unit direction moved more than
          ``move_threshold`` (cosine distance) take their new
          position; the rest keep their EXACT old vector, so unmoved
          lists' stored assignments stay argmax-consistent;
        - ONLY the moved lists' vectors are reassigned (against the
          full updated centroid table, through the shared
          ``rank_centroids`` contract); the touched partition set
          (moved sources ∪ migration targets) is rewritten in ONE
          dynamic-partition-overwrite job — a crash can tear nothing
          mid-migration — and every untouched list's files stay
          byte-identical;
        - on an int8 index the codes sidecar mirrors the same touched
          set (re-quantized from the persisted floats).

        Vectors in unmoved lists are NOT revisited even when a moved
        centroid ends nearer — that is the bounded-cost tradeoff; the
        recall restoration is contract-tested (drift leg in
        tests/test_ann_index.py and ``scripts/bench_scale.py
        --ivf-recall``). Returns ``{"moved": [...], "reassigned": n,
        "emptied": [...], "touched": [...]}``; a retrain below the
        threshold writes NOTHING and returns empty sets."""
        from cloud_volume_spark.operators.similarity import (
            _dot, _with_norm, rank_centroids,
        )

        if not 0.0 < sample_frac <= 1.0:
            raise ValueError(
                f"sample_frac must be in (0, 1], got {sample_frac}")
        dim = int(self.meta["dim"])
        with self._mutation_lock() as fs:
            lists = self.lists()
            unit = lists.select(
                "vec_id",
                F.transform("embedding",
                            lambda x: x / F.col("nrm")).alias("v"))
            if sample_frac < 1.0:
                # md5-keyspace slice (the corpus-sampling house rule:
                # never RAND) — first hex byte under the fraction's
                # 1/256 threshold
                thresh = format(max(1, int(round(sample_frac * 256))),
                                "02x")
                unit = unit.where(
                    F.substring(F.md5(F.concat(
                        F.lit("retrain|"),
                        F.col("vec_id").cast("string"))), 1, 2)
                    < F.lit(thresh))

            old = {int(r["cent_id"]): (list(r["cvec"]), float(r["cnrm"]))
                   for r in self.centroids().collect()}
            old_unit = {c: [x / n for x in v] if n > 0 else v
                        for c, (v, n) in old.items()}
            cents_work = {c: list(v) for c, v in old_unit.items()}
            work = unit.persist()
            try:
                _lloyd_refine(work, cents_work, rounds, dim)
            finally:
                work.unpersist()

            def _cos_dist(a, b):
                return 1.0 - sum(x * y for x, y in zip(a, b))

            moved = sorted(
                c for c in old
                if _cos_dist(old_unit[c], cents_work[c]) > move_threshold)
            if not moved:
                return {"moved": [], "reassigned": 0, "emptied": [],
                        "touched": []}

            # moved centroids take the refined unit vector; unmoved
            # keep their exact persisted bytes (scale is irrelevant —
            # rank_centroids divides by cnrm)
            rows = []
            for c in sorted(old):
                if c in moved:
                    rows.append((c, cents_work[c]))
                else:
                    rows.append((c, old[c][0]))
            cents_new = _with_norm(self.spark.createDataFrame(
                rows, "cent_id long, cvec array<double>"), "cvec", "cnrm")
            # the old centroid parquet is an input of the refinement
            # already collected above; safe to overwrite now, and the
            # reassignment must read the PERSISTED table (the build's
            # convention: search sees byte-identical cvecs)
            cents_new.coalesce(1).write.mode("overwrite").parquet(
                f"{self.path}/centroids.parquet")
            cents_p = self.centroids()

            movers = lists.where(F.col("cent_id").isin(moved)).select(
                "vec_id", "embedding", "nrm")
            assign = (
                rank_centroids(movers, cents_p)
                .where(F.col("crnk") == 1)
                .select("vec_id", "embedding", "nrm", "cent_id")
                .localCheckpoint(eager=True))
            n_movers = assign.count()
            targets = sorted(int(r["cent_id"]) for r in
                             assign.select("cent_id").distinct().collect())
            touched = sorted(set(moved) | set(targets))
            # ONE overwrite job over the touched set: unmoved targets
            # contribute their existing rows verbatim, movers land at
            # their new assignment — materialized first (Spark refuses
            # a write into a path its plan reads)
            keep = lists.where(F.col("cent_id").isin(
                [t for t in touched if t not in moved])).select(
                "vec_id", "embedding", "nrm", "cent_id")
            content = keep.unionByName(assign).localCheckpoint(eager=True)
            (content.repartition("cent_id")
             .write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("cent_id")
             .parquet(f"{self.path}/lists.parquet"))
            # dynamic overwrite replaces only partitions PRESENT in
            # the frame: moved lists drained to zero keep their stale
            # files unless dropped explicitly (remove()'s rule)
            emptied = sorted(set(moved) - set(targets))
            for c in emptied:
                fs.rmtree(f"{self.path}/lists.parquet/cent_id={c}")
            if self.int8:
                fresh = _codes_frame(
                    self.lists().where(F.col("cent_id").isin(touched))
                ).localCheckpoint(eager=True)
                (fresh.repartition("cent_id")
                 .write.mode("overwrite")
                 .option("partitionOverwriteMode", "dynamic")
                 .partitionBy("cent_id")
                 .parquet(f"{self.path}/codes.parquet"))
                for c in emptied:
                    fs.rmtree(f"{self.path}/codes.parquet/cent_id={c}")
            if self.pq:
                # the CODEBOOK stays frozen across retrain (codes are
                # centroid-independent); only the touched partitions'
                # rows migrate, re-encoded from the persisted floats
                fresh_pq = _pq_frame(
                    self.lists().where(F.col("cent_id").isin(touched)),
                    self._pq_cb()).localCheckpoint(eager=True)
                (fresh_pq.repartition("cent_id")
                 .write.mode("overwrite")
                 .option("partitionOverwriteMode", "dynamic")
                 .partitionBy("cent_id")
                 .parquet(f"{self.path}/pq.parquet"))
                for c in emptied:
                    fs.rmtree(f"{self.path}/pq.parquet/cent_id={c}")
            self.meta = {**self.meta,
                         "retrains": int(self.meta.get("retrains", 0)) + 1}
            self._write_meta(fs)
        return {"moved": moved, "reassigned": int(n_movers),
                "emptied": emptied, "touched": touched}

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

    def search_int8(self, queries: DataFrame, k: int = 5,
                    nprobe: int = 4, rerank_r: int | None = None,
                    exclude_self: bool = True) -> DataFrame:
        """Top-k via the INT8 sidecar (IVF-PQ-lite serving path):
        candidate affinity is the quantized cosine over
        ``codes.parquet`` — the pruned scan reads 2-byte components
        instead of 8-byte doubles, the 4x list-IO cut that pays for
        itself at 100 TB — keeping the top ``rerank_r`` per query
        (default ``4*k``); ONLY those rows join back to the float
        lists (broadcast candidate set, same partition pruning) for
        the exact cosine rerank with :meth:`search`'s tie rules.

        With ``rerank_r >= `` the probed candidate count, the int8
        stage prunes nothing and the result equals :meth:`search`
        exactly (the contract test); finite ``rerank_r`` trades
        recall for IO — the --ivf-recall leg tables it."""
        from cloud_volume_spark.operators.similarity import (
            _as_double, _dot, _with_norm, int8_codes, int8_qsim,
            rank_centroids,
        )

        if not self.int8:
            raise ValueError(
                "search_int8 needs an int8 index — rebuild with "
                "build_ivf_index(..., int8=True)")
        r = int(rerank_r) if rerank_r is not None else 4 * int(k)
        if r < int(k):
            raise ValueError(
                f"rerank_r ({r}) must be >= k ({k}) — fewer reranked "
                "candidates than results requested")
        q = _with_norm(queries.select(
            "query_id", _as_double("qvec").alias("qvec")), "qvec", "qnrm")
        q = (int8_codes(q, "qvec")
             .withColumnRenamed("q", "qq")
             .withColumnRenamed("sq", "qsq"))
        probe = (
            rank_centroids(q, self.centroids(), "query_id", "qvec",
                           "qnrm")
            .where(F.col("crnk") <= int(nprobe))
            .select("query_id", "qvec", "qnrm", "qq", "qsq", "cent_id")
        )
        probed = [row["cent_id"] for row in
                  probe.select("cent_id").distinct().collect()]
        codes = self.codes().where(F.col("cent_id").isin(probed))
        cand = codes.join(F.broadcast(probe), on="cent_id")
        if exclude_self:
            cand = cand.where(F.col("vec_id") != F.col("query_id"))
        w_r = Window.partitionBy("query_id").orderBy(
            F.desc("qsim"), F.asc("vec_id"))
        top_r = (cand.withColumn(
            "qsim", int8_qsim(F.col("q"), F.col("qq"),
                              F.col("sq"), F.col("qsq")))
            .dropDuplicates(["query_id", "vec_id"])
            .withColumn("_rq", F.row_number().over(w_r))
            .where(F.col("_rq") <= r)
            .select("query_id", "vec_id", "qvec", "qnrm"))
        # exact rerank: the <= Q*r candidate frame broadcasts into the
        # float lists (same pruned partitions, embedding column read
        # only here)
        lists = (self.lists().where(F.col("cent_id").isin(probed))
                 .select("vec_id", "embedding", "nrm"))
        sim = _dot(F.col("embedding"), F.col("qvec")) / (
            F.col("nrm") * F.col("qnrm"))
        w = Window.partitionBy("query_id").orderBy(
            F.desc("sim"), F.asc("neighbor_id"))
        return (
            lists.join(F.broadcast(top_r), on="vec_id")
            .select("query_id", F.col("vec_id").alias("neighbor_id"),
                    F.round(sim, 6).alias("sim"))
            .withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= int(k))
        )

    def search_pq(self, queries: DataFrame, k: int = 5,
                  nprobe: int = 4, rerank_r: int | None = None,
                  exclude_self: bool = True) -> DataFrame:
        """Top-k via the PQ sidecar (full IVF-PQ serving): candidate
        affinity inside the probed lists is the ADC approximation —
        each query precomputes an m·ksub lookup table against the
        frozen codebook (``similarity.pq_lut_col``, map-side), and a
        candidate costs m one-byte code lookups over ``pq.parquet``
        (~13x less scan IO than the float lists at the default 32x16
        geometry — the sweep note at ``similarity.PQ_M`` — vs int8's
        4x). The top ``rerank_r`` per query
        (default ``4*k``) join back to the float lists — broadcast
        candidate set, same partition pruning — for the exact cosine
        rerank with :meth:`search`'s tie rules.

        With ``rerank_r >=`` the probed candidate count the ADC stage
        prunes nothing and the result equals :meth:`search` exactly
        (contract-tested); finite ``rerank_r`` trades recall for IO —
        the ``--ivf-recall`` leg tables PQ rows next to int8's."""
        from cloud_volume_spark.operators.similarity import (
            _as_double, _dot, _with_norm, pq_adc_col, pq_lut_col,
            rank_centroids,
        )

        if not self.pq:
            raise ValueError(
                "search_pq needs a PQ index — rebuild with "
                "build_ivf_index(..., pq=True)")
        r = int(rerank_r) if rerank_r is not None else 4 * int(k)
        if r < int(k):
            raise ValueError(
                f"rerank_r ({r}) must be >= k ({k}) — fewer reranked "
                "candidates than results requested")
        cb = self._pq_cb()
        m, ksub = len(cb), len(cb[0])
        q = _with_norm(queries.select(
            "query_id", _as_double("qvec").alias("qvec")), "qvec", "qnrm")
        q = q.withColumn("lut", pq_lut_col("qvec", cb))
        probe = (
            rank_centroids(q, self.centroids(), "query_id", "qvec",
                           "qnrm")
            .where(F.col("crnk") <= int(nprobe))
            .select("query_id", "qvec", "qnrm", "lut", "cent_id")
        )
        probed = [row["cent_id"] for row in
                  probe.select("cent_id").distinct().collect()]
        codes = self.pq_codes().where(F.col("cent_id").isin(probed))
        cand = codes.join(F.broadcast(probe), on="cent_id")
        if exclude_self:
            cand = cand.where(F.col("vec_id") != F.col("query_id"))
        psim = F.round(
            pq_adc_col("pq", "lut", m, ksub)
            / (F.col("nrm") * F.col("qnrm")), 6)
        w_r = Window.partitionBy("query_id").orderBy(
            F.desc("psim"), F.asc("vec_id"))
        top_r = (cand.withColumn("psim", psim)
                 .dropDuplicates(["query_id", "vec_id"])
                 .withColumn("_rq", F.row_number().over(w_r))
                 .where(F.col("_rq") <= r)
                 .select("query_id", "vec_id", "qvec", "qnrm"))
        # exact rerank: the <= Q*r candidate frame broadcasts into the
        # float lists (same pruned partitions; the embedding column is
        # read only here)
        lists = (self.lists().where(F.col("cent_id").isin(probed))
                 .select("vec_id", "embedding", "nrm"))
        sim = _dot(F.col("embedding"), F.col("qvec")) / (
            F.col("nrm") * F.col("qnrm"))
        w = Window.partitionBy("query_id").orderBy(
            F.desc("sim"), F.asc("neighbor_id"))
        return (
            lists.join(F.broadcast(top_r), on="vec_id")
            .select("query_id", F.col("vec_id").alias("neighbor_id"),
                    F.round(sim, 6).alias("sim"))
            .withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= int(k))
        )


def brute_force_topk(emb: DataFrame, queries: DataFrame, k: int = 10,
                     exclude_self: bool = True) -> DataFrame:
    """Exact cosine top-k by full scan — the recall ground truth for
    :meth:`IVFIndex.search`, with IDENTICAL tie rules (sim rounded to
    6 dp, then neighbor_id ascending), so at ``nprobe == nlist`` the
    approximate and exact rank sets are equal by construction.
    ``emb``: (vec_id, embedding); ``queries``: (query_id, qvec).
    O(N·Q) with the query side broadcast — the measurement tool, not
    the serving path.

    Both inputs run the SAME batch validator as build/add (round-12
    advice): a zero-norm or NaN-component vector would yield NaN sim,
    which sorts ABOVE every real double under DESC and silently
    corrupts the recall ground truth — a bad measurement corpus must
    fail loudly instead of skewing recall numbers."""
    from cloud_volume_spark.operators.similarity import (
        _as_double, _dot, _with_norm,
    )

    e = _with_norm(emb.select(
        "vec_id", _as_double("embedding").alias("embedding")))
    _, corpus_dim = _validate_embedding_frame(
        e, context="brute_force_topk(corpus)")
    q = _with_norm(queries.select(
        "query_id", _as_double("qvec").alias("qvec")), "qvec", "qnrm")
    # cross-check the query dim against the CORPUS dim: an internally
    # consistent query set of a different dimension would zip_with-pad
    # NULL sims and silently corrupt the recall ground truth — the
    # exact failure mode the per-frame validation fails loudly on
    _validate_embedding_frame(
        q.select(F.col("query_id").alias("vec_id"),
                 F.col("qvec").alias("embedding"),
                 F.col("qnrm").alias("nrm")),
        dim=corpus_dim, context="brute_force_topk(queries)")
    pairs = e.crossJoin(F.broadcast(q))
    if exclude_self:
        pairs = pairs.where(F.col("vec_id") != F.col("query_id"))
    sim = _dot(F.col("embedding"), F.col("qvec")) / (
        F.col("nrm") * F.col("qnrm"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id"))
    return (
        pairs.select("query_id", F.col("vec_id").alias("neighbor_id"),
                     F.round(sim, 6).alias("sim"))
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= int(k))
    )


def recall_at_k(approx: DataFrame, truth: DataFrame) -> float:
    """Fraction of exact top-k (query_id, neighbor_id) pairs the
    approximate result recovered — recall@k averaged over queries
    (both frames hold k rows per query, so the pair-level ratio IS
    the per-query mean). 1.0 when truth is empty."""
    keys = ["query_id", "neighbor_id"]
    hit = approx.select(*keys).join(truth.select(*keys), keys).count()
    tot = truth.count()
    return hit / tot if tot else 1.0
