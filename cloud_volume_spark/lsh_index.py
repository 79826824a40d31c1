"""Persistent MinHash-LSH band index: build once, ingest daily, never
re-signature the corpus.

The registered ``dedup_incremental`` query (``operators/dedup.py:549``)
re-derives the corpus band table from parquet on every run — right for
the oracle gate, wrong for serving: at 100 TB a daily ingest would pay
a full corpus re-signature per batch. This module is the production
lifecycle around the SAME primitives (``dedup.signature_frame_maponly``
+ ``dedup.band_frame`` are the single signature/banding contract shared
with the batch query AND the streaming twin), mirroring the IVF index's
proven shape (``ann_index.py:128``):

- :func:`build_lsh_index` — signature + band every document ONCE and
  persist the band table as parquet PARTITIONED BY ``(band, bucket)``
  (bucket = crc32 of the band hash mod ``n_buckets``), plus a JSON
  meta sidecar recording the signature parameters, so an index built
  under different shingle/band constants refuses loudly at open().
- :class:`LSHIndex.lookup` — an ingest batch computes its own bands
  map-side (the streaming-safe per-row form), its distinct
  ``(band, bucket)`` set is pushed into the corpus scan as LITERAL
  partition filters (PartitionFilters in the plan, so only the touched
  band buckets are read from disk), and the batch side broadcasts into
  the candidate equi-join — the corpus is never shuffled, never
  re-signatured. Output row-for-row identical to ``dedup_incremental``.
- :meth:`LSHIndex.add` / :meth:`LSHIndex.remove` /
  :meth:`LSHIndex.compact_bands` — the incremental lifecycle: a corpus
  delta appends its bands into their partitions (one signature job
  over the DELTA only); removals rewrite ONLY the partitions holding
  the victim docs (dynamic partition overwrite); compaction heals the
  small-files tax of a daily add loop. All mutations take the
  exclusive ``.lsh-lock`` (the volume layer's ``_commit_lock``
  pattern).

Reference parity: the reference library has no text-dedup surface;
this extends the training-data-pipeline layer the same way
``ann_index`` extends the embedding layer.
"""

from __future__ import annotations

import json
from contextlib import contextmanager
from functools import reduce

from pyspark.sql import DataFrame, SparkSession, functions as F

from cloud_volume_spark.fs import PathOps

_META_VERSION = 1

# fixed read schema (the IVF lesson, ann_index.py:55): an index whose
# every band was remove()d must stay readable, and the partition
# columns must not flip types under inference
_BANDS_SCHEMA = "doc_id bigint, band_hash string, band int, bucket int"

DEFAULT_N_BUCKETS = 16


def _band_bucket(n_buckets: int) -> F.Column:
    """Stable hash-bucket of a band hash — crc32 is deterministic
    across sessions/JVMs (unlike ``F.hash``, whose seed is fine but
    whose value is version-contractual), so an index written by one
    session prunes correctly in every later one."""
    return F.pmod(F.crc32(F.col("band_hash")), F.lit(n_buckets)).cast("int")


def _doc_bands(docs: DataFrame, n_buckets: int) -> DataFrame:
    """(doc_id, band_hash, band, bucket) for a document frame — the
    shared signature+band contract (``dedup.signature_frame_maponly``
    → ``dedup.band_frame``), map-only per row, plus the partition
    bucket."""
    from cloud_volume_spark.operators.dedup import (
        band_frame, signature_frame_maponly,
    )

    bands = band_frame(signature_frame_maponly(docs))
    return bands.select(
        "doc_id", "band_hash", F.col("band").cast("int").alias("band")
    ).withColumn("bucket", _band_bucket(n_buckets))


def _validate_doc_frame(docs: DataFrame, context: str,
                        allow_empty: bool = False) -> int:
    """ONE aggregate job enforcing the batch contract shared by build
    and add: non-empty, no NULL doc_id/text, no duplicate doc_ids (a
    duplicate would double its band rows and skew every candidate
    count). Returns the row count."""
    s = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("doc_id").alias("n_ids"),
        F.sum(F.col("doc_id").isNull().cast("long")).alias("n_null_id"),
        F.sum(F.col("text").isNull().cast("long")).alias("n_null_text"),
    ).first()
    n = int(s["n"])
    if n == 0:
        if allow_empty:
            return 0
        raise ValueError(f"{context}: empty document frame")
    if int(s["n_null_id"] or 0) > 0:
        raise ValueError(f"{context}: NULL doc_id in the batch")
    if int(s["n_null_text"] or 0) > 0:
        raise ValueError(
            f"{context}: {s['n_null_text']} of {n} rows have NULL text "
            "— a NULL signature would band nowhere and silently skip "
            "dedup; drop or default them first")
    if int(s["n_ids"]) != n:
        raise ValueError(
            f"{context}: {n - int(s['n_ids'])} duplicate doc_ids in "
            "the batch — deduplicate first")
    return n


def _signature_params() -> dict:
    """The module constants the signatures are a function of — stamped
    into the meta so an index built under different parameters refuses
    at open() instead of silently mixing incompatible band spaces."""
    from cloud_volume_spark.operators import dedup as D

    return {"shingle_w": D.SHINGLE_W, "shingle_step": D.SHINGLE_STEP,
            "n_hashes": D.N_HASHES}


def build_lsh_index(docs: DataFrame, out_path: str,
                    n_buckets: int = DEFAULT_N_BUCKETS) -> "LSHIndex":
    """Build and persist an LSH band index over ``docs`` (doc_id long,
    text string). One validation job + one map-only signature job +
    one partitioned write. Returns the opened index."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    spark = docs.sparkSession
    fs = PathOps(out_path, spark)
    d = docs.select("doc_id", "text")
    n_docs = _validate_doc_frame(d, "build_lsh_index")
    bands = _doc_bands(d, n_buckets)
    (bands.repartition("band", "bucket")
     .write.mode("overwrite").partitionBy("band", "bucket")
     .parquet(f"{out_path}/bands.parquet"))
    meta = {"version": _META_VERSION, "count": n_docs,
            "n_buckets": int(n_buckets), **_signature_params()}
    fs.write_bytes(f"{out_path}/lsh_meta.json",
                   json.dumps(meta, sort_keys=True).encode())
    return LSHIndex.open(spark, out_path)


class LSHIndex:
    """Handle over a persisted LSH band-index directory."""

    def __init__(self, spark: SparkSession, path: str, meta: dict):
        self.spark = spark
        self.path = path
        self.meta = meta

    @classmethod
    def open(cls, spark: SparkSession, path: str) -> "LSHIndex":
        fs = PathOps(path, spark)
        meta_path = f"{path}/lsh_meta.json"
        if not fs.exists(meta_path):
            raise FileNotFoundError(
                f"not an LSH index (no lsh_meta.json): {path}")
        meta = json.loads(fs.read_bytes(meta_path).decode())
        if meta.get("version") != _META_VERSION:
            raise ValueError(
                f"lsh_meta version {meta.get('version')} unsupported "
                f"(expected {_META_VERSION}); rebuild the index")
        current = _signature_params()
        stale = {k: (meta.get(k), v) for k, v in current.items()
                 if meta.get(k) != v}
        if stale:
            raise ValueError(
                f"LSH index at {path} was built under different "
                f"signature parameters {stale} (stored, current) — its "
                "band space is incompatible; rebuild the index")
        return cls(spark, path, meta)

    def bands(self) -> DataFrame:
        return (self.spark.read.schema(_BANDS_SCHEMA)
                .parquet(f"{self.path}/bands.parquet"))

    def indexed_ids(self) -> DataFrame:
        """Distinct doc_ids — column-pruned scan, band hashes stay on
        disk."""
        return self.bands().select("doc_id").distinct()

    def bucket_stats(self) -> DataFrame:
        """Per-(band, bucket) row counts — the balance observable (a
        hot bucket is the LSH skew failure mode). Ids-only scan."""
        return (self.bands().groupBy("band", "bucket")
                .agg(F.count(F.lit(1)).alias("n_rows"),
                     F.countDistinct("band_hash").alias("n_hashes"))
                .orderBy("band", "bucket"))

    # ---- mutation ----------------------------------------------------

    @property
    def _lock_path(self) -> str:
        return f"{self.path}/.lsh-lock"

    @contextmanager
    def _mutation_lock(self, break_lock: bool = False):
        fs = PathOps(self.path, self.spark)
        if break_lock:
            # crash recovery: the dead writer's lock file would
            # otherwise make the heal itself refuse (heal methods
            # take this lock too) — only pass this after confirming
            # the writer is dead
            fs.remove(self._lock_path)
        if not fs.create_exclusive(self._lock_path):
            raise RuntimeError(
                f"another writer holds the index lock "
                f"{self._lock_path!r}; retry after its mutation "
                "finishes, or — if the writer crashed — run "
                "refresh_count(break_lock=True)")
        try:
            yield fs
        finally:
            fs.remove(self._lock_path)

    def _write_meta(self, fs: PathOps) -> None:
        fs.write_bytes(f"{self.path}/lsh_meta.json",
                       json.dumps(self.meta, sort_keys=True).encode())

    def refresh_count(self, break_lock: bool = False) -> int:
        """Recount distinct indexed docs and persist — the self-heal
        for a crash between a band append/rewrite and its meta write
        (``add``/``remove`` track the count incrementally: O(delta),
        not O(index)). A crashed mutation leaves its ``.lsh-lock``
        file behind, which would make this heal refuse too — pass
        ``break_lock=True`` (after confirming the writer is dead) to
        steal the dead writer's lock."""
        with self._mutation_lock(break_lock=break_lock) as fs:
            self.meta = {**self.meta,
                         "count": self.indexed_ids().count()}
            self._write_meta(fs)
        return int(self.meta["count"])

    def add(self, docs: DataFrame) -> int:
        """Incrementally index new documents: ONE signature job over
        the DELTA only, bands parquet-append into their (band, bucket)
        partitions. Duplicate doc_ids are refused loudly (a changed
        doc is :meth:`remove` then ``add``). Returns the number added.
        Atomicity matches :meth:`IVFIndex.add
        <cloud_volume_spark.ann_index.IVFIndex.add>`: the append
        publishes at job commit; a crash before the meta write leaves
        only the count stale (:meth:`refresh_count` heals it)."""
        d = docs.select("doc_id", "text")
        with self._mutation_lock() as fs:
            n_new = _validate_doc_frame(d, "add()", allow_empty=True)
            if n_new == 0:
                return 0
            # delta side broadcast, no distinct over the index: a
            # duplicate needs only ONE matching band row to refuse,
            # and a .distinct() here would shuffle-aggregate the
            # whole band table per ingest (the IVFIndex.add shape)
            clash = (self.bands().select("doc_id")
                     .join(F.broadcast(d.select("doc_id")), "doc_id")
                     .limit(1).collect())
            if clash:
                raise ValueError(
                    f"add(): doc_id {clash[0]['doc_id']} is already "
                    "indexed — a changed doc is remove() then add()")
            bands = _doc_bands(d, int(self.meta["n_buckets"]))
            (bands.repartition("band", "bucket")
             .write.mode("append").partitionBy("band", "bucket")
             .parquet(f"{self.path}/bands.parquet"))
            self.meta = {**self.meta,
                         "count": int(self.meta["count"]) + n_new}
            self._write_meta(fs)
        return n_new

    def remove(self, doc_ids, missing_ok: bool = False) -> int:
        """Delete documents by id, rewriting ONLY the (band, bucket)
        partitions that contain their band rows (dynamic partition
        overwrite — untouched buckets keep their files). ``doc_ids``:
        an iterable of ints or a single-column DataFrame named
        ``doc_id``. Ids not in the index refuse loudly unless
        ``missing_ok=True``. Returns the number of DOCUMENTS removed."""
        spark = self.spark
        if isinstance(doc_ids, DataFrame):
            rows = (doc_ids.select(F.col("doc_id").cast("long"))
                    .distinct().collect())
            if any(r["doc_id"] is None for r in rows):
                raise ValueError("remove(): NULL doc_id in the id frame")
            pinned = sorted(int(r["doc_id"]) for r in rows)
        else:
            pinned = sorted({int(v) for v in doc_ids})
        if not pinned:
            return 0
        ids = spark.createDataFrame([(v,) for v in pinned],
                                    "doc_id long")
        with self._mutation_lock() as fs:
            bands = self.bands()
            hits = (bands.join(F.broadcast(ids), "doc_id")
                    .groupBy("band", "bucket")
                    .agg(F.count(F.lit(1)).alias("_rows"),
                         F.collect_set("doc_id").alias("_docs"))
                    .collect())
            hit_docs = sorted({int(d) for r in hits for d in r["_docs"]})
            if len(hit_docs) != len(pinned) and not missing_ok:
                missing = sorted(set(pinned) - set(hit_docs))[:1]
                raise ValueError(
                    f"remove(): doc_id {missing[0]} is not indexed — "
                    "pass missing_ok=True if this is a torn-append "
                    "recovery")
            if not hits:
                return 0
            affected = [(int(r["band"]), int(r["bucket"])) for r in hits]
            part_pred = reduce(
                lambda a, b: a | b,
                [(F.col("band") == b) & (F.col("bucket") == k)
                 for b, k in affected])
            before = {(int(r["band"]), int(r["bucket"])): int(r["n"])
                      for r in bands.where(part_pred)
                      .groupBy("band", "bucket")
                      .agg(F.count(F.lit(1)).alias("n")).collect()}
            survivors = (
                bands.where(part_pred)
                .join(F.broadcast(ids), "doc_id", "left_anti")
                .select("doc_id", "band_hash", "band", "bucket")
                # materialize BEFORE overwriting the path being read
                .localCheckpoint(eager=True))
            (survivors.repartition("band", "bucket")
             .write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("band", "bucket")
             .parquet(f"{self.path}/bands.parquet"))
            emptied = [key for r in hits
                       for key in [(int(r["band"]), int(r["bucket"]))]
                       if before[key] == int(r["_rows"])]
            for b, k in emptied:
                fs.rmtree(
                    f"{self.path}/bands.parquet/band={b}/bucket={k}")
            self.meta = {**self.meta,
                         "count": int(self.meta["count"])
                         - len(hit_docs)}
            self._write_meta(fs)
        return len(hit_docs)

    def compact_bands(self, max_files_per_part: int = 8) -> int:
        """Rewrite (band, bucket) partitions holding more than
        ``max_files_per_part`` parquet files — the small-files tax of
        a daily :meth:`add` loop. Only offending partitions rewrite
        (dynamic overwrite, one file per partition); content and count
        are unchanged. Returns the number of partitions rewritten."""
        with self._mutation_lock() as fs:
            base = f"{self.path}/bands.parquet"
            crowded = []
            for d1 in fs.listdir(base):
                if not d1.startswith("band="):
                    continue
                b = int(d1.split("=", 1)[1])
                for d2 in fs.listdir(f"{base}/{d1}"):
                    if not d2.startswith("bucket="):
                        continue
                    k = int(d2.split("=", 1)[1])
                    n_files = sum(
                        1 for f in fs.listdir(f"{base}/{d1}/{d2}")
                        if f.endswith(".parquet"))
                    if n_files > max_files_per_part:
                        crowded.append((b, k))
            if not crowded:
                return 0
            pred = reduce(
                lambda a, b: a | b,
                [(F.col("band") == bb) & (F.col("bucket") == kk)
                 for bb, kk in crowded])
            survivors = (self.bands().where(pred)
                         .select("doc_id", "band_hash", "band", "bucket")
                         .localCheckpoint(eager=True))
            (survivors.repartition("band", "bucket")
             .write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("band", "bucket")
             .parquet(base))
        return len(crowded)

    # ---- query -------------------------------------------------------

    def self_pairs(self) -> DataFrame:
        """Candidate near-duplicate pairs ACROSS the indexed corpus —
        the weekly full-dedup sweep, off the persisted bands with no
        re-signature: a self-join on (band, bucket, band_hash) with
        ``doc_a < doc_b``, distinct. Row-for-row the
        ``minhash_lsh_pairs`` contract over the indexed documents
        (bucket is a function of band_hash, so including it in the
        key changes nothing but keeps the join aligned with the
        partition layout — co-partitioned scan, no pre-shuffle).

        Scale: the join shuffles on the band key only (bounded
        buckets, never an all-pairs product); at 100 TB this is the
        recurring sweep whose signature cost the index already paid
        once at build."""
        bands = self.bands()
        a = bands.alias("a")
        b = bands.alias("b")
        return (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.band_hash") == F.col("b.band_hash"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
            .distinct()
        )

    def lookup(self, docs: DataFrame) -> DataFrame:
        """Near-duplicate lookup for an ingest batch against the
        standing corpus — row-for-row the ``dedup_incremental``
        contract: per batch doc, the canonical existing duplicate
        (``dup_of`` = min indexed doc_id sharing a band, -1 if none),
        the candidate count, and the keep verdict.

        Shape: the batch bands are computed map-side (one flyweight
        job collects their distinct (band, bucket) set, bounded by
        n_bands × n_buckets values) and pushed into the corpus scan as
        LITERAL partition filters — only the touched band buckets are
        read; the batch side broadcasts into the candidate equi-join,
        so the corpus is never shuffled and never re-signatured."""
        d = docs.select("doc_id", "text")
        # materialize the batch bands ONCE (r14): the per-row
        # transform-md5 signature fold is the lookup's dominant
        # compute, and it used to run twice — once under the touched-
        # buckets collect and again to build the broadcast side of the
        # candidate join. The eager localCheckpoint pins the flyweight
        # (batch-sized) band table; both consumers read it.
        new_b = _doc_bands(d, int(self.meta["n_buckets"])).select(
            F.col("doc_id").alias("new_id"), "band", "band_hash",
            "bucket").localCheckpoint(eager=True)
        touched = [(int(r["band"]), int(r["bucket"]))
                   for r in new_b.select("band", "bucket")
                   .distinct().collect()]
        if touched:
            pred = reduce(
                lambda a, b: a | b,
                [(F.col("band") == bb) & (F.col("bucket") == kk)
                 for bb, kk in touched])
            corpus = self.bands().where(pred)
            matches = (
                corpus.join(F.broadcast(new_b),
                            ["band", "bucket", "band_hash"])
                .where(F.col("doc_id") != F.col("new_id"))
                .groupBy("new_id")
                .agg(F.min("doc_id").alias("dup_of"),
                     F.countDistinct("doc_id")
                     .alias("n_dup_candidates")))
        else:
            matches = self.spark.createDataFrame(
                [], "new_id long, dup_of long, n_dup_candidates long")
        return (
            d.select("doc_id")
            .join(matches.withColumnRenamed("new_id", "doc_id"),
                  "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("dup_of", F.lit(-1)).cast("bigint")
                .alias("dup_of"),
                F.coalesce("n_dup_candidates", F.lit(0)).cast("bigint")
                .alias("n_dup_candidates"),
                (F.coalesce("n_dup_candidates", F.lit(0)) == 0)
                .cast("int").alias("is_kept")))
