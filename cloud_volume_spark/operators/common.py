"""Shared helpers for operator modules."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import LongType


def dataset_fingerprint(sf_dir: str, table: str) -> tuple:
    """Identity of one test table including content version, so a
    rewrite of the parquet under the same path invalidates any cache
    keyed on it."""
    path = os.path.join(sf_dir, f"{table}.parquet")
    try:
        st = os.stat(path)
        return (path, st.st_mtime_ns, st.st_size)
    except OSError:
        return (path, 0, 0)


def session_cached(cache: dict, spark: SparkSession, fingerprint,
                   build, max_entries: int, evict=None):
    """THE (session, dataset)-keyed LRU for expensive standing
    artifacts — one implementation shared by the materialized cluster
    map, the standing LSH band index, and the standing IVF index, so
    an eviction-logic fix cannot silently apply to one cache only.
    Semantics: LRU recency bump on hit; entries from other (stopped)
    applications evicted eagerly; oldest evicted past ``max_entries``;
    ``evict(value)`` (if given) runs on every eviction and must not
    raise usefully-catchable errors (wrap it)."""
    app_id = spark.sparkContext.applicationId
    key = (app_id, fingerprint)
    v = cache.get(key)
    if v is not None:
        # LRU, not FIFO: refresh recency so the hottest entry is
        # never the eviction victim (dict preserves insertion order)
        cache[key] = cache.pop(key)
        return v
    for k in [k for k in cache if k[0] != app_id]:
        old = cache.pop(k)
        if evict is not None:
            evict(old)
    while len(cache) >= max_entries:
        old = cache.pop(next(iter(cache)))
        if evict is not None:
            evict(old)
    v = build()
    cache[key] = v
    return v


def evict_index_dir(idx) -> None:
    """Evict callback for ``session_cached`` standing ON-DISK indexes
    (IVF / LSH): remove the evicted index's directory. Without this,
    every (session, dataset-version) combination leaks a complete
    index copy in /tmp, which is not reaped between reboots on typical
    Linux hosts. The dirs are session-derived mkdtemp artifacts; as a
    guard, only paths inside the system tempdir are removed."""
    import shutil
    import tempfile

    path = getattr(idx, "path", None)
    if path and os.path.realpath(path).startswith(
            os.path.realpath(tempfile.gettempdir()) + os.sep):
        shutil.rmtree(path, ignore_errors=True)


def drain_cache(cache: dict, evict=None) -> None:
    """Pop every cache entry, running ``evict`` on each — the
    clear-everything counterpart of session_cached's per-entry
    eviction, shared so clear_*_cache and the atexit hooks cannot
    diverge from the LRU's own cleanup."""
    while cache:
        v = cache.pop(next(iter(cache)))
        if evict is not None:
            evict(v)


def _est_input_splits(spark: SparkSession, path: str) -> int:
    """Estimate how many scan partitions Spark will plan for ``path``
    from file sizes alone (``size / maxPartitionBytes`` per file, the
    planner's own split arithmetic, ignoring openCost — an optimistic
    upper bound: single-row-group files cannot actually split at all,
    so the true parallelism is never higher than this estimate)."""
    max_pb = int(spark.conf.get(
        "spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024)))
    total = 0
    try:
        if os.path.isdir(path):
            for root, _, files in os.walk(path):
                total += sum(
                    os.path.getsize(os.path.join(root, f)) for f in files)
        else:
            total = os.path.getsize(path)
    except OSError:
        return 1
    return max(1, -(-total // max_pb))


def load_spread(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """``load`` + an explicit round-robin repartition to the cluster's
    core parallelism WHEN the input layout plans fewer splits than
    cores — guide §2.5's "one huge unsplittable file → repartition
    immediately after the read". The test tables are single-file,
    single-row-group parquet, so every scan otherwise runs as ONE task
    and all map-side heavy work (md5 shingling, token explodes,
    Arrow-batched decodes, wide interpreted folds) serializes on one
    core of N.

    Scale-correct by construction: the trigger is the *estimated split
    count vs defaultParallelism*, so a production table whose layout
    already feeds every core is returned untouched (no wasted corpus
    shuffle), and the target adapts to the cluster (defaultParallelism,
    not a constant). The explicit numPartitions keeps AQE from
    coalescing the spread back to one task; Spark's default
    sort-before-repartition keeps the row→partition assignment
    deterministic under task retry. Use this for operators whose
    per-row compute dominates; pure map-side filters (mixture_sample)
    and plan-gated map-only paths keep plain ``load``."""
    df = load(spark, sf_dir, table)
    p = spark.sparkContext.defaultParallelism
    path = os.path.join(sf_dir, f"{table}.parquet")
    if _est_input_splits(spark, path) < p:
        df = df.repartition(p)
    return df


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    if table == "events":
        # events.parquet stores TIMESTAMP(NANOS), which Spark's vectorized
        # reader rejects unless this legacy flag is on.  The flag is runtime
        # settable, so set it here rather than relying on the session builder —
        # harness-created sessions (driver, notebooks) won't have it.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    if table == "events":
        # events.ts is TIMESTAMP(NANOS); with
        # spark.sql.legacy.parquet.nanosAsLong it arrives as BIGINT ns.
        # Truncate (not round) to microseconds — matches how a ns
        # instant floors into coarser units.
        if isinstance(df.schema["ts"].dataType, LongType):
            # integer division, NOT (ts/1000).cast: the double round
            # trip can round UP across a microsecond boundary and loses
            # exactness above 2^53 ns — `div` floors exactly
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
    return df
