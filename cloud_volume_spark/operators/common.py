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
