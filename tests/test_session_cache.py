"""session_cached eviction hygiene (r13 advice): standing ON-DISK
indexes built into tempfile.mkdtemp must not leak their directories —
every eviction path (LRU overflow, stale-app purge, clear_*_cache,
atexit) removes the evicted index's files."""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cloud_volume_spark.operators.common import (
    drain_cache, evict_index_dir, session_cached,
)


class _FakeIdx:
    def __init__(self, path):
        self.path = path


class _FakeSC:
    applicationId = "app-1"


class _FakeSpark:
    sparkContext = _FakeSC()


def _mk_idx():
    return _FakeIdx(tempfile.mkdtemp(prefix="cvs_test_idx_"))


def test_lru_overflow_eviction_removes_directory():
    cache = {}
    spark = _FakeSpark()
    kept = []
    for i in range(3):
        kept.append(session_cached(
            cache, spark, ("fp", i), _mk_idx, 2, evict=evict_index_dir))
    # max_entries=2: the first build was evicted and its dir removed
    assert not os.path.exists(kept[0].path)
    assert os.path.exists(kept[1].path) and os.path.exists(kept[2].path)
    drain_cache(cache, evict_index_dir)
    assert not os.path.exists(kept[1].path)
    assert not os.path.exists(kept[2].path)


def test_stale_app_purge_removes_directory():
    cache = {}
    a = session_cached(cache, _FakeSpark(), ("fp", 0), _mk_idx, 4,
                       evict=evict_index_dir)

    class _SC2:
        applicationId = "app-2"

    class _Spark2:
        sparkContext = _SC2()

    b = session_cached(cache, _Spark2(), ("fp", 0), _mk_idx, 4,
                       evict=evict_index_dir)
    assert not os.path.exists(a.path), "stale app's index dir leaked"
    assert os.path.exists(b.path)
    drain_cache(cache, evict_index_dir)
    assert not os.path.exists(b.path)


def test_evict_refuses_paths_outside_tempdir(tmp_path):
    """The rmtree guard: only system-tempdir artifacts are removed —
    a cache value pointing anywhere else (user data, a real table
    path) is left alone."""
    outside = str(tmp_path / "precious")
    os.makedirs(outside)
    if os.path.realpath(outside).startswith(
            os.path.realpath(tempfile.gettempdir()) + os.sep):
        # pytest tmp_path lives under the system tempdir on this host,
        # so fabricate a guaranteed-outside path instead (never created
        # — the guard must refuse by PATH, not by existence)
        outside = "/root/repo/.git"
    evict_index_dir(_FakeIdx(outside))
    assert os.path.exists(outside)


def test_clear_cache_functions_are_atexit_safe():
    """clear_ivf_index_cache / clear_lsh_index_cache run on empty
    caches without error (they are atexit-registered)."""
    from cloud_volume_spark.operators.dedup import clear_lsh_index_cache
    from cloud_volume_spark.operators.similarity import (
        clear_ivf_index_cache,
    )
    clear_ivf_index_cache()
    clear_lsh_index_cache()
