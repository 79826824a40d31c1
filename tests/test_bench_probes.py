"""The r14 steal-detector contract: the r13 driver artifact recorded
seg-read at 7.4x BASELINE while claiming quiet_passes=3 at load1 17.37
— the single-thread probe is blind to many-core contention. These
tests pin the fix: (1) a pass under 16-process synthetic contention is
steal_flagged by the 32-process probe even though the 1-thread probe
stays nominal; (2) a high leg-entry load1 forces not-quiet regardless
of probe times; (3) the settle-wait lets our own post-stage load decay
instead of false-flagging a quiet host. Pure-python: no Spark."""

import multiprocessing as mp
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _spin_forever(stop_ev):
    acc = 0
    while not stop_ev.is_set():
        for i in range(200_000):
            acc += i


QUIET_PROBE = {"st": 0.1, "mt": 0.1, "l1": 1.0}


def test_synthetic_contention_flags_the_leg(monkeypatch):
    """stress -c 16-class load => steal_flagged, driven by the mt
    probe alone (load1 is pinned low so the entry gate passes, exactly
    the r13 blind spot where load1 was the only tell the old detector
    ignored and the 1-thread probe saw nothing)."""
    monkeypatch.setattr(bench, "LOAD1_SETTLE_SEC", 0.0)
    monkeypatch.setattr(bench, "_load1", lambda: 1.0)
    ctx = mp.get_context("fork")
    stop = ctx.Event()
    loaders = [ctx.Process(target=_spin_forever, args=(stop,))
               for _ in range(16)]
    for p in loaders:
        p.start()
    try:
        out = bench._quiet_leg(lambda: {"t": 0.0}, "t",
                               base_passes=1, max_passes=2)
    finally:
        stop.set()
        for p in loaders:
            p.join()
    assert out["steal_flagged"] is True
    assert out["quiet_passes"] == 0
    # the blind spot itself: the single-thread probe still ran at
    # nominal speed under the load the mt probe caught
    st_times = [p["st"] for pair in out["probes_all"] for p in pair]
    mt_times = [p["mt"] for pair in out["probes_all"] for p in pair]
    assert min(st_times) <= bench.CPU_PROBE_QUIET_SEC
    assert min(mt_times) > bench.MT_PROBE_QUIET_SEC


def test_high_entry_load_flags_regardless_of_probe_times(monkeypatch):
    """The r13 counterexample: quiet probes, load1 17 => not quiet."""
    monkeypatch.setattr(bench, "LOAD1_SETTLE_SEC", 0.0)
    monkeypatch.setattr(bench, "_load1", lambda: 17.37)
    monkeypatch.setattr(bench, "_probe", lambda: dict(QUIET_PROBE))
    out = bench._quiet_leg(lambda: {"t": 0.0}, "t",
                           base_passes=1, max_passes=2)
    assert out["entry_load1"] == 17.37
    assert out["quiet_passes"] == 0
    assert out["steal_flagged"] is True


def test_quiet_host_passes_gate_and_records_probe_structure(monkeypatch):
    monkeypatch.setattr(bench, "LOAD1_SETTLE_SEC", 0.0)
    monkeypatch.setattr(bench, "_load1", lambda: 0.8)
    monkeypatch.setattr(bench, "_probe", lambda: dict(QUIET_PROBE))
    out = bench._quiet_leg(lambda: {"t": 0.5}, "t")
    assert out["steal_flagged"] is False
    assert out["quiet_passes"] >= 1
    assert out["entry_load1"] == 0.8
    for pre, post in out["probes_all"]:
        for p in (pre, post):
            assert set(p) == {"st", "mt", "l1"}


def test_settle_wait_outlasts_own_decay_but_not_sustained_steal(
        monkeypatch):
    """Our own just-finished stages' load1 decay must settle out (no
    false flag on a quiet host); a load that never drops exhausts the
    budget and returns the high value for the gate to flag."""
    seq = iter([12.0, 7.0, 2.0])
    sleeps = []
    monkeypatch.setattr(bench, "_load1", lambda: next(seq))
    monkeypatch.setattr(bench.time, "sleep", lambda s: sleeps.append(s))
    assert bench._settle_load(max_wait=60.0) == 2.0
    assert len(sleeps) == 2

    monkeypatch.setattr(bench, "_load1", lambda: 17.0)
    l1, ok = bench._leg_entry_gate()
    assert l1 == 17.0 and ok is False


def test_mt_probe_detects_what_single_thread_misses():
    """Live calibration sanity (no mocks): under a 16-process load the
    1-thread probe stays nominal while the 32-process probe breaches
    its gate — the measured blind spot the r14 detector closes."""
    ctx = mp.get_context("fork")
    stop = ctx.Event()
    loaders = [ctx.Process(target=_spin_forever, args=(stop,))
               for _ in range(16)]
    for p in loaders:
        p.start()
    try:
        st = bench._cpu_probe_sec()
        mt = bench._mt_probe_sec()
    finally:
        stop.set()
        for p in loaders:
            p.join()
    assert st <= bench.CPU_PROBE_QUIET_SEC, (
        "single-thread probe unexpectedly slowed — host already "
        f"contended ({st}); re-run quiet")
    assert mt > bench.MT_PROBE_QUIET_SEC
