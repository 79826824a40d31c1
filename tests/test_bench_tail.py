"""The bench final line must ALWAYS fit the driver's 2,000-char stdout
tail and keep the cross-round signal (load1 + BASELINE throughput keys)
— round 10's first pass silently recorded b:{cp} only. Pure-python
tests: no Spark session."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_QUERIES, TAIL_BUDGET, fit_tail_line
from scripts.bench_scale import ensure_scaled


# the r15 sixteen-key signal: l1 + the four BASELINE throughput rows +
# one steal verdict per bracketed leg family (vq/sq/iq/nq/pq) + the
# per-leg entry loads (vl/sl/il/nl/pl) + the query-phase quiet count
# (qq) — must mirror main()'s b_priority head and fit_tail_line's
# reserve
SIGNAL_KEYS = ("l1", "vw", "vr", "sw", "sr", "vq", "sq",
               "iq", "nq", "pq", "vl", "sl", "il", "nl", "pl", "qq")


def _b_priority(l1=7.5):
    return [
        ("l1", l1), ("vw", 62), ("vr", 135), ("sw", 143), ("sr", 864),
        ("vq", 4), ("sq", 4), ("iq", 2), ("nq", 2), ("pq", 2),
        ("vl", 1.4), ("sl", 2.2), ("il", 3.1), ("nl", 2.8), ("pl", 1.9),
        ("qq", 97), ("ql", 2.1),
        ("su", 0.38), ("ib", 14.8), ("im", 294), ("ae", 4.41),
        ("aq", 1.55), ("cp", 0.19),
    ]


def _times(n):
    """Synthetic seconds over the REAL roster names (cycled with a
    suffix past the roster size) so name-length statistics match what
    the ladder actually sees."""
    out = {}
    for i in range(n):
        base = BENCH_QUERIES[i % len(BENCH_QUERIES)]
        name = base if i < len(BENCH_QUERIES) else f"{base}_{i}"
        out[name] = round(0.11 + (i % 37) * 0.137, 3)
    return out


def test_small_roster_keeps_two_decimals_and_full_b():
    times = _times(40)
    line = fit_tail_line(times, 55.5, 0.1, _b_priority())
    assert len(line) <= TAIL_BUDGET
    d = json.loads(line)
    assert list(d["b"]) == [k for k, _ in _b_priority()]
    # 2-decimal rung: a value like 1.25 survives un-truncated
    assert any(abs(v * 100 - round(v * 100)) < 1e-9 and v * 10 % 1 != 0
               for v in d["queries"].values())


def test_large_roster_degrades_to_one_decimal_keeping_signal_keys():
    """At the CURRENT roster size every signal key must survive; if
    the roster has outgrown even the 1-decimal rung, only a handful of
    the FASTEST query rows may be shed for them (signal keys are the
    only cross-round comparands; slow queries are the informative
    rows)."""
    times = _times(len(BENCH_QUERIES))
    line = fit_tail_line(times, 80.0, 0.1, _b_priority())
    assert len(line) <= TAIL_BUDGET
    d = json.loads(line)
    for k in SIGNAL_KEYS:
        assert k in d["b"], f"signal key {k} lost"
    dropped = d.get("qdropped", 0)
    assert dropped + len(d["queries"]) == len(BENCH_QUERIES)
    # growth canary as a COVERAGE FLOOR (a fixed shed cap just breaks
    # on every roster addition): the tail must always carry at least
    # 70 named query rows — below that the ladder itself needs a new
    # rung, not the roster a trim. Shed names are documented in
    # BENCH_FULL.json (qdropped_names).
    assert len(d["queries"]) >= 70, "roster far outgrew the tail budget"
    # the slowest rows always survive a shed
    slowest = max(times, key=lambda k: times[k])
    assert slowest in d["queries"]


def test_huge_roster_sheds_fastest_queries_parseably():
    times = _times(140)
    times["slowest_query_of_all"] = 99.9
    line = fit_tail_line(times, 250.0, 0.1, _b_priority())
    assert len(line) <= TAIL_BUDGET
    d = json.loads(line)
    assert d["qdropped"] > 0
    assert d["qdropped"] + len(d["queries"]) == 141
    assert "slowest_query_of_all" in d["queries"]  # slow rows kept
    assert "l1" in d["b"]


def test_ensure_scaled_rebuilds_on_src_or_replica_change(tmp_path):
    calls = []

    def builder(spark, src, out, replicas):
        os.makedirs(out, exist_ok=True)
        calls.append((src, out, replicas))

    src1 = tmp_path / "src1"
    src1.mkdir()
    src2 = tmp_path / "src2"
    src2.mkdir()
    out = str(tmp_path / "scaled")

    ensure_scaled(None, str(src1), out, 10, builder, "t")
    assert len(calls) == 1
    # same (src, replicas): reused, no rebuild
    ensure_scaled(None, str(src1), out, 10, builder, "t")
    assert len(calls) == 1
    # different replicas: rebuild
    ensure_scaled(None, str(src1), out, 5, builder, "t")
    assert len(calls) == 2
    # different SOURCE dataset: rebuild (cross-dataset ratios are
    # meaningless — the round-10 review finding)
    ensure_scaled(None, str(src2), out, 5, builder, "t")
    assert len(calls) == 3
    assert calls[-1][0] == str(src2)


def test_wide_signal_value_falls_through_not_silently_shed():
    """A rung that fits seven b keys but not the seven SIGNAL keys must
    be rejected by name: with an extremely wide sr value the 2/1-dp
    rungs shed it, and only the terminal rung (which reserves the
    signal by name) may emit — sr must appear in the final line."""
    times = _times(len(BENCH_QUERIES))
    prio = _b_priority()
    prio[4] = ("sr", 86412345678901234)  # absurdly wide signal value
    line = fit_tail_line(times, 80.0, 0.1, prio)
    assert len(line) <= TAIL_BUDGET
    d = json.loads(line)
    for k in SIGNAL_KEYS:
        assert k in d["b"], f"signal key {k} lost"
    assert d["b"]["sr"] == 86412345678901234
