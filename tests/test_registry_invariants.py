"""Mechanical guards for the query-registry bookkeeping (CLAUDE.md
invariants): every registered query has an oracle, the bench roster is
exactly the registry minus the documented quadratic-verifier exclusion,
and the rotation window arithmetic in operators/__init__.py stays
self-consistent. Pure-python — no Spark session."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_every_query_has_an_oracle():
    from cloud_volume_spark.operators import all_oracle_sql, all_queries

    q, o = set(all_queries()), set(all_oracle_sql())
    assert q == o, (q - o, o - q)


def test_bench_roster_is_exactly_the_registry():
    """Since r13 (ngram_jaccard_pairs retired to the local-parity
    tier) the bench roster IS the registry — no documented
    exceptions."""
    from bench import BENCH_QUERIES
    from cloud_volume_spark.operators import all_queries

    roster, registry = set(BENCH_QUERIES), set(all_queries())
    assert len(BENCH_QUERIES) == len(roster), "duplicate bench rows"
    assert roster == registry, (registry - roster, roster - registry)


def test_correctness_window_has_no_duplicate_names():
    """Module QUERIES dicts must not shadow each other: a duplicate
    name would silently drop one implementation from the registry and
    shift the 50-query driver window."""
    from cloud_volume_spark.operators import ALL_MODULES

    seen = {}
    for m in ALL_MODULES:
        for name in m.QUERIES:
            assert name not in seen, (
                f"{name} registered by both {seen[name]} and {m.__name__}")
            seen[name] = m.__name__


def test_oracle_sql_strings_are_nonempty_selects():
    from cloud_volume_spark.operators import all_oracle_sql

    for name, sql in all_oracle_sql().items():
        s = sql.strip().upper()
        assert s.startswith(("SELECT", "WITH")), name


def test_driver_front_is_wellformed():
    """DRIVER_FRONT must reference real queries, contain no
    duplicates, and fit inside the 50-query driver window."""
    from cloud_volume_spark.operators import DRIVER_FRONT, all_queries

    registry = all_queries()
    assert len(DRIVER_FRONT) == len(set(DRIVER_FRONT)), "duplicate keys"
    assert len(DRIVER_FRONT) <= 50
    missing = [k for k in DRIVER_FRONT if k not in registry]
    assert not missing, missing
    # the front actually leads the registry, in order
    assert list(registry)[: len(DRIVER_FRONT)] == DRIVER_FRONT


def test_out_of_window_queries_are_green_in_recent_correctness():
    """The rotation contract: every query OUTSIDE the first-50 driver
    window must have a green row in the UNION of the two most recent
    CORRECTNESS_r*.json files, so the whole registry stays on fresh
    driver evidence. The union (round-12 advice) means committing a
    round's artifact and rotating DRIVER_FRONT need not be atomic —
    but a never-rotating builder still goes red one round later, once
    the two most recent files carry identical windows. Queries newer
    than both files must be IN the window (their first row is this
    round's)."""
    import glob
    import json

    from cloud_volume_spark.operators import all_queries

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")))
    assert files, "no committed correctness artifact"
    green = set()
    for f in files[-2:]:
        rows = json.load(open(f))
        green |= {k for k, v in rows.items()
                  if v.get("rows_match") and v.get("err") is None}
    window = set(list(all_queries())[:50])
    stale = [k for k in all_queries()
             if k not in window and k not in green]
    assert not stale, (
        f"out-of-window queries with no green row in the union of "
        f"{[os.path.basename(f) for f in files[-2:]]}: {stale}")


def test_retired_queries_stay_disjoint_and_oracled():
    """The retired tier (round 13): every retired query keeps an
    oracle (the local parity suite runs them), and no retired name
    shadows a registered one — a collision would silently serve the
    retired implementation under the registered key."""
    from cloud_volume_spark.operators import (
        all_queries, retired_oracle_sql, retired_queries,
    )

    rq, ro = set(retired_queries()), set(retired_oracle_sql())
    assert rq == ro, (rq - ro, ro - rq)
    assert rq.isdisjoint(set(all_queries())), rq & set(all_queries())
