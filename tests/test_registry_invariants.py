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


def test_bench_roster_is_registry_minus_documented_exclusion():
    from bench import BENCH_QUERIES
    from cloud_volume_spark.operators import all_queries

    roster, registry = set(BENCH_QUERIES), set(all_queries())
    assert len(BENCH_QUERIES) == len(roster), "duplicate bench rows"
    assert roster - registry == set(), "benching unregistered queries"
    # the one allowed exclusion: the df-capped quadratic verifier
    assert registry - roster == {"ngram_jaccard_pairs"}


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
