"""Relational + training-data-pipeline operators.

Each module exposes ``QUERIES: {name: fn(spark, sf_dir) -> DataFrame}``
and ``ORACLE_SQL: {name: str}`` (DuckDB-runnable ANSI SQL computing the
same result with the same column names). ``__spark_entry__.py``
aggregates them for the driver's correctness gate.
"""

from cloud_volume_spark.operators import (  # noqa: F401
    corpus, curation, dedup, relational, similarity, text, voxel_rel,
)
from cloud_volume_spark import multimodal

# Registration order matters: the correctness driver validates the first 50
# registered queries, so the least-locally-verifiable families (multimodal,
# corpus, curation — the round-5 additions) go first.  The queries that fall
# outside the window rotate per round; everything is additionally covered by
# tests/test_oracle_parity.py, which runs ALL queries against DuckDB.
# ROUND-6 ROTATION: move `relational` toward the front — its 16 tail
# entries (q6, rollup, events_*, q7/q14, the subquery family) sat outside
# the round-5 window and should regain driver rows next round.
ALL_MODULES = [
    multimodal, corpus, curation, similarity, dedup, text, voxel_rel,
    relational,
]


def all_queries():
    out = {}
    for m in ALL_MODULES:
        out.update(m.QUERIES)
    return out


def all_oracle_sql():
    out = {}
    for m in ALL_MODULES:
        out.update(m.ORACLE_SQL)
    return out
