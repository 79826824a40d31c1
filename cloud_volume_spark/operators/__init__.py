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
# registered queries; the order rotates per round so every query gets a
# driver row across consecutive rounds, with tests/test_oracle_parity.py
# running ALL queries against DuckDB as the local backstop.
# ROUND-6 ROTATION (executing the round-5 note): `relational` moves to the
# front — its 17 tail entries (q5/q6/q7/q14, top_customers_per_nation,
# rollup_revenue, events_*, the subquery family) sat outside the round-5
# window. `curation` stays in-window (token_bucket_stats oracle cast fixed;
# boilerplate/perplexity join shapes changed; line_dedup + repeated_spans
# NEW). With 69 queries the window = relational(20) + curation(7) +
# voxel_rel(8) + dedup(7) + text(7) + similarity's first entry. Out this
# round — all green in CORRECTNESS_r05: similarity tail (6), corpus (8),
# multimodal (5). ROUND-7 ROTATION: move corpus/multimodal/similarity
# forward again so their rows refresh; relational can rotate out if its
# r6 rows come back green.
ALL_MODULES = [
    relational, curation, voxel_rel, dedup, text, similarity,
    corpus, multimodal,
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
