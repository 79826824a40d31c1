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
# ROUND-11 ROTATION (executing the round-10 note): voxel_rel(9) +
# dedup(7+3) + text(7+2) + similarity(8+1) = 37 to the front — they
# hold every query whose last driver row is r9 PLUS six of the nine
# NEW round-11 queries (fuzzy_neardup_titles, dedup_rate_by_source,
# simhash_hamming_pairs → dedup; source_mixture_stats, bigram_lm_top
# → text; embedding_dim_stats → similarity); the remaining three
# (events_conversion_lag, q8_market_share, q13_customer_distribution)
# are keyed second/third/fourth inside `relational` so the window's
# remaining 13 slots (the relational head) include them.
# Registry = 87; out-of-window = the last 14 of relational + curation
# + corpus + multimodal, ALL of which have green rows in
# CORRECTNESS_r10, so the r10∪r11 union keeps every registered query
# on a fresh-within-two-rounds driver row.  ROUND-12 ROTATION:
# relational + curation + corpus + multimodal to the front (50
# queries — they hold every query whose last row is r10, exactly
# filling the window; the r11-module queries all have r11 rows).
ALL_MODULES = [
    voxel_rel, dedup, text, similarity, relational, curation, corpus,
    multimodal,
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
