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
# ROUND-10 ROTATION (executing the round-9 note): `relational` and the
# `curation` tail (doc_perplexity, corpus_shuffle — the only two queries
# without an r9 driver row) return to the front.  Round 10 also ADDS
# six queries (events_funnel, event_props_extract,
# events_cohort_retention, events_top_paths → relational;
# doc_pii_redact, corpus_snapshot_diff → corpus), bringing the registry
# to 78; the window = relational(24) + curation(8) + corpus(10) +
# multimodal(5) + similarity(first 3) = exactly 50, so every NEW query
# gets an r10 driver row; out-of-window = similarity's tail(5:
# embedding_dedup_keep, semantic_dedup, srp_ann_topk, ivf_ann_topk,
# embedding_kmeans), text(7), voxel_rel(9), dedup(7) — all green in
# CORRECTNESS_r09, so the r9∪r10 union keeps every registered query on
# a fresh-within-two-rounds driver row.  ROUND-11 ROTATION: voxel_rel +
# dedup + text + similarity to the front (they hold every query whose
# last row is r9).
ALL_MODULES = [
    relational, curation, corpus, multimodal, similarity, text,
    voxel_rel, dedup,
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
