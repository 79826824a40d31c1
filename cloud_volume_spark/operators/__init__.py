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
# ROUND-9 ROTATION (executing the round-8 note): `voxel_rel`/`dedup`/
# `text` return to the front — their 22 rotated-out queries were last
# driver-verified in r7 (voxel_rel's head, vox_changes_feed +
# vox_label_histogram substitutions aside, plus dedup(7) + text(7)).
# `corpus`/`multimodal`/`similarity` stay in-window.  Out this round —
# fresh green in the r8 window, the safest to rotate: relational(20)
# and the tail of curation.  With 72 queries the window =
# voxel_rel(9) + dedup(7) + text(7) + corpus(8) + multimodal(5) +
# similarity(8) + curation(first 6) = exactly 50; out-of-window =
# curation's doc_perplexity + corpus_shuffle and relational(20), all
# green in CORRECTNESS_r08, so the r8∪r9 union keeps every registered
# query on a fresh-within-two-rounds driver row.  ROUND-10 ROTATION:
# relational + curation tail back to the front.
ALL_MODULES = [
    voxel_rel, dedup, text, corpus, multimodal, similarity, curation,
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
