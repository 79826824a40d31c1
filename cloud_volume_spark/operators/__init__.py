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
# ROUND-7 ROTATION (executing the round-6 note): `corpus`, `multimodal`
# and `similarity` move to the front — their 20 queries sat outside the
# round-6 window (all green in CORRECTNESS_r05). `curation` stays
# in-window for a second confirmation of the round-6 additions
# (line_dedup, repeated_spans, corpus_shuffle) and the round-7 de-skew
# rewrites (boilerplate_ngrams, repeated_spans) + key fixes (line_dedup
# min_by ordering, corpus_shuffle 60-bit key). With 70 queries the
# window = corpus(8) + multimodal(5) + similarity(7) + curation(8) +
# voxel_rel(8) + dedup(7) + text(7) = exactly 50. Out this round — all
# 20 green in CORRECTNESS_r06: relational. ROUND-8 ROTATION: rotate
# relational back to the front; voxel_rel/dedup/text can move behind it
# if their r7 rows come back green.
ALL_MODULES = [
    corpus, multimodal, similarity, curation, voxel_rel, dedup, text,
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
