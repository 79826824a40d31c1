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
# ROUND-8 ROTATION (executing the round-7 note): `relational` returns
# to the front — its 20 queries sat outside the round-7 window (all
# green in CORRECTNESS_r06).  `corpus`/`multimodal`/`similarity`/
# `curation` stay in-window (fresh r7 green, and they hold this round's
# changes if any).  Out this round — green in BOTH the r6 and r7
# windows, the safest to rotate: dedup(7) + text(7) and the tail of
# voxel_rel.  With 72 queries the window = relational(20) + corpus(8) +
# multimodal(5) + similarity(8) + curation(8) + voxel_rel(first 1) =
# exactly 50; the two NEW-this-round queries sit in-window on arrival
# (embedding_quantize_int8 first in similarity, vox_changes_feed first
# in voxel_rel), displacing vox_label_histogram (green in both the r6
# and r7 windows).  ROUND-9 ROTATION: voxel_rel/dedup/text back to the
# front; relational can rotate out again once its r8 rows are green.
ALL_MODULES = [
    relational, corpus, multimodal, similarity, curation, voxel_rel,
    dedup, text,
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
