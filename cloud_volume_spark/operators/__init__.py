"""Relational + training-data-pipeline operators.

Each module exposes ``QUERIES: {name: fn(spark, sf_dir) -> DataFrame}``
and ``ORACLE_SQL: {name: str}`` (DuckDB-runnable ANSI SQL computing the
same result with the same column names). ``__spark_entry__.py``
aggregates them for the driver's correctness gate.
"""

from cloud_volume_spark.operators import (  # noqa: F401
    corpus, dedup, relational, similarity, text, voxel_rel,
)
from cloud_volume_spark import multimodal

ALL_MODULES = [
    relational, voxel_rel, text, dedup, similarity, corpus, multimodal,
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
