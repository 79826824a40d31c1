"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query; ``queries``/``oracle_sql`` expose
every implemented operator from SURVEY.md §2 (plus the training-data
pipeline operators) for the duckdb-oracle correctness gate. The
volumetric engine itself (chunk-table cutouts/writes) is verified
against numpy in tests/test_volume.py; its relational analogs appear
here as the ``vox_*`` entries.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    ``corpus_curate`` is the query this engine exists for: quality
    filter ∧ keep-best near-dedup ∧ mixture sampling fused into one
    plan riding the materialized MinHash-LSH cluster map — the
    curation pass a production training-data run actually executes.
    """
    from cloud_volume_spark.operators.corpus import corpus_curate

    return corpus_curate(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from cloud_volume_spark.operators import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from cloud_volume_spark.operators import all_oracle_sql

    return all_oracle_sql()
