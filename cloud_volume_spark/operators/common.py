"""Shared helpers for operator modules."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import LongType


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    if table == "events":
        # events.parquet stores TIMESTAMP(NANOS), which Spark's vectorized
        # reader rejects unless this legacy flag is on.  The flag is runtime
        # settable, so set it here rather than relying on the session builder —
        # harness-created sessions (driver, notebooks) won't have it.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    if table == "events":
        # events.ts is TIMESTAMP(NANOS); with
        # spark.sql.legacy.parquet.nanosAsLong it arrives as BIGINT ns.
        # Truncate (not round) to microseconds — matches how a ns
        # instant floors into coarser units.
        if isinstance(df.schema["ts"].dataType, LongType):
            # integer division, NOT (ts/1000).cast: the double round
            # trip can round UP across a microsecond boundary and loses
            # exactness above 2^53 ns — `div` floors exactly
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
    return df
