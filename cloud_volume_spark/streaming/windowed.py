"""Streaming windowed aggregations over the events table.

readStream → transform → writeStream, testable with the availableNow
trigger (processes the whole backlog as one incremental run, then
stops) — results must equal the batch equivalents, which is what
tests/test_streaming.py asserts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType, TimestampType,
)

# events.ts is TIMESTAMP(NANOS) parquet — read as long ns (the session
# sets spark.sql.legacy.parquet.nanosAsLong) and truncate to micros,
# matching operators.common.load
EVENTS_SCHEMA = StructType([
    StructField("event_id", LongType(), True),
    StructField("ts", LongType(), True),
    StructField("user_id", LongType(), True),
    StructField("event_type", StringType(), True),
    StructField("value", DoubleType(), True),
    StructField("props", StringType(), True),
])


def read_events_stream(spark: SparkSession, src_dir: str) -> DataFrame:
    """File-source stream over a directory of event parquet files.
    New files appearing in the directory are discovered incrementally —
    the ingestion pattern for a bucket fed by an upstream producer."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(src_dir)
        .withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling-window counts per event type with late-data bound."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w").start.alias("window_start"),
            F.col("w").end.alias("window_end"),
            "event_type", "n_events", "total_value",
        )
    )


def session_window_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-user session windows (gap timeout) — the incremental
    counterpart of operators.relational.events_sessionize."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
        .select(
            F.col("s").start.alias("session_start"),
            F.col("s").end.alias("session_end"),
            "user_id", "n_events", "session_value",
        )
    )
