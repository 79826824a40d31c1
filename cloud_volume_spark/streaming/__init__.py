"""Structured Streaming extensions.

The reference has no streaming semantics at all (SURVEY.md §2.4 —
zarr's ``t`` axis is a stored dimension, batch-read only). These
operators extend the engine with incremental ingestion over the same
event tables: windowed aggregation with watermarks, session windows,
streaming exact dedup (first-seen per content hash), a custom stateful
label-envelope maintainer (applyInPandasWithState), and a streaming
annotation-ingest path that appends to an annotation layer's parquet
dataset.
"""

from cloud_volume_spark.streaming.windowed import (  # noqa: F401
    ingest_annotations_stream,
    read_documents_stream,
    read_events_stream,
    session_window_stats,
    streaming_contamination,
    streaming_conversion_lag,
    streaming_exact_dedup,
    streaming_incremental_dedup,
    streaming_ingest_gate,
    streaming_ivf_semantic_dedup,
    streaming_lsh_index_dedup,
    streaming_quality_filter,
    streaming_funnel,
    streaming_label_envelope,
    streaming_path_mine,
    streaming_pii_redact,
    streaming_redact_text,
    streaming_source_mixture,
    windowed_event_counts,
)
