"""Structured Streaming surface over the events table."""

from nycitibike_data_transform_spark.streaming.events import (
    click_purchase_join_stream,
    dedup_stream,
    enriched_events_stream,
    hourly_counts_stream,
    sliding_counts_stream,
    read_events_stream,
    run_stream_to_memory,
    sessionize_stream,
    write_stream_exactly_once,
)
from nycitibike_data_transform_spark.streaming.documents import (
    document_dedup_stream,
    quality_filter_stream,
    read_documents_stream,
    source_counts_stream,
)
from nycitibike_data_transform_spark.streaming.stateful import running_user_totals
from nycitibike_data_transform_spark.streaming.upsert import (
    apply_upsert_batch,
    upsert_stream_to_table,
)

__all__ = [
    "apply_upsert_batch",
    "upsert_stream_to_table",
    "read_events_stream",
    "enriched_events_stream",
    "hourly_counts_stream",
    "sliding_counts_stream",
    "sessionize_stream",
    "dedup_stream",
    "click_purchase_join_stream",
    "running_user_totals",
    "read_documents_stream",
    "document_dedup_stream",
    "quality_filter_stream",
    "source_counts_stream",
    "run_stream_to_memory",
    "write_stream_exactly_once",
]
