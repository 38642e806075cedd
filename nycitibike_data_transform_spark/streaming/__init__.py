"""Structured Streaming surface over the events table."""

from nycitibike_data_transform_spark.streaming.events import (
    dedup_stream,
    hourly_counts_stream,
    read_events_stream,
    run_stream_to_memory,
    sessionize_stream,
    write_stream_exactly_once,
)
from nycitibike_data_transform_spark.streaming.stateful import running_user_totals

__all__ = [
    "read_events_stream",
    "hourly_counts_stream",
    "sessionize_stream",
    "dedup_stream",
    "running_user_totals",
    "run_stream_to_memory",
    "write_stream_exactly_once",
]
