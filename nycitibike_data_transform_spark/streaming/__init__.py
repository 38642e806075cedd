"""Structured Streaming surface over the events table."""

from nycitibike_data_transform_spark.streaming.events import (
    hourly_counts_stream,
    run_stream_to_memory,
    sessionize_stream,
)

__all__ = ["hourly_counts_stream", "sessionize_stream", "run_stream_to_memory"]
