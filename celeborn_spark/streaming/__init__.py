"""Structured Streaming surface (SURVEY.md §7 phase 3)."""

from celeborn_spark.streaming.events import (
    read_events_stream,
    run_stream_to_table,
)

__all__ = ["read_events_stream", "run_stream_to_table"]
