"""Structured Streaming surface (SURVEY.md §7 phase 3)."""

from celeborn_spark.streaming.events import (
    kafka_available,
    read_events_stream,
    read_kafka_stream,
    read_offset_stream,
    run_stream_to_table,
    run_stream_until,
)

__all__ = [
    "kafka_available",
    "read_events_stream",
    "read_kafka_stream",
    "read_offset_stream",
    "run_stream_to_table",
    "run_stream_until",
]
