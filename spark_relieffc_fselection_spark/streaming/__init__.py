"""Structured Streaming operators (SURVEY §2.8/§7.4)."""

from spark_relieffc_fselection_spark.streaming.windows import (
    read_events_stream,
    run_to_memory_sink,
    stateful_user_totals,
    streaming_dedup,
    streaming_session_agg,
    streaming_tumbling_counts,
)

__all__ = [
    "read_events_stream",
    "run_to_memory_sink",
    "stateful_user_totals",
    "streaming_dedup",
    "streaming_session_agg",
    "streaming_tumbling_counts",
]
