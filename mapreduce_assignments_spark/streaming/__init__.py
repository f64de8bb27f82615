"""Structured Streaming operators (see stream_ops)."""

from .stream_ops import (  # noqa: F401
    read_events_stream,
    run_to_memory,
    streaming_exact_dedup,
    streaming_hourly_counts,
    streaming_user_sessions,
)

__all__ = [
    "read_events_stream",
    "streaming_hourly_counts",
    "streaming_user_sessions",
    "streaming_exact_dedup",
    "run_to_memory",
]
