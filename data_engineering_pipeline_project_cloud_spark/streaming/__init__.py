"""Structured Streaming faces (SURVEY.md §7 M5)."""

from .events import (  # noqa: F401
    read_events_stream,
    run_available_now,
    stream_session_windows,
    stream_sliding_counts,
    stream_tumbling_hourly,
    stream_user_lifetime_stats,
)
