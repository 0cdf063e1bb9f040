"""Structured Streaming faces (SURVEY.md §7 M5)."""

from .events import (  # noqa: F401
    read_events_stream,
    run_available_now,
    stream_dedup_events,
    stream_session_windows,
    stream_sliding_counts,
    stream_tumbling_hourly,
    stream_user_lifetime_stats,
)
from .joins import stream_click_purchase_join  # noqa: F401
