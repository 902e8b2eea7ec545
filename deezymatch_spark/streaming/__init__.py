"""Structured Streaming layer."""

from .ops import (
    release_query_caches,
    streaming_entity_matches,
    streaming_exact_dedup,
    streaming_pages_normalize,
    streaming_session_stats,
    streaming_user_sessions,
    streaming_window_matches,
    windowed_event_counts,
)

__all__ = [
    "streaming_pages_normalize",
    "windowed_event_counts",
    "streaming_entity_matches",
    "streaming_exact_dedup",
    "streaming_session_stats",
    "streaming_user_sessions",
    "streaming_window_matches",
    "release_query_caches",
]
