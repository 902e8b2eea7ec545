"""Structured Streaming layer."""

from .ops import (
    streaming_entity_matches,
    streaming_exact_dedup,
    streaming_pages_normalize,
    windowed_event_counts,
)

__all__ = [
    "streaming_pages_normalize",
    "windowed_event_counts",
    "streaming_entity_matches",
    "streaming_exact_dedup",
]
