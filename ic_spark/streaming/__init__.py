"""Structured Streaming slice over the ``events`` fixture."""

from ic_spark.streaming.windows import (
    dedup_within_watermark,
    session_window_agg,
    sliding_window_counts,
    stream_events,
    tumbling_window_counts,
)

__all__ = [
    "dedup_within_watermark",
    "session_window_agg",
    "sliding_window_counts",
    "stream_events",
    "tumbling_window_counts",
]
