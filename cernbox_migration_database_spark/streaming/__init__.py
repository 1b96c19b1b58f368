from .events import (
    dedup_within_watermark,
    read_event_stream,
    run_stream_to_memory,
    session_window_agg,
    stateful_user_counts,
    stream_stream_join,
    windowed_counts,
)

__all__ = [
    "read_event_stream",
    "windowed_counts",
    "session_window_agg",
    "stateful_user_counts",
    "run_stream_to_memory",
    "stream_stream_join",
    "dedup_within_watermark",
]
