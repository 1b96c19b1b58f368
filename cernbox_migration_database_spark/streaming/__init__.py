from .events import (
    read_event_stream,
    run_stream_to_memory,
    session_window_agg,
    stateful_user_counts,
    windowed_counts,
)

__all__ = [
    "read_event_stream",
    "windowed_counts",
    "session_window_agg",
    "stateful_user_counts",
    "run_stream_to_memory",
]
