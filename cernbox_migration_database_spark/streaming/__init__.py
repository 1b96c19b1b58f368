from .events import (
    HORIZON_USER,
    dedup_within_watermark,
    event_stream_with_horizon,
    read_event_stream,
    read_upsert_state,
    run_stream_to_memory,
    session_window_agg,
    stream_static_enrich,
    stream_upsert_sink,
    stateful_user_counts,
    stream_stream_join,
    windowed_counts,
)

__all__ = [
    "HORIZON_USER",
    "read_event_stream",
    "event_stream_with_horizon",
    "windowed_counts",
    "session_window_agg",
    "stateful_user_counts",
    "run_stream_to_memory",
    "stream_static_enrich",
    "stream_stream_join",
    "stream_upsert_sink",
    "read_upsert_state",
    "dedup_within_watermark",
]
