from .events import (
    run_stream_to_memory,
    stage_events_as_stream_source,
    stream_dedup_within_watermark,
    stream_distinct_users,
    stream_session_windows,
    stream_sliding_counts,
    stream_stream_join,
    stream_tumbling_counts,
    stream_user_running_totals,
)

__all__ = [
    "run_stream_to_memory",
    "stage_events_as_stream_source",
    "stream_dedup_within_watermark",
    "stream_distinct_users",
    "stream_session_windows",
    "stream_sliding_counts",
    "stream_stream_join",
    "stream_tumbling_counts",
    "stream_user_running_totals",
]
