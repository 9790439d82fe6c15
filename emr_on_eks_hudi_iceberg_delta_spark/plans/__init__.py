from .explain import (
    broadcast_join_count,
    file_scan_count,
    formatted_plan,
    has_pushed_filter,
    in_memory_scan_count,
    scan_read_columns,
    shuffle_count,
)

__all__ = [
    "broadcast_join_count",
    "file_scan_count",
    "formatted_plan",
    "has_pushed_filter",
    "in_memory_scan_count",
    "scan_read_columns",
    "shuffle_count",
]
