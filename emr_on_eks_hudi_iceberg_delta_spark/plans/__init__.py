from .explain import (
    broadcast_join_count,
    formatted_plan,
    has_pushed_filter,
    scan_read_columns,
    shuffle_count,
)

__all__ = [
    "broadcast_join_count",
    "formatted_plan",
    "has_pushed_filter",
    "scan_read_columns",
    "shuffle_count",
]
