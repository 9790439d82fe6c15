from .merge import (
    MergeIntoBuilder,
    find_changed_current,
    scd2_merge_delta_style,
    scd2_merge_hudi_style,
    scd2_merge_iceberg_style,
    upsert_by_key,
)

__all__ = [
    "MergeIntoBuilder",
    "find_changed_current",
    "scd2_merge_delta_style",
    "scd2_merge_hudi_style",
    "scd2_merge_iceberg_style",
    "upsert_by_key",
]
