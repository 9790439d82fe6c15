from .scd2 import SCD2_ENVELOPE_COLS, checksum_expr, null_timestamp, with_scd2_columns
from .hashing import md5_hash64, shingle_expr, stable_hash64

__all__ = [
    "SCD2_ENVELOPE_COLS",
    "checksum_expr",
    "null_timestamp",
    "with_scd2_columns",
    "md5_hash64",
    "shingle_expr",
    "stable_hash64",
]
