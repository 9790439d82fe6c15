"""Order-independent table content digests — the anti-entropy tool for
cross-engine / cross-cluster data validation: after migrating or
replicating 100 TB you cannot sort-and-compare, but you CAN compare a
one-row digest whose value is independent of row order, partitioning,
and engine. Two tables with equal digests are (with 2^-64-grade
confidence per component) content-equal as multisets.

Digest = per-row portable hash (md5-derived, functions/hashing.py —
bit-identical in Spark, DuckDB, Python) folded by ORDER-INDEPENDENT
aggregates: COUNT, exact DECIMAL(38,0) SUM, and BIT_XOR. Sum and xor
catch different tamper patterns (xor misses even-multiplicity changes,
sum misses compensating ±deltas; together with count they are the
standard anti-entropy triple).

Canonical row encoding: each column is cast to string and NULL is
replaced by a sentinel BEFORE concat (concat_ws would silently skip
NULLs, making ('a', NULL) collide with ('a',)); columns join on the
unit separator chr(31). Cross-engine caveat: string casts of floats /
timestamps differ between engines — digest STRING/INTEGER/DECIMAL
columns (or pre-format others) when the oracle side must replay; the
gate query demonstrates exactly that discipline.

Scale: one scan, map-side partial aggregation, a one-row result — the
cheapest possible full-table integrity check.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_hash64

#: column separator (unit separator) and NULL sentinel in the canonical
#: row encoding — chr(31) / chr(30)+'N' are replayable in any engine
SEP = "\x1f"
NULL_SENTINEL = "\x1eN"


def row_hash_expr(cols: list[str]) -> Column:
    """Portable 64-bit hash of the canonical row encoding."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit(NULL_SENTINEL))
        for c in cols
    ]
    joined = parts[0]
    for p in parts[1:]:
        joined = F.concat(joined, F.lit(SEP), p)
    return md5_hash64(joined)


def table_digest(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One-row multiset digest ``(n_rows, hash_sum, hash_xor)`` of
    ``df`` restricted to ``cols`` (default: all columns, in schema
    order — pass an explicit list when comparing across engines so the
    column order is pinned)."""
    cols = list(df.columns) if cols is None else list(cols)
    h = row_hash_expr(cols).alias("__h")
    return df.select(h).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        # exact decimal digits as STRING: DECIMAL(38,0) exceeds double
        # precision and pandas/duckdb would lossy-convert it
        F.sum(F.col("__h").cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .cast("string")
        .alias("hash_sum"),
        F.bit_xor("__h").cast("bigint").alias("hash_xor"),
    )


def tables_equal(a: DataFrame, b: DataFrame, cols: list[str]) -> bool:
    """Multiset equality via digest compare — two scans, two rows moved."""
    ra = table_digest(a, cols).collect()[0]
    rb = table_digest(b, cols).collect()[0]
    return (
        ra["n_rows"] == rb["n_rows"]
        and ra["hash_sum"] == rb["hash_sum"]
        and ra["hash_xor"] == rb["hash_xor"]
    )
