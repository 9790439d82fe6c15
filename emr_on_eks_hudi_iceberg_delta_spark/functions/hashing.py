"""Deterministic, engine-portable hashing primitives.

Everything here is built on ``md5`` because md5 is bit-identical across
Spark, DuckDB, and Python — which lets the dedup/MinHash operators carry
exact SQL oracles. Spark's native ``xxhash64``/``hash`` are faster but not
reproducible outside Spark; swap ``stable_hash64`` for ``F.xxhash64`` in
production if cross-engine reproducibility is not needed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_hash64(col: Column) -> Column:
    """First 15 hex digits of md5 as a non-negative bigint (fits int64).

    DuckDB equivalent: ``CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT)``.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def stable_hash64(col: Column, seed: int = 0) -> Column:
    """Seeded portable 64-bit hash (the MinHash permutation family)."""
    if seed == 0:
        return md5_hash64(col)
    return md5_hash64(F.concat(F.lit(f"seed{seed}:"), col))


def shingle_expr(tokens_col: str, n: int) -> Column:
    """n-gram shingles over a token array column (by name), as an array of
    strings. Built-ins only (sequence + transform + slice + array_join) —
    stays inside codegen, no Python round trip.
    """
    # NB: guard the short-doc case explicitly — sequence(1, 0) in Spark
    # defaults to step -1 and yields [1, 0], whose 0 index then crashes
    # slice() at runtime. Fewer than n tokens => empty shingle array.
    return F.expr(
        f"if(size({tokens_col}) >= {n}, "
        f"transform(sequence(1, size({tokens_col}) - {n - 1}), "
        f"i -> array_join(slice({tokens_col}, i, {n}), ' ')), "
        f"array())"
    )
