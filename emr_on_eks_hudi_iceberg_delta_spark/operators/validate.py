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


def reconcile_tables(
    src: DataFrame,
    tgt: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Keyed changeset between two table states: the rows one must
    INSERT / DELETE / UPDATE in ``tgt`` so its content matches ``src``
    — the anti-entropy *repair plan* that follows a failed
    ``tables_equal`` check (replica drift, interrupted backfill,
    cross-engine migration audit).

    Returns one row per differing key: ``keys..., change_type
    ('insert'|'delete'|'update'), src_n, tgt_n`` where ``src_n`` /
    ``tgt_n`` are the key's row counts on each side. Keys equal on both
    sides (same multiset of compared-column values) are absent from the
    output, so the result is exactly the repair worklist.

    Duplicate-keyed tables are handled: each side folds its rows into a
    per-key MULTISET digest ``(count, DECIMAL(38,0) hash-sum)`` before
    the comparison, so two rows with the same key but swapped payloads
    still reconcile correctly (an ``update``), and per-key cardinality
    changes surface even when every individual row matches.

    Scale design (the reason this beats ``src EXCEPT tgt`` twice over):
    the per-key digest is computed in the map-side partial aggregate,
    so the shuffle carries ``keys + 16 bytes`` per key — never the
    (possibly very wide) payload columns — and the full-outer
    digest-vs-digest join is a plain equi-join on the key. Repairing
    then reads back only the flagged keys via a semi-join. One shuffle
    per side, payload width eliminated from all data motion.

    Cross-engine caveat inherited from ``row_hash_expr``: pass
    string/integer/decimal ``compare_cols`` (or pre-format floats /
    timestamps) when an external engine must replay the digest.
    """
    h = row_hash_expr(compare_cols).alias("__h")

    def keyed_digest(df: DataFrame, side: str) -> DataFrame:
        return (
            df.select(*keys, h)
            .groupBy(*keys)
            .agg(
                F.count(F.lit(1)).cast("bigint").alias(f"{side}_n"),
                F.sum(F.col("__h").cast("decimal(38,0)"))
                .cast("decimal(38,0)")
                .alias(f"{side}_sum"),
            )
        )

    s = keyed_digest(src, "src")
    t = keyed_digest(tgt, "tgt")
    joined = s.join(t, on=keys, how="full_outer")
    return (
        joined.withColumn(
            "change_type",
            F.when(F.col("tgt_n").isNull(), F.lit("insert"))
            .when(F.col("src_n").isNull(), F.lit("delete"))
            .when(
                (F.col("src_n") != F.col("tgt_n"))
                | (F.col("src_sum") != F.col("tgt_sum")),
                F.lit("update"),
            ),
        )
        .filter(F.col("change_type").isNotNull())
        .select(
            *keys,
            "change_type",
            F.coalesce("src_n", F.lit(0)).alias("src_n"),
            F.coalesce("tgt_n", F.lit(0)).alias("tgt_n"),
        )
    )


def schema_diff(a: DataFrame, b: DataFrame) -> list[dict]:
    """Structural diff between two DataFrame schemas — the data-contract
    check that runs BEFORE any content reconciliation: returns a list of
    ``{"column", "change", "from", "to"}`` dicts where ``change`` is one
    of ``added`` (in b only), ``removed`` (in a only), ``type_changed``,
    ``nullability_changed``. Empty list = contract holds.

    Driver-side metadata only (schemas, not data) — zero jobs, usable as
    a cheap gate in front of reconcile_tables or a streaming sink."""
    fa = {f.name: f for f in a.schema.fields}
    fb = {f.name: f for f in b.schema.fields}
    out: list[dict] = []
    for name in fa:
        if name not in fb:
            out.append(
                {"column": name, "change": "removed",
                 "from": fa[name].dataType.simpleString(), "to": None}
            )
        elif fa[name].dataType != fb[name].dataType:
            out.append(
                {"column": name, "change": "type_changed",
                 "from": fa[name].dataType.simpleString(),
                 "to": fb[name].dataType.simpleString()}
            )
        elif fa[name].nullable != fb[name].nullable:
            out.append(
                {"column": name, "change": "nullability_changed",
                 "from": str(fa[name].nullable), "to": str(fb[name].nullable)}
            )
    for name in fb:
        if name not in fa:
            out.append(
                {"column": name, "change": "added", "from": None,
                 "to": fb[name].dataType.simpleString()}
            )
    return out
