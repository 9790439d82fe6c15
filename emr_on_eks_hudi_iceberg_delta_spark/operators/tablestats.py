"""Column-level statistics and cost-model primitives (the ANALYZE TABLE
layer): row counts, null counts, NDV, min/max per column, and the
classic equi-join cardinality estimate they feed — what a catalog
stores so an optimizer (or a human sizing a 100 TB join) can predict
data motion BEFORE running it.

Design for one pass: all requested columns' statistics are computed as
parallel aggregate expressions inside a SINGLE scan (map-side partial
aggregation, one-row result), then unpivoted driver-free with
``stack()`` into the long (column, stats...) shape a catalog stores.
NDV is HLL-approximate by default (``approx_count_distinct``, constant
memory — the only sane choice at scale) with ``exact=True`` switching
to true COUNT(DISTINCT) for oracle-checkable runs; Spark plans the
multi-column exact form via Expand, which is the documented O(n_cols x
rows) cost you opt into.

Reference scope note: the reference stack stores these in the Glue/Hive
metastore via ANALYZE TABLE; here they are a first-class operator whose
output can be persisted as table properties (sources/tables.py
set_properties) or any stats table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_stats(
    df: DataFrame,
    cols: list[str] | None = None,
    exact: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """Per-column statistics in one scan: ``(column, n_rows, n_nonnull,
    n_distinct, min_value, max_value)`` with min/max rendered as strings
    (the catalog-storage form; cast back with the column's type in
    hand). ``exact=False`` (default) uses HLL NDV at relative standard
    deviation ``rsd`` (tighter rsd = more sketch memory, constant
    either way); ``exact=True`` uses
    COUNT(DISTINCT) — engine-exact, oracle-comparable."""
    cols = list(df.columns) if cols is None else list(cols)
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n")]
    for c in cols:
        aggs.append(F.count(F.col(c)).cast("bigint").alias(f"__nn_{c}"))
        ndv = (
            F.countDistinct(F.col(c))
            if exact
            else F.approx_count_distinct(F.col(c), rsd)
        )
        aggs.append(ndv.cast("bigint").alias(f"__ndv_{c}"))
        aggs.append(F.min(F.col(c)).cast("string").alias(f"__min_{c}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"__max_{c}"))
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `__nn_{c}`, `__ndv_{c}`, `__min_{c}`, `__max_{c}`"
        for c in cols
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column, n_nonnull, n_distinct, min_value, max_value)"
        ),
        F.col("__n").alias("n_rows"),
    ).select(
        "column", "n_rows", "n_nonnull", "n_distinct",
        "min_value", "max_value",
    )


def estimate_equijoin_rows(
    n_left: int, ndv_left: int, n_right: int, ndv_right: int
) -> float:
    """Textbook equi-join cardinality estimate under the uniform-
    frequency / containment assumptions (Selinger):
    ``|A join B| ~= |A| * |B| / max(ndv_A, ndv_B)``. Exact for true
    PK-FK joins (max ndv = the key side's distinct count); an
    OVERestimate when value sets only partially overlap, an UNDER-
    estimate under heavy skew — which is why the companion skew
    diagnosis (operators/scale.key_skew_stats) exists. Driver-side arithmetic on
    catalog numbers; no data touched."""
    if ndv_left <= 0 or ndv_right <= 0:
        return 0.0
    return n_left * n_right / max(ndv_left, ndv_right)
