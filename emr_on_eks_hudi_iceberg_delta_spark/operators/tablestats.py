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


#: conservative per-value byte widths for size estimation (on-heap row
#: estimate, not parquet-encoded size — broadcast cost is the in-memory
#: hash relation, so the unencoded width is the right ruler)
_TYPE_WIDTH_BYTES = {
    "tinyint": 1,
    "smallint": 2,
    "int": 4,
    "bigint": 8,
    "float": 4,
    "double": 8,
    "date": 4,
    "timestamp": 8,
    "timestamp_ntz": 8,
    "boolean": 1,
}


def estimated_size_bytes(df: DataFrame, stats) -> int:
    """Stats-based in-memory size estimate: ``n_rows`` from the ANALYZE
    output x a per-row width from the schema, with string widths taken
    from the observed min/max values (data-informed, unlike a flat
    default) plus per-cell overhead. ``stats`` is the DataFrame (or
    collected rows) produced by ``column_stats`` over ``df`` — a
    metadata-sized collect either way. Deliberately rough: the point is
    a broadcast-or-not decision with a comfortable threshold margin,
    not an accountant's number."""
    rows = stats.collect() if isinstance(stats, DataFrame) else list(stats)
    if not rows:
        raise ValueError("empty stats: run column_stats over df first")
    by_col = {r["column"]: r for r in rows}
    n = int(rows[0]["n_rows"])
    width = 0
    for f in df.schema.fields:
        t = f.dataType.simpleString()
        if t in _TYPE_WIDTH_BYTES:
            width += _TYPE_WIDTH_BYTES[t]
        elif t.startswith("decimal"):
            width += 16
        elif t == "string":
            r = by_col.get(f.name)
            if r is not None:
                observed = max(
                    len(r["min_value"] or ""), len(r["max_value"] or "")
                )
                width += observed + 8  # bytes + object overhead
            else:
                width += 28
        else:
            width += 64  # arrays/structs/maps: flat guess
    return n * width


def suggest_broadcast(
    df: DataFrame, stats, threshold_bytes: int = 10 * 1024 * 1024
):
    """The step that turns the ANALYZE layer into an optimizer input:
    given a table and its ``column_stats``, return ``(hinted_df,
    decision)`` where ``hinted_df`` carries an explicit ``F.broadcast``
    hint iff the estimated in-memory size is at or under
    ``threshold_bytes`` (the same contract as
    ``spark.sql.autoBroadcastJoinThreshold``, but driven by PERSISTED
    catalog stats instead of file sizes — which is what you have at
    plan time when the input is a filtered/derived relation whose file
    size tells you nothing). ``decision`` is a small dict
    (est_bytes, threshold_bytes, broadcast) for logging/tests."""
    est = estimated_size_bytes(df, stats)
    decision = {
        "est_bytes": est,
        "threshold_bytes": threshold_bytes,
        "broadcast": est <= threshold_bytes,
    }
    return (F.broadcast(df) if decision["broadcast"] else df), decision


def plan_equijoin(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_stats,
    right_stats,
    threshold_bytes: int = 10 * 1024 * 1024,
):
    """Stats-advised equi join: pick the smaller estimated side, hint
    it broadcast when it fits ``threshold_bytes`` (sort-merge
    otherwise — declining is as important as flipping), and report the
    Selinger output-cardinality estimate for the join key so the
    caller can also reason about the DOWNSTREAM size. Returns
    ``(joined_df, decision)``; the join itself is a plain inner equi
    join, so Catalyst/AQE remain free to improve on the hint's
    absence."""
    lb = estimated_size_bytes(left, left_stats)
    rb = estimated_size_bytes(right, right_stats)
    l_rows = {r["column"]: r for r in (
        left_stats.collect() if isinstance(left_stats, DataFrame) else list(left_stats)
    )}
    r_rows = {r["column"]: r for r in (
        right_stats.collect() if isinstance(right_stats, DataFrame) else list(right_stats)
    )}
    est_rows = None
    if on in l_rows and on in r_rows:
        est_rows = estimate_equijoin_rows(
            int(l_rows[on]["n_rows"]),
            int(l_rows[on]["n_distinct"]),
            int(r_rows[on]["n_rows"]),
            int(r_rows[on]["n_distinct"]),
        )
    small_is_left = lb <= rb
    small, small_bytes = (left, lb) if small_is_left else (right, rb)
    decision = {
        "est_left_bytes": lb,
        "est_right_bytes": rb,
        "est_join_rows": est_rows,
        "threshold_bytes": threshold_bytes,
        "broadcast": (
            ("left" if small_is_left else "right")
            if small_bytes <= threshold_bytes
            else None
        ),
    }
    if decision["broadcast"] == "left":
        joined = F.broadcast(left).join(right, on)
    elif decision["broadcast"] == "right":
        joined = left.join(F.broadcast(right), on)
    else:
        joined = left.join(right, on)
    return joined, decision
