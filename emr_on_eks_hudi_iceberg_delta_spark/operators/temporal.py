"""Temporal joins Spark lacks as built-ins: as-of join and range join.

Both are implemented as compositions of existing DataFrame operators (the
(a) strategy from the build rules — no UDF, no mapPartitions):

* ``asof_join`` — union-and-window: tag both sides, union by name, sort
  within the partition key by (ts, side-priority), carry the right side's
  last non-null values forward, keep left rows. ONE shuffle on the key,
  no range explosion, no per-row binary search — the scale-correct shape
  (a naive ``t1.ts >= t2.ts`` theta join explodes quadratically).
* ``range_join_binned`` — equi-join on coarse time bins + exact residual
  filter: turns an interval-containment theta join (nested-loop in Spark)
  into a hash join whose fan-out is bounded by interval length / bin size.

DuckDB has native ASOF JOIN, which gives the as-of operator an exact SQL
oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``right_ts <= left_ts`` within the same ``on`` key (backward as-of,
    inclusive — DuckDB/pandas ``merge_asof`` default).

    Union-and-window implementation: right rows sort before left rows at
    equal timestamps (side priority 0 < 1) so an exactly-equal right row is
    visible to the left row. ``last(..., ignorenulls)`` carries the right
    values forward within the key partition.
    """
    right_value_cols = right_value_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    lt = left.withColumn("__side", F.lit(1)).withColumn("__ts", F.col(left_ts))
    rt = (
        right.select(
            F.col(on),
            F.col(right_ts).alias("__rts"),
            *[F.col(c).alias(f"{c}{suffix}") for c in right_value_cols],
        )
        .withColumn("__side", F.lit(0))
        .withColumn("__ts", F.col("__rts"))
    )
    unioned = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"__o_{c}")
            for c in right_value_cols
        ],
        F.last("__rts", ignorenulls=True).over(w).alias(f"__o_{right_ts}"),
    )
    return (
        carried.filter(F.col("__side") == 1)
        .drop("__side", "__ts", "__rts", *[f"{c}{suffix}" for c in right_value_cols])
        .withColumnsRenamed(
            {f"__o_{c}": f"{c}{suffix}" for c in right_value_cols}
            | {f"__o_{right_ts}": f"{right_ts}{suffix}"}
        )
    )


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bin_seconds: int = 3600,
) -> DataFrame:
    """Join points to intervals containing them (``start <= ts < end``)
    without a nested-loop: both sides are keyed by coarse time bins (an
    interval lands in every bin it overlaps via sequence+explode), the join
    is a plain equi hash join on the bin, and the exact predicate filters
    residuals. Shuffle volume scales with interval length / bin size, not
    |points| x |intervals|.
    """
    us = 1_000_000 * bin_seconds
    # floor, not cast-truncate: truncation rounds toward zero, so
    # pre-1970 (negative-epoch) timestamps would collapse bins around 0
    # and points could land in a different bin than their interval.
    p = points.withColumn(
        "__bin",
        F.floor(F.expr(f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {point_ts})") / us).cast("bigint"),
    )
    i = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.expr(f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {start_col})") / us).cast("bigint"),
                F.floor(F.expr(f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {end_col})") / us).cast("bigint"),
            )
        ),
    )
    return (
        p.join(i, "__bin")
        .filter((F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) < F.col(end_col)))
        .drop("__bin")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bin_seconds: int = 3600,
) -> DataFrame:
    """Interval x interval overlap join (half-open semantics:
    ``l_start < r_end AND r_start < l_end``) without a nested loop and
    without a dedup shuffle.

    Both sides explode onto the coarse time bins their interval touches
    (``sequence`` over bin ids — end-exclusive, so an interval ending
    exactly on a bin boundary does not occupy that bin); the join is a
    plain hash join on ``keys + bin``. An overlapping pair co-occurs in
    every bin both intervals touch, so a naive bin join duplicates it;
    instead of a ``distinct`` (a second shuffle over the full result) we
    keep the pair only in its FIRST shared bin — the bin containing
    ``greatest(l_start, r_start)``, which both sides provably occupy
    whenever the intervals overlap. Each pair therefore survives exactly
    once, for free.

    Scale: shuffle volume is rows x (interval length / bin size), never
    |left| x |right|; pick ``bin_seconds`` at the typical interval
    length. Empty/negative intervals are dropped (``sequence`` would
    otherwise descend). Skewed keys split across bins like any
    equi-join and AQE skew handling applies.
    """
    us = 1_000_000 * bin_seconds

    def _us(col: str) -> F.Column:
        return F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {col})"
        )

    # floor division, not cast-truncation: truncation rounds toward
    # zero, so negative (pre-1970) epoch values would collapse bin ids
    # around 0 and the first-shared-bin equality could disagree with
    # the greatest(l_start, r_start) bin — silently dropping genuinely
    # overlapping pairs. floor is bin-consistent for any epoch sign.
    def _binned(df: DataFrame, start: str, end: str) -> DataFrame:
        return df.filter(F.col(start) < F.col(end)).withColumn(
            "__bin",
            F.explode(
                F.sequence(
                    F.floor(_us(start) / us).cast("bigint"),
                    F.floor((_us(end) - 1) / us).cast("bigint"),
                )
            ),
        )

    lb = _binned(left, l_start, l_end)
    rb = _binned(right, r_start, r_end)
    first_shared = F.floor(
        F.greatest(_us(l_start), _us(r_start)) / us
    ).cast("bigint")
    return (
        lb.join(rb, keys + ["__bin"])
        .filter(
            (F.col(l_start) < F.col(r_end))
            & (F.col(r_start) < F.col(l_end))
            & (F.col("__bin") == first_shared)
        )
        .drop("__bin")
    )


def resample_ffill(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    order_col: str,
    step_minutes: int = 60,
) -> DataFrame:
    """Resample an event stream onto a fixed time grid with forward-fill
    (pandas ``resample().ffill()`` / time-series feature-grid semantics):
    one row per (key, grid step) carrying the latest ``value_col`` at or
    before the grid instant — NULL before the key's first event.

    Implementation is the union-and-window idiom (no range-explosion join):
    grid rows (one per key x step, value NULL) union the real events; a
    single ``last(value, ignorenulls=True)`` running window ordered by
    (ts, is_grid, order_col) fills every grid row from the newest event at
    or before it. Ties at the same timestamp resolve events-before-grid,
    then by ``order_col`` — fully deterministic.

    Scale: ONE shuffle on the key (the window); the grid is keys x steps —
    generated, never materialized on the driver. A 1000-executor run
    partitions by key exactly like any sessionization.
    """
    t0t1 = events.agg(
        F.date_trunc("hour", F.min(ts_col)).alias("__t0"),
        F.max(ts_col).alias("__t1"),
    )
    keys = events.select(key_col).distinct()
    grid = keys.crossJoin(F.broadcast(t0t1)).select(
        F.col(key_col),
        F.explode(
            F.sequence(
                F.col("__t0"), F.col("__t1"), F.expr(f"INTERVAL {step_minutes} MINUTES")
            )
        ).alias("__ts"),
    )
    ev = events.select(
        F.col(key_col),
        F.col(ts_col).alias("__ts"),
        F.col(value_col).alias("__v"),
        F.lit(0).alias("__is_grid"),
        F.col(order_col).alias("__ord"),
    )
    g = grid.select(
        F.col(key_col),
        F.col("__ts"),
        F.lit(None).cast(ev.schema["__v"].dataType).alias("__v"),
        F.lit(1).alias("__is_grid"),
        F.lit(None).cast(ev.schema["__ord"].dataType).alias("__ord"),
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col("__ts"), F.col("__is_grid"), F.col("__ord").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        ev.unionByName(g)
        .withColumn("__fill", F.last("__v", ignorenulls=True).over(w))
        .filter(F.col("__is_grid") == 1)
        .select(
            F.col(key_col),
            F.col("__ts").alias("grid_ts"),
            F.col("__fill").alias("value_ffill"),
        )
    )


def scd2_asof_lookup(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "inner",
) -> DataFrame:
    """Point-in-time dimension lookup against an SCD2 envelope: each fact
    row joins the dimension version that was valid AT its timestamp —
    ``valid_from <= ts < valid_to`` with an open-ended current row
    (``valid_to IS NULL``). This is the read-side purpose of the SCD2
    tables the reference's merges maintain (hudi_scd_script.py:93-119
    writes the envelope; this is how consumers query it).

    Scale: one equi-shuffle per side on the key; the validity predicate
    is a residual filter on the joined rows (per key only a handful of
    versions exist, so no range explosion — unlike a raw interval join,
    the equi key bounds the match set)."""
    # qualify every reference through its side: SCD2 envelopes routinely
    # carry columns named like fact columns (ts), and an unqualified
    # F.col would be ambiguous after the join
    validity = (fact[ts_col] >= dim[valid_from]) & (
        dim[valid_to].isNull() | (fact[ts_col] < dim[valid_to])
    )
    cond = (fact[fact_key] == dim[dim_key]) & validity
    return fact.join(dim, cond, how)


def resample_lerp(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    order_col: str,
    step_minutes: int = 60,
) -> DataFrame:
    """Resample onto a fixed grid with LINEAR INTERPOLATION (pandas
    ``resample().interpolate()``): each (key, grid instant) carries
    ``v_prev + (v_next - v_prev) * (t - t_prev) / (t_next - t_prev)``
    between its neighboring events; NULL outside the key's observed
    range (no extrapolation — ``resample_ffill`` is the hold-last
    sibling). A grid instant landing exactly on an event returns that
    event's value (the prev window absorbs it, fraction 0).

    Same union-and-window plan as ``resample_ffill`` — ONE shuffle on
    the key, two running windows over the identical sort (prev: rows
    unbounded-preceding..current with last-ignore-nulls; next: rows
    following with first-ignore-nulls), no range join. The arithmetic
    is a fixed operation sequence on epoch-microsecond bigints and the
    raw doubles, so results replay bit-identically in any IEEE engine.
    """
    t0t1 = events.agg(
        F.date_trunc("hour", F.min(ts_col)).alias("__t0"),
        F.max(ts_col).alias("__t1"),
    )
    keys = events.select(key_col).distinct()
    grid = keys.crossJoin(F.broadcast(t0t1)).select(
        F.col(key_col),
        F.explode(
            F.sequence(
                F.col("__t0"),
                F.col("__t1"),
                F.expr(f"INTERVAL {step_minutes} MINUTES"),
            )
        ).alias("__ts"),
    )
    ev = events.select(
        F.col(key_col),
        F.col(ts_col).alias("__ts"),
        F.col(value_col).alias("__v"),
        F.lit(0).alias("__is_grid"),
        F.col(order_col).alias("__ord"),
    )
    g = grid.select(
        F.col(key_col),
        F.col("__ts"),
        F.lit(None).cast(ev.schema["__v"].dataType).alias("__v"),
        F.lit(1).alias("__is_grid"),
        F.lit(None).cast(ev.schema["__ord"].dataType).alias("__ord"),
    )
    order = [
        F.col("__ts"),
        F.col("__is_grid"),
        F.col("__ord").asc_nulls_first(),
    ]
    wp = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    ev_ts = F.when(F.col("__is_grid") == 0, F.unix_micros("__ts"))
    u = ev.unionByName(g).select(
        F.col(key_col),
        "__ts",
        "__is_grid",
        F.last("__v", ignorenulls=True).over(wp).alias("__pv"),
        F.last(ev_ts, ignorenulls=True).over(wp).alias("__pt"),
        F.first("__v", ignorenulls=True).over(wn).alias("__nv"),
        F.first(ev_ts, ignorenulls=True).over(wn).alias("__nt"),
    )
    frac = (
        (F.unix_micros("__ts") - F.col("__pt")).cast("double")
        / (F.col("__nt") - F.col("__pt")).cast("double")
    )
    lerp = (
        # exact hit: the grid instant IS an observation — return it even
        # when it is the key's last event (no next neighbor exists)
        F.when(F.col("__pt") == F.unix_micros("__ts"), F.col("__pv"))
        .when(F.col("__pt").isNull() | F.col("__nt").isNull(), F.lit(None))
        .when(F.col("__pt") == F.col("__nt"), F.col("__pv"))
        .otherwise(F.col("__pv") + (F.col("__nv") - F.col("__pv")) * frac)
    )
    return (
        u.filter(F.col("__is_grid") == 1)
        .select(
            F.col(key_col),
            F.col("__ts").alias("grid_ts"),
            lerp.alias("value_lerp"),
        )
    )
