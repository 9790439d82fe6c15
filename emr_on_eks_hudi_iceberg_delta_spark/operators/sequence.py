"""Sequence analytics over event streams: gaps-and-islands and sweep-line
concurrency — the two classic "order matters" aggregations Spark has no
built-in operator for, expressed as window-function compositions (strategy
(a) from the build rules: existing DataFrame ops, no UDFs).

Reference scope note: the reference (BogaPavanKalyan/emr-on-eks-hudi-
iceberg-delta) has no event-sequence operators — its only temporal logic is
SCD2 validity windows (hudi/hudi_scd_script.py:59-62). These are capability
extensions for the events table, same family as streaming/events.py.

Scale notes:

* ``activity_streaks`` — one shuffle on the entity key; the row_number
  window and the island aggregate share that single exchange. Distinct
  (user, day) first, so the window input is bounded by days-per-user, not
  raw event count.
* ``daily_peak_concurrency`` — the naive global sweep is a running sum
  over ONE total order (single-partition window = driver-shaped bottleneck
  at 100 TB). Clipping intervals to day segments first makes the sweep
  partition by day: each day's window is independent, so parallelism =
  number of days, and no partition ever sees more than that day's
  interval endpoints. Cross-day sessions contribute a segment per day,
  so correctness is unaffected by the split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def activity_streaks(
    events: DataFrame, user_col: str = "user_id", ts_col: str = "ts"
) -> DataFrame:
    """Maximal runs of CONSECUTIVE active days per user (gaps-and-islands):
    a user active on days {1,2,3,6,7} has streaks [1-3] and [6-7].

    The island key is ``day - row_number`` (in days): consecutive days
    share it, any gap shifts it. Pure window + aggregate — no self-join,
    no iteration.

    Returns one row per (user, streak): ``user_id, streak_start,
    streak_end, n_days``.
    """
    days = (
        events.select(F.col(user_col), F.to_date(F.col(ts_col)).alias("__day"))
        .distinct()
    )
    w = Window.partitionBy(user_col).orderBy("__day")
    islands = days.withColumn(
        "__island", F.date_sub(F.col("__day"), F.row_number().over(w))
    )
    return islands.groupBy(user_col, "__island").agg(
        F.min("__day").alias("streak_start"),
        F.max("__day").alias("streak_end"),
        F.count(F.lit(1)).alias("n_days"),
    ).drop("__island")


def sessions_from_events(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Gap-based sessions (same semantics as queries.events_sessionize):
    one row per (user, session) with ``session_start`` / ``session_end``.
    Factored out so interval-level operators (concurrency, overlap) can
    consume sessions without re-deriving them."""
    ev = events.withColumn(
        "__us",
        F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col})"
        ),
    )
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    lag_us = F.lag("__us").over(w)
    new_sess = F.when(
        lag_us.isNull() | (F.col("__us") - lag_us > gap_seconds * 1_000_000),
        F.lit(1),
    ).otherwise(F.lit(0))
    sess = ev.withColumn("__new", new_sess).withColumn(
        "__sid", F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sess.groupBy(F.col(user_col), F.col("__sid").alias("session_id")).agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    )


def daily_peak_concurrency(
    intervals: DataFrame,
    start_col: str = "session_start",
    end_col: str = "session_end",
) -> DataFrame:
    """Peak number of SIMULTANEOUSLY open intervals per day (sweep line):
    +1 at each start, -1 at each end, running sum in time order, max.

    Interval semantics are half-open ``[start, end)`` at the sweep level:
    at an identical instant, ends are processed BEFORE starts (delta -1
    sorts before +1), so an interval starting exactly when another ends is
    NOT counted as concurrent with it. Zero-length intervals (start ==
    end) never register.

    Cross-day intervals are clipped into one segment per day they touch,
    which is what makes the sweep partitionable by day (see module
    docstring); a day fully inside a multi-day interval gets a full-day
    segment, so its peak is at least 1.

    Returns ``day, peak_concurrency``.
    """
    segs = (
        intervals.withColumn(
            "__day",
            F.explode(
                F.sequence(F.to_date(start_col), F.to_date(end_col))
            ),
        )
        .withColumn("__day_start", F.col("__day").cast("timestamp_ntz"))
        .withColumn("__day_end", F.timestamp_add("DAY", F.lit(1), F.col("__day_start")))
        .withColumn("__seg_start", F.greatest(F.col(start_col), F.col("__day_start")))
        .withColumn("__seg_end", F.least(F.col(end_col), F.col("__day_end")))
        .filter(F.col("__seg_start") < F.col("__seg_end"))
    )
    # one +1/-1 delta pair per segment via a single explode — a
    # start-select UNION end-select would make Spark recompute the whole
    # upstream (scan + sessionize windows) once per union branch
    deltas = segs.select(
        "__day",
        F.explode(
            F.array(
                F.struct(
                    F.col("__seg_start").alias("__t"), F.lit(1).alias("__delta")
                ),
                F.struct(
                    F.col("__seg_end").alias("__t"), F.lit(-1).alias("__delta")
                ),
            )
        ).alias("__e"),
    ).select("__day", F.col("__e.__t").alias("__t"), F.col("__e.__delta").alias("__delta"))
    w = (
        Window.partitionBy("__day")
        .orderBy("__t", "__delta")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    running = deltas.withColumn("__open", F.sum("__delta").over(w))
    return running.groupBy(F.col("__day").alias("day")).agg(
        F.max("__open").cast("bigint").alias("peak_concurrency")
    )


def ewma_scores(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    value_col: str = "value",
    alpha: float = 0.5,
) -> DataFrame:
    """Per-entity exponentially weighted moving average over the entity's
    time-ordered values — the classic recency-weighted engagement /
    activity score (``s_1 = x_1``, ``s_i = alpha*x_i + (1-alpha)*s_{i-1}``,
    the pandas ``ewm(adjust=False)`` recursion), expressed Spark-first:
    one key shuffle, the per-entity sequence sorted in-row
    (``sort_array`` over (ts, tiebreak, value) structs) and folded with a
    sequential ``F.aggregate`` — no Python, no iterative driver loop.

    Exactness: the fold seeds from the FIRST element and applies
    ``acc*(1-alpha) + x*alpha`` left-to-right — precisely DuckDB's
    ``list_reduce`` contract, so the oracle replays the recursion
    bit-for-bit (literal alpha, same IEEE op sequence).

    Scale: state per entity is its value array — fine for bounded
    per-entity history (sessions, recent windows); unbounded entities
    should pre-window (e.g. trailing N days) before scoring, which
    composes as a plain filter.
    """
    a = float(alpha)
    vals = F.transform(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col(ts_col).alias("t"),
                    F.col(order_tiebreak).alias("e"),
                    F.col(value_col).cast("double").alias("v"),
                )
            )
        ),
        lambda x: x["v"],
    )
    return events.groupBy(key_col).agg(
        F.size(vals).cast("bigint").alias("n_events"),
        F.aggregate(
            F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
            F.element_at(vals, 1),
            lambda acc, x: acc * F.lit(1.0 - a) + x * F.lit(a),
        ).alias("ewma_score"),
    )


def cusum_scores(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    value_col: str = "value",
    drift: float = 55.0,
    threshold: float = 300.0,
) -> DataFrame:
    """Per-entity one-sided CUSUM change detection over the time-ordered
    value sequence — the classic upward-shift detector
    (``s_0 = 0``, ``s_i = max(0, s_{i-1} + x_i - drift)``; an alert when
    the statistic crosses ``threshold``): sustained above-drift values
    accumulate, normal fluctuation resets toward zero. Same Spark-first
    shape as ``ewma_scores``: one key shuffle, in-row sort, sequential
    ``F.aggregate`` fold seeded at 0.0 — which is exactly a DuckDB
    ``list_reduce`` over the 0.0-prepended list, so the oracle replays
    the recursion bit-for-bit (literal constants, same IEEE sequence).

    Returns ``(key, n_events, cusum_final, alert)`` where ``alert`` is
    the FINAL statistic exceeding the threshold (in-control entities
    decay back under it; a latched any-time alarm needs a max-tracking
    accumulator — a struct fold, same machinery, not replayable in
    DuckDB's scalar list_reduce — so the gated contract is the final
    state and the latched flavor stays host-side).

    Scale: state per entity is its value array, as EWMA — pre-window
    unbounded entities."""
    d = float(drift)
    vals = F.transform(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col(ts_col).alias("t"),
                    F.col(order_tiebreak).alias("e"),
                    F.col(value_col).cast("double").alias("v"),
                )
            )
        ),
        lambda x: x["v"],
    )
    cusum = F.aggregate(
        vals,
        F.lit(0.0),
        lambda acc, x: F.greatest(acc + x - F.lit(d), F.lit(0.0)),
    )
    return events.groupBy(key_col).agg(
        F.size(vals).cast("bigint").alias("n_events"),
        cusum.alias("cusum_final"),
    ).select(
        key_col,
        "n_events",
        "cusum_final",
        (F.col("cusum_final") > float(threshold)).alias("alert"),
    )
