"""Mergeable sketch aggregates (Apache DataSketches via the Spark 4 SQL
function surface): HLL distinct-count, Theta set-cardinality algebra,
KLL quantiles.

Why this family is first-class at 100 TB: every sketch here is an
ASSOCIATIVE, bounded-size aggregation state. Partial sketches compute
map-side at scan speed, shuffle as a few KB per group regardless of
input volume, and — the property plain COUNT(DISTINCT)/percentile lack
— can be SAVED and RE-AGGREGATED: per-day/per-source partials roll up
to any coarser grain (`hll_rollup`) without rescanning the corpus, and
set algebra (overlap, churn, contamination) runs on the sketches alone
(`theta_set_cardinalities`). COUNT(DISTINCT x) by comparison carries
the full distinct key set through every shuffle and cannot compose
across snapshots.

Exactness contract (what lets some of these carry EXACT DuckDB
oracles): a DataSketches HLL/Theta sketch stores raw keys/coupons until
its nominal capacity (Theta: 2^lgk retained hashes; HLL: the sparse
coupon list) and is EXACT below that threshold; estimation error only
begins after promotion/sampling. Gate-scale cardinalities sit far below
the default capacities, so the oracle rows compare exact integers; at
production scale the same plan degrades gracefully to the documented
relative-standard-error (HLL lgk=12: ~0.8%; Theta lgk=12: ~1.6%).
KLL quantile compaction is randomized, so its queries stay rows-only
with rank-error tests instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_partial_sketches(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lgk: int = 12,
) -> DataFrame:
    """Per-group HLL partial sketches (binary, mergeable) — the state a
    100 TB pipeline persists per day/source/shard for later rollup.
    One group-keyed shuffle of sketch-sized (≤ ~0.75·2^lgk bytes)
    partials; the input shuffles nothing else."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lgk)).alias("sketch")
    )


def grouped_distinct_hll(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lgk: int = 12,
) -> DataFrame:
    """Distinct count per group via HLL — exact below the sketch's
    sparse capacity (see module docstring), ~0.8% RSE beyond."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(F.hll_sketch_agg(value_col, F.lit(lgk)))
        .cast("bigint")
        .alias("distinct_est")
    )


def hll_rollup(
    sketches: DataFrame,
    rollup_cols: list[str],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Re-aggregate persisted partial sketches to a coarser grain
    (source/day -> source -> global) WITHOUT touching the raw data —
    the reason sketches beat COUNT(DISTINCT) for lakehouse rollups.
    Input is group-cardinality-sized; this is metadata-scale work."""
    grouped = (
        sketches.groupBy(*rollup_cols) if rollup_cols else sketches.groupBy()
    )
    return grouped.agg(
        F.hll_sketch_estimate(F.hll_union_agg(sketch_col, F.lit(True)))
        .cast("bigint")
        .alias("distinct_est")
    )


def theta_set_cardinalities(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
) -> DataFrame:
    """Distinct-set algebra between two cohorts: |A∪B|, |A∩B|, |A\\B|
    estimated from two Theta sketches — audience overlap, cross-month
    churn, train/eval contamination share. Each side reduces map-side
    to ONE sketch row; the join is a 1×1 crossJoin (broadcast by
    construction). Exact while each side retains < 2^12 hashes."""
    a = df_a.agg(F.theta_sketch_agg(value_col).alias("a"))
    b = df_b.agg(F.theta_sketch_agg(value_col).alias("b"))
    return a.crossJoin(F.broadcast(b)).select(
        F.theta_sketch_estimate(F.theta_union("a", "b"))
        .cast("bigint")
        .alias("union_est"),
        F.theta_sketch_estimate(F.theta_intersection("a", "b"))
        .cast("bigint")
        .alias("intersection_est"),
        F.theta_sketch_estimate(F.theta_difference("a", "b"))
        .cast("bigint")
        .alias("difference_est"),
    )


def kll_quantile_profile(
    df: DataFrame,
    value_col: str,
    probs: list[float],
    k: int = 200,
) -> DataFrame:
    """Mergeable quantile profile of a bigint column via KLL: one
    map-side-combined sketch, quantiles extracted as one row.
    Unlike ``approxQuantile`` (a driver action returning Python
    floats), the KLL state is a COLUMN — persistable beside HLL
    partials and re-mergeable across snapshots with
    ``kll_sketch_merge_bigint``. Normalized rank error ~1.65% at
    k=200; compaction is randomized, so results carry a rank-error
    contract, not bit-equality (tests/test_sketches.py)."""
    sk = df.agg(F.kll_sketch_agg_bigint(value_col, F.lit(k)).alias("sk"))
    return sk.select(
        *[
            F.kll_sketch_get_quantile_bigint("sk", F.lit(float(p))).alias(
                f"q{str(p).replace('.', '_')}"
            )
            for p in probs
        ]
    )
