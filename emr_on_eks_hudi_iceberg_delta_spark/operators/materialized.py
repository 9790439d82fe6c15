"""Incremental materialized-view maintenance over CDC row diffs.

A 100 TB fact table with a dashboard aggregate on top cannot afford a full
recompute per refresh; the lakehouse answer is *incremental view
maintenance*: read the row-level changes between two snapshots (Delta CDF /
Hudi incremental query — locally ``sources.tables.table_changes``) and fold
them into the stored aggregate. COUNT/SUM are self-maintainable under
insert+delete deltas (an update is delete+insert, the same convention Delta
CDF uses for pre/post images), so the refresh cost is O(changed rows), not
O(table) — the exact reason Databricks/Snowflake ship this as a feature.

Reference scope note: the reference recomputes its Athena-facing tables in
full on every run (e.g. the symlink manifest regeneration,
delta/delta_scd_script.py:57-60); incremental maintenance is the scale
generalization, a capability extension per SURVEY.md §2.

Exactness: counts are bigint arithmetic; sums accumulate as DECIMAL — the
repo-wide convention (NOTES.md) — so refresh-then-read is bit-identical to
a from-scratch recompute in any engine, which is precisely what the DuckDB
oracle asserts.

Scale shape: one shuffle to aggregate the delta on the view's group key
(the delta is small by construction), then one key-partitioned full-outer
join against the stored view — broadcastable whenever the delta's distinct
key count is small, which AQE decides at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def aggregate_view(
    df: DataFrame, group_cols: list[str], sum_specs: dict[str, str]
) -> DataFrame:
    """Build the stored form of a COUNT+SUM materialized view.

    ``sum_specs`` maps output column name -> input column; each sum
    accumulates as DECIMAL(28,4) so later delta folds stay exact.
    """
    aggs = [F.count(F.lit(1)).alias("mv_n")]
    for out, src in sum_specs.items():
        aggs.append(
            F.sum(F.col(src).cast("decimal(18,4)")).cast("decimal(28,4)").alias(out)
        )
    return df.groupBy(*group_cols).agg(*aggs)


def refresh_aggregate_view(
    view: DataFrame,
    changes: DataFrame,
    group_cols: list[str],
    sum_specs: dict[str, str],
) -> DataFrame:
    """Fold a CDC diff (``_change_type`` in {'insert','delete'}, the
    ``table_changes`` contract) into a stored COUNT+SUM view.

    Inserts add, deletes subtract; groups whose maintained count reaches 0
    drop out of the view (matching the from-scratch aggregate, which never
    sees the group). Returns the refreshed view with the same schema as
    ``aggregate_view``. Delegates to the shared signed-delta fold also
    used by ``refresh_join_aggregate_view``.
    """
    return _fold_signed_delta(view, _signed(changes), group_cols, sum_specs)


def _fold_signed_delta(
    view: DataFrame,
    delta_signed: DataFrame,
    group_cols: list[str],
    sum_specs: dict[str, str],
) -> DataFrame:
    """Fold a SIGNED delta relation (``__sign`` in {+1, -1}, one row per
    changed joined tuple) into a stored COUNT+SUM view — the shared core
    of single-table and join-view maintenance."""
    delta_aggs = [F.sum("__sign").cast("bigint").alias("d_n")]
    for out, src in sum_specs.items():
        delta_aggs.append(
            F.sum(
                (F.col("__sign") * F.col(src)).cast("decimal(18,4)")
            ).cast("decimal(28,4)").alias(f"d_{out}")
        )
    delta = delta_signed.groupBy(*group_cols).agg(*delta_aggs)

    zero_n = F.lit(0).cast("bigint")
    merged = view.join(delta, on=group_cols, how="full_outer").select(
        *group_cols,
        (F.coalesce("mv_n", zero_n) + F.coalesce("d_n", zero_n)).alias("mv_n"),
        *[
            (
                F.coalesce(F.col(out), F.lit(0).cast("decimal(28,4)"))
                + F.coalesce(F.col(f"d_{out}"), F.lit(0).cast("decimal(28,4)"))
            )
            .cast("decimal(28,4)")
            .alias(out)
            for out in sum_specs
        ],
    )
    return merged.filter(F.col("mv_n") > 0)


def _signed(changes: DataFrame, sign_col: str = "__sign") -> DataFrame:
    """``_change_type`` {'insert','delete'} -> arithmetic sign ±1."""
    return changes.withColumn(
        sign_col,
        F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
            F.lit(-1)
        ),
    ).drop("_change_type")


def refresh_join_aggregate_view(
    view: DataFrame,
    a_old: DataFrame,
    a_changes: DataFrame,
    b_old: DataFrame,
    b_changes: DataFrame,
    on: str,
    group_cols: list[str],
    sum_specs: dict[str, str],
) -> DataFrame:
    """Incrementally maintain a view over an EQUI JOIN,
    ``V = γ(A ⋈ B)`` — the harder IVM case (Snowflake/Materialize
    territory; single-table COUNT+SUM is ``refresh_aggregate_view``).

    The delta-join identity over signed multisets: with
    ``A' = A + ΔA`` and ``B' = B + ΔB``,

        Δ(A ⋈ B) = ΔA ⋈ B  +  A ⋈ ΔB  +  ΔA ⋈ ΔB

    (signs multiply in the third term: a deleted-A row joining a
    deleted-B row REMOVES one joined tuple from the two single-side
    terms' double-subtraction — dropping the cross term is the classic
    IVM bug, pinned by a test). The signed delta rows then fold into
    the stored aggregate exactly like single-table maintenance.

    Cost: three joins whose left/right sizes are O(Δ) except the two
    old-snapshot sides — each delta side is small by construction, so
    AQE broadcasts it and the old snapshots are scanned once each
    WITHOUT shuffling the stored view's full join. Refresh stays
    O(changed keys' join partners), not O(|A ⋈ B|).
    """
    da = _signed(a_changes, "__sign_a")
    db = _signed(b_changes, "__sign_b")
    d1 = da.join(b_old, on).select(
        F.col("__sign_a").alias("__sign"), *group_cols, *sum_specs.values()
    )
    d2 = a_old.join(db, on).select(
        F.col("__sign_b").alias("__sign"), *group_cols, *sum_specs.values()
    )
    d3 = da.join(db, on).select(
        (F.col("__sign_a") * F.col("__sign_b")).alias("__sign"),
        *group_cols,
        *sum_specs.values(),
    )
    delta_signed = d1.unionByName(d2).unionByName(d3)
    return _fold_signed_delta(view, delta_signed, group_cols, sum_specs)
