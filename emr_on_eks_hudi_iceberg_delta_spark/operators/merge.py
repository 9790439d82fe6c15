"""SCD2 merge operators — the reference's three pipelines as a library.

The reference implements one logical operation (SCD2 incremental merge)
three ways (SURVEY.md §2.11):

1. Hudi:    join-expire-union-upsert      (hudi/hudi_scd_script.py:93-119)
2. Iceberg: union + LEAD window + MERGE   (iceberg/iceberg_scd_script.py:54-82)
3. Delta:   NULL-mergeKey dual-row MERGE  (delta/delta_scd_script.py:76-95)

All three are re-expressed with built-in DataFrame operators (joins, unions,
windows) — no format plugin, no UDF, no collect. Convergent invariant on the
reference fixtures: 1192 rows, 1100 current, 92 expired with
``valid_to = batch valid_from``. Variants 1-2 rewrite unchanged rows'
timestamps; variant 3 preserves them (delta script's conditional MATCHED
clause) — tests compare timestamp-insensitively.

Scale notes (100 TB):
* every operator here shuffles on the business key exactly once per stage;
  pre-partitioning target tables by the key makes the join + window share
  the exchange.
* the incoming batch is typically <<1% of the target — Catalyst/AQE will
  broadcast it in the change-detection join automatically; we add an
  explicit ``broadcast()`` hint when the updates plan is small.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scd2 import (
    checksum_expr,
    load_timestamp,
    null_timestamp,
    with_scd2_columns,
)


def upsert_by_key(
    target: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    precombine_col: str,
    priority_col: str | None = None,
) -> DataFrame:
    """Hudi keyed upsert (S7): record key = ``key_cols``, precombine =
    ``precombine_col`` (hudi/hudi_scd_script.py:32-36).

    union target + incoming, keep the single max-precombine row per key —
    ``row_number`` over (key, precombine desc, writer-seq desc). One shuffle
    on the key; map-side the window needs no pre-aggregation since
    row_number streams.

    Precombine ties resolve deterministically to the NEWEST writer (Hudi
    prefers the incoming record on equal precombine values): the secondary
    sort key is a writer-sequence column — target rows get 0, incoming rows
    get 1. Callers merging several ordered batches at once (MoR
    ``read_realtime``) pass ``priority_col`` naming their own batch-sequence
    column instead; higher values win ties, NULLs lose.
    """
    drop_cols = ["__rn"]
    if priority_col is None:
        priority_col = "__writer_seq"
        drop_cols.append(priority_col)
        target = target.withColumn(priority_col, F.lit(0))
        updates = updates.withColumn(priority_col, F.lit(1))
    unioned = target.unionByName(updates, allowMissingColumns=True)
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(precombine_col).desc(), F.col(priority_col).desc_nulls_last()
    )
    return (
        unioned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop(*drop_cols)
    )


def find_changed_current(
    target: DataFrame,
    updates: DataFrame,
    key_col: str,
    hint_broadcast_updates: bool = False,
) -> DataFrame:
    """Change-detection join (J1): mixed equi + theta + literal condition
    list, exactly the reference's ``join_cond`` (hudi/hudi_scd_script.py:94-97):

        [t.checksum != u.checksum, t.id == u.id, t.iscurrent == 1]

    Catalyst plans the equi key as the join key and folds the rest into the
    join filter. Returns target-side rows aliased ``t`` joined with
    update-side rows aliased ``u``.
    """
    u = F.broadcast(updates) if hint_broadcast_updates else updates
    t, u = target.alias("t"), u.alias("u")
    cond = (
        (F.col("t." + key_col) == F.col("u." + key_col))
        & (F.col("t.checksum") != F.col("u.checksum"))
        & (F.col("t.iscurrent") == F.lit(1))
    )
    return t.join(u, cond, "inner")


def _expire_projection(business_cols: list[str], include_ts: bool) -> list[Column]:
    """The expired-copy projection (P2 + P7, hudi/hudi_scd_script.py:98-107):
    business columns + valid_from from the target, ``valid_to`` = incoming
    batch's valid_from, ``iscurrent`` = 0, target checksum. ``ts`` takes the
    incoming timestamp so the expired copy wins precombine against the old
    stored version sharing its (key, checksum)."""
    cols = [F.col(f"t.{c}").alias(c) for c in business_cols]
    if include_ts:
        cols.append(F.col("u.ts").alias("ts"))
    cols += [
        F.col("t.valid_from").alias("valid_from"),
        F.col("u.valid_from").alias("valid_to"),
        F.lit(0).cast("int").alias("iscurrent"),
        F.col("t.checksum").alias("checksum"),
    ]
    return cols


def scd2_merge_hudi_style(
    target: DataFrame,
    updates_raw: DataFrame,
    key_col: str,
    checksum_cols: list[str],
    as_of: str | None = None,
    broadcast_updates: bool = False,
) -> DataFrame:
    """Variant 1 — join-expire-union-upsert (hudi/hudi_scd_script.py:93-119).

    updates_raw: business columns only; the SCD2 envelope is derived here
    (as the reference does on load, hudi/hudi_scd_script.py:84-88).
    Unchanged incoming rows rewrite their stored versions (same record key
    ``(key, checksum)``, newer precombine ``ts``) — reference semantics.
    """
    business_cols = updates_raw.columns
    updates = with_scd2_columns(updates_raw, checksum_cols, as_of=as_of)
    changed = find_changed_current(target, updates, key_col, broadcast_updates)
    expired = changed.select(*_expire_projection(business_cols, include_ts=True))
    incoming = updates.unionByName(expired, allowMissingColumns=True)
    return upsert_by_key(target, incoming, [key_col, "checksum"], "ts")


def scd2_merge_iceberg_style(
    target: DataFrame,
    updates_raw: DataFrame,
    key_col: str,
    checksum_cols: list[str],
    as_of: str | None = None,
) -> DataFrame:
    """Variant 2 — union + LEAD + 2-key MERGE (iceberg/iceberg_scd_script.py:54-82).

    The staged CTE unions changed-current target rows with all staged rows
    (UNION DISTINCT, O2), then ``LEAD(valid_from) OVER (PARTITION BY key
    ORDER BY valid_from)`` (W1) derives ``valid_to``/``iscurrent``; the
    MERGE on ``(key, checksum)`` with unconditional UPDATE */INSERT * is
    decomposed as: target rows whose (key, checksum) is untouched, plus all
    merged rows.

    Edge-case note: if a key's value reverts A->B->A across batches, the
    target can hold an expired history row with the same ``(key, checksum)``
    as a staged row. The reference's unconditional ``UPDATE *`` would rewrite
    BOTH matching target rows to identical merged values (duplicate rows);
    this decomposition replaces them with ONE merged copy — the
    duplicate-free reading of the same MERGE.
    """
    business_cols = updates_raw.columns
    staged = with_scd2_columns(updates_raw, checksum_cols, as_of=as_of)
    out_cols = staged.columns

    changed = find_changed_current(target, staged, key_col)
    changed_target = changed.select(*[F.col(f"t.{c}").alias(c) for c in out_cols])
    # SQL UNION = UNION DISTINCT (iceberg_scd_script.py:62) — NOT union-all.
    unioned = changed_target.union(staged.select(*out_cols)).distinct()

    w = Window.partitionBy(key_col).orderBy("valid_from")
    merged_src = (
        unioned.withColumn("__eff_from", F.lead("valid_from").over(w))
        # CAST(COALESCE(eff_from, null) AS Timestamp) (F8, :69)
        .withColumn("valid_to", F.coalesce(F.col("__eff_from"), null_timestamp()))
        # CASE WHEN eff_from IS NULL THEN 1 ELSE 0 END (F9/F10, :70)
        .withColumn(
            "iscurrent",
            F.when(F.col("__eff_from").isNull(), F.lit(1)).otherwise(F.lit(0)).cast("int"),
        )
        .drop("__eff_from")
        .select(*out_cols)
    )
    # MERGE ON (key, checksum), WHEN MATCHED UPDATE SET * / NOT MATCHED INSERT *
    # == replace target rows sharing (key, checksum) with merged rows, keep rest.
    untouched = target.join(merged_src, on=[key_col, "checksum"], how="left_anti")
    return untouched.select(*out_cols).unionByName(merged_src)


def scd2_merge_delta_style(
    target: DataFrame,
    updates_raw: DataFrame,
    key_col: str,
    checksum_cols: list[str],
    as_of: str | None = None,
) -> DataFrame:
    """Variant 3 — NULL-mergeKey dual-row MERGE (delta/delta_scd_script.py:76-95).

    Source = (changed rows with ``mergeKey=NULL`` -> always INSERT)
           UNION (all staged rows with ``mergeKey=key``);
    ``WHEN MATCHED AND src.checksum != tgt.checksum AND tgt.iscurrent = 1
    THEN UPDATE SET valid_to = src.valid_from, iscurrent = 0``;
    ``WHEN NOT MATCHED THEN INSERT *``.

    Decomposition (NULL = x is never true, so NULL-mergeKey rows are
    unconditional inserts — J4 semantics preserved):
      * expired   = target current rows matching a changed staged row
      * untouched = every other target row (matched-but-clause-failed rows
                    and never-matched rows) — unchanged rows keep their
                    original timestamps, unlike variants 1-2
      * inserts   = changed staged rows (the NULL-mergeKey copies) + staged
                    rows whose key is absent from the target
    The Delta pipeline carries no ``ts`` column (8-column envelope,
    delta/delta_scd_script.py:33-36).
    """
    staged = with_scd2_columns(updates_raw, checksum_cols, as_of=as_of, include_ts=False)
    out_cols = staged.columns

    changed = find_changed_current(target, staged, key_col)
    expired = changed.select(
        *[F.col(f"t.{c}").alias(c) for c in out_cols if c not in ("valid_to", "iscurrent")],
        F.col("u.valid_from").alias("valid_to"),
        F.lit(0).cast("int").alias("iscurrent"),
    ).select(*out_cols)

    # Anti-join on (key, checksum, iscurrent) — changed rows all carry
    # t.iscurrent == 1, so only the matched CURRENT row is replaced. An
    # expired history row sharing the current row's (key, checksum) (a value
    # that reverted A->B->A across batches) is matched-but-clause-failed in
    # the reference MERGE and must survive untouched.
    expired_keys = changed.select(
        F.col(f"t.{key_col}").alias(key_col),
        F.col("t.checksum").alias("checksum"),
        F.col("t.iscurrent").alias("iscurrent"),
    )
    untouched = target.join(
        expired_keys, on=[key_col, "checksum", "iscurrent"], how="left_anti"
    )

    changed_staged = changed.select(*[F.col(f"u.{c}").alias(c) for c in out_cols])
    new_staged = staged.join(target, on=key_col, how="left_anti").select(*out_cols)
    inserts = changed_staged.unionByName(new_staged)

    return untouched.select(*out_cols).unionByName(expired).unionByName(inserts)


class MergeIntoBuilder:
    """Generic MERGE INTO on plain DataFrames (S10/S11 without the plugin).

    Mirrors the ``DeltaTable.merge()`` builder surface::

        result = (MergeIntoBuilder(target, source, on=cond)
                  .when_matched_update(condition=..., set={...})
                  .when_not_matched_insert_all()
                  .execute())

    Implementation: the MERGE decomposes into per-branch joins on the merge
    condition — inner (matched clauses, first-applicable ordering:
    UPDATE, then DELETE for rows failing the update condition), left-anti
    both ways (unmatched target rows / the insert clause), left-semi
    (matched pass-through when no matched clause is given). When a matched UPDATE/DELETE clause is present
    and more than one source row matches the same target row, evaluation
    raises (Delta's ``DELTA_MULTIPLE_SOURCE_ROW_MATCHING_TARGET_ROW_IN_MERGE``
    cardinality check) — enforced distributively via a per-target-row match
    count, no driver-side collect. ``with_cardinality_check(False)`` disables
    it (Spark-side cost: one extra window over the matched rows, sharing the
    join's hash partitioning when the merge condition is an equi-key).
    """

    def __init__(self, target: DataFrame, source: DataFrame, on: Column):
        self.target = target
        self.source = source
        self.on = on
        self._matched_update: tuple[Column | None, dict[str, Column]] | None = None
        self._matched_delete: Column | None = None
        self._insert_all = False
        self._insert_values: dict[str, Column] | None = None
        self._insert_cond: Column | None = None
        self._by_source_update: tuple[Column | None, dict[str, Column]] | None = None
        self._by_source_delete: Column | None = None
        self._check_cardinality = True

    def when_matched_update(self, set: dict[str, Column], condition: Column | None = None):
        self._matched_update = (condition, set)
        return self

    def when_matched_delete(self, condition: Column | None = None):
        self._matched_delete = condition if condition is not None else F.lit(True)
        return self

    def when_not_matched_insert_all(self, condition: Column | None = None):
        self._insert_all = True
        self._insert_cond = condition
        return self

    def when_not_matched_insert(
        self, values: dict[str, Column], condition: Column | None = None
    ):
        """Delta ``whenNotMatchedInsert(values=...)`` surface — explicit
        ``INSERT (cols) VALUES (exprs)``: each expression is evaluated over
        the unmatched SOURCE row; target columns absent from ``values`` get
        typed NULLs."""
        self._insert_values = values
        self._insert_cond = condition
        return self

    def when_not_matched_by_source_update(
        self, set: dict[str, Column], condition: Column | None = None
    ):
        """Delta 2.3+ surface: rewrite target rows with NO source match —
        the full-snapshot-sync clause (mark/expire rows that disappeared
        from the source feed)."""
        self._by_source_update = (condition, set)
        return self

    def when_not_matched_by_source_delete(self, condition: Column | None = None):
        """Delete target rows with no source match (full-sync semantics).
        Applied after the by-source update clause, Delta-style first-
        applicable-clause ordering."""
        self._by_source_delete = condition if condition is not None else F.lit(True)
        return self

    def with_cardinality_check(self, enabled: bool) -> "MergeIntoBuilder":
        """Delta exposes the same escape hatch as
        ``merge.resolvedMultipleSourceRowMatches`` semantics: disabling skips
        the per-target match-count window (duplicates then flow through the
        matched clause unflagged, like Hudi's default upsert)."""
        self._check_cardinality = enabled
        return self

    def execute(self) -> DataFrame:
        tcols = self.target.columns
        target = self.target
        # cardinality guard only matters when a matched clause rewrites rows:
        # >1 source match per target row would emit duplicate updated copies.
        guard = self._check_cardinality and (
            self._matched_update is not None or self._matched_delete is not None
        )
        if guard:
            target = target.withColumn("__tid", F.monotonically_increasing_id())
        t = target.alias("t")
        s = self.source.alias("s")

        matched = t.join(s, self.on, "inner")
        if guard:
            # Delta raises DELTA_MULTIPLE_SOURCE_ROW_MATCHING_TARGET_ROW_IN_MERGE
            # on >1 source row per target row; detected with a count window
            # over a per-row id — distributed, lazy (fires when the plan runs).
            n = F.count(F.lit(1)).over(Window.partitionBy("__tid"))
            matched = matched.withColumn(
                "__ok",
                F.when(
                    n > 1,
                    F.raise_error(
                        F.lit(
                            "MERGE INTO: multiple source rows matched a single "
                            "target row; make the ON condition unique or call "
                            "with_cardinality_check(False)"
                        )
                    ).cast("boolean"),
                ).otherwise(F.lit(True)),
            ).filter(F.col("__ok")).drop("__ok")

        # target rows with no source match: by-source clauses route them
        # (first applicable: update, then delete); default is pass-through
        untouched = t.join(s, self.on, "left_anti").select(*[F.col(c) for c in tcols])
        if self._by_source_update is not None:
            cond, set_map = self._by_source_update
            hit = (
                F.coalesce(cond.cast("boolean"), F.lit(False))
                if cond is not None
                else F.lit(True)
            )
            proj = [
                F.when(hit, set_map[c]).otherwise(F.col(c)).alias(c)
                if c in set_map
                else F.col(c)
                for c in tcols
            ]
            # rows taken by the update clause are not eligible for delete
            taken = untouched.filter(hit).select(*proj)
            rest = untouched.filter(~hit)
            if self._by_source_delete is not None:
                rest = rest.filter(
                    ~F.coalesce(self._by_source_delete.cast("boolean"), F.lit(False))
                )
            untouched = taken.unionByName(rest)
        elif self._by_source_delete is not None:
            untouched = untouched.filter(
                ~F.coalesce(self._by_source_delete.cast("boolean"), F.lit(False))
            )

        out = untouched
        if self._matched_update is not None:
            cond, set_map = self._matched_update
            upd = matched
            if cond is not None:
                upd = upd.filter(cond)
            proj = [
                set_map[c].alias(c) if c in set_map else F.col(f"t.{c}").alias(c)
                for c in tcols
            ]
            updated = upd.select(*proj)
            # Delta first-applicable-clause ordering: rows failing the
            # update condition fall through to a chained matched DELETE
            # (removed when ITS condition passes), and only rows failing
            # every matched clause pass through unchanged. With an
            # unconditional update the later delete is unreachable,
            # exactly as in Delta.
            if cond is not None:
                rest = matched.filter(~F.coalesce(cond, F.lit(False)))
                if self._matched_delete is not None:
                    rest = rest.filter(
                        ~F.coalesce(self._matched_delete, F.lit(False))
                    )
                kept = rest.select(*[F.col(f"t.{c}").alias(c) for c in tcols])
                updated = updated.unionByName(kept)
            out = out.unionByName(updated)
        elif self._matched_delete is not None:
            kept = matched.filter(~F.coalesce(self._matched_delete, F.lit(False))).select(
                *[F.col(f"t.{c}").alias(c) for c in tcols]
            )
            out = out.unionByName(kept)
        else:
            # no matched clause: matched target rows pass through ONCE each —
            # a semi-join, not the inner-join pairs (which would duplicate a
            # target row matched by several source rows in insert-only merges)
            out = out.unionByName(
                t.join(s, self.on, "left_semi").select(
                    *[F.col(c) for c in tcols]
                )
            )

        if self._insert_all or self._insert_values is not None:
            ins = s.join(t, self.on, "left_anti")
            if self._insert_cond is not None:
                ins = ins.filter(self._insert_cond)
            if self._insert_values is not None:
                proj = [
                    (
                        self._insert_values[c]
                        if c in self._insert_values
                        else F.lit(None)
                    ).alias(c)
                    for c in tcols
                ]
            else:
                scols = set(self.source.columns)
                proj = [
                    (F.col(c) if c in scols else F.lit(None)).alias(c) for c in tcols
                ]
            out = out.unionByName(ins.select(*proj))
        return out


def scd2_apply_deletes(
    target: DataFrame,
    delete_keys: DataFrame,
    key_col: str,
    as_of: str | None = None,
) -> DataFrame:
    """SCD2 soft delete: expire the current version of every key in
    ``delete_keys`` (set ``valid_to`` to the batch timestamp, ``iscurrent``
    to 0) without inserting a successor. History rows are untouched; the
    key simply stops having a current version — the retention-friendly
    delete the reference's pipelines lack (their MERGE has no
    WHEN MATCHED DELETE clause).
    """
    ts = load_timestamp(as_of)
    keys = delete_keys.select(key_col).distinct()
    is_target = (F.col("iscurrent") == 1) & F.col("__del").isNotNull()
    marked = target.join(
        F.broadcast(keys.withColumn("__del", F.lit(1))), on=key_col, how="left"
    )
    return (
        marked.withColumn(
            "valid_to", F.when(is_target, ts).otherwise(F.col("valid_to"))
        )
        .withColumn(
            "iscurrent",
            F.when(is_target, F.lit(0)).otherwise(F.col("iscurrent")).cast("int"),
        )
        .drop("__del")
    )
