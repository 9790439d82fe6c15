"""Hudi CHANGE DATA CAPTURE — before/after-image change records per
commit, completing the trio's row-level CDC surface beside Delta's
Change Data Feed (delta_cdf.py) and the Iceberg changelog
(iceberg_changelog.py).

Hudi 0.13 ships CDC (``hoodie.table.cdc.enabled``) emitting per-commit
change records with op ∈ {i, u, d} plus before/after images. The
reference's Hudi leg (hudi/hudi_scd_script.py) runs on a runtime where
that feature is a table config. BOTH of Hudi's modes live here:

* **Persisted supplemental logging** (r12, the table config's real
  behavior): a table opened/created with ``cdc_enabled=True`` stamps
  ``hoodie.table.cdc.enabled=true`` into hoodie.properties, and every
  logical-row-changing commit materializes its change records ONCE, at
  commit time (the before-state is already at hand), into a
  ``cdc/<instant>/`` parquet directory. ``cdc_scan`` over a K-commit
  range then just reads K change files — linear in changed rows, no
  per-commit state re-derivation, and immune to the cleaner retiring
  the old slices inference would need.
* **Inference** (r11): re-derived from the layout itself — the commit
  metadata names the TOUCHED file groups, and any group's state at the
  previous instant is reconstructable from the timeline (Hudi calls
  this ``op_key_only``/``data_before_after`` inference — this is the
  ``data_before_after`` shape). The fallback for pre-CDC history and
  for a commit whose persist was interrupted.

Both modes share one derivation (``_commit_events``), so persisted ==
inferred by construction; tests pin the equality and that a multi-
commit scan over a CDC-enabled table reads ONLY ``cdc/`` files.

``cdc_scan(begin_instant, end_instant=None)`` returns the table's data
columns decorated with

* ``_change_type`` ∈ {insert, delete, update_before, update_after} —
  Delta-CDF-shaped, one ROW per image (an UPDATE emits its old and new
  versions as two rows, the "update before/after rows" contract);
* ``_commit_instant`` — the timeline instant that committed the change.

Event derivation per commit ``t`` (exclusive ``begin``, inclusive
``end``):

* rows in t's touched groups stamped ``_hoodie_commit_time == t``
  (Hudi stamps only actually-written rows with the new instant;
  carried-over rows in a rewritten CoW slice keep their old stamp —
  the same property ``read_incremental`` relies on) are the WRITTEN
  set: keys absent from the previous state → ``insert``, keys present
  → ``update_after`` plus the prior version as ``update_before``;
* keys present in the previous state of the touched groups but absent
  from the commit's snapshot → ``delete`` (before image) — covers CoW
  rewrites and winning MoR tombstones alike;
* maintenance instants (CLUSTER replacecommits, COMPACT commits)
  change no logical row and emit NOTHING.

Scale: per commit the work is bounded by the file groups that commit
touched — the timeline names them, so untouched groups cost nothing;
the diff is a handful of key joins over those groups only. A year of
history replays as a union of per-commit slices, never a table-sized
diff. MoR group state reuses the snapshot merge (one key shuffle over
the hot groups).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from .hudi_layout import HudiCowTable, HudiMorTable

CHANGE_TYPE = "_change_type"
COMMIT_INSTANT = "_commit_instant"

#: instants that change no logical row
_NON_LOGICAL_OPS = {"CLUSTER", "COMPACT"}


def _data_cols(df: DataFrame) -> list[str]:
    return [
        c
        for c in df.columns
        if not c.startswith("_hoodie_") and c != "__fg"
    ]


def _cow_group_state(
    self: HudiCowTable, instant: str, fgs: set[int]
) -> DataFrame | None:
    """Snapshot rows of the given file groups at ``instant`` — CoW
    reads exactly those groups' base files, nothing else."""
    slices = {
        k: p
        for k, p in self._file_slices(instant).items()
        if self._fg_of(k[1]) in fgs
    }
    if not slices:
        return None
    return self._read_slices(slices)


def _mor_group_state(
    self: HudiMorTable, instant: str, fgs: set[int]
) -> DataFrame | None:
    """Snapshot rows of the given file groups at ``instant`` for MoR:
    the regular snapshot merge (base ∪ logs, tombstones folded) run
    over ONLY the touched groups' slices — untouched groups' base and
    log files never enter the plan (the module's scale contract)."""
    slices = {
        k: s
        for k, s in self._mor_slices(instant).items()
        if self._fg_of(k[1]) in fgs
    }
    if not slices:
        return None
    return self._merged_read(slices)


def _group_state(self, instant, fgs):
    if isinstance(self, HudiMorTable):
        return _mor_group_state(self, instant, fgs)
    return _cow_group_state(self, instant, fgs)


def _stamp(df: DataFrame, kind: str, instant: str) -> DataFrame:
    return df.select(*_data_cols(df)).withColumn(
        CHANGE_TYPE, F.lit(kind)
    ).withColumn(COMMIT_INSTANT, F.lit(instant))


def _commit_events(
    self: HudiCowTable, t: str, insts: list[str]
) -> list[DataFrame]:
    """The per-commit event derivation (inference mode): the stamped
    insert / update_before / update_after / delete frames for commit
    ``t``, bounded by the file groups that commit touched. Shared
    VERBATIM by the range scan (inference fallback) and the write-time
    persist hook, so persisted ``.cdc`` files equal inference by
    construction."""
    key = self.record_key
    meta = self._commit_meta(t)
    if meta.get("operationType") in _NON_LOGICAL_OPS:
        return []
    fgs = {
        self._fg_of(st["fileId"])
        for stats in meta["partitionToWriteStats"].values()
        for st in stats
    }
    if not fgs:
        return []
    prior = [x for x in insts if x < t]
    prev = prior[-1] if prior else None
    events: list[DataFrame] = []
    cur_all = _group_state(self, t, fgs)
    if cur_all is None:
        cur_all_keys = None
        written = None
    else:
        cur_all_keys = cur_all.select(key)
        written = cur_all.filter(
            F.col("_hoodie_commit_time") == t
        )
    before_all = (
        _group_state(self, prev, fgs) if prev is not None else None
    )
    if before_all is None:
        if written is not None:
            events.append(_stamp(written, "insert", t))
        return events
    written_keys = (
        written.select(key) if written is not None else None
    )
    if written is not None:
        events.append(
            _stamp(
                written.join(
                    before_all.select(key), key, "left_anti"
                ),
                "insert",
                t,
            )
        )
        events.append(
            _stamp(
                written.join(
                    before_all.select(key), key, "left_semi"
                ),
                "update_after",
                t,
            )
        )
        events.append(
            _stamp(
                before_all.join(written_keys, key, "left_semi"),
                "update_before",
                t,
            )
        )
    deletes = (
        before_all
        if cur_all_keys is None
        else before_all.join(cur_all_keys, key, "left_anti")
    )
    events.append(_stamp(deletes, "delete", t))
    return events


def _cdc_dir(self: HudiCowTable, instant: str) -> str:
    return os.path.join(self.location, "cdc", instant)


def _has_persisted_cdc(self: HudiCowTable, instant: str) -> bool:
    """A supplemental change file is usable only when its write
    FINISHED — the committer's _SUCCESS marker is the gate; a crash
    between the commit and the CDC persist (or mid-persist) leaves an
    absent/markerless dir and the scan falls back to inference."""
    return os.path.exists(os.path.join(_cdc_dir(self, instant), "_SUCCESS"))


def _persist_cdc(self: HudiCowTable, instant: str) -> None:
    """Write the commit's change records as a supplemental parquet
    directory under ``cdc/<instant>/`` — Hudi 0.13's PERSISTED CDC
    mode (``hoodie.table.cdc.enabled`` with ``data_before_after``
    supplemental logging): the change rows are materialized ONCE, at
    write time, while the before-state is sitting right there; a
    K-commit ``cdc_scan`` then reads K change files directly instead
    of re-deriving K before-states from the timeline (the r11
    inference mode's O(K) re-merge of hot groups). Write cost is one
    extra scoped read+join of the touched groups per commit — the same
    price real Hudi pays for supplemental logging."""
    events = _commit_events(self, instant, self.instants())
    if not events:
        return
    out = events[0]
    for e in events[1:]:
        out = out.unionByName(e, allowMissingColumns=True)
    out.write.mode("overwrite").parquet(_cdc_dir(self, instant))


_orig_commit = HudiCowTable._commit


def _commit_with_cdc(
    self,
    instant,
    stats,
    suffix=".commit",
    operation="UPSERT",
    top_level=None,
):
    """``_commit`` wrapper (attached below): after the instant file
    lands atomically, a CDC-enabled table persists the commit's change
    records. The commit is already durable when the persist starts —
    a crash in between degrades that one commit to inference, never
    to a lost commit or a torn change file (``_SUCCESS``-gated)."""
    _orig_commit(
        self, instant, stats,
        suffix=suffix, operation=operation, top_level=top_level,
    )
    if (
        getattr(self, "cdc_enabled", False)
        and operation not in _NON_LOGICAL_OPS
    ):
        _persist_cdc(self, instant)


def _cdc_scan(
    self: HudiCowTable,
    begin_instant: str,
    end_instant: str | None = None,
    use_persisted: bool = True,
) -> DataFrame:
    """Row-level change events for commits strictly AFTER
    ``begin_instant`` up to and including ``end_instant`` (default:
    the head). Commits with a persisted ``cdc/<instant>/`` supplemental
    file (written at commit time on CDC-enabled tables) are answered by
    READING that file — no before-state re-derivation, so a year-long
    range is linear in changed rows; commits without one (pre-CDC
    history, or a crash between commit and persist) fall back to the
    timeline inference, per commit. ``use_persisted=False`` forces
    inference everywhere (the parity knob the tests pin persisted ==
    inferred with). See module doc."""
    insts = self.instants()
    later = [
        t
        for t in insts
        if t > begin_instant
        and (end_instant is None or t <= end_instant)
    ]
    events: list[DataFrame] = []
    for t in later:
        if use_persisted and _has_persisted_cdc(self, t):
            events.append(self.spark.read.parquet(_cdc_dir(self, t)))
        else:
            events.extend(_commit_events(self, t, insts))
    if not events:
        return _stamp(
            self.read().filter(F.lit(False)), "insert", ""
        ).filter(F.lit(False))
    out = events[0]
    for e in events[1:]:
        out = out.unionByName(e, allowMissingColumns=True)
    return out


HudiCowTable.cdc_scan = _cdc_scan
HudiCowTable._commit = _commit_with_cdc


def attach() -> None:
    """Import-time attach is the contract (mirrors hudi_maintenance)."""
