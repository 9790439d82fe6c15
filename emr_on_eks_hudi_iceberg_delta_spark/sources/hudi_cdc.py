"""Hudi CHANGE DATA CAPTURE — before/after-image change records per
commit, completing the trio's row-level CDC surface beside Delta's
Change Data Feed (delta_cdf.py) and the Iceberg changelog
(iceberg_changelog.py).

Hudi 0.13 ships CDC (``hoodie.table.cdc.enabled``) emitting per-commit
change records with op ∈ {i, u, d} plus before/after images. The
reference's Hudi leg (hudi/hudi_scd_script.py) runs on a runtime where
that feature is a table config; re-derived here from the layout itself
— the commit metadata names the TOUCHED file groups, and any group's
state at the previous instant is reconstructable from the timeline, so
no persisted ``.cdc`` supplemental files are needed (Hudi calls this
inference mode ``op_key_only``/``data_before_after`` — this is the
``data_before_after`` shape).

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


def _cdc_scan(
    self: HudiCowTable,
    begin_instant: str,
    end_instant: str | None = None,
) -> DataFrame:
    """Row-level change events for commits strictly AFTER
    ``begin_instant`` up to and including ``end_instant`` (default:
    the head). See module doc."""
    insts = self.instants()
    later = [
        t
        for t in insts
        if t > begin_instant
        and (end_instant is None or t <= end_instant)
    ]
    key = self.record_key
    events: list[DataFrame] = []
    for t in later:
        meta = self._commit_meta(t)
        if meta.get("operationType") in _NON_LOGICAL_OPS:
            continue
        fgs = {
            self._fg_of(st["fileId"])
            for stats in meta["partitionToWriteStats"].values()
            for st in stats
        }
        if not fgs:
            continue
        prior = [x for x in insts if x < t]
        prev = prior[-1] if prior else None
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
            continue
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
    if not events:
        return _stamp(
            self.read().filter(F.lit(False)), "insert", ""
        ).filter(F.lit(False))
    out = events[0]
    for e in events[1:]:
        out = out.unionByName(e, allowMissingColumns=True)
    return out


HudiCowTable.cdc_scan = _cdc_scan


def attach() -> None:
    """Import-time attach is the contract (mirrors hudi_maintenance)."""
