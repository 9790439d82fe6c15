"""Iceberg CHANGELOG scan — row-level change events between snapshots,
derived from MANIFEST deltas (never a full-table diff), completing the
trio's CDC surface beside Delta's Change Data Feed (delta_cdf.py) and
Hudi's incremental pull (hudi_layout.read_incremental).

``changes(from_snapshot_id, to_snapshot_id=None)`` returns the table's
rows decorated with ``_change_type`` ('insert' | 'delete') and
``_commit_snapshot_id``, one event stream per snapshot in the range
(exclusive ``from``, inclusive ``to``), exactly what Iceberg's
create_changelog_view procedure serves:

* data files ADDED by a snapshot -> their rows as ``insert`` events;
* data files REMOVED (overwrite/replace) -> the rows that were LIVE at
  the parent snapshot (position/equality deletes applied) as
  ``delete`` events;
* POSITION-delete files added -> exactly the (file, pos) rows they
  name, read back from their data files, as ``delete`` events (a MoR
  UPDATE therefore emits its delete+insert pair);
* EQUALITY-delete files added -> the parent-state rows matching the
  key set (null-safe, like the read path) as ``delete`` events;
* maintenance snapshots (rewrite_data_files stamps
  ``summary.maintenance``) change no logical row and emit NOTHING.

All events surface under the CURRENT schema (field-id alignment, the
same rename-safe projection reads use) so consumers see one stable
shape across schema evolution — Delta CDF's convention.

Scale: per snapshot the work is bounded by what that snapshot touched
— added files scan only themselves, removed files scan only
themselves, delete events read only the files the delete names (the
pair join broadcasts under the same 2M-pair threshold as reads). A
year of history replays as a union of per-commit slices, never a
table-sized diff.

Reference parity: the reference's Iceberg runtime exposes this as
``CALL system.create_changelog_view`` (iceberg/iceberg_submit.sh
ships iceberg-spark-runtime); re-derived here from the spec's
manifest/sequence-number model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .iceberg_layout import (
    CONTENT_EQ_DELETES,
    CONTENT_POS_DELETES,
    STATUS_ADDED,
    STATUS_DELETED,
    IcebergTable,
    _spark_struct_of,
    _spark_type_str,
    entry_schema_id,
    ice_schema_by_id,
)

CHANGE_TYPE = "_change_type"
COMMIT_SNAPSHOT = "_commit_snapshot_id"


def _aligned_raw_scan(
    self, md: dict, entries: list[dict], target_sid: int,
    with_pos: bool = False,
):
    """Field-id-aligned scan of specific data files with NO deletes
    applied (changelogs decide delete semantics themselves), optionally
    carrying (__cl_file, __cl_pos) for pair joins."""
    target = ice_schema_by_id(md, target_sid)
    groups: dict[int, list[dict]] = {}
    for e in entries:
        groups.setdefault(entry_schema_id(md, e), []).append(e)
    parts = []
    for sid in sorted(groups):
        ice = ice_schema_by_id(md, sid)
        by_id = {f["id"]: f["name"] for f in ice["fields"]}
        cols = []
        for f in target["fields"]:
            t = _spark_type_str(f["type"])
            nm = by_id.get(f["id"])
            cols.append(
                F.lit(None).cast(t).alias(f["name"])
                if nm is None
                else F.col(nm).cast(t).alias(f["name"])
            )
        paths = [e["data_file"]["file_path"] for e in groups[sid]]
        if not with_pos:
            parts.append(
                self.spark.read.schema(_spark_struct_of(ice))
                .parquet(*paths)
                .select(*cols)
            )
            continue
        # r11: pair joins key on the file BASENAME (fresh writer
        # UUIDs — the same contract as _scan_files), so even the
        # delete-named files ride ONE multi-path scan per schema
        # group instead of O(files) plan pieces; the pairs side
        # reduces its stored path to a basename too
        parts.append(
            self.spark.read.schema(_spark_struct_of(ice))
            .parquet(*paths)
            .select(
                *cols,
                F.element_at(
                    F.split(F.col("_metadata.file_path"), "/"), -1
                ).alias("__cl_file"),
                F.col("_metadata.row_index").alias("__cl_pos"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _empty_events(self, md: dict, target_sid: int) -> DataFrame:
    base = _spark_struct_of(ice_schema_by_id(md, target_sid))
    schema = base.add(CHANGE_TYPE, "string").add(COMMIT_SNAPSHOT, "long")
    return self.spark.createDataFrame([], schema)


def _changes(
    self,
    from_snapshot_id: int,
    to_snapshot_id: int | None = None,
) -> DataFrame:
    """Row-level change events for snapshots AFTER ``from`` up to and
    including ``to`` (default: the current head). See module doc."""
    md = self._metadata()
    by_id = {s["snapshot-id"]: s for s in md["snapshots"]}
    if from_snapshot_id not in by_id:
        raise ValueError(f"unknown snapshot {from_snapshot_id}")
    if to_snapshot_id is None:
        to_snapshot_id = md["current-snapshot-id"]
    if to_snapshot_id not in by_id:
        raise ValueError(f"unknown snapshot {to_snapshot_id}")
    # walk PARENT-SNAPSHOT ANCESTRY from `to` back to `from`, never
    # metadata-list position: an unpublished branch snapshot
    # (append_to_branch) sits in the snapshot list inside the range
    # but is NOT on main's lineage — positional iteration leaked its
    # rows as 'insert' events to CDC consumers (r10 advisor finding)
    chain: list[int] = []
    cur = to_snapshot_id
    seen: set[int] = set()
    while (
        cur is not None
        and cur != from_snapshot_id
        and cur not in seen
    ):
        chain.append(cur)
        seen.add(cur)
        cur = by_id.get(cur, {}).get("parent-snapshot-id")
    if cur != from_snapshot_id:
        raise ValueError(
            f"snapshot {from_snapshot_id} is not an ancestor of "
            f"{to_snapshot_id} — changelog ranges must follow one "
            "lineage (branch snapshots surface on main only after "
            "publish/fast_forward)"
        )
    chain.reverse()  # oldest -> newest, exclusive of `from`
    # events surface under the CURRENT schema (not the head snapshot's
    # write-time schema — metadata-only renames add no snapshot)
    target_sid = md.get(
        "current-schema-id", md["schema"].get("schema-id", 0)
    )
    from .iceberg_deletes import POS_DELETE_BROADCAST_MAX_PAIRS

    events: list[DataFrame] = []

    def stamp(df: DataFrame, kind: str, sid: int) -> DataFrame:
        return df.withColumn(CHANGE_TYPE, F.lit(kind)).withColumn(
            COMMIT_SNAPSHOT, F.lit(sid)
        )

    prev = from_snapshot_id
    for sid in chain:
        snap = by_id[sid]
        parent = snap.get("parent-snapshot-id", prev)
        prev = sid
        if snap.get("summary", {}).get("maintenance"):
            continue  # rewrites change no logical row
        cur_entries = [
            e
            for e in self._entries(sid)
            if e["status"] != STATUS_DELETED
        ]
        par_entries = [
            e
            for e in self._entries(parent)
            if e["status"] != STATUS_DELETED
        ]
        cur_paths = {e["data_file"]["file_path"] for e in cur_entries}
        par_paths = {e["data_file"]["file_path"] for e in par_entries}
        # inserts: files this snapshot ADDED
        added = [
            e
            for e in cur_entries
            if e["status"] == STATUS_ADDED
            and e["snapshot_id"] == sid
            and e["data_file"]["file_path"] not in par_paths
        ]
        if added:
            events.append(
                stamp(
                    _aligned_raw_scan(self, md, added, target_sid),
                    "insert",
                    sid,
                )
            )
        # deletes from removed files: their parent-LIVE rows
        removed = [
            e
            for e in par_entries
            if e["data_file"]["file_path"] not in cur_paths
        ]
        if removed:
            pos_p = self._live_delete_files(parent)
            eq_p = self._live_eq_delete_entries(parent)
            if eq_p:
                live_rows = self._scan_with_eq_deletes(
                    removed, pos_p, eq_p, target_sid
                )
            else:
                live_rows = self._aligned_scan(
                    md, removed, pos_p, target_sid
                )
            events.append(stamp(live_rows, "delete", sid))
        # deletes from NEW position-delete files: exactly their pairs
        new_pos = [
            e["data_file"]
            for e in self._entries(sid, content=CONTENT_POS_DELETES)
            if e["status"] == STATUS_ADDED
            and e["snapshot_id"] == sid
            and e["data_file"].get("content", CONTENT_POS_DELETES)
            == CONTENT_POS_DELETES
        ]
        if new_pos:
            # both join sides key on BASENAME (r11 — see
            # _aligned_raw_scan): one multi-path scan, no per-file
            # plan pieces, no path-spelling sensitivity
            pairs = self.spark.read.parquet(
                *[d["file_path"] for d in new_pos]
            ).select(
                F.element_at(
                    F.split(F.col("file_path"), "/"), -1
                ).alias("__cl_file"),
                F.col("pos").alias("__cl_pos"),
            )
            hit_names = {
                r["__cl_file"]
                for r in pairs.select("__cl_file").distinct().collect()
            }
            import os as _os

            hit_entries = [
                e
                for e in par_entries
                if _os.path.basename(e["data_file"]["file_path"])
                in hit_names
            ]
            if hit_entries:
                rows = _aligned_raw_scan(
                    self, md, hit_entries, target_sid, with_pos=True
                )
                total = sum(d.get("record_count", 0) for d in new_pos)
                if total <= POS_DELETE_BROADCAST_MAX_PAIRS:
                    pairs = F.broadcast(pairs)
                hit_rows = rows.join(
                    pairs, ["__cl_file", "__cl_pos"], "left_semi"
                ).drop("__cl_file", "__cl_pos")
                events.append(stamp(hit_rows, "delete", sid))
        # deletes from NEW equality-delete files: parent rows matching
        # the key set (null-safe, the read path's semantics)
        new_eq = [
            e
            for e in self._entries(sid, content=CONTENT_POS_DELETES)
            if e["status"] == STATUS_ADDED
            and e["snapshot_id"] == sid
            and e["data_file"].get("content") == CONTENT_EQ_DELETES
        ]
        for e in new_eq:
            cols = self._eq_cols_of(md, e)
            keys = (
                self.spark.read.parquet(e["data_file"]["file_path"])
                .toDF(*cols)
                .dropDuplicates()
                .alias("__clk")
            )
            if (
                e["data_file"].get("record_count", 0)
                <= POS_DELETE_BROADCAST_MAX_PAIRS
            ):
                keys = F.broadcast(keys)
            # parent state aligned to the CURRENT schema (read() would
            # surface the parent snapshot's own names — a later rename
            # would then break the event union; _eq_cols_of already
            # resolves key names through the current schema)
            pos_p = self._live_delete_files(parent)
            eq_p = self._live_eq_delete_entries(parent)
            if eq_p:
                parent_state = self._scan_with_eq_deletes(
                    par_entries, pos_p, eq_p, target_sid
                ).alias("__clt")
            else:
                parent_state = self._aligned_scan(
                    md, par_entries, pos_p, target_sid
                ).alias("__clt")
            cond = None
            for c in cols:
                piece = F.col(f"__clt.{c}").eqNullSafe(
                    F.col(f"__clk.{c}")
                )
                cond = piece if cond is None else (cond & piece)
            events.append(
                stamp(
                    parent_state.join(keys, cond, "left_semi"),
                    "delete",
                    sid,
                )
            )
    if not events:
        return _empty_events(self, md, target_sid)
    out = events[0]
    for e in events[1:]:
        out = out.unionByName(e)
    return out


IcebergTable.changes = _changes
