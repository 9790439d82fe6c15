"""Hudi SAVEPOINT / RESTORE and CLUSTERING on the from-scratch layout
(hudi_layout.py) — the table services real Hudi runs via
spark-submit'd procedures (the reference's Hudi leg ships the runtime
bundle, hudi/hudi_submit.sh), re-derived here from Hudi's public
timeline semantics:

* ``savepoint(instant=None)`` writes ``<instant>.savepoint`` to the
  timeline pinning the instant's full file set: the CLEANER skips
  every pinned file (hudi_layout._clean consults it), so the instant
  stays restorable no matter how far retention advances.
* ``restore(instant)`` rolls the TABLE back: every later timeline
  action is removed and the data files those commits wrote are
  deleted (paths embed their writing instant, so later files are
  disjoint from the restore target's). Restore requires a savepoint
  at the target — Hudi's own contract, because without the pin the
  cleaner may already have dropped the target's slices.
* ``cluster(n_file_groups, sort_by=None)`` is Hudi clustering as a
  REPLACECOMMIT: the whole table re-buckets into ``n_file_groups``
  fresh base files (optionally sorted within each group — sort
  clustering), the commit's ``replacedFileGroups`` retires every old
  group, and the hash upsert routing follows the new group count
  (hoodie.properties rewritten). Readers replay replacecommits like
  any instant, so time travel BEFORE the clustering still sees the
  old layout; MoR tables must compact first (log files cannot be
  re-bucketed — refused loudly).

Scale: savepoint/restore are timeline metadata plus O(files-to-drop)
deletes; clustering is one full-table rewrite (that is its job) as a
single repartition-by-group write — the shuffle IS the re-bucketing,
nothing driver-side but the commit metadata.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from .hudi_layout import HudiCowTable, HudiMorTable

_META_COLS = (
    "_hoodie_commit_time",
    "_hoodie_record_key",
    "_hoodie_partition_path",
    "_hoodie_file_name",
    "_hoodie_is_deleted",
)


def _savepoint_path(self, instant: str) -> str:
    return os.path.join(self.hoodie, f"{instant}.savepoint")


def _savepoint_meta(self, instant: str) -> dict:
    with open(_savepoint_path(self, instant)) as f:
        return json.load(f)


def _savepoints(self) -> list[str]:
    return sorted(
        f[: -len(".savepoint")]
        for f in os.listdir(self.hoodie)
        if f.endswith(".savepoint")
    )


def _live_files_at(self, instant: str) -> list[str]:
    """Every relative data path a snapshot read at ``instant`` can
    touch (bases; plus logs on MoR)."""
    if isinstance(self, HudiMorTable):
        out: list[str] = []
        for s in self._mor_slices(instant).values():
            if s["base"]:
                out.append(s["base"])
            out.extend(s["logs"])
        return sorted(set(out))
    return sorted(set(self._file_slices(instant).values()))


def _savepoint(self, instant: str | None = None) -> str:
    """Pin an instant (default: the latest commit) against cleaning,
    making it a RESTORE target. Idempotent per instant."""
    instants = self.instants()
    if not instants:
        raise ValueError("empty timeline: nothing to savepoint")
    instant = instant or instants[-1]
    if instant not in instants:
        raise ValueError(
            f"instant {instant} not on the timeline (have {instants})"
        )
    path = _savepoint_path(self, instant)
    if os.path.exists(path):
        return instant
    meta = {
        "savepointedAt": int(time.time() * 1000),
        "instant": instant,
        "preservedFiles": _live_files_at(self, instant),
    }
    tmp = path + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, path)
    return instant


def _delete_savepoint(self, instant: str) -> None:
    path = _savepoint_path(self, instant)
    if not os.path.exists(path):
        raise ValueError(f"no savepoint at {instant}")
    os.remove(path)


def _restore(self, instant: str) -> str:
    """Roll the table back to a SAVEPOINTED instant: later timeline
    actions are removed, their data files deleted, later savepoints
    dropped; a ``.restore`` audit marker records the operation (it is
    not a replayed action). Time travel to the removed instants fails
    loudly afterwards — they no longer exist, the restore trade."""
    if not os.path.exists(_savepoint_path(self, instant)):
        raise ValueError(
            f"restore target {instant} has no savepoint — the cleaner "
            "may have dropped its files; savepoint() instants before "
            "restoring to them"
        )
    later = [t for t in self.instants() if t > instant]
    keep = set(_live_files_at(self, instant))
    doomed: set[str] = set()
    for t in later:
        meta = self._commit_meta(t)
        for _part, stats in meta["partitionToWriteStats"].items():
            doomed.update(st["path"] for st in stats)
    # plan-then-execute ordering (Hudi's restore protocol; r10 advisor:
    # deleting data files BEFORE their timeline instants left a crash
    # window where the head still referenced deleted files):
    # 1. the restore marker/plan lands first (atomic rename) — a crash
    #    after this point leaves a recoverable record of intent;
    marker = {
        "restoredTo": instant,
        "removedInstants": later,
        "restoredAt": int(time.time() * 1000),
    }
    mpath = os.path.join(self.hoodie, f"{self._next_instant()}.restore")
    tmp = mpath + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(marker, f)
    os.replace(tmp, mpath)
    # 2. remove the later timeline actions — from here on the head IS
    #    the restore target and every read is consistent;
    for t in later:
        for suf in self.INSTANT_SUFFIXES:
            p = os.path.join(self.hoodie, f"{t}{suf}")
            if os.path.exists(p):
                os.remove(p)
        sp = _savepoint_path(self, t)
        if os.path.exists(sp):
            os.remove(sp)
    # 3. only then delete the now-UNREFERENCED data files — a crash
    #    here orphans files (fsck/cleaner territory), never breaks reads
    for rel in sorted(doomed - keep):
        full = os.path.join(self.location, rel)
        if os.path.exists(full):
            os.remove(full)
    return instant


def _rewrite_properties(self) -> None:
    props = os.path.join(self.hoodie, "hoodie.properties")
    tmp = props + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        f.write(f"hoodie.table.type={self.TABLE_TYPE}\n")
        f.write(f"hoodie.table.recordkey.fields={self.record_key}\n")
        f.write(
            f"hoodie.table.precombine.field={self.precombine_field}\n"
        )
        f.write(f"n.file.groups={self.n_file_groups}\n")
        if getattr(self, "cdc_enabled", False):
            f.write("hoodie.table.cdc.enabled=true\n")
            f.write(
                "hoodie.table.cdc.supplemental.logging.mode="
                "data_before_after\n"
            )
    os.replace(tmp, props)


def _cluster(
    self, n_file_groups: int, sort_by: list[str] | None = None
) -> str:
    """Re-bucket the table into ``n_file_groups`` file groups (one
    REPLACECOMMIT), optionally sorting rows within each new base file.
    Subsequent upserts hash into the new group count."""
    if n_file_groups < 1:
        raise ValueError("n_file_groups must be >= 1")
    if isinstance(self, HudiMorTable):
        if any(s["logs"] for s in self._mor_slices().values()):
            raise ValueError(
                "clustering a MoR table with unfolded log files is "
                "not supported: run compact() first (log files merge "
                "by record key; re-bucketing them would break the "
                "key->group routing mid-slice)"
            )
        old_live = {
            k: s["base"] for k, s in self._mor_slices().items()
        }
    else:
        old_live = self._file_slices()
    # clustering changes the LAYOUT, not the records: every row keeps
    # its _hoodie_commit_time / record key (real Hudi's contract —
    # incremental and CDC consumers must not see a rewrite-only
    # replacecommit as table-wide change). Only the stale file-name
    # column drops; __fg re-derives under the new group count below.
    data = self.read().drop("_hoodie_file_name")
    instant = self._next_instant()
    # the data write and the atomic .replacecommit land FIRST; only a
    # successful commit republishes hoodie.properties (r10 advisor: the
    # old order rewrote the routing count before the write, so a
    # mid-cluster failure left upserts hashing into groups that do not
    # exist — a key could land in a second file group and duplicate)
    old_n = self.n_file_groups
    self.n_file_groups = n_file_groups
    try:
        prepared = data.withColumn("__fg", self._file_group_expr())
        sort_cols = list(sort_by or [self.record_key])
        stats = self._write_groups(
            prepared,
            instant,
            list(range(n_file_groups)),
            sort_within=sort_cols,
        )
        self._commit(
            instant,
            stats,
            suffix=".replacecommit",
            operation="CLUSTER",
            top_level={
                "replacedFileGroups": [
                    [part, fid] for (part, fid) in sorted(old_live)
                ],
                "clusteringSortColumns": sort_cols,
                # the routing count rides the ATOMIC commit (r11):
                # table open reconciles hoodie.properties against it,
                # closing the commit-then-crash-before-properties
                # window entirely
                "newFileGroupCount": n_file_groups,
            },
        )
    except BaseException:
        self.n_file_groups = old_n  # routing stays on the live groups
        raise
    _rewrite_properties(self)
    return instant


def _timeline_df(self):
    """The timeline as a DataFrame — Hudi's ``show commits`` /
    timeline CLI surface: one row per action (commits, deltacommits,
    replacecommits, savepoints, restores) with its operation and
    write-stat volume. Metadata-sized (one JSON per action)."""
    rows = []
    for f in sorted(os.listdir(self.hoodie)):
        for suf in (*self.INSTANT_SUFFIXES, ".savepoint", ".restore"):
            if not f.endswith(suf):
                continue
            instant = f[: -len(suf)]
            with open(os.path.join(self.hoodie, f)) as fh:
                meta = json.load(fh)
            n_files = sum(
                len(v)
                for v in meta.get("partitionToWriteStats", {}).values()
            )
            rows.append(
                (
                    instant,
                    suf[1:],
                    meta.get("operationType"),
                    n_files,
                )
            )
            break
    return self.spark.createDataFrame(
        rows,
        "instant string, action string, operation string, n_files int",
    )


def _file_slices_df(self):
    """Current live file slices as a DataFrame — the metadata-table
    FILES view: (partition, file_id, base_path, log_paths)."""
    if isinstance(self, HudiMorTable):
        slices = self._mor_slices()
        rows = [
            (part, fid, s["base"], s["logs"])
            for (part, fid), s in sorted(slices.items())
        ]
    else:
        rows = [
            (part, fid, path, [])
            for (part, fid), path in sorted(self._file_slices().items())
        ]
    return self.spark.createDataFrame(
        rows,
        "partition string, file_id string, base_path string, "
        "log_paths array<string>",
    )


def attach() -> None:
    for cls in (HudiCowTable, HudiMorTable):
        cls.timeline_df = _timeline_df
        cls.file_slices_df = _file_slices_df
        cls.savepoint = _savepoint
        cls.savepoints = _savepoints
        cls.delete_savepoint = _delete_savepoint
        cls._savepoint_meta = _savepoint_meta
        cls.restore = _restore
        cls.cluster = _cluster


attach()
