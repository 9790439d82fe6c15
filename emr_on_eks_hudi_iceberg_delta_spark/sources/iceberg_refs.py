"""Iceberg REFS — named branches and tags in table metadata (spec
§Snapshot References) plus the write-audit-publish (WAP) workflow they
exist for, on the from-scratch layout (iceberg_layout.py).

The metadata's ``refs`` map names snapshots: ``{"name":
{"snapshot-id": N, "type": "branch" | "tag"}}``. ``main`` is implicit
(the ``current-snapshot-id``). Implemented:

* ``create_tag / create_branch`` — metadata-only commits pinning a
  snapshot under a name; ``drop_ref`` removes one; ``refs()`` lists.
* ``read_ref(name)`` — snapshot read at the ref (tags for audits and
  reproducible training runs; branches for staging).
* ``append_to_branch(df, branch)`` — a REAL commit whose snapshot
  advances ONLY the branch head: carried data/delete manifests come
  from the branch's head (not main), the snapshot records its
  ``parent-snapshot-id``, the table's ``current-snapshot-id`` does
  not move — readers of main never see staged data.
* ``fast_forward(branch)`` — the PUBLISH step: verified as a true
  fast-forward (main's head must be an ancestor of the branch head
  via the parent chain — anything else would silently drop main
  commits), then main moves to the branch head, metadata-only.
* ``expire_snapshots`` keeps every ref-named snapshot alive (a tag is
  a retention pin — iceberg_layout._expire_snapshots consults refs).

Write-audit-publish = create_branch → append_to_branch → validate via
``read_ref`` → fast_forward. The staged snapshot is ordinary table
state (sequence numbers advance globally), so deletes/upserts staged
on a branch behave exactly as they will on main after publish.

Reference parity: the reference's Iceberg runtime provides branch
writes via ``spark.wap.branch`` / ``ALTER TABLE CREATE BRANCH``
(iceberg/iceberg_submit.sh ships iceberg-spark-runtime); re-derived
here from the public spec's refs model.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from .avro_io import write_ocf
from .iceberg_layout import (
    CONTENT_DATA,
    CONTENT_POS_DELETES,
    MANIFEST_FILE_SCHEMA,
    STATUS_ADDED,
    STATUS_DELETED,
    STATUS_EXISTING,
    IcebergTable,
    all_spec_part_fields,
    manifest_entry_schema,
    next_sequence_number,
)


def _refs(self) -> dict:
    return dict(self._metadata().get("refs", {}))


def _resolve_ref(self, name: str) -> int:
    md = self._metadata()
    if name == "main":
        return md["current-snapshot-id"]
    ref = md.get("refs", {}).get(name)
    if ref is None:
        raise ValueError(
            f"no ref {name!r} (have {sorted(md.get('refs', {}))})"
        )
    return ref["snapshot-id"]


def _create_ref(self, name: str, kind: str, snapshot_id: int | None):
    from .iceberg_deletes import _advance_metadata

    if name == "main":
        raise ValueError("'main' is the implicit current branch")
    md = self._metadata()
    sid = (
        snapshot_id
        if snapshot_id is not None
        else md["current-snapshot-id"]
    )
    if not any(s["snapshot-id"] == sid for s in md["snapshots"]):
        raise ValueError(f"snapshot {sid} not in metadata")
    refs = dict(md.get("refs", {}))
    if name in refs:
        raise ValueError(
            f"ref {name!r} already exists ({refs[name]['type']})"
        )
    refs[name] = {"snapshot-id": sid, "type": kind}
    md["refs"] = refs
    _advance_metadata(self, md)
    return sid


def _create_tag(self, name: str, snapshot_id: int | None = None) -> int:
    return _create_ref(self, name, "tag", snapshot_id)


def _create_branch(
    self, name: str, snapshot_id: int | None = None
) -> int:
    return _create_ref(self, name, "branch", snapshot_id)


def _drop_ref(self, name: str) -> None:
    from .iceberg_deletes import _advance_metadata

    md = self._metadata()
    refs = dict(md.get("refs", {}))
    if name not in refs:
        raise ValueError(f"no ref {name!r}")
    del refs[name]
    md["refs"] = refs
    _advance_metadata(self, md)


def _read_ref(self, name: str) -> DataFrame:
    return self.read(snapshot_id=_resolve_ref(self, name))


def _append_to_branch(
    self, df: DataFrame, branch: str
) -> int:
    """Commit an append whose snapshot advances ONLY ``branch``:
    carried data AND delete manifests come from the branch head, the
    new snapshot records the head as its parent, and
    ``current-snapshot-id`` (main) stays put. The staged write is
    invisible to main readers until ``fast_forward``."""
    import time
    import uuid

    from .iceberg_deletes import (
        DELETE_MANIFEST_ENTRY_SCHEMA,
        _advance_metadata,
    )

    md = self._metadata()
    ref = md.get("refs", {}).get(branch)
    if ref is None or ref["type"] != "branch":
        raise ValueError(
            f"{branch!r} is not a branch (create_branch first; tags "
            "are immutable)"
        )
    head = ref["snapshot-id"]
    part_cols = self._resolve_part_cols(df, None)
    new_files = self._write_data(df, part_cols)
    snapshot_id = int(uuid.uuid4().int % (1 << 62))
    now = int(time.time() * 1000)
    carried = [
        {
            "status": STATUS_EXISTING,
            "snapshot_id": e["snapshot_id"],
            "data_file": e["data_file"],
        }
        for e in self._entries(snapshot_id=head)
        if e["status"] != STATUS_DELETED
    ]
    entries = carried + [
        {
            "status": STATUS_ADDED,
            "snapshot_id": snapshot_id,
            "data_file": f,
        }
        for f in new_files
    ]
    part_fields = all_spec_part_fields(md)
    manifest_path = os.path.join(
        self.meta_dir, f"snap-{snapshot_id}-m0.avro"
    )
    write_ocf(
        manifest_path, manifest_entry_schema(part_fields), entries
    )
    mrows = [
        {
            "manifest_path": manifest_path,
            "manifest_length": os.path.getsize(manifest_path),
            "partition_spec_id": md.get("default-spec-id", 0),
            "added_snapshot_id": snapshot_id,
            "added_data_files_count": len(new_files),
            "existing_data_files_count": len(carried),
            "deleted_data_files_count": 0,
            "content": CONTENT_DATA,
        }
    ]
    del_carried = [
        {
            "status": STATUS_EXISTING,
            "snapshot_id": e["snapshot_id"],
            "data_file": e["data_file"],
        }
        for e in self._entries(
            snapshot_id=head, content=CONTENT_POS_DELETES
        )
        if e["status"] != STATUS_DELETED
    ]
    if del_carried:
        dm_path = os.path.join(
            self.meta_dir, f"snap-{snapshot_id}-m1-deletes.avro"
        )
        write_ocf(dm_path, DELETE_MANIFEST_ENTRY_SCHEMA, del_carried)
        mrows.append(
            {
                "manifest_path": dm_path,
                "manifest_length": os.path.getsize(dm_path),
                "partition_spec_id": 0,
                "added_snapshot_id": snapshot_id,
                "added_data_files_count": 0,
                "existing_data_files_count": len(del_carried),
                "deleted_data_files_count": 0,
                "content": CONTENT_POS_DELETES,
            }
        )
    mlist_path = os.path.join(self.meta_dir, f"snap-{snapshot_id}.avro")
    write_ocf(mlist_path, MANIFEST_FILE_SCHEMA, mrows)
    snapshot = {
        "snapshot-id": snapshot_id,
        "parent-snapshot-id": head,
        "timestamp-ms": now,
        "manifest-list": mlist_path,
        "summary": {"operation": "append", "branch": branch},
        "sequence-number": next_sequence_number(md),
        "schema-id": md.get(
            "current-schema-id", md["schema"].get("schema-id", 0)
        ),
    }
    md["snapshots"] = md["snapshots"] + [snapshot]
    md["last-sequence-number"] = snapshot["sequence-number"]
    refs = dict(md["refs"])
    refs[branch] = {**refs[branch], "snapshot-id": snapshot_id}
    md["refs"] = refs
    # current-snapshot-id and snapshot-log untouched: main is blind
    _advance_metadata(self, md)
    return snapshot_id


def _is_ancestor(md: dict, ancestor: int, head: int) -> bool:
    by_id = {s["snapshot-id"]: s for s in md["snapshots"]}
    cur = head
    seen = set()
    while cur is not None and cur not in seen:
        if cur == ancestor:
            return True
        seen.add(cur)
        cur = by_id.get(cur, {}).get("parent-snapshot-id")
    return False


def _fast_forward(self, branch: str) -> int:
    """PUBLISH a branch: move main to the branch head after verifying
    the move is a true fast-forward (main's current snapshot is an
    ancestor of the head through the parent chain). A diverged main
    refuses — publishing would silently drop its commits."""
    from .iceberg_deletes import _advance_metadata

    md = self._metadata()
    ref = md.get("refs", {}).get(branch)
    if ref is None or ref["type"] != "branch":
        raise ValueError(f"{branch!r} is not a branch")
    head = ref["snapshot-id"]
    cur = md["current-snapshot-id"]
    if head == cur:
        return cur
    if not _is_ancestor(md, cur, head):
        raise ValueError(
            f"cannot fast-forward: main ({cur}) is not an ancestor of "
            f"{branch!r}'s head ({head}) — main diverged; rebase the "
            "branch (re-stage its writes) instead"
        )
    import time

    md["current-snapshot-id"] = head
    md["snapshot-log"] = md.get("snapshot-log", []) + [
        {"timestamp-ms": int(time.time() * 1000), "snapshot-id": head}
    ]
    _advance_metadata(self, md)
    return head


def attach() -> None:
    IcebergTable.refs = _refs
    IcebergTable.create_tag = _create_tag
    IcebergTable.create_branch = _create_branch
    IcebergTable.drop_ref = _drop_ref
    IcebergTable.read_ref = _read_ref
    IcebergTable.append_to_branch = _append_to_branch
    IcebergTable.fast_forward = _fast_forward


attach()
