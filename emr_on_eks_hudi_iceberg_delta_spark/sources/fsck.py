"""Table integrity verification (fsck) for the lakehouse layouts —
the maintenance check real operators run before trusting a table
(delta-rs ``verify``, Iceberg's metadata validation): walk the
metadata, prove every claim it makes about the data plane, report
everything wrong instead of stopping at the first hit.

All checks are metadata-sized: parquet FOOTERS are read (row counts),
never data pages; DV payloads are KB-scale bitmaps. Reports are plain
dicts so callers can alert on them.
"""

from __future__ import annotations

import json
import os

from .delta_log import DeltaLogTable, _commit_path
from .iceberg_layout import (
    CONTENT_POS_DELETES,
    STATUS_DELETED,
    IcebergTable,
)
from .avro_io import read_ocf
from . import dv as dv_io


def _footer_rows(path: str) -> int | None:
    import pyarrow.parquet as pq

    try:
        return pq.read_metadata(path).num_rows
    except Exception:
        return None


def _delta_fsck(self: DeltaLogTable) -> dict:
    """Verify the Delta-protocol table end to end:

    * version chain replayable (contiguous from 0 or checkpoint-seeded);
    * metaData present with a parseable schemaString;
    * every LIVE add's file exists, matches its recorded size, and its
      parquet footer row count equals stats.numRecords (when stats
      exist; stats JSON must parse);
    * every deletionVector descriptor resolves, its CRC verifies, and
      its cardinality matches the decoded bitmap;
    * if a checkpoint exists, replaying through it yields the SAME
      live set as the JSON chain (when the full chain is still there).
    """
    errors: list[str] = []
    try:
        live, meta, head = self._replay()
    except Exception as e:
        return {"ok": False, "errors": [f"replay failed: {e}"],
                "files_checked": 0}
    try:
        json.loads(meta["schemaString"])
    except Exception as e:
        errors.append(f"metaData.schemaString unparseable: {e}")
    for path, add in sorted(live.items()):
        full = os.path.join(self.location, path)
        if not os.path.exists(full):
            errors.append(f"live file missing on disk: {path}")
            continue
        size = os.path.getsize(full)
        if add.get("size") is not None and add["size"] != size:
            errors.append(
                f"{path}: size {size} != add action's {add['size']}"
            )
        raw = add.get("stats")
        nrec = None
        if raw:
            try:
                nrec = json.loads(raw).get("numRecords")
            except Exception as e:
                errors.append(f"{path}: stats JSON unparseable: {e}")
        footer = _footer_rows(full)
        if footer is None:
            errors.append(f"{path}: parquet footer unreadable")
        elif nrec is not None and footer != nrec:
            errors.append(
                f"{path}: footer rows {footer} != stats.numRecords {nrec}"
            )
        desc = add.get("deletionVector")
        if desc:
            try:
                idx = dv_io.read_dv(self.location, desc)
                if len(idx) != desc.get("cardinality"):
                    errors.append(
                        f"{path}: DV cardinality {desc.get('cardinality')}"
                        f" != decoded {len(idx)}"
                    )
                if footer is not None and idx and idx[-1] >= footer:
                    errors.append(
                        f"{path}: DV names position {idx[-1]} beyond "
                        f"the file's {footer} rows"
                    )
            except Exception as e:
                errors.append(f"{path}: DV unreadable: {e}")
    ckpt = self.last_checkpoint_version()
    versions = self._versions()
    if (
        ckpt is not None
        and versions
        and min(versions) == 0
        and ckpt <= head
    ):
        try:
            from_ckpt, _ = self._load_checkpoint(ckpt)
            for v in versions:
                if v <= ckpt or v > head:
                    continue
                with open(_commit_path(self.location, v)) as f:
                    for line in f:
                        if not line.strip():
                            continue
                        a = json.loads(line)
                        if "add" in a:
                            from_ckpt[a["add"]["path"]] = a["add"]
                        elif "remove" in a:
                            from_ckpt.pop(a["remove"]["path"], None)
            if set(from_ckpt) != set(live):
                errors.append(
                    "checkpoint-seeded replay disagrees with the JSON "
                    f"chain: {sorted(set(from_ckpt) ^ set(live))[:3]}"
                )
        except Exception as e:
            errors.append(f"checkpoint unreadable: {e}")
    return {
        "ok": not errors,
        "errors": errors,
        "files_checked": len(live),
        "head_version": head,
    }


def _iceberg_fsck(self: IcebergTable) -> dict:
    """Verify the Iceberg layout: metadata resolves, every manifest in
    the current snapshot parses, every live data file exists with a
    footer row count equal to the manifest's record_count, every
    position-delete file parses as (file_path, pos) and only names
    files that exist, and the snapshot log references only known
    snapshots."""
    errors: list[str] = []
    try:
        md = self._metadata()
    except Exception as e:
        return {"ok": False, "errors": [f"metadata unreadable: {e}"],
                "files_checked": 0}
    known = {s["snapshot-id"] for s in md["snapshots"]}
    for h in md.get("snapshot-log", []):
        if h["snapshot-id"] not in known:
            errors.append(
                f"snapshot-log references unknown id {h['snapshot-id']}"
            )
    checked = 0
    live_paths: set[str] = set()
    try:
        entries = self._entries()
    except Exception as e:
        return {"ok": False,
                "errors": errors + [f"manifests unreadable: {e}"],
                "files_checked": 0}
    for e in entries:
        if e["status"] == STATUS_DELETED:
            continue
        f = e["data_file"]
        checked += 1
        live_paths.add(f["file_path"])
        if not os.path.exists(f["file_path"]):
            errors.append(f"live file missing: {f['file_path']}")
            continue
        footer = _footer_rows(f["file_path"])
        if footer is None:
            errors.append(f"{f['file_path']}: footer unreadable")
        elif footer != f["record_count"]:
            errors.append(
                f"{f['file_path']}: footer rows {footer} != manifest "
                f"record_count {f['record_count']}"
            )
    for e in self._entries(content=CONTENT_POS_DELETES):
        if e["status"] == STATUS_DELETED:
            continue
        f = e["data_file"]
        checked += 1
        if not os.path.exists(f["file_path"]):
            errors.append(f"delete file missing: {f['file_path']}")
            continue
        try:
            import pyarrow.parquet as pq

            t = pq.read_table(f["file_path"])
            if t.num_rows != f["record_count"]:
                errors.append(
                    f"{f['file_path']}: delete rows {t.num_rows} != "
                    f"manifest record_count {f['record_count']}"
                )
            if f.get("content") == 2:
                # equality delete (r10): keyed by table columns named
                # via equality_ids, not (file_path, pos) — verify the
                # ids resolve against the current schema
                ids = set(f.get("equality_ids") or [])
                known = {
                    fld["id"]
                    for fld in self._metadata()["schema"]["fields"]
                }
                if not ids:
                    errors.append(
                        f"{f['file_path']}: equality delete without "
                        "equality_ids"
                    )
                elif not ids <= known:
                    errors.append(
                        f"{f['file_path']}: equality_ids "
                        f"{sorted(ids - known)} not in schema"
                    )
            else:
                named = set(t.column("file_path").to_pylist())
                orphan = named - live_paths
                if orphan:
                    errors.append(
                        f"{f['file_path']}: names non-live data files "
                        f"{sorted(orphan)[:2]}"
                    )
        except Exception as exc:
            errors.append(f"{f['file_path']}: unparseable: {exc}")
    return {"ok": not errors, "errors": errors, "files_checked": checked}


def _hudi_fsck(self) -> dict:
    """Verify the Hudi layout (CoW and MoR): hoodie.properties is
    complete, every timeline action parses, every LIVE slice file
    (bases + MoR logs) exists with its recorded size and a readable
    footer, replacecommits retire only groups the timeline introduced,
    and every savepoint's pinned file set is intact (a broken pin
    means its restore target is gone). Metadata-sized: footers only,
    never data pages."""
    errors: list[str] = []
    props = os.path.join(self.hoodie, "hoodie.properties")
    try:
        stored = dict(
            line.strip().split("=", 1)
            for line in open(props)
            if "=" in line
        )
        for key in (
            "hoodie.table.type",
            "hoodie.table.recordkey.fields",
            "hoodie.table.precombine.field",
            "n.file.groups",
        ):
            if key not in stored:
                errors.append(f"hoodie.properties missing {key}")
    except Exception as e:
        errors.append(f"hoodie.properties unreadable: {e}")
    seen_groups: set[tuple] = set()
    sizes: dict[str, int] = {}
    for t in self.instants():
        try:
            meta = self._commit_meta(t)
        except Exception as e:
            errors.append(f"instant {t}: unparseable: {e}")
            continue
        for part, fid in meta.get("replacedFileGroups", []):
            if (part, fid) not in seen_groups:
                errors.append(
                    f"instant {t}: replaces unknown file group "
                    f"({part!r}, {fid})"
                )
        for part, stats in meta.get(
            "partitionToWriteStats", {}
        ).items():
            for st in stats:
                seen_groups.add((part, st["fileId"]))
                if st.get("fileSizeInBytes") is not None:
                    sizes[st["path"]] = st["fileSizeInBytes"]
    if hasattr(self, "_mor_slices"):
        live_paths = []
        for s in self._mor_slices().values():
            if s["base"]:
                live_paths.append(s["base"])
            live_paths.extend(s["logs"])
    else:
        live_paths = list(self._file_slices().values())
    checked = 0
    for rel in sorted(set(live_paths)):
        full = os.path.join(self.location, rel)
        checked += 1
        if not os.path.exists(full):
            errors.append(f"live slice file missing on disk: {rel}")
            continue
        if rel in sizes and os.path.getsize(full) != sizes[rel]:
            errors.append(
                f"{rel}: size {os.path.getsize(full)} != write "
                f"stats' {sizes[rel]}"
            )
        if _footer_rows(full) is None:
            errors.append(f"{rel}: parquet footer unreadable")
    for sp in getattr(self, "savepoints", lambda: [])():
        try:
            pinned = self._savepoint_meta(sp).get("preservedFiles", [])
        except Exception as e:
            errors.append(f"savepoint {sp}: unparseable: {e}")
            continue
        for rel in pinned:
            if not os.path.exists(os.path.join(self.location, rel)):
                errors.append(
                    f"savepoint {sp}: pinned file missing: {rel} "
                    "(restore target is broken)"
                )
    return {"ok": not errors, "errors": errors, "files_checked": checked}


DeltaLogTable.fsck = _delta_fsck
IcebergTable.fsck = _iceberg_fsck


def _attach_hudi_fsck() -> None:
    from .hudi_layout import HudiCowTable

    HudiCowTable.fsck = _hudi_fsck  # HudiMorTable inherits


_attach_hudi_fsck()
