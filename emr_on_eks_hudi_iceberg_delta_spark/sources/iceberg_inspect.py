"""Iceberg metadata (inspection) tables — the ``SELECT * FROM
tbl.files / tbl.snapshots / tbl.manifests / tbl.history`` surface the
reference's iceberg-spark-runtime exposes, served as DataFrames from
the layout's own metadata (driver-side JSON/Avro — these tables ARE
metadata, no data file is ever opened).

Scale shape: rows = O(files) / O(snapshots) / O(manifests) — the same
manifest-sized state every Iceberg planner already holds; the
DataFrames exist so metadata is queryable WITH Spark (joins against
data, health dashboards) rather than only walkable in Python.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame

from .iceberg_layout import (
    CONTENT_DATA,
    CONTENT_POS_DELETES,
    STATUS_DELETED,
    IcebergTable,
)
from .avro_io import read_ocf


def _inspect_snapshots(self: IcebergTable) -> DataFrame:
    """One row per snapshot (id, committed_at, operation,
    manifest_list) — ``tbl.snapshots``."""
    md = self._metadata()
    rows = [
        (
            s["snapshot-id"],
            s["timestamp-ms"],
            s.get("summary", {}).get("operation"),
            s["manifest-list"],
        )
        for s in md["snapshots"]
    ]
    return self.spark.createDataFrame(
        rows,
        "snapshot_id bigint, committed_at_ms bigint, "
        "operation string, manifest_list string",
    )


def _inspect_manifests(
    self: IcebergTable, snapshot_id: int | None = None
) -> DataFrame:
    """One row per manifest in the (current) snapshot's manifest list —
    ``tbl.manifests`` (content: 0 data / 1 deletes)."""
    md = self._metadata()
    sid = (
        snapshot_id
        if snapshot_id is not None
        else md.get("current-snapshot-id")
    )
    snap = next(
        s for s in md["snapshots"] if s["snapshot-id"] == sid
    )
    _, manifests = read_ocf(snap["manifest-list"])
    rows = [
        (
            m["manifest_path"],
            m["manifest_length"],
            m.get("content", CONTENT_DATA),
            m["added_snapshot_id"],
            m.get("added_data_files_count", 0),
            m.get("existing_data_files_count", 0),
        )
        for m in manifests
    ]
    return self.spark.createDataFrame(
        rows,
        "path string, length bigint, content int, "
        "added_snapshot_id bigint, added_data_files_count int, "
        "existing_data_files_count int",
    )


def _inspect_files(
    self: IcebergTable, snapshot_id: int | None = None
) -> DataFrame:
    """One row per LIVE data file (``tbl.files``): path, format,
    record_count, size, typed partition dict as a JSON string (specs
    vary per table, so the column is schema-stable)."""
    rows = []
    for e in self._entries(snapshot_id):
        if e["status"] == STATUS_DELETED:
            continue
        f = e["data_file"]
        rows.append(
            (
                f["file_path"],
                f["file_format"],
                int(f["record_count"]),
                int(f["file_size_in_bytes"]),
                json.dumps(f.get("partition", {}), sort_keys=True),
            )
        )
    return self.spark.createDataFrame(
        rows,
        "file_path string, file_format string, record_count bigint, "
        "file_size_in_bytes bigint, partition string",
    )


def _inspect_delete_files(
    self: IcebergTable, snapshot_id: int | None = None
) -> DataFrame:
    """One row per live position-delete file — ``tbl.delete_files``."""
    rows = [
        (
            f["file_path"],
            f["file_format"],
            int(f["record_count"]),
            int(f["file_size_in_bytes"]),
        )
        for f in self._live_delete_files(snapshot_id)
    ]
    return self.spark.createDataFrame(
        rows,
        "file_path string, file_format string, record_count bigint, "
        "file_size_in_bytes bigint",
    )


def _inspect_history(self: IcebergTable) -> DataFrame:
    """``tbl.history``: the snapshot-log (made_current_at, snapshot_id,
    is_current_ancestor is trivially true in this linear-history
    layout)."""
    md = self._metadata()
    rows = [
        (h["timestamp-ms"], h["snapshot-id"])
        for h in md.get("snapshot-log", [])
    ] or [
        (s["timestamp-ms"], s["snapshot-id"]) for s in md["snapshots"]
    ]
    return self.spark.createDataFrame(
        rows, "made_current_at_ms bigint, snapshot_id bigint"
    )


def _inspect_refs(self: IcebergTable) -> DataFrame:
    """One row per named reference plus the implicit ``main`` branch —
    ``tbl.refs`` (name, type, snapshot_id)."""
    md = self._metadata()
    rows = [("main", "branch", md.get("current-snapshot-id"))]
    rows += [
        (name, r["type"], r["snapshot-id"])
        for name, r in sorted(md.get("refs", {}).items())
    ]
    return self.spark.createDataFrame(
        rows, "name string, type string, snapshot_id bigint"
    )


IcebergTable.inspect_snapshots = _inspect_snapshots
IcebergTable.inspect_manifests = _inspect_manifests
IcebergTable.inspect_files = _inspect_files
IcebergTable.inspect_delete_files = _inspect_delete_files
IcebergTable.inspect_history = _inspect_history
IcebergTable.inspect_refs = _inspect_refs
