"""Iceberg v1 table in Iceberg's OWN metadata layout — versioned
metadata.json, Avro manifest lists and manifests, snapshot reads, time
travel, and append/overwrite commits, with no Iceberg runtime.

The reference's third leg writes Iceberg tables
(``iceberg/iceberg_submit.sh:33-34`` ships iceberg-spark-runtime +
spark-avro; neither jar exists in this container — verified and gated
in round 6). The FORMAT, however, is an open spec
(https://iceberg.apache.org/spec/): JSON table metadata pointing at a
snapshot list, each snapshot pointing at an Avro MANIFEST LIST, each
manifest-list row pointing at an Avro MANIFEST whose entries carry the
data-file paths and stats. With parquet for the data plane and the
sibling ``avro_io`` codec for the metadata plane, the whole layout is
writable and readable Spark-first — completing the lakehouse-format
trio beside ``delta_log`` (Delta) and ``hudi_layout`` (Hudi).

Implemented (v1, unpartitioned spec — the subset the reference's
pipeline shape needs):

* ``append / overwrite`` — write parquet under ``data/``, one manifest
  per snapshot listing the snapshot's FULL file state (appends carry
  prior files forward as EXISTING entries, overwrites list only the
  new files), a manifest list per snapshot, the next
  ``vN.metadata.json``, and ``version-hint.text`` last — the pointer
  swap is the atomic commit, exactly Iceberg's HadoopCatalog protocol.
* ``read(snapshot_id=None)`` — resolve the metadata pointer, walk
  snapshot -> manifest list -> manifests -> live data files, scan
  parquet. Time travel = pass any historical snapshot id (old
  metadata, manifests, and files are immutable — nothing is rewritten
  on commit).
* ``added_files / read_appended_since`` — incremental consumption from
  manifest-entry statuses (ADDED vs EXISTING attribution per
  snapshot).
* ``history()`` — the snapshot log.

Field ids follow the spec (manifest_path=500..., file_path=100...) so
the Avro files carry the ids a real Iceberg reader resolves by.
Partitioned specs, v2 sequence numbers / delete files, and schema
evolution are documented out of contract (loud errors where relevant),
not silently wrong.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from .avro_io import read_ocf, write_ocf

_TYPE_MAP = {
    "bigint": "long",
    "int": "int",
    "smallint": "int",
    "tinyint": "int",
    "double": "double",
    "float": "float",
    "string": "string",
    "boolean": "boolean",
    "date": "date",
    "timestamp_ntz": "timestamp",
    "timestamp": "timestamptz",
    "binary": "binary",
}

MANIFEST_ENTRY_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int", "field-id": 0},
        {"name": "snapshot_id", "type": "long", "field-id": 1},
        {
            "name": "data_file",
            "field-id": 2,
            "type": {
                "type": "record",
                "name": "r2",
                "fields": [
                    {"name": "file_path", "type": "string",
                     "field-id": 100},
                    {"name": "file_format", "type": "string",
                     "field-id": 101},
                    {"name": "partition", "field-id": 102,
                     "type": {"type": "record", "name": "r102",
                              "fields": []}},
                    {"name": "record_count", "type": "long",
                     "field-id": 103},
                    {"name": "file_size_in_bytes", "type": "long",
                     "field-id": 104},
                    {"name": "block_size_in_bytes", "type": "long",
                     "field-id": 105},
                ],
            },
        },
    ],
}

MANIFEST_FILE_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_data_files_count", "type": "int",
         "field-id": 504},
        {"name": "existing_data_files_count", "type": "int",
         "field-id": 505},
        {"name": "deleted_data_files_count", "type": "int",
         "field-id": 506},
    ],
}

STATUS_EXISTING, STATUS_ADDED, STATUS_DELETED = 0, 1, 2


def _iceberg_schema(df: DataFrame) -> dict:
    fields = []
    for i, f in enumerate(df.schema.fields, start=1):
        t = f.dataType.simpleString()
        if t.startswith("decimal"):
            ice = t.replace(",", ", ")  # 'decimal(p, s)' spelling
        elif t in _TYPE_MAP:
            ice = _TYPE_MAP[t]
        else:
            raise ValueError(
                f"column {f.name}: type {t} not in the v1 subset this "
                "writer supports"
            )
        fields.append(
            {
                "id": i,
                "name": f.name,
                "required": not f.nullable,
                "type": ice,
            }
        )
    return {"type": "struct", "schema-id": 0, "fields": fields}


class IcebergTable:
    """Iceberg v1 table at a posix ``location`` (HadoopCatalog-style:
    the ``metadata/version-hint.text`` pointer is the commit)."""

    def __init__(self, spark: SparkSession, location: str):
        self.spark = spark
        self.location = location
        self.meta_dir = os.path.join(location, "metadata")
        self.data_dir = os.path.join(location, "data")
        os.makedirs(self.meta_dir, exist_ok=True)
        os.makedirs(self.data_dir, exist_ok=True)

    # ----------------------------- metadata ------------------------------

    def _current_version(self) -> int | None:
        hint = os.path.join(self.meta_dir, "version-hint.text")
        if not os.path.exists(hint):
            return None
        return int(open(hint).read().strip())

    def _metadata(self, version: int | None = None) -> dict:
        v = version if version is not None else self._current_version()
        if v is None:
            raise ValueError(f"no iceberg table at {self.location}")
        return json.load(
            open(os.path.join(self.meta_dir, f"v{v}.metadata.json"))
        )

    def history(self) -> list[dict]:
        md = self._metadata()
        return [
            {
                "snapshot_id": s["snapshot-id"],
                "timestamp_ms": s["timestamp-ms"],
                "operation": s.get("summary", {}).get("operation"),
            }
            for s in md["snapshots"]
        ]

    # ------------------------------ reading ------------------------------

    def _entries(self, snapshot_id: int | None = None) -> list[dict]:
        md = self._metadata()
        sid = (
            snapshot_id
            if snapshot_id is not None
            else md.get("current-snapshot-id")
        )
        snap = next(
            (s for s in md["snapshots"] if s["snapshot-id"] == sid), None
        )
        if snap is None:
            raise ValueError(
                f"snapshot {sid} not found (have "
                f"{[s['snapshot-id'] for s in md['snapshots']]})"
            )
        _, manifests = read_ocf(snap["manifest-list"])
        entries: list[dict] = []
        for m in manifests:
            _, es = read_ocf(m["manifest_path"])
            entries.extend(es)
        return entries

    def read(self, snapshot_id: int | None = None) -> DataFrame:
        paths = [
            e["data_file"]["file_path"]
            for e in self._entries(snapshot_id)
            if e["status"] != STATUS_DELETED
        ]
        if not paths:
            raise ValueError("empty snapshot")
        return self.spark.read.parquet(*paths)

    def added_files(self, since_snapshot_id: int) -> list[dict]:
        """Data files ADDED by snapshots after ``since_snapshot_id`` —
        manifest-entry status attribution, no file-set diffing.
        Snapshot ids are random (spec), so "after" resolves through the
        snapshot list's order, never numeric comparison."""
        ordered = [s["snapshot-id"] for s in self._metadata()["snapshots"]]
        if since_snapshot_id not in ordered:
            raise ValueError(f"unknown snapshot {since_snapshot_id}")
        later = ordered[ordered.index(since_snapshot_id) + 1:]
        out: list[dict] = []
        # each later snapshot's OWN manifest marks its files ADDED (the
        # head manifest demotes older files to EXISTING, so a single
        # head scan would under-report)
        for sid in later:
            out.extend(
                e["data_file"]
                for e in self._entries(snapshot_id=sid)
                if e["status"] == STATUS_ADDED and e["snapshot_id"] == sid
            )
        return out

    def read_appended_since(self, snapshot_id: int) -> DataFrame:
        added = [f["file_path"] for f in self.added_files(snapshot_id)]
        if not added:
            return self.read().filter("1 = 0")
        return self.spark.read.parquet(*added)

    # ------------------------------ writing ------------------------------

    def _write_data(self, df: DataFrame) -> list[dict]:
        staging = os.path.join(
            self.location, f"_staging_{uuid.uuid4().hex}"
        )
        df.write.mode("overwrite").parquet(staging)
        files = []
        for fname in sorted(os.listdir(staging)):
            if not fname.endswith(".parquet"):
                continue
            import pyarrow.parquet as pq

            src = os.path.join(staging, fname)
            n_rows = pq.read_metadata(src).num_rows
            if n_rows == 0:
                continue  # never commit empty part files
            dst = os.path.join(
                self.data_dir, f"{uuid.uuid4().hex}.parquet"
            )
            os.replace(src, dst)
            files.append(
                {
                    "file_path": dst,
                    "file_format": "PARQUET",
                    "partition": {},
                    "record_count": n_rows,
                    "file_size_in_bytes": os.path.getsize(dst),
                    "block_size_in_bytes": 64 * 1024 * 1024,
                }
            )
        for leftover in os.listdir(staging):
            os.remove(os.path.join(staging, leftover))
        os.rmdir(staging)
        return files

    def _commit(
        self, df: DataFrame, new_files: list[dict], operation: str
    ) -> int:
        cur = self._current_version()
        snapshot_id = int(uuid.uuid4().int % (1 << 62))
        now = int(time.time() * 1000)
        carried: list[dict] = []
        if operation == "append" and cur is not None:
            carried = [
                {
                    "status": STATUS_EXISTING,
                    "snapshot_id": e["snapshot_id"],
                    "data_file": e["data_file"],
                }
                for e in self._entries()
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
        manifest_path = os.path.join(
            self.meta_dir, f"snap-{snapshot_id}-m0.avro"
        )
        write_ocf(manifest_path, MANIFEST_ENTRY_SCHEMA, entries)
        mlist_path = os.path.join(
            self.meta_dir, f"snap-{snapshot_id}.avro"
        )
        write_ocf(
            mlist_path,
            MANIFEST_FILE_SCHEMA,
            [
                {
                    "manifest_path": manifest_path,
                    "manifest_length": os.path.getsize(manifest_path),
                    "partition_spec_id": 0,
                    "added_snapshot_id": snapshot_id,
                    "added_data_files_count": len(new_files),
                    "existing_data_files_count": len(carried),
                    "deleted_data_files_count": 0,
                }
            ],
        )
        snapshot = {
            "snapshot-id": snapshot_id,
            "timestamp-ms": now,
            "manifest-list": mlist_path,
            "summary": {"operation": operation},
        }
        if cur is None:
            md = {
                "format-version": 1,
                "table-uuid": str(uuid.uuid4()),
                "location": self.location,
                "last-updated-ms": now,
                "last-column-id": len(df.schema.fields),
                "schema": _iceberg_schema(df),
                "partition-spec": [],
                "partition-specs": [{"spec-id": 0, "fields": []}],
                "default-spec-id": 0,
                "properties": {},
                "snapshots": [snapshot],
                "snapshot-log": [],
                "current-snapshot-id": snapshot_id,
            }
            next_v = 1
        else:
            md = self._metadata()
            md["last-updated-ms"] = now
            md["snapshots"] = md["snapshots"] + [snapshot]
            md["snapshot-log"] = md.get("snapshot-log", []) + [
                {"timestamp-ms": now, "snapshot-id": snapshot_id}
            ]
            md["current-snapshot-id"] = snapshot_id
            next_v = cur + 1
        mpath = os.path.join(self.meta_dir, f"v{next_v}.metadata.json")
        tmp = mpath + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(md, f)
        os.replace(tmp, mpath)
        hint_tmp = os.path.join(
            self.meta_dir, f"_hint-{uuid.uuid4().hex}"
        )
        with open(hint_tmp, "w") as f:
            f.write(str(next_v))
        # the version-hint swap IS the commit (HadoopCatalog protocol)
        os.replace(
            hint_tmp, os.path.join(self.meta_dir, "version-hint.text")
        )
        return snapshot_id

    def append(self, df: DataFrame) -> int:
        return self._commit(df, self._write_data(df), "append")

    def overwrite(self, df: DataFrame) -> int:
        return self._commit(df, self._write_data(df), "overwrite")
