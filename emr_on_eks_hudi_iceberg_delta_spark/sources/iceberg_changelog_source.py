"""Spark 4 Python DataSource serving the Iceberg CHANGELOG as a stream
— ``spark.readStream.format("iceberglog")`` — plus the matching batch
reader, the streaming face of ``iceberg_changelog.changes()`` (Iceberg's
create_changelog_view procedure): the last leg of the trio's streaming
CDC surface beside "deltacdf" (r11) and "hudiincr" (r12).

Offsets are SNAPSHOT IDS (checkpointed as opaque tokens — ordering
comes from parent-snapshot ancestry, never from the random ids). Each
micro-batch walks the MAIN lineage from the end offset back to the
start offset — exactly the batch changelog's ancestry walk, so an
unpublished WAP/branch snapshot sitting in the snapshot list inside
the range emits NOTHING until publish/fast_forward lands it on main
(pinned by test). Per snapshot, the batch attribution rules:

* data files ADDED -> their rows as ``insert`` events;
* data files REMOVED (overwrite/replace) -> their parent-LIVE rows as
  ``delete`` events (parent position deletes applied as row-position
  masks);
* POSITION-delete files added -> exactly the named (file, pos) rows as
  ``delete`` events;
* maintenance snapshots (rewrite_data_files) emit nothing;
* EQUALITY deletes refuse loudly — applying a key predicate inside a
  per-file Arrow partition would re-implement the join executor-side;
  the batch ``changes()`` (Spark-planned) serves that shape.

Events surface under the CURRENT schema: every partition carries a
field-id-derived column-name map, so files written before a rename
serve their rows under today's names (the batch changelog's alignment,
pushed into the Arrow path). Rows carry ``_change_type`` and
``_commit_snapshot_id``.

Scale: offset resolution and planning are pure metadata (manifest-list
+ manifest decode, cached); one input partition per changed file;
delete-pair position masks are read driver-side from the delete
parquet (bounded by delete-file size, the same pairs every reader
ships); Arrow-batched end to end, no per-row Python.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

CHANGE_TYPE = "_change_type"
COMMIT_SNAPSHOT = "_commit_snapshot_id"


class _IceLogPartition(InputPartition):
    def __init__(
        self,
        path: str,
        schema_json: str,
        change_type: str,
        snapshot_id: int,
        colmap: dict,
        exclude: list | None = None,
        include: list | None = None,
    ):
        self.path = path
        self.schema_json = schema_json
        self.change_type = change_type
        self.snapshot_id = snapshot_id
        #: file (write-time) column name -> current logical name
        self.colmap = colmap
        #: row positions masked OUT (parent pos-deletes on removed files)
        self.exclude = exclude or []
        #: row positions kept EXCLUSIVELY (new pos-delete events)
        self.include = include


def _location(options: dict) -> str:
    location = options.get("location", "").rstrip("/")
    if not location:
        raise ValueError("iceberglog source requires option 'location'")
    if not os.path.isdir(os.path.join(location, "metadata")):
        raise FileNotFoundError(f"no iceberg table at {location}")
    return location


def _table(location: str):
    """Driver-side handle: planning is pure file IO (JSON metadata +
    the avro_io manifest codec), no live SparkSession needed."""
    from .iceberg_layout import IcebergTable

    return IcebergTable(None, location)


#: spark DDL name -> spark schema-JSON type name (fromDDL needs an
#: active SparkContext; DataSource.schema() runs in a worker without
#: one, so the schema is built as context-free JSON instead)
_DDL2JSON = {"bigint": "long", "int": "integer",
             "smallint": "short", "tinyint": "byte"}


def _schema_json(location: str) -> str:
    from .iceberg_layout import _spark_type_str, ice_schema_by_id

    md = _table(location)._metadata()
    sid = md.get(
        "current-schema-id", md["schema"].get("schema-id", 0)
    )
    ice = ice_schema_by_id(md, sid)
    fields = []
    for f in ice["fields"]:
        t = _spark_type_str(f["type"])
        t = _DDL2JSON.get(t, t.replace(", ", ","))
        fields.append(
            {"name": f["name"], "type": t, "nullable": True,
             "metadata": {}}
        )
    fields.append(
        {"name": CHANGE_TYPE, "type": "string", "nullable": True,
         "metadata": {}}
    )
    fields.append(
        {"name": COMMIT_SNAPSHOT, "type": "long", "nullable": True,
         "metadata": {}}
    )
    return json.dumps({"type": "struct", "fields": fields})


def _chain(md: dict, start_sid, end_sid) -> list[int]:
    """Main-lineage snapshot ids from (start, end], oldest first —
    the batch changelog's parent-ancestry walk (WAP/branch snapshots
    off this lineage are never visited)."""
    if end_sid is None:
        return []
    by_id = {s["snapshot-id"]: s for s in md["snapshots"]}
    chain: list[int] = []
    cur = end_sid
    seen: set[int] = set()
    while cur is not None and cur != start_sid and cur not in seen:
        chain.append(cur)
        seen.add(cur)
        cur = by_id.get(cur, {}).get("parent-snapshot-id")
    if start_sid is not None and cur != start_sid:
        raise ValueError(
            f"checkpointed snapshot {start_sid} is not an ancestor of "
            f"{end_sid} — the table history was rewritten under the "
            "stream (rollback/expire); restart from a fresh checkpoint"
        )
    chain.reverse()
    return chain


def _colmap_for(md: dict, entry: dict, target: dict) -> dict:
    """file write-time column name -> current name, by field id."""
    from .iceberg_layout import entry_schema_id, ice_schema_by_id

    ice = ice_schema_by_id(md, entry_schema_id(md, entry))
    by_id = {f["id"]: f["name"] for f in ice["fields"]}
    out = {}
    for f in target["fields"]:
        nm = by_id.get(f["id"])
        if nm is not None:
            out[nm] = f["name"]
    return out


def _pair_positions(paths: list[str]) -> dict[str, list[int]]:
    """(file basename -> sorted row positions) from position-delete
    parquet files — driver-side pyarrow read, bounded by the delete
    files' own size (the pair set every reader ships anyway)."""
    import pyarrow.parquet as pq

    out: dict[str, list[int]] = {}
    for p in paths:
        t = pq.read_table(p, columns=["file_path", "pos"])
        for fp, pos in zip(
            t.column("file_path").to_pylist(),
            t.column("pos").to_pylist(),
        ):
            out.setdefault(os.path.basename(fp), []).append(pos)
    return {k: sorted(v) for k, v in out.items()}


def _snapshot_partitions(
    t, md: dict, sid: int, schema_json: str
) -> list:
    """Partition descriptors for ONE snapshot's change events —
    the batch changes() attribution, planned from manifests only."""
    from .iceberg_layout import (
        CONTENT_EQ_DELETES,
        CONTENT_POS_DELETES,
        STATUS_ADDED,
        STATUS_DELETED,
        ice_schema_by_id,
    )

    by_id = {s["snapshot-id"]: s for s in md["snapshots"]}
    snap = by_id[sid]
    if snap.get("summary", {}).get("maintenance"):
        return []
    target_sid = md.get(
        "current-schema-id", md["schema"].get("schema-id", 0)
    )
    target = ice_schema_by_id(md, target_sid)
    parent = snap.get("parent-snapshot-id")
    cur_entries = [
        e for e in t._entries(sid) if e["status"] != STATUS_DELETED
    ]
    par_entries = (
        [
            e
            for e in t._entries(parent)
            if e["status"] != STATUS_DELETED
        ]
        if parent is not None
        else []
    )
    cur_paths = {e["data_file"]["file_path"] for e in cur_entries}
    par_paths = {e["data_file"]["file_path"] for e in par_entries}

    def live_delete_entries(of_sid):
        return [
            e
            for e in t._entries(of_sid, content=CONTENT_POS_DELETES)
            if e["status"] != STATUS_DELETED
        ]

    parts: list[_IceLogPartition] = []
    # inserts: files this snapshot added
    for e in cur_entries:
        if (
            e["status"] == STATUS_ADDED
            and e["snapshot_id"] == sid
            and e["data_file"]["file_path"] not in par_paths
        ):
            parts.append(
                _IceLogPartition(
                    e["data_file"]["file_path"],
                    schema_json,
                    "insert",
                    sid,
                    _colmap_for(md, e, target),
                )
            )
    # deletes from removed files: their parent-LIVE rows
    removed = [
        e
        for e in par_entries
        if e["data_file"]["file_path"] not in cur_paths
    ]
    par_dels = (
        live_delete_entries(parent) if parent is not None else []
    )
    if any(
        e["data_file"].get("content") == CONTENT_EQ_DELETES
        for e in par_dels
    ) and removed:
        raise ValueError(
            "iceberglog cannot stream delete events over live EQUALITY "
            "deletes (a per-file Arrow partition cannot apply the key "
            "join) — use the batch changes() for this range"
        )
    par_pos_paths = [
        e["data_file"]["file_path"]
        for e in par_dels
        if e["data_file"].get("content", CONTENT_POS_DELETES)
        == CONTENT_POS_DELETES
    ]
    par_masks = (
        _pair_positions(par_pos_paths)
        if (par_pos_paths and removed)
        else {}
    )
    for e in removed:
        fp = e["data_file"]["file_path"]
        parts.append(
            _IceLogPartition(
                fp,
                schema_json,
                "delete",
                sid,
                _colmap_for(md, e, target),
                exclude=par_masks.get(os.path.basename(fp)),
            )
        )
    # deletes from NEW position-delete files: exactly their pairs
    new_dels = [
        e
        for e in t._entries(sid, content=CONTENT_POS_DELETES)
        if e["status"] == STATUS_ADDED and e["snapshot_id"] == sid
    ]
    if any(
        e["data_file"].get("content") == CONTENT_EQ_DELETES
        for e in new_dels
    ):
        raise ValueError(
            "iceberglog cannot stream EQUALITY-delete events (key "
            "predicates need the Spark-planned join) — use the batch "
            "changes() for this range"
        )
    new_pos_paths = [
        e["data_file"]["file_path"]
        for e in new_dels
        if e["data_file"].get("content", CONTENT_POS_DELETES)
        == CONTENT_POS_DELETES
    ]
    if new_pos_paths:
        masks = _pair_positions(new_pos_paths)
        by_base = {
            os.path.basename(e["data_file"]["file_path"]): e
            for e in par_entries + cur_entries
        }
        for base, positions in sorted(masks.items()):
            e = by_base.get(base)
            if e is None:
                continue  # delete names a file no longer reachable
            parts.append(
                _IceLogPartition(
                    e["data_file"]["file_path"],
                    schema_json,
                    "delete",
                    sid,
                    _colmap_for(md, e, target),
                    include=positions,
                )
            )
    return parts


def _read_icelog_batches(partition):
    """Executor path: scan one parquet file, apply the row-position
    mask (exclude for parent deletes, include for pos-delete events),
    rename write-time columns to current names, stamp the event
    columns, align to the declared schema — Arrow ops only."""
    if not partition.path:
        return
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql.pandas.types import to_arrow_type

    schema = StructType.fromJson(json.loads(partition.schema_json))
    names = [f.name for f in schema.fields]
    types = {f.name: to_arrow_type(f.dataType) for f in schema.fields}
    excl = (
        np.asarray(partition.exclude, dtype=np.int64)
        if partition.exclude
        else None
    )
    incl = (
        np.asarray(partition.include, dtype=np.int64)
        if partition.include is not None
        else None
    )
    f = pq.ParquetFile(partition.path)
    offset = 0
    for batch in f.iter_batches():
        n_physical = batch.num_rows
        if incl is not None:
            local = incl[(incl >= offset) & (incl < offset + n_physical)]
            mask = np.zeros(n_physical, dtype=bool)
            mask[local - offset] = True
            batch = batch.filter(pa.array(mask))
        elif excl is not None:
            local = excl[(excl >= offset) & (excl < offset + n_physical)]
            if len(local):
                mask = np.ones(n_physical, dtype=bool)
                mask[local - offset] = False
                batch = batch.filter(pa.array(mask))
        offset += n_physical
        if batch.num_rows == 0:
            continue
        n = batch.num_rows
        cols = {}
        for i, raw_name in enumerate(batch.schema.names):
            cols[partition.colmap.get(raw_name, raw_name)] = (
                batch.column(i)
            )
        cols[CHANGE_TYPE] = pa.array(
            [partition.change_type] * n, type=pa.string()
        )
        cols[COMMIT_SNAPSHOT] = pa.array(
            [partition.snapshot_id] * n, type=pa.int64()
        )
        for name in names:
            if name not in cols:  # later-added columns: typed NULLs
                cols[name] = pa.nulls(n, type=types[name])
        yield pa.RecordBatch.from_arrays(
            [cols[name].cast(types[name]) for name in names],
            names=names,
        )


class IcebergLogReader(DataSourceReader):
    """Batch changelog through the datasource API: options
    ``startingSnapshot`` (exclusive; default: the whole lineage) /
    ``endingSnapshot`` (inclusive, default head)."""

    def __init__(self, options: dict, schema_json: str):
        self.options = dict(options)
        self.schema_json = schema_json

    def partitions(self):
        location = _location(self.options)
        t = _table(location)
        md = t._metadata()
        lo = self.options.get("startingsnapshot")
        hi = self.options.get("endingsnapshot")
        start = int(lo) if lo is not None else None
        end = (
            int(hi)
            if hi is not None
            else md.get("current-snapshot-id")
        )
        out = []
        for sid in _chain(md, start, end):
            out.extend(
                _snapshot_partitions(t, md, sid, self.schema_json)
            )
        return out or [
            _IceLogPartition("", self.schema_json, "insert", 0, {})
        ]

    def read(self, partition):
        yield from _read_icelog_batches(partition)


class IcebergLogStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict, schema_json: str):
        self.options = dict(options)
        self.schema_json = schema_json
        self.location = _location(options)

    def initialOffset(self) -> dict:
        # first batch replays the whole main lineage as its history
        return {"snapshot": None}

    def latestOffset(self) -> dict:
        md = _table(self.location)._metadata()
        return {"snapshot": md.get("current-snapshot-id")}

    def partitions(self, start: dict, end: dict):
        t = _table(self.location)
        md = t._metadata()
        out = []
        for sid in _chain(md, start["snapshot"], end["snapshot"]):
            out.extend(
                _snapshot_partitions(t, md, sid, self.schema_json)
            )
        return out or [
            _IceLogPartition("", self.schema_json, "insert", 0, {})
        ]

    def read(self, partition):
        yield from _read_icelog_batches(partition)

    def commit(self, end: dict) -> None:
        pass  # offsets are durable snapshot ids


class IcebergLogDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "iceberglog"

    def schema(self):
        return StructType.fromJson(
            json.loads(_schema_json(_location(self.options)))
        )

    def reader(self, schema):
        return IcebergLogReader(
            self.options, _schema_json(_location(self.options))
        )

    def streamReader(self, schema):
        return IcebergLogStreamReader(
            self.options, _schema_json(_location(self.options))
        )


def register_iceberglog_source(spark) -> None:
    try:
        spark.dataSource.register(IcebergLogDataSource)
    except Exception:
        pass  # already registered on this session
