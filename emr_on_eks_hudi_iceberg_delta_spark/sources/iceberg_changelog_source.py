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
* EQUALITY deletes (r12): key sets read driver-side (bounded by the
  key files' record counts, capped like every pair broadcast) ride
  the partition descriptors; the Arrow path applies them as
  vectorized null-safe pandas merges — new key files emit the parent
  state's matching rows as ``delete`` events, and parent-live key
  files mask already-deleted rows out of removed-file events with the
  read path's sequence-number applicability. The streaming-upsert
  table shape (``stream_to_iceberg_upsert``'s one-snapshot
  eq-delete+data commits) streams end to end; ranges whose key sets
  exceed the ship cap refuse loudly toward the batch ``changes()``.

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
        eq_exclude: list | None = None,
        eq_include: tuple | None = None,
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
        #: (cols, keys) masks of LIVE equality deletes already applied
        #: to the parent state (seq-qualified by the planner): rows
        #: matching any of them are dropped before emitting
        self.eq_exclude = eq_exclude or []
        #: (cols, keys) of ONE new equality-delete file: rows kept
        #: EXCLUSIVELY when matching (the delete-event key semi-join)
        self.eq_include = eq_include


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


def _eq_key_set(t, md: dict, entry: dict) -> tuple:
    """(current-name key columns, deduped key tuples) of one
    equality-delete file — driver-side pyarrow read, bounded by the
    key file's record count (the same set every reader ships). Column
    names resolve POSITIONALLY through equality_ids to the CURRENT
    schema (the batch changes() ``.toDF(*cols)`` rule)."""
    import pyarrow.parquet as pq

    cols = t._eq_cols_of(md, entry)
    tbl = pq.read_table(entry["data_file"]["file_path"])
    keys = {
        tuple(vals)
        for vals in zip(
            *[tbl.column(i).to_pylist() for i in range(tbl.num_columns)]
        )
    }
    return (
        tuple(cols),
        sorted(keys, key=lambda x: tuple((v is not None, v) for v in x)),
    )


def _snapshot_partitions(
    t, md: dict, sid: int, schema_json: str, eq_cap: int | None = None
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
    par_eq = [
        e
        for e in par_dels
        if e["data_file"].get("content") == CONTENT_EQ_DELETES
    ]
    new_dels = [
        e
        for e in t._entries(sid, content=CONTENT_POS_DELETES)
        if e["status"] == STATUS_ADDED and e["snapshot_id"] == sid
    ]
    new_eq = [
        e
        for e in new_dels
        if e["data_file"].get("content") == CONTENT_EQ_DELETES
    ]
    # EQUALITY deletes (r12): key sets ride the partition descriptors
    # (read driver-side like pos-delete pairs, bounded by the key
    # files' own record counts) and the Arrow path applies them as
    # vectorized null-safe merges — the same per-file semi-join the
    # batch changes() plans, without a Spark job in the planner. Ship
    # size is capped like every pair broadcast in this repo.
    from .iceberg_deletes import POS_DELETE_BROADCAST_MAX_PAIRS
    from .iceberg_layout import seq_of_snapshot

    involved_eq = (par_eq if (removed or new_eq) else []) + new_eq
    total_eq = sum(
        e["data_file"].get("record_count", 0) for e in involved_eq
    )
    if total_eq > (
        eq_cap if eq_cap is not None else POS_DELETE_BROADCAST_MAX_PAIRS
    ):
        raise ValueError(
            "iceberglog: the range's EQUALITY-delete key sets "
            f"({total_eq} records) exceed the partition-descriptor "
            "ship cap — use the batch changes() for this range"
        )
    _eq_cache: dict[str, tuple] = {}

    def eq_keys(entry) -> tuple:
        fp = entry["data_file"]["file_path"]
        if fp not in _eq_cache:
            _eq_cache[fp] = _eq_key_set(t, md, entry)
        return _eq_cache[fp]

    def eq_masks_for(file_seq: int) -> list:
        # equality deletes mask only files with a STRICTLY smaller
        # data sequence number — the read path's applicability rule
        return [
            eq_keys(ee)
            for ee in par_eq
            if seq_of_snapshot(md, ee["snapshot_id"]) > file_seq
        ]

    par_pos_paths = [
        e["data_file"]["file_path"]
        for e in par_dels
        if e["data_file"].get("content", CONTENT_POS_DELETES)
        == CONTENT_POS_DELETES
    ]
    par_masks = (
        _pair_positions(par_pos_paths)
        if (par_pos_paths and (removed or new_eq))
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
                eq_exclude=eq_masks_for(
                    seq_of_snapshot(md, e["snapshot_id"])
                ),
            )
        )
    # deletes from NEW equality-delete files: the parent STATE's rows
    # matching the key set (the batch changes() shape — one event set
    # per key file, parent pos/eq deletes applied first)
    for de in new_eq:
        cols, keys = eq_keys(de)
        if not keys:
            continue
        for e in par_entries:
            fp = e["data_file"]["file_path"]
            parts.append(
                _IceLogPartition(
                    fp,
                    schema_json,
                    "delete",
                    sid,
                    _colmap_for(md, e, target),
                    exclude=par_masks.get(os.path.basename(fp)),
                    eq_exclude=eq_masks_for(
                        seq_of_snapshot(md, e["snapshot_id"])
                    ),
                    eq_include=(cols, keys),
                )
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
        if partition.eq_exclude or partition.eq_include is not None:
            # equality-delete key masks: vectorized null-safe pandas
            # merges against the shipped key sets (NaN/None keys match
            # in pandas merges — the read path's eqNullSafe), columns
            # resolved back to WRITE-TIME names through the colmap
            import pandas as pd

            inv = {v: k for k, v in partition.colmap.items()}
            raw_names = list(batch.schema.names)

            def key_mask(cols_keys):
                kcols, keys = cols_keys
                data = {}
                for c in kcols:
                    raw = inv.get(c, c)
                    if raw in raw_names:
                        data[c] = (
                            batch.column(raw_names.index(raw))
                            .to_pandas()
                            .astype(object)
                        )
                    else:  # column added after this file: NULL keys
                        data[c] = pd.Series(
                            [None] * batch.num_rows, dtype=object
                        )
                left = pd.DataFrame(data)
                right = pd.DataFrame(
                    keys, columns=list(kcols), dtype=object
                ).drop_duplicates()
                merged = left.merge(
                    right,
                    on=list(kcols),
                    how="left",
                    indicator=True,
                )
                return (merged["_merge"] == "both").to_numpy()

            keep = np.ones(batch.num_rows, dtype=bool)
            for ck in partition.eq_exclude:
                keep &= ~key_mask(ck)
            if partition.eq_include is not None:
                keep &= key_mask(partition.eq_include)
            if not keep.all():
                batch = batch.filter(pa.array(keep))
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



def _eq_cap_opt(options: dict) -> int | None:
    """Optional ``eqShipCap`` option: overrides the default key-set
    ship cap (POS_DELETE_BROADCAST_MAX_PAIRS) — mostly a test knob,
    but a legitimate guard for memory-constrained executors."""
    raw = options.get("eqshipcap")
    return int(raw) if raw is not None else None


class IcebergLogReader(DataSourceReader):
    """Batch changelog through the datasource API: options
    ``startingSnapshot`` (exclusive; default: the whole lineage) /
    ``endingSnapshot`` (inclusive, default head)."""

    def __init__(self, options: dict, schema_json: str):
        self.options = dict(options)
        self.schema_json = schema_json

    def _eq_cap(self):
        return _eq_cap_opt(self.options)

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
                _snapshot_partitions(
                    t, md, sid, self.schema_json,
                    eq_cap=self._eq_cap(),
                )
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

    def _eq_cap(self):
        return _eq_cap_opt(self.options)

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
                _snapshot_partitions(
                    t, md, sid, self.schema_json,
                    eq_cap=self._eq_cap(),
                )
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
