"""Spark 4 Python DataSource serving the Delta CHANGE DATA FEED as a
stream — ``spark.readStream.format("deltacdf")`` — plus the matching
batch reader, completing the CDC surface's LAST leg: batch CDF
(delta_cdf.table_changes), batch changelogs for all three formats, and
append-only streaming (delta_source's "deltalog") all exist; this is
``readStream.option("readChangeFeed", "true")`` re-derived for the
log-native table.

Offsets are COMMIT VERSIONS (checkpointable, exactly the "deltalog"
stream's contract); each micro-batch serves the row-level change
events of the commits in (start, end] with the same attribution rules
as the batch ``table_changes``:

* commits with ``cdc`` actions (DML under CDF) → the .cdc files are
  read directly — they carry ``_change_type`` per row (inserts,
  deletes, update_preimage/update_postimage);
* add-only commits (appends) → each added file's rows as ``insert``;
* remove-only commits (CoW DELETE without cdc) → the removed files'
  rows as ``delete`` (their parquet must still exist — pre-VACUUM);
* add+remove commits WITHOUT cdc actions predate CDF and refuse
  loudly, exactly like the batch reader;
* ``dataChange: false`` commits (OPTIMIZE) are no-ops.

Every event row carries ``_change_type``, ``_commit_version``,
``_commit_timestamp`` appended to the table schema. Deletion-vector
masks apply through the shared Arrow batch path (row positions ride
the partition descriptor). Column-mapped tables refuse (the Arrow
path resolves columns by LOGICAL name).

Scale: offset resolution reads only commit JSONs; one input partition
per changed file; Arrow-batched end to end, no per-row Python.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
)
from pyspark.sql.types import LongType, StringType, StructType

from .delta_source import (
    _DeltaFilePartition,
    _log_dir,
    _read_partition_batches,
    _table,
)

CHANGE_TYPE = "_change_type"


def _cdf_schema_json(options: dict) -> str:
    dt = _table(options)
    _, meta, _ = dt._replay()
    from .delta_colmap import mapping_enabled

    if mapping_enabled(meta):
        raise ValueError(
            "the deltacdf source does not serve column-mapped tables "
            "(the Arrow path resolves columns by logical name) — use "
            "table_changes() batch CDF instead"
        )
    schema = StructType.fromJson(json.loads(meta["schemaString"]))
    schema = (
        schema.add(CHANGE_TYPE, StringType())
        .add("_commit_version", LongType())
        .add("_commit_timestamp", LongType())
    )
    return schema.json()


def _commit_partitions(
    location: str, v: int, schema_json: str
) -> list:
    """Partition descriptors for one commit's change events — the
    same attribution rules as delta_cdf._table_changes, planned
    driver-side from the commit JSON only."""
    from . import dv as dv_io
    from .delta_log import DeltaLogTable, _commit_path
    from pyspark.sql import SparkSession

    path = _commit_path(location, v)
    acts = []
    with open(path) as f:
        for line in f:
            if line.strip():
                acts.append(json.loads(line))
    cdcs = [a["cdc"] for a in acts if "cdc" in a]
    adds = [
        a["add"]
        for a in acts
        if "add" in a and a["add"].get("dataChange", True)
    ]
    removes = [
        a["remove"]
        for a in acts
        if "remove" in a and a["remove"].get("dataChange", True)
    ]
    ts = int(os.path.getmtime(path) * 1000)
    consts = {
        "_commit_version": str(v),
        "_commit_timestamp": str(ts),
    }

    def part(a: dict, change: str | None) -> _DeltaFilePartition:
        pvals = dict(a.get("partitionValues", {}))
        pvals.update(consts)
        if change is not None:
            pvals[CHANGE_TYPE] = change
        return _DeltaFilePartition(
            os.path.join(location, a["path"]),
            pvals,
            schema_json,
            deleted=(
                dv_io.read_dv(location, a["deletionVector"])
                if a.get("deletionVector")
                else None
            ),
        )

    if cdcs:
        # .cdc files CARRY _change_type per row
        return [part(c, None) for c in cdcs]
    if adds and not removes:
        return [part(a, "insert") for a in adds]
    if removes and not adds:
        dt = DeltaLogTable(SparkSession.getActiveSession(), location)
        prior, _, _ = dt._replay(v - 1)
        gone = [
            prior[r["path"]] for r in removes if r["path"] in prior
        ]
        missing = [
            a["path"]
            for a in gone
            if not os.path.exists(os.path.join(location, a["path"]))
        ]
        if missing:
            raise ValueError(
                f"commit {v}: removed files {missing[:3]} were "
                "VACUUMed — this derived CDF range is no longer "
                "reconstructable"
            )
        return [part(a, "delete") for a in gone]
    if adds and removes:
        raise ValueError(
            f"commit {v} rewrites files without change-data actions "
            "— it predates CDF being enabled, so its row-level "
            "changes were never recorded"
        )
    return []  # metadata-only commit


def _versions(location: str) -> list[int]:
    logdir = os.path.join(location, "_delta_log")
    if not os.path.isdir(logdir):
        raise FileNotFoundError(f"no delta log at {location}")
    return sorted(
        int(f[:-5])
        for f in os.listdir(logdir)
        if f.endswith(".json") and f[:-5].isdigit()
    )


class DeltaCdfReader(DataSourceReader):
    """Batch CDF through the datasource API: options
    ``startingVersion`` (default 0) / ``endingVersion`` (default
    head)."""

    def __init__(self, options: dict, schema_json: str):
        self.options = dict(options)
        self.schema_json = schema_json

    def partitions(self):
        location = _log_dir(self.options)
        versions = _versions(location)
        # Spark lowercases datasource option keys
        lo = int(self.options.get("startingversion", 0))
        hi = int(
            self.options.get(
                "endingversion", versions[-1] if versions else -1
            )
        )
        out = []
        for v in versions:
            if lo <= v <= hi:
                out.extend(
                    _commit_partitions(location, v, self.schema_json)
                )
        return out or [_DeltaFilePartition("", {}, self.schema_json)]

    def read(self, partition):
        yield from _read_partition_batches(partition)


class DeltaCdfStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict, schema_json: str):
        self.options = dict(options)
        self.schema_json = schema_json
        self.location = _log_dir(options)

    def initialOffset(self) -> dict:
        # the first batch replays the whole change history
        return {"version": -1}

    def latestOffset(self) -> dict:
        versions = _versions(self.location)
        return {"version": versions[-1] if versions else -1}

    def partitions(self, start: dict, end: dict):
        out = []
        for v in _versions(self.location):
            if start["version"] < v <= end["version"]:
                out.extend(
                    _commit_partitions(
                        self.location, v, self.schema_json
                    )
                )
        return out or [_DeltaFilePartition("", {}, self.schema_json)]

    def read(self, partition):
        yield from _read_partition_batches(partition)

    def commit(self, end: dict) -> None:
        pass  # offsets are durable log versions


class DeltaCdfDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "deltacdf"

    def schema(self):
        return StructType.fromJson(
            json.loads(_cdf_schema_json(self.options))
        )

    def reader(self, schema):
        return DeltaCdfReader(
            self.options, _cdf_schema_json(self.options)
        )

    def streamReader(self, schema):
        return DeltaCdfStreamReader(
            self.options, _cdf_schema_json(self.options)
        )


def register_deltacdf_source(spark) -> None:
    try:
        spark.dataSource.register(DeltaCdfDataSource)
    except Exception:
        pass  # already registered on this session
