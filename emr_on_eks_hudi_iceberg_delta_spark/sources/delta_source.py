"""Spark 4 Python DataSource over the Delta-protocol table —
``spark.read.format("deltalog")`` and
``spark.readStream.format("deltalog")``.

The batch reader serves a snapshot (option ``version`` time-travels);
the STREAM reader tails the transaction log itself: offsets are commit
versions, and a micro-batch's rows are exactly the files the commits in
(start, end] ADDED with ``dataChange: true`` — the log records this
explicitly, so unlike the vtable stream (which must diff file listings)
append detection is exact, OPTIMIZE commits (``dataChange: false``
adds) are correctly SKIPPED as no-ops, and any commit that removes data
(overwrite, delete) raises loudly — its row-level delta is not
derivable from files, the same restriction Delta's own CDF-less
streaming source has.

Partition columns live only in ``partitionValues`` (never the data
files, per protocol), so each Arrow batch gets them appended as typed
constant columns — resolved through the table's ``schemaString`` via
Spark's own type mapping — and reordered to the declared schema.

Scale: offset resolution reads only the commit JSONs; one input
partition per data file, Arrow-batched end to end (pyarrow
``iter_batches`` straight into Spark's Arrow ingestion, no per-row
Python).
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


class _DeltaFilePartition(InputPartition):
    def __init__(
        self,
        path: str,
        pvals: dict,
        schema_json: str,
        deleted: list[int] | None = None,
    ):
        self.path = path
        self.pvals = pvals
        self.schema_json = schema_json
        #: sorted row indexes the file's deletion vector masks out
        self.deleted = deleted or []


def _read_partition_batches(partition):
    """Shared batch/stream executor path: scan one parquet file,
    mask any deletion-vector row positions (running batch offset +
    numpy boolean mask — Arrow-native, no row loop), and append the
    partition-value columns as typed constants, reordered to the
    declared schema."""
    if not partition.path:
        return
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql.pandas.types import to_arrow_type

    schema = StructType.fromJson(json.loads(partition.schema_json))
    names = [f.name for f in schema.fields]
    types = {f.name: to_arrow_type(f.dataType) for f in schema.fields}
    dels = (
        np.asarray(partition.deleted, dtype=np.int64)
        if partition.deleted
        else None
    )
    f = pq.ParquetFile(partition.path)
    offset = 0
    for batch in f.iter_batches():
        n_physical = batch.num_rows
        if dels is not None:
            local = dels[(dels >= offset) & (dels < offset + n_physical)]
            if len(local):
                mask = np.ones(n_physical, dtype=bool)
                mask[local - offset] = False
                batch = batch.filter(pa.array(mask))
        offset += n_physical
        if batch.num_rows == 0:
            continue
        cols = {name: batch.column(i) for i, name in
                enumerate(batch.schema.names)}
        n = batch.num_rows
        for c, raw in partition.pvals.items():
            pa_t = types[c]
            if raw is None:
                arr = pa.nulls(n, type=pa_t)
            else:
                arr = pa.array([raw] * n, type=pa.string()).cast(pa_t)
            cols[c] = arr
        for name in names:
            # schema evolution: files written before a column existed
            # serve typed NULLs, same as the explicit-schema JVM scan
            if name not in cols:
                cols[name] = pa.nulls(n, type=types[name])
        yield pa.RecordBatch.from_arrays(
            [cols[name].cast(types[name]) for name in names], names=names
        )


def _log_dir(options: dict) -> str:
    location = options.get("location", "").rstrip("/")
    if not location:
        raise ValueError("deltalog source requires option 'location'")
    return location


class DeltaLogReader(DataSourceReader):
    def __init__(self, options: dict, schema_json: str):
        self.options = dict(options)
        self.schema_json = schema_json

    def partitions(self):
        from .delta_log import DeltaLogTable

        location = _log_dir(self.options)
        dt = _table(self.options)
        version = self.options.get("version")
        live, meta, _ = dt._replay(
            int(version) if version is not None else None
        )
        from . import dv as dv_io

        parts = [
            _DeltaFilePartition(
                os.path.join(location, a["path"]),
                a.get("partitionValues", {}),
                self.schema_json,
                deleted=(
                    dv_io.read_dv(location, a["deletionVector"])
                    if a.get("deletionVector")
                    else None
                ),
            )
            for a in live.values()
        ]
        return parts or [_DeltaFilePartition("", {}, self.schema_json)]

    def read(self, partition):
        yield from _read_partition_batches(partition)


def _table(options: dict):
    # the driver-side SparkSession is irrelevant for log replay (pure
    # file IO), so construct with the active session lazily
    from pyspark.sql import SparkSession

    from .delta_log import DeltaLogTable

    return DeltaLogTable(
        SparkSession.getActiveSession(), _log_dir(options)
    )


class DeltaLogStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict, schema_json: str):
        self.options = dict(options)
        self.schema_json = schema_json
        self.location = _log_dir(options)

    def _versions(self) -> list[int]:
        logdir = os.path.join(self.location, "_delta_log")
        if not os.path.isdir(logdir):
            raise FileNotFoundError(f"no delta log at {self.location}")
        return sorted(
            int(f[:-5])
            for f in os.listdir(logdir)
            if f.endswith(".json") and f[:-5].isdigit()
        )

    def initialOffset(self) -> dict:
        # before the first commit: the first batch replays the table
        return {"version": -1}

    def latestOffset(self) -> dict:
        versions = self._versions()
        return {"version": versions[-1] if versions else -1}

    def partitions(self, start: dict, end: dict):
        out = []
        for v in self._versions():
            if not (start["version"] < v <= end["version"]):
                continue
            path = os.path.join(
                self.location, "_delta_log", f"{v:020d}.json"
            )
            with open(path) as f:
                for line in f:
                    if not line.strip():
                        continue
                    action = json.loads(line)
                    if "remove" in action and action["remove"].get(
                        "dataChange", True
                    ):
                        raise ValueError(
                            f"commit v{v} removes data — not an append;"
                            " the deltalog stream serves append-only"
                            " tables (OPTIMIZE's dataChange=false"
                            " commits are fine and skipped)"
                        )
                    if "add" in action and action["add"].get(
                        "dataChange", True
                    ):
                        out.append(
                            _DeltaFilePartition(
                                os.path.join(
                                    self.location, action["add"]["path"]
                                ),
                                action["add"].get("partitionValues", {}),
                                self.schema_json,
                            )
                        )
        return out or [_DeltaFilePartition("", {}, self.schema_json)]

    def read(self, partition):
        yield from _read_partition_batches(partition)

    def commit(self, end: dict) -> None:
        pass  # offsets are durable log versions


class DeltaLogDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "deltalog"

    def _schema_json(self) -> str:
        dt = _table(self.options)
        _, meta, _ = dt._replay()
        return meta["schemaString"]

    def schema(self):
        return StructType.fromJson(json.loads(self._schema_json()))

    def reader(self, schema):
        return DeltaLogReader(self.options, self._schema_json())

    def streamReader(self, schema):
        return DeltaLogStreamReader(self.options, self._schema_json())


def register_deltalog_source(spark) -> None:
    try:
        spark.dataSource.register(DeltaLogDataSource)
    except Exception:
        pass  # already registered on this session
