"""Spark 4 Python DataSource serving Hudi INCREMENTAL QUERIES as a
stream — ``spark.readStream.format("hudiincr")`` — plus the matching
batch reader, completing the trio's incremental-consumption story:
Delta has append streaming ("deltalog") and streaming CDF ("deltacdf",
r11); this is ``hoodie.datasource.query.type=incremental`` re-derived
for the from-scratch layout (the consumption mode the reference's Hudi
leg exists to feed — hudi/hudi_scd_script.py:72-74's upsert pipeline
is exactly what downstreams tail incrementally).

Offsets are TIMELINE INSTANTS (fixed-width timestamps — they sort
lexicographically and checkpoint as strings; exactly-once through the
Structured Streaming offset log, the deltacdf contract). Each
micro-batch serves the rows committed in ``(start, end]`` with batch
``read_incremental`` semantics:

* per file group, only the LATEST slice among the range's commits is
  planned (earlier in-range slices of the same group are superseded —
  their surviving rows ride the later slice with their original
  stamps);
* a clustering REPLACECOMMIT inside the range retires the groups it
  replaced (their in-range rows are served once, from the new slices,
  never twice);
* the executor filters rows to ``_hoodie_commit_time > start`` —
  carried-over rows in a rewritten slice keep their old stamp and drop
  out, Hudi's incremental-query contract.

Every row carries the table's own ``_hoodie_*`` meta columns (they
live IN the base files) plus ``_hoodie_file_name`` as a per-partition
constant. One input partition per file slice; Arrow-batched end to
end, no per-row Python.

MERGE_ON_READ tables stream too (r12 second half): the per-batch
plan emits ONE task per file group the range's deltacommits touched,
and the task merges that group's base + log stack executor-side by
record key — max-precombine winner, commit-time tiebreak, winning
tombstones dropped — exactly the engine's realtime-merge rule, in the
shape Hudi's own realtime reader uses (per-group merge, memory
bounded by one file group). Untouched groups never enter the plan.

Scale: offset resolution lists the timeline (one JSON per commit);
planning touches only the range's commit metadata, so a micro-batch
costs O(changed file groups), never O(table).
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
from pyspark.sql.types import StringType, StructType


class _HudiIncrPartition(InputPartition):
    def __init__(self, path: str, schema_json: str, begin: str):
        self.path = path
        self.schema_json = schema_json
        self.begin = begin


class _HudiMorIncrPartition(InputPartition):
    """One HOT file group's merge task (MoR): base + stacked logs at
    the batch's end instant, merged executor-side by record key —
    Hudi's own realtime-reader shape, one group per task."""

    def __init__(
        self,
        base: str | None,
        logs: list[str],
        schema_json: str,
        begin: str,
        record_key: str,
        precombine: str,
    ):
        self.base = base
        self.logs = logs
        self.schema_json = schema_json
        self.begin = begin
        self.record_key = record_key
        self.precombine = precombine


def _location(options: dict) -> str:
    location = options.get("location", "").rstrip("/")
    if not location:
        raise ValueError("hudiincr source requires option 'location'")
    props = os.path.join(location, ".hoodie", "hoodie.properties")
    if not os.path.exists(props):
        raise FileNotFoundError(f"no hudi table at {location}")
    return location


def _timeline(location: str) -> "object":
    """A driver-side table handle for timeline replay (pure file IO —
    no executor work, so no live SparkSession needed). Opens with the
    matching class so MoR slice replay is available."""
    from .hudi_layout import HudiCowTable, HudiMorTable

    props = os.path.join(location, ".hoodie", "hoodie.properties")
    stored = dict(
        line.strip().split("=", 1) for line in open(props) if "=" in line
    )
    cls = (
        HudiMorTable
        if stored.get("hoodie.table.type") == "MERGE_ON_READ"
        else HudiCowTable
    )
    return cls(None, location)


def _schema_json(location: str) -> str:
    """Table schema = newest base file's parquet schema (the layout
    stores no schema doc; files are the schema authority, like Hudi's
    own commit-metadata schema strings derive from the written files)
    + _hoodie_file_name (a read-time column in the engine's scans)."""
    import pyarrow.parquet as pq

    from pyspark.sql.pandas.types import from_arrow_schema

    from .hudi_layout import HudiMorTable
    from pyspark.sql.types import StructType as _ST

    t = _timeline(location)
    if isinstance(t, HudiMorTable):
        ms = t._mor_slices()
        cands = [s["base"] for s in ms.values() if s["base"]] or [
            p for s in ms.values() for p in s["logs"]
        ]
    else:
        cands = list(t._file_slices().values())
    if not cands:
        raise ValueError(f"empty hudi table at {location}")
    newest = max(cands)
    arrow = pq.read_schema(os.path.join(location, newest))
    schema = from_arrow_schema(arrow)
    # upsert-written slices MATERIALIZE _hoodie_file_name (the merge
    # input carried it); bulk-insert slices don't. Either way the
    # column is recomputed per partition (the stored value names the
    # slice the row was merged FROM, not the file serving it). The
    # MoR tombstone marker never leaves the read path.
    schema = _ST(
        [f for f in schema.fields if f.name != "_hoodie_is_deleted"]
    )
    if "_hoodie_file_name" not in schema.fieldNames():
        schema = schema.add("_hoodie_file_name", StringType())
    return schema.json()


def _mor_range_partitions(
    t, start: str, end: str, schema_json: str
) -> list:
    """MoR planning: file groups TOUCHED by the range's delta/commits
    merge executor-side (base + the group's full log stack at ``end``
    — winners need total slice state), then filter to stamps in range;
    untouched groups cost nothing. One task per hot group — memory is
    bounded by a file group, the same bound Hudi's realtime reader
    has."""
    insts = [i for i in t.instants() if start < i <= end]
    if not insts:
        return []
    fids: set[str] = set()
    for ti in insts:
        meta = t._commit_meta(ti)
        for _part, stats in meta["partitionToWriteStats"].items():
            fids.update(st["fileId"] for st in stats)
    # raw log-stack fileIds name their group's base id (fg-N); slices
    # at the END instant bound what the merge may see
    slices = t._mor_slices(end)
    out = []
    for (part, fid), s in sorted(slices.items()):
        if fid not in fids:
            continue
        out.append(
            _HudiMorIncrPartition(
                os.path.join(t.location, s["base"])
                if s["base"]
                else None,
                [os.path.join(t.location, p) for p in s["logs"]],
                schema_json,
                start,
                t.record_key,
                t.precombine_field,
            )
        )
    return out


def _range_partitions(
    location: str, start: str, end: str, schema_json: str
) -> list:
    """Partition descriptors for the commits in (start, end]: latest
    slice per file group among the range's commits, clustering-retired
    groups dropped — planned driver-side from commit metadata only.
    MoR tables route to the per-group merge planning."""
    from .hudi_layout import HudiMorTable

    t = _timeline(location)
    if isinstance(t, HudiMorTable):
        return _mor_range_partitions(t, start, end, schema_json)
    insts = [i for i in t.instants() if start < i <= end]
    slices: dict[tuple, str] = {}
    for ti in insts:
        meta = t._commit_meta(ti)
        for part, fid in meta.get("replacedFileGroups", []):
            slices.pop((part, fid), None)
        for part, stats in meta["partitionToWriteStats"].items():
            for st in stats:
                slices[(part, st["fileId"])] = st["path"]
    return [
        _HudiIncrPartition(
            os.path.join(location, p), schema_json, start
        )
        for p in sorted(slices.values())
    ]


def _read_incr_batches(partition):
    """Executor path: scan one base file, keep rows stamped strictly
    after the batch's start instant (Arrow compute, no row loop),
    append _hoodie_file_name, align to the declared schema."""
    if not partition.path:
        return
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from pyspark.sql.pandas.types import to_arrow_type

    schema = StructType.fromJson(json.loads(partition.schema_json))
    names = [f.name for f in schema.fields]
    types = {f.name: to_arrow_type(f.dataType) for f in schema.fields}
    fname = os.path.basename(partition.path)
    f = pq.ParquetFile(partition.path)
    for batch in f.iter_batches():
        if partition.begin:
            mask = pc.greater(
                batch.column(
                    batch.schema.names.index("_hoodie_commit_time")
                ),
                pa.scalar(partition.begin),
            )
            batch = batch.filter(mask)
        if batch.num_rows == 0:
            continue
        n = batch.num_rows
        cols = {
            name: batch.column(i)
            for i, name in enumerate(batch.schema.names)
        }
        cols["_hoodie_file_name"] = pa.array(
            [fname] * n, type=pa.string()
        )
        for name in names:
            if name not in cols:  # late-added columns: typed NULLs
                cols[name] = pa.nulls(n, type=types[name])
        yield pa.RecordBatch.from_arrays(
            [cols[name].cast(types[name]) for name in names],
            names=names,
        )


def _read_mor_incr_batches(partition):
    """Executor path for one MoR file group: read base + logs
    (pyarrow), pick each key's winner by (precombine, commit time) —
    exactly ``upsert_by_key`` with ``_hoodie_commit_time`` priority,
    the engine's realtime-merge rule — drop winning tombstones, keep
    rows stamped after the batch start, align to the declared
    schema. Pandas group-merge over ONE file group per task."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql.pandas.types import to_arrow_type

    schema = StructType.fromJson(json.loads(partition.schema_json))
    names = [f.name for f in schema.fields]
    types = {f.name: to_arrow_type(f.dataType) for f in schema.fields}
    frames = []
    for p in ([partition.base] if partition.base else []) + list(
        partition.logs
    ):
        pdf = pq.read_table(p).to_pandas()
        pdf["_hoodie_file_name"] = os.path.basename(p)
        if "_hoodie_is_deleted" not in pdf.columns:
            pdf["_hoodie_is_deleted"] = False
        frames.append(pdf)
    if not frames:
        return
    df = pd.concat(frames, ignore_index=True, sort=False)
    df["_hoodie_is_deleted"] = (
        df["_hoodie_is_deleted"].fillna(False).astype(bool)
    )
    df = df.sort_values(
        [partition.precombine, "_hoodie_commit_time"],
        ascending=False,
        kind="mergesort",
    ).drop_duplicates(partition.record_key, keep="first")
    df = df[~df["_hoodie_is_deleted"]]
    if partition.begin:
        df = df[df["_hoodie_commit_time"] > partition.begin]
    if df.empty:
        return
    arrays = []
    n = len(df)
    for name in names:
        if name in df.columns:
            arrays.append(
                pa.Array.from_pandas(df[name], type=types[name])
            )
        else:
            arrays.append(pa.nulls(n, type=types[name]))
    yield pa.RecordBatch.from_arrays(arrays, names=names)


def _read_dispatch(partition):
    if isinstance(partition, _HudiMorIncrPartition):
        yield from _read_mor_incr_batches(partition)
    else:
        yield from _read_incr_batches(partition)


class HudiIncrReader(DataSourceReader):
    """Batch incremental pull through the datasource API: options
    ``startingInstant`` (exclusive, default "" = everything) /
    ``endingInstant`` (inclusive, default head)."""

    def __init__(self, options: dict, schema_json: str):
        self.options = dict(options)
        self.schema_json = schema_json

    def partitions(self):
        location = _location(self.options)
        insts = _timeline(location).instants()
        # Spark lowercases datasource option keys
        lo = self.options.get("startinginstant", "")
        hi = self.options.get(
            "endinginstant", insts[-1] if insts else ""
        )
        out = _range_partitions(location, lo, hi, self.schema_json)
        return out or [_HudiIncrPartition("", self.schema_json, "")]

    def read(self, partition):
        yield from _read_dispatch(partition)


class HudiIncrStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict, schema_json: str):
        self.options = dict(options)
        self.schema_json = schema_json
        self.location = _location(options)

    def initialOffset(self) -> dict:
        # the first batch replays the whole table as its own history
        return {"instant": ""}

    def latestOffset(self) -> dict:
        insts = _timeline(self.location).instants()
        return {"instant": insts[-1] if insts else ""}

    def partitions(self, start: dict, end: dict):
        out = _range_partitions(
            self.location,
            start["instant"],
            end["instant"],
            self.schema_json,
        )
        return out or [_HudiIncrPartition("", self.schema_json, "")]

    def read(self, partition):
        yield from _read_dispatch(partition)

    def commit(self, end: dict) -> None:
        pass  # offsets are durable timeline instants


class HudiIncrDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "hudiincr"

    def schema(self):
        return StructType.fromJson(
            json.loads(_schema_json(_location(self.options)))
        )

    def reader(self, schema):
        return HudiIncrReader(
            self.options, _schema_json(_location(self.options))
        )

    def streamReader(self, schema):
        return HudiIncrStreamReader(
            self.options, _schema_json(_location(self.options))
        )


def register_hudiincr_source(spark) -> None:
    try:
        spark.dataSource.register(HudiIncrDataSource)
    except Exception:
        pass  # already registered on this session
