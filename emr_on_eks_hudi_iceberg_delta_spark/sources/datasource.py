"""Spark 4 Python DataSource exposing VersionedTable snapshots.

``spark.read.format("vtable").option("location", ...)`` — the engine's
table store surfaced through Spark's native source API (the integration
point the reference gets from its format plugins' DataSource
registrations, e.g. ``hudi`` / ``iceberg`` / ``delta`` format names in
``hudi/hudi_scd_script.py:66-70``). Options:

* ``location`` (required) — the table root;
* ``version`` — time travel to a snapshot id (default: published head);
* ``timestamp`` — time travel to the newest snapshot committed at or
  before 'YYYY-MM-DD HH:MM:SS' UTC (``read_as_of`` parity); mutually
  exclusive with ``version``.

Design constraints, stated honestly:

* The source serves the snapshot's RAW DATA FILES. A snapshot carrying
  pending merge-on-read state (keyed tombstones / deletion vectors) is
  REFUSED — applying them needs joins, which a leaf source cannot run;
  ``VersionedTable.read()`` is the full-fidelity path, and compaction
  folds MoR state so the source works again. Refusing loudly beats
  silently resurrecting deleted rows.
* Reading is Arrow-batched (``pyarrow.parquet`` ``iter_batches`` straight
  into Spark's Arrow ingestion — no per-row Python), one input partition
  per parquet file, so scan parallelism equals file count exactly like
  the native reader.
* For plain batch scans the JVM parquet reader (``read()``) is faster —
  this source exists for the API surface (format-based readers, third
  pipelines that speak ``spark.read.format``), not as the hot path, and
  says so.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


def _resolve_snapshot(options: dict) -> dict:
    """Pick the snapshot entry the options address (published head or an
    explicit version) — mirrors VersionedTable.read()'s resolution, but
    file-only (no SparkSession on the executor side)."""
    import json

    location = options.get("location")
    if not location:
        raise ValueError("vtable source requires option 'location'")
    pointer = os.path.join(location, "_current_snapshot.json")
    if not os.path.exists(pointer):
        raise FileNotFoundError(f"no versioned table at {location}")
    with open(pointer) as f:
        snaps = json.load(f)["snapshots"]
    version = options.get("version")
    timestamp = options.get("timestamp")
    if version is not None and timestamp is not None:
        raise ValueError("options 'version' and 'timestamp' are exclusive")
    if timestamp is not None:
        import calendar
        import time as _time

        cut = calendar.timegm(_time.strptime(timestamp, "%Y-%m-%d %H:%M:%S"))
        eligible = [
            s
            for s in snaps
            if s["committed_at"] <= cut and not s.get("staged")
        ]
        if not eligible:
            raise ValueError(
                f"no snapshot at or before {timestamp} at {location}"
            )
        version = eligible[-1]["version"]
    if version is not None:
        snap = next(
            (s for s in snaps if s["version"] == int(version)), None
        )
        if snap is None:
            raise ValueError(f"version {version} not found at {location}")
    else:
        snap = next((s for s in reversed(snaps) if not s.get("staged")), None)
        if snap is None:
            raise FileNotFoundError(f"no published snapshot at {location}")
    if snap.get("tombstones") or snap.get("dv"):
        raise ValueError(
            "snapshot has pending merge-on-read deletes (tombstones/deletion"
            " vectors); the vtable leaf source cannot apply them — use"
            " VersionedTable.read(), or compact() to fold them first"
        )
    return snap


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _pruned_files(snap: dict, filters: list[tuple]) -> list[str]:
    """File paths of ``snap`` surviving min/max + bloom skipping for a
    conjunction of ``(col, op, value)`` filters — the same skipping rules
    as ``VersionedTable.pruned_files`` (whose static helpers this reuses),
    resolved purely from the pointer metadata."""
    from .tables import VersionedTable as _VT

    files = sorted(glob.glob(os.path.join(snap["dir"], "*.parquet")))
    stats = snap.get("stats", {})
    bloom = snap.get("bloom", {})
    if not filters or not (stats or bloom):
        return files
    out = []
    for path in files:
        fstats = stats.get(path)
        fbloom = bloom.get(path)
        keep = True
        for col, op, value in filters:
            if (
                fstats is not None
                and col in fstats
                and not _VT._file_may_match(
                    fstats[col], op, _VT._stat_value(value)
                )
            ):
                keep = False
                break
            if (
                op == "="
                and fbloom is not None
                and col in fbloom
                and _VT._bloom_probe_ok(value)
            ):
                positions = set(fbloom[col])
                if not all(
                    p in positions for p in _VT._bloom_positions(value)
                ):
                    keep = False
                    break
        if keep:
            out.append(path)
    return out


class VersionedTableReader(DataSourceReader):
    def __init__(self, options: dict):
        self.snap = _resolve_snapshot(options)
        self._skip_filters: list[tuple] = []

    def pushFilters(self, filters):
        """File-skipping pushdown: comparison filters on columns with
        collected stats (``compute_stats`` / ``compute_bloom``) prune
        whole files before Spark ever schedules them — the Delta/Iceberg
        data-skipping mechanism surfaced through the source API. EVERY
        filter is also returned to Spark for row-level evaluation, so
        results are exact no matter how coarse the stats are (skipping
        only ever removes files that cannot match)."""
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        ops = {
            EqualTo: "=",
            GreaterThan: ">",
            GreaterThanOrEqual: ">=",
            LessThan: "<",
            LessThanOrEqual: "<=",
        }
        for f in filters:
            op = ops.get(type(f))
            if op is not None and len(f.attribute) == 1:
                self._skip_filters.append((f.attribute[0], op, f.value))
        return filters  # Spark re-applies all filters row-level

    def partitions(self):
        files = _pruned_files(self.snap, self._skip_filters)
        # an empty snapshot still needs >= 1 partition to emit 0 rows
        return [_FilePartition(p) for p in files] or [_FilePartition("")]

    def read(self, partition):
        if not partition.path:
            return
        import pyarrow.parquet as pq

        # yielding Arrow RecordBatches puts the transfer on Spark's Arrow
        # ingestion path — no per-row Python anywhere
        f = pq.ParquetFile(partition.path)
        yield from f.iter_batches()


class VersionedTableDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "vtable"

    def schema(self):
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import from_arrow_schema

        snap = _resolve_snapshot(self.options)
        files = sorted(glob.glob(os.path.join(snap["dir"], "*.parquet")))
        if not files:
            raise ValueError(f"snapshot {snap['version']} has no data files")
        return from_arrow_schema(pq.ParquetFile(files[0]).schema_arrow)

    def reader(self, schema):
        return VersionedTableReader(dict(self.options))

    def writer(self, schema, overwrite: bool):
        return VersionedTableWriter(dict(self.options), overwrite)

    def streamReader(self, schema):
        return VersionedTableStreamReader(dict(self.options))

    def streamWriter(self, schema, overwrite: bool):
        return VersionedTableStreamWriter(dict(self.options))


def register_vtable_source(spark) -> None:
    """Idempotently register the ``vtable`` format on a session (and
    enable Python-source filter pushdown, which Spark gates off by
    default — runtime-settable SQL conf)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        spark.dataSource.register(VersionedTableDataSource)
    except Exception:
        pass  # already registered on this session


# -- write path -------------------------------------------------------------

from dataclasses import dataclass  # noqa: E402

from pyspark.sql.datasource import (  # noqa: E402
    DataSourceArrowWriter,
    WriterCommitMessage,
)


@dataclass
class _WroteFile(WriterCommitMessage):
    path: str
    rows: int


class VersionedTableWriter(DataSourceArrowWriter):
    """``df.write.format("vtable")`` — the CoW commit protocol expressed
    through Spark's writer API, which maps onto it exactly: every task
    writes its Arrow batches to ONE parquet file in a staging dir
    (returning the path as its commit message), and the driver-side
    ``commit`` publishes them as the next snapshot with the same atomic
    pointer flip ``VersionedTable._commit`` uses — a failed/partial job
    leaves only an unreferenced staging dir (``abort`` clears it), never
    a half-visible table.

    ``mode("append")`` is metadata-cheap: the new snapshot hard-links the
    previous snapshot's files (zero copy — the store is local-fs by
    design: pointer file + ``os.replace``; hard links share that scope)
    and adds the staged files beside them. ``vacuum`` stays correct:
    removing a snapshot dir unlinks names, inodes live while any other
    snapshot still links them. Single-writer, like the table store."""

    def __init__(self, options: dict, overwrite: bool):
        import uuid

        location = options.get("location")
        if not location:
            raise ValueError("vtable sink requires option 'location'")
        self.location = location.rstrip("/")
        self.overwrite = overwrite
        self.staging = os.path.join(
            self.location, f"_staging-{uuid.uuid4().hex[:12]}"
        )
        if not overwrite:
            # fail at planning, before any task runs: appending onto
            # pending merge-on-read state would resurrect deleted rows
            snaps = self._meta()["snapshots"]
            prev = next(
                (s for s in reversed(snaps) if not s.get("staged")), None
            )
            if prev is not None and (
                prev.get("tombstones") or prev.get("dv")
            ):
                raise ValueError(
                    "append through the vtable sink onto pending merge-on-"
                    "read state would resurrect deleted rows — compact() "
                    "first, or use VersionedTable.append()"
                )

    def write(self, iterator):
        import uuid

        import pyarrow.parquet as pq

        os.makedirs(self.staging, exist_ok=True)
        path = os.path.join(self.staging, f"part-{uuid.uuid4().hex}.parquet")
        writer = None
        rows = 0
        for batch in iterator:
            if writer is None:
                writer = pq.ParquetWriter(path, batch.schema)
            writer.write_batch(batch)
            rows += batch.num_rows
        if writer is None:
            # Spark requires a WriterCommitMessage even from empty tasks
            return _WroteFile(path="", rows=0)
        writer.close()
        return _WroteFile(path=path, rows=rows)

    def _meta(self) -> dict:
        import json

        pointer = os.path.join(self.location, "_current_snapshot.json")
        if not os.path.exists(pointer):
            return {"snapshots": []}
        with open(pointer) as f:
            return json.load(f)

    def commit(self, messages):
        import json
        import shutil
        import time

        meta = self._meta()
        snaps = meta["snapshots"]
        version = (max(s["version"] for s in snaps) + 1) if snaps else 0
        snap_dir = os.path.join(self.location, f"snapshot-{version:05d}")
        os.makedirs(snap_dir, exist_ok=True)
        if not self.overwrite and snaps:
            prev = next(s for s in reversed(snaps) if not s.get("staged"))
            if prev.get("tombstones") or prev.get("dv"):
                raise ValueError(
                    "append through the vtable sink onto pending merge-on-"
                    "read state would resurrect deleted rows — compact() "
                    "first, or use VersionedTable.append()"
                )
            for p in sorted(glob.glob(os.path.join(prev["dir"], "*.parquet"))):
                os.link(p, os.path.join(snap_dir, os.path.basename(p)))
        for m in messages:
            if m is not None and m.path:
                os.rename(
                    m.path, os.path.join(snap_dir, os.path.basename(m.path))
                )
        shutil.rmtree(self.staging, ignore_errors=True)
        snaps.append(
            {"version": version, "dir": snap_dir, "committed_at": time.time()}
        )
        pointer = os.path.join(self.location, "_current_snapshot.json")
        tmp = pointer + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, pointer)  # the same atomic flip as VersionedTable

    def abort(self, messages):
        import shutil

        shutil.rmtree(self.staging, ignore_errors=True)


# -- streaming source -------------------------------------------------------

from pyspark.sql.datasource import DataSourceStreamReader  # noqa: E402


class VersionedTableStreamReader(DataSourceStreamReader):
    """``spark.readStream.format("vtable")`` — commits of an APPEND-ONLY
    versioned table as a stream, one micro-batch per commit range.
    Offsets are snapshot version ids (checkpointable, replayable); a
    batch's rows are exactly the files a commit ADDED, which hard-link
    appends make directly observable: an append keeps every prior file's
    basename and adds new ones, so ``added = basenames(v) -
    basenames(v-1)``.

    The append-only contract is ENFORCED, not assumed: a commit that
    rewrites or drops files (overwrite, CoW delete, compaction) raises —
    its row-level delta cannot be derived from files alone, and a silent
    wrong answer is worse than a loud stop. This is the same restriction
    Delta's CDF-less streaming source has (it errors on non-append
    commits unless told to ignore them).

    Scale: offset resolution reads only the pointer json; each batch
    schedules one partition per added file, Arrow-batched like the batch
    reader."""

    def __init__(self, options: dict):
        self.options = dict(options)
        self.location = self.options.get("location", "").rstrip("/")
        if not self.location:
            raise ValueError("vtable stream source requires option 'location'")

    def _published(self) -> list[dict]:
        import json

        pointer = os.path.join(self.location, "_current_snapshot.json")
        if not os.path.exists(pointer):
            raise FileNotFoundError(f"no versioned table at {self.location}")
        with open(pointer) as f:
            snaps = json.load(f)["snapshots"]
        return [s for s in snaps if not s.get("staged")]

    def initialOffset(self) -> dict:
        # start BEFORE the first published snapshot so the initial batch
        # replays the table's full current contents
        return {"version": -1}

    def latestOffset(self) -> dict:
        snaps = self._published()
        return {"version": snaps[-1]["version"] if snaps else -1}

    def _files(self, snap: dict) -> dict:
        return {
            os.path.basename(p): p
            for p in glob.glob(os.path.join(snap["dir"], "*.parquet"))
        }

    def partitions(self, start: dict, end: dict):
        snaps = [
            s
            for s in self._published()
            if start["version"] < s["version"] <= end["version"]
        ]
        out = []
        prev = next(
            (
                s
                for s in reversed(self._published())
                if s["version"] <= start["version"]
            ),
            None,
        )
        prev_files = set(self._files(prev)) if prev is not None else set()
        for s in snaps:
            if s.get("tombstones") or s.get("dv"):
                raise ValueError(
                    f"snapshot v{s['version']} carries merge-on-read deletes"
                    " — not an append; the vtable stream serves append-only"
                    " tables"
                )
            files = self._files(s)
            if not prev_files <= set(files):
                raise ValueError(
                    f"snapshot v{s['version']} rewrote or dropped files —"
                    " not an append; the vtable stream serves append-only"
                    " tables"
                )
            out.extend(
                _FilePartition(p)
                for name, p in sorted(files.items())
                if name not in prev_files
            )
            prev_files = set(files)
        return out or [_FilePartition("")]

    def read(self, partition):
        if not partition.path:
            return
        import pyarrow.parquet as pq

        f = pq.ParquetFile(partition.path)
        yield from f.iter_batches()

    def commit(self, end: dict) -> None:
        pass  # offsets are durable table versions; nothing to clean up


from pyspark.sql.datasource import DataSourceStreamArrowWriter  # noqa: E402


class VersionedTableStreamWriter(DataSourceStreamArrowWriter):
    """``df.writeStream.format("vtable")`` — every micro-batch becomes one
    append commit (hard-linking prior files, same protocol as the batch
    writer), with EXACTLY-ONCE semantics: the micro-batch id is recorded
    on the snapshot (the Delta txnAppId/txnVersion pattern the
    foreachBatch sinks use), so a batch replayed after a checkpoint race
    is recognized and skipped instead of committed twice. Completes the
    format quadrant: batch read/write + stream read/write on one commit
    protocol — and a table written by this sink is itself streamable by
    ``VersionedTableStreamReader`` (append-only by construction)."""

    def __init__(self, options: dict):
        import uuid

        location = options.get("location")
        if not location:
            raise ValueError("vtable stream sink requires option 'location'")
        self.location = location.rstrip("/")
        self.staging = os.path.join(
            self.location, f"_staging-{uuid.uuid4().hex[:12]}"
        )

    # reuse the batch writer's task-side file staging
    write = VersionedTableWriter.write
    _meta = VersionedTableWriter._meta

    def commit(self, messages, batchId: int) -> None:
        import json
        import shutil
        import time

        meta = self._meta()
        snaps = meta["snapshots"]
        applied = max(
            (
                s["txn"]["version"]
                for s in snaps
                if s.get("txn", {}).get("app_id") == "vtable_stream_sink"
            ),
            default=-1,
        )
        if batchId <= applied:
            shutil.rmtree(self.staging, ignore_errors=True)
            return  # replayed batch: already committed, exactly-once skip
        version = (max(s["version"] for s in snaps) + 1) if snaps else 0
        snap_dir = os.path.join(self.location, f"snapshot-{version:05d}")
        os.makedirs(snap_dir, exist_ok=True)
        prev = next((s for s in reversed(snaps) if not s.get("staged")), None)
        if prev is not None:
            if prev.get("tombstones") or prev.get("dv"):
                raise ValueError(
                    "streaming append onto pending merge-on-read state —"
                    " compact() the table first"
                )
            for p in sorted(glob.glob(os.path.join(prev["dir"], "*.parquet"))):
                os.link(p, os.path.join(snap_dir, os.path.basename(p)))
        for m in messages:
            if m is not None and m.path:
                os.rename(
                    m.path, os.path.join(snap_dir, os.path.basename(m.path))
                )
        shutil.rmtree(self.staging, ignore_errors=True)
        snaps.append(
            {
                "version": version,
                "dir": snap_dir,
                "committed_at": time.time(),
                "txn": {"app_id": "vtable_stream_sink", "version": batchId},
            }
        )
        pointer = os.path.join(self.location, "_current_snapshot.json")
        tmp = pointer + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, pointer)

    def abort(self, messages, batchId: int) -> None:
        import shutil

        shutil.rmtree(self.staging, ignore_errors=True)
