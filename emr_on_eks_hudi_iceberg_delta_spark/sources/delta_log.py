"""Delta-protocol transaction-log table: read AND write the open Delta
Lake log format (``_delta_log/*.json`` action files + parquet data)
without the delta-spark runtime.

Why this exists: the reference writes its SCD2 target as a Delta table
(``delta/delta_scd_script.py:37-43``) and the container verifiably lacks
the delta jar (closed out in round 6 — ``operators/delta_backend.py``
gates the native path). But the Delta LOG itself is an open, published
protocol (https://github.com/delta-io/delta/blob/master/PROTOCOL.md):
newline-delimited JSON actions (``protocol`` / ``metaData`` / ``add`` /
``remove`` / ``commitInfo``) whose replay defines the snapshot. That is
plain JSON + parquet — squarely readable and writable with Spark
built-ins. This module implements the v1 reader/writer subset:

* ``DeltaLogTable.overwrite / append`` — write parquet data files and
  commit a protocol-correct JSON action file per operation, so the
  directory is a REAL Delta table: any delta-spark / delta-rs /
  DuckDB-delta reader can open it (interop is by-spec; no Delta runtime
  exists in this container to co-test against, which is exactly why the
  writer sticks to the v1 action subset: minReaderVersion=1).
* ``read(version=None)`` — replay the log to the requested version and
  scan only the LIVE files; time travel = stop the replay early.
  Partition columns (which Delta stores in ``partitionValues``, NOT in
  the data files) are re-injected as typed literal columns per the
  ``metaData.schemaString``.
* ``history()`` — one row per commit (version, operation, file deltas).

Scale shape: the log is metadata (one small JSON per commit; the replay
is a driver-side dict of live paths — the same manifest-sized state
every Delta reader holds). Data reads are parquet scans of live files
grouped by partition tuple, so partition pruning happens before Spark
ever lists a file: ``read_where`` filters partitionValues on the
driver's manifest exactly like ``PartitionedTable``'s metadata pruning.

Also implemented (attached below the class): OPTIMIZE compaction with
``dataChange: false`` actions, VACUUM of unreferenced files, classic
single-file parquet checkpoints + ``_last_checkpoint`` + log retention
(``clean_log``) with checkpoint-seeded replay, txn-action idempotent
appends, and an exactly-once foreachBatch streaming sink.

Also implemented (delta_dml.py / delta_cdf.py): ``delete`` /
``update`` / ``merge_into`` DML — copy-on-write rewrites touching only
the files the predicate actually hits, or merge-on-read DELETE via
real deletion vectors (RoaringBitmapArray portable serialization,
roaring.py + dv.py) with the protocol bumped to readerVersion 3 /
writerVersion 7 and the ``deletionVectors`` table feature declared;
``append(merge_schema=True)`` schema evolution;
``optimize(zorder_by=[...])`` typed Z-order clustering feeding the
stats-skipping reader (per-partition bin-packing on partitioned
tables); Change Data Feed (``delta.enableChangeDataFeed`` + real
``cdc`` actions + ``table_changes``); CHECK constraints
(``delta.constraints.*``, every write path gated); ``TIMESTAMP AS OF``
time travel; optimistic concurrency (put-if-absent commits,
auto-rebased appends); and ``fsck`` integrity verification (fsck.py).

Column mapping (name mode) lives in delta_colmap.py (r10):
``enable_column_mapping`` / ``rename_column`` / ``drop_column`` with
physical-name scans, so renames/drops never rewrite data; DML, CDF,
OPTIMIZE, and checkpoints all work on mapped tables. GENERATED
columns (``delta.generationExpression``: write-side compute/validate,
DML recompute, hidden partition pruning) and IDENTITY columns
(``delta.identity.*``: dense distributed block allocation, watermark
in the same commit) live in delta_gen.py (r10). Round 11 closes the
two remaining mapped-table gaps: schema-CHANGING overwrites reconcile
column ids/physical names by logical name (delta_colmap.py
``reconcile_mapped_schema``), and generated/identity columns can be
declared on a mapped table (feature-union protocol upgrades, never a
downgrade).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def _commit_path(location: str, version: int) -> str:
    return os.path.join(location, "_delta_log", f"{version:020d}.json")


class DeltaLogTable:
    """A Delta-protocol table at a local/posix ``location``.
    Multi-reader always; multi-WRITER via optimistic concurrency on
    the version file itself (atomic put-if-absent in ``_commit`` —
    the LogStore contract posix rename/link provides locally; real
    Delta plugs S3/DynamoDB stores for the same guarantee, the OCC
    the reference wires in hudi/hudi_scd_script.py:42-48's DynamoDB
    analog). Losing writers get ``ConcurrentCommitError``; appends
    auto-rebase because they commute, every other operation surfaces
    the conflict for the caller to re-run against the new head."""

    def __init__(self, spark: SparkSession, location: str):
        self.spark = spark
        self.location = location
        os.makedirs(os.path.join(location, "_delta_log"), exist_ok=True)

    # ---------------------------- log replay ----------------------------

    def _versions(self) -> list[int]:
        logdir = os.path.join(self.location, "_delta_log")
        return sorted(
            int(f[:-5])
            for f in os.listdir(logdir)
            if f.endswith(".json") and f[:-5].isdigit()
        )

    def _replay(self, version: int | None = None):
        """Replay actions up to ``version`` (inclusive) — from JSON
        alone when the 0..version chain is intact, else seeded from the
        latest parquet checkpoint at or below ``version`` with the JSON
        suffix replayed on top (the real Delta read path once log
        retention has expired old commits). A truncated log with no
        usable checkpoint refuses loudly. Returns (live: dict path ->
        add action, metadata: dict, resolved_version)."""
        versions = self._versions()
        have = set(versions)
        ckpt = self.last_checkpoint_version()
        last = max(versions[-1] if versions else -1,
                   ckpt if ckpt is not None else -1)
        if last < 0:
            raise ValueError(f"no delta log at {self.location}")
        if version is None:
            version = last
        live: dict[str, dict] = {}
        meta: dict = {}
        if all(v in have for v in range(0, version + 1)):
            start_after = -1
        elif (
            ckpt is not None
            and ckpt <= version
            and all(v in have for v in range(ckpt + 1, version + 1))
        ):
            live, meta = self._load_checkpoint(ckpt)
            start_after = ckpt
        else:
            raise ValueError(
                f"log truncated below version {version} and no usable "
                f"checkpoint (last checkpoint: {ckpt}) — cannot replay"
            )
        for v in versions:
            if v <= start_after:
                continue
            if v > version:
                break
            with open(_commit_path(self.location, v)) as f:
                for line in f:
                    if not line.strip():
                        continue
                    action = json.loads(line)
                    if "metaData" in action:
                        meta = action["metaData"]
                    elif "add" in action:
                        live[action["add"]["path"]] = action["add"]
                    elif "remove" in action:
                        live.pop(action["remove"]["path"], None)
                    elif "protocol" in action:
                        self._check_protocol(action["protocol"])
        return live, meta, version

    #: reader table features this implementation actually supports —
    #: anything else refuses loudly rather than mis-reading.
    SUPPORTED_READER_FEATURES = frozenset(
        {"deletionVectors", "columnMapping", "v2Checkpoint"}
    )

    @classmethod
    def _check_protocol(cls, p: dict) -> None:
        mrv = p.get("minReaderVersion", 1)
        if mrv <= 1:
            return
        if mrv == 2:
            return  # legacy columnMapping reader version — supported
        if mrv == 3:
            feats = set(p.get("readerFeatures") or [])
            extra = feats - cls.SUPPORTED_READER_FEATURES
            if not extra:
                return
            raise ValueError(
                "table requires unsupported reader features "
                f"{sorted(extra)}; this reader implements protocol v1 "
                "plus the deletionVectors and columnMapping table "
                "features"
            )
        raise ValueError(
            "table requires Delta reader version "
            f"{mrv}; this reader implements protocol v1 plus the "
            "deletionVectors and columnMapping table features"
        )

    def _load_checkpoint(self, ckpt: int):
        """Seed state from a parquet checkpoint — classic single-file,
        or a V2 checkpoint (top file + add-only SIDECARS) when
        ``_last_checkpoint`` says so."""
        lc_path = os.path.join(
            self.location, "_delta_log", "_last_checkpoint"
        )
        if os.path.exists(lc_path):
            with open(lc_path) as f:
                lc = json.load(f)
            if lc.get("v2") and int(lc["version"]) == ckpt:
                return _load_v2_checkpoint(self, lc)
        path = os.path.join(
            self.location, "_delta_log",
            f"{ckpt:020d}.checkpoint.parquet",
        )
        live: dict[str, dict] = {}
        meta: dict = {}
        for r in self.spark.read.parquet(path).collect():
            if r["protocol"] is not None:
                self._check_protocol(r["protocol"].asDict())
            if r["metaData"] is not None:
                m = r["metaData"].asDict(recursive=True)
                meta = {k: v for k, v in m.items() if v is not None}
            if r["add"] is not None:
                a = r["add"].asDict(recursive=True)
                a["partitionValues"] = a.get("partitionValues") or {}
                live[a["path"]] = a
            if r["remove"] is not None:
                live.pop(r["remove"]["path"], None)
        return live, meta

    # ----------------------------- reading ------------------------------

    def read(self, version: int | None = None) -> DataFrame:
        return self.read_where(None, version)

    def read_where(
        self, partition_filter, version: int | None = None
    ) -> DataFrame:
        """Snapshot read; ``partition_filter`` is an optional host
        predicate over the partitionValues dict (str -> str), applied
        to the MANIFEST before any file is listed — metadata-only
        pruning, the same shape as PartitionedTable."""
        live, meta, _ = self._replay(version)
        adds = list(live.values())
        if partition_filter is not None:
            from .delta_colmap import mapping_enabled, physical_names

            if mapping_enabled(meta):
                # partitionValues are keyed by PHYSICAL names; the
                # caller's predicate sees LOGICAL keys
                p2l = {
                    p: l for l, p in physical_names(meta).items()
                }
                adds = [
                    a
                    for a in adds
                    if partition_filter(
                        {
                            p2l.get(k, k): v
                            for k, v in a["partitionValues"].items()
                        }
                    )
                ]
            else:
                adds = [
                    a
                    for a in adds
                    if partition_filter(a["partitionValues"])
                ]
        return self._read_adds(adds, meta)

    def _read_adds(self, adds: list[dict], meta: dict) -> DataFrame:
        """Scan a list of add actions into a DataFrame (the shared tail
        of read_where and read_filtered). Files whose add action
        carries a ``deletionVector`` descriptor get their deleted rows
        filtered out — the merge-on-read half of the deletionVectors
        table feature: ``_metadata.row_index`` identifies positions
        JVM-side and ONE broadcast anti-join against the (file,
        position) pairs drops them; the pair set is exactly the DV
        cardinality (metadata-sized relative to the data — the same
        bitmaps every Delta reader ships to executors)."""
        schema = StructType.fromJson(json.loads(meta["schemaString"]))
        part_cols = meta.get("partitionColumns", [])
        data_fields = [f for f in schema.fields if f.name not in part_cols]
        if not adds:
            return self.spark.createDataFrame([], schema)
        # column mapping (name mode): data files store PHYSICAL column
        # names; scan physical, rename to logical right after — a
        # renamed column keeps serving from old files with no rewrite
        from .delta_colmap import mapping_enabled, physical_names

        if mapping_enabled(meta):
            phys = physical_names(meta)
        else:
            phys = {f.name: f.name for f in schema.fields}
        from pyspark.sql.types import StructField

        scan_struct = StructType(
            [
                StructField(phys[f.name], f.dataType, True)
                for f in data_fields
            ]
        )

        def _to_logical(df):
            return df.select(
                *[
                    F.col(phys[f.name]).alias(f.name)
                    for f in data_fields
                ],
                *[c for c in df.columns
                  if c in ("__dv_file", "__dv_pos")],
            )

        plain = [a for a in adds if not a.get("deletionVector")]
        dvd = [a for a in adds if a.get("deletionVector")]
        types = {f.name: f.dataType for f in schema.fields}
        out_cols = [f.name for f in schema.fields]
        parts = []
        # group plain files by partition tuple; inject partition columns
        # as typed literals (Delta does not store them in the data
        # files; partitionValues are keyed by PHYSICAL name)
        by_part: dict[tuple, list[str]] = {}
        for a in plain:
            key = tuple(
                a["partitionValues"].get(phys[c]) for c in part_cols
            )
            by_part.setdefault(key, []).append(
                os.path.join(self.location, a["path"])
            )
        # NULL partition values sort first (tuple keys mix str and None)
        for key, paths in sorted(
            by_part.items(),
            key=lambda kv: tuple((x is not None, x or "") for x in kv[0]),
        ):
            df = _to_logical(
                self.spark.read.schema(scan_struct).parquet(*paths)
            )
            for c, val in zip(part_cols, key):
                lit = (
                    F.lit(None) if val is None else F.lit(val)
                ).cast(types[c])
                df = df.withColumn(c, lit)
            parts.append(df.select(*out_cols))
        if dvd:
            from . import dv as dv_io

            # r11: DV-bearing files ride ONE multi-path scan per
            # partition tuple (was one plan piece per file — the same
            # O(files) planning bottleneck the DML scans fixed in
            # r10); both join sides key on the file BASENAME (fresh
            # writer UUIDs), so no path-normalization map is needed
            by_part_dv: dict[tuple, list[dict]] = {}
            for a in dvd:
                key = tuple(
                    a["partitionValues"].get(phys[c])
                    for c in part_cols
                )
                by_part_dv.setdefault(key, []).append(a)
            pieces = []
            for key, alist in sorted(
                by_part_dv.items(),
                key=lambda kv: tuple(
                    (x is not None, x or "") for x in kv[0]
                ),
            ):
                df = _to_logical(
                    self.spark.read.schema(scan_struct)
                    .parquet(
                        *[
                            os.path.join(self.location, a["path"])
                            for a in alist
                        ]
                    )
                    .withColumn(
                        "__dv_file",
                        F.element_at(
                            F.split(F.col("_metadata.file_path"), "/"),
                            -1,
                        ),
                    )
                    .withColumn(
                        "__dv_pos", F.col("_metadata.row_index")
                    )
                )
                for c, val in zip(part_cols, key):
                    lit = (
                        F.lit(None) if val is None else F.lit(val)
                    ).cast(types[c])
                    df = df.withColumn(c, lit)
                pieces.append(
                    df.select(*out_cols, "__dv_file", "__dv_pos")
                )
            u = pieces[0]
            for p in pieces[1:]:
                u = u.unionByName(p)
            # DV pairs expand EXECUTOR-side (descriptors only leave the
            # driver); the anti-join broadcasts while the total
            # cardinality stays under DV_BROADCAST_MAX_PAIRS and falls
            # back to a shuffled anti-join for heavily-deleted tables
            from .delta_dml import DV_BROADCAST_MAX_PAIRS

            total_card = sum(
                a["deletionVector"].get("cardinality", 0)
                for a in dvd
            )
            will_broadcast = total_card <= DV_BROADCAST_MAX_PAIRS
            pdf = dv_io.dv_pairs_df(
                self.spark, self.location, dvd,
                driver_ok=will_broadcast,
            )
            if pdf is not None:
                pdf = pdf.select(
                    F.element_at(
                        F.split(F.col("__dv_file"), "/"), -1
                    ).alias("__dv_file"),
                    "__dv_pos",
                )
                if will_broadcast:
                    pdf = F.broadcast(pdf)
                u = u.join(
                    pdf,
                    ["__dv_file", "__dv_pos"],
                    "left_anti",
                )
            parts.append(u.select(*out_cols))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def history(self) -> list[dict]:
        rows = []
        for v in self._versions():
            ops, n_add, n_remove = None, 0, 0
            with open(_commit_path(self.location, v)) as f:
                for line in f:
                    if not line.strip():
                        continue
                    action = json.loads(line)
                    if "commitInfo" in action:
                        ops = action["commitInfo"].get("operation")
                    elif "add" in action:
                        n_add += 1
                    elif "remove" in action:
                        n_remove += 1
            rows.append(
                {
                    "version": v,
                    "operation": ops,
                    "n_added": n_add,
                    "n_removed": n_remove,
                }
            )
        return rows

    # ----------------------------- writing ------------------------------

    def _write_data_files(
        self, df: DataFrame, part_cols: list[str], meta: dict | None = None
    ) -> list[dict]:
        """Write parquet data files under the table root and return
        their ``add`` actions. Files are written to a staging dir and
        hard-renamed in under fresh uuid names — the same
        temp-then-publish idiom as the Arrow IPC sink, so a concurrent
        reader never sees a half-written file. When ``meta`` names a
        column-mapped table, the (logical-named) df and partition
        columns are renamed to physical before writing — stats and
        partitionValues then carry physical keys, per spec."""
        if meta is not None:
            from .delta_colmap import (
                mapping_enabled,
                physical_names,
                to_physical,
            )

            if mapping_enabled(meta):
                phys = physical_names(meta)
                df = to_physical(df, meta)
                part_cols = [phys.get(c, c) for c in part_cols]
        staging = os.path.join(self.location, f"_staging_{uuid.uuid4().hex}")
        if part_cols:
            # hash-distribute on the partition columns before a
            # partitioned write (write.distribution-mode=hash, same
            # rationale as iceberg_layout._write_data): without it every
            # input task serially opens one parquet writer per partition
            # value it holds, and values >> tasks makes the write
            # writer-open-bound; one value -> one task -> one file
            from ..session import write_dist_partitions

            df = df.repartition(
                write_dist_partitions(self.spark), *part_cols
            )
        writer = df.write.mode("overwrite")
        if part_cols:
            writer = writer.partitionBy(*part_cols)
        writer.parquet(staging)
        adds = []
        now = int(time.time() * 1000)
        for root, _dirs, files in os.walk(staging):
            for fname in files:
                if not fname.endswith(".parquet"):
                    continue
                src = os.path.join(root, fname)
                rel_dir = os.path.relpath(root, staging)
                pvals: dict[str, str] = {}
                if rel_dir != ".":
                    from urllib.parse import unquote

                    for seg in rel_dir.split(os.sep):
                        k, _, raw = seg.partition("=")
                        # Spark hive-escapes special chars in partition
                        # dir names; the log stores the REAL value
                        pvals[k] = (
                            None
                            if raw == "__HIVE_DEFAULT_PARTITION__"
                            else unquote(raw)
                        )
                new_name = f"part-{uuid.uuid4().hex}.parquet"
                rel_path = (
                    new_name
                    if rel_dir == "."
                    else os.path.join(rel_dir, new_name)
                )
                dst = os.path.join(self.location, rel_path)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                os.replace(src, dst)
                stats = _collect_file_stats(dst)
                add = {
                    "path": rel_path.replace(os.sep, "/"),
                    "partitionValues": pvals,
                    "size": os.path.getsize(dst),
                    "modificationTime": now,
                    "dataChange": True,
                }
                if stats is not None:
                    add["stats"] = stats
                adds.append(add)
        # clear staging leftovers (_SUCCESS, crc files, empty dirs)
        for root, dirs, files in os.walk(staging, topdown=False):
            for fname in files:
                os.remove(os.path.join(root, fname))
            for d in dirs:
                os.rmdir(os.path.join(root, d))
        os.rmdir(staging)
        return adds

    def _commit(self, version: int, actions: list[dict]) -> None:
        """Optimistic-concurrency commit: the version file is
        published with an atomic put-if-absent (``os.link`` of a fully
        written temp file — readers never see a torn commit, and a
        second writer racing for the same version number LOSES with
        ``ConcurrentCommitError`` instead of silently clobbering it).
        This is exactly Delta's LogStore contract; ``append`` retries
        the race automatically because blind appends commute."""
        from .tables import ConcurrentCommitError

        path = _commit_path(self.location, version)
        tmp = path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            for a in actions:
                f.write(json.dumps(a) + "\n")
        try:
            os.link(tmp, path)  # atomic put-if-absent
        except FileExistsError:
            raise ConcurrentCommitError(
                f"version {version} was committed by another writer; "
                "re-read the table and retry"
            ) from None
        finally:
            os.remove(tmp)

    def _meta_action(
        self, df: DataFrame, part_cols: list[str]
    ) -> dict:
        return {
            "metaData": {
                "id": uuid.uuid4().hex,
                "format": {"provider": "parquet", "options": {}},
                "schemaString": df.schema.json(),
                "partitionColumns": part_cols,
                "configuration": {},
                "createdTime": int(time.time() * 1000),
            }
        }

    def overwrite(
        self, df: DataFrame, partition_by: list[str] | None = None
    ) -> "DeltaLogTable":
        part_cols = list(partition_by or [])
        versions = self._versions()
        prior_live: dict[str, dict] = {}
        mapped_meta = None
        if versions:
            prior_live, prior_meta, _ = self._replay()
            from .delta_colmap import mapping_enabled

            if mapping_enabled(prior_meta):
                # a MAPPED table keeps its schema (ids/physical names)
                # across a data overwrite — real Delta's overwrite
                # without overwriteSchema; a schema CHANGE would need
                # id reconciliation and refuses by contract
                cur = StructType.fromJson(
                    json.loads(prior_meta["schemaString"])
                )
                same = [(f.name, f.dataType) for f in cur.fields] == [
                    (f.name, f.dataType) for f in df.schema.fields
                ]
                if not same:
                    # schema-CHANGING overwrite (r11; was a refusal):
                    # reconcile by LOGICAL name — retained columns
                    # keep id + physical name, new ones get fresh
                    # ids, departed ids never come back
                    from .delta_colmap import reconcile_mapped_schema

                    mapped_meta = reconcile_mapped_schema(
                        prior_meta, df.schema
                    )
                    mapped_meta["partitionColumns"] = part_cols
                else:
                    if part_cols != prior_meta.get(
                        "partitionColumns", []
                    ):
                        raise ValueError(
                            "matching-schema overwrite of a mapped "
                            "table must keep its partition columns "
                            f"{prior_meta.get('partitionColumns', [])}"
                        )
                    mapped_meta = prior_meta
            from .delta_gen import (
                apply_generated,
                assign_identity,
                generated_exprs,
                identity_cols,
            )

            if generated_exprs(prior_meta) or identity_cols(prior_meta):
                # generated/identity declarations survive data
                # overwrites: the batch gets missing generated columns
                # computed (or supplied values validated) and identity
                # values allocated (watermark keeps advancing across
                # overwrites — values never reuse), must keep the
                # schema and partitioning, and the metaData action is
                # reused so the declarations ride along.
                df = apply_generated(df, prior_meta)
                df, id_meta = assign_identity(df, prior_meta)
                if id_meta is not None:
                    prior_meta = id_meta
                cur = StructType.fromJson(
                    json.loads(prior_meta["schemaString"])
                )
                if set(df.columns) == {f.name for f in cur.fields}:
                    df = df.select(*[f.name for f in cur.fields])
                same = [(f.name, f.dataType) for f in cur.fields] == [
                    (f.name, f.dataType) for f in df.schema.fields
                ]
                if not same:
                    raise ValueError(
                        "overwrite of a generated-columns table must "
                        "keep its schema (declarations would be lost)"
                    )
                if part_cols != prior_meta.get("partitionColumns", []):
                    raise ValueError(
                        "overwrite of a generated-columns table must "
                        "keep its partition columns "
                        f"{prior_meta.get('partitionColumns', [])}"
                    )
                mapped_meta = prior_meta
            from .delta_cdf import enforce_constraints

            enforce_constraints(df, prior_meta)
        adds = self._write_data_files(df, part_cols, meta=mapped_meta)
        actions: list[dict] = [
            {
                "commitInfo": {
                    "operation": "WRITE",
                    "operationParameters": {"mode": "Overwrite"},
                }
            }
        ]
        if not versions:
            actions.append(
                {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
            )
        if mapped_meta is not None:
            # keep the mapped schema (ids/physical names) verbatim
            actions.append({"metaData": dict(mapped_meta)})
        else:
            ma = self._meta_action(df, part_cols)
            if versions:
                # real Delta: an overwrite (even schema-changing)
                # keeps the table's IDENTITY and PROPERTIES —
                # tblproperties (CDF, appendOnly, retention, UniForm)
                # persist across data replacement; r11 fix, the fresh
                # metaData was silently dropping them
                ma["metaData"]["id"] = prior_meta["id"]
                ma["metaData"]["configuration"] = dict(
                    prior_meta.get("configuration") or {}
                )
                if prior_meta.get("createdTime") is not None:
                    ma["metaData"]["createdTime"] = prior_meta[
                        "createdTime"
                    ]
            actions.append(ma)
        now = int(time.time() * 1000)
        for path in sorted(prior_live):
            actions.append(
                {
                    "remove": {
                        "path": path,
                        "deletionTimestamp": now,
                        "dataChange": True,
                    }
                }
            )
        actions.extend({"add": a} for a in adds)
        self._commit(versions[-1] + 1 if versions else 0, actions)
        return self

    def append(
        self, df: DataFrame, merge_schema: bool = False
    ) -> "DeltaLogTable":
        """Append a batch. ``merge_schema=True`` enables Delta's
        mergeSchema evolution: NEW top-level columns widen the table's
        ``metaData`` schema in the same commit (nullable), and every
        pre-existing data file serves NULL for them at read (explicit-
        schema parquet scan — no rewrite). Shared columns must agree on
        type exactly; a new column without ``merge_schema`` refuses
        (real Delta's AnalysisException). The appended batch may also
        OMIT nullable table columns — readers fill NULLs the same way."""
        versions = self._versions()
        if not versions:
            return self.overwrite(df)
        _, meta, _ = self._replay()
        from .delta_gen import apply_generated, assign_identity

        df = apply_generated(df, meta)
        df, id_meta = assign_identity(df, meta)
        if id_meta is not None:
            # the advanced identity watermark must ride THIS commit
            meta = id_meta
        part_cols = meta.get("partitionColumns", [])
        existing = StructType.fromJson(json.loads(meta["schemaString"]))
        by_name = {f.name: f for f in existing.fields}
        for f in df.schema.fields:
            ef = by_name.get(f.name)
            if ef is not None and ef.dataType != f.dataType:
                raise ValueError(
                    f"column {f.name!r} type mismatch: table has "
                    f"{ef.dataType.simpleString()}, batch has "
                    f"{f.dataType.simpleString()} — no implicit casts"
                )
        missing_parts = [c for c in part_cols if c not in df.columns]
        if missing_parts:
            raise ValueError(
                f"append batch lacks partition columns {missing_parts}"
            )
        from .delta_cdf import enforce_constraints

        enforce_constraints(df, meta)
        new_fields = [
            f for f in df.schema.fields if f.name not in by_name
        ]
        actions: list[dict] = [
            {
                "commitInfo": {
                    "operation": "WRITE",
                    "operationParameters": {"mode": "Append"},
                }
            }
        ]
        from .delta_colmap import (
            MAXID_KEY,
            fresh_field_metadata,
            mapping_enabled,
            to_physical,
        )

        write_meta = meta
        if new_fields:
            if not merge_schema:
                raise ValueError(
                    "batch has columns not in the table schema "
                    f"({[f.name for f in new_fields]}); pass "
                    "merge_schema=True to evolve the schema"
                )
            from pyspark.sql.types import StructField

            evolved = dict(meta)
            added = []
            for f in new_fields:
                if mapping_enabled(meta):
                    # mapped tables: new columns get fresh ids and
                    # col-<uuid> physical names (ids never reused)
                    fmd, max_id = fresh_field_metadata(evolved)
                    cfg = dict(evolved.get("configuration") or {})
                    cfg[MAXID_KEY] = str(max_id)
                    evolved["configuration"] = cfg
                    added.append(
                        StructField(f.name, f.dataType, True, fmd)
                    )
                else:
                    added.append(StructField(f.name, f.dataType, True))
            merged = StructType(list(existing.fields) + added)
            evolved["schemaString"] = merged.json()
            actions.append({"metaData": evolved})
            write_meta = evolved
        elif id_meta is not None:
            actions.append({"metaData": id_meta})
        if mapping_enabled(write_meta):
            from .delta_colmap import physical_names

            phys = physical_names(write_meta)
            adds = self._write_data_files(
                to_physical(df, write_meta),
                [phys[c] for c in part_cols],
            )
        else:
            adds = self._write_data_files(df, part_cols)
        actions.extend({"add": a} for a in adds)
        from .tables import ConcurrentCommitError

        head = versions[-1]
        for _attempt in range(8):
            try:
                self._commit(head + 1, actions)
                return self
            except ConcurrentCommitError:
                if new_fields or id_meta is not None:
                    # schema evolution / identity allocation raced
                    # another commit: the merged schema or watermark
                    # was computed against a stale head — resolve at
                    # the caller, don't auto-rebase a metadata change
                    # (rebasing an identity range could double-allocate)
                    raise
                # blind appends commute with other appends: rebase onto
                # the new head and retry (Delta's append conflict rule)
                head = self._versions()[-1]
        raise ConcurrentCommitError(
            "append lost the commit race 8 times; giving up"
        )


_Z_NUMERIC = (
    "tinyint", "smallint", "int", "bigint", "float", "double",
)


def _z_bucket_expr(df: DataFrame, c: str, nb: int):
    """Quantile-bucket expression for one Z-order column — typed:

    * numeric/decimal: boundaries from one driver-side approxQuantile;
    * date/timestamp: same, over the epoch-days/micros projection;
    * string: boundaries from a seeded ~100k-value sample sorted on
      the driver (approxQuantile is numeric-only; this is the same
      sample-the-range-bounds move Spark's RangePartitioner makes).

    Anything else refuses loudly — a silently constant bucket would
    make ZORDER a no-op that still reports success."""
    dt = dict(df.dtypes)[c]
    if dt in _Z_NUMERIC or dt.startswith("decimal"):
        col = F.col(c).cast("double")
    elif dt == "date":
        col = F.unix_date(F.col(c)).cast("double")
    elif dt.startswith("timestamp"):
        col = F.unix_micros(F.col(c).cast("timestamp")).cast("double")
    elif dt == "string":
        n = df.select(c).dropna().count()
        if n == 0:
            return F.lit(0).cast("long")
        frac = min(1.0, 100_000.0 / n)
        sample = sorted(
            r[0]
            for r in df.select(c).dropna()
            .sample(False, frac, seed=42).collect()
        )
        if not sample:
            sample = sorted(r[0] for r in df.select(c).dropna()
                            .limit(nb).collect())
        bounds = sorted(
            {sample[int(len(sample) * i / nb)] for i in range(1, nb)}
        )
        if not bounds:
            return F.lit(0).cast("long")
        barr = F.array(*[F.lit(b) for b in bounds])
        return F.aggregate(
            barr,
            F.lit(0),
            lambda acc, b: acc
            + F.when(F.col(c) >= b, 1).otherwise(0),
        ).cast("long")
    else:
        raise ValueError(
            f"ZORDER BY column {c!r} has type {dt} — supported: "
            "numeric, decimal, date, timestamp, string"
        )
    num = df.select(col.alias("x")).dropna()
    qs = [i / nb for i in range(1, nb)]
    bounds = sorted(set(num.approxQuantile("x", qs, 0.001)))
    if not bounds:
        return F.lit(0).cast("long")
    barr = F.array(*[F.lit(float(b)) for b in bounds])
    return F.aggregate(
        barr,
        F.lit(0),
        lambda acc, b: acc + F.when(col >= b, 1).otherwise(0),
    ).cast("long")


def _zvalue_column(df: DataFrame, cols: list[str], bits: int = 8):
    """Z-order (Morton) key over ``cols`` as a pure JVM-side Column:
    each column is rank-bucketed into ``2**bits`` quantile buckets
    (boundaries computed once, driver-side, metadata-sized — see
    _z_bucket_expr for the per-type strategies), then the bucket ids'
    bits are interleaved. Quantile buckets, not min/max scaling, so
    skewed columns still spread across the curve — the same range-id
    approach Delta's OPTIMIZE ZORDER uses. NULLs land in bucket 0
    (curve start)."""
    if bits * len(cols) > 63:
        raise ValueError("bits * len(cols) must fit in a signed long")
    nb = 1 << bits
    buckets = [_z_bucket_expr(df, c, nb) for c in cols]
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, bk in enumerate(buckets):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(bk, b).bitwiseAND(F.lit(1)),
                    b * len(buckets) + i,
                )
            )
    return z


def _optimize_partitioned(
    self, live: dict, meta: dict, part_cols: list[str]
) -> "DeltaLogTable":
    """Per-partition bin-packing for hive-partitioned protocol tables:
    ONLY partitions holding more than one live file (or any file with
    a deletion vector — this materializes it) are rewritten, each into
    a single file via ``repartition(*part_cols)`` (one shuffle task per
    partition value — no global coalesce bottleneck); single-file
    DV-less partitions are never mentioned in the commit. dataChange
    stays false: contents are identical before and after."""
    from .delta_colmap import mapping_enabled, physical_names, to_physical

    phys = (
        physical_names(meta)
        if mapping_enabled(meta)
        else {c: c for c in part_cols}
    )
    by_part: dict[tuple, list[dict]] = {}
    for a in live.values():
        key = tuple(
            a["partitionValues"].get(phys[c]) for c in part_cols
        )
        by_part.setdefault(key, []).append(a)
    compact = [
        a
        for adds in by_part.values()
        if len(adds) > 1 or any(x.get("deletionVector") for x in adds)
        for a in adds
    ]
    if not compact:
        return self  # nothing worth a commit
    df = self._read_adds(compact, meta).repartition(*part_cols)
    if mapping_enabled(meta):
        df = to_physical(df, meta)
    adds = self._write_data_files(
        df, [phys[c] for c in part_cols]
    )
    now = int(time.time() * 1000)
    actions: list[dict] = [
        {
            "commitInfo": {
                "operation": "OPTIMIZE",
                "operationParameters": {"partitioned": True},
            }
        }
    ]
    for a in sorted(compact, key=lambda x: x["path"]):
        actions.append(
            {
                "remove": {
                    "path": a["path"],
                    "deletionTimestamp": now,
                    "dataChange": False,
                }
            }
        )
    for a in adds:
        a["dataChange"] = False
        actions.append({"add": a})
    self._commit(self._versions()[-1] + 1, actions)
    return self


def _optimize(
    self,
    target_files: int = 1,
    zorder_by: list[str] | None = None,
) -> "DeltaLogTable":
    """OPTIMIZE / small-file compaction, protocol-faithful: rewrite the
    live files into ``target_files`` larger ones and commit remove+add
    actions with ``dataChange: false`` — the flag real Delta uses so
    streaming readers know the commit moved bytes but changed no rows.
    Table contents are identical before and after (pinned by test);
    time travel to pre-compaction versions still works because the old
    files stay on disk until ``vacuum``.

    ``zorder_by`` clusters the rewrite on a Z-order (Morton) curve over
    the named numeric columns (``OPTIMIZE ... ZORDER BY``): rows go
    through ``repartitionByRange`` + ``sortWithinPartitions`` on the
    interleaved-bits key, so each output file covers a tight min/max
    range on EVERY curve column at once and the per-file stats
    (``read_filtered``'s skipping) prune multi-column point/range
    predicates — the whole point of Z-ordering.

    Because the rewrite goes through ``read()``, any deletion vectors
    on live files are MATERIALIZED here (deleted rows physically drop,
    the new adds carry no DV) — Delta's ``REORG TABLE ... APPLY
    (PURGE)``; old DV files stay for time travel until ``vacuum``."""
    live, meta, _ = self._replay()
    part_cols = meta.get("partitionColumns", [])
    if part_cols:
        if zorder_by:
            raise ValueError(
                "ZORDER BY on hive-partitioned tables is not "
                "supported (each partition compacts to one file — "
                "there is nothing left to cluster between)"
            )
        return _optimize_partitioned(self, live, meta, part_cols)
    df = self.read()
    if zorder_by:
        df = (
            df.withColumn("__z", _zvalue_column(df, list(zorder_by)))
            .repartitionByRange(target_files, "__z")
            .sortWithinPartitions("__z")
            .drop("__z")
        )
    else:
        df = df.coalesce(target_files)
    from .delta_colmap import mapping_enabled, to_physical

    if mapping_enabled(meta):
        df = to_physical(df, meta)  # rewrites keep physical names
    adds = self._write_data_files(df, [])
    now = int(time.time() * 1000)
    actions: list[dict] = [
        {
            "commitInfo": {
                "operation": "OPTIMIZE",
                "operationParameters": {
                    "targetFiles": target_files,
                    "zOrderBy": list(zorder_by or []),
                },
            }
        }
    ]
    for path in sorted(live):
        actions.append(
            {
                "remove": {
                    "path": path,
                    "deletionTimestamp": now,
                    "dataChange": False,
                }
            }
        )
    for a in adds:
        a["dataChange"] = False
        actions.append({"add": a})
    self._commit(self._versions()[-1] + 1, actions)
    return self


def _vacuum(
    self, retain_hours: float = 0.0, dry_run: bool = False
) -> list[str]:
    """VACUUM [RETAIN n HOURS] [DRY RUN]: delete data files no LIVE
    snapshot references (superseded by overwrites/compactions) that
    are also OLDER than the retention window (mtime-based, like real
    Delta; default 0 = everything unreferenced — real Delta defaults
    to 168h, callers wanting the audit window pass it). After vacuum,
    time travel to versions that needed those files fails loudly at
    read. Deletion-vector ``.bin`` files referenced by a LIVE add
    survive; orphaned ones (their file was rewritten/materialized) go
    too. Dry run lists without deleting. Returns relative paths
    (deleted, or would-be)."""
    from . import dv as dv_io

    cutoff = time.time() - retain_hours * 3600.0
    live, _, _ = self._replay()
    keep = set(live)
    keep_dv = set()
    for a in live.values():
        desc = a.get("deletionVector")
        if desc:
            p = dv_io.dv_file_path(self.location, desc)
            if p:
                keep_dv.add(
                    os.path.relpath(p, self.location).replace(os.sep, "/")
                )
    doomed: list[tuple[str, str]] = []
    for root, _dirs, files in os.walk(self.location):
        # cdc/ holds change-data files referenced by commit actions,
        # not by the live snapshot — CDF retention is clean_log's
        # concern, never vacuum's; metadata/ is the UniForm mirror's
        # (avro-only, but stay out of it on principle)
        if (
            "_delta_log" in root
            or os.sep + "cdc" in root
            or root.startswith(
                os.path.join(self.location, "metadata")
            )
        ):
            continue
        for fname in files:
            full = os.path.join(root, fname)
            rel = os.path.relpath(full, self.location).replace(os.sep, "/")
            if fname.endswith(".parquet"):
                if rel not in keep and os.path.getmtime(full) <= cutoff:
                    doomed.append((full, rel))
            elif (
                fname.startswith("deletion_vector_")
                and fname.endswith(".bin")
                and rel not in keep_dv
                and os.path.getmtime(full) <= cutoff
            ):
                doomed.append((full, rel))
    if dry_run or not doomed:
        return sorted(rel for _, rel in doomed)
    # UniForm (r11): the ICEBERG MIRROR must stop referencing the
    # doomed files BEFORE they go — sync it to the Delta head, then
    # expire older mirror snapshots METADATA-ONLY (Delta owns the
    # data-file lifecycle; the mirror must never delete data). Live
    # DVs sync through since r12 (translated to position-delete
    # files); a sync failure still aborts with nothing deleted.
    _, meta, _ = self._replay()
    if (meta.get("configuration") or {}).get(
        "delta.universalFormat.enabledFormats"
    ) == "iceberg":
        from .iceberg_layout import IcebergTable
        from .uniform import _sync_uniform

        _sync_uniform(self)
        IcebergTable(self.spark, self.location).expire_snapshots(
            keep_last=1, delete_data=False
        )
    for full, _rel in doomed:
        os.remove(full)
    return sorted(rel for _, rel in doomed)


DeltaLogTable.optimize = _optimize
DeltaLogTable.vacuum = _vacuum


def _txn_versions(self) -> dict[str, int]:
    """Highest committed ``txn`` version per appId — Delta's
    idempotent-writer bookkeeping (the ``txn`` action in the protocol:
    streaming sinks stamp every commit with (appId, epoch) so a
    replayed micro-batch is recognized and skipped)."""
    seen: dict[str, int] = {}
    ckpt = self.last_checkpoint_version()
    if ckpt is not None:
        top = self._checkpoint_top_file(ckpt)
        if top is not None:
            # classic file and v2 top file both hold the txn rows
            # (v2 sidecars are add-only by construction)
            for r in self.spark.read.parquet(top[0]).collect():
                if r["txn"] is not None:
                    t = r["txn"]
                    seen[t["appId"]] = max(
                        seen.get(t["appId"], -1), int(t["version"])
                    )
    for v in self._versions():
        with open(_commit_path(self.location, v)) as f:
            for line in f:
                if not line.strip():
                    continue
                action = json.loads(line)
                if "txn" in action:
                    t = action["txn"]
                    seen[t["appId"]] = max(
                        seen.get(t["appId"], -1), int(t["version"])
                    )
    return seen


def _append_idempotent(
    self, df: DataFrame, app_id: str, txn_version: int
) -> bool:
    """Exactly-once append: commit ``df`` stamped with a ``txn``
    action unless (app_id, version <= highest seen) already committed —
    then it is a REPLAY and the write is skipped. This is precisely how
    Delta streaming sinks achieve exactly-once over at-least-once
    micro-batch delivery (foreachBatch hands the same batchId again
    after a restart). Returns True if the commit happened."""
    if self.txn_versions().get(app_id, -1) >= txn_version:
        return False
    versions = self._versions()
    if not versions:
        # first commit must also lay protocol + metaData
        adds = self._write_data_files(df, [])
        actions = [
            {"commitInfo": {"operation": "STREAMING UPDATE"}},
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            self._meta_action(df, []),
            {"txn": {"appId": app_id, "version": txn_version}},
        ]
        actions.extend({"add": a} for a in adds)
        self._commit(0, actions)
        return True
    _, meta, _ = self._replay()
    from .delta_gen import apply_generated, assign_identity

    # streaming micro-batches honor the same generated/identity
    # contract as batch appends (compute/validate + watermark-in-commit)
    df = apply_generated(df, meta)
    df, id_meta = assign_identity(df, meta)
    part_cols = meta.get("partitionColumns", [])
    adds = self._write_data_files(df, part_cols)
    actions = [
        {"commitInfo": {"operation": "STREAMING UPDATE"}},
        {"txn": {"appId": app_id, "version": txn_version}},
    ]
    if id_meta is not None:
        actions.append({"metaData": id_meta})
    actions.extend({"add": a} for a in adds)
    self._commit(versions[-1] + 1, actions)
    return True


DeltaLogTable.txn_versions = _txn_versions
DeltaLogTable.append_idempotent = _append_idempotent


def stream_to_delta_log(
    stream_df: DataFrame,
    location: str,
    app_id: str,
    checkpoint_dir: str,
):
    """Structured-streaming sink into a DeltaLogTable via foreachBatch +
    idempotent txn appends: every micro-batch commits stamped with
    (app_id, batchId), so a batch redelivered after a restart is
    skipped — end-to-end exactly-once on top of the checkpointed
    source offsets, the same contract as the real Delta sink. Returns
    the StreamingQuery (caller awaits/stops it)."""
    spark = stream_df.sparkSession

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        DeltaLogTable(spark, location).append_idempotent(
            batch_df, app_id, int(batch_id)
        )

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


_CHECKPOINT_SCHEMA = (
    "txn struct<appId:string,version:bigint>, "
    "add struct<path:string,partitionValues:map<string,string>,"
    "size:bigint,modificationTime:bigint,dataChange:boolean,"
    "stats:string,deletionVector:struct<storageType:string,"
    "pathOrInlineDv:string,offset:int,sizeInBytes:int,"
    "cardinality:bigint>>, "
    "remove struct<path:string,deletionTimestamp:bigint,"
    "dataChange:boolean>, "
    "metaData struct<id:string,format:struct<provider:string,"
    "options:map<string,string>>,schemaString:string,"
    "partitionColumns:array<string>,configuration:map<string,string>,"
    "createdTime:bigint>, "
    "protocol struct<minReaderVersion:int,minWriterVersion:int,"
    "readerFeatures:array<string>,writerFeatures:array<string>>"
)


def _logdir(self) -> str:
    return os.path.join(self.location, "_delta_log")


def _write_checkpoint(
    self, v2: bool = False, sidecar_target_adds: int = 50_000
) -> int:
    """Write a parquet checkpoint of the CURRENT state — protocol,
    metaData, every live add, and the latest txn row per appId — plus
    the ``_last_checkpoint`` pointer. This is what lets the log's old
    JSON files expire (``clean_log``) without breaking readers: replay
    becomes checkpoint + JSON suffix, exactly the real Delta
    mechanism. Returns the checkpointed version.

    ``v2=True`` writes a V2 CHECKPOINT (the protocol's v2Checkpoint
    table feature): a top-level ``<v>.checkpoint.<uuid>.parquet``
    holding protocol/metaData/txn plus SIDECAR pointers, with the add
    actions sharded into content-addressed sidecar parquets under
    ``_delta_log/_sidecars/`` (~``sidecar_target_adds`` adds each,
    stable path-hash bucketing). Sidecars whose member add-set is
    unchanged since the last checkpoint REUSE the existing file
    byte-for-byte (the digest IS the name), so re-checkpointing after
    small commits writes O(changed buckets), not O(live files) — the
    single-file checkpoint's rewrite-the-world cost is the thing v2
    checkpoints exist to fix at 100 TB."""
    if v2:
        return _write_v2_checkpoint(self, sidecar_target_adds)
    live, meta, version = self._replay()
    rows = [
        (None, None, None, None, self.current_protocol()),
        (
            None, None, None,
            {
                "id": meta["id"],
                "format": meta.get(
                    "format", {"provider": "parquet", "options": {}}
                ),
                "schemaString": meta["schemaString"],
                "partitionColumns": meta.get("partitionColumns", []),
                "configuration": meta.get("configuration", {}),
                "createdTime": meta.get("createdTime"),
            },
            None,
        ),
    ]
    for add in live.values():
        rows.append((
            None,
            {
                "path": add["path"],
                "partitionValues": add.get("partitionValues", {}),
                "size": add.get("size"),
                "modificationTime": add.get("modificationTime"),
                "dataChange": add.get("dataChange", True),
                "stats": add.get("stats"),
                "deletionVector": add.get("deletionVector"),
            },
            None, None, None,
        ))
    for app, v in self.txn_versions().items():
        rows.append((
            {"appId": app, "version": v}, None, None, None, None,
        ))
    df = self.spark.createDataFrame(rows, _CHECKPOINT_SCHEMA)
    staging = os.path.join(self._logdir(), f"_ckpt_{uuid.uuid4().hex}")
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    one = [f for f in os.listdir(staging) if f.endswith(".parquet")][0]
    dst = os.path.join(
        self._logdir(), f"{version:020d}.checkpoint.parquet"
    )
    os.replace(os.path.join(staging, one), dst)
    for leftover in os.listdir(staging):
        os.remove(os.path.join(staging, leftover))
    os.rmdir(staging)
    lc_tmp = os.path.join(self._logdir(), f"_lc_{uuid.uuid4().hex}")
    with open(lc_tmp, "w") as f:
        json.dump({"version": version, "size": len(rows)}, f)
    os.replace(lc_tmp, os.path.join(self._logdir(), "_last_checkpoint"))
    return version


def _clean_log(self) -> list[str]:
    """Delete JSON commit files at or before the last checkpoint —
    the log-retention step real Delta runs; afterwards replay MUST go
    through the checkpoint (the reader does) and time travel below the
    checkpoint version fails loudly. Returns removed filenames."""
    ckpt = self.last_checkpoint_version()
    if ckpt is None:
        raise ValueError("no checkpoint; write_checkpoint() first")
    removed = []
    for v in self._versions():
        if v <= ckpt and v < max(self._versions()):
            path = _commit_path(self.location, v)
            os.remove(path)
            removed.append(os.path.basename(path))
    # sidecar GC: drop _sidecars/ files no remaining checkpoint top
    # file references (old checkpoints keep theirs until deleted)
    side_dir = os.path.join(self._logdir(), "_sidecars")
    if os.path.isdir(side_dir):
        referenced: set[str] = set()
        for fn in os.listdir(self._logdir()):
            if ".checkpoint." not in fn or not fn.endswith(".parquet"):
                continue
            top = os.path.join(self._logdir(), fn)
            for r in (
                self.spark.read.schema(_V2_TOP_SCHEMA)
                .parquet(top)
                .select("sidecar")
                .collect()
            ):
                if r["sidecar"] is not None:
                    referenced.add(
                        os.path.basename(r["sidecar"]["path"])
                    )
        for fn in os.listdir(side_dir):
            if fn not in referenced:
                os.remove(os.path.join(side_dir, fn))
                removed.append(f"_sidecars/{fn}")
    return removed


#: V2 top-file schema: the classic action columns plus the sidecar
#: pointer action (spec: file names relative to _delta_log/)
_V2_TOP_SCHEMA = (
    _CHECKPOINT_SCHEMA
    + ", sidecar struct<path:string,sizeInBytes:bigint>"
)


def _checkpoint_top_file(self, ckpt: int) -> tuple[str, bool] | None:
    """(path, is_v2) of the checkpoint file holding protocol/metaData/
    txn rows for version ``ckpt`` — the classic single file, or the V2
    top file named by ``_last_checkpoint``. None when neither exists."""
    lc_path = os.path.join(self._logdir(), "_last_checkpoint")
    if os.path.exists(lc_path):
        with open(lc_path) as f:
            lc = json.load(f)
        if lc.get("v2") and int(lc["version"]) == ckpt:
            top = os.path.join(self._logdir(), lc["checkpointFile"])
            if os.path.exists(top):
                return top, True
    classic = os.path.join(
        self._logdir(), f"{ckpt:020d}.checkpoint.parquet"
    )
    if os.path.exists(classic):
        return classic, False
    return None


def _add_row(add: dict) -> tuple:
    return (
        None,
        {
            "path": add["path"],
            "partitionValues": add.get("partitionValues", {}),
            "size": add.get("size"),
            "modificationTime": add.get("modificationTime"),
            "dataChange": add.get("dataChange", True),
            "stats": add.get("stats"),
            "deletionVector": add.get("deletionVector"),
        },
        None, None, None,
    )


def _write_v2_checkpoint(self, sidecar_target_adds: int) -> int:
    """The v2 path of ``write_checkpoint`` — see its docstring."""
    import hashlib

    from .delta_dml import _dv_upgraded_protocol

    live, meta, version = self._replay()
    # the feature gates the READER: stamp it before the first v2
    # checkpoint exists (one protocol commit, real Delta's upgrade)
    proto = self.current_protocol()
    if "v2Checkpoint" not in (proto.get("readerFeatures") or []):
        newp = _dv_upgraded_protocol(proto)
        r = set(newp.get("readerFeatures") or [])
        w = set(newp.get("writerFeatures") or [])
        r.add("v2Checkpoint")
        w.add("v2Checkpoint")
        newp["readerFeatures"] = sorted(r)
        newp["writerFeatures"] = sorted(w)
        self._commit(
            version + 1,
            [
                {
                    "commitInfo": {
                        "operation": "UPGRADE PROTOCOL",
                        "operationParameters": {
                            "feature": "v2Checkpoint"
                        },
                    }
                },
                {"protocol": newp},
            ],
        )
        live, meta, version = self._replay()
    logdir = self._logdir()
    side_dir = os.path.join(logdir, "_sidecars")
    os.makedirs(side_dir, exist_ok=True)
    # bucket-count HYSTERESIS: reuse only works while the path-hash
    # bucketing is stable, so keep the previous checkpoint's bucket
    # count until the average bucket drifts outside [target/4, 2x
    # target] — small commits then churn only their own buckets
    # instead of re-sharding the world on every size change
    target = max(1, sidecar_target_adds)
    n_buckets = max(1, -(-len(live) // target))
    lc_path = os.path.join(logdir, "_last_checkpoint")
    if os.path.exists(lc_path):
        with open(lc_path) as f:
            prior_lc = json.load(f)
        prior_n = prior_lc.get("buckets")
        if prior_n:
            avg = len(live) / prior_n
            if target / 4 <= avg <= 2 * target:
                n_buckets = prior_n
    buckets: dict[int, list[dict]] = {}
    for path in sorted(live):
        b = (
            int.from_bytes(
                hashlib.md5(path.encode()).digest()[:8], "big"
            )
            % n_buckets
        )
        buckets.setdefault(b, []).append(live[path])
    digests: dict[int, str] = {}
    changed: list[int] = []
    for b in sorted(buckets):
        ident = json.dumps(
            [
                (
                    a["path"],
                    a.get("size"),
                    a.get("stats"),
                    a.get("deletionVector"),
                    a.get("partitionValues") or {},
                )
                for a in buckets[b]
            ],
            sort_keys=True,
        )
        digests[b] = hashlib.sha256(ident.encode()).hexdigest()[:24]
        if not os.path.exists(
            os.path.join(side_dir, f"{digests[b]}.parquet")
        ):
            changed.append(b)
    if changed:
        # ONE partitioned write job for every churned bucket (a
        # per-bucket job would pay Spark job overhead O(buckets));
        # partitionBy strips the bucket column from the files
        rows = [
            (b, *(_add_row(a)))
            for b in changed
            for a in buckets[b]
        ]
        df = self.spark.createDataFrame(
            rows, "__bucket int, " + _CHECKPOINT_SCHEMA
        )
        staging = os.path.join(logdir, f"_sc_{uuid.uuid4().hex}")
        (
            df.repartition("__bucket")
            .write.mode("overwrite")
            .partitionBy("__bucket")
            .parquet(staging)
        )
        for b in changed:
            bdir = os.path.join(staging, f"__bucket={b}")
            parts = [
                f for f in os.listdir(bdir)
                if f.endswith(".parquet")
            ]
            if len(parts) == 1:
                os.replace(
                    os.path.join(bdir, parts[0]),
                    os.path.join(
                        side_dir, f"{digests[b]}.parquet"
                    ),
                )
            else:  # hash collision across tasks: concat driver-side
                import pyarrow.parquet as _pq

                tbl = _pq.read_table(bdir)
                _pq.write_table(
                    tbl,
                    os.path.join(
                        side_dir, f"{digests[b]}.parquet"
                    ),
                )
        import shutil as _shutil

        _shutil.rmtree(staging, ignore_errors=True)
    reused = len(buckets) - len(changed)
    written = len(changed)
    sidecar_rows = [
        {
            "path": f"_sidecars/{digests[b]}.parquet",
            "sizeInBytes": os.path.getsize(
                os.path.join(side_dir, f"{digests[b]}.parquet")
            ),
        }
        for b in sorted(buckets)
    ]
    rows = [
        (
            None, None, None, None,
            self.current_protocol(), None,
        ),
        (
            None, None, None,
            {
                "id": meta["id"],
                "format": meta.get(
                    "format", {"provider": "parquet", "options": {}}
                ),
                "schemaString": meta["schemaString"],
                "partitionColumns": meta.get("partitionColumns", []),
                "configuration": meta.get("configuration", {}),
                "createdTime": meta.get("createdTime"),
            },
            None, None,
        ),
    ]
    for app, v in self.txn_versions().items():
        rows.append(
            ({"appId": app, "version": v}, None, None, None, None,
             None)
        )
    for s in sidecar_rows:
        rows.append((None, None, None, None, None, s))
    top_name = f"{version:020d}.checkpoint.{uuid.uuid4().hex}.parquet"
    df = self.spark.createDataFrame(rows, _V2_TOP_SCHEMA)
    staging = os.path.join(logdir, f"_ckpt_{uuid.uuid4().hex}")
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    one = [f for f in os.listdir(staging) if f.endswith(".parquet")][0]
    os.replace(
        os.path.join(staging, one), os.path.join(logdir, top_name)
    )
    for leftover in os.listdir(staging):
        os.remove(os.path.join(staging, leftover))
    os.rmdir(staging)
    lc_tmp = os.path.join(logdir, f"_lc_{uuid.uuid4().hex}")
    with open(lc_tmp, "w") as f:
        json.dump(
            {
                "version": version,
                "size": len(rows) + len(live),
                "v2": True,
                "checkpointFile": top_name,
                "sidecars": len(sidecar_rows),
                "buckets": n_buckets,
                "sidecarsReused": reused,
                "sidecarsWritten": written,
            },
            f,
        )
    os.replace(lc_tmp, os.path.join(logdir, "_last_checkpoint"))
    return version


def _load_v2_checkpoint(self, lc: dict):
    """Seed replay state from a V2 checkpoint: the top file names the
    sidecars; ONE multi-path read collects their add actions."""
    logdir = os.path.join(self.location, "_delta_log")
    top = os.path.join(logdir, lc["checkpointFile"])
    live: dict[str, dict] = {}
    meta: dict = {}
    sidecars: list[str] = []
    for r in (
        self.spark.read.schema(_V2_TOP_SCHEMA).parquet(top).collect()
    ):
        if r["protocol"] is not None:
            self._check_protocol(r["protocol"].asDict())
        if r["metaData"] is not None:
            m = r["metaData"].asDict(recursive=True)
            meta = {k: v for k, v in m.items() if v is not None}
        if r["sidecar"] is not None:
            sidecars.append(os.path.join(logdir, r["sidecar"]["path"]))
        if r["add"] is not None:  # spec allows inline adds too
            a = r["add"].asDict(recursive=True)
            a["partitionValues"] = a.get("partitionValues") or {}
            live[a["path"]] = a
    if sidecars:
        for r in (
            self.spark.read.schema(_CHECKPOINT_SCHEMA)
            .parquet(*sidecars)
            .select("add")
            .collect()
        ):
            if r["add"] is not None:
                a = r["add"].asDict(recursive=True)
                a["partitionValues"] = a.get("partitionValues") or {}
                live[a["path"]] = a
    return live, meta


DeltaLogTable.write_checkpoint = _write_checkpoint
DeltaLogTable.clean_log = _clean_log
DeltaLogTable._logdir = _logdir
DeltaLogTable._checkpoint_top_file = _checkpoint_top_file


def _lcv(self) -> int | None:
    lc = os.path.join(self.location, "_delta_log", "_last_checkpoint")
    if not os.path.exists(lc):
        return None
    return int(json.load(open(lc))["version"])


DeltaLogTable.last_checkpoint_version = _lcv


def _current_protocol(self) -> dict:
    """The table's latest ``protocol`` action (checkpoint-seeded when
    the JSON below it has been cleaned) — needed so checkpoints and
    feature upgrades preserve reader/writer requirements."""
    proto: dict | None = None
    ckpt = self.last_checkpoint_version()
    versions = self._versions()
    if ckpt is not None and (not versions or min(versions) > 0):
        top = self._checkpoint_top_file(ckpt)
        if top is not None:
            for r in self.spark.read.parquet(top[0]).collect():
                if r["protocol"] is not None:
                    d = r["protocol"].asDict()
                    proto = {k: v for k, v in d.items() if v is not None}
    for v in versions:
        with open(_commit_path(self.location, v)) as f:
            for line in f:
                if not line.strip():
                    continue
                action = json.loads(line)
                if "protocol" in action:
                    proto = action["protocol"]
    return proto or {"minReaderVersion": 1, "minWriterVersion": 2}


DeltaLogTable.current_protocol = _current_protocol


def _generate_symlink_manifest(self) -> str:
    """``GENERATE symlink_format_manifest FOR TABLE`` on the protocol
    table — the exact call the reference makes right after its Delta
    write (delta/delta_scd_script.py:42-43) so Athena's
    SymlinkTextInputFormat DDL can serve the table: one ``file:`` URI
    per LIVE data file under ``_symlink_format_manifest/manifest``,
    tmp+rename atomic. Unpartitioned tables get the single manifest;
    partitioned tables get one manifest per partition directory
    (hive layout, matching the per-partition variant on
    PartitionedTable)."""
    live, meta, _ = self._replay()
    dvd = [p for p, a in live.items() if a.get("deletionVector")]
    if dvd:
        raise ValueError(
            "symlink manifests list raw parquet files for readers that "
            "cannot apply deletion vectors — files "
            f"{dvd[:3]} carry DVs; run optimize() (PURGE) first"
        )
    part_cols = meta.get("partitionColumns", [])
    base = os.path.join(self.location, "_symlink_format_manifest")
    by_dir: dict[str, list[str]] = {}
    for add in live.values():
        rel = add["path"]
        d = os.path.dirname(rel)
        by_dir.setdefault(d, []).append(
            "file:" + os.path.join(self.location, rel)
        )
    written = []
    for d, uris in sorted(by_dir.items()):
        mdir = os.path.join(base, d) if d else base
        os.makedirs(mdir, exist_ok=True)
        manifest = os.path.join(mdir, "manifest")
        tmp = manifest + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            for uri in sorted(uris):
                f.write(uri + "\n")
        os.replace(tmp, manifest)
        written.append(manifest)
    if part_cols and not by_dir:
        os.makedirs(base, exist_ok=True)
    return base


DeltaLogTable.generate_symlink_manifest = _generate_symlink_manifest


def _collect_file_stats(path: str) -> str | None:
    """Per-file column stats as the protocol's ``stats`` JSON string
    (numRecords / minValues / maxValues / nullCount), folded from the
    parquet footer's row-group statistics — metadata-only, no data
    read. Columns without usable stats are simply omitted (skipping
    must only ever remove files that cannot match)."""
    import pyarrow.parquet as pq

    try:
        md = pq.read_metadata(path)
    except Exception:
        return None
    mins: dict = {}
    maxs: dict = {}
    nulls: dict = {}
    dropped: set = set()
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema
            st = col.statistics
            import decimal

            try:
                if (
                    "." in name  # nested: out of the stats contract
                    or st is None
                    or not st.has_min_max
                    # binary: not comparable; decimal: not JSON-exact
                    # (a rounded min/max could wrongly exclude a file
                    # — omission is the only always-safe encoding);
                    # r11: decimal columns used to crash the whole
                    # stats dump (json.dumps on Decimal, and pyarrow
                    # raises on fixed-len-byte-array decimal stats at
                    # ACCESS time — hence the try)
                    or isinstance(st.min, (bytes, decimal.Decimal))
                ):
                    dropped.add(name)
                    continue
                lo, hi = st.min, st.max
            except Exception:
                dropped.add(name)
                continue
            mins[name] = lo if name not in mins else min(mins[name], lo)
            maxs[name] = hi if name not in maxs else max(maxs[name], hi)
            nulls[name] = nulls.get(name, 0) + (st.null_count or 0)
    for name in dropped:  # any gap makes the column's stats unusable
        mins.pop(name, None)
        maxs.pop(name, None)
        nulls.pop(name, None)
    def _js(v):
        import datetime

        if isinstance(v, (datetime.datetime, datetime.date)):
            return v.isoformat()
        return v

    return json.dumps(
        {
            "numRecords": md.num_rows,
            "minValues": {k: _js(v) for k, v in mins.items()},
            "maxValues": {k: _js(v) for k, v in maxs.items()},
            "nullCount": nulls,
        }
    )


def _physical_filters(meta: dict, filters: list[tuple]) -> list[tuple]:
    """Stats (and partitionValues) on column-mapped tables are keyed
    by PHYSICAL column names — translate predicate columns before
    consulting them."""
    from .delta_colmap import mapping_enabled, physical_names

    if not mapping_enabled(meta):
        return filters
    phys = physical_names(meta)
    return [(phys.get(c, c), op, v) for c, op, v in filters]


def _coerce_stat_bounds(lo, hi, value):
    """Align stats bounds with the literal's type: temporal stats are
    serialized as ISO strings (``_collect_file_stats``), so a
    datetime/date literal needs them parsed back before comparing —
    lexicographic ISO compare is chronologic for full timestamps but
    NOT across fractional-second spellings of the same instant."""
    import datetime as _dt

    if isinstance(lo, str) and isinstance(
        value, (_dt.datetime, _dt.date)
    ):
        if isinstance(value, _dt.datetime):
            return (
                _dt.datetime.fromisoformat(lo),
                _dt.datetime.fromisoformat(hi),
            )
        return (
            _dt.date.fromisoformat(lo[:10]),
            _dt.date.fromisoformat(hi[:10]),
        )
    return lo, hi


def _stats_may_match(
    add: dict, filters: list[tuple], part_cols: set
) -> bool:
    """True unless the add action's per-file stats PROVE the
    conjunction of ``(col, op, value)`` predicates cannot match —
    the one-sided contract file skipping needs (no stats → keep;
    incomparable stats → keep)."""
    raw = add.get("stats")
    if not raw:
        return True
    st = json.loads(raw)
    mins, maxs = st.get("minValues", {}), st.get("maxValues", {})
    for col, op, value in filters:
        if col in part_cols or col not in mins or col not in maxs:
            continue
        try:
            lo, hi = _coerce_stat_bounds(mins[col], maxs[col], value)
            if op == "==" and not (lo <= value <= hi):
                return False
            if op in (">", ">=") and hi < value:
                return False
            if op == ">" and hi == value and lo == hi:
                return False
            if op in ("<", "<=") and lo > value:
                return False
            if op == "<" and lo == value and lo == hi:
                return False
        except (TypeError, ValueError):
            continue  # can't prove anything from these stats: keep
    return True


def _files_matching(
    self, filters: list[tuple], version: int | None = None
) -> list[str]:
    """Relative paths of live files that SURVIVE stats-based skipping
    for the predicate conjunction — the pruned manifest
    ``read_filtered`` scans; exposed for observability and tests
    (e.g. measuring Z-order's skipping efficacy)."""
    live, meta, _ = self._replay(version)
    part_cols = set(meta.get("partitionColumns", []))
    filters = _physical_filters(meta, filters)
    return sorted(
        p
        for p, a in live.items()
        if _stats_may_match(a, filters, part_cols)
    )


DeltaLogTable.files_matching = _files_matching


def _read_filtered(
    self, filters: list[tuple], version: int | None = None
) -> DataFrame:
    """Stats-based file skipping over the protocol table: prune files
    whose ``stats`` min/max prove a conjunction of ``(col, op, value)``
    predicates (ops == >= > <= <) cannot match, then apply every
    predicate exactly as a residual filter — skipping only ever removes
    non-matching files, so results equal an unpruned filtered read
    (pinned by test). Files without stats are never pruned."""
    from pyspark.sql import functions as F

    live, meta, _ = self._replay(version)
    part_cols = set(meta.get("partitionColumns", []))
    pruned = {
        p: a
        for p, a in live.items()
        if _stats_may_match(a, _physical_filters(meta, filters), part_cols)
    }
    df = self._read_adds(list(pruned.values()), meta)
    ops = {
        "==": lambda c, v: c == v,
        ">=": lambda c, v: c >= v,
        ">": lambda c, v: c > v,
        "<=": lambda c, v: c <= v,
        "<": lambda c, v: c < v,
    }
    for col, op, value in filters:
        df = df.filter(ops[op](F.col(col), F.lit(value)))
    return df


DeltaLogTable.read_filtered = _read_filtered


def _restore(self, version: int) -> "DeltaLogTable":
    """RESTORE TABLE ... TO VERSION AS OF — protocol-legal rollback:
    ONE new commit whose actions re-point the live set at the target
    version's files (removes for files only in the head, adds for
    files only in the target). History is never rewritten — the
    restore itself is a version, so it can be time-traveled past or
    restored FROM, exactly Delta's RESTORE semantics. Requires the
    target version's files to still exist (VACUUM is the opposite
    decision; a vacuumed target refuses at read).

    METADATA restores too (schema evolution rolls back with the data)
    with Delta's one special case: identity high watermarks never go
    DOWN — lowering one would double-allocate ids after the next
    write — so the head's watermark is grafted onto the restored
    column metadata when it is higher."""
    target_live, target_meta, _ = self._replay(version)
    head_live, head_meta, head_v = self._replay()
    now = int(time.time() * 1000)
    actions: list[dict] = [
        {
            "commitInfo": {
                "operation": "RESTORE",
                "operationParameters": {"version": version},
            }
        }
    ]
    if target_meta != head_meta:
        from .delta_gen import ID_HWM_KEY, identity_cols

        restored = dict(target_meta)
        head_ids = identity_cols(head_meta)
        if head_ids:
            schema = json.loads(restored["schemaString"])
            for f in schema.get("fields", []):
                spec = head_ids.get(f["name"])
                hwm = (spec or {}).get("highWaterMark")
                if hwm is None:
                    continue
                md_ = dict(f.get("metadata") or {})
                if md_.get(ID_HWM_KEY) is None or md_[ID_HWM_KEY] < hwm:
                    md_[ID_HWM_KEY] = hwm
                f["metadata"] = md_
            restored["schemaString"] = json.dumps(schema)
        actions.append({"metaData": restored})
    for path in sorted(set(head_live) - set(target_live)):
        actions.append(
            {
                "remove": {
                    "path": path,
                    "deletionTimestamp": now,
                    "dataChange": True,
                }
            }
        )
    for path in sorted(target_live):
        # compare FULL add actions, not path sets: a DV-mode DELETE
        # re-adds the same path with a deletionVector descriptor, so a
        # path live in both snapshots may still need re-pointing
        # (ADVICE r9 — restore-past-a-DV-delete was a silent no-op)
        if path in head_live and head_live[path] == target_live[path]:
            continue
        if path in head_live:
            actions.append(
                {
                    "remove": {
                        "path": path,
                        "deletionTimestamp": now,
                        "dataChange": True,
                    }
                }
            )
        actions.append({"add": dict(target_live[path])})
    self._commit(head_v + 1, actions)
    return self


DeltaLogTable.restore = _restore
