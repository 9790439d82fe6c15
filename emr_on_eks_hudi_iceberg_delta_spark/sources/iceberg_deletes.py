"""Iceberg v2 merge-on-read DELETE: position-delete files, compaction,
and snapshot rollback for the runtime-less Iceberg layout.

The reference's Iceberg job runs on iceberg-spark-runtime
(iceberg/iceberg_submit.sh:33-34 — jar verifiably absent here), where
``DELETE FROM`` on a merge-on-read table writes *position delete
files*: parquet files whose rows are ``(file_path: string, pos:
long)`` pairs (spec field-ids 2147483546 / 2147483545), tracked in a
DELETE manifest (manifest-list ``content`` = 1) and applied by readers
to exactly the data files they name. This module implements that
against the open spec (https://iceberg.apache.org/spec/#position-delete-files):

* ``delete(cond)`` — one pushed-down predicate scan finds the matching
  (file, row-position) pairs; they land in ONE sorted position-delete
  parquet; the commit writes a data manifest carrying every live data
  file as EXISTING, a delete manifest carrying prior delete files plus
  the new one, and bumps ``format-version`` to 2. No data file is
  rewritten (pinned by test).
* reads (iceberg_layout._scan_files) anti-join the delete pairs via
  ``_metadata.row_index`` — only named files pay the per-file scan.
* ``rewrite_data_files()`` — compaction: materializes the deletes into
  fresh data files (the overwrite snapshot lists only the rewrite, so
  delete files fall away), Iceberg's rewriteDataFiles + the implicit
  rewritePositionDeletes.
* ``rollback(snapshot_id)`` — metadata-only: re-point
  ``current-snapshot-id`` at any retained snapshot in a NEW metadata
  version (history preserved; the rollback is itself visible in the
  snapshot-log), Iceberg's ``rollback_to_snapshot``.

Scoping note (honest contract): position-delete applicability here is
by exact ``file_path`` — sound without sequence-number bookkeeping
because data-file names are fresh UUIDs (a delete can never name a
file written after it). Sequence numbers exist in the spec chiefly for
*equality* deletes, which stay out of contract (loud error nowhere —
simply no API writes them).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, functions as F

from .avro_io import write_ocf
from .iceberg_layout import (
    CONTENT_DATA,
    CONTENT_POS_DELETES,
    MANIFEST_FILE_SCHEMA,
    STATUS_ADDED,
    STATUS_DELETED,
    STATUS_EXISTING,
    IcebergTable,
    manifest_entry_schema,
)

#: manifest-entry schema for DELETE manifests: the nested file struct
#: carries ``content`` (spec field-id 134) and no partition record
#: (our delete files are partition-global: they name files by path).
DELETE_MANIFEST_ENTRY_SCHEMA = {
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
                    {"name": "content", "type": "int", "field-id": 134},
                    {"name": "file_path", "type": "string",
                     "field-id": 100},
                    {"name": "file_format", "type": "string",
                     "field-id": 101},
                    {"name": "record_count", "type": "long",
                     "field-id": 103},
                    {"name": "file_size_in_bytes", "type": "long",
                     "field-id": 104},
                ],
            },
        },
    ],
}

_ICE2AVRO = {
    "long": "long",
    "int": "int",
    "double": "double",
    "float": "float",
    "string": "string",
    "boolean": "boolean",
}


def _part_fields_from_md(md: dict) -> list[tuple[str, str]]:
    spec = md["partition-specs"][md.get("default-spec-id", 0)]
    types = {f["name"]: f["type"] for f in md["schema"]["fields"]}
    return [
        (f["name"], _ICE2AVRO[types[f["name"]]])
        for f in spec["fields"]
    ]


def _advance_metadata(self: IcebergTable, md: dict) -> int:
    """Write the next vN.metadata.json and swap version-hint.text —
    the same atomic-pointer commit tail as _commit."""
    cur = self._current_version()
    next_v = (cur or 0) + 1
    md["last-updated-ms"] = int(time.time() * 1000)
    mpath = os.path.join(self.meta_dir, f"v{next_v}.metadata.json")
    tmp = mpath + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(md, f)
    try:
        os.link(tmp, mpath)  # atomic put-if-absent (OCC)
    except FileExistsError:
        from .tables import ConcurrentCommitError

        raise ConcurrentCommitError(
            f"metadata version {next_v} was committed by another "
            "writer; re-read the table and retry the operation"
        ) from None
    finally:
        os.remove(tmp)
    hint_tmp = os.path.join(self.meta_dir, f"_hint-{uuid.uuid4().hex}")
    with open(hint_tmp, "w") as f:
        f.write(str(next_v))
    os.replace(
        hint_tmp, os.path.join(self.meta_dir, "version-hint.text")
    )
    return next_v


def _write_pos_delete_file(self: IcebergTable, pairs: list[tuple]) -> dict:
    """One position-delete parquet, rows sorted by (file_path, pos)
    per the spec."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pairs = sorted(pairs)
    dst = os.path.join(self.data_dir, f"{uuid.uuid4().hex}-deletes.parquet")
    table = pa.table(
        {
            "file_path": pa.array([p for p, _ in pairs], pa.string()),
            "pos": pa.array([i for _, i in pairs], pa.int64()),
        }
    )
    tmp = dst + f".tmp-{uuid.uuid4().hex}"
    pq.write_table(table, tmp)
    os.replace(tmp, dst)
    return {
        "content": CONTENT_POS_DELETES,
        "file_path": dst,
        "file_format": "PARQUET",
        "record_count": len(pairs),
        "file_size_in_bytes": os.path.getsize(dst),
    }


def _delete(self: IcebergTable, condition) -> dict:
    """DELETE FROM <table> WHERE <condition>, merge-on-read: writes a
    position-delete file instead of rewriting data (SQL NULL-predicate
    rows are kept). Returns {files_named, rows_deleted, snapshot_id};
    snapshot_id None when nothing matched (no empty snapshot)."""
    cond = F.expr(condition) if isinstance(condition, str) else condition
    md = self._metadata()
    data_entries = [
        e for e in self._entries() if e["status"] != STATUS_DELETED
    ]
    prior_deletes = [
        e
        for e in self._entries(content=CONTENT_POS_DELETES)
        if e["status"] != STATUS_DELETED
    ]
    # per-file scan with row positions, existing deletes applied; the
    # CURRENT table schema is explicit so pre-evolution files align
    from .iceberg_layout import _spark_schema_from_md

    schema = _spark_schema_from_md(md)
    pieces = []
    for e in data_entries:
        p = e["data_file"]["file_path"]
        pieces.append(
            self.spark.read.schema(schema).parquet(p)
            .withColumn("__file", F.lit(p))
            .withColumn("__pos", F.col("_metadata.row_index"))
        )
    if not pieces:
        return {"files_named": 0, "rows_deleted": 0, "snapshot_id": None}
    scan = pieces[0]
    for piece in pieces[1:]:
        scan = scan.unionByName(piece)
    if prior_deletes:
        pairs_df = self.spark.read.parquet(
            *[e["data_file"]["file_path"] for e in prior_deletes]
        ).select(
            F.col("file_path").alias("__file"),
            F.col("pos").alias("__pos"),
        )
        scan = scan.join(
            F.broadcast(pairs_df), ["__file", "__pos"], "left_anti"
        )
    hits = (
        scan.filter(cond)
        .groupBy("__file")
        .agg(F.sort_array(F.collect_list("__pos")).alias("pos"))
        .collect()
    )
    if not hits:
        return {"files_named": 0, "rows_deleted": 0, "snapshot_id": None}
    pairs = [
        (r["__file"], int(p)) for r in hits for p in r["pos"]
    ]
    new_delete = _write_pos_delete_file(self, pairs)

    snapshot_id = _commit_mor_snapshot(
        self, md, data_entries, prior_deletes, new_delete, [], "delete"
    )
    return {
        "files_named": len(hits),
        "rows_deleted": len(pairs),
        "snapshot_id": snapshot_id,
    }


def _rewrite_data_files(self: IcebergTable, target_files: int | None = None):
    """Compaction: rewrite the CURRENT logical state as fresh data
    files in one overwrite snapshot — position deletes are materialized
    (the new snapshot's manifests list neither the old data files nor
    any delete manifest), Iceberg's rewriteDataFiles maintenance. Old
    snapshots stay time-travelable until expire_snapshots."""
    md = self._metadata()
    part_cols = [
        f["name"]
        for f in md["partition-specs"][md.get("default-spec-id", 0)][
            "fields"
        ]
    ]
    df = self.read()
    if target_files:
        df = df.repartition(target_files)
    return self.overwrite(df, partition_by=part_cols or None)


def _rollback(self: IcebergTable, snapshot_id: int) -> int:
    """rollback_to_snapshot: metadata-only commit re-pointing
    current-snapshot-id at a retained snapshot. All snapshots stay in
    history (a later roll-forward is just another rollback)."""
    md = self._metadata()
    ids = [s["snapshot-id"] for s in md["snapshots"]]
    if snapshot_id not in ids:
        raise ValueError(
            f"snapshot {snapshot_id} not in table history {ids}"
        )
    md["current-snapshot-id"] = snapshot_id
    md["snapshot-log"] = md.get("snapshot-log", []) + [
        {
            "timestamp-ms": int(time.time() * 1000),
            "snapshot-id": snapshot_id,
        }
    ]
    return _advance_metadata(self, md)


IcebergTable.delete = _delete
IcebergTable.rewrite_data_files = _rewrite_data_files
IcebergTable.rollback = _rollback


def _snapshot_at_timestamp(self: IcebergTable, ts_ms: int) -> int:
    """Iceberg's timestamp time travel: the latest snapshot whose
    ``timestamp-ms`` is at or before ``ts_ms`` (snapshots carry their
    commit times in table metadata — no filesystem mtimes needed)."""
    md = self._metadata()
    ok = [
        s["snapshot-id"]
        for s in md["snapshots"]
        if s["timestamp-ms"] <= ts_ms
    ]
    if not ok:
        raise ValueError(
            f"no snapshot at or before timestamp {ts_ms}"
        )
    # snapshots are appended in commit order; the last qualifying wins
    return ok[-1]


def _read_as_of_timestamp(self: IcebergTable, ts_ms: int):
    return self.read(snapshot_id=self.snapshot_at_timestamp(ts_ms))


IcebergTable.snapshot_at_timestamp = _snapshot_at_timestamp
IcebergTable.read_as_of_timestamp = _read_as_of_timestamp


def _append_idempotent(
    self: IcebergTable, df, app_id: str, epoch: int
) -> bool:
    """Exactly-once append: snapshot summaries carry (app-id, epoch),
    and a replayed epoch (foreachBatch redelivery after a restart) is
    recognized and skipped — the same bookkeeping real Iceberg
    streaming sinks keep in their snapshot summary properties. Returns
    True if the commit happened."""
    if self._current_version() is not None:
        md = self._metadata()
        seen = max(
            (
                int(s["summary"]["epoch"])
                for s in md["snapshots"]
                if s.get("summary", {}).get("app-id") == app_id
                and "epoch" in s.get("summary", {})
            ),
            default=-1,
        )
        if epoch <= seen:
            return False
    self._summary_extra = {"app-id": app_id, "epoch": str(epoch)}
    try:
        self.append(df)
    finally:
        self._summary_extra = None
    return True


def stream_to_iceberg(
    stream_df,
    location: str,
    checkpoint_dir: str,
    app_id: str = "iceberg-sink",
):
    """Exactly-once foreachBatch streaming sink into the Iceberg
    layout (the Iceberg twin of delta_log.stream_to_delta_log): each
    micro-batch appends ONE snapshot stamped with its batch id; a
    redelivered batch after restart is skipped by the summary check."""
    from pyspark.sql import SparkSession

    def write_batch(batch_df, batch_id: int) -> None:
        spark = SparkSession.getActiveSession()
        t = IcebergTable(spark, location)
        t.append_idempotent(batch_df, app_id, int(batch_id))

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
    )


IcebergTable.append_idempotent = _append_idempotent


def _commit_mor_snapshot(
    self: IcebergTable,
    md: dict,
    data_entries: list[dict],
    prior_deletes: list[dict],
    new_delete: dict | None,
    new_data_files: list[dict],
    operation: str,
) -> int:
    """Shared commit tail for merge-on-read DML snapshots: one data
    manifest (live files EXISTING + any new files ADDED), one delete
    manifest (prior delete files EXISTING + the new one ADDED),
    format-version 2."""
    snapshot_id = int(uuid.uuid4().int % (1 << 62))
    now = int(time.time() * 1000)
    part_fields = _part_fields_from_md(md)
    dm_path = os.path.join(self.meta_dir, f"snap-{snapshot_id}-m0.avro")
    write_ocf(
        dm_path,
        manifest_entry_schema(part_fields),
        [
            {
                "status": STATUS_EXISTING,
                "snapshot_id": e["snapshot_id"],
                "data_file": e["data_file"],
            }
            for e in data_entries
        ]
        + [
            {
                "status": STATUS_ADDED,
                "snapshot_id": snapshot_id,
                "data_file": f,
            }
            for f in new_data_files
        ],
    )
    del_entries = [
        {
            "status": STATUS_EXISTING,
            "snapshot_id": e["snapshot_id"],
            "data_file": e["data_file"],
        }
        for e in prior_deletes
    ]
    if new_delete is not None:
        del_entries.append(
            {
                "status": STATUS_ADDED,
                "snapshot_id": snapshot_id,
                "data_file": new_delete,
            }
        )
    del_path = os.path.join(
        self.meta_dir, f"snap-{snapshot_id}-m1-deletes.avro"
    )
    write_ocf(del_path, DELETE_MANIFEST_ENTRY_SCHEMA, del_entries)
    mlist_path = os.path.join(self.meta_dir, f"snap-{snapshot_id}.avro")
    write_ocf(
        mlist_path,
        MANIFEST_FILE_SCHEMA,
        [
            {
                "manifest_path": dm_path,
                "manifest_length": os.path.getsize(dm_path),
                "partition_spec_id": 0,
                "added_snapshot_id": snapshot_id,
                "added_data_files_count": len(new_data_files),
                "existing_data_files_count": len(data_entries),
                "deleted_data_files_count": 0,
                "content": CONTENT_DATA,
            },
            {
                "manifest_path": del_path,
                "manifest_length": os.path.getsize(del_path),
                "partition_spec_id": 0,
                "added_snapshot_id": snapshot_id,
                "added_data_files_count": 1 if new_delete else 0,
                "existing_data_files_count": len(prior_deletes),
                "deleted_data_files_count": 0,
                "content": CONTENT_POS_DELETES,
            },
        ],
    )
    md["format-version"] = 2
    md["snapshots"] = md["snapshots"] + [
        {
            "snapshot-id": snapshot_id,
            "timestamp-ms": now,
            "manifest-list": mlist_path,
            "summary": {"operation": operation},
        }
    ]
    md["snapshot-log"] = md.get("snapshot-log", []) + [
        {"timestamp-ms": now, "snapshot-id": snapshot_id}
    ]
    md["current-snapshot-id"] = snapshot_id
    _advance_metadata(self, md)
    return snapshot_id


def _update(self: IcebergTable, condition, assignments: dict) -> dict:
    """UPDATE ... SET ... WHERE on the Iceberg layout, merge-on-read:
    matching rows become position deletes AND re-land as a fresh data
    file with the SET expressions applied against the OLD row — one
    snapshot, no existing data file rewritten (Iceberg's MoR UPDATE
    execution). NULL predicates keep the row untouched."""
    cond = F.expr(condition) if isinstance(condition, str) else condition
    md = self._metadata()
    from .iceberg_layout import _spark_schema_from_md

    schema = _spark_schema_from_md(md)
    out_cols = [f.name for f in schema.fields]
    bad = sorted(set(assignments) - set(out_cols))
    if bad:
        raise ValueError(f"SET targets not in table schema: {bad}")
    data_entries = [
        e for e in self._entries() if e["status"] != STATUS_DELETED
    ]
    prior_deletes = [
        e
        for e in self._entries(content=CONTENT_POS_DELETES)
        if e["status"] != STATUS_DELETED
    ]
    pieces = []
    for e in data_entries:
        p = e["data_file"]["file_path"]
        pieces.append(
            self.spark.read.schema(schema).parquet(p)
            .withColumn("__file", F.lit(p))
            .withColumn("__pos", F.col("_metadata.row_index"))
        )
    if not pieces:
        return {"rows_updated": 0, "snapshot_id": None}
    scan = pieces[0]
    for piece in pieces[1:]:
        scan = scan.unionByName(piece)
    if prior_deletes:
        pairs_df = self.spark.read.parquet(
            *[e["data_file"]["file_path"] for e in prior_deletes]
        ).select(
            F.col("file_path").alias("__file"),
            F.col("pos").alias("__pos"),
        )
        scan = scan.join(
            F.broadcast(pairs_df), ["__file", "__pos"], "left_anti"
        )
    hit = scan.filter(F.coalesce(cond, F.lit(False)))
    positions = [
        (r["__file"], int(r["__pos"]))
        for r in hit.select("__file", "__pos").collect()
    ]
    if not positions:
        return {"rows_updated": 0, "snapshot_id": None}
    new_delete = _write_pos_delete_file(self, positions)
    sets = {
        c: (F.expr(e) if isinstance(e, str) else e)
        for c, e in assignments.items()
    }
    types = {f.name: f.dataType for f in schema.fields}
    updated = hit.select(
        *[
            (sets[c].cast(types[c]).alias(c) if c in sets else F.col(c))
            for c in out_cols
        ]
    )
    part_cols = [
        f["name"]
        for f in md["partition-specs"][md.get("default-spec-id", 0)][
            "fields"
        ]
    ]
    new_files = self._write_data(updated, part_cols)
    snapshot_id = _commit_mor_snapshot(
        self, md, data_entries, prior_deletes, new_delete, new_files,
        "overwrite",
    )
    return {"rows_updated": len(positions), "snapshot_id": snapshot_id}


IcebergTable.update = _update


def _merge_into(
    self: IcebergTable,
    source,
    key_cols: list[str],
    when_matched_update: dict | None = None,
    when_matched_delete: str | None = None,
    insert_unmatched: bool = True,
) -> dict:
    """MERGE INTO on the Iceberg layout, merge-on-read — the statement
    the reference's Iceberg job runs (iceberg flavor MERGE, SURVEY S10)
    executed the way Iceberg v2 does: every MATCHED target row becomes
    a position delete; matched-update rows re-land with SET expressions
    over ``t.*``/``s.*`` evaluated against the OLD row; unmatched
    source rows insert (absent target columns -> typed NULLs) — all in
    ONE snapshot, zero pre-merge files rewritten. Matched-DELETE is
    evaluated before UPDATE; NULL merge keys never match (SQL join
    semantics); an ambiguous source refuses loudly."""
    md = self._metadata()
    from .iceberg_layout import _spark_schema_from_md

    schema = _spark_schema_from_md(md)
    out_cols = [f.name for f in schema.fields]
    types = {f.name: f.dataType for f in schema.fields}
    data_entries = [
        e for e in self._entries() if e["status"] != STATUS_DELETED
    ]
    prior_deletes = [
        e
        for e in self._entries(content=CONTENT_POS_DELETES)
        if e["status"] != STATUS_DELETED
    ]
    pieces = []
    for e in data_entries:
        p = e["data_file"]["file_path"]
        pieces.append(
            self.spark.read.schema(schema).parquet(p)
            .withColumn("__file", F.lit(p))
            .withColumn("__pos", F.col("_metadata.row_index"))
        )
    scan = None
    if pieces:
        scan = pieces[0]
        for piece in pieces[1:]:
            scan = scan.unionByName(piece)
        if prior_deletes:
            pairs_df = self.spark.read.parquet(
                *[e["data_file"]["file_path"] for e in prior_deletes]
            ).select(
                F.col("file_path").alias("__file"),
                F.col("pos").alias("__pos"),
            )
            scan = scan.join(
                F.broadcast(pairs_df), ["__file", "__pos"], "left_anti"
            )
    src = source.withColumn("__s_matched", F.lit(True)).alias("s")
    join_cond = None
    for k in key_cols:
        c = F.col(f"t.{k}") == F.col(f"s.{k}")
        join_cond = c if join_cond is None else (join_cond & c)
    report = {
        "rows_deleted": 0,
        "rows_updated": 0,
        "rows_inserted": 0,
        "snapshot_id": None,
    }
    new_delete = None
    new_files: list[dict] = []
    part_cols = [
        f["name"]
        for f in md["partition-specs"][md.get("default-spec-id", 0)][
            "fields"
        ]
    ]
    if scan is not None and (when_matched_update or when_matched_delete):
        joined = scan.alias("t").join(src, join_cond, "inner")
        dup = (
            joined.groupBy("t.__file", "t.__pos")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            raise ValueError(
                "MERGE: multiple source rows match a single target row"
            )
        del_cond = (
            F.expr(when_matched_delete)
            if when_matched_delete is not None
            else F.lit(False)
        )
        matched_rows = joined
        positions = [
            (r["__file"], int(r["__pos"]))
            for r in matched_rows.select("t.__file", "t.__pos").collect()
        ]
        if positions:
            new_delete = _write_pos_delete_file(self, positions)
            deleted_n = matched_rows.filter(
                F.coalesce(del_cond, F.lit(False))
            ).count()
            report["rows_deleted"] = deleted_n
            if when_matched_update:
                urows = matched_rows.filter(
                    ~F.coalesce(del_cond, F.lit(False))
                )
                updated = urows.select(
                    *[
                        (
                            F.expr(when_matched_update[c])
                            .cast(types[c])
                            .alias(c)
                            if c in when_matched_update
                            else F.col(f"t.{c}").alias(c)
                        )
                        for c in out_cols
                    ]
                )
                new_files.extend(
                    self._write_data(updated, part_cols)
                )
                report["rows_updated"] = len(positions) - deleted_n
            elif when_matched_delete:
                # delete-only merge: matched rows NOT hitting the
                # delete condition must survive — re-insert them
                keep = matched_rows.filter(
                    ~F.coalesce(del_cond, F.lit(False))
                ).select(
                    *[F.col(f"t.{c}").alias(c) for c in out_cols]
                )
                new_files.extend(self._write_data(keep, part_cols))
    if insert_unmatched:
        tkeys = (
            scan.select(*key_cols).distinct()
            if scan is not None
            else None
        )
        unmatched = (
            source.join(tkeys, key_cols, "left_anti")
            if tkeys is not None
            else source
        )
        ins = unmatched.select(
            *[
                (
                    F.col(c).cast(types[c])
                    if c in source.columns
                    else F.lit(None).cast(types[c])
                ).alias(c)
                for c in out_cols
            ]
        )
        n_ins = ins.count()
        if n_ins:
            new_files.extend(self._write_data(ins, part_cols))
            report["rows_inserted"] = n_ins
    if new_delete is None and not new_files:
        return report
    report["snapshot_id"] = _commit_mor_snapshot(
        self, md, data_entries, prior_deletes, new_delete, new_files,
        "overwrite",
    )
    return report


IcebergTable.merge_into = _merge_into
