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

* ``delete(cond)`` — one pushed-down multi-path predicate scan finds
  the matching (file, row-position) pairs; they land in position-
  delete parquets written EXECUTOR-side (one per non-empty shuffle
  partition, each spec-sorted by (file_path, pos) — the driver holds
  only descriptors); the commit writes a data manifest carrying every
  live data file as EXISTING, a delete manifest carrying prior delete
  files plus the new ones, and bumps ``format-version`` to 2. No data
  file is rewritten (pinned by test).
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

Position-delete applicability is by exact ``file_path`` — sound
without sequence-number arithmetic because data-file names are fresh
UUIDs (a delete can never name a file written after it).

r10 adds the spec's OTHER v2 delete kind: ``equality_delete(keys)``
writes content=2 delete files keyed by ``equality_ids`` (schema field
ids), applied with real sequence-number semantics — snapshots carry
``sequence-number`` (metadata tracks ``last-sequence-number``), and an
equality delete masks only rows in data files whose data sequence
number is STRICTLY less than the delete's, so rows upserted after the
delete survive it (the streaming-upsert primitive real writers emit).
Null keys match null (spec: null-safe equality). Appends carry
equality deletes forward; rewrite_data_files materializes them away.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, functions as F

from .avro_io import read_ocf, write_ocf
from .iceberg_layout import (
    CONTENT_DATA,
    CONTENT_EQ_DELETES,
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
                    # spec field-id 135: set only on equality-delete
                    # files (content=2); position deletes leave null
                    {
                        "name": "equality_ids",
                        "type": ["null", {"type": "array", "items": "int"}],
                        "field-id": 135,
                    },
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
    from .iceberg_layout import all_spec_part_fields

    return all_spec_part_fields(md)


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


#: above this many recorded delete pairs the position-delete read
#: anti-join switches from broadcast to shuffle — a heavily-deleted
#: table's pair set must not ship to every executor
POS_DELETE_BROADCAST_MAX_PAIRS = 2_000_000


def _split_delete_entries(self: IcebergTable) -> tuple[list, list, list]:
    """Live delete-manifest entries split by kind: (all, position,
    equality). Commits carry ALL forward; scans apply each kind its
    own way."""
    alive = [
        e
        for e in self._entries(content=CONTENT_POS_DELETES)
        if e["status"] != STATUS_DELETED
    ]
    pos = [
        e
        for e in alive
        if e["data_file"].get("content", CONTENT_POS_DELETES)
        == CONTENT_POS_DELETES
    ]
    eq = [
        e
        for e in alive
        if e["data_file"].get("content") == CONTENT_EQ_DELETES
    ]
    return alive, pos, eq


def _scan_with_pos_ice(
    self: IcebergTable,
    data_entries: list[dict],
    prior_deletes: list[dict],
    schema,
    eq_entries: list[dict] | None = None,
):
    """ONE multi-path scan of the live data files exposing ``__file``
    (the manifest's absolute file_path) and ``__pos``
    (``_metadata.row_index``), existing position deletes already
    anti-joined — the shared DML source. Plans O(1) scans regardless
    of file count (Iceberg data files contain their partition columns,
    so no per-partition literal injection is needed); ``__file`` comes
    back through a broadcast basename map (basenames are fresh UUIDs),
    sidestepping file-URI encoding. The prior-pair anti-join
    broadcasts below POS_DELETE_BROADCAST_MAX_PAIRS recorded pairs and
    shuffles above."""
    paths = [e["data_file"]["file_path"] for e in data_entries]
    if not paths:
        return None
    from .iceberg_layout import (
        _spark_struct_of,
        _spark_type_str,
        entry_schema_id,
        ice_schema_by_id,
    )

    md = self._metadata()
    cur_sid = md.get(
        "current-schema-id", md["schema"].get("schema-id", 0)
    )
    name_map = self.spark.createDataFrame(
        [(os.path.basename(p), p) for p in paths],
        "__name string, __file string",
    )
    # one multi-path scan per WRITE-TIME schema version, aligned to
    # the current schema by field id (rename/drop-safe)
    groups: dict[int, list[str]] = {}
    for e in data_entries:
        groups.setdefault(entry_schema_id(md, e), []).append(
            e["data_file"]["file_path"]
        )
    target = ice_schema_by_id(md, cur_sid)
    pieces = []
    for sid in sorted(groups):
        ice = ice_schema_by_id(md, sid)
        df = (
            self.spark.read.schema(_spark_struct_of(ice))
            .parquet(*groups[sid])
            .withColumn(
                "__name",
                F.element_at(
                    F.split(F.col("_metadata.file_path"), "/"), -1
                ),
            )
            .withColumn("__pos", F.col("_metadata.row_index"))
        )
        by_id = {f["id"]: f["name"] for f in ice["fields"]}
        cols = []
        for f in target["fields"]:
            t = _spark_type_str(f["type"])
            nm = by_id.get(f["id"])
            cols.append(
                F.lit(None).cast(t).alias(f["name"])
                if nm is None
                else F.col(nm).cast(t).alias(f["name"])
            )
        pieces.append(df.select(*cols, "__name", "__pos"))
    scan = pieces[0]
    for p_ in pieces[1:]:
        scan = scan.unionByName(p_)
    scan = scan.join(F.broadcast(name_map), "__name").drop("__name")
    if prior_deletes:
        pairs_df = self.spark.read.parquet(
            *[e["data_file"]["file_path"] for e in prior_deletes]
        ).select(
            F.col("file_path").alias("__file"),
            F.col("pos").alias("__pos"),
        )
        total = sum(
            e["data_file"].get("record_count", 0) for e in prior_deletes
        )
        if total <= POS_DELETE_BROADCAST_MAX_PAIRS:
            pairs_df = F.broadcast(pairs_df)
        scan = scan.join(pairs_df, ["__file", "__pos"], "left_anti")
    if eq_entries:
        # equality deletes mask rows whose DATA FILE's sequence number
        # is strictly below the delete's: the scan carries __file, so
        # one broadcast file→seq map + per-column-set anti-joins with
        # a seq guard apply them without splitting the scan
        from .iceberg_layout import seq_of_snapshot

        md = self._metadata()
        seq_map = self.spark.createDataFrame(
            [
                (
                    e["data_file"]["file_path"],
                    seq_of_snapshot(md, e["snapshot_id"]),
                )
                for e in data_entries
            ],
            "__file string, __seq bigint",
        )
        scan = scan.join(F.broadcast(seq_map), "__file")
        by_cols: dict[tuple, list] = {}
        for e in eq_entries:
            cols = self._eq_cols_of(md, e)
            by_cols.setdefault(cols, []).append(
                (e["data_file"], seq_of_snapshot(md, e["snapshot_id"]))
            )
        for cols, dfs in by_cols.items():
            # key files store WRITE-TIME column names (fixed
            # equality_ids order): group by (footer schema, delete
            # seq) so each group rides ONE multi-path read — plan
            # pieces O(distinct schema×seq), not O(key files)
            import pyarrow.parquet as pq

            by_grp: dict[tuple, list[str]] = {}
            for d, dseq in dfs:
                names = tuple(pq.read_schema(d["file_path"]).names)
                by_grp.setdefault((names, dseq), []).append(
                    d["file_path"]
                )
            keys = None
            for (_names, dseq), fps in sorted(by_grp.items()):
                k = (
                    self.spark.read.parquet(*fps)
                    .toDF(*cols)
                    .withColumn("__dseq", F.lit(dseq).cast("bigint"))
                )
                keys = k if keys is None else keys.unionByName(k)
            keys = keys.dropDuplicates().alias("__eqk")
            total = sum(d.get("record_count", 0) for d, _ in dfs)
            if total <= POS_DELETE_BROADCAST_MAX_PAIRS:
                keys = F.broadcast(keys)
            t = scan.alias("__eqt")
            cond = F.col("__eqt.__seq") < F.col("__eqk.__dseq")
            for c in cols:
                cond = cond & F.col(f"__eqt.{c}").eqNullSafe(
                    F.col(f"__eqk.{c}")
                )
            scan = t.join(keys, cond, "left_anti")
        scan = scan.drop("__seq")
    return scan


def _write_pos_delete_files_distributed(
    self: IcebergTable, hits
) -> list[dict]:
    """Write position-delete parquet files EXECUTOR-side from a
    DataFrame of (``__file``, ``__pos``) hits: repartition by
    file_path + sortWithinPartitions keeps each output file spec-
    sorted by (file_path, pos), Spark's native parquet writer emits
    them inside the tasks, and the driver touches only O(output files)
    footers to build descriptors — no position list ever crosses the
    driver. Output granularity is one delete file per non-empty
    shuffle partition (bounded by parallelism, not by data volume);
    the spec allows a delete file to target many data files."""
    import shutil

    import pyarrow.parquet as pq

    out_dir = os.path.join(
        self.location, f"staging-deletes-{uuid.uuid4().hex}"
    )
    (
        hits.select(
            F.col("__file").alias("file_path"),
            F.col("__pos").cast("long").alias("pos"),
        )
        .repartition("file_path")
        .sortWithinPartitions("file_path", "pos")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    descs: list[dict] = []
    try:
        for fn in sorted(os.listdir(out_dir)):
            if not fn.endswith(".parquet"):
                continue
            src = os.path.join(out_dir, fn)
            n = pq.ParquetFile(src).metadata.num_rows
            if n == 0:
                continue
            dst = os.path.join(
                self.data_dir, f"{uuid.uuid4().hex}-deletes.parquet"
            )
            os.replace(src, dst)
            descs.append(
                {
                    "content": CONTENT_POS_DELETES,
                    "file_path": dst,
                    "file_format": "PARQUET",
                    "record_count": n,
                    "file_size_in_bytes": os.path.getsize(dst),
                }
            )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    return descs


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
    all_deletes, pos_deletes, eq_deletes = _split_delete_entries(self)
    # one multi-path scan with row positions, existing deletes applied;
    # the CURRENT table schema is explicit so pre-evolution files align
    from .iceberg_layout import _spark_schema_from_md

    scan = _scan_with_pos_ice(
        self,
        data_entries,
        pos_deletes,
        _spark_schema_from_md(md),
        eq_entries=eq_deletes,
    )
    if scan is None:
        return {"files_named": 0, "rows_deleted": 0, "snapshot_id": None}
    # the delete parquets are written EXECUTOR-side; the driver only
    # reads their footers and the tiny files themselves for the report
    new_deletes = _write_pos_delete_files_distributed(
        self, scan.filter(cond).select("__file", "__pos")
    )
    if not new_deletes:
        return {"files_named": 0, "rows_deleted": 0, "snapshot_id": None}
    # the report's distinct-data-file count: below the broadcast-grade
    # pair threshold the driver derives it from the delete files
    # directly via pyarrow (they carry only (file_path, pos) and the
    # descriptors hold record_count, so the bound is known up front) —
    # a whole Spark job (scan + distinct shuffle + count) for one
    # report integer was pure overhead at bench scale (r12); a
    # billion-row delete keeps the distributed count
    total_pairs = sum(d["record_count"] for d in new_deletes)
    if total_pairs <= POS_DELETE_BROADCAST_MAX_PAIRS:
        import pyarrow.parquet as _pq

        named: set = set()
        for d in new_deletes:
            named.update(
                _pq.read_table(d["file_path"], columns=["file_path"])
                .column("file_path")
                .unique()
                .to_pylist()
            )
        files_named = len(named)
    else:
        files_named = (
            self.spark.read.parquet(
                *[d["file_path"] for d in new_deletes]
            )
            .select("file_path")
            .distinct()
            .count()
        )
    snapshot_id = _commit_mor_snapshot(
        self, md, data_entries, all_deletes, new_deletes, [], "delete"
    )
    return {
        "files_named": files_named,
        "rows_deleted": sum(d["record_count"] for d in new_deletes),
        "snapshot_id": snapshot_id,
    }


def _write_eq_delete_files(
    self: IcebergTable, keys: DataFrame, cols: list[str], md: dict
) -> list[dict]:
    """Write the distinct key set as content=2 equality-delete parquet
    files (native writer, executor-side) and return their manifest
    descriptors carrying the spec ``equality_ids``."""
    import shutil

    import pyarrow.parquet as pq

    field_ids = {f["name"]: f["id"] for f in md["schema"]["fields"]}
    eq_ids = [field_ids[c] for c in cols]
    out_dir = os.path.join(
        self.location, f"staging-eqdeletes-{uuid.uuid4().hex}"
    )
    keys.select(*cols).dropDuplicates().write.mode(
        "overwrite"
    ).parquet(out_dir)
    descs: list[dict] = []
    try:
        for fn in sorted(os.listdir(out_dir)):
            if not fn.endswith(".parquet"):
                continue
            src = os.path.join(out_dir, fn)
            n = pq.ParquetFile(src).metadata.num_rows
            if n == 0:
                continue
            dst = os.path.join(
                self.data_dir, f"{uuid.uuid4().hex}-eq-deletes.parquet"
            )
            os.replace(src, dst)
            descs.append(
                {
                    "content": CONTENT_EQ_DELETES,
                    "file_path": dst,
                    "file_format": "PARQUET",
                    "record_count": n,
                    "file_size_in_bytes": os.path.getsize(dst),
                    "equality_ids": eq_ids,
                }
            )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    return descs


def _equality_delete(self: IcebergTable, keys: DataFrame) -> dict:
    """DELETE BY KEY — Iceberg v2 EQUALITY delete files (spec:
    content=2, keyed by ``equality_ids`` schema field ids). Every
    current-or-older row whose key columns null-safely equal a key row
    is masked; rows added by LATER snapshots are NOT (sequence-number
    applicability, spec: an equality delete applies only to data files
    with a strictly smaller data sequence number) — the streaming-
    upsert delete primitive real writers emit. The key set is written
    executor-side by the native parquet writer; compaction
    (rewrite_data_files) materializes and drops it like any delete."""
    md = self._metadata()
    from .iceberg_layout import _spark_schema_from_md

    schema = _spark_schema_from_md(md)
    names = [f.name for f in schema.fields]
    cols = list(keys.columns)
    bad = sorted(set(cols) - set(names))
    if bad:
        raise ValueError(
            f"equality-delete columns not in table schema: {bad}"
        )
    descs = _write_eq_delete_files(self, keys, cols, md)
    if not descs:
        return {"keys": 0, "snapshot_id": None}
    data_entries = [
        e for e in self._entries() if e["status"] != STATUS_DELETED
    ]
    all_deletes, _, _ = _split_delete_entries(self)
    snapshot_id = _commit_mor_snapshot(
        self, md, data_entries, all_deletes, descs, [], "delete"
    )
    return {
        "keys": sum(d["record_count"] for d in descs),
        "snapshot_id": snapshot_id,
    }


def _set_sort_order(self: IcebergTable, sort_by: list[str]) -> int:
    """Declare the table's SORT ORDER (spec ``sort-orders`` /
    ``default-sort-order-id``) — metadata-only; writers that honor it
    (``rewrite_data_files`` here) lay rows out so the manifest column
    bounds become tight and disjoint, which is what makes min/max
    skipping effective on a non-partition column."""
    md = self._metadata()
    by_name = {f["name"]: f for f in md["schema"]["fields"]}
    bad = [c for c in sort_by if c not in by_name]
    if bad:
        raise ValueError(f"sort columns not in schema: {bad}")
    order_id = len(md.get("sort-orders", [])) + 1
    md.setdefault("sort-orders", []).append(
        {
            "order-id": order_id,
            "fields": [
                {
                    "transform": "identity",
                    "source-id": by_name[c]["id"],
                    "direction": "asc",
                    "null-order": "nulls-first",
                }
                for c in sort_by
            ],
        }
    )
    md["default-sort-order-id"] = order_id
    return _advance_metadata(self, md)


def _default_sort_cols(self: IcebergTable, md: dict) -> list[str]:
    oid = md.get("default-sort-order-id")
    if not oid:
        return []
    by_id = {f["id"]: f["name"] for f in md["schema"]["fields"]}
    for o in md.get("sort-orders", []):
        if o["order-id"] == oid:
            return [
                by_id[f["source-id"]]
                for f in o["fields"]
                if f.get("source-id") in by_id
            ]
    return []


def _rewrite_data_files(
    self: IcebergTable,
    target_files: int | None = None,
    sort_by: list[str] | None = None,
    where: str | None = None,
    min_file_size_bytes: int | None = None,
    min_input_files: int = 2,
):
    """Compaction: rewrite the CURRENT logical state as fresh data
    files in one overwrite snapshot — position deletes are materialized
    (the new snapshot's manifests list neither the old data files nor
    any delete manifest), Iceberg's rewriteDataFiles maintenance. Old
    snapshots stay time-travelable until expire_snapshots.

    ``sort_by`` (or the table's declared default sort order) makes
    this a SORT rewrite: rows range-partition across the new files and
    sort within each, so every file's manifest bounds are tight and
    disjoint — binpack-vs-sort, Iceberg's two rewrite strategies.

    ``where`` / ``min_file_size_bytes`` (r12) switch to the PARTIAL
    binpack path — ``_rewrite_data_files_partial`` — which rewrites
    only the selected file groups and carries everything else at
    metadata cost: at 100 TB you compact the small-file debt of the
    partitions that accumulated it, never the whole table."""
    if where is not None or min_file_size_bytes is not None:
        return _rewrite_data_files_partial(
            self,
            where=where,
            min_file_size_bytes=min_file_size_bytes,
            min_input_files=min_input_files,
            target_files=target_files,
            sort_by=sort_by,
        )
    md = self._metadata()
    part_cols = [
        f["name"]
        for f in md["partition-specs"][md.get("default-spec-id", 0)][
            "fields"
        ]
    ]
    sort_cols = list(sort_by or _default_sort_cols(self, md))
    df = self.read()
    if sort_cols:
        n = target_files or self.spark.sparkContext.defaultParallelism
        df = df.repartitionByRange(n, *sort_cols)
    elif target_files:
        df = df.repartition(target_files)
    # stamp the snapshot as maintenance: the rewrite changes no
    # logical row, so changelog scans (iceberg_changelog.py) skip it
    self._summary_extra = {"maintenance": "rewrite-data-files"}
    self._write_sort = sort_cols or None
    # the rewrite chose its own distribution (range partitioning for
    # SORT, explicit target_files for binpack): _write_data must not
    # re-shard it on the partition columns
    self._write_presharded = bool(sort_cols or target_files)
    try:
        return self.overwrite(df, partition_by=part_cols or None)
    finally:
        self._summary_extra = None
        self._write_sort = None
        self._write_presharded = False


def _rewrite_data_files_partial(
    self: IcebergTable,
    where: str | None,
    min_file_size_bytes: int | None,
    min_input_files: int,
    target_files: int | None,
    sort_by: list[str] | None = None,
) -> dict:
    """PARTIAL binpack compaction (r12) — Iceberg's actual
    RewriteDataFiles contract at scale: select candidate data files
    (smaller than ``min_file_size_bytes`` and/or in partitions matching
    ``where``), group them by partition tuple, rewrite only groups
    holding at least ``min_input_files`` candidates, and commit a
    replace snapshot that carries everything else at METADATA cost:

    * manifest-list rows whose manifests reference no rewritten file
      carry VERBATIM (the r12 reuse contract — entries keep their
      status and adding snapshot_id, so attribution and eq-delete
      sequence resolution survive);
    * manifests that do reference rewritten files are re-written with
      only their SURVIVING entries (partition summaries recomputed, so
      list-level pruning stays sharp);
    * delete manifests carry verbatim — position-delete pairs naming a
      rewritten (now unreferenced) file dangle harmlessly (the read
      anti-join can never match them; ``rewrite_position_deletes`` is
      the spec's cleanup op), and equality deletes keep masking old
      files by sequence number while the NEW files (sequence = this
      snapshot) are born past them — exactly why the rewrite scan
      applies all deletes before re-landing rows.

    The full-table rewrite re-monolithized sharded metadata and cost
    O(table) IO per call; this path costs O(selected bytes) IO +
    O(touched manifests) metadata, which is what a 100 TB table's
    small-file debt actually needs. ``where`` is evaluated over the
    table's stored partition fields through a real Spark filter
    (engine-exact semantics, driver cost O(distinct partitions)).
    Returns {'rewritten_files', 'added_files', 'groups',
    'rewritten_bytes', 'snapshot_id'} — all zeros / None when nothing
    qualified (no empty snapshot)."""
    from .avro_io import read_ocf_cached
    from .iceberg_layout import (
        _spark_schema_from_md,
        all_spec_part_fields,
        manifest_entry_schema,
        next_sequence_number,
        partition_summaries,
    )

    md = self._metadata()
    head = md.get("current-snapshot-id")
    if head is None:
        raise ValueError("empty table: nothing to rewrite")
    part_fields = all_spec_part_fields(md)
    live = [
        e for e in self._entries() if e["status"] != STATUS_DELETED
    ]

    def pkey(e: dict) -> tuple:
        pv = e["data_file"].get("partition") or {}
        return tuple(pv.get(n) for n, _t in part_fields)

    # ---- candidate selection -------------------------------------
    cands = list(live)
    if min_file_size_bytes is not None:
        cands = [
            e
            for e in cands
            if e["data_file"].get("file_size_in_bytes", 0)
            < min_file_size_bytes
        ]
    if where is not None:
        if not part_fields:
            raise ValueError(
                "rewrite_data_files(where=...) needs a partitioned "
                "table — the predicate scopes compaction to partition "
                "tuples"
            )
        avro2spark = {
            "long": "bigint",
            "int": "int",
            "double": "double",
            "float": "float",
            "string": "string",
            "boolean": "boolean",
        }
        ddl = ", ".join(
            f"`{n}` {avro2spark[t]}" for n, t in part_fields
        )
        tuples = sorted({pkey(e) for e in cands})
        if tuples:
            keep = {
                tuple(r)
                for r in self.spark.createDataFrame(tuples, ddl)
                .filter(where)
                .collect()
            }
            cands = [e for e in cands if pkey(e) in keep]
        else:
            cands = []
    groups: dict[tuple, list[dict]] = {}
    for e in cands:
        groups.setdefault(pkey(e), []).append(e)
    groups = {
        k: v for k, v in groups.items() if len(v) >= min_input_files
    }
    rewritten = {
        e["data_file"]["file_path"]
        for v in groups.values()
        for e in v
    }
    if not rewritten:
        return {
            "rewritten_files": 0,
            "added_files": 0,
            "groups": 0,
            "rewritten_bytes": 0,
            "snapshot_id": None,
        }

    # ---- rewrite the selected rows, all deletes applied ----------
    _all, pos_dels, eq_dels = _split_delete_entries(self)
    selected = [
        e for e in live if e["data_file"]["file_path"] in rewritten
    ]
    scan = _scan_with_pos_ice(
        self,
        selected,
        pos_dels,
        _spark_schema_from_md(md),
        eq_entries=eq_dels,
    )
    df = scan.drop("__file", "__pos")
    part_cols = [
        f["name"]
        for f in md["partition-specs"][md.get("default-spec-id", 0)][
            "fields"
        ]
    ]
    sel_bytes = sum(
        e["data_file"].get("file_size_in_bytes", 0) for e in selected
    )
    # binpack: the POINT is fewer, bigger files — default the output
    # task count to the selected bytes over a 128 MiB target (clustered
    # by partition columns so each partition's debt lands contiguous),
    # so re-running with the same threshold is a no-op, not a treadmill
    n_out = target_files or max(
        1, -(-sel_bytes // (128 * 1024 * 1024))
    )
    sort_cols = list(sort_by or _default_sort_cols(self, md))
    if sort_cols:
        # SORT strategy inside the selected groups: range-partition +
        # in-file sort so the rewritten files carry tight, disjoint
        # bounds (the same binpack-vs-sort choice the full rewrite
        # offers); _write_data's task sort keeps the order through
        # the partitioned writer
        df = df.repartitionByRange(n_out, *sort_cols)
        self._write_sort = sort_cols
    else:
        df = (
            df.repartition(n_out, *part_cols)
            if part_cols
            else df.repartition(n_out)
        )
    # distribution chosen here — _write_data must not re-shard it
    self._write_presharded = True
    try:
        new_files = self._write_data(df, part_cols)
    finally:
        self._write_sort = None
        self._write_presharded = False

    # ---- commit: carry / rewrite / add manifests ------------------
    snapshot_id = int(uuid.uuid4().int % (1 << 62))
    now = int(time.time() * 1000)
    snap = next(
        s for s in md["snapshots"] if s["snapshot-id"] == head
    )
    _, prior_rows = read_ocf_cached(snap["manifest-list"])
    mrows: list[dict] = []
    touched = 0
    for i, m in enumerate(prior_rows):
        row = {
            "manifest_path": m["manifest_path"],
            "manifest_length": m["manifest_length"],
            "partition_spec_id": m.get("partition_spec_id", 0),
            "added_snapshot_id": m["added_snapshot_id"],
            "added_data_files_count": m.get(
                "added_data_files_count", 0
            ),
            "existing_data_files_count": m.get(
                "existing_data_files_count", 0
            ),
            "deleted_data_files_count": m.get(
                "deleted_data_files_count", 0
            ),
            "content": m.get("content", CONTENT_DATA),
            "partitions": m.get("partitions"),
        }
        if m.get("content", CONTENT_DATA) != CONTENT_DATA:
            mrows.append(row)  # delete manifests carry verbatim
            continue
        _, es = read_ocf_cached(m["manifest_path"])
        surviving = [
            e
            for e in es
            if e["data_file"]["file_path"] not in rewritten
        ]
        if len(surviving) == len(es):
            mrows.append(row)  # untouched: carry verbatim
            continue
        touched += 1
        if not surviving:
            continue  # every entry rewritten: the row simply drops
        mp = os.path.join(
            self.meta_dir, f"snap-{snapshot_id}-m{i}.avro"
        )
        write_ocf(mp, manifest_entry_schema(part_fields), surviving)
        mrows.append(
            {
                "manifest_path": mp,
                "manifest_length": os.path.getsize(mp),
                "partition_spec_id": m.get("partition_spec_id", 0),
                "added_snapshot_id": snapshot_id,
                "added_data_files_count": 0,
                "existing_data_files_count": len(surviving),
                "deleted_data_files_count": len(es) - len(surviving),
                "content": CONTENT_DATA,
                "partitions": partition_summaries(
                    surviving, part_fields
                ),
            }
        )
    new_entries = [
        {
            "status": STATUS_ADDED,
            "snapshot_id": snapshot_id,
            "data_file": f,
        }
        for f in new_files
    ]
    amp = os.path.join(
        self.meta_dir, f"snap-{snapshot_id}-added.avro"
    )
    write_ocf(amp, manifest_entry_schema(part_fields), new_entries)
    mrows.append(
        {
            "manifest_path": amp,
            "manifest_length": os.path.getsize(amp),
            "partition_spec_id": md.get("default-spec-id", 0),
            "added_snapshot_id": snapshot_id,
            "added_data_files_count": len(new_files),
            "existing_data_files_count": 0,
            "deleted_data_files_count": 0,
            "content": CONTENT_DATA,
            "partitions": partition_summaries(
                new_entries, part_fields
            ),
        }
    )
    mlist_path = os.path.join(
        self.meta_dir, f"snap-{snapshot_id}.avro"
    )
    write_ocf(mlist_path, MANIFEST_FILE_SCHEMA, mrows)
    seq = next_sequence_number(md)
    new_snap = {
        "snapshot-id": snapshot_id,
        "timestamp-ms": now,
        "manifest-list": mlist_path,
        "summary": {
            "operation": "replace",
            "maintenance": "rewrite-data-files",
            "rewritten-data-files": str(len(rewritten)),
            "added-data-files": str(len(new_files)),
        },
        "sequence-number": seq,
        "schema-id": md.get(
            "current-schema-id", md["schema"].get("schema-id", 0)
        ),
        "parent-snapshot-id": head,
    }
    md["last-sequence-number"] = seq
    md["snapshots"] = md["snapshots"] + [new_snap]
    md["snapshot-log"] = md.get("snapshot-log", []) + [
        {"timestamp-ms": now, "snapshot-id": snapshot_id}
    ]
    md["current-snapshot-id"] = snapshot_id
    _advance_metadata(self, md)
    return {
        "rewritten_files": len(rewritten),
        "added_files": len(new_files),
        "groups": len(groups),
        "rewritten_bytes": sum(
            e["data_file"].get("file_size_in_bytes", 0)
            for e in selected
        ),
        "snapshot_id": snapshot_id,
    }


def _rewrite_position_deletes(self: IcebergTable) -> dict:
    """Iceberg's ``rewrite_position_deletes`` maintenance: compact the
    live position-delete files — DANGLING pairs (naming data files no
    snapshot-live entry references, the debris partial compaction
    leaves behind) drop, the surviving pairs re-land spec-sorted in
    fewer files, and equality-delete files that can no longer mask
    anything (no live data file has a STRICTLY smaller sequence
    number) drop whole. Metadata tail: every DATA manifest-list row
    carries verbatim; ONE new delete manifest replaces the old chain
    (surviving eq entries keep their adding snapshot_id, so sequence
    resolution is untouched). The snapshot is maintenance-stamped —
    no logical row changes, changelogs skip it.

    Scale: one scan of the pair files + one broadcast semi-join
    against the live basename set + the executor-side sorted rewrite —
    cost tracks DELETE metadata size, never table data."""
    md = self._metadata()
    head = md.get("current-snapshot-id")
    if head is None:
        raise ValueError("empty table: nothing to rewrite")
    from .avro_io import read_ocf_cached
    from .iceberg_layout import (
        next_sequence_number,
        seq_of_snapshot,
    )

    live = [
        e for e in self._entries() if e["status"] != STATUS_DELETED
    ]
    live_bases = sorted(
        os.path.basename(e["data_file"]["file_path"]) for e in live
    )
    min_live_seq = min(
        (seq_of_snapshot(md, e["snapshot_id"]) for e in live),
        default=0,
    )
    _all, pos_entries, eq_entries = _split_delete_entries(self)
    pairs_before = sum(
        e["data_file"].get("record_count", 0) for e in pos_entries
    )
    files_before = len(pos_entries) + len(eq_entries)
    eq_kept = [
        e
        for e in eq_entries
        if min_live_seq < seq_of_snapshot(md, e["snapshot_id"])
    ]
    new_pos: list[dict] = []
    if pos_entries:
        pairs = self.spark.read.parquet(
            *[e["data_file"]["file_path"] for e in pos_entries]
        ).select(
            F.col("file_path").alias("__file"),
            F.col("pos").cast("long").alias("__pos"),
        )
        base_df = F.broadcast(
            self.spark.createDataFrame(
                [(b,) for b in live_bases], "__base string"
            )
        )
        surviving = pairs.join(
            base_df,
            F.element_at(F.split(F.col("__file"), "/"), -1)
            == F.col("__base"),
            "left_semi",
        )
        new_pos = _write_pos_delete_files_distributed(self, surviving)
    if not pos_entries and not eq_entries:
        return {
            "pairs_before": 0,
            "pairs_after": 0,
            "delete_files_before": 0,
            "delete_files_after": 0,
            "eq_dropped": 0,
            "snapshot_id": None,
        }
    snapshot_id = int(uuid.uuid4().int % (1 << 62))
    now = int(time.time() * 1000)
    snap = next(
        s for s in md["snapshots"] if s["snapshot-id"] == head
    )
    _, prior_rows = read_ocf_cached(snap["manifest-list"])
    mrows = [
        {
            "manifest_path": m["manifest_path"],
            "manifest_length": m["manifest_length"],
            "partition_spec_id": m.get("partition_spec_id", 0),
            "added_snapshot_id": m["added_snapshot_id"],
            "added_data_files_count": m.get(
                "added_data_files_count", 0
            ),
            "existing_data_files_count": m.get(
                "existing_data_files_count", 0
            ),
            "deleted_data_files_count": m.get(
                "deleted_data_files_count", 0
            ),
            "content": m.get("content", CONTENT_DATA),
            "partitions": m.get("partitions"),
        }
        for m in prior_rows
        if m.get("content", CONTENT_DATA) == CONTENT_DATA
    ]
    del_entries = [
        {
            "status": STATUS_ADDED,
            "snapshot_id": snapshot_id,
            "data_file": d,
        }
        for d in new_pos
    ] + [
        # surviving eq files keep their ORIGINAL adding snapshot id —
        # that id IS their data sequence number for applicability
        {
            "status": e["status"],
            "snapshot_id": e["snapshot_id"],
            "data_file": e["data_file"],
        }
        for e in eq_kept
    ]
    if del_entries:
        dpath = os.path.join(
            self.meta_dir, f"snap-{snapshot_id}-deletes.avro"
        )
        write_ocf(dpath, DELETE_MANIFEST_ENTRY_SCHEMA, del_entries)
        mrows.append(
            {
                "manifest_path": dpath,
                "manifest_length": os.path.getsize(dpath),
                "partition_spec_id": 0,
                "added_snapshot_id": snapshot_id,
                "added_data_files_count": len(del_entries),
                "existing_data_files_count": 0,
                "deleted_data_files_count": 0,
                "content": CONTENT_POS_DELETES,
            }
        )
    mlist_path = os.path.join(
        self.meta_dir, f"snap-{snapshot_id}.avro"
    )
    write_ocf(mlist_path, MANIFEST_FILE_SCHEMA, mrows)
    seq = next_sequence_number(md)
    new_snap = {
        "snapshot-id": snapshot_id,
        "timestamp-ms": now,
        "manifest-list": mlist_path,
        "summary": {
            "operation": "replace",
            "maintenance": "rewrite-position-deletes",
        },
        "sequence-number": seq,
        "schema-id": md.get(
            "current-schema-id", md["schema"].get("schema-id", 0)
        ),
        "parent-snapshot-id": head,
    }
    md["last-sequence-number"] = seq
    md["snapshots"] = md["snapshots"] + [new_snap]
    md["snapshot-log"] = md.get("snapshot-log", []) + [
        {"timestamp-ms": now, "snapshot-id": snapshot_id}
    ]
    md["current-snapshot-id"] = snapshot_id
    _advance_metadata(self, md)
    return {
        "pairs_before": pairs_before,
        "pairs_after": sum(d["record_count"] for d in new_pos),
        "delete_files_before": files_before,
        "delete_files_after": len(del_entries),
        "eq_dropped": len(eq_entries) - len(eq_kept),
        "snapshot_id": snapshot_id,
    }


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


def _next_schema(md: dict, new_fields: list[dict]) -> dict:
    """A fresh schema version appended to the metadata's ``schemas``
    list (schema-id bumps; field ids are never reused)."""
    new = {
        "type": "struct",
        "schema-id": md.get(
            "current-schema-id", md["schema"].get("schema-id", 0)
        )
        + 1,
        "fields": new_fields,
    }
    if "schemas" not in md:
        md["schemas"] = [md["schema"]]
    md["schema"] = new
    md["schemas"] = md["schemas"] + [new]
    md["current-schema-id"] = new["schema-id"]
    return new


def _ice_rename_column(
    self: IcebergTable, old: str, new: str
) -> int:
    """ALTER TABLE ... RENAME COLUMN — Iceberg's native field-id
    evolution: a new schema version where the field keeps its ID under
    the new name, committed metadata-only (no snapshot, no file
    touched). Reads resolve old files BY FIELD ID, so every
    pre-rename file keeps serving (iceberg_layout._aligned_scan)."""
    md = self._metadata()
    names = [f["name"] for f in md["schema"]["fields"]]
    if old not in names:
        raise ValueError(f"no such column {old!r} (have {names})")
    if new in names:
        raise ValueError(f"column {new!r} already exists")
    fields = [
        ({**f, "name": new} if f["name"] == old else dict(f))
        for f in md["schema"]["fields"]
    ]
    _next_schema(md, fields)
    # identity partition specs name their source column: follow it
    for spec in md.get("partition-specs", []):
        for pf in spec.get("fields", []):
            if pf["name"] == old:
                pf["name"] = new
    if md.get("partition-spec"):
        for pf in md["partition-spec"]:
            if pf.get("name") == old:
                pf["name"] = new
    return _advance_metadata(self, md)


def _ice_drop_column(self: IcebergTable, col: str) -> int:
    """ALTER TABLE ... DROP COLUMN — metadata-only: the field leaves
    the current schema (its id is never reused); the bytes stay in the
    data files, unread. Old snapshots still time-travel with their own
    schema."""
    md = self._metadata()
    names = [f["name"] for f in md["schema"]["fields"]]
    if col not in names:
        raise ValueError(f"no such column {col!r} (have {names})")
    part_names = {
        pf["name"]
        for spec in md.get("partition-specs", [])
        for pf in spec.get("fields", [])
    }
    if col in part_names:
        raise ValueError(f"cannot drop partition column {col!r}")
    if len(names) == 1:
        raise ValueError("cannot drop the only column")
    fields = [
        dict(f) for f in md["schema"]["fields"] if f["name"] != col
    ]
    _next_schema(md, fields)
    return _advance_metadata(self, md)


def _evolve_partition_spec(
    self: IcebergTable, partition_by: list[str] | None
) -> int:
    """Partition-spec EVOLUTION: append a new spec version and make it
    the default — metadata-only, no file touched. Elements may be
    identity columns OR transform specs (``day(ts)``,
    ``bucket(8, id)`` — r10, via iceberg_transforms). Files already
    written keep their old layout and partition values (manifests
    carry the union of all specs' fields); only NEW writes use the new
    spec. ``read_where`` predicates should ``.get`` keys, since
    old-spec entries lack the new fields — exactly Iceberg's contract
    for evolved specs; ``read_hidden`` prunes source predicates
    against every era's fields."""
    md = self._metadata()
    names = {f["name"]: f for f in md["schema"]["fields"]}
    from .iceberg_layout import _ICE2SPARK, _PART_AVRO
    from .iceberg_transforms import parse_partition_spec

    fields = [parse_partition_spec(c) for c in (partition_by or [])]
    for fld in fields:
        src = fld["source"]
        if src not in names:
            raise ValueError(f"partition column {src!r} not in schema")
        if (
            fld["transform"] == "identity"
            and _ICE2SPARK[names[src]["type"]] not in _PART_AVRO
        ):
            raise ValueError(
                f"partition column {src!r}: type {names[src]['type']} "
                "not supported for identity partitioning"
            )
    new_id = len(md.get("partition-specs", []))
    md.setdefault("partition-specs", []).append(
        {
            "spec-id": new_id,
            "fields": [
                {
                    "name": fld["name"],
                    "transform": fld["transform"],
                    "source-id": names[fld["source"]]["id"],
                    "field-id": 1000 + new_id * 100 + i,
                }
                for i, fld in enumerate(fields)
            ],
        }
    )
    md["default-spec-id"] = new_id
    return _advance_metadata(self, md)


IcebergTable.evolve_partition_spec = _evolve_partition_spec
IcebergTable.rename_column = _ice_rename_column
IcebergTable.drop_column = _ice_drop_column


IcebergTable.delete = _delete
IcebergTable.equality_delete = _equality_delete
def _remove_orphan_files(
    self: IcebergTable,
    older_than_seconds: float = 86_400.0,
    dry_run: bool = False,
) -> list[str]:
    """Iceberg's remove_orphan_files maintenance: delete files under
    ``data/`` that NO snapshot references (failed/retried write
    leftovers — commits are mv-in + metadata swap, so a crash between
    the two strands a file). Age-gated like the real procedure, so a
    concurrent writer's staged-but-uncommitted files are never
    touched. Referenced-set construction walks every snapshot's
    manifests (data + delete files) — metadata-sized."""
    import time as _time

    md = self._metadata()
    referenced: set[str] = set()
    for s in md["snapshots"]:
        _, manifests = read_ocf(s["manifest-list"])
        for m in manifests:
            _, es = read_ocf(m["manifest_path"])
            referenced.update(
                os.path.abspath(e["data_file"]["file_path"]) for e in es
            )
    cutoff = _time.time() - older_than_seconds
    doomed = []
    for fname in sorted(os.listdir(self.data_dir)):
        full = os.path.abspath(os.path.join(self.data_dir, fname))
        if full in referenced:
            continue
        if os.path.getmtime(full) > cutoff:
            continue
        doomed.append(full)
        if not dry_run:
            os.remove(full)
    return doomed


IcebergTable.rewrite_data_files = _rewrite_data_files
IcebergTable.rewrite_position_deletes = _rewrite_position_deletes
IcebergTable.set_sort_order = _set_sort_order
IcebergTable.remove_orphan_files = _remove_orphan_files
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




def _upsert_by_key_ice(
    self: IcebergTable, batch: DataFrame, key_cols: list[str]
) -> dict:
    """UPSERT in ONE snapshot — the equality-delete pattern streaming
    CDC writers (Flink, real Iceberg sinks) emit: the batch's key set
    lands as a content=2 equality-delete file AND the batch's rows
    land as data files, in the SAME snapshot. Sequence-number
    applicability makes this exact with zero joins: the delete (seq N)
    masks only files with seq < N, so every pre-existing version of a
    batch key disappears while the batch's own rows (also seq N)
    survive. No pre-existing file is read OR rewritten — write cost is
    O(batch), the merge is deferred to read/compaction, exactly the
    MoR streaming-upsert trade."""
    md = self._metadata()
    from .iceberg_layout import _spark_schema_from_md

    schema = _spark_schema_from_md(md)
    names = [f.name for f in schema.fields]
    if list(batch.columns) != names:
        raise ValueError(
            f"upsert batch columns {list(batch.columns)} must match "
            f"the table schema {names}"
        )
    bad = sorted(set(key_cols) - set(names))
    if bad:
        raise ValueError(f"key columns not in table schema: {bad}")
    eq_descs = _write_eq_delete_files(
        self, batch.select(*key_cols), key_cols, md
    )
    part_cols = [
        f["name"]
        for f in md["partition-specs"][md.get("default-spec-id", 0)][
            "fields"
        ]
    ]
    new_files = self._write_data(batch, part_cols)
    data_entries = [
        e for e in self._entries() if e["status"] != STATUS_DELETED
    ]
    all_deletes, _, _ = _split_delete_entries(self)
    snapshot_id = _commit_mor_snapshot(
        self, md, data_entries, all_deletes, eq_descs, new_files,
        "overwrite",
    )
    return {
        "keys": sum(d["record_count"] for d in eq_descs),
        "snapshot_id": snapshot_id,
    }


def _upsert_idempotent_ice(
    self: IcebergTable, batch, key_cols, app_id: str, epoch: int
) -> bool:
    """Exactly-once keyed upsert: same (app-id, epoch) summary
    bookkeeping as append_idempotent, same one-snapshot equality-
    delete upsert. Returns True if the commit happened."""
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
        self.upsert_by_key(batch, key_cols)
    finally:
        self._summary_extra = None
    return True


def stream_to_iceberg_upsert(
    stream_df,
    location: str,
    checkpoint_dir: str,
    key_cols: list[str],
    app_id: str = "iceberg-upsert-sink",
):
    """Exactly-once foreachBatch streaming UPSERT sink into the
    Iceberg layout: each micro-batch commits ONE snapshot holding its
    equality-delete key file + data files; a redelivered batch after
    restart is skipped by the summary check. The CDC-ingestion shape
    real Iceberg streaming writers use."""
    from pyspark.sql import SparkSession

    def write_batch(batch_df, batch_id: int) -> None:
        spark = SparkSession.getActiveSession()
        t = IcebergTable(spark, location)
        t.upsert_idempotent(batch_df, key_cols, app_id, int(batch_id))

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
    )


IcebergTable.upsert_by_key = _upsert_by_key_ice
IcebergTable.upsert_idempotent = _upsert_idempotent_ice


IcebergTable.append_idempotent = _append_idempotent


def _commit_mor_snapshot(
    self: IcebergTable,
    md: dict,
    data_entries: list[dict],
    prior_deletes: list[dict],
    new_delete: dict | list[dict] | None,
    new_data_files: list[dict],
    operation: str,
) -> int:
    """Shared commit tail for merge-on-read DML snapshots,
    format-version 2. r12: MANIFEST REUSE — MoR DML removes no data
    file (old rows mask through delete files), so the parent
    snapshot's manifest-list rows carry VERBATIM (data and delete
    manifests alike; ``data_entries`` / ``prior_deletes`` are the
    parent's own live sets at every call site) and the commit writes
    at most TWO new manifests: one for files this DML added, one for
    the delete file(s) it wrote. DML metadata cost drops from
    O(table) entry re-encode to O(this commit)."""
    if new_delete is None:
        new_delete_list: list[dict] = []
    elif isinstance(new_delete, dict):
        new_delete_list = [new_delete]
    else:
        new_delete_list = list(new_delete)
    snapshot_id = int(uuid.uuid4().int % (1 << 62))
    now = int(time.time() * 1000)
    part_fields = _part_fields_from_md(md)
    from .iceberg_layout import partition_summaries
    from .avro_io import read_ocf_cached

    mrows: list[dict] = []
    head = md.get("current-snapshot-id")
    parent_snap = next(
        (s for s in md["snapshots"] if s["snapshot-id"] == head),
        None,
    )
    if parent_snap is not None:
        _, prior_rows = read_ocf_cached(parent_snap["manifest-list"])
        mrows.extend(
            {
                "manifest_path": m["manifest_path"],
                "manifest_length": m["manifest_length"],
                "partition_spec_id": m.get("partition_spec_id", 0),
                "added_snapshot_id": m["added_snapshot_id"],
                "added_data_files_count": m.get(
                    "added_data_files_count", 0
                ),
                "existing_data_files_count": m.get(
                    "existing_data_files_count", 0
                ),
                "deleted_data_files_count": m.get(
                    "deleted_data_files_count", 0
                ),
                "content": m.get("content", CONTENT_DATA),
                "partitions": m.get("partitions"),
            }
            for m in prior_rows
        )
    if new_data_files:
        new_entries = [
            {
                "status": STATUS_ADDED,
                "snapshot_id": snapshot_id,
                "data_file": f,
            }
            for f in new_data_files
        ]
        dm_path = os.path.join(
            self.meta_dir, f"snap-{snapshot_id}-m0.avro"
        )
        write_ocf(
            dm_path, manifest_entry_schema(part_fields), new_entries
        )
        mrows.append(
            {
                "manifest_path": dm_path,
                "manifest_length": os.path.getsize(dm_path),
                "partition_spec_id": md.get("default-spec-id", 0),
                "added_snapshot_id": snapshot_id,
                "added_data_files_count": len(new_data_files),
                "existing_data_files_count": 0,
                "deleted_data_files_count": 0,
                "content": CONTENT_DATA,
                "partitions": partition_summaries(
                    new_entries, part_fields
                ),
            }
        )
    if new_delete_list:
        del_entries = [
            {
                "status": STATUS_ADDED,
                "snapshot_id": snapshot_id,
                "data_file": d,
            }
            for d in new_delete_list
        ]
        del_path = os.path.join(
            self.meta_dir, f"snap-{snapshot_id}-m1-deletes.avro"
        )
        write_ocf(del_path, DELETE_MANIFEST_ENTRY_SCHEMA, del_entries)
        mrows.append(
            {
                "manifest_path": del_path,
                "manifest_length": os.path.getsize(del_path),
                "partition_spec_id": 0,
                "added_snapshot_id": snapshot_id,
                "added_data_files_count": len(new_delete_list),
                "existing_data_files_count": 0,
                "deleted_data_files_count": 0,
                "content": CONTENT_POS_DELETES,
            }
        )
    mlist_path = os.path.join(self.meta_dir, f"snap-{snapshot_id}.avro")
    write_ocf(mlist_path, MANIFEST_FILE_SCHEMA, mrows)
    from .iceberg_layout import next_sequence_number

    seq = next_sequence_number(md)
    summary = {"operation": operation}
    summary.update(getattr(self, "_summary_extra", None) or {})
    md["format-version"] = 2
    md["last-sequence-number"] = seq
    new_snap = {
        "snapshot-id": snapshot_id,
        "timestamp-ms": now,
        "manifest-list": mlist_path,
        "summary": summary,
        "sequence-number": seq,
        "schema-id": md.get(
            "current-schema-id", md["schema"].get("schema-id", 0)
        ),
    }
    # spec: snapshots record their parent — the ancestry refs
    # fast-forward and the changelog's lineage walk depend on
    if md.get("current-snapshot-id") is not None:
        new_snap["parent-snapshot-id"] = md["current-snapshot-id"]
    md["snapshots"] = md["snapshots"] + [new_snap]
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
    prior_deletes, pos_deletes, eq_deletes = _split_delete_entries(self)
    scan = _scan_with_pos_ice(
        self, data_entries, pos_deletes, schema, eq_entries=eq_deletes
    )
    if scan is None:
        return {"rows_updated": 0, "snapshot_id": None}
    hit = scan.filter(F.coalesce(cond, F.lit(False)))
    # delete-side parquets are written executor-side; the driver sees
    # only their descriptors
    new_delete = _write_pos_delete_files_distributed(
        self, hit.select("__file", "__pos")
    )
    if not new_delete:
        return {"rows_updated": 0, "snapshot_id": None}
    n_updated = sum(d["record_count"] for d in new_delete)
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
    return {"rows_updated": n_updated, "snapshot_id": snapshot_id}


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
    prior_deletes, pos_deletes, eq_deletes = _split_delete_entries(self)
    scan = _scan_with_pos_ice(
        self, data_entries, pos_deletes, schema, eq_entries=eq_deletes
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
        # matched positions become delete parquets written executor-
        # side; the driver holds one descriptor per output file
        new_deletes = _write_pos_delete_files_distributed(
            self, matched_rows.select("t.__file", "t.__pos")
        )
        if new_deletes:
            new_delete = new_deletes
            n_matched = sum(d["record_count"] for d in new_deletes)
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
                report["rows_updated"] = n_matched - deleted_n
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
