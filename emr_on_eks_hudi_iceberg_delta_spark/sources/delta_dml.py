"""DML on the Delta-protocol table: DELETE and UPDATE.

Reference parity: the reference runs its Delta job on a runtime where
``DELETE FROM`` / ``UPDATE`` / deletion vectors are table operations
(delta/delta_scd_script.py writes the managed Delta table those commands
target). The container has no Delta runtime (closed out in round 6), so
this module implements the same semantics directly against the open
log format (delta_log.py):

* ``delete(cond, mode="cow")`` — copy-on-write: ONE predicate scan
  (parquet filter pushdown + per-file stats have already pruned what
  they can) identifies the files with at least one hit via
  ``_metadata.file_path``-equivalent bookkeeping; ONLY those files are
  rewritten without the matching rows; untouched files' add actions
  are not even mentioned in the commit (zero write amplification on
  non-matching files — pinned by test).
* ``delete(cond, mode="dv")`` — merge-on-read: matching row positions
  per file become a real deletion vector (RoaringBitmapArray portable
  bytes in a ``deletion_vector_<uuid>.bin``, dv.py), the file is
  re-added with the descriptor, and the commit upgrades the protocol
  to minReader 3 / minWriter 7 with the ``deletionVectors`` feature
  the first time. No data file is rewritten — the write cost is the
  bitmap, the read cost is one broadcast anti-join (delta_log.py's
  ``_read_adds``). ``optimize()`` materializes DVs later (PURGE).
* ``update(cond, {col: expr})`` — copy-on-write UPDATE: touched files
  are rewritten with every SET expression evaluated against the OLD
  row (single ``select`` — standard SQL UPDATE semantics), rows not
  matching keep their values byte-for-byte.

NULL predicate semantics match SQL DML: a row whose predicate
evaluates to NULL is NOT deleted / NOT updated.

Scale shape: the predicate scan is a normal pushed-down parquet scan;
the rewrite reads only touched files; a DV's driver-side footprint is
the deleted positions of that commit (the same bitmaps every Delta
writer materializes). For deletes hitting most of a table, CoW (or
overwrite) is the right mode — the classic guidance.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StructType

from . import dv as dv_io
from .delta_log import DeltaLogTable


def _schema_parts(meta: dict):
    schema = StructType.fromJson(json.loads(meta["schemaString"]))
    part_cols = meta.get("partitionColumns", [])
    data_fields = [f for f in schema.fields if f.name not in part_cols]
    types = {f.name: f.dataType for f in schema.fields}
    out_cols = [f.name for f in schema.fields]
    return part_cols, data_fields, types, out_cols


def _scan_with_pos(
    dt: DeltaLogTable, adds: list[dict], meta: dict
) -> DataFrame | None:
    """Scan add actions exposing ``__file`` (log-relative path) and
    ``__pos`` (``_metadata.row_index``), with each file's existing
    deletion vector already applied — the shared source for hit
    detection and rewrites.

    Plan shape: ONE multi-path scan per partition tuple (not per
    file — a 10⁵-file table plans O(partitions) scans, same as the
    normal read path). ``__file`` is recovered from
    ``_metadata.file_path`` through a broadcast basename→relative-path
    map (O(files) metadata rows; basenames are fresh per-job UUIDs so
    the join is exact and sidesteps file-URI percent-encoding).
    Existing DV pairs are expanded EXECUTOR-side (dv.dv_pairs_df) and
    anti-joined — broadcast below ``DV_BROADCAST_MAX_PAIRS`` total
    cardinality, shuffled above it."""
    part_cols, data_fields, types, out_cols = _schema_parts(meta)
    if not adds:
        return None
    # column mapping: data files store PHYSICAL names; scan physical,
    # rename to logical (partitionValues are keyed physical too)
    from .delta_colmap import mapping_enabled, physical_names
    from pyspark.sql.types import StructField

    if mapping_enabled(meta):
        phys = physical_names(meta)
    else:
        phys = {c: c for c in out_cols}
    scan_struct = StructType(
        [
            StructField(phys[f.name], f.dataType, True)
            for f in data_fields
        ]
    )
    by_part: dict[tuple, list[dict]] = {}
    for a in adds:
        key = tuple(
            a["partitionValues"].get(phys[c]) for c in part_cols
        )
        by_part.setdefault(key, []).append(a)
    # r13 fast path: when every add lives at the table root (no
    # partition directory in its path), the log-relative path IS the
    # basename — no basename→path map is needed at all. The broadcast
    # join it replaces is small but NOT free: one broadcast build per
    # scan consumer, measured ~0.4 s per DML job at sf0.1 (hit job
    # 0.82 -> 0.41 s). Partitioned tables keep the exact-map join
    # (their rel paths carry hive-escaped dirs the file URI
    # percent-encodes).
    flat_paths = all("/" not in a["path"] for a in adds)
    name_map = None
    if not flat_paths:
        name_map = dt.spark.createDataFrame(
            [(os.path.basename(a["path"]), a["path"]) for a in adds],
            "__name string, __file string",
        )
    pieces = []
    for key, group in sorted(
        by_part.items(),
        key=lambda kv: tuple((x is not None, x or "") for x in kv[0]),
    ):
        df = (
            dt.spark.read.schema(scan_struct)
            .parquet(
                *[os.path.join(dt.location, a["path"]) for a in group]
            )
            .withColumn(
                "__name",
                F.element_at(
                    F.split(F.col("_metadata.file_path"), "/"), -1
                ),
            )
            .withColumn("__pos", F.col("_metadata.row_index"))
        )
        df = df.select(
            *[
                F.col(phys[f.name]).alias(f.name)
                for f in data_fields
            ],
            "__name",
            "__pos",
        )
        for c, val in zip(part_cols, key):
            lit = (F.lit(None) if val is None else F.lit(val)).cast(
                types[c]
            )
            df = df.withColumn(c, lit)
        pieces.append(df.select(*out_cols, "__name", "__pos"))
    u = pieces[0]
    for p in pieces[1:]:
        u = u.unionByName(p)
    if name_map is None:
        u = u.withColumnRenamed("__name", "__file")
    else:
        u = u.join(F.broadcast(name_map), "__name").drop("__name")
    dvd = [a for a in adds if a.get("deletionVector")]
    if dvd:
        total_card = sum(
            a["deletionVector"].get("cardinality", 0) for a in dvd
        )
        will_broadcast = total_card <= DV_BROADCAST_MAX_PAIRS
        pdf = dv_io.dv_pairs_df(
            dt.spark, dt.location, dvd, driver_ok=will_broadcast
        ).selectExpr("__dv_file AS __file", "__dv_pos AS __pos")
        if will_broadcast:
            pdf = F.broadcast(pdf)
        u = u.join(pdf, ["__file", "__pos"], "left_anti")
    return u


#: above this many total deleted positions the DV anti-join switches
#: from broadcast to shuffle — a heavily-deleted table's pair set must
#: not be shipped to every executor (or exceed the broadcast limit)
DV_BROADCAST_MAX_PAIRS = 2_000_000


#: legacy protocol versions imply features (Delta PROTOCOL.md's
#: version-to-feature table); an upgrade to (3, 7) must carry them
#: forward explicitly, since a v7 protocol lists ALL active features.
_LEGACY_WRITER_FEATURES = {
    2: ["appendOnly", "invariants"],
    3: ["checkConstraints"],
    4: ["changeDataFeed", "generatedColumns"],
    5: ["columnMapping"],
    6: ["identityColumns"],
}
_LEGACY_READER_FEATURES = {2: ["columnMapping"]}


def _dv_upgraded_protocol(proto: dict, meta: dict | None = None) -> dict:
    """The (3, 7) protocol action adding ``deletionVectors`` while
    PRESERVING every feature already active: explicit reader/writer
    feature lists are unioned, legacy versions are expanded via the
    spec's implication table, and changeDataFeed is declared when the
    table property enables it (PROTOCOL.md: a version-7 protocol must
    list all active table features)."""
    from .delta_cdf import cdf_enabled

    r = set(proto.get("readerFeatures") or [])
    w = set(proto.get("writerFeatures") or [])
    mrv = proto.get("minReaderVersion", 1)
    mwv = proto.get("minWriterVersion", 2)
    if mwv < 7:  # legacy protocol: expand implied features
        for v, feats in _LEGACY_WRITER_FEATURES.items():
            if mwv >= v:
                w.update(feats)
        for v, feats in _LEGACY_READER_FEATURES.items():
            if mrv >= v:
                r.update(feats)
    r.add("deletionVectors")
    w.add("deletionVectors")
    if meta is not None and cdf_enabled(meta):
        w.add("changeDataFeed")
    return {
        "minReaderVersion": max(mrv, 3),
        "minWriterVersion": max(mwv, 7),
        "readerFeatures": sorted(r),
        "writerFeatures": sorted(w),
    }


def _needs_dv_upgrade(proto: dict) -> bool:
    return proto.get("minReaderVersion", 1) < 3 or (
        "deletionVectors" not in (proto.get("readerFeatures") or [])
    )


def _delete(
    self: DeltaLogTable, condition, mode: str = "cow"
) -> dict:
    """DELETE FROM <table> WHERE <condition>. ``mode="cow"`` rewrites
    only the files with hits; ``mode="dv"`` writes deletion vectors
    instead (no data-file rewrite). Returns a report dict
    (files_touched / rows_deleted / version; version None when nothing
    matched — no empty commit)."""
    if mode not in ("cow", "dv"):
        raise ValueError(f"mode must be 'cow' or 'dv', got {mode!r}")
    cond = F.expr(condition) if isinstance(condition, str) else condition
    live, meta, head = self._replay()
    part_cols, _, _, out_cols = _schema_parts(meta)
    scan = _scan_with_pos(self, list(live.values()), meta)
    if scan is None:
        return {"files_touched": 0, "rows_deleted": 0, "version": None}
    now = int(time.time() * 1000)
    actions: list[dict] = [
        {
            "commitInfo": {
                "operation": "DELETE",
                "operationParameters": {
                    "predicate": str(condition),
                    "mode": mode,
                },
            }
        }
    ]
    rows_deleted = 0
    if mode == "cow":
        hits = (
            scan.filter(cond)
            .groupBy("__file")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        if not hits:
            return {"files_touched": 0, "rows_deleted": 0,
                    "version": None}
        touched = sorted(r["__file"] for r in hits)
        rows_deleted = sum(r["n"] for r in hits)
        src = _scan_with_pos(self, [live[p] for p in touched], meta)
        keep = src.filter(~F.coalesce(cond, F.lit(False))).select(
            *out_cols
        )
        adds = self._write_data_files(keep, part_cols, meta=meta)
        from .delta_cdf import CHANGE_TYPE, cdf_enabled, write_cdc_files

        if cdf_enabled(meta):
            dels = src.filter(
                F.coalesce(cond, F.lit(False))
            ).select(*out_cols).withColumn(
                CHANGE_TYPE, F.lit("delete")
            )
            actions.extend(
                {"cdc": c} for c in write_cdc_files(self, dels, meta=meta)
            )
        for p in touched:
            actions.append(
                {
                    "remove": {
                        "path": p,
                        "deletionTimestamp": now,
                        "dataChange": True,
                    }
                }
            )
        actions.extend({"add": a} for a in adds)
        touched_n = len(touched)
    else:
        # the roaring bitmaps are built and written EXECUTOR-side
        # (dv.write_dvs_grouped): the driver receives one descriptor
        # row per touched file, never a position list — a DELETE
        # matching billions of rows costs the driver O(files touched)
        prior = {
            p: a.get("deletionVector") for p, a in live.items()
        }
        nrecs = {}
        for p, a in live.items():
            nrec = None
            if a.get("stats"):
                nrec = json.loads(a["stats"]).get("numRecords")
            nrecs[p] = nrec
        hits = dv_io.write_dvs_grouped(
            scan.filter(cond).select("__file", "__pos"),
            self.location,
            prior,
            nrecs,
        )
        if not hits:
            return {"files_touched": 0, "rows_deleted": 0,
                    "version": None}
        if _needs_dv_upgrade(self.current_protocol()):
            actions.append(
                {
                    "protocol": _dv_upgraded_protocol(
                        self.current_protocol(), meta
                    )
                }
            )
        from .delta_cdf import CHANGE_TYPE, cdf_enabled, write_cdc_files

        if cdf_enabled(meta):
            dels = scan.filter(
                F.coalesce(cond, F.lit(False))
            ).select(*out_cols).withColumn(
                CHANGE_TYPE, F.lit("delete")
            )
            actions.extend(
                {"cdc": c} for c in write_cdc_files(self, dels, meta=meta)
            )
        for r in hits:
            a = live[r["path"]]
            rows_deleted += r["n_new"]
            actions.append(
                {
                    "remove": {
                        "path": a["path"],
                        "deletionTimestamp": now,
                        "dataChange": True,
                    }
                }
            )
            if r["descriptor"] is None:
                continue  # every physical row dead: drop the file
            newadd = dict(a)
            newadd["deletionVector"] = json.loads(r["descriptor"])
            newadd["dataChange"] = True
            actions.append({"add": newadd})
        touched_n = len(hits)
    self._commit(head + 1, actions)
    return {
        "files_touched": touched_n,
        "rows_deleted": rows_deleted,
        "version": head + 1,
    }


def _update(
    self: DeltaLogTable, condition, assignments: dict,
    mode: str = "cow",
) -> dict:
    """UPDATE <table> SET col = expr, ... WHERE <condition>.
    ``mode="cow"`` (default) rewrites only the files with at least one
    matching row; ``mode="dv"`` (r10) is merge-on-read UPDATE the way
    DV-capable Delta writers execute it: matched rows get deletion-
    vectored in place (bitmaps built executor-side, no old file
    rewritten) and their updated copies land as fresh files in the
    same commit. Every SET right-hand side (SQL string or Column) is
    evaluated against the OLD row in one ``select``, so assignments
    never see each other's results (SQL UPDATE semantics); assigning a
    partition column moves rows between partitions naturally because
    the rewrite goes through the partitioned writer."""
    if mode not in ("cow", "dv"):
        raise ValueError(f"mode must be 'cow' or 'dv', got {mode!r}")
    cond = F.expr(condition) if isinstance(condition, str) else condition
    live, meta, head = self._replay()
    part_cols, _, types, out_cols = _schema_parts(meta)
    bad = sorted(set(assignments) - set(out_cols))
    if bad:
        raise ValueError(f"SET targets not in table schema: {bad}")
    from .delta_gen import forbid_generated_assignments

    forbid_generated_assignments(meta, assignments)
    scan = _scan_with_pos(self, list(live.values()), meta)
    if scan is None:
        return {"files_touched": 0, "rows_updated": 0, "version": None}
    if mode == "dv":
        return _update_dv(
            self, meta, head, live, scan, cond, assignments,
            part_cols, types, out_cols, condition,
        )
    hits = (
        scan.filter(cond)
        .groupBy("__file")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    if not hits:
        return {"files_touched": 0, "rows_updated": 0, "version": None}
    touched = sorted(r["__file"] for r in hits)
    src = _scan_with_pos(self, [live[p] for p in touched], meta)
    hit = F.coalesce(cond, F.lit(False))
    sets = {
        c: (F.expr(e) if isinstance(e, str) else e)
        for c, e in assignments.items()
    }
    cols = [
        (
            F.when(hit, sets[c].cast(types[c]))
            .otherwise(F.col(c))
            .alias(c)
            if c in sets
            else F.col(c)
        )
        for c in out_cols
    ]
    new = src.select(*cols)
    from .delta_gen import apply_generated

    # assignments may have moved a generated column's base values —
    # the generated value is owned by its expression, so recompute
    new = apply_generated(new, meta, recompute=True)
    from .delta_cdf import enforce_constraints

    enforce_constraints(new, meta)
    adds = self._write_data_files(new, part_cols, meta=meta)
    now = int(time.time() * 1000)
    actions: list[dict] = [
        {
            "commitInfo": {
                "operation": "UPDATE",
                "operationParameters": {"predicate": str(condition)},
            }
        }
    ]
    from .delta_cdf import CHANGE_TYPE, cdf_enabled, write_cdc_files

    if cdf_enabled(meta):
        hit_rows = src.filter(hit)
        pre = hit_rows.select(*out_cols).withColumn(
            CHANGE_TYPE, F.lit("update_preimage")
        )
        post = apply_generated(
            hit_rows.select(
                *[
                    (
                        sets[c].cast(types[c]).alias(c)
                        if c in sets
                        else F.col(c)
                    )
                    for c in out_cols
                ]
            ),
            meta,
            recompute=True,
        ).withColumn(CHANGE_TYPE, F.lit("update_postimage"))
        actions.extend(
            {"cdc": c}
            for c in write_cdc_files(self, pre.unionByName(post), meta=meta)
        )
    for p in touched:
        actions.append(
            {
                "remove": {
                    "path": p,
                    "deletionTimestamp": now,
                    "dataChange": True,
                }
            }
        )
    actions.extend({"add": a} for a in adds)
    self._commit(head + 1, actions)
    return {
        "files_touched": len(touched),
        "rows_updated": sum(r["n"] for r in hits),
        "version": head + 1,
    }


def _update_dv(
    self, meta, head, live, scan, cond, assignments,
    part_cols, types, out_cols, condition,
) -> dict:
    """Merge-on-read UPDATE: deletion-vector the matched rows in
    place (executor-side bitmaps, same machinery as DV DELETE) and
    write their SET-applied copies as fresh add actions — one commit,
    zero pre-update files rewritten."""
    prior = {p: a.get("deletionVector") for p, a in live.items()}
    nrecs = {}
    for p, a in live.items():
        nrec = None
        if a.get("stats"):
            nrec = json.loads(a["stats"]).get("numRecords")
        nrecs[p] = nrec
    hits = dv_io.write_dvs_grouped(
        scan.filter(cond).select("__file", "__pos"),
        self.location,
        prior,
        nrecs,
    )
    if not hits:
        return {"files_touched": 0, "rows_updated": 0, "version": None}
    now = int(time.time() * 1000)
    actions: list[dict] = [
        {
            "commitInfo": {
                "operation": "UPDATE",
                "operationParameters": {
                    "predicate": str(condition),
                    "mode": "dv",
                },
            }
        }
    ]
    if _needs_dv_upgrade(self.current_protocol()):
        actions.append(
            {
                "protocol": _dv_upgraded_protocol(
                    self.current_protocol(), meta
                )
            }
        )
    hit_rows = scan.filter(F.coalesce(cond, F.lit(False)))
    sets = {
        c: (F.expr(e) if isinstance(e, str) else e)
        for c, e in assignments.items()
    }
    updated = hit_rows.select(
        *[
            (
                sets[c].cast(types[c]).alias(c)
                if c in sets
                else F.col(c)
            )
            for c in out_cols
        ]
    )
    from .delta_gen import apply_generated

    updated = apply_generated(updated, meta, recompute=True)
    from .delta_cdf import (
        CHANGE_TYPE,
        cdf_enabled,
        enforce_constraints,
        write_cdc_files,
    )

    enforce_constraints(updated, meta)
    if cdf_enabled(meta):
        pre = hit_rows.select(*out_cols).withColumn(
            CHANGE_TYPE, F.lit("update_preimage")
        )
        post = updated.withColumn(
            CHANGE_TYPE, F.lit("update_postimage")
        )
        actions.extend(
            {"cdc": c}
            for c in write_cdc_files(self, pre.unionByName(post), meta=meta)
        )
    new_adds = self._write_data_files(updated, part_cols, meta=meta)
    rows_updated = 0
    for r in hits:
        a = live[r["path"]]
        rows_updated += r["n_new"]
        actions.append(
            {
                "remove": {
                    "path": a["path"],
                    "deletionTimestamp": now,
                    "dataChange": True,
                }
            }
        )
        if r["descriptor"] is None:
            continue  # file fully superseded: drop it
        newadd = dict(a)
        newadd["deletionVector"] = json.loads(r["descriptor"])
        newadd["dataChange"] = True
        actions.append({"add": newadd})
    actions.extend({"add": a} for a in new_adds)
    self._commit(head + 1, actions)
    return {
        "files_touched": len(hits),
        "rows_updated": rows_updated,
        "version": head + 1,
    }


DeltaLogTable.delete = _delete
DeltaLogTable.update = _update


def _merge_into(
    self: DeltaLogTable,
    source: DataFrame,
    key_cols: list[str],
    when_matched_update: dict | None = None,
    when_matched_delete: str | None = None,
    insert_unmatched: bool = True,
) -> dict:
    """MERGE INTO <table> t USING <source> s ON t.k = s.k — the
    conditional-clause MERGE the reference's Delta runtime executes
    (delta/delta_scd_script.py's whenMatchedUpdate /
    whenNotMatchedInsert decomposition, operators/merge.py), run
    directly against the protocol table with Delta's physical
    strategy: ONE inner join names the files containing a matched
    target row; ONLY those files rewrite (matched rows deleted /
    updated — update expressions are SQL over ``t.*`` and ``s.*``,
    evaluated against the OLD target row); unmatched source rows land
    as fresh insert files; untouched files' add actions are never
    mentioned in the commit.

    Clause semantics: ``when_matched_delete`` (a SQL condition over
    t/s, None = no delete clause) is evaluated FIRST, then
    ``when_matched_update`` ({target_col: SQL expr over t/s}) applies
    to the remaining matched rows; ``insert_unmatched`` maps source
    columns to target columns by name (absent ones become NULL).
    NULL-valued merge keys never match (SQL join semantics), so such
    source rows insert — the reference's Delta NULL-mergeKey behavior.
    A source with two rows matching one target row refuses loudly
    (real Delta's DELTA_MULTIPLE_SOURCE_ROW_MATCHING error)."""
    live, meta, head = self._replay()
    part_cols, _, types, out_cols = _schema_parts(meta)
    from .delta_gen import apply_generated, forbid_generated_assignments

    forbid_generated_assignments(meta, when_matched_update or {})
    from .delta_gen import identity_cols as _idcols

    _id_in_src = sorted(set(_idcols(meta)) & set(source.columns))
    if _id_in_src and insert_unmatched:
        raise ValueError(
            f"MERGE source supplies identity column(s) {_id_in_src} "
            "with insert_unmatched=True — identity is GENERATED "
            "ALWAYS (allowExplicitInsert false); drop the column from "
            "the source or pass insert_unmatched=False"
        )
    scan = _scan_with_pos(self, list(live.values()), meta)
    src = source.withColumn("__s_matched", F.lit(True)).alias("s")
    join_cond = None
    for k in key_cols:
        c = F.col(f"t.{k}") == F.col(f"s.{k}")
        join_cond = c if join_cond is None else (join_cond & c)
    report = {
        "files_rewritten": 0,
        "rows_deleted": 0,
        "rows_updated": 0,
        "rows_inserted": 0,
        "version": None,
    }
    actions: list[dict] = [
        {
            "commitInfo": {
                "operation": "MERGE",
                "operationParameters": {"matchedPredicates": key_cols},
            }
        }
    ]
    now = int(time.time() * 1000)
    touched: list[str] = []
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
        agg = joined.agg(
            F.count(F.lit(1)).alias("m"),
            F.sum(
                F.coalesce(del_cond, F.lit(False)).cast("long")
            ).alias("d"),
        ).first()
        matched_n, deleted_n = int(agg["m"] or 0), int(agg["d"] or 0)
        if matched_n:
            touched = sorted(
                r["__file"]
                for r in joined.select("t.__file").distinct().collect()
            )
            tsrc = _scan_with_pos(
                self, [live[p] for p in touched], meta
            ).alias("t")
            rej = tsrc.join(src, join_cond, "left")
            matched = F.coalesce(
                F.col("s.__s_matched"), F.lit(False)
            )
            keep = rej.filter(
                ~(matched & F.coalesce(del_cond, F.lit(False)))
            )
            cols = []
            for c in out_cols:
                e = F.col(f"t.{c}")
                if when_matched_update and c in when_matched_update:
                    e = F.when(
                        matched
                        & ~F.coalesce(del_cond, F.lit(False)),
                        F.expr(when_matched_update[c]).cast(types[c]),
                    ).otherwise(e)
                cols.append(e.alias(c))
            rewritten = apply_generated(
                keep.select(*cols), meta, recompute=True
            )
            from .delta_cdf import enforce_constraints

            enforce_constraints(rewritten, meta)
            adds = self._write_data_files(rewritten, part_cols, meta=meta)
            from .delta_cdf import (
                CHANGE_TYPE,
                cdf_enabled,
                write_cdc_files,
            )

            if cdf_enabled(meta):
                cdc_parts = []
                mrows = rej.filter(matched)
                dels = mrows.filter(F.coalesce(del_cond, F.lit(False)))
                cdc_parts.append(
                    dels.select(
                        *[F.col(f"t.{c}").alias(c) for c in out_cols]
                    ).withColumn(CHANGE_TYPE, F.lit("delete"))
                )
                if when_matched_update:
                    urows = mrows.filter(
                        ~F.coalesce(del_cond, F.lit(False))
                    )
                    cdc_parts.append(
                        urows.select(
                            *[
                                F.col(f"t.{c}").alias(c)
                                for c in out_cols
                            ]
                        ).withColumn(
                            CHANGE_TYPE, F.lit("update_preimage")
                        )
                    )
                    cdc_parts.append(
                        urows.select(
                            *[
                                (
                                    F.expr(
                                        when_matched_update[c]
                                    ).cast(types[c]).alias(c)
                                    if c in when_matched_update
                                    else F.col(f"t.{c}").alias(c)
                                )
                                for c in out_cols
                            ]
                        ).withColumn(
                            CHANGE_TYPE, F.lit("update_postimage")
                        )
                    )
                cdc = cdc_parts[0]
                for cp in cdc_parts[1:]:
                    cdc = cdc.unionByName(cp)
                actions.extend(
                    {"cdc": c} for c in write_cdc_files(self, cdc, meta=meta)
                )
            for p in touched:
                actions.append(
                    {
                        "remove": {
                            "path": p,
                            "deletionTimestamp": now,
                            "dataChange": True,
                        }
                    }
                )
            actions.extend({"add": a} for a in adds)
            report["files_rewritten"] = len(touched)
            report["rows_deleted"] = deleted_n
            report["rows_updated"] = (
                matched_n - deleted_n if when_matched_update else 0
            )
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
        ins_cols = [
            (
                F.col(c).cast(types[c])
                if c in source.columns
                else F.lit(None).cast(types[c])
            ).alias(c)
            for c in out_cols
        ]
        # inserted rows derive generated columns from their expression
        # (the name-mapped NULL a source without the column produces
        # is never a legal generated value); identity columns get
        # fresh values above the watermark, which rides this commit
        ins = apply_generated(
            unmatched.select(*ins_cols), meta, recompute=True
        )
        from .delta_gen import assign_identity, identity_cols

        idc = identity_cols(meta)
        if idc:
            ins, id_meta = assign_identity(ins.drop(*idc), meta)
            if id_meta is not None:
                actions.append({"metaData": id_meta})
        from .delta_cdf import enforce_constraints

        enforce_constraints(ins, meta)
        n_ins = ins.count()
        if n_ins:
            actions.extend(
                {"add": a}
                for a in self._write_data_files(ins, part_cols, meta=meta)
            )
            report["rows_inserted"] = n_ins
            from .delta_cdf import (
                CHANGE_TYPE,
                cdf_enabled,
                write_cdc_files,
            )

            if cdf_enabled(meta):
                actions.extend(
                    {"cdc": c}
                    for c in write_cdc_files(
                        self,
                        ins.withColumn(CHANGE_TYPE, F.lit("insert")),
                        meta=meta,
                    )
                )
    if len(actions) == 1:
        return report
    self._commit(head + 1, actions)
    report["version"] = head + 1
    return report


DeltaLogTable.merge_into = _merge_into


def _version_at_timestamp(self: DeltaLogTable, ts_ms: int) -> int:
    """TIMESTAMP AS OF resolution: the latest version whose commit
    file landed at or before ``ts_ms`` — resolved from the commit
    files' modification times, exactly how Delta resolves timestamp
    time travel. Refuses timestamps before the first commit."""
    cands = [
        (v, os.path.getmtime(
            os.path.join(self.location, "_delta_log", f"{v:020d}.json")
        ) * 1000.0)
        for v in self._versions()
    ]
    ok = [v for v, m in cands if m <= ts_ms]
    if not ok:
        raise ValueError(
            f"no commit at or before timestamp {ts_ms} (earliest: "
            f"{min(m for _, m in cands) if cands else None})"
        )
    return max(ok)


def _read_as_of_timestamp(self: DeltaLogTable, ts_ms: int) -> DataFrame:
    """SELECT ... TIMESTAMP AS OF <ts> — version resolution + the
    ordinary versioned read."""
    return self.read(version=self.version_at_timestamp(ts_ms))


DeltaLogTable.version_at_timestamp = _version_at_timestamp
DeltaLogTable.read_as_of_timestamp = _read_as_of_timestamp
