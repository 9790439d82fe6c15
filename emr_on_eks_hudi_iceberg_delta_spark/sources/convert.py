"""In-place lakehouse conversions — metadata-only 'adoption' of
existing data, zero bytes copied.

The operational reality CONVERT TO DELTA / Iceberg's ``migrate`` exist
for: petabytes of plain parquet (or one format's table) need the
transaction log of another format, and rewriting the data is a
non-starter. Conversion = write NEW metadata that references the OLD
files in place:

* ``convert_parquet_dir_to_delta`` — lay a ``_delta_log`` over a plain
  (optionally hive-partitioned) parquet directory: one v0 commit whose
  add actions point at the existing files (relative paths), partition
  values parsed from the hive dir names, schema from a Spark inference
  read. The directory IS afterwards a Delta-protocol table — readable
  by DeltaLogTable and any protocol-v1 reader — and the original files
  never move (pinned by inode in tests).
* ``convert_delta_to_iceberg`` — write Iceberg v1 metadata whose
  manifests reference the Delta table's live data files by absolute
  path (the spec stores full URIs, so cross-directory adoption is
  legal). Unpartitioned only: a hive-partitioned Delta table's data
  files do not CONTAIN the partition columns, and Iceberg readers
  expect them in the files — converting would silently drop columns,
  so it refuses loudly instead.

Both conversions are one metadata commit; subsequent writes through
the adopting table copy-on-write as normal and never touch the
adopted files until a VACUUM/retention decision does.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .delta_log import DeltaLogTable
from .iceberg_layout import IcebergTable


def convert_parquet_dir_to_delta(
    spark: SparkSession,
    location: str,
    partition_by: list[str] | None = None,
) -> DeltaLogTable:
    """Lay a ``_delta_log`` over a plain parquet directory.

    ``partition_by`` is the EXPLICIT partition schema, like real
    CONVERT TO DELTA's ``PARTITIONED BY`` clause: every file's hive
    path must carry exactly those keys in that order, and a
    mixed-depth or inconsistently-keyed layout refuses LOUDLY (r12 —
    previously the first partitioned file's keys were inferred and a
    mismatched layout produced inconsistent partitionValues silently).
    Omitting it keeps inference, but inference now VALIDATES that
    every file agrees with the first-seen layout instead of trusting
    it."""
    from urllib.parse import unquote

    if os.path.isdir(os.path.join(location, "_delta_log")):
        raise ValueError(f"{location} already has a _delta_log")
    adds = []
    part_cols: list[str] | None = (
        list(partition_by) if partition_by is not None else None
    )
    for root, _dirs, files in os.walk(location):
        for fname in files:
            if not fname.endswith(".parquet"):
                continue
            full = os.path.join(root, fname)
            rel = os.path.relpath(full, location)
            pvals: dict[str, str] = {}
            rel_dir = os.path.dirname(rel)
            if rel_dir:
                for seg in rel_dir.split(os.sep):
                    k, _, raw = seg.partition("=")
                    pvals[k] = (
                        None
                        if raw == "__HIVE_DEFAULT_PARTITION__"
                        else unquote(raw)
                    )
            if part_cols is None:
                part_cols = list(pvals)  # inference: first-seen layout
            if list(pvals) != part_cols:
                raise ValueError(
                    f"file {rel!r} has hive partition keys "
                    f"{list(pvals)}, expected {part_cols} "
                    + (
                        "(explicit partition_by)"
                        if partition_by is not None
                        else "(inferred from the first file — pass "
                        "partition_by=[...] to declare the layout)"
                    )
                    + "; a mixed layout cannot convert"
                )
            adds.append(
                {
                    "path": rel.replace(os.sep, "/"),
                    "partitionValues": pvals,
                    "size": os.path.getsize(full),
                    "modificationTime": int(os.path.getmtime(full) * 1000),
                    "dataChange": True,
                }
            )
    if not adds:
        raise ValueError(f"no parquet files under {location}")
    part_cols = part_cols or []
    # schema: Spark's inference read resolves data + partition columns
    inferred = spark.read.parquet(location)
    missing = [
        c for c in part_cols if c not in inferred.columns
    ]
    if missing:
        raise ValueError(
            f"partition_by columns {missing} not present in the "
            "directory layout (no such hive keys resolved)"
        )
    dt = DeltaLogTable(spark, location)
    actions = [
        {
            "commitInfo": {
                "operation": "CONVERT",
                "operationParameters": {"sourceFormat": "parquet"},
            }
        },
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        dt._meta_action(inferred, part_cols),
    ]
    actions.extend({"add": a} for a in adds)
    dt._commit(0, actions)
    return dt


def convert_delta_to_iceberg(
    spark: SparkSession, delta_location: str, iceberg_location: str
) -> IcebergTable:
    import pyarrow.parquet as pq

    src = DeltaLogTable(spark, delta_location)
    live, meta, _ = src._replay()
    dvd = [p for p, a in live.items() if a.get("deletionVector")]
    if dvd:
        raise ValueError(
            "cannot adopt a Delta table with live deletion vectors "
            f"into Iceberg (files {dvd[:3]} carry DVs the adopted "
            "manifests cannot express) — run optimize() (PURGE) "
            "first, or enable_uniform(), the in-place mirror that "
            "translates live DVs into position-delete files (r12)"
        )
    if meta.get("partitionColumns"):
        raise ValueError(
            "cannot adopt a hive-partitioned Delta table into Iceberg: "
            "its data files do not contain the partition columns "
            "(Iceberg stores them in the files) — rewrite via "
            "IcebergTable.overwrite(delta.read()), or "
            "enable_uniform(), the in-place mirror that serves them "
            "as manifest partition constants (r12)"
        )
    df = src.read()
    t = IcebergTable(spark, iceberg_location)
    files = []
    for add in live.values():
        full = os.path.join(delta_location, add["path"])
        files.append(
            {
                "file_path": full,
                "file_format": "PARQUET",
                "partition": {},
                "record_count": pq.read_metadata(full).num_rows,
                "file_size_in_bytes": os.path.getsize(full),
                "block_size_in_bytes": 64 * 1024 * 1024,
            }
        )
    t._commit(df, files, "append")
    return t


def convert_iceberg_to_delta(
    spark: SparkSession, location: str
) -> DeltaLogTable:
    """Adopt an Iceberg table into Delta IN PLACE (r11 — the reverse
    of ``convert_delta_to_iceberg``, completing the conversion
    matrix): lay a ``_delta_log`` beside the Iceberg ``metadata/``
    whose v0 add actions reference the LIVE data files by relative
    path, record counts carried from the manifests as Delta ``stats``
    (skipping-compatible, zero footer reads). Identity-partitioned
    Iceberg tables adopt as unpartitioned Delta — their data files
    CONTAIN the partition columns (the Iceberg contract), so nothing
    is lost except hive-dir pruning.

    Refusals (loud, never silent): live position/equality delete
    files (Delta adds cannot express them — rewrite_data_files()
    first), and historical schema versions whose COLUMN NAMES differ
    from the current schema (Iceberg reads resolve renames by field
    id; Delta resolves by name, so adopted old-name files would
    silently serve NULLs)."""
    import json as _json

    from .iceberg_layout import (
        STATUS_DELETED,
        IcebergTable,
        entry_schema_id,
        ice_schema_by_id,
    )

    if os.path.isdir(os.path.join(location, "_delta_log")):
        raise ValueError(f"{location} already has a _delta_log")
    t = IcebergTable(spark, location)
    if t._live_delete_files() or t._live_eq_delete_entries():
        raise ValueError(
            "cannot adopt an Iceberg table with live delete files "
            "into Delta (add actions cannot express them) — run "
            "rewrite_data_files() first"
        )
    md = t._metadata()
    entries = [
        e for e in t._entries() if e["status"] != STATUS_DELETED
    ]
    if not entries:
        raise ValueError(f"no live data files under {location}")
    cur_sid = md.get(
        "current-schema-id", md["schema"].get("schema-id", 0)
    )
    cur_names = [
        f["name"] for f in ice_schema_by_id(md, cur_sid)["fields"]
    ]
    for sid in {entry_schema_id(md, e) for e in entries}:
        names = [
            f["name"] for f in ice_schema_by_id(md, sid)["fields"]
        ]
        if names != cur_names:
            raise ValueError(
                "cannot adopt: data files were written under a "
                f"schema whose column names {names} differ from the "
                f"current {cur_names} — Delta resolves by NAME, so "
                "renamed files would silently serve NULLs; run "
                "rewrite_data_files() first"
            )
    adds = []
    for e in entries:
        d = e["data_file"]
        full = d["file_path"]
        rel = os.path.relpath(full, location)
        if rel.startswith(".."):
            raise ValueError(
                f"data file {full} lies outside the table root — "
                "Delta paths are table-relative"
            )
        adds.append(
            {
                "path": rel.replace(os.sep, "/"),
                "partitionValues": {},
                "size": d.get("file_size_in_bytes")
                or os.path.getsize(full),
                "modificationTime": int(os.path.getmtime(full) * 1000),
                "dataChange": True,
                "stats": _json.dumps(
                    {"numRecords": d["record_count"]}
                ),
            }
        )
    df = t.read()
    dt = DeltaLogTable(spark, location)
    actions = [
        {
            "commitInfo": {
                "operation": "CONVERT",
                "operationParameters": {"sourceFormat": "iceberg"},
            }
        },
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        dt._meta_action(df, []),
    ]
    actions.extend({"add": a} for a in adds)
    dt._commit(0, actions)
    return dt


def convert_hudi_to_delta(
    spark: SparkSession, location: str
) -> DeltaLogTable:
    """Adopt a Hudi table into Delta IN PLACE (r11 — the
    migrate-off-Hudi story, zero bytes copied): a ``_delta_log`` lands
    beside ``.hoodie/`` whose v0 add actions reference the LIVE file
    slices by relative path. The ``_hoodie_*`` meta columns stay in
    the files but UNREAD — Delta scans with the declared schema and
    parquet resolves columns by name, so the extra columns simply
    never deserialize. Record counts come from one footer read per
    live file (the Hudi write stats don't always carry them) and ride
    as Delta ``stats``.

    CoW adopts directly; MoR adopts only when every file group is
    log-free (run ``compact()`` first — log files merge by record key
    at read time, which an add-action list cannot express)."""
    import json as _json

    import pyarrow.parquet as pq

    from .hudi_layout import HudiCowTable, HudiMorTable
    from .hudi_maintenance import _META_COLS

    if os.path.isdir(os.path.join(location, "_delta_log")):
        raise ValueError(f"{location} already has a _delta_log")
    props = os.path.join(location, ".hoodie", "hoodie.properties")
    if not os.path.exists(props):
        raise ValueError(f"{location} is not a Hudi table")
    stored = dict(
        line.strip().split("=", 1)
        for line in open(props)
        if "=" in line
    )
    if stored.get("hoodie.table.type") == "MERGE_ON_READ":
        t = HudiMorTable(spark, location)
        slices = t._mor_slices()
        hot = [k for k, s in slices.items() if s["logs"]]
        if hot:
            raise ValueError(
                f"MoR file groups {hot[:3]} have unfolded log files "
                "an add-action list cannot express — run compact() "
                "first"
            )
        live = {
            k: s["base"] for k, s in slices.items() if s["base"]
        }
    else:
        t = HudiCowTable(spark, location)
        live = t._file_slices()
    if not live:
        raise ValueError(f"no live file slices under {location}")
    adds = []
    for rel in sorted(live.values()):
        full = os.path.join(location, rel)
        n = pq.read_metadata(full).num_rows
        adds.append(
            {
                "path": rel.replace(os.sep, "/"),
                "partitionValues": {},
                "size": os.path.getsize(full),
                "modificationTime": int(os.path.getmtime(full) * 1000),
                "dataChange": True,
                "stats": _json.dumps({"numRecords": n}),
            }
        )
    df = t.read().drop(*_META_COLS)
    dt = DeltaLogTable(spark, location)
    actions = [
        {
            "commitInfo": {
                "operation": "CONVERT",
                "operationParameters": {"sourceFormat": "hudi"},
            }
        },
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        dt._meta_action(df, []),
    ]
    actions.extend({"add": a} for a in adds)
    dt._commit(0, actions)
    return dt
