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
    spark: SparkSession, location: str
) -> DeltaLogTable:
    import time
    import uuid
    from urllib.parse import unquote

    if os.path.isdir(os.path.join(location, "_delta_log")):
        raise ValueError(f"{location} already has a _delta_log")
    adds = []
    part_cols: list[str] = []
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
            if pvals and not part_cols:
                part_cols = list(pvals)
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
    # schema: Spark's inference read resolves data + partition columns
    inferred = spark.read.parquet(location)
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
            "manifests cannot express) — run optimize() (PURGE) first"
        )
    if meta.get("partitionColumns"):
        raise ValueError(
            "cannot adopt a hive-partitioned Delta table into Iceberg: "
            "its data files do not contain the partition columns "
            "(Iceberg stores them in the files) — rewrite via "
            "IcebergTable.overwrite(delta.read()) instead"
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
