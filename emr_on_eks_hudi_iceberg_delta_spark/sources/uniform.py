"""Delta UniForm — a CONTINUOUSLY SYNCED Iceberg metadata mirror over
a Delta table's own data files, zero bytes copied.

Real Delta ships this as Universal Format
(``delta.universalFormat.enabledFormats = iceberg``): every Delta
commit asynchronously (re)generates Iceberg metadata in the SAME table
directory, so Iceberg readers serve the Delta table's parquet files
directly. The reference's three-engine setup (delta/iceberg/hudi
submit scripts each shipping their own runtime jar) is exactly the
consumer story UniForm collapses. Re-derived here over the repo's own
protocol layers: the mirror's ``metadata/`` dir sits beside
``_delta_log/`` (the layouts never collide), and manifests reference
the Delta parquet files by absolute path — ``convert.py``'s one-shot
adoption, upgraded to an INCREMENTAL lifecycle:

* ``enable_uniform(delta)`` — validate, stamp the table property in a
  Delta commit, and run the first sync.
* ``sync_uniform(delta)`` — idempotent catch-up: a no-op when the
  mirror already reflects the Delta head (the Iceberg snapshot summary
  records ``delta-version``); otherwise ONE metadata-only Iceberg
  overwrite listing the current live set. Carried files reuse their
  recorded record counts (Delta add-action ``stats`` or the prior
  manifest), so the sync cost is O(changed files) footer reads, never
  a data scan.

Honest contract (same refusals as ``convert_delta_to_iceberg``, which
stay true under continuous sync): no live deletion vectors (adopted
manifests cannot express them — PURGE first), no hive partitioning
(Delta data files lack the partition columns Iceberg readers expect in
the files), no column mapping (files store physical names). Delta
SCHEMA EVOLUTION syncs through (``_evolved_schema_update``): retained
(name, type) columns keep their Iceberg field ids, new or re-typed
columns mint fresh ids, files lacking a later-added column serve typed
NULLs — real UniForm's schema sync.

Scale: each sync is one manifest write of O(live files) entries with
O(changed files) footer reads; the mirror never rewrites a data file.
"""

from __future__ import annotations

import json
import os

from .delta_log import DeltaLogTable
from .iceberg_layout import IcebergTable

UNIFORM_KEY = "delta.universalFormat.enabledFormats"


def _validate(live: dict, meta: dict) -> None:
    from .delta_colmap import mapping_enabled

    dvd = [p for p, a in live.items() if a.get("deletionVector")]
    if dvd:
        raise ValueError(
            "UniForm cannot mirror live deletion vectors (files "
            f"{dvd[:3]} carry DVs adopted manifests cannot express) — "
            "run optimize() (PURGE) first"
        )
    if meta.get("partitionColumns"):
        raise ValueError(
            "UniForm cannot mirror a hive-partitioned Delta table: "
            "its data files do not contain the partition columns "
            "Iceberg readers expect in the files"
        )
    if mapping_enabled(meta):
        raise ValueError(
            "UniForm cannot mirror a column-mapped Delta table: its "
            "files store physical column names"
        )


def _record_count(delta_location: str, add: dict) -> int:
    raw = add.get("stats")
    if raw:
        n = json.loads(raw).get("numRecords")
        if n is not None:
            return int(n)
    import pyarrow.parquet as pq

    return pq.read_metadata(
        os.path.join(delta_location, add["path"])
    ).num_rows


def _evolved_schema_update(md: dict, delta_schema) -> dict:
    """An Iceberg ``schema_update`` matching the NEW Delta schema by
    NAME against the mirror's current schema: retained (name, type)
    pairs keep their field ids (old files keep resolving), new or
    re-typed columns mint fresh ids (Iceberg's never-reuse contract),
    departed columns simply leave."""
    from .iceberg_layout import _TYPE_MAP, ice_schema_by_id

    cur_sid = md.get(
        "current-schema-id", md["schema"].get("schema-id", 0)
    )
    cur = ice_schema_by_id(md, cur_sid)
    by_name = {f["name"]: f for f in cur["fields"]}
    next_id = md.get("last-column-id", len(cur["fields"]))
    fields = []
    for f in delta_schema.fields:
        t = f.dataType.simpleString()
        ice = (
            t.replace(",", ", ")
            if t.startswith("decimal")
            else _TYPE_MAP[t]
        )
        prev = by_name.get(f.name)
        if prev is not None and prev["type"] == ice:
            fields.append(dict(prev))
        else:
            next_id += 1
            fields.append(
                {
                    "id": next_id,
                    "name": f.name,
                    "required": False,
                    "type": ice,
                }
            )
    return {
        "schema": {
            "type": "struct",
            "schema-id": cur.get("schema-id", 0) + 1,
            "fields": fields,
        },
        "last_column_id": next_id,
    }


def _sync_uniform(self: DeltaLogTable) -> int | None:
    """Catch the Iceberg mirror up to the Delta head; returns the new
    Iceberg snapshot id, or None when already in sync."""
    live, meta, head = self._replay()
    if (meta.get("configuration") or {}).get(UNIFORM_KEY) != "iceberg":
        raise ValueError(
            "UniForm is not enabled on this table — call "
            "enable_uniform() first"
        )
    _validate(live, meta)
    ice = IcebergTable(self.spark, self.location)
    prior_counts: dict[str, int] = {}
    schema_update = None
    cur = ice._current_version()
    if cur is not None:
        md = ice._metadata()
        snap = next(
            (
                s
                for s in md["snapshots"]
                if s["snapshot-id"] == md.get("current-snapshot-id")
            ),
            None,
        )
        if snap is not None:
            if snap.get("summary", {}).get("delta-version") == str(head):
                return None  # idempotent: mirror already at head
            from .iceberg_layout import _spark_schema_from_md

            ice_schema = _spark_schema_from_md(md)
            delta_schema = self.read().schema
            if [(f.name, f.dataType) for f in ice_schema.fields] != [
                (f.name, f.dataType) for f in delta_schema.fields
            ]:
                # the Delta schema evolved (append mergeSchema / a
                # schema-changing overwrite): evolve the MIRROR schema
                # by NAME — retained (name, type) keep their field
                # ids, new or re-typed columns mint fresh ids (never
                # reused — a Delta type change implies full file
                # replacement, so no old file serves the old id), and
                # files lacking a later-added column serve typed NULLs
                # through the explicit-schema scan. Real UniForm's
                # schema sync.
                schema_update = _evolved_schema_update(
                    md, delta_schema
                )
            prior_counts = {
                e["data_file"]["file_path"]: e["data_file"][
                    "record_count"
                ]
                for e in ice._entries()
            }
    files = []
    for rel, add in live.items():
        full = os.path.join(self.location, rel)
        files.append(
            {
                "file_path": full,
                "file_format": "PARQUET",
                "partition": {},
                "record_count": (
                    prior_counts[full]
                    if full in prior_counts
                    else _record_count(self.location, add)
                ),
                "file_size_in_bytes": add.get("size")
                or os.path.getsize(full),
                "block_size_in_bytes": 64 * 1024 * 1024,
            }
        )
    ice._summary_extra = {"delta-version": str(head), "uniform": "true"}
    try:
        sid = ice._commit(
            self.read(), files, "overwrite",
            schema_update=schema_update,
        )
    finally:
        ice._summary_extra = None
    return sid


def _enable_uniform(self: DeltaLogTable) -> int:
    """Turn on the Iceberg mirror: validate, stamp the table property
    (one Delta commit), run the first sync. Returns the Iceberg
    snapshot id."""
    live, meta, head = self._replay()
    _validate(live, meta)
    cfg = dict(meta.get("configuration") or {})
    if cfg.get(UNIFORM_KEY) != "iceberg":
        new_meta = dict(meta)
        cfg[UNIFORM_KEY] = "iceberg"
        new_meta["configuration"] = cfg
        self._commit(
            head + 1,
            [
                {
                    "commitInfo": {
                        "operation": "SET TBLPROPERTIES",
                        "operationParameters": {
                            UNIFORM_KEY: "iceberg"
                        },
                    }
                },
                {"metaData": new_meta},
            ],
        )
    return _sync_uniform(self)


DeltaLogTable.enable_uniform = _enable_uniform
DeltaLogTable.sync_uniform = _sync_uniform
