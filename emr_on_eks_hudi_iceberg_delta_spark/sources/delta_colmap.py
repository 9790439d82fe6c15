"""Delta COLUMN MAPPING (name mode) for the protocol table:
rename/drop column evolution without rewriting a single data file.

Implements PROTOCOL.md's "Column Mapping" section: when
``delta.columnMapping.mode = name``, every schema field carries two
metadata keys — a stable ``delta.columnMapping.id`` and a
``delta.columnMapping.physicalName`` — and data files store columns
under the PHYSICAL names. Renaming a column changes only the logical
name (physical name and id are immutable), so every existing file
keeps serving; dropping a column removes the field from the schema
while the bytes stay in place, unread. ``delta.columnMapping.
maxColumnId`` tracks the id high-water mark so ids are never reused.

Reference parity: delta/delta_scd_script.py runs on a Delta runtime
where ALTER TABLE ... RENAME COLUMN is a table operation once the
columnMapping feature is enabled; this module provides the same
surface on the log-native table (sources/delta_log.py).

Upgrade semantics match real Delta's ALTER TABLE SET TBLPROPERTIES
upgrade path: existing columns take their CURRENT logical name as the
physical name (so files written before the upgrade stay valid), new
columns added later get fresh ``col-<uuid>`` physical names. The
protocol merge preserves active features (same rules as the DV
upgrade). Checkpoints carry the mapping automatically — it lives in
``schemaString`` field metadata and ``configuration``, both
checkpointed.

Scope: reads (snapshot + time travel + filtered + pruned), appends
(including mergeSchema evolution — new columns get fresh ids),
row-level DML (DELETE cow/dv, UPDATE cow/dv, MERGE INTO — scans go
physical-to-logical, rewrites and CDC files write physical names),
OPTIMIZE/compaction, VACUUM, CDF, checkpoints, matching-schema DATA
overwrites (the mapped schema — ids and physical names — kept
verbatim), schema-CHANGING overwrites (r11: ``reconcile_mapped_
schema`` keeps retained columns' ids/physical names, mints fresh ones
for new columns, never reuses departed ids), and generated/identity
column declarations (delta_gen.py reconciles the same way and unions
the protocol features) all work on mapped tables.
"""

from __future__ import annotations

import json
import time
import uuid

from pyspark.sql import DataFrame
from pyspark.sql.types import StructType

from .delta_log import DeltaLogTable

MODE_KEY = "delta.columnMapping.mode"
MAXID_KEY = "delta.columnMapping.maxColumnId"
_ID_META = "delta.columnMapping.id"
_PHYS_META = "delta.columnMapping.physicalName"


def mapping_enabled(meta: dict) -> bool:
    return (meta.get("configuration") or {}).get(MODE_KEY) == "name"


def physical_names(meta: dict) -> dict[str, str]:
    """logical column name -> physical column name (identity when the
    table is not column-mapped)."""
    schema = json.loads(meta["schemaString"])
    out = {}
    for f in schema["fields"]:
        md = f.get("metadata") or {}
        out[f["name"]] = md.get(_PHYS_META, f["name"])
    return out


def to_physical(df: DataFrame, meta: dict) -> DataFrame:
    """Rename a logical-schema DataFrame to physical column names for
    writing."""
    phys = physical_names(meta)
    from pyspark.sql import functions as F

    return df.select(
        *[F.col(c).alias(phys.get(c, c)) for c in df.columns]
    )


def _colmap_protocol(proto: dict) -> dict:
    """Protocol action adding the columnMapping feature while
    preserving everything active (same merge rules as the DV
    upgrade)."""
    from .delta_dml import _dv_upgraded_protocol

    # reuse the legacy-expansion machinery, then add columnMapping on
    # both sides; the DV feature itself is NOT implied by this upgrade
    has_dv = "deletionVectors" in (
        (proto.get("readerFeatures") or [])
    )
    up = _dv_upgraded_protocol(proto, None)
    r = set(up["readerFeatures"])
    w = set(up["writerFeatures"])
    if not has_dv:
        r.discard("deletionVectors")
        w.discard("deletionVectors")
    r.add("columnMapping")
    w.add("columnMapping")
    return {
        "minReaderVersion": 3,
        "minWriterVersion": 7,
        "readerFeatures": sorted(r),
        "writerFeatures": sorted(w),
    }


def _enable_column_mapping(self: DeltaLogTable) -> "DeltaLogTable":
    """ALTER TABLE SET TBLPROPERTIES (delta.columnMapping.mode =
    'name'): stamp every existing field with its id and physical name
    (= its current logical name, so existing files keep serving) and
    upgrade the protocol to declare the feature."""
    live, meta, head = self._replay()
    if mapping_enabled(meta):
        return self
    schema = json.loads(meta["schemaString"])
    for i, f in enumerate(schema["fields"], start=1):
        md = dict(f.get("metadata") or {})
        md[_ID_META] = i
        md[_PHYS_META] = f["name"]
        f["metadata"] = md
    new_meta = dict(meta)
    new_meta["schemaString"] = json.dumps(schema)
    cfg = dict(meta.get("configuration") or {})
    cfg[MODE_KEY] = "name"
    cfg[MAXID_KEY] = str(len(schema["fields"]))
    new_meta["configuration"] = cfg
    self._commit(
        head + 1,
        [
            {
                "commitInfo": {
                    "operation": "SET TBLPROPERTIES",
                    "operationParameters": {MODE_KEY: "name"},
                }
            },
            {"protocol": _colmap_protocol(self.current_protocol())},
            {"metaData": new_meta},
        ],
    )
    return self


def _require_mapping(meta: dict, op: str) -> None:
    if not mapping_enabled(meta):
        raise ValueError(
            f"{op} requires column mapping; run "
            "enable_column_mapping() first (Delta refuses RENAME/DROP "
            "COLUMN without delta.columnMapping.mode = 'name')"
        )


def _rename_column(
    self: DeltaLogTable, old: str, new: str
) -> "DeltaLogTable":
    """ALTER TABLE ... RENAME COLUMN old TO new — metadata-only: the
    field keeps its id and physical name, so every data file written
    under the old name keeps serving without a rewrite."""
    _, meta, head = self._replay()
    _require_mapping(meta, "RENAME COLUMN")
    schema = json.loads(meta["schemaString"])
    names = [f["name"] for f in schema["fields"]]
    if old not in names:
        raise ValueError(f"no such column {old!r} (have {names})")
    if new in names:
        raise ValueError(f"column {new!r} already exists")
    for f in schema["fields"]:
        if f["name"] == old:
            f["name"] = new
    new_meta = dict(meta)
    new_meta["schemaString"] = json.dumps(schema)
    new_meta["partitionColumns"] = [
        new if c == old else c
        for c in meta.get("partitionColumns", [])
    ]
    self._commit(
        head + 1,
        [
            {
                "commitInfo": {
                    "operation": "RENAME COLUMN",
                    "operationParameters": {"from": old, "to": new},
                }
            },
            {"metaData": new_meta},
        ],
    )
    return self


def _drop_column(self: DeltaLogTable, col: str) -> "DeltaLogTable":
    """ALTER TABLE ... DROP COLUMN — metadata-only: the field leaves
    the schema; its bytes stay in the data files, unread (and its id
    is never reused — maxColumnId does not go down)."""
    _, meta, head = self._replay()
    _require_mapping(meta, "DROP COLUMN")
    schema = json.loads(meta["schemaString"])
    names = [f["name"] for f in schema["fields"]]
    if col not in names:
        raise ValueError(f"no such column {col!r} (have {names})")
    if col in meta.get("partitionColumns", []):
        raise ValueError(f"cannot drop partition column {col!r}")
    if len(names) == 1:
        raise ValueError("cannot drop the only column")
    schema["fields"] = [
        f for f in schema["fields"] if f["name"] != col
    ]
    new_meta = dict(meta)
    new_meta["schemaString"] = json.dumps(schema)
    self._commit(
        head + 1,
        [
            {
                "commitInfo": {
                    "operation": "DROP COLUMNS",
                    "operationParameters": {"columns": [col]},
                }
            },
            {"metaData": new_meta},
        ],
    )
    return self


def reconcile_mapped_schema(meta: dict, new_schema) -> dict:
    """metaData for a schema-CHANGING overwrite of a mapped table
    (real Delta's ``overwriteSchema`` with columnMapping active):
    columns retained BY LOGICAL NAME keep their id and physical name
    — time travel and CDF across the overwrite keep resolving by id —
    new columns get fresh ids + ``col-<uuid>`` physical names, and
    departed columns simply leave (their ids are never reused;
    maxColumnId only grows). Every data file is replaced by the
    overwrite, so no historical file needs the departed physical
    names."""
    old = json.loads(meta["schemaString"])
    by_name = {f["name"]: f for f in old["fields"]}
    cfg = dict(meta.get("configuration") or {})
    max_id = int(cfg.get(MAXID_KEY, "0"))
    fields = []
    for f in json.loads(new_schema.json())["fields"]:
        prev = by_name.get(f["name"])
        md = dict(f.get("metadata") or {})
        pmd = (prev.get("metadata") or {}) if prev else {}
        if _ID_META in pmd and _PHYS_META in pmd:
            md[_ID_META] = pmd[_ID_META]
            md[_PHYS_META] = pmd[_PHYS_META]
        else:
            max_id += 1
            md[_ID_META] = max_id
            md[_PHYS_META] = f"col-{uuid.uuid4()}"
        f["metadata"] = md
        fields.append(f)
    new_meta = dict(meta)
    new_meta["schemaString"] = json.dumps(
        {"type": "struct", "fields": fields}
    )
    cfg[MAXID_KEY] = str(max_id)
    new_meta["configuration"] = cfg
    return new_meta


def fresh_field_metadata(meta: dict) -> tuple[dict, int]:
    """Metadata dict (id + col-<uuid> physical name) for a NEW column
    on a mapped table, plus the new maxColumnId."""
    cfg = meta.get("configuration") or {}
    next_id = int(cfg.get(MAXID_KEY, "0")) + 1
    return (
        {
            _ID_META: next_id,
            _PHYS_META: f"col-{uuid.uuid4()}",
        },
        next_id,
    )


DeltaLogTable.enable_column_mapping = _enable_column_mapping
DeltaLogTable.rename_column = _rename_column
DeltaLogTable.drop_column = _drop_column
