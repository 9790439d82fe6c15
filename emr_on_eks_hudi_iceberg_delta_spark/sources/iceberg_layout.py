"""Iceberg v1 table in Iceberg's OWN metadata layout — versioned
metadata.json, Avro manifest lists and manifests, snapshot reads, time
travel, and append/overwrite commits, with no Iceberg runtime.

The reference's third leg writes Iceberg tables
(``iceberg/iceberg_submit.sh:33-34`` ships iceberg-spark-runtime +
spark-avro; neither jar exists in this container — verified and gated
in round 6). The FORMAT, however, is an open spec
(https://iceberg.apache.org/spec/): JSON table metadata pointing at a
snapshot list, each snapshot pointing at an Avro MANIFEST LIST, each
manifest-list row pointing at an Avro MANIFEST whose entries carry the
data-file paths and stats. With parquet for the data plane and the
sibling ``avro_io`` codec for the metadata plane, the whole layout is
writable and readable Spark-first — completing the lakehouse-format
trio beside ``delta_log`` (Delta) and ``hudi_layout`` (Hudi).

Implemented (v1; unpartitioned or identity-partitioned specs):

* ``append / overwrite`` — write parquet under ``data/``, one manifest
  per snapshot listing the snapshot's FULL file state (appends carry
  prior files forward as EXISTING entries, overwrites list only the
  new files), a manifest list per snapshot, the next
  ``vN.metadata.json``, and ``version-hint.text`` last — the pointer
  swap is the atomic commit, exactly Iceberg's HadoopCatalog protocol.
* ``read(snapshot_id=None)`` — resolve the metadata pointer, walk
  snapshot -> manifest list -> manifests -> live data files, scan
  parquet. Time travel = pass any historical snapshot id (old
  metadata, manifests, and files are immutable — nothing is rewritten
  on commit).
* ``added_files / read_appended_since`` — incremental consumption from
  manifest-entry statuses (ADDED vs EXISTING attribution per
  snapshot).
* ``history()`` — the snapshot log.

Field ids follow the spec (manifest_path=500..., file_path=100...,
partition fields 1000...) so the Avro files carry the ids a real
Iceberg reader resolves by. Identity partitioning keeps the source
column IN the data files (the Iceberg contract, unlike hive/Delta
layouts) and records typed partition values in the manifest entries;
``read_where`` prunes on the driver's manifest before any file is
scheduled.

v2 merge-on-read DELETE lives in iceberg_deletes.py: position-delete
files ((file_path, pos) parquet, spec field-ids honored), delete
manifests (manifest-list ``content`` = 1) carried forward by appends,
reads applying them via ``_metadata.row_index`` + broadcast anti-join,
``rewrite_data_files`` compaction, and metadata-only
``rollback(snapshot_id)``.

Schema evolution (the spec's field-id model, r10): add-column with
FRESH ids (``last-column-id`` advances — ids are never reused),
RENAME/DROP COLUMN as metadata-only schema-version bumps
(iceberg_deletes.py), and type widening (int->long, float->double).
Metadata keeps the full ``schemas`` list + ``current-schema-id``;
snapshots record ``schema-id``, so time travel surfaces each
snapshot's own schema, and READS RESOLVE BY FIELD ID: one multi-path
scan per distinct write-time schema version, aligned to the target
schema (``_aligned_scan``) — renamed columns keep serving from old
files, later-added fields read as typed NULLs, widened types up-cast.
Snapshots carry ``sequence-number`` (metadata tracks
``last-sequence-number``) for v2 delete applicability; equality
deletes (content=2) and the one-snapshot keyed upsert live in
iceberg_deletes.py (r10). Partition-spec EVOLUTION (identity fields,
``evolve_partition_spec``) is metadata-only: old files keep their
layout and recorded partition values (manifest partition records are
the union of all spec versions), new writes use the new spec.
HIDDEN PARTITIONING (r10): non-identity transforms — ``bucket[N]``
(spec murmur3, seed 0), ``truncate[W]``, ``year/month/day/hour`` —
are first-class: write with ``partition_by=["day(ts)",
"bucket(8, id)"]``, prune with ``read_hidden`` on SOURCE-column
predicates (equality through bucket, ranges through the
order-preserving transforms), all transform math JVM-side
(iceberg_transforms.py; murmur3 pinned to the spec's Appendix B
known answers).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from .avro_io import read_ocf, read_ocf_cached, write_ocf
from .iceberg_bounds import bounds_avro as _bounds_avro
from .iceberg_transforms import parse_partition_spec as _parse_pspec

_TYPE_MAP = {
    "bigint": "long",
    "int": "int",
    "smallint": "int",
    "tinyint": "int",
    "double": "double",
    "float": "float",
    "string": "string",
    "boolean": "boolean",
    "date": "date",
    "timestamp_ntz": "timestamp",
    "timestamp": "timestamptz",
    "binary": "binary",
}

#: avro types for identity-partition values (always nullable unions —
#: hive's __HIVE_DEFAULT_PARTITION__ maps to null)
_PART_AVRO = {
    "int": "int",
    "smallint": "int",
    "tinyint": "int",
    "bigint": "long",
    "double": "double",
    "float": "float",
    "string": "string",
    "boolean": "boolean",
}


def manifest_entry_schema(part_fields: list[tuple[str, str]]) -> dict:
    """The manifest-entry avro schema with the table's identity
    partition fields embedded in the r102 partition record (spec
    field-ids from 1000 up), empty for unpartitioned tables."""
    return {
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
                        {"name": "file_path", "type": "string",
                         "field-id": 100},
                        {"name": "file_format", "type": "string",
                         "field-id": 101},
                        {"name": "partition", "field-id": 102,
                         "type": {"type": "record", "name": "r102",
                                  "fields": [
                                      {"name": n,
                                       "type": ["null", t],
                                       "field-id": 1000 + i}
                                      for i, (n, t) in
                                      enumerate(part_fields)
                                  ]}},
                        {"name": "record_count", "type": "long",
                         "field-id": 103},
                        {"name": "file_size_in_bytes", "type": "long",
                         "field-id": 104},
                        {"name": "block_size_in_bytes", "type": "long",
                         "field-id": 105},
                        # spec 125/128: per-column min/max in the
                        # single-value binary serialization, keyed by
                        # field id (iceberg_bounds.py) — entries from
                        # pre-bounds manifests read back without the
                        # keys and are simply never skipped
                        {
                            "name": "lower_bounds",
                            "type": ["null", _bounds_avro("lower", 125)],
                            "field-id": 125,
                        },
                        {
                            "name": "upper_bounds",
                            "type": ["null", _bounds_avro("upper", 128)],
                            "field-id": 128,
                        },
                    ],
                },
            },
        ],
    }

MANIFEST_FILE_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_data_files_count", "type": "int",
         "field-id": 504},
        {"name": "existing_data_files_count", "type": "int",
         "field-id": 505},
        {"name": "deleted_data_files_count", "type": "int",
         "field-id": 506},
        # v2: 0 = data manifest, 1 = delete manifest (spec field 517).
        # Manifest lists written before this field existed read back
        # without the key; every consumer defaults it to 0.
        {"name": "content", "type": "int", "field-id": 517},
        # spec field 507: per-partition-field summaries letting readers
        # prune WHOLE MANIFESTS before decoding them (field_summary:
        # contains_null 509, lower_bound 510, upper_bound 511). Bounds
        # are JSON single-value encoded (this codec's documented
        # metadata-plane representation; real Iceberg uses the binary
        # single-value serialization). Nullable union: manifest lists
        # written before this field — and writers that don't compute
        # summaries — read back as null and are simply never pruned.
        {
            "name": "partitions",
            "field-id": 507,
            "type": [
                "null",
                {
                    "type": "array",
                    "items": {
                        "type": "record",
                        "name": "r508",
                        "fields": [
                            # spec summaries are POSITIONAL per spec_id;
                            # carrying the field name instead keeps
                            # pruning correct across partition-spec
                            # evolution without a spec_id->layout
                            # resolution table (documented deviation,
                            # same class as the JSON bound encoding)
                            {"name": "name", "type": "string"},
                            {"name": "contains_null", "type": "boolean",
                             "field-id": 509},
                            {"name": "lower_bound",
                             "type": ["null", "string"],
                             "field-id": 510},
                            {"name": "upper_bound",
                             "type": ["null", "string"],
                             "field-id": 511},
                        ],
                    },
                },
            ],
        },
    ],
}


def partition_summaries(
    entries: list[dict], part_fields: list[tuple[str, str]]
) -> list[dict] | None:
    """spec-507 field summaries for the entries going into ONE
    manifest: per partition field, contains_null plus JSON-encoded
    min/max over the live entries' partition values. None for
    unpartitioned tables (nothing to prune on)."""
    if not part_fields:
        return None
    out = []
    for name, _t in part_fields:
        lo = hi = None
        has_null = False
        for e in entries:
            if e["status"] == STATUS_DELETED:
                continue
            v = e["data_file"]["partition"].get(name)
            if v is None:
                has_null = True
                continue
            lo = v if lo is None or v < lo else lo
            hi = v if hi is None or v > hi else hi
        out.append(
            {
                "name": name,
                "contains_null": has_null,
                "lower_bound": None if lo is None else json.dumps(lo),
                "upper_bound": None if hi is None else json.dumps(hi),
            }
        )
    return out

STATUS_EXISTING, STATUS_ADDED, STATUS_DELETED = 0, 1, 2
CONTENT_DATA, CONTENT_POS_DELETES, CONTENT_EQ_DELETES = 0, 1, 2


#: iceberg primitive -> spark simpleString (inverse of _TYPE_MAP; both
#: timestamp flavors honored)
_ICE2SPARK = {
    "long": "bigint",
    "int": "int",
    "double": "double",
    "float": "float",
    "string": "string",
    "boolean": "boolean",
    "date": "date",
    "timestamp": "timestamp_ntz",
    "timestamptz": "timestamp",
    "binary": "binary",
}


#: the spec's allowed primitive type promotions (schema evolution):
#: values written under the narrower type up-cast losslessly at read
_ICE_PROMOTIONS = {("int", "long"), ("float", "double")}


def _ice_types_by_id(md: dict) -> dict[int, str]:
    """field id -> iceberg type across every schema version (ids are
    never reused, so the union is unambiguous; later versions win for
    type widenings)."""
    out: dict[int, str] = {}
    for hist in md.get("schemas", []):
        for f in hist["fields"]:
            out[f["id"]] = f["type"]
    for f in md["schema"]["fields"]:
        out[f["id"]] = f["type"]
    return out


def _source_ice_type(md: dict, f: dict) -> str | None:
    """The iceberg type of a partition field's SOURCE column —
    resolved by source-id (rename-safe); legacy identity fields
    without a usable id fall back to name lookup."""
    by_id = _ice_types_by_id(md)
    t = by_id.get(f.get("source-id"))
    if t is not None:
        return t
    names = {x["name"]: x["type"] for x in md["schema"]["fields"]}
    for hist in md.get("schemas", []):
        for x in hist["fields"]:
            names.setdefault(x["name"], x["type"])
    return names.get(f["name"])


def all_spec_part_fields(md: dict) -> list[tuple[str, str]]:
    """(field name, avro type) for EVERY partition field across every
    spec version the table has had — the manifest entry's partition
    record must encode old-spec entries carried forward after
    partition-spec evolution (absent keys -> null). Transformed
    fields (bucket/temporal) encode as int; identity/truncate keep
    the source's avro type."""
    from .iceberg_transforms import parse_transform

    seen: dict[str, str] = {}
    for spec in md.get("partition-specs", []):
        for f in spec.get("fields", []):
            nm = f["name"]
            if nm in seen:
                continue
            word, _param = parse_transform(
                f.get("transform", "identity")
            )
            if word in ("identity", "truncate"):
                src_t = _source_ice_type(md, f)
                if src_t is None:
                    continue
                seen[nm] = _PART_AVRO[_ICE2SPARK[src_t]]
            else:
                seen[nm] = "int"
    return list(seen.items())


def stored_part_fields(md: dict, all_specs: bool = False) -> list[dict]:
    """Partition-field dicts ({'name','transform','source'}) from the
    stored spec JSON — the default spec, or the union over every spec
    version (``all_specs``, for pruning against carried-forward
    entries). Source names resolve by source-id through the CURRENT
    schema, so renamed source columns keep working."""
    by_id = {f["id"]: f["name"] for f in md["schema"]["fields"]}
    specs = md.get("partition-specs", [])
    if not all_specs and specs:
        specs = [specs[md.get("default-spec-id", 0)]]
    out, seen = [], set()
    for spec in specs:
        for f in spec.get("fields", []):
            if f["name"] in seen:
                continue
            seen.add(f["name"])
            src = by_id.get(f.get("source-id")) or f["name"]
            out.append(
                {
                    "name": f["name"],
                    "transform": f.get("transform", "identity"),
                    "source": src,
                }
            )
    return out


def next_sequence_number(md: dict) -> int:
    """The data sequence number the NEXT snapshot commits with (spec
    v2: ``last-sequence-number`` + 1). Pre-r10 metadata without the
    field seeds from the snapshot count (each snapshot here advanced
    the sequence exactly once)."""
    last = md.get("last-sequence-number")
    if last is None:
        last = len(md.get("snapshots", []))
    return last + 1


def seq_of_snapshot(md: dict, snapshot_id: int) -> int:
    """A snapshot's data sequence number — explicit when stamped,
    else its 1-based ordinal in the snapshot list (the order our
    commits advanced the sequence). Expired snapshots resolve through
    the tombstone map expire_snapshots records."""
    for i, s in enumerate(md.get("snapshots", [])):
        if s["snapshot-id"] == snapshot_id:
            return s.get("sequence-number", i + 1)
    tomb = md.get("expired-snapshot-meta", {}).get(str(snapshot_id))
    if tomb and tomb.get("sequence-number") is not None:
        return tomb["sequence-number"]
    raise ValueError(f"snapshot {snapshot_id} not in metadata")


def _spark_schema_from_md(md: dict, schema_id: int | None = None):
    """Spark StructType for an Iceberg schema — the explicit read
    schema that makes schema evolution sound: files written before a
    column existed serve typed NULLs instead of whatever one parquet
    footer happens to say. ``schema_id`` selects a historical schema
    from the metadata's ``schemas`` list (spec: snapshots record the
    schema current when they were written); None means current."""
    from pyspark.sql.types import StructType

    ice_schema = md["schema"]
    if schema_id is not None:
        for s in md.get("schemas", []):
            if s.get("schema-id") == schema_id:
                ice_schema = s
                break
        else:
            if ice_schema.get("schema-id", 0) != schema_id:
                raise ValueError(
                    f"schema-id {schema_id} not in metadata "
                    f"(have {[s.get('schema-id') for s in md.get('schemas', [])]})"
                )
    return _spark_struct_of(ice_schema)


def _spark_type_str(ice_type) -> str:
    if isinstance(ice_type, str) and ice_type.startswith("decimal"):
        return ice_type.replace(" ", "")
    return _ICE2SPARK[ice_type]


def _spark_struct_of(ice_schema: dict):
    from pyspark.sql.types import StructType

    parts = [
        f"{f['name']} {_spark_type_str(f['type'])}"
        for f in ice_schema["fields"]
    ]
    return StructType.fromDDL(", ".join(parts))


def ice_schema_by_id(md: dict, sid: int) -> dict:
    """The Iceberg schema dict with ``schema-id == sid`` from the
    metadata's ``schemas`` list (falling back to the current schema
    for pre-r10 metadata without the list)."""
    for s in md.get("schemas", []):
        if s.get("schema-id") == sid:
            return s
    if md["schema"].get("schema-id", 0) == sid:
        return md["schema"]
    raise ValueError(
        f"schema-id {sid} not in metadata "
        f"(have {[s.get('schema-id') for s in md.get('schemas', [])]})"
    )


def entry_schema_id(md: dict, entry: dict) -> int:
    """The schema-id a manifest entry's data file was WRITTEN with —
    resolved through its adding snapshot (stamped since r10); entries
    from unstamped snapshots default to the current schema (safe:
    rename/drop did not exist before stamping)."""
    for snap in md.get("snapshots", []):
        if snap["snapshot-id"] == entry["snapshot_id"]:
            if "schema-id" in snap:
                return snap["schema-id"]
            break
    tomb = md.get("expired-snapshot-meta", {}).get(
        str(entry["snapshot_id"])
    )
    if tomb and tomb.get("schema-id") is not None:
        return tomb["schema-id"]
    return md.get("current-schema-id", md["schema"].get("schema-id", 0))


def _iceberg_schema(df: DataFrame) -> dict:
    fields = []
    for i, f in enumerate(df.schema.fields, start=1):
        t = f.dataType.simpleString()
        if t.startswith("decimal"):
            ice = t.replace(",", ", ")  # 'decimal(p, s)' spelling
        elif t in _TYPE_MAP:
            ice = _TYPE_MAP[t]
        else:
            raise ValueError(
                f"column {f.name}: type {t} not in the v1 subset this "
                "writer supports"
            )
        fields.append(
            {
                "id": i,
                "name": f.name,
                "required": not f.nullable,
                "type": ice,
            }
        )
    return {"type": "struct", "schema-id": 0, "fields": fields}


class IcebergTable:
    """Iceberg v1 table at a posix ``location`` (HadoopCatalog-style:
    the ``metadata/version-hint.text`` pointer is the commit)."""

    def __init__(self, spark: SparkSession, location: str):
        self.spark = spark
        self.location = location
        self._part_cols_new: list[str] = []
        self.meta_dir = os.path.join(location, "metadata")
        self.data_dir = os.path.join(location, "data")
        os.makedirs(self.meta_dir, exist_ok=True)
        os.makedirs(self.data_dir, exist_ok=True)

    # ----------------------------- metadata ------------------------------

    def _current_version(self) -> int | None:
        """max(version-hint, newest vN.metadata.json on disk): the
        hint is best-effort under concurrent writers (two hint swaps
        can land out of order), but metadata files are put-if-absent,
        so the directory scan is authoritative — exactly how Iceberg's
        HadoopCatalog treats a stale hint."""
        cands = []
        hint = os.path.join(self.meta_dir, "version-hint.text")
        if os.path.exists(hint):
            cands.append(int(open(hint).read().strip()))
        for f in os.listdir(self.meta_dir):
            if f.startswith("v") and f.endswith(".metadata.json"):
                stem = f[1:-len(".metadata.json")]
                if stem.isdigit():
                    cands.append(int(stem))
        return max(cands) if cands else None

    def _metadata(self, version: int | None = None) -> dict:
        v = version if version is not None else self._current_version()
        if v is None:
            raise ValueError(f"no iceberg table at {self.location}")
        return json.load(
            open(os.path.join(self.meta_dir, f"v{v}.metadata.json"))
        )

    def history(self) -> list[dict]:
        md = self._metadata()
        return [
            {
                "snapshot_id": s["snapshot-id"],
                "timestamp_ms": s["timestamp-ms"],
                "operation": s.get("summary", {}).get("operation"),
            }
            for s in md["snapshots"]
        ]

    # ------------------------------ reading ------------------------------

    def _entries(
        self,
        snapshot_id: int | None = None,
        content: int = CONTENT_DATA,
        manifest_pred=None,
    ) -> list[dict]:
        """Manifest entries of the requested ``content`` kind (0 data,
        1 position deletes); manifest lists written before the content
        field default to data. ``manifest_pred`` (r12) is a driver
        predicate over the manifest-list row — ``read_hidden`` passes
        one built from the spec-507 partition summaries, so manifests
        whose partition range provably misses the query are SKIPPED
        BEFORE DECODE: on a sharded table the first-plan decode cost is
        O(matching manifests), not O(table). Rows without summaries
        (pre-r12 lists, delete manifests) are never pruned."""
        md = self._metadata()
        sid = (
            snapshot_id
            if snapshot_id is not None
            else md.get("current-snapshot-id")
        )
        snap = next(
            (s for s in md["snapshots"] if s["snapshot-id"] == sid), None
        )
        if snap is None:
            raise ValueError(
                f"snapshot {sid} not found (have "
                f"{[s['snapshot-id'] for s in md['snapshots']]})"
            )
        # manifests are immutable — the stat-keyed decode cache makes
        # repeated planning O(1) after the first decode (measured
        # ~30 us/entry pure-python decode; tools/
        # manifest_planning_bench.py). Decoded records are READ-ONLY
        # by contract: commit paths build fresh wrapper dicts.
        _, manifests = read_ocf_cached(snap["manifest-list"])
        entries: list[dict] = []
        for m in manifests:
            if m.get("content", CONTENT_DATA) != content:
                continue
            if manifest_pred is not None and not manifest_pred(m):
                continue
            _, es = read_ocf_cached(m["manifest_path"])
            entries.extend(es)
        return entries

    def _live_delete_files(
        self, snapshot_id: int | None = None
    ) -> list[dict]:
        """Live POSITION-delete files (delete-manifest entries whose
        file content is 1); equality deletes (content 2) ride the same
        manifests but apply by key+sequence — see
        ``_live_eq_delete_entries``."""
        return [
            e["data_file"]
            for e in self._entries(
                snapshot_id, content=CONTENT_POS_DELETES
            )
            if e["status"] != STATUS_DELETED
            and e["data_file"].get("content", CONTENT_POS_DELETES)
            == CONTENT_POS_DELETES
        ]

    def _live_eq_delete_entries(
        self, snapshot_id: int | None = None
    ) -> list[dict]:
        """Live EQUALITY-delete manifest entries (full entries — the
        adding snapshot_id carries the delete's data sequence
        number)."""
        return [
            e
            for e in self._entries(
                snapshot_id, content=CONTENT_POS_DELETES
            )
            if e["status"] != STATUS_DELETED
            and e["data_file"].get("content") == CONTENT_EQ_DELETES
        ]

    def _scan_files(
        self, paths: list[str], delete_files: list[dict], schema=None
    ) -> DataFrame:
        """Scan data files applying v2 position-delete files: the
        delete parquet's (file_path, pos) pairs drop rows via
        ``_metadata.row_index`` and ONE anti-join keyed on
        (file BASENAME, position). Basenames are fresh writer UUIDs
        (the same contract the DML scans rely on), so joining on them
        needs no path-normalization map AND lets the delete-touched
        files ride ONE multi-path scan instead of O(files) per-file
        plan pieces; untouched files take the plain fast scan. The
        anti-join broadcasts the pair set only while the manifests'
        summed ``record_count`` stays under
        POS_DELETE_BROADCAST_MAX_PAIRS — a heavily-deleted table
        falls back to a shuffled anti-join instead of shipping every
        pair to every executor (r10 verdict: this threshold guarded
        the DML and eq-delete paths but not plain ``read()``)."""
        from pyspark.sql import functions as F

        if not paths:
            raise ValueError("empty snapshot")
        if schema is None:
            schema = _spark_schema_from_md(self._metadata())

        def _mapped_scan(ps, extra_cols=()):
            """One multi-path scan honoring the table's
            ``schema.name-mapping.default`` property (spec name
            mapping): files storing PHYSICAL column names — a
            column-mapped Delta table under a UniForm mirror — scan
            under their physical schema and alias back to the logical
            names; tables without the property scan directly.
            ``extra_cols`` are (name, expr) pairs computed BEFORE the
            aliasing select (the delete-touched branch's basename /
            row-index columns — they must survive the mapping)."""
            nm_raw = (
                self._metadata()
                .get("properties", {})
                .get("schema.name-mapping.default")
            )
            if not nm_raw:
                df = self.spark.read.schema(schema).parquet(*ps)
                for nm, ex in extra_cols:
                    df = df.withColumn(nm, ex)
                return df
            id2phys = {
                m["field-id"]: m["names"][0] for m in json.loads(nm_raw)
            }
            name2id = {
                f["name"]: f["id"]
                for f in self._metadata()["schema"]["fields"]
            }
            from pyspark.sql.types import StructField, StructType as _ST

            phys = {
                f.name: id2phys.get(name2id.get(f.name), f.name)
                for f in schema.fields
            }
            scan_struct = _ST(
                [
                    StructField(phys[f.name], f.dataType, True)
                    for f in schema.fields
                ]
            )
            df = self.spark.read.schema(scan_struct).parquet(*ps)
            for nm, ex in extra_cols:
                df = df.withColumn(nm, ex)
            return df.select(
                *[
                    F.col(phys[f.name]).alias(f.name)
                    for f in schema.fields
                ],
                *[F.col(nm) for nm, _ in extra_cols],
            )

        def _plain_scan(ps):
            return _mapped_scan(ps)

        if not delete_files:
            return _plain_scan(paths)
        pairs = self.spark.read.parquet(
            *[d["file_path"] for d in delete_files]
        ).select(
            F.element_at(
                F.split(F.col("file_path"), "/"), -1
            ).alias("__ice_name"),
            F.col("pos").alias("__ice_pos"),
        )
        # O(touched files) driver metadata — which data files any
        # delete names; the rest never pay the join
        hit = {
            r["__ice_name"]
            for r in pairs.select("__ice_name").distinct().collect()
        }
        parts = []
        plain = [p for p in paths if os.path.basename(p) not in hit]
        if plain:
            parts.append(_plain_scan(plain))
        touched = [p for p in paths if os.path.basename(p) in hit]
        if touched:
            # the mapped scan computes the join keys BEFORE aliasing so
            # a column-mapped table (UniForm mirror with DVs) applies
            # its deletes against the logical columns
            u = _mapped_scan(
                touched,
                extra_cols=(
                    (
                        "__ice_name",
                        F.element_at(
                            F.split(
                                F.col("_metadata.file_path"), "/"
                            ),
                            -1,
                        ),
                    ),
                    ("__ice_pos", F.col("_metadata.row_index")),
                ),
            )
            from .iceberg_deletes import POS_DELETE_BROADCAST_MAX_PAIRS

            total = sum(
                d.get("record_count", 0) for d in delete_files
            )
            if total <= POS_DELETE_BROADCAST_MAX_PAIRS:
                pairs = F.broadcast(pairs)
            else:
                # the manifests DECLARE the pair cardinality — force a
                # shuffled join rather than letting file-size stats
                # auto-broadcast a set the threshold says is too big
                pairs = pairs.hint("shuffle_hash")
            u = u.join(
                pairs, ["__ice_name", "__ice_pos"], "left_anti"
            ).drop("__ice_name", "__ice_pos")
            parts.append(u)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def _aligned_group_scan(
        self, entries, pos_deletes, schema, part_consts: bool
    ) -> DataFrame:
        """One write-time-schema group's scan. Without partition
        constants: one multi-path scan. With them: one scan per
        distinct partition-value tuple, the tuple's values overwriting
        the (file-absent) identity partition columns as typed
        literals — the same plan shape as the Delta reader's own
        partitioned scan (delta_log._read_adds), O(distinct tuples)
        plan pieces."""
        if not part_consts:
            return self._scan_files(
                [e["data_file"]["file_path"] for e in entries],
                pos_deletes,
                schema=schema,
            )
        types = {f.name: f.dataType.simpleString() for f in schema.fields}
        by_part: dict[tuple, list[str]] = {}
        for e in entries:
            pv = e["data_file"]["partition"]
            key = tuple(sorted(pv.items(), key=lambda kv: kv[0]))
            by_part.setdefault(key, []).append(
                e["data_file"]["file_path"]
            )
        parts = []
        for key, ps in sorted(
            by_part.items(),
            key=lambda kv: tuple(
                (k, v is not None, v) for k, v in kv[0]
            ),
        ):
            df = self._scan_files(ps, pos_deletes, schema=schema)
            for col, val in key:
                if col not in types:
                    continue
                lit = (
                    F.lit(None) if val is None else F.lit(val)
                ).cast(types[col])
                df = df.withColumn(col, lit)
            parts.append(df.select(*[f.name for f in schema.fields]))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def _aligned_scan(
        self,
        md: dict,
        data_entries: list[dict],
        pos_deletes: list[dict],
        target_sid: int,
    ) -> DataFrame:
        """Scan data entries possibly written under DIFFERENT schema
        versions: ONE multi-path scan per distinct write-time
        schema-id, each aligned to the target schema BY FIELD ID —
        renamed columns resolve to their historical physical names,
        dropped-then-unknown ids are ignored, later-added fields read
        as typed NULLs. The rename-safe read path Iceberg's field-id
        contract exists for."""
        target = ice_schema_by_id(md, target_sid)
        # spec: identity partition fields ABSENT from the data files
        # serve the manifest's partition value as a per-file constant
        # (real readers apply this under name mapping — a UniForm
        # mirror over a hive-partitioned Delta table is the case).
        # Gated by the table property so native tables, which keep the
        # source column IN the files, never pay the per-tuple grouping.
        part_consts = (
            md.get("properties", {}).get("uniform.partition-constants")
            == "true"
        )
        groups: dict[int, list[dict]] = {}
        for e in data_entries:
            groups.setdefault(entry_schema_id(md, e), []).append(e)
        parts = []
        for sid in sorted(groups):
            ice = ice_schema_by_id(md, sid)
            df = self._aligned_group_scan(
                groups[sid],
                pos_deletes,
                _spark_struct_of(ice),
                part_consts,
            )
            if sid != target_sid or ice is not target:
                by_id = {
                    f["id"]: f["name"] for f in ice["fields"]
                }
                cols = []
                for f in target["fields"]:
                    t = _spark_type_str(f["type"])
                    nm = by_id.get(f["id"])
                    if nm is None:
                        cols.append(
                            F.lit(None).cast(t).alias(f["name"])
                        )
                    else:
                        cols.append(
                            F.col(nm).cast(t).alias(f["name"])
                        )
                df = df.select(*cols)
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def _target_schema_id(self, md, snapshot_id: int | None) -> int:
        """The schema-id a read should surface: the snapshot's own
        (time travel) or the current one."""
        cur = md.get(
            "current-schema-id", md["schema"].get("schema-id", 0)
        )
        if snapshot_id is None:
            return cur
        for s in md["snapshots"]:
            if s["snapshot-id"] == snapshot_id:
                return s.get("schema-id", cur)
        return cur

    def _eq_cols_of(self, md: dict, eq_entry: dict) -> tuple:
        """Column names an equality-delete file keys on (spec
        ``equality_ids`` are schema field ids)."""
        by_id = {f["id"]: f["name"] for f in md["schema"]["fields"]}
        return tuple(
            by_id[i] for i in eq_entry["data_file"]["equality_ids"]
        )

    def _scan_with_eq_deletes(
        self, data_entries, pos_deletes, eq_entries, target_sid=None
    ) -> DataFrame:
        """Apply v2 EQUALITY deletes on top of the position-delete
        scan, honoring sequence-number applicability: an equality
        delete masks only rows in data files whose data sequence
        number is STRICTLY LESS than the delete's (spec — a delete
        must not mask rows added after it). Data files are grouped by
        which deletes apply (O(distinct delete seqs) groups, each one
        field-id-aligned multi-path scan); each group anti-joins the
        applicable key sets with null-safe equality (spec: null
        matches null), broadcast when small."""
        md = self._metadata()
        if target_sid is None:
            target_sid = self._target_schema_id(md, None)
        eq_with_seq = [
            (e, seq_of_snapshot(md, e["snapshot_id"]))
            for e in eq_entries
        ]
        groups: dict[tuple, list[dict]] = {}
        for e in data_entries:
            fseq = seq_of_snapshot(md, e["snapshot_id"])
            sig = tuple(
                sorted(
                    i
                    for i, (_d, dseq) in enumerate(eq_with_seq)
                    if dseq > fseq
                )
            )
            groups.setdefault(sig, []).append(e)
        parts = []
        for sig, sub_entries in sorted(
            groups.items(), key=lambda kv: kv[0]
        ):
            df = self._aligned_scan(
                md, sub_entries, pos_deletes, target_sid
            )
            by_cols: dict[tuple, list[dict]] = {}
            for i in sig:
                d = eq_with_seq[i][0]["data_file"]
                by_cols.setdefault(
                    self._eq_cols_of(md, eq_with_seq[i][0]), []
                ).append(d)
            for cols, dfiles in by_cols.items():
                # key files store their WRITE-TIME column names (fixed
                # equality_ids order), so each distinct write schema
                # rides ONE multi-path read positional-renamed to the
                # current names — plan pieces O(distinct schemas), not
                # O(key files); grouping needs only footer reads
                # (O(files) driver metadata, no data scanned)
                import pyarrow.parquet as pq

                by_names: dict[tuple, list[str]] = {}
                for d in dfiles:
                    names = tuple(
                        pq.read_schema(d["file_path"]).names
                    )
                    by_names.setdefault(names, []).append(
                        d["file_path"]
                    )
                keys = None
                for _names, fps in sorted(by_names.items()):
                    k = self.spark.read.parquet(*fps).toDF(*cols)
                    keys = k if keys is None else keys.unionByName(k)
                keys = keys.dropDuplicates().alias("__eqk")
                total = sum(d.get("record_count", 0) for d in dfiles)
                from .iceberg_deletes import (
                    POS_DELETE_BROADCAST_MAX_PAIRS,
                )

                if total <= POS_DELETE_BROADCAST_MAX_PAIRS:
                    keys = F.broadcast(keys)
                cond = None
                t = df.alias("__eqt")
                for c in cols:
                    piece = F.col(f"__eqt.{c}").eqNullSafe(
                        F.col(f"__eqk.{c}")
                    )
                    cond = piece if cond is None else (cond & piece)
                df = t.join(keys, cond, "left_anti")
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def read(self, snapshot_id: int | None = None) -> DataFrame:
        md = self._metadata()
        target_sid = self._target_schema_id(md, snapshot_id)
        data_entries = [
            e
            for e in self._entries(snapshot_id)
            if e["status"] != STATUS_DELETED
        ]
        pos_dels = self._live_delete_files(snapshot_id)
        eq_entries = self._live_eq_delete_entries(snapshot_id)
        if eq_entries:
            return self._scan_with_eq_deletes(
                data_entries, pos_dels, eq_entries, target_sid
            )
        return self._aligned_scan(
            md, data_entries, pos_dels, target_sid
        )

    def added_files(self, since_snapshot_id: int) -> list[dict]:
        """Data files ADDED by snapshots after ``since_snapshot_id`` —
        manifest-entry status attribution, no file-set diffing.
        Snapshot ids are random (spec), so "after" resolves through the
        snapshot list's order, never numeric comparison."""
        ordered = [s["snapshot-id"] for s in self._metadata()["snapshots"]]
        if since_snapshot_id not in ordered:
            raise ValueError(f"unknown snapshot {since_snapshot_id}")
        later = ordered[ordered.index(since_snapshot_id) + 1:]
        out: list[dict] = []
        # each later snapshot's OWN manifest marks its files ADDED (the
        # head manifest demotes older files to EXISTING, so a single
        # head scan would under-report)
        for sid in later:
            out.extend(
                e["data_file"]
                for e in self._entries(snapshot_id=sid)
                if e["status"] == STATUS_ADDED and e["snapshot_id"] == sid
            )
        return out

    def read_appended_since(self, snapshot_id: int) -> DataFrame:
        added = [f["file_path"] for f in self.added_files(snapshot_id)]
        if not added:
            return self.read().filter("1 = 0")
        return self.spark.read.schema(
            _spark_schema_from_md(self._metadata())
        ).parquet(*added)

    # ------------------------------ writing ------------------------------

    def _part_fields_of(
        self, part_cols: list[str], df: DataFrame
    ) -> list[dict]:
        """Resolve write-time partition arguments into field dicts.
        Elements may be spec strings (``day(ts)``, ``bucket(8, id)``,
        plain identity column names) or — for existing tables — the
        stored partition FIELD names (``ts_day``), which DML call
        sites pass through from the metadata."""
        from .iceberg_transforms import (
            parse_partition_spec,
            unparse_partition_spec,
        )

        if self._current_version() is None:
            return [parse_partition_spec(c) for c in part_cols]
        stored = stored_part_fields(self._metadata())
        by_name = {f["name"]: f for f in stored}
        by_canon = {unparse_partition_spec(f): f for f in stored}
        out = []
        for el in part_cols:
            if el in by_name:
                out.append(by_name[el])
                continue
            canon = unparse_partition_spec(parse_partition_spec(el))
            if canon not in by_canon:
                raise ValueError(
                    f"partition element {el!r} does not match the "
                    f"table spec {sorted(by_canon)}"
                )
            out.append(by_canon[canon])
        return out

    def _write_data(
        self, df: DataFrame, part_cols: list[str]
    ) -> list[dict]:
        """Write parquet data files. Partition values are computed as
        layout columns (identity duplicates the source column —
        Iceberg's contract keeps the source IN the data file, unlike
        hive/Delta layouts; transforms derive bucket/truncate/temporal
        ordinals JVM-side via iceberg_transforms); partition values
        land in the manifest entries typed, parsed back from the hive
        dir names by the transform's RESULT type."""
        from urllib.parse import unquote

        import pyarrow.parquet as pq

        from .iceberg_bounds import collect_bounds
        from .iceberg_transforms import (
            add_transform_column,
            result_spark_type,
        )

        staging = os.path.join(
            self.location, f"_staging_{uuid.uuid4().hex}"
        )
        types = {
            f.name: f.dataType.simpleString() for f in df.schema.fields
        }
        # per-column iceberg types + field ids for footer bounds
        # (iceberg_bounds): existing tables resolve through the stored
        # schema (ids are rename-stable); a table being created uses
        # positional ids, matching _iceberg_schema's assignment. A
        # batch column not yet in the schema (mergeSchema append) just
        # records no bounds this commit.
        if self._current_version() is not None:
            sch = self._metadata()["schema"]
            bound_ids = {f["name"]: f["id"] for f in sch["fields"]}
            bound_types = {
                f["name"]: f["type"]
                for f in sch["fields"]
                if isinstance(f["type"], str)
            }
        else:
            bound_ids = {
                f.name: i + 1 for i, f in enumerate(df.schema.fields)
            }
            bound_types = {
                f.name: _TYPE_MAP[f.dataType.simpleString()]
                for f in df.schema.fields
                if f.dataType.simpleString() in _TYPE_MAP
            }

        fields = self._part_fields_of(part_cols, df)
        result_types: dict[str, str] = {}
        w = df
        for i, fld in enumerate(fields):
            src_t = types.get(fld["source"])
            if src_t is None:
                raise ValueError(
                    f"partition source column {fld['source']!r} not in "
                    "batch"
                )
            w = add_transform_column(
                w, fld, f"__p_{fld['name']}", src_t
            )
            result_types[fld["name"]] = result_spark_type(
                fld["transform"], src_t
            )
        sort_cols = list(getattr(self, "_write_sort", None) or [])
        if fields and not getattr(self, "_write_presharded", False):
            # hash-distribute on the partition layout columns before a
            # partitioned write — Iceberg's write.distribution-mode=hash.
            # Without it every input task opens one writer PER partition
            # value it holds (sequentially, post the planned-write sort):
            # values >> tasks turns the write into a serial
            # open/close-parquet-writer loop (measured 4.0 s -> 1.3 s on
            # the 240-partition day x bucket(8) events write at sf0.1,
            # combined with raw local FS). One value lands in exactly one
            # task, so each partition value emits exactly one file.
            from ..session import write_dist_partitions

            w = w.repartition(
                write_dist_partitions(self.spark),
                *[f"__p_{f['name']}" for f in fields],
            )
        if sort_cols:
            # sort INSIDE each task, partition-layout columns leading —
            # the partitioned-file writer requires ordering by its
            # partition columns and would otherwise insert its own
            # sort, destroying the data order (and the tight bounds
            # sorted files exist for)
            w = w.sortWithinPartitions(
                *[f"__p_{f['name']}" for f in fields], *sort_cols
            )
        writer = w.write.mode("overwrite")
        if fields:
            writer = writer.partitionBy(
                *[f"__p_{f['name']}" for f in fields]
            )
        writer.parquet(staging)

        def parse(col: str, raw: str):
            if raw == "__HIVE_DEFAULT_PARTITION__":
                return None
            raw = unquote(raw)
            t = result_types[col]
            if t in ("int", "bigint", "smallint", "tinyint"):
                return int(raw)
            if t in ("double", "float"):
                return float(raw)
            if t == "boolean":
                return raw == "true"
            return raw

        files = []
        for root, _dirs, fnames in os.walk(staging):
            rel_dir = os.path.relpath(root, staging)
            pvals: dict = {}
            if rel_dir != ".":
                for seg in rel_dir.split(os.sep):
                    k, _, raw = seg.partition("=")
                    pvals[k[len("__p_"):]] = parse(
                        k[len("__p_"):], raw
                    )
            for fname in sorted(fnames):
                if not fname.endswith(".parquet"):
                    continue
                src = os.path.join(root, fname)
                n_rows = pq.read_metadata(src).num_rows
                if n_rows == 0:
                    continue  # never commit empty part files
                dst = os.path.join(
                    self.data_dir, f"{uuid.uuid4().hex}.parquet"
                )
                os.replace(src, dst)
                entry = {
                    "file_path": dst,
                    "file_format": "PARQUET",
                    "partition": dict(pvals),
                    "record_count": n_rows,
                    "file_size_in_bytes": os.path.getsize(dst),
                    "block_size_in_bytes": 64 * 1024 * 1024,
                }
                lo_b, hi_b = collect_bounds(dst, bound_types)
                if lo_b:
                    entry["lower_bounds"] = [
                        {"key": bound_ids[c], "value": b}
                        for c, b in sorted(lo_b.items())
                        if c in bound_ids
                    ]
                    entry["upper_bounds"] = [
                        {"key": bound_ids[c], "value": b}
                        for c, b in sorted(hi_b.items())
                        if c in bound_ids
                    ]
                files.append(entry)
        for root, dirs, fnames in os.walk(staging, topdown=False):
            for fname in fnames:
                os.remove(os.path.join(root, fname))
            for d in dirs:
                os.rmdir(os.path.join(root, d))
        os.rmdir(staging)
        return files

    def _commit(
        self,
        df: DataFrame,
        new_files: list[dict],
        operation: str,
        schema_update: dict | None = None,
    ) -> int:
        """Optimistic concurrency: the vN.metadata.json publish is
        put-if-absent (os.link), so two writers racing for the same
        version serialize — the loser rebuilds its manifests against
        the NEW head and retries (appends/overwrites commute; a
        schema-evolving commit surfaces ConcurrentCommitError instead,
        since its merged schema was computed against a stale head)."""
        from .tables import ConcurrentCommitError

        for attempt in range(8):
            try:
                return self._commit_once(
                    df, new_files, operation, schema_update
                )
            except ConcurrentCommitError:
                if schema_update is not None:
                    raise
                time.sleep(0.02 * (attempt + 1))
        raise ConcurrentCommitError(
            f"{operation} lost the metadata race 8 times; giving up"
        )

    def _commit_once(
        self,
        df: DataFrame,
        new_files: list[dict],
        operation: str,
        schema_update: dict | None = None,
    ) -> int:
        cur = self._current_version()
        snapshot_id = int(uuid.uuid4().int % (1 << 62))
        now = int(time.time() * 1000)
        # MANIFEST REUSE (r12, how real Iceberg appends work): carry
        # the parent snapshot's manifest-list rows VERBATIM — manifests
        # are immutable, so referencing them costs nothing — and write
        # ONE new manifest holding only this commit's added files.
        # Append cost becomes O(added), not O(table); snapshots
        # accumulate naturally SHARDED manifests (one per commit) whose
        # spec-507 partition summaries let readers prune whole
        # manifests before decoding. Entries in reused manifests keep
        # their original status/snapshot_id, which is exactly what
        # added_files/changelog attribution (status==ADDED and
        # snapshot_id==sid) and eq-delete sequence resolution key on;
        # DELETED entries riding along are filtered by every reader.
        # This also subsumes the old delete-manifest carry: content=1
        # rows ride the same reuse.
        carried_mrows: list[dict] = []
        if operation == "append" and cur is not None:
            md0 = self._metadata()
            cur_sid = md0.get("current-snapshot-id")
            snap0 = next(
                (
                    s
                    for s in md0["snapshots"]
                    if s["snapshot-id"] == cur_sid
                ),
                None,
            )
            if snap0 is not None:
                _, prior = read_ocf_cached(snap0["manifest-list"])
                carried_mrows = [
                    {
                        **{
                            k: m.get(k)
                            for k in (
                                "manifest_path",
                                "manifest_length",
                                "added_snapshot_id",
                            )
                        },
                        "partition_spec_id": m.get(
                            "partition_spec_id", 0
                        ),
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
                    for m in prior
                ]
        entries = [
            {
                "status": STATUS_ADDED,
                "snapshot_id": snapshot_id,
                "data_file": f,
            }
            for f in new_files
        ]
        override_pf = getattr(self, "_part_fields_override", None)
        if override_pf is not None:
            # full-state writers that also evolve the spec (UniForm
            # rename sync) declare the exact partition record shape —
            # nothing is carried, so no old-spec names are needed
            part_fields = list(override_pf)
        elif cur is not None:
            # union of ALL spec versions' fields: carried entries keep
            # their old-spec partition values after spec evolution
            part_fields = all_spec_part_fields(self._metadata())
        else:
            from .iceberg_transforms import (
                parse_partition_spec,
                result_spark_type,
            )

            dft = {
                f.name: f.dataType.simpleString()
                for f in df.schema.fields
            }
            part_fields = []
            for el in self._part_cols_new:
                fld = parse_partition_spec(el)
                if fld["source"] not in dft:
                    raise ValueError(
                        f"partition column {fld['source']} not in schema"
                    )
                part_fields.append(
                    (
                        fld["name"],
                        _PART_AVRO[
                            result_spark_type(
                                fld["transform"], dft[fld["source"]]
                            )
                        ],
                    )
                )
        manifest_path = os.path.join(
            self.meta_dir, f"snap-{snapshot_id}-m0.avro"
        )
        write_ocf(
            manifest_path, manifest_entry_schema(part_fields), entries
        )
        spec_id = (
            self._metadata().get("default-spec-id", 0)
            if cur is not None
            else 0
        )
        # carried rows FIRST (timeline order), then this commit's own
        # manifest. Live position-delete manifests ride the carry —
        # the pre-r12 decode-and-re-encode delete carry is subsumed.
        mrows = carried_mrows + [
            {
                "manifest_path": manifest_path,
                "manifest_length": os.path.getsize(manifest_path),
                "partition_spec_id": spec_id,
                "added_snapshot_id": snapshot_id,
                "added_data_files_count": len(new_files),
                "existing_data_files_count": 0,
                "deleted_data_files_count": 0,
                "content": CONTENT_DATA,
                "partitions": partition_summaries(entries, part_fields),
            }
        ]
        # hook for full-state writers that carry position-delete files
        # (the UniForm mirror translating Delta deletion vectors): one
        # delete manifest beside the data manifest, format-version 2
        extra_dels = getattr(self, "_delete_files_extra", None)
        if extra_dels:
            from .iceberg_deletes import DELETE_MANIFEST_ENTRY_SCHEMA

            del_entries = [
                {
                    "status": STATUS_ADDED,
                    "snapshot_id": snapshot_id,
                    "data_file": d,
                }
                for d in extra_dels
            ]
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
                    "added_data_files_count": len(extra_dels),
                    "existing_data_files_count": 0,
                    "deleted_data_files_count": 0,
                    "content": CONTENT_POS_DELETES,
                }
            )
        mlist_path = os.path.join(
            self.meta_dir, f"snap-{snapshot_id}.avro"
        )
        write_ocf(mlist_path, MANIFEST_FILE_SCHEMA, mrows)
        summary = {"operation": operation}
        summary.update(getattr(self, "_summary_extra", None) or {})
        snapshot = {
            "snapshot-id": snapshot_id,
            "timestamp-ms": now,
            "manifest-list": mlist_path,
            "summary": summary,
        }
        if cur is not None:
            prior_md = self._metadata()
            snapshot["sequence-number"] = next_sequence_number(prior_md)
            # spec: snapshots record their parent — the ancestry the
            # refs/fast-forward machinery (iceberg_refs.py) walks
            parent = prior_md.get("current-snapshot-id")
            if parent is not None:
                snapshot["parent-snapshot-id"] = parent
        else:
            snapshot["sequence-number"] = 1
        if cur is None:
            new_schema = _iceberg_schema(df)
            # spec: snapshots record the schema current at write time
            snapshot["schema-id"] = new_schema.get("schema-id", 0)
            md = {
                "format-version": 1,
                "table-uuid": str(uuid.uuid4()),
                "location": self.location,
                "last-updated-ms": now,
                "last-column-id": len(df.schema.fields),
                "schema": new_schema,
                "schemas": [new_schema],
                "current-schema-id": new_schema.get("schema-id", 0),
                "partition-spec": [],
                "partition-specs": [
                    {
                        "spec-id": 0,
                        "fields": [
                            {
                                "name": fld["name"],
                                "transform": fld["transform"],
                                "source-id": 1 + [
                                    f.name for f in df.schema.fields
                                ].index(fld["source"]),
                                "field-id": 1000 + i,
                            }
                            for i, fld in enumerate(
                                _parse_pspec(c)
                                for c in self._part_cols_new
                            )
                        ],
                    }
                ],
                "default-spec-id": 0,
                "properties": {},
                "snapshots": [snapshot],
                "snapshot-log": [],
                "current-snapshot-id": snapshot_id,
                "last-sequence-number": 1,
            }
            next_v = 1
        else:
            md = self._metadata()
            if "schemas" not in md:  # pre-r10 metadata: seed the list
                md["schemas"] = [md["schema"]]
                md["current-schema-id"] = md["schema"].get("schema-id", 0)
            if schema_update is not None:
                md["schema"] = schema_update["schema"]
                md["last-column-id"] = schema_update["last_column_id"]
                md["schemas"] = md["schemas"] + [schema_update["schema"]]
                md["current-schema-id"] = schema_update["schema"].get(
                    "schema-id", 0
                )
            snapshot["schema-id"] = md["current-schema-id"]
            md["last-sequence-number"] = snapshot["sequence-number"]
            md["last-updated-ms"] = now
            md["snapshots"] = md["snapshots"] + [snapshot]
            md["snapshot-log"] = md.get("snapshot-log", []) + [
                {"timestamp-ms": now, "snapshot-id": snapshot_id}
            ]
            md["current-snapshot-id"] = snapshot_id
            next_v = cur + 1
        if extra_dels:
            md["format-version"] = 2  # delete files are a v2 construct
        extra_props = getattr(self, "_properties_extra", None)
        if extra_props:
            md["properties"] = {
                **md.get("properties", {}),
                **extra_props,
            }
        spec_override = getattr(
            self, "_partition_specs_override", None
        )
        if spec_override is not None and cur is not None:
            md["partition-specs"] = spec_override
            md["default-spec-id"] = spec_override[-1]["spec-id"]
        mpath = os.path.join(self.meta_dir, f"v{next_v}.metadata.json")
        tmp = mpath + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(md, f)
        try:
            os.link(tmp, mpath)  # atomic put-if-absent: the commit
        except FileExistsError:
            from .tables import ConcurrentCommitError

            raise ConcurrentCommitError(
                f"metadata version {next_v} was committed by another "
                "writer"
            ) from None
        finally:
            os.remove(tmp)
        hint_tmp = os.path.join(
            self.meta_dir, f"_hint-{uuid.uuid4().hex}"
        )
        with open(hint_tmp, "w") as f:
            f.write(str(next_v))
        # best-effort pointer (readers also scan the metadata dir)
        os.replace(
            hint_tmp, os.path.join(self.meta_dir, "version-hint.text")
        )
        return snapshot_id

    def _resolve_part_cols(
        self, df: DataFrame, partition_by: list[str] | None
    ) -> list[str]:
        """Canonicalize and validate the write's partition spec against
        the stored one. Elements are spec strings — identity column
        names, ``day(ts)``, ``bucket(8, id)``, ``truncate(4, s)`` — or,
        against an existing table, its partition FIELD names."""
        from .iceberg_transforms import (
            parse_partition_spec,
            unparse_partition_spec,
        )

        if self._current_version() is not None:
            stored = stored_part_fields(self._metadata())
            stored_specs = [unparse_partition_spec(f) for f in stored]
            if partition_by is not None:
                names = {f["name"]: f for f in stored}
                canon = [
                    unparse_partition_spec(
                        names[el]
                        if el in names
                        else parse_partition_spec(el)
                    )
                    for el in partition_by
                ]
                if canon != stored_specs:
                    raise ValueError(
                        f"table partition spec is {stored_specs}; "
                        "cannot change per write (use "
                        "evolve_partition_spec)"
                    )
            self._part_cols_new = stored_specs
            return stored_specs
        types = {
            f.name: f.dataType.simpleString() for f in df.schema.fields
        }
        fields = [parse_partition_spec(c) for c in (partition_by or [])]
        for fld in fields:
            src = fld["source"]
            if src not in types:
                raise ValueError(f"partition column {src} not in schema")
            if fld["transform"] == "identity" and types[src] not in _PART_AVRO:
                raise ValueError(
                    f"partition column {src}: type {types[src]} not "
                    "supported for identity partitioning (use a "
                    "day/month/year/hour or bucket transform)"
                )
        self._part_cols_new = list(partition_by or [])
        return self._part_cols_new

    def append(
        self,
        df: DataFrame,
        partition_by: list[str] | None = None,
        merge_schema: bool = False,
    ) -> int:
        """Append a batch. ``merge_schema=True`` enables add-column
        schema evolution: new top-level columns get fresh field ids
        (``last-column-id`` advances — ids are never reused, the
        Iceberg evolution contract) and the table schema widens in the
        same commit; files written before the column serve typed NULLs
        because every read uses the current schema explicitly. Shared
        columns must match types exactly; new columns without the flag
        refuse. Batches may omit nullable columns (read fills NULL)."""
        cols = self._resolve_part_cols(df, partition_by)
        schema_update = None
        promoted: dict[str, str] = {}
        if self._current_version() is not None:
            md = self._metadata()
            have = {f["name"]: f for f in md["schema"]["fields"]}
            batch = {
                f.name: f.dataType.simpleString()
                for f in df.schema.fields
            }
            for name, t in batch.items():
                if name in have:
                    ice = (
                        t.replace(",", ", ")
                        if t.startswith("decimal")
                        else _TYPE_MAP.get(t)
                    )
                    cur_t = have[name]["type"]
                    if ice == cur_t:
                        continue
                    if (cur_t, ice) in _ICE_PROMOTIONS:
                        # spec type promotion: widen the TABLE type
                        # (field id unchanged; old files up-cast at
                        # read through their write-time schema)
                        if not merge_schema:
                            raise ValueError(
                                f"column {name!r}: widening {cur_t} "
                                f"-> {ice} needs merge_schema=True"
                            )
                        promoted[name] = ice
                    elif (ice, cur_t) in _ICE_PROMOTIONS:
                        # batch is narrower: up-cast the batch, no
                        # schema change
                        df = df.withColumn(
                            name,
                            F.col(name).cast(_ICE2SPARK[cur_t]),
                        )
                    else:
                        raise ValueError(
                            f"column {name!r} type mismatch: table has "
                            f"{cur_t}, batch has {t} — only the "
                            "spec promotions (int->long, "
                            "float->double) are allowed"
                        )
            new_cols = [
                f for f in df.schema.fields if f.name not in have
            ]
            if new_cols or promoted:
                if new_cols and not merge_schema:
                    raise ValueError(
                        "batch has columns not in the table schema "
                        f"({[f.name for f in new_cols]}); pass "
                        "merge_schema=True to evolve the schema"
                    )
                next_id = md.get(
                    "last-column-id", len(md["schema"]["fields"])
                )
                fields = [
                    (
                        {**f, "type": promoted[f["name"]]}
                        if f["name"] in promoted
                        else dict(f)
                    )
                    for f in md["schema"]["fields"]
                ]
                for f in new_cols:
                    t = f.dataType.simpleString()
                    ice = (
                        t.replace(",", ", ")
                        if t.startswith("decimal")
                        else _TYPE_MAP[t]
                    )
                    next_id += 1
                    fields.append(
                        {
                            "id": next_id,
                            "name": f.name,
                            "required": False,
                            "type": ice,
                        }
                    )
                schema_update = {
                    "schema": {
                        "type": "struct",
                        "schema-id": md["schema"].get("schema-id", 0)
                        + 1,
                        "fields": fields,
                    },
                    "last_column_id": next_id,
                }
        return self._commit(
            df,
            self._write_data(df, cols),
            "append",
            schema_update=schema_update,
        )

    def overwrite(
        self, df: DataFrame, partition_by: list[str] | None = None
    ) -> int:
        cols = self._resolve_part_cols(df, partition_by)
        return self._commit(df, self._write_data(df, cols), "overwrite")

    def read_where(
        self, partition_filter, snapshot_id: int | None = None
    ) -> DataFrame:
        """Manifest-level partition pruning: ``partition_filter`` is a
        host predicate over the entry's typed partition dict, applied
        on the driver BEFORE any file is scheduled — the pruning
        identity partitioning exists for."""
        entries = [
            e
            for e in self._entries(snapshot_id)
            if e["status"] != STATUS_DELETED
            and partition_filter(e["data_file"]["partition"])
        ]
        if not entries:
            return self.read(snapshot_id).filter("1 = 0")
        md = self._metadata()
        target_sid = self._target_schema_id(md, snapshot_id)
        pos_dels = self._live_delete_files(snapshot_id)
        eq_entries = self._live_eq_delete_entries(snapshot_id)
        if eq_entries:
            # equality deletes are partition-global: the pruned scan
            # must still apply every applicable one (seq rules)
            return self._scan_with_eq_deletes(
                entries, pos_dels, eq_entries, target_sid
            )
        return self._aligned_scan(md, entries, pos_dels, target_sid)

    def read_hidden(
        self,
        filters: list[tuple[str, str, object]],
        snapshot_id: int | None = None,
    ) -> DataFrame:
        """HIDDEN-partition pruned read: ``filters`` are predicates on
        SOURCE columns — ``[("ts", ">=", dt), ("id", "=", 42)]`` with
        ops ``= < <= > >= in`` — and pruning happens on the TRANSFORMED
        manifest partition values (``ts_day``, ``id_bucket``) without
        the caller ever naming them. Bucket fields prune equality/IN
        (hashing destroys order); truncate/temporal fields prune
        ranges too (order-preserving); unprovable combinations keep
        the file. The SAME driver pass also consults each file's
        manifest COLUMN BOUNDS (iceberg_bounds — min/max skipping on
        ANY column, the Delta stats-skipping twin, so unpartitioned
        predicates prune too). The exact predicate is then applied as
        a residual row filter on the pruned scan, so results are
        always exact — pruning is IO elision, never semantics."""
        from .iceberg_bounds import bounds_may_match
        from .iceberg_transforms import (
            prune_interval,
            prune_predicate,
            residual_column,
        )

        md = self._metadata()
        fields = stored_part_fields(md, all_specs=True)
        src_types = {
            f["name"]: _spark_type_str(f["type"])
            for f in md["schema"]["fields"]
        }
        checks = []  # (field name, partition-value predicate)
        ichecks = []  # (field name, summary-interval predicate)
        for col, op, lit in filters:
            for fld in fields:
                if fld["source"] != col:
                    continue
                if col not in src_types:
                    continue
                fn = prune_predicate(fld, op, lit, src_types[col])
                if fn is not None:
                    checks.append((fld["name"], fn))
                ifn = prune_interval(fld, op, lit, src_types[col])
                if ifn is not None:
                    ichecks.append((fld["name"], ifn))

        def manifest_pred(m: dict) -> bool:
            """spec-507 LIST-LEVEL pruning: drop a whole manifest —
            before decoding it — when some partition field's summary
            interval provably misses the query. Manifests without
            summaries are kept; a contains_null summary keeps (null
            partition values are never pruned, matching the
            entry-level rule)."""
            summ = m.get("partitions")
            if not summ:
                return True
            by_name = {s.get("name"): s for s in summ}
            for name, ifn in ichecks:
                s = by_name.get(name)
                if s is None or s.get("contains_null"):
                    continue
                lo, hi = s.get("lower_bound"), s.get("upper_bound")
                if not ifn(
                    None if lo is None else json.loads(lo),
                    None if hi is None else json.loads(hi),
                ):
                    return False
            return True
        ids_by_col = {
            f["name"]: f["id"] for f in md["schema"]["fields"]
        }
        types_by_id = _ice_types_by_id(md)

        def keep(e: dict) -> bool:
            pv = e["data_file"]["partition"]
            if not all(fn(pv.get(name)) for name, fn in checks):
                return False
            return bounds_may_match(
                e["data_file"], ids_by_col, types_by_id, filters
            )

        entries = [
            e
            for e in self._entries(
                snapshot_id, manifest_pred=manifest_pred
            )
            if e["status"] != STATUS_DELETED and keep(e)
        ]
        if not entries:
            out = self.read(snapshot_id).filter("1 = 0")
        else:
            target_sid = self._target_schema_id(md, snapshot_id)
            pos_dels = self._live_delete_files(snapshot_id)
            eq_entries = self._live_eq_delete_entries(snapshot_id)
            if eq_entries:
                # equality deletes are partition-global: the pruned
                # scan must still apply every applicable one
                out = self._scan_with_eq_deletes(
                    entries, pos_dels, eq_entries, target_sid
                )
            else:
                out = self._aligned_scan(
                    md, entries, pos_dels, target_sid
                )
        for col, op, lit in filters:
            out = out.filter(residual_column(col, op, lit))
        return out


def _rewrite_manifests(
    self, target_entries: int = 100_000
) -> dict:
    """Iceberg's ``rewrite_manifests`` maintenance procedure: compact
    the head snapshot's DATA manifests into partition-sorted,
    size-bounded ones — metadata only, no data file touched.

    Pairs with r12's manifest REUSE: append chains accumulate one
    manifest per commit, which is exactly what you want for O(added)
    writes and summary pruning, but a long chain eventually makes the
    manifest LIST itself the overhead. This op re-bins the entries
    (sorted by partition tuple, so each new manifest covers a TIGHT
    partition range — summary pruning gets sharper, not just fewer
    files) while PRESERVING every entry's status and adding
    snapshot_id, so incremental attribution (``added_files``,
    changelog) survives verbatim. Delete manifests carry by
    reference. The new snapshot is stamped ``maintenance`` (it changes
    no logical row — the changelog skips it, like rewrite_data_files).
    Returns {'manifests_before', 'manifests_after', 'entries'}."""
    import time as _time

    md = self._metadata()
    head = md.get("current-snapshot-id")
    if head is None:
        raise ValueError("empty table: nothing to rewrite")
    snap = next(
        s for s in md["snapshots"] if s["snapshot-id"] == head
    )
    _, prior_rows = read_ocf_cached(snap["manifest-list"])
    n_before = sum(
        1
        for m in prior_rows
        if m.get("content", CONTENT_DATA) == CONTENT_DATA
    )
    live = [
        e for e in self._entries() if e["status"] != STATUS_DELETED
    ]
    part_fields = all_spec_part_fields(md)

    def part_key(e: dict):
        pv = e["data_file"]["partition"]
        return tuple(
            (pv.get(n) is not None, pv.get(n))
            for n, _t in part_fields
        )

    live.sort(key=part_key)
    snapshot_id = int(uuid.uuid4().int % (1 << 62))
    now = int(_time.time() * 1000)
    bins = [
        live[i : i + target_entries]
        for i in range(0, len(live), max(1, target_entries))
    ] or [[]]
    spec_id = md.get("default-spec-id", 0)
    mrows = []
    for i, chunk in enumerate(bins):
        mp = os.path.join(
            self.meta_dir, f"snap-{snapshot_id}-m{i}.avro"
        )
        write_ocf(mp, manifest_entry_schema(part_fields), chunk)
        mrows.append(
            {
                "manifest_path": mp,
                "manifest_length": os.path.getsize(mp),
                "partition_spec_id": spec_id,
                "added_snapshot_id": snapshot_id,
                "added_data_files_count": 0,
                "existing_data_files_count": len(chunk),
                "deleted_data_files_count": 0,
                "content": CONTENT_DATA,
                "partitions": partition_summaries(
                    chunk, part_fields
                ),
            }
        )
    # delete manifests ride by reference, untouched
    for m in prior_rows:
        if m.get("content", CONTENT_DATA) != CONTENT_DATA:
            mrows.append(
                {
                    "manifest_path": m["manifest_path"],
                    "manifest_length": m["manifest_length"],
                    "partition_spec_id": m.get(
                        "partition_spec_id", 0
                    ),
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
            )
    mlist_path = os.path.join(
        self.meta_dir, f"snap-{snapshot_id}.avro"
    )
    write_ocf(mlist_path, MANIFEST_FILE_SCHEMA, mrows)
    new_snap = {
        "snapshot-id": snapshot_id,
        "timestamp-ms": now,
        "manifest-list": mlist_path,
        "summary": {
            "operation": "replace",
            "maintenance": "rewrite-manifests",
        },
        "sequence-number": next_sequence_number(md),
        "schema-id": md.get(
            "current-schema-id", md["schema"].get("schema-id", 0)
        ),
        "parent-snapshot-id": head,
    }
    md["last-sequence-number"] = new_snap["sequence-number"]
    md["last-updated-ms"] = now
    md["snapshots"] = md["snapshots"] + [new_snap]
    md["snapshot-log"] = md.get("snapshot-log", []) + [
        {"timestamp-ms": now, "snapshot-id": snapshot_id}
    ]
    md["current-snapshot-id"] = snapshot_id
    next_v = self._current_version() + 1
    mpath = os.path.join(self.meta_dir, f"v{next_v}.metadata.json")
    tmp = mpath + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(md, f)
    try:
        os.link(tmp, mpath)  # atomic put-if-absent: the commit
    except FileExistsError:
        from .tables import ConcurrentCommitError

        raise ConcurrentCommitError(
            f"metadata version {next_v} was committed by another "
            "writer"
        ) from None
    finally:
        os.remove(tmp)
    hint_tmp = os.path.join(self.meta_dir, f"_hint-{uuid.uuid4().hex}")
    with open(hint_tmp, "w") as f:
        f.write(str(next_v))
    os.replace(
        hint_tmp, os.path.join(self.meta_dir, "version-hint.text")
    )
    return {
        "manifests_before": n_before,
        "manifests_after": len(bins),
        "entries": len(live),
    }


IcebergTable.rewrite_manifests = _rewrite_manifests


def _add_files(
    self, source_dir: str, check_duplicates: bool = True
) -> dict:
    """Iceberg's ``CALL system.add_files`` procedure: adopt foreign
    parquet files into THIS table by reference — zero bytes copied,
    one append commit carrying the parent's manifests (r12 reuse) plus
    ONE manifest of the adopted files, footer column bounds collected
    so data skipping works on them like any native file.

    Validation (loud, never silent): every file's arrow schema must
    carry every table column under the same Spark type (extra file
    columns are fine — the explicit-schema scan ignores them);
    duplicate adoption refuses under ``check_duplicates`` (the real
    procedure's check_duplicate_files). Identity-partitioned tables
    adopt files that are PARTITION-PURE (footer min == max on every
    partition column across all row groups — the value lands in the
    manifest so pruning works); non-identity transforms refuse (the
    ordinal cannot be derived from a foreign footer).

    Scale: O(files) footer reads, no data read or moved; the commit is
    the O(added) manifest-reuse append."""
    import pyarrow.parquet as pq

    from pyspark.sql.pandas.types import from_arrow_type

    from .iceberg_bounds import collect_bounds

    if self._current_version() is None:
        raise ValueError(
            "add_files needs an existing table (create it with "
            "append/overwrite first — the table schema is the "
            "adoption contract)"
        )
    md = self._metadata()
    schema = _spark_schema_from_md(md)
    table_types = {
        f.name: f.dataType.simpleString() for f in schema.fields
    }
    stored = stored_part_fields(md)
    bad_tf = [
        f["name"] for f in stored if f["transform"] != "identity"
    ]
    if bad_tf:
        raise ValueError(
            f"add_files cannot derive {bad_tf} partition ordinals "
            "from foreign footers (non-identity transforms) — write "
            "through append() instead"
        )
    part_srcs = {f["name"]: f["source"] for f in stored}
    paths = []
    for root, _dirs, fnames in os.walk(source_dir):
        for fn in sorted(fnames):
            if fn.endswith(".parquet") and not fn.startswith(
                ("_", ".")
            ):
                paths.append(os.path.join(root, fn))
    if not paths:
        raise ValueError(f"no parquet files under {source_dir}")
    live = {
        e["data_file"]["file_path"]
        for e in self._entries()
        if e["status"] != STATUS_DELETED
    }
    dups = sorted(p for p in paths if p in live)
    if dups and check_duplicates:
        raise ValueError(
            f"files already referenced by the table: {dups[:3]} — "
            "pass check_duplicates=False to re-add deliberately"
        )
    sch_fields = {
        f["name"]: f["id"] for f in md["schema"]["fields"]
    }
    bound_types = {
        f["name"]: f["type"]
        for f in md["schema"]["fields"]
        if isinstance(f["type"], str)
    }
    files: list[dict] = []
    for p in paths:
        if p in live:
            continue  # check_duplicates=False: silently keep one ref
        pf = pq.ParquetFile(p)
        arrow = pf.schema_arrow
        got = {
            nm: from_arrow_type(arrow.field(nm).type).simpleString()
            for nm in arrow.names
        }
        missing = [c for c in table_types if c not in got]
        mistyped = [
            c
            for c, t in table_types.items()
            if c in got and got[c] != t
        ]
        if missing or mistyped:
            raise ValueError(
                f"{p}: schema incompatible with the table "
                f"(missing columns {missing}, type mismatches "
                f"{[(c, got[c], table_types[c]) for c in mistyped]})"
            )
        n_rows = pf.metadata.num_rows
        if n_rows == 0:
            continue
        pvals: dict = {}
        for pname, src_col in part_srcs.items():
            idx = arrow.names.index(src_col)
            los, his = set(), set()
            for rg in range(pf.metadata.num_row_groups):
                st = pf.metadata.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    raise ValueError(
                        f"{p}: no usable footer stats on partition "
                        f"column {src_col!r} — cannot prove the file "
                        "partition-pure"
                    )
                los.add(st.min)
                his.add(st.max)
            vals = los | his
            if len(vals) != 1:
                raise ValueError(
                    f"{p}: not partition-pure on {src_col!r} "
                    f"(footer values {sorted(map(str, vals))[:4]}) — "
                    "compact per partition before adopting"
                )
            pvals[pname] = vals.pop()
        entry = {
            "file_path": p,
            "file_format": "PARQUET",
            "partition": pvals,
            "record_count": n_rows,
            "file_size_in_bytes": os.path.getsize(p),
            "block_size_in_bytes": 64 * 1024 * 1024,
        }
        lo_b, hi_b = collect_bounds(p, bound_types)
        if lo_b:
            entry["lower_bounds"] = [
                {"key": sch_fields[c], "value": b}
                for c, b in sorted(lo_b.items())
                if c in sch_fields
            ]
            entry["upper_bounds"] = [
                {"key": sch_fields[c], "value": b}
                for c, b in sorted(hi_b.items())
                if c in sch_fields
            ]
        files.append(entry)
    if not files:
        return {"added_files": 0, "snapshot_id": None}
    self._summary_extra = {
        **(getattr(self, "_summary_extra", None) or {}),
        "added-files-procedure": "add_files",
    }
    try:
        sid = self._commit(None, files, "append")
    finally:
        self._summary_extra = None
    return {"added_files": len(files), "snapshot_id": sid}


IcebergTable.add_files = _add_files


def _expire_snapshots(
    self, keep_last: int = 1, delete_data: bool = True
) -> dict:
    """Iceberg's expireSnapshots maintenance: drop all but the newest
    ``keep_last`` snapshots from table metadata (one new metadata
    version — the expiration is itself a commit via the version-hint
    swap), then delete the expired snapshots' manifest lists, manifests,
    and any DATA FILES no retained snapshot references. Time travel to
    an expired snapshot id fails loudly afterwards (its metadata is
    gone — the same trade real expiration makes); retained snapshots
    are untouched. Returns {'snapshots': n, 'files': n} deleted.

    ``delete_data=False`` makes the expiration METADATA-ONLY — the
    UniForm mirror passes it because the data files belong to the
    DELTA table, whose vacuum retention owns their lifecycle."""
    import time as _time

    md = self._metadata()
    snaps = md["snapshots"]
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    if len(snaps) <= keep_last:
        return {"snapshots": 0, "files": 0}
    # ref-named snapshots (tags, branch heads — iceberg_refs.py) are
    # retention pins: expiring one would break its ref
    pinned = {
        r["snapshot-id"] for r in md.get("refs", {}).values()
    }
    expired = [
        s
        for s in snaps[:-keep_last]
        if s["snapshot-id"] not in pinned
    ]
    if not expired:
        return {"snapshots": 0, "files": 0}
    exp_ids = {s["snapshot-id"] for s in expired}
    retained = [s for s in snaps if s["snapshot-id"] not in exp_ids]
    keep_files: set[str] = set()
    keep_meta: set[str] = set()
    for s in retained:
        keep_meta.add(s["manifest-list"])
        _, manifests = read_ocf(s["manifest-list"])
        for m in manifests:
            keep_meta.add(m["manifest_path"])
            _, es = read_ocf(m["manifest_path"])
            keep_files.update(
                e["data_file"]["file_path"]
                for e in es
                if e["status"] != STATUS_DELETED
            )
    drop_files: set[str] = set()
    drop_meta: set[str] = set()
    for s in expired:
        drop_meta.add(s["manifest-list"])
        _, manifests = read_ocf(s["manifest-list"])
        for m in manifests:
            drop_meta.add(m["manifest_path"])
            _, es = read_ocf(m["manifest_path"])
            drop_files.update(
                e["data_file"]["file_path"] for e in es
            )
    # entries carried EXISTING keep their ADDING snapshot_id; schema-id
    # and sequence-number resolution must survive the snapshot's
    # expiration (else a renamed column would silently read NULLs from
    # pre-rename files, and delete applicability would fail loudly)
    tomb = dict(md.get("expired-snapshot-meta", {}))
    for s_ in expired:
        tomb[str(s_["snapshot-id"])] = {
            "schema-id": s_.get("schema-id"),
            "sequence-number": s_.get("sequence-number"),
        }
    md["expired-snapshot-meta"] = tomb
    md["snapshots"] = retained
    md["snapshot-log"] = [
        entry
        for entry in md.get("snapshot-log", [])
        if entry["snapshot-id"] in {s["snapshot-id"] for s in retained}
    ]
    md["last-updated-ms"] = int(_time.time() * 1000)
    cur = self._current_version()
    next_v = cur + 1
    mpath = os.path.join(self.meta_dir, f"v{next_v}.metadata.json")
    tmp = mpath + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(md, f)
    os.replace(tmp, mpath)
    hint_tmp = os.path.join(self.meta_dir, f"_hint-{uuid.uuid4().hex}")
    with open(hint_tmp, "w") as f:
        f.write(str(next_v))
    os.replace(
        hint_tmp, os.path.join(self.meta_dir, "version-hint.text")
    )
    n_files = 0
    if delete_data:
        for p in sorted(drop_files - keep_files):
            if os.path.exists(p):
                os.remove(p)
                n_files += 1
    for p in sorted(drop_meta - keep_meta):
        if os.path.exists(p):
            os.remove(p)
    return {"snapshots": len(expired), "files": n_files}


IcebergTable.expire_snapshots = _expire_snapshots
