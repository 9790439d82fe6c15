"""Delta GENERATED COLUMNS on the protocol table (delta_log.py) —
PROTOCOL.md's ``delta.generationExpression`` column metadata plus the
partition-pruning payoff real Delta derives from it.

The reference's Delta leg gets this from the Delta runtime
(delta/delta_submit.sh:27-32); here it is re-derived from the public
protocol spec:

* **Declaration** — ``overwrite_generated(df, generated={...},
  partition_by=[...])`` creates the table with each generated field
  carrying ``delta.generationExpression`` in its schema metadata and
  the protocol at minWriterVersion 4 (the generatedColumns writer
  version).
* **Write-side contract** — every write path routes through
  ``apply_generated``: a batch that OMITS a generated column gets it
  computed (one JVM expression, no shuffle); a batch that SUPPLIES it
  is validated against the expression in one pass and refused on any
  mismatch (writers must never be able to desynchronize the column
  from its expression — that is the protocol's invariant). UPDATE DML
  recomputes generated columns from the post-assignment row;
  assigning a generated column directly refuses.
* **Hidden pruning** — ``read_generated(filters)`` prunes files by
  PARTITION values derived from filters on the BASE column for
  recognized expression shapes (``CAST(c AS DATE)``, ``to_date``,
  ``year``, ``date_format(c, 'yyyy-MM[-dd]')``, ``substring(c,1,N)``
  are order-preserving so ranges map to ranges; ``month``/``day``/
  ``hour`` are cyclic so only equality maps), then stats-skips and
  re-applies the exact predicates as residual filters. Unrecognized
  shapes simply never prune — pruning is IO elision, never semantics.

Scale: the derived-column compute is one projected expression per row
inside the write's own job; pruning is a driver-side pass over the
live-file manifest (the same O(files) dict every Delta reader holds);
no extra shuffle or scan anywhere.
"""

from __future__ import annotations

import datetime as _dt
import json
import re

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StructField, StructType

GEN_KEY = "delta.generationExpression"


# ----------------------------- metadata -----------------------------


def generated_exprs(meta: dict) -> dict[str, str]:
    """{column name: generation expression SQL} from the table's
    schemaString metadata; empty for tables without the feature."""
    if not meta or not meta.get("schemaString"):
        return {}
    schema = json.loads(meta["schemaString"])
    out = {}
    for f in schema.get("fields", []):
        md = f.get("metadata") or {}
        if GEN_KEY in md:
            out[f["name"]] = md[GEN_KEY]
    return out


def referenced_columns(expr: str, names) -> set[str]:
    """Schema columns an expression string references (word-boundary
    scan — used only for refusal guards, so over-matching is safe)."""
    return {
        n
        for n in names
        if re.search(rf"\b{re.escape(n)}\b", expr, re.IGNORECASE)
    }


# ---------------------------- write side ----------------------------


def apply_generated(
    df: DataFrame, meta: dict, recompute: bool = False
) -> DataFrame:
    """Materialize or validate generated columns for a write batch.

    Missing columns are computed from their expression; supplied
    columns are checked (one job, first violation refuses the write).
    ``recompute=True`` overwrites from the expression unconditionally —
    the UPDATE-DML path, where assignments changed base columns."""
    gens = generated_exprs(meta)
    if not gens:
        return df
    schema = StructType.fromJson(json.loads(meta["schemaString"]))
    types = {f.name: f.dataType for f in schema.fields}
    checks = []
    for name, expr in gens.items():
        target = F.expr(expr).cast(types[name])
        if recompute or name not in df.columns:
            df = df.withColumn(name, target)
        else:
            checks.append((name, expr, target))
    if checks:
        cond = None
        for name, _expr, target in checks:
            piece = ~F.col(name).eqNullSafe(target)
            cond = piece if cond is None else (cond | piece)
        bad = df.filter(cond).limit(1).collect()
        if bad:
            detail = "; ".join(
                f"{n} must equal {e}" for n, e, _t in checks
            )
            raise ValueError(
                "write violates delta.generationExpression: supplied "
                f"values disagree with the expression ({detail}); "
                f"first offending row: {bad[0].asDict()}"
            )
    return df


def forbid_generated_assignments(meta: dict, assignments) -> None:
    """UPDATE/MERGE may not SET a generated column directly — its
    value is owned by the expression (recomputed after assignment) —
    nor an identity column (GENERATED ALWAYS AS IDENTITY)."""
    gens = generated_exprs(meta)
    hit = sorted(set(assignments) & set(gens))
    if hit:
        raise ValueError(
            f"cannot assign generated column(s) {hit}: their values "
            "derive from delta.generationExpression and are recomputed "
            "automatically"
        )
    idh = sorted(set(assignments) & set(identity_cols(meta)))
    if idh:
        raise ValueError(
            f"cannot assign identity column(s) {idh}: GENERATED "
            "ALWAYS AS IDENTITY values are allocated by the writer"
        )


def _overwrite_generated(
    self,
    df: DataFrame,
    generated: dict[str, str],
    partition_by: list[str] | None = None,
) -> "DeltaLogTable":  # noqa: F821 - attached to DeltaLogTable
    """Create (or fully replace) the table with generated-column
    declarations. ``generated`` maps column name -> SQL expression over
    the batch's other columns; generated columns may be (and usually
    are) the partition columns. Existing tables keep their
    declarations through plain ``overwrite``/``append`` — this entry
    point is for DECLARING them."""
    import time
    import uuid as _uuid

    part_cols = list(partition_by or [])
    for name, expr in generated.items():
        bad = referenced_columns(expr, [name])
        if bad:
            raise ValueError(
                f"generated column {name!r} cannot reference itself"
            )
        if name in df.columns:
            raise ValueError(
                f"generated column {name!r} is already in the batch; "
                "declare it only in `generated` (values are computed)"
            )
    w = df
    for name, expr in generated.items():
        w = w.withColumn(name, F.expr(expr))
    fields = []
    for f in w.schema.fields:
        if f.name in generated:
            fields.append(
                StructField(
                    f.name,
                    f.dataType,
                    True,
                    {GEN_KEY: generated[f.name]},
                )
            )
        else:
            fields.append(f)
    schema = StructType(fields)
    meta = {
        "id": _uuid.uuid4().hex,
        "format": {"provider": "parquet", "options": {}},
        "schemaString": schema.json(),
        "partitionColumns": part_cols,
        "configuration": {},
        "createdTime": int(time.time() * 1000),
    }
    versions = self._versions()
    prior_live = {}
    # generatedColumns is a legacy writer-version-4 feature
    proto = {"minReaderVersion": 1, "minWriterVersion": 4}
    if versions:
        prior_live, prior_meta, _ = self._replay()
        from .delta_colmap import (
            mapping_enabled,
            reconcile_mapped_schema,
        )

        if mapping_enabled(prior_meta):
            # r11 (was a refusal): declaring generated columns on a
            # MAPPED table — physical names decouple the declaration
            # from the files, so reconcile the new schema by logical
            # name (GEN_KEY field metadata rides along), keep the
            # mapping configuration, and UNION the protocol feature
            # instead of downgrading the (3,7) feature protocol
            meta = reconcile_mapped_schema(prior_meta, schema)
            meta["partitionColumns"] = part_cols
        else:
            # existing NON-mapped table: keep its identity and
            # tblproperties too (real Delta — a declaration commit
            # must not reset CDF/UniForm/constraints config)
            meta["id"] = prior_meta["id"]
            meta["configuration"] = dict(
                prior_meta.get("configuration") or {}
            )
            if prior_meta.get("createdTime") is not None:
                meta["createdTime"] = prior_meta["createdTime"]
        # and never downgrade an active feature protocol
        proto = _feature_union_protocol(
            self.current_protocol(), 4, "generatedColumns"
        )
    adds = self._write_data_files(w, part_cols, meta=meta)
    now = int(time.time() * 1000)
    actions = [
        {
            "commitInfo": {
                "operation": "WRITE",
                "operationParameters": {
                    "mode": "Overwrite",
                    "generatedColumns": json.dumps(generated),
                },
            }
        },
        {"protocol": proto},
        {"metaData": meta},
    ]
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


def _feature_union_protocol(
    proto: dict, want_writer: int, feature: str
) -> dict:
    """Protocol action declaring a legacy writer feature WITHOUT
    downgrading anything active (r10 rule: feature-union, never
    wholesale replace): a table-features protocol (v7) gets the
    feature unioned into writerFeatures; a legacy protocol just maxes
    the writer version (the spec's implication table then covers the
    feature)."""
    mrv = proto.get("minReaderVersion", 1)
    mwv = proto.get("minWriterVersion", 2)
    if mwv >= 7 or proto.get("writerFeatures") is not None:
        w = set(proto.get("writerFeatures") or [])
        w.add(feature)
        out = {
            "minReaderVersion": mrv,
            "minWriterVersion": max(mwv, 7),
            "writerFeatures": sorted(w),
        }
        if proto.get("readerFeatures") is not None:
            out["readerFeatures"] = sorted(
                set(proto["readerFeatures"])
            )
        return out
    return {
        "minReaderVersion": mrv,
        "minWriterVersion": max(mwv, want_writer),
    }


# --------------------------- identity columns ---------------------------

ID_START_KEY = "delta.identity.start"
ID_STEP_KEY = "delta.identity.step"
ID_HWM_KEY = "delta.identity.highWaterMark"
ID_EXPLICIT_KEY = "delta.identity.allowExplicitInsert"


def identity_cols(meta: dict) -> dict[str, dict]:
    """{column: {'start','step','highWaterMark'}} for identity columns
    declared in the schema metadata."""
    if not meta or not meta.get("schemaString"):
        return {}
    schema = json.loads(meta["schemaString"])
    out = {}
    for f in schema.get("fields", []):
        md = f.get("metadata") or {}
        if ID_START_KEY in md:
            out[f["name"]] = {
                "start": int(md[ID_START_KEY]),
                "step": int(md[ID_STEP_KEY]),
                "highWaterMark": (
                    int(md[ID_HWM_KEY]) if ID_HWM_KEY in md else None
                ),
            }
    return out


def assign_identity(df: DataFrame, meta: dict):
    """Allocate identity values for a write batch.

    Returns ``(df, new_meta | None)`` — new_meta carries the advanced
    high watermarks and must ride the same commit as the data (Delta
    stores the watermark in the column metadata, so the allocation is
    transactional with the write).

    Allocation is DENSE and distributed: one count pass computes
    per-partition row counts (a driver list of O(partitions) ints),
    each partition then gets a contiguous block and numbers its rows
    by the within-partition order — no global sort, no single-task
    window, the same block-reservation shape real Delta writers use.
    Values are unique and strictly above the prior watermark; the
    ROW↔VALUE pairing depends on partitioning (as in real Delta,
    identity promises uniqueness + monotone watermark, not a
    deterministic mapping). GENERATED ALWAYS semantics: a batch that
    supplies the column refuses."""
    ids = identity_cols(meta)
    if not ids:
        return df, None
    present = [c for c in ids if c in df.columns]
    if present:
        raise ValueError(
            f"identity column(s) {present} are GENERATED ALWAYS — "
            "writes must omit them (allowExplicitInsert is false)"
        )
    pid, mid, rn = "__id_pid", "__id_mid", "__id_rn"
    from pyspark.sql import Window

    # pin the batch's partition layout BEFORE counting (r10 advisor
    # finding): the offset map is keyed by spark_partition_id, and
    # without a materialization barrier the write job re-evaluates the
    # plan — a non-deterministic source (shuffle order, sampling, rand)
    # could land a DIFFERENT layout, silently yielding NULL ids for
    # unseen partition ids or double-allocating blocks. localCheckpoint
    # makes the count job and the write job read the SAME partitions;
    # cost is one materialization of the batch, the price real block-
    # reserving writers pay too.
    df = df.localCheckpoint(eager=True)
    w = (
        df.withColumn(pid, F.spark_partition_id())
        .withColumn(mid, F.monotonically_increasing_id())
    )
    counts = {
        r[pid]: r["n"]
        for r in w.groupBy(pid).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    total = sum(counts.values())
    if total == 0:
        return df, None
    offsets, acc = {}, 0
    for p in sorted(counts):
        offsets[p] = acc
        acc += counts[p]
    off_expr = None
    for p, o in offsets.items():
        off_expr = (
            F.when(F.col(pid) == p, F.lit(o))
            if off_expr is None
            else off_expr.when(F.col(pid) == p, F.lit(o))
        )
    win = Window.partitionBy(pid).orderBy(mid)
    w = w.withColumn(rn, F.row_number().over(win) - 1)
    schema = json.loads(meta["schemaString"])
    by_name = {f["name"]: f for f in schema["fields"]}
    for name, spec in ids.items():
        hw = spec["highWaterMark"]
        base = (
            hw + spec["step"]
            if hw is not None
            else spec["start"]
        )
        w = w.withColumn(
            name,
            (
                F.lit(base)
                + (off_expr + F.col(rn)) * F.lit(spec["step"])
            ).cast(by_name[name]["type"]),
        )
        by_name[name].setdefault("metadata", {})[ID_HWM_KEY] = (
            base + (total - 1) * spec["step"]
        )
    new_meta = dict(meta)
    new_meta["schemaString"] = json.dumps(schema)
    out_cols = [f["name"] for f in schema["fields"] if f["name"] in
                set(df.columns) | set(ids)]
    return w.drop(pid, mid, rn).select(*out_cols), new_meta


def _overwrite_identity(
    self,
    df: DataFrame,
    identity: dict[str, dict],
    partition_by: list[str] | None = None,
) -> "DeltaLogTable":  # noqa: F821
    """Create the table with IDENTITY column declarations:
    ``identity`` maps column name -> {"start": s, "step": k} (both
    default sensibly). The column is appended to the schema as a
    bigint GENERATED ALWAYS AS IDENTITY; this first write allocates
    values for the batch and records the watermark."""
    import time
    import uuid as _uuid

    from pyspark.sql.types import LongType, StructField, StructType

    for name in identity:
        if name in df.columns:
            raise ValueError(
                f"identity column {name!r} is already in the batch "
                "(GENERATED ALWAYS: writers never supply it)"
            )
    fields = list(df.schema.fields)
    for name, spec in identity.items():
        fields.append(
            StructField(
                name,
                LongType(),
                True,
                {
                    ID_START_KEY: int(spec.get("start", 1)),
                    ID_STEP_KEY: int(spec.get("step", 1)),
                    ID_EXPLICIT_KEY: False,
                },
            )
        )
    schema = StructType(fields)
    meta = {
        "id": _uuid.uuid4().hex,
        "format": {"provider": "parquet", "options": {}},
        "schemaString": schema.json(),
        "partitionColumns": list(partition_by or []),
        "configuration": {},
        "createdTime": int(time.time() * 1000),
    }
    versions = self._versions()
    prior_live = {}
    # identityColumns is a writer-version-6 legacy feature
    proto = {"minReaderVersion": 1, "minWriterVersion": 6}
    if versions:
        prior_live, prior_meta, _ = self._replay()
        from .delta_colmap import (
            mapping_enabled,
            reconcile_mapped_schema,
        )

        if mapping_enabled(prior_meta):
            # r11 (was silently clobbering the mapping): declaring an
            # identity column on a MAPPED table — reconcile by logical
            # name (the ID_* field metadata rides along, the new
            # identity column gets a fresh id + physical name) and
            # union the protocol feature instead of downgrading
            meta = reconcile_mapped_schema(prior_meta, schema)
            meta["partitionColumns"] = list(partition_by or [])
        else:
            # existing NON-mapped table: keep identity + tblproperties
            meta["id"] = prior_meta["id"]
            meta["configuration"] = dict(
                prior_meta.get("configuration") or {}
            )
            if prior_meta.get("createdTime") is not None:
                meta["createdTime"] = prior_meta["createdTime"]
        proto = _feature_union_protocol(
            self.current_protocol(), 6, "identityColumns"
        )
    w, new_meta = assign_identity(df, meta)
    adds = self._write_data_files(
        w, list(partition_by or []), meta=new_meta or meta
    )
    now = int(time.time() * 1000)
    actions = [
        {
            "commitInfo": {
                "operation": "WRITE",
                "operationParameters": {
                    "mode": "Overwrite",
                    "identityColumns": sorted(identity),
                },
            }
        },
        {"protocol": proto},
        {"metaData": new_meta or meta},
    ]
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


# ----------------------------- pruning -----------------------------

#: recognizers: normalized expression -> (base column, literal mapper,
#: order_preserving, numeric partition value)
_DATE_PAT = re.compile(
    r"^cast\((\w+) as date\)$|^to_date\((\w+)\)$", re.IGNORECASE
)
_YEAR_PAT = re.compile(r"^year\((\w+)\)$", re.IGNORECASE)
_CYCLIC_PAT = re.compile(r"^(month|day|hour)\((\w+)\)$", re.IGNORECASE)
_SUBSTR_PAT = re.compile(
    r"^substr(?:ing)?\((\w+), 1, (\d+)\)$", re.IGNORECASE
)
_DATEFMT_PAT = re.compile(
    r"^date_format\((\w+), '(yyyy-MM(?:-dd)?)'\)$"
)


def _as_date(v) -> _dt.date:
    if isinstance(v, _dt.datetime):
        return v.date()
    if isinstance(v, _dt.date):
        return v
    return _dt.date.fromisoformat(str(v)[:10])


def _recognize(expr: str):
    """(base column, literal->partition-value mapper, order-preserving,
    numeric) for supported expression shapes, else None."""
    e = re.sub(r"\s+", " ", expr.strip())
    m = _DATE_PAT.match(e)
    if m:
        base = m.group(1) or m.group(2)
        return base, lambda v: _as_date(v).isoformat(), True, False
    m = _YEAR_PAT.match(e)
    if m:
        return m.group(1), lambda v: _as_date(v).year, True, True
    m = _CYCLIC_PAT.match(e)
    if m:
        unit, base = m.group(1).lower(), m.group(2)

        def cyc(v, unit=unit):
            if unit == "hour":
                return v.hour if isinstance(v, _dt.datetime) else None
            d = _as_date(v)
            return d.month if unit == "month" else d.day

        # cyclic: only equality maps (month wraps across years)
        return base, cyc, False, True
    m = _SUBSTR_PAT.match(e)
    if m:
        n = int(m.group(2))
        return m.group(1), lambda v: str(v)[:n], True, False
    m = _DATEFMT_PAT.match(e)
    if m:
        fmt = "%Y-%m" if m.group(2) == "yyyy-MM" else "%Y-%m-%d"

        def dfmt(v, fmt=fmt):
            v = v if isinstance(v, _dt.datetime) else _as_date(v)
            return v.strftime(fmt)

        return m.group(1), dfmt, True, False
    return None


def _surviving_adds(
    self, filters: list[tuple], version: int | None
) -> tuple[dict, dict]:
    """(pruned live adds, meta): the driver-side pruning decision —
    derived partition-value checks for recognized generated shapes,
    then per-file stats skipping. Shared by ``read_generated`` and
    ``files_matching_generated`` so the observable pin IS the read's
    decision."""
    from .delta_log import _physical_filters, _stats_may_match

    live, meta, _ = self._replay(version)
    part_cols = meta.get("partitionColumns", [])
    recogs = {}
    for name, expr in generated_exprs(meta).items():
        if name not in part_cols:
            continue
        r = _recognize(expr)
        if r is not None:
            recogs[name] = r
    checks = []  # (partition col, numeric, pv-predicate)
    for col, op, v in filters:
        for gname, (base, mapper, order_ok, numeric) in recogs.items():
            if base != col:
                continue
            w = mapper(v)
            if w is None:
                continue
            if op == "==":
                checks.append((gname, numeric, lambda pv, w=w: pv == w))
            elif order_ok and op in (">", ">="):
                # the transform floors/truncates, so bounds stay
                # inclusive on the derived scale
                checks.append((gname, numeric, lambda pv, w=w: pv >= w))
            elif order_ok and op in ("<", "<="):
                checks.append((gname, numeric, lambda pv, w=w: pv <= w))

    # mapped tables key partitionValues by PHYSICAL name (r11): the
    # logical lookup would silently skip pruning (safe but slow)
    from .delta_colmap import mapping_enabled, physical_names

    pn = physical_names(meta) if mapping_enabled(meta) else {}

    def keep(a: dict) -> bool:
        pv = a.get("partitionValues") or {}
        for gname, numeric, fn in checks:
            raw = pv.get(pn.get(gname, gname))
            if raw is None:
                continue  # null partition: never prune
            if not fn(int(raw) if numeric else raw):
                return False
        return True

    part_set = set(part_cols)
    phys = _physical_filters(meta, filters)
    pruned = {
        p: a
        for p, a in live.items()
        if keep(a) and _stats_may_match(a, phys, part_set)
    }
    return pruned, meta


def _read_generated(
    self, filters: list[tuple], version: int | None = None
) -> DataFrame:
    """Read with HIDDEN partition pruning through generated columns:
    ``filters`` are ``(column, op, value)`` with ops ``== >= > <= <``
    over BASE columns; files are pruned by the derived partition
    value, then by per-file stats, and the exact predicates re-apply
    as residual row filters (results always equal the unpruned
    filtered read — pinned by test)."""
    pruned, meta = _surviving_adds(self, filters, version)
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


def _files_matching_generated(
    self, filters: list[tuple], version: int | None = None
) -> list[str]:
    """Observability twin of ``read_generated``'s pruning decision —
    the relative paths that survive (for tests and EXPLAIN-style
    introspection)."""
    pruned, _meta = _surviving_adds(self, filters, version)
    return sorted(pruned)


def attach() -> None:
    from .delta_log import DeltaLogTable

    DeltaLogTable.overwrite_generated = _overwrite_generated
    DeltaLogTable.overwrite_identity = _overwrite_identity
    DeltaLogTable.read_generated = _read_generated
    DeltaLogTable.files_matching_generated = _files_matching_generated


attach()
