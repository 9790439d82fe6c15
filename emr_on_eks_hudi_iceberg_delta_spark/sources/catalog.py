"""Named-table catalog over the versioned table store.

The local analog of the reference's Glue Data Catalog integration (Hudi
hive-sync options hudi/hudi_scd_script.py:37-40; Iceberg ``GlueCatalog``
iceberg/iceberg_submit.sh:33-34; Delta Glue DDL delta/delta_scd_script.py:
42-56): a durable name -> table-location mapping plus SQL registration, so
``spark.sql("SELECT ... FROM <name>")`` resolves catalog tables by name.

The catalog document is a json file under the catalog root with the same
atomic-replace discipline as table pointers. Registration materializes each
table's CURRENT published snapshot as a temp view — re-run ``sync()`` (or
read through ``table(name)``) after external commits; views are
session-scoped, the catalog itself is durable.
"""

from __future__ import annotations

import json
import os
import re
import time
import uuid
from collections.abc import Callable
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

from .tables import VersionedTable, file_lock

_CATALOG = "_catalog.json"


class LakeCatalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root.rstrip("/")

    def _path(self) -> str:
        return os.path.join(self.root, _CATALOG)

    def _doc(self) -> dict:
        if not os.path.exists(self._path()):
            return {"tables": {}}
        with open(self._path()) as f:
            return json.load(f)

    def _write_doc(self, doc: dict) -> None:
        os.makedirs(self.root, exist_ok=True)
        tmp = self._path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(doc, f)
        os.replace(tmp, self._path())

    @contextmanager
    def locked(self, timeout: float = 30.0):
        """Cross-process mutual exclusion over the catalog DOCUMENT —
        the same discipline as ``VersionedTable.locked()``.
        ``os.replace`` makes each individual write atomic, but a
        read-modify-write without this lock can lose a concurrent
        writer's update (two transactions pin-swapping, two
        ``create_table`` calls registering — ADVICE r6)."""
        with file_lock(
            os.path.join(self.root, "_catalog.lock"), timeout=timeout
        ):
            yield self

    def _mutate_doc(self, fn: Callable[[dict], object]):
        """Serialize one read-modify-write of the catalog document under
        the catalog lock; ``fn`` mutates the doc in place and its return
        value is passed through. Every catalog-doc mutation routes here
        so no two writers can interleave read and write."""
        with self.locked():
            doc = self._doc()
            out = fn(doc)
            self._write_doc(doc)
            return out

    def create_table(
        self, name: str, df: DataFrame | None = None, location: str | None = None
    ) -> VersionedTable:
        """Register a table name (optionally with initial data). A name
        maps to a VersionedTable location — by default a directory under
        the catalog root; ``location`` registers an EXISTING table
        elsewhere (the external-table flavor).

        Re-creating a name that was dropped WITHOUT purge re-attaches the
        leftover table directory (external-table "undrop"): history,
        properties and constraints survive, and an initial ``df`` commits
        on top as a fresh snapshot. Use ``drop_table(purge=True)`` first
        for a truly clean slate. Defaulting onto a location owned by a
        LIVE table (possible after a metadata-only rename) raises."""
        if not name.isidentifier():
            raise ValueError(f"invalid table name {name!r}")

        def register(doc: dict) -> str:
            if name in doc["tables"]:
                raise ValueError(f"table {name!r} already exists in catalog")
            loc = location or os.path.join(self.root, name)
            if location is None and loc in doc["tables"].values():
                # a renamed table still occupies its original managed path
                # (rename is metadata-only); defaulting a NEW table onto
                # that live location would silently alias two catalog
                # names to one table — found by tests/test_property_ddl.py.
                # Registering an existing location on purpose stays
                # possible via explicit ``location=``.
                owner = next(n for n, l in doc["tables"].items() if l == loc)
                raise ValueError(
                    f"default location {loc!r} is owned by table {owner!r} "
                    f"(renamed away from {name!r}?); pass an explicit location"
                )
            doc["tables"][name] = loc
            return loc

        loc = self._mutate_doc(register)
        vt = VersionedTable(self.spark, loc, name=name)
        if df is not None:
            vt.overwrite(df)  # also registers the temp view (name set)
        return vt

    def table(self, name: str) -> VersionedTable:
        tables = self._doc()["tables"]
        if name not in tables:
            raise ValueError(f"table {name!r} not found in catalog")
        return VersionedTable(self.spark, tables[name], name=name)

    def list_tables(self) -> list[str]:
        return sorted(self._doc()["tables"])

    def sync(self, pinned: bool = False) -> "LakeCatalog":
        """(Re-)register every catalog table's current snapshot as a temp
        view so ``spark.sql`` resolves them by name — the hive-sync step,
        run per session or after external commits. ``pinned=True``
        registers the TRANSACTIONALLY CONSISTENT view instead (each
        table at its catalog-pinned version, ``read_pinned``) — SQL over
        a multi-table snapshot that no in-flight ``CatalogTransaction``
        commit can tear."""
        doc = self._doc()
        for name, loc in doc["tables"].items():
            df = (
                self.read_pinned(name)
                if pinned
                else VersionedTable(self.spark, loc).read()
            )
            df.createOrReplaceTempView(name)
        return self

    def drop_table(self, name: str, purge: bool = False) -> "LakeCatalog":
        """Remove the name from the catalog (Glue DROP TABLE). ``purge``
        also deletes the table data — default keeps it, matching
        external-table drop semantics."""
        import shutil

        def unregister(doc: dict) -> str:
            loc = doc["tables"].pop(name, None)
            if loc is None:
                raise ValueError(f"table {name!r} not found in catalog")
            return loc

        loc = self._mutate_doc(unregister)
        self.spark.catalog.dropTempView(name)
        if purge:
            shutil.rmtree(loc, ignore_errors=True)
        return self

    def rename_table(self, old: str, new: str) -> "LakeCatalog":
        """ALTER TABLE ... RENAME TO: remap the catalog name; the data
        location is untouched (a catalog rename is a metadata operation,
        exactly as in Glue/HMS — readers holding the location keep
        working)."""
        if not new.isidentifier():
            raise ValueError(f"invalid table name {new!r}")

        def remap(doc: dict) -> str:
            if old not in doc["tables"]:
                raise ValueError(f"table {old!r} not found in catalog")
            if new in doc["tables"] or new in doc.get("views", {}):
                raise ValueError(f"name {new!r} already exists in catalog")
            doc["tables"][new] = doc["tables"].pop(old)
            return doc["tables"][new]

        loc = self._mutate_doc(remap)
        self.spark.catalog.dropTempView(old)
        VersionedTable(self.spark, loc).read().createOrReplaceTempView(new)
        return self

    def create_view(self, name: str, sql: str) -> "LakeCatalog":
        """CREATE VIEW: store the SQL text durably; resolution happens at
        read time against the CURRENT table snapshots (a logical view,
        never materialized — the Glue/HMS view semantics)."""
        if not name.isidentifier():
            raise ValueError(f"invalid view name {name!r}")

        def add_view(doc: dict) -> None:
            if name in doc["tables"] or name in doc.setdefault("views", {}):
                raise ValueError(f"name {name!r} already exists in catalog")
            doc["views"][name] = sql

        self._mutate_doc(add_view)
        return self

    def view(self, name: str) -> DataFrame:
        """Resolve a stored view: sync the base tables, run the text."""
        views = self._doc().get("views", {})
        if name not in views:
            raise ValueError(f"view {name!r} not found in catalog")
        self.sync()
        return self.spark.sql(views[name])

    def list_views(self) -> list[str]:
        return sorted(self._doc().get("views", {}))

    def drop_view(self, name: str) -> "LakeCatalog":
        def remove_view(doc: dict) -> None:
            if name not in doc.get("views", {}):
                raise ValueError(f"view {name!r} not found in catalog")
            del doc["views"][name]

        self._mutate_doc(remove_view)
        return self

    def show_create_table(self, name: str) -> str:
        """SHOW CREATE TABLE: reconstruct the DDL from the live schema,
        location, and table properties/constraints — the portable
        statement another engine would need to re-register this table."""
        vt = self.table(name)
        cols = ",\n  ".join(
            f"{f.name} {f.dataType.simpleString().upper()}"
            for f in vt.read().schema.fields
        )
        lines = [f"CREATE TABLE {name} (\n  {cols}\n)"]
        lines.append(f"LOCATION '{self._doc()['tables'][name]}'")
        props = vt.properties()
        meta = vt._meta()
        for cname, expr in meta.get("constraints", {}).items():
            lines.append(f"CONSTRAINT {cname} CHECK ({expr})")
        for col in meta.get("not_null", []):
            lines.append(f"-- {col} NOT NULL")
        if props:
            kv = ", ".join(f"'{k}' = '{v}'" for k, v in sorted(props.items()))
            lines.append(f"TBLPROPERTIES ({kv})")
        return "\n".join(lines)


class CatalogTransaction:
    """Multi-table ACID transaction — the capability no single-table lake
    format ships (Delta/Hudi commit one table at a time) and the reason
    catalog-level-commit systems exist (Project Nessie, Iceberg REST
    catalog transactions — public designs this is the local analog of):
    several tables change with ALL-OR-NOTHING visibility.

    Mechanics, composed entirely from existing primitives:

    1. **Stage**: every ``write`` lands as a WAP-staged snapshot in its
       table — durable, auditable by version, invisible to readers.
    2. **Publish**: ``commit`` publishes each staged snapshot (per-table
       head advance; idempotent on retry after a crash).
    3. **Pin swap**: ONE atomic catalog-document replace records the new
       per-table pinned versions. Readers that resolve through
       ``LakeCatalog.read_pinned`` see the old pin set or the new one,
       never a mix — the catalog commit IS the visibility switch, even
       while step 2 is half done or the writer has crashed between
       publishes.

    Crash matrix: before any publish → staged snapshots are invisible,
    and ``read_pinned`` serves the pre-transaction state — via the head
    for never-pinned tables, via the BASELINE pins ``write`` took for
    tables this transaction touched. Those baseline pins survive the
    crash (tagged with the transaction id + timestamp); left alone they
    would freeze pinned reads below future non-transactional head
    advances, so detect and expire them with
    ``LakeCatalog.expire_abandoned_pins()`` (or ``rollback``).
    Between publishes → raw per-table heads may already show new data
    (exactly Delta's multi-table gap) but PINNED reads stay on the old
    consistent set; re-running ``commit`` completes idempotently.
    After the pin swap → fully committed.

    All catalog-document mutations (baseline pins, the commit's pin
    swap, rollback's pin removal) run under the cross-process catalog
    lock (``LakeCatalog.locked``), so two concurrent transactions — or
    a transaction racing ``create_table`` — cannot lose each other's
    updates to the shared document.

    Usage::

        with catalog.transaction() as txn:
            txn.write("orders", new_orders)
            txn.write("daily_summary", new_summary)
        # exiting without error commits; an exception rolls back
    """

    def __init__(self, catalog: "LakeCatalog"):
        self.catalog = catalog
        self._staged: dict[str, int] = {}
        self._baselined: set[str] = set()
        self._txn_id = uuid.uuid4().hex
        self._done = False

    def write(self, name: str, df: DataFrame) -> int:
        """Stage ``df`` as the transaction's snapshot of table ``name``
        (full-snapshot semantics, like ``overwrite``; derive from
        ``catalog.read_pinned(name)`` for read-modify-write). A second
        write to the same table replaces the first stage."""
        if self._done:
            raise RuntimeError("transaction already committed or rolled back")
        vt = self.catalog.table(name)
        head = vt.detail()["version"]

        def baseline(doc: dict) -> None:
            pins = doc.setdefault("pins", {})
            if name not in pins and head is not None:
                # BASELINE pin: freeze pinned readers at the
                # pre-transaction head before any publish can race them —
                # observably a no-op (pin == head) until the commit's pin
                # swap, and the reason the mid-commit crash window cannot
                # leak a half-committed view even for tables never pinned
                # before. Tagged with this transaction's id + timestamp
                # so an abandoned baseline (writer died before
                # commit/rollback) is detectable and expirable.
                pins[name] = head
                doc.setdefault("pin_baselines", {})[name] = {
                    "txn": self._txn_id,
                    "at": time.time(),
                }
                self._baselined.add(name)

        self.catalog._mutate_doc(baseline)
        if name in self._staged:
            vt.drop_staged(self._staged[name])
        self._staged[name] = vt.stage(df)
        return self._staged[name]

    def commit(self) -> dict[str, int]:
        """Publish every staged snapshot, then swap the pin set in one
        atomic catalog-doc replace. Returns the committed pins."""
        if self._done:
            raise RuntimeError("transaction already committed or rolled back")
        for name, version in sorted(self._staged.items()):
            vt = self.catalog.table(name)
            entry = next(
                (s for s in vt._snapshots() if s["version"] == version), None
            )
            if entry is None:
                raise ValueError(
                    f"staged snapshot {version} of {name!r} disappeared"
                )
            if entry.get("staged"):
                vt.publish(version)
            # else: already published by a crashed earlier commit — the
            # retry is idempotent and proceeds to the pin swap

        def swap(doc: dict) -> None:
            pins = dict(doc.get("pins", {}))
            pins.update(self._staged)
            doc["pins"] = pins
            # committed pins are no longer baselines — they must never
            # be expired as abandoned
            baselines = doc.get("pin_baselines", {})
            for name in self._staged:
                baselines.pop(name, None)

        self.catalog._mutate_doc(swap)
        self._done = True
        return dict(self._staged)

    def rollback(self) -> None:
        """Drop every staged snapshot; pins untouched."""
        if self._done:
            return
        for name, version in self._staged.items():
            try:
                self.catalog.table(name).drop_staged(version)
            except ValueError:
                pass  # already published by a crashed commit; pins decide
        if self._baselined:
            # remove the baseline pins this transaction introduced —
            # leaving them would freeze pinned reads below future
            # non-transactional head advances. Tag-checked: another
            # transaction (or an expiry) may have replaced the pin since;
            # only OUR baselines are removed.
            def unpin(doc: dict) -> None:
                pins = doc.get("pins", {})
                baselines = doc.get("pin_baselines", {})
                for name in self._baselined:
                    tag = baselines.get(name)
                    if tag and tag.get("txn") == self._txn_id:
                        pins.pop(name, None)
                        baselines.pop(name, None)

            self.catalog._mutate_doc(unpin)
        self._staged = {}
        self._done = True

    def __enter__(self) -> "CatalogTransaction":
        return self

    def __exit__(self, exc_type, exc, tb) -> bool:
        if exc_type is None:
            self.commit()
        else:
            self.rollback()
        return False


def _catalog_transaction(self) -> CatalogTransaction:
    return CatalogTransaction(self)


def _catalog_expire_abandoned_pins(
    self, max_age_seconds: float = 3600.0
) -> list[str]:
    """Expire BASELINE pins abandoned by transactions that died before
    commit/rollback (ADVICE r6): a baseline pin carries its transaction
    id + timestamp; one older than ``max_age_seconds`` is removed so
    ``read_pinned`` resumes tracking the published head. Committed pins
    (which carry no baseline tag — ``commit`` pops it in the same pin
    swap) are never touched. Returns the expired table names. Run it
    the way lake formats run lease expiry: periodically, with an age
    comfortably above any live transaction's duration."""

    def expire(doc: dict) -> list[str]:
        baselines = doc.get("pin_baselines", {})
        pins = doc.get("pins", {})
        now = time.time()
        expired = []
        for name, tag in list(baselines.items()):
            if now - float(tag.get("at", 0.0)) > max_age_seconds:
                baselines.pop(name)
                pins.pop(name, None)
                expired.append(name)
        return sorted(expired)

    return self._mutate_doc(expire)


def _catalog_read_pinned(self, name: str) -> DataFrame:
    """Read ``name`` at the catalog's pinned version — the consistent
    multi-table view ``CatalogTransaction.commit`` switches atomically.
    Tables never written through a transaction have no pin and serve
    their published head."""
    pin = self._doc().get("pins", {}).get(name)
    vt = self.table(name)
    return vt.read() if pin is None else vt.read(version=pin)


LakeCatalog.transaction = _catalog_transaction
LakeCatalog.read_pinned = _catalog_read_pinned
LakeCatalog.expire_abandoned_pins = _catalog_expire_abandoned_pins


def _catalog_create_materialized_view(
    self, name: str, sql: str
) -> VersionedTable:
    """Materialized view: the defining SQL is stored in the catalog and
    its result materialized as a managed ``VersionedTable`` — so the MV
    itself has snapshots, time travel, and CDF like any table, and each
    ``refresh_materialized_view`` is one more commit (readers stay
    consistent mid-refresh; DESCRIBE HISTORY shows every refresh).
    Base tables resolve by catalog name (``sync`` runs first). For
    aggregate-shaped views the incremental path
    (operators/materialized.py) can maintain the same stored table from
    CDF diffs; this surface is the full-recompute baseline."""
    self.sync()
    vt = self.create_table(name, self.spark.sql(sql))

    def add_mview(doc: dict) -> None:
        doc.setdefault("mviews", {})[name] = sql

    self._mutate_doc(add_mview)
    return vt


def _catalog_refresh_materialized_view(self, name: str) -> VersionedTable:
    """Recompute a materialized view from its stored defining SQL over
    the base tables' CURRENT state; the refresh is one table commit."""
    doc = self._doc()
    sql = doc.get("mviews", {}).get(name)
    if sql is None:
        raise ValueError(f"no materialized view {name!r} in catalog")
    self.sync()
    vt = self.table(name)
    vt.overwrite(self.spark.sql(sql))
    return vt


def _catalog_list_materialized_views(self) -> list[str]:
    return sorted(self._doc().get("mviews", {}))


LakeCatalog.create_materialized_view = _catalog_create_materialized_view
LakeCatalog.refresh_materialized_view = _catalog_refresh_materialized_view
LakeCatalog.list_materialized_views = _catalog_list_materialized_views


_MV_LIT = re.compile(r"'(?:[^']|'')*'")


def _normalize_sql_for_match(sql: str) -> tuple[str, tuple[str, ...]]:
    """Whitespace/case-insensitive canonical form with string literals
    masked out (so case-folding cannot touch literal CONTENT) and
    returned separately — two statements are equivalent for MV matching
    iff both the skeleton and the literal sequence agree."""
    lits: list[str] = []

    def mask(m: re.Match) -> str:
        lits.append(m.group(0))
        return f"\x00{len(lits) - 1}\x00"

    skeleton = _MV_LIT.sub(mask, sql)
    skeleton = re.sub(r"\s+", " ", skeleton).strip().rstrip(";").strip()
    return skeleton.casefold(), tuple(lits)


def _catalog_rewrite_with_materialized_views(
    self, sql: str
) -> tuple[str, str | None]:
    """Materialized-view matching, two tiers (the same ladder real
    warehouses climb):

    1. **exact text** — ``sql`` identical to a registered MV's defining
       statement up to whitespace, keyword case, and a trailing
       semicolon, string literals compared verbatim → serve
       ``SELECT * FROM <mv>``;
    2. **rollup containment** (round 9) — ``sql`` is a single-table
       GROUP BY aggregate whose group keys are a SUBSET of a stored
       view's keys, whose WHERE matches the view's (or adds predicates
       over view keys only, when the view has none), and whose every
       measure is derivable from the view's stored aggregates by
       re-aggregation (SUM→SUM, COUNT→SUM, MIN→MIN, MAX→MAX,
       AVG→SUM(sum)/SUM(count) when both parts are stored) → serve the
       rolled-up aggregate over the MV scan (see
       ``_containment_rewrite``).

    Anything else returns the SQL unchanged — loud pass-through, never
    a guess. Non-derivable measures (AVG without a stored count,
    DISTINCT aggregates, expressions) refuse by design.

    Returns ``(sql_to_run, mv_name_or_None)``."""
    want = _normalize_sql_for_match(sql)
    mviews = self._doc().get("mviews", {})
    for name, mv_sql in mviews.items():
        if _normalize_sql_for_match(mv_sql) == want:
            return f"SELECT * FROM {name}", name
    q = _parse_simple_aggregate(sql)
    if q is not None:
        for name, mv_sql in mviews.items():
            rewritten = _containment_rewrite(q, name, mv_sql)
            if rewritten is not None:
                return rewritten, name
    return sql, None


def _split_top_level_commas(s: str) -> list[str]:
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur).strip())
    return parts


_SIMPLE_AGG_SHAPE = re.compile(
    r"^select (?P<select>.+?) from (?P<table>[\w.]+)"
    r"(?: where (?P<where>.+?))?"
    r" group by (?P<group>.+)$"
)
_AGG_FN = re.compile(r"^(sum|count|min|max|avg)\s*\(\s*(\*|[\w.]+)\s*\)$")
_SELECT_ITEM = re.compile(r"^(?P<expr>.+?)(?: as (?P<alias>\w+))?$")
# tokens allowed in an extra WHERE besides view-key column references
_WHERE_NEUTRAL = frozenset(
    "and or not in between like is null true false".split()
)


def _parse_simple_aggregate(sql: str):
    """Parse the restricted aggregate shape the containment tier
    understands — ``SELECT <keys and aggregates> FROM <one table>
    [WHERE ...] GROUP BY <bare columns>`` — on the literal-masked,
    case-folded skeleton. Returns None for anything outside the shape
    (joins, HAVING, subqueries, expressions, DISTINCT, ORDER BY...),
    which makes the caller pass through. ``lits`` travels along so
    emission can restore literal content verbatim."""
    skeleton, lits = _normalize_sql_for_match(sql)
    m = _SIMPLE_AGG_SHAPE.match(skeleton)
    if m is None:
        return None
    keys = [k.strip() for k in m.group("group").split(",")]
    if not all(re.fullmatch(r"[\w.]+", k) for k in keys):
        return None
    items = []
    for raw in _split_top_level_commas(m.group("select")):
        im = _SELECT_ITEM.match(raw)
        expr, alias = im.group("expr").strip(), im.group("alias")
        fm = _AGG_FN.match(expr)
        if fm:
            if "distinct" in expr:
                return None
            items.append(("agg", fm.group(1), fm.group(2), alias))
        elif re.fullmatch(r"[\w.]+", expr):
            items.append(("key", expr, None, alias or expr))
        else:
            return None
    return {
        "items": items,
        "table": m.group("table"),
        "where": m.group("where"),
        "keys": keys,
        "lits": lits,
    }


def _unmask_literals(fragment: str, lits: tuple[str, ...]) -> str:
    return re.sub(
        "\x00(\\d+)\x00", lambda m: lits[int(m.group(1))], fragment
    )


def _containment_rewrite(q: dict, mv_name: str, mv_sql: str) -> str | None:
    """Try to serve parsed aggregate query ``q`` from materialized view
    ``mv_name`` by rollup re-aggregation; None = not contained.

    Soundness argument, part by part: (a) same base table and an
    IDENTICAL where clause (literal-verbatim) means the view's rows are
    exactly the query's input rows; with NO view predicate, extra query
    predicates referencing ONLY view group keys select whole view
    groups, so filtering the MV's group rows is equivalent to filtering
    base rows. (b) query keys ⊆ view keys means every query group is a
    disjoint union of view groups. (c) SUM/COUNT/MIN/MAX distribute
    over disjoint unions (COUNT re-aggregates as SUM of partial
    counts); AVG(x) = SUM(x)/COUNT(x) recomposed from stored parts.
    Therefore the rollup over the MV equals the aggregate over the
    base — exactly, not approximately (integer/decimal accumulators
    preserve bit-equality; the registry oracle pins it)."""
    v = _parse_simple_aggregate(mv_sql)
    if v is None or q["table"] != v["table"]:
        return None
    # -- predicate containment ------------------------------------------
    q_where = (
        _unmask_literals(q["where"], q["lits"]) if q["where"] else None
    )
    v_where = (
        _unmask_literals(v["where"], v["lits"]) if v["where"] else None
    )
    extra_where = None
    if q_where != v_where:
        if v_where is not None or q_where is None:
            return None
        idents = {
            t
            for t in re.findall(r"[a-z_]\w*", q["where"])
            if t not in _WHERE_NEUTRAL
        }
        if not idents <= set(v["keys"]):
            return None
        extra_where = q_where
    # -- key containment -------------------------------------------------
    if not set(q["keys"]) <= set(v["keys"]):
        return None
    # -- measure derivability ---------------------------------------------
    stored: dict[tuple[str, str], str] = {}
    for kind, fn, arg, alias in v["items"]:
        if kind == "agg":
            if alias is None:
                return None  # unnamed stored measure: not addressable
            stored[(fn, arg)] = alias
    out_items = []
    for kind, a, b, alias in q["items"]:
        if kind == "key":
            if a not in q["keys"]:
                return None
            out_items.append(a if alias == a else f"{a} AS {alias}")
            continue
        fn, arg = a, b
        if alias is None:
            # an unaliased aggregate's output column name comes from the
            # original expression text; serving it would need name
            # gymnastics the contract doesn't promise — refuse loudly
            return None
        if fn == "sum" and (fn, arg) in stored:
            out_items.append(f"SUM({stored[(fn, arg)]}) AS {alias}")
        elif fn == "count" and (fn, arg) in stored:
            out_items.append(f"SUM({stored[(fn, arg)]}) AS {alias}")
        elif fn in ("min", "max") and (fn, arg) in stored:
            out_items.append(
                f"{fn.upper()}({stored[(fn, arg)]}) AS {alias}"
            )
        elif (
            fn == "avg"
            and ("sum", arg) in stored
            and ("count", arg) in stored
        ):
            out_items.append(
                f"(SUM({stored[('sum', arg)]})"
                f" / SUM({stored[('count', arg)]})) AS {alias}"
            )
        else:
            return None  # non-derivable (e.g. AVG without stored count)
    sql = f"SELECT {', '.join(out_items)} FROM {mv_name}"
    if extra_where:
        sql += f" WHERE {extra_where}"
    sql += f" GROUP BY {', '.join(q['keys'])}"
    return sql


def _catalog_serve(self, sql: str):
    """Run ``sql`` with MV auto-rewrite: catalog names resolve first
    (sync), the exact-match tier substitutes a materialized scan when
    one applies, and the (possibly rewritten) statement executes."""
    self.sync()
    rewritten, _ = self.rewrite_with_materialized_views(sql)
    return self.spark.sql(rewritten)


LakeCatalog.rewrite_with_materialized_views = (
    _catalog_rewrite_with_materialized_views
)
LakeCatalog.serve = _catalog_serve
