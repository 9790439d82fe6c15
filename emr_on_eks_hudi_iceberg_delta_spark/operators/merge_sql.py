"""SQL ``MERGE INTO`` front-end over :class:`MergeIntoBuilder`.

The reference drives its merges with literal MERGE SQL strings —
``iceberg/iceberg_scd_script.py:76-82`` (``UPDATE SET * / INSERT *``) and
``delta/delta_scd_script.py:89-95`` (conditional ``UPDATE SET col = expr``)
— executed by the format plugins' SQL extensions. This module gives those
exact statements a home on plain DataFrames: a hand-rolled parser for the
MERGE grammar subset both lake formats share, lowered onto the same
oracle-proven join decomposition the builder already uses. A user's MERGE
string runs verbatim; only the catalog lookup changes.

Supported grammar (the reference's surface + the Delta builder surface)::

    MERGE INTO <table> [AS] [alias]
    USING (<subquery>) | <table>  [AS] [alias]
    ON <condition>
    [WHEN MATCHED [AND <cond>] THEN UPDATE SET * | UPDATE SET c = e, ...]
    [WHEN MATCHED [AND <cond>] THEN DELETE]
    [WHEN NOT MATCHED [BY TARGET] [AND <cond>] THEN
        INSERT * | INSERT (cols) VALUES (exprs)]
    [WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN
        UPDATE SET c = e, ... | DELETE]

Deliberately NOT a general SQL parser: one clause per kind, matched UPDATE
must precede matched DELETE (the builder's first-applicable-clause
ordering), and anything outside the subset raises ``ValueError`` instead
of guessing. Conditions and expressions are handed to Spark's own
expression parser (``F.expr``) after the statement aliases are rewritten
to the builder's canonical ``t``/``s`` — scale and semantics are therefore
identical to the programmatic builder (same joins, same cardinality
check), the front-end adds zero runtime cost.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .merge import MergeIntoBuilder

_WORD = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")


def _scan_balanced(s: str, i: int) -> int:
    """``s[i]`` must be '(' — return the index just past its match,
    honoring single/double-quoted strings."""
    depth, quote = 0, None
    n = len(s)
    while i < n:
        c = s[i]
        if quote:
            if c == quote:
                quote = None
        elif c in ("'", '"'):
            quote = c
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    raise ValueError("MERGE: unbalanced parentheses")


def _top_positions(s: str, word: str) -> list[int]:
    """Start offsets of ``word`` (case-insensitive, whole word) at paren
    depth 0 and outside string literals."""
    out: list[int] = []
    depth, quote, i, n = 0, None, 0, len(s)
    up, w = s.upper(), word.upper()
    wl = len(w)
    while i < n:
        c = s[i]
        if quote:
            if c == quote:
                quote = None
        elif c in ("'", '"'):
            quote = c
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif (
            depth == 0
            and up.startswith(w, i)
            and (i == 0 or not (up[i - 1].isalnum() or up[i - 1] == "_"))
            and (i + wl == n or not (up[i + wl].isalnum() or up[i + wl] == "_"))
        ):
            out.append(i)
            i += wl
            continue
        i += 1
    return out


def _split_top_commas(s: str) -> list[str]:
    parts, depth, quote, start = [], 0, None, 0
    for i, c in enumerate(s):
        if quote:
            if c == quote:
                quote = None
        elif c in ("'", '"'):
            quote = c
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "," and depth == 0:
            parts.append(s[start:i])
            start = i + 1
    parts.append(s[start:])
    return [p.strip() for p in parts]


def _ident_and_alias(fragment: str, what: str) -> tuple[str, str | None]:
    toks = fragment.split()
    if not toks:
        raise ValueError(f"MERGE: missing {what}")
    name = toks[0]
    rest = [t for t in toks[1:] if t.upper() != "AS"]
    if len(rest) > 1:
        raise ValueError(f"MERGE: cannot parse {what} clause {fragment!r}")
    alias = rest[0] if rest else None
    if alias is not None and not _WORD.fullmatch(alias):
        raise ValueError(f"MERGE: bad {what} alias {alias!r}")
    return name, alias


def _rewrite(expr: str, talias: str | None, salias: str | None) -> str:
    """Map the statement's aliases onto the builder's canonical t/s."""
    if talias and talias != "t":
        expr = re.sub(rf"\b{re.escape(talias)}\s*\.", "t.", expr, flags=re.I)
    if salias and salias != "s":
        expr = re.sub(rf"\b{re.escape(salias)}\s*\.", "s.", expr, flags=re.I)
    return expr


def _parse_assignments(
    body: str, talias: str | None, salias: str | None
) -> dict[str, F.Column]:
    out: dict[str, F.Column] = {}
    for part in _split_top_commas(body):
        i = _find_top_eq(part)
        lhs, rhs = part[:i].strip(), part[i + 1 :].strip()
        # LHS is a target column, optionally alias-qualified
        prefix = rf"^(?:{re.escape(talias)}|t)\s*\.\s*" if talias else r"^t\s*\.\s*"
        lhs = re.sub(prefix, "", lhs, flags=re.I)
        if not _WORD.fullmatch(lhs):
            raise ValueError(f"MERGE: bad SET column {part!r}")
        if lhs in out:
            raise ValueError(f"MERGE: column {lhs!r} assigned twice")
        out[lhs] = F.expr(_rewrite(rhs, talias, salias))
    return out


def _find_top_eq(s: str) -> int:
    depth, quote = 0, None
    for i, c in enumerate(s):
        if quote:
            if c == quote:
                quote = None
        elif c in ("'", '"'):
            quote = c
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "=" and depth == 0:
            # skip comparison operators <=, >=, !=, == (SET uses bare =)
            if i > 0 and s[i - 1] in "<>!=":
                continue
            if i + 1 < len(s) and s[i + 1] == "=":
                continue
            return i
    raise ValueError(f"MERGE: assignment without '=' in {s!r}")


def parse_merge(sql: str) -> dict:
    """Parse a MERGE statement into a plain spec dict (no Spark objects) —
    separated from execution so tests can pin the grammar exactly."""
    s = sql.strip().rstrip(";")
    m = re.match(r"\s*MERGE\s+INTO\s+", s, re.I)
    if not m:
        raise ValueError("MERGE: statement must start with MERGE INTO")
    rest = s[m.end() :]

    using_pos = _top_positions(rest, "USING")
    if len(using_pos) != 1:
        raise ValueError("MERGE: expected exactly one top-level USING")
    target_name, talias = _ident_and_alias(rest[: using_pos[0]], "target")
    rest = rest[using_pos[0] + len("USING") :]

    on_pos = _top_positions(rest, "ON")
    if not on_pos:
        raise ValueError("MERGE: missing ON condition")
    using_frag = rest[: on_pos[0]].strip()
    after_on = rest[on_pos[0] + 2 :]

    if using_frag.startswith("("):
        end = _scan_balanced(using_frag, 0)
        source_sql = using_frag[1 : end - 1].strip()
        source_name = None
        alias_frag = using_frag[end:].strip()
        salias = None
        if alias_frag:
            toks = [t for t in alias_frag.split() if t.upper() != "AS"]
            if len(toks) != 1 or not _WORD.fullmatch(toks[0]):
                raise ValueError(f"MERGE: bad source alias {alias_frag!r}")
            salias = toks[0]
    else:
        source_sql = None
        source_name, salias = _ident_and_alias(using_frag, "source")

    # a clause-opening WHEN is followed by MATCHED / NOT MATCHED — this is
    # what keeps an unparenthesized CASE WHEN inside the ON condition (or a
    # clause condition) from splitting the statement early
    when_pos = [
        p
        for p in _top_positions(after_on, "WHEN")
        if re.match(r"\s*(NOT\s+)?MATCHED\b", after_on[p + 4 :], re.I)
    ]
    if not when_pos:
        raise ValueError("MERGE: at least one WHEN clause is required")
    on_cond = after_on[: when_pos[0]].strip()
    if not on_cond:
        raise ValueError("MERGE: empty ON condition")

    clauses = []
    bounds = when_pos + [len(after_on)]
    for a, b in zip(bounds, bounds[1:]):
        clauses.append(after_on[a + len("WHEN") : b].strip())

    spec = {
        "target": target_name,
        "target_alias": talias,
        "source": source_name,
        "source_sql": source_sql,
        "source_alias": salias,
        "on": on_cond,
        "clauses": [],
    }
    for clause in clauses:
        cm = re.match(
            r"(?is)^(?P<kind>NOT\s+MATCHED\s+BY\s+SOURCE|NOT\s+MATCHED"
            r"(?:\s+BY\s+TARGET)?|MATCHED)\s*(?P<rest>.*)$",
            clause,
        )
        if not cm:
            raise ValueError(f"MERGE: cannot parse WHEN clause {clause!r}")
        kind = re.sub(r"\s+", " ", cm.group("kind").upper())
        if kind == "NOT MATCHED BY TARGET":
            kind = "NOT MATCHED"
        rest_c = cm.group("rest").strip()
        cond = None
        if rest_c.upper().startswith("AND"):
            # the clause-closing THEN is followed by an action keyword,
            # which disambiguates it from a CASE ... THEN in the condition
            then_pos = [
                p
                for p in _top_positions(rest_c, "THEN")
                if re.match(
                    r"\s*(UPDATE|DELETE|INSERT)\b", rest_c[p + 4 :], re.I
                )
            ]
            if not then_pos:
                raise ValueError(f"MERGE: WHEN clause missing THEN: {clause!r}")
            cond = rest_c[3 : then_pos[0]].strip()
            rest_c = rest_c[then_pos[0] :]
        if not rest_c.upper().startswith("THEN"):
            raise ValueError(f"MERGE: WHEN clause missing THEN: {clause!r}")
        action = rest_c[4:].strip()
        spec["clauses"].append({"kind": kind, "condition": cond, "action": action})
    return spec


def _literal_spans(s: str) -> list[tuple[int, int]]:
    """Half-open [start, end) spans of ``'...'`` string literals (with
    SQL ``''`` escaping) and `` `...` `` quoted identifiers — the regions
    where rewrite trigger substrings are DATA, not syntax."""
    spans = []
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if ch == "'":
            j = i + 1
            while j < n:
                if s[j] == "'":
                    if j + 1 < n and s[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            spans.append((i, min(j + 1, n)))
            i = j + 1
        elif ch == "`":
            j = s.find("`", i + 1)
            j = n - 1 if j < 0 else j
            spans.append((i, j + 1))
            i = j + 1
        else:
            i += 1
    return spans


def _sub_outside_literals(pattern: str, repl, s: str) -> str:
    """``re.sub`` that skips matches STARTING inside a string literal or
    quoted identifier (a match may legitimately extend into one — e.g.
    the ``'<ts>'`` value of ``TIMESTAMP AS OF``)."""
    spans = _literal_spans(s)

    def outside(pos: int) -> bool:
        return not any(a <= pos < b for a, b in spans)

    out = []
    last = 0
    for m in re.finditer(pattern, s, flags=re.I):
        if m.start() < last or not outside(m.start()):
            continue
        out.append(s[last:m.start()])
        out.append(repl(m))
        last = m.end()
    out.append(s[last:])
    return "".join(out)


def _top_keyword(s: str, word: str) -> list[int]:
    """``_top_positions`` additionally gated by ``_literal_spans`` so a
    keyword inside a backtick-quoted identifier is data, not syntax
    (single/double quotes are already handled by ``_top_positions``)."""
    spans = _literal_spans(s)
    return [
        p
        for p in _top_positions(s, word)
        if not any(a <= p < b for a, b in spans)
    ]


QUALIFY_COL = "__qualify__"


def rewrite_qualify(sql: str) -> tuple[str, bool]:
    """Desugar a Snowflake/DuckDB-style ``QUALIFY`` clause (filter on
    window-function results — the four-line idiom "rank then filter the
    rank" as one declarative clause) into plain Spark SQL::

        SELECT <list> FROM ... [WHERE ...] [GROUP BY ...]
        QUALIFY <pred> [ORDER BY ...] [LIMIT ...]
      ->
        SELECT * FROM (
            SELECT <list>, (<pred>) AS __qualify__ FROM ... [WHERE ...]
        ) __qualify_src WHERE __qualify__ [ORDER BY ...] [LIMIT ...]

    The predicate is evaluated IN THE SELECT'S OWN SCOPE (so its window
    functions see the post-WHERE / post-GROUP-BY rows, exactly the
    standard QUALIFY evaluation order), and the caller drops the helper
    column — Catalyst collapses the whole desugaring back into a single
    Window + Filter, so the plan is identical to the hand-written form.

    Returns ``(rewritten, True)`` or ``(sql, False)`` when no top-level
    QUALIFY exists. Literal-aware: ``' QUALIFY '`` inside a string or a
    backtick identifier never triggers. Statements where the injection
    would silently change semantics — ``SELECT DISTINCT``, set
    operations at top level, multiple QUALIFYs — are REFUSED loudly
    (round-7 rewrite discipline: correct rewrite or loud refusal, never
    silent misparse).
    """
    qpos = _top_keyword(sql, "QUALIFY")
    if not qpos:
        return sql, False
    if len(qpos) > 1:
        raise ValueError("QUALIFY: multiple top-level QUALIFY clauses")
    for kw in ("UNION", "INTERSECT", "EXCEPT"):
        if _top_keyword(sql, kw):
            raise ValueError(
                f"QUALIFY: top-level {kw} is ambiguous — parenthesize "
                "the branch the QUALIFY belongs to"
            )
    i = qpos[0]
    head, rest = sql[:i].rstrip(), sql[i + len("QUALIFY"):]
    tail_at = min(
        [len(rest)]
        + [p for kw in ("ORDER", "LIMIT") for p in _top_keyword(rest, kw)]
    )
    pred, tail = rest[:tail_at].strip(), rest[tail_at:].strip()
    if not pred:
        raise ValueError("QUALIFY: empty predicate")
    sels = _top_keyword(head, "SELECT")
    if not sels:
        raise ValueError("QUALIFY: no top-level SELECT to attach to")
    last_sel = sels[-1]
    if re.match(r"\s*DISTINCT\b", head[last_sel + 6:], re.I):
        raise ValueError(
            "QUALIFY: SELECT DISTINCT is not supported (the helper "
            "column would change the distinct key) — filter a subquery"
        )
    froms = [p for p in _top_keyword(head, "FROM") if p > last_sel]
    if not froms:
        raise ValueError("QUALIFY: final SELECT has no top-level FROM")
    f = froms[0]
    inner = f"{head[:f].rstrip()}, ({pred}) AS {QUALIFY_COL} {head[f:]}"
    return (
        f"SELECT * FROM ({inner}) __qualify_src WHERE {QUALIFY_COL} {tail}",
        True,
    )


def run_dml(spark: SparkSession, sql: str, tables: dict | None = None, catalog=None):
    """Execute a non-MERGE DML or utility statement against a
    ``VersionedTable`` — the rest of the statement surface a lake user runs
    as SQL strings (Delta / Iceberg DML + utility SQL)::

        DELETE FROM t WHERE <cond>
        UPDATE t SET c = e[, ...] [WHERE <cond>]
        INSERT INTO t SELECT ...  |  INSERT INTO t VALUES (...), (...)
        INSERT INTO t REPLACE WHERE <cond> SELECT ...   -- selective overwrite
        RESTORE TABLE t TO VERSION AS OF <n>
        VACUUM t [RETAIN <n> VERSIONS]
        OPTIMIZE t [ZORDER BY (c, ...)]
        DESCRIBE HISTORY t            -- returns the history DataFrame
        ALTER TABLE t ADD COLUMN[S] [(]c type[)]
        ALTER TABLE t RENAME COLUMN a TO b
        ALTER TABLE t DROP COLUMN[S] [(]c[)]
        ALTER TABLE t ADD CONSTRAINT n CHECK (expr)
        ALTER TABLE t DROP CONSTRAINT n
        ALTER TABLE t SET TBLPROPERTIES (k = v, ...)
        ALTER TABLE t UNSET TBLPROPERTIES (k, ...)
        ALTER TABLE t ALTER COLUMN c SET NOT NULL | DROP NOT NULL
        SHOW TBLPROPERTIES t          -- returns (key, value) rows
        VACUUM t [RETAIN n VERSIONS] DRY RUN   -- returns would-delete paths
        CALL system.rollback_to_snapshot('t', v)   -- Iceberg procedures
        CALL system.cherrypick_snapshot('t', v)    -- (positional or
        CALL system.revert_commit('t', v)          --  name => value args)
        CALL system.expire_snapshots(table => 't', retain_last => n)
        CALL system.purge_rows(table => 't', where => '<pred>')
        CALL system.build_record_index(table => 't', key_cols => 'a,b')
        CALL system.create_branch('t', branch => 'b')  -- WAP surface
        CALL system.create_tag('t', tag => 'v1' [, version => n])
        CALL system.fast_forward('t', branch => 'b')
        CALL system.drop_branch('t', branch => 'b')
        SELECT ... FROM t VERSION AS OF n        -- time-travel reads,
        SELECT ... FROM t TIMESTAMP AS OF 'ts'   -- per-reference rewrite
        SELECT ... FROM table_changes('t', a, b) -- CDF rows per commit
        COPY INTO t FROM '<path>' [FILEFORMAT = fmt] [PATTERN = '<glob>']

    With a ``catalog`` (LakeCatalog), the catalog DDL surface too::

        CREATE TABLE t AS SELECT ...            -- CTAS into the catalog
        CREATE TABLE t LOCATION '<path>'        -- register external table
        ALTER TABLE a RENAME TO b               -- catalog rename
        CREATE VIEW v AS SELECT ... | DROP VIEW v
        SHOW CREATE TABLE t                     -- reconstructed DDL
        INSERT OVERWRITE [TABLE] t SELECT ...   -- full overwrite
        DROP TABLE t [PURGE]
        SHOW TABLES                             -- returns a DataFrame
        DESCRIBE TABLE t                        -- returns (col, type) rows

    Catalog-registered names also resolve as DML targets, so a session
    can run its whole statement stream through one entry point.

    ``tables`` maps statement table names to VersionedTable instances; each
    mutating statement commits one new snapshot through the table's own CoW
    path (``delete_where`` / ``update_where`` / ``append`` / ``restore`` /
    ``compact``), so OCC, constraints, and time travel all apply exactly as
    for the programmatic API. Conditions and assignment expressions are
    passed through to Spark's expression parser untouched — unqualified
    column references, as is standard for single-table DML. Returns a
    DataFrame for DESCRIBE HISTORY, else None.
    """
    s = sql.strip().rstrip(";")
    tables = tables or {}

    def _table(name: str):
        key = name if name in tables else name.split(".")[-1]
        if key in tables:
            return tables[key]
        if catalog is not None:
            try:
                return catalog.table(key)
            except ValueError:
                pass
        raise ValueError(f"DML: unknown table {name!r}")

    if re.match(r"\s*(SELECT|WITH)\b", s, re.I) and (
        re.search(r"\btable_changes\s*\(", s, re.I)
        or re.search(r"\b(VERSION|TIMESTAMP)\s+AS\s+OF\b", s, re.I)
        or _top_keyword(s, "QUALIFY")
    ):
        # SELECT rewrite pass — BOTH sugar forms in one statement are
        # fine (each rewrites independently into temp views, then the
        # statement runs as plain Spark SQL):
        #   table_changes('t', a, b)  — Delta CDF rows per commit
        #   t VERSION AS OF n / t TIMESTAMP AS OF 'ts' — time travel
        # Substitution is LITERAL-AWARE (round-7 task 5): a trigger
        # substring inside a '...' string or `...` quoted identifier is
        # data, not syntax, and must survive the rewrite byte-for-byte —
        # matches starting inside a literal span are skipped. (The value
        # of TIMESTAMP AS OF '<ts>' is itself a literal, which is why
        # spans gate the match START, not the whole match.)
        def _tc(m: "re.Match[str]") -> str:
            name = m.group("t")
            lo, hi = int(m.group("a")), int(m.group("b"))
            df = _table(name).changes_per_commit(lo, hi)
            view = f"__tc_{name.replace('.', '_')}_{lo}_{hi}"
            df.createOrReplaceTempView(view)
            return f" {view} "

        def _tt(m: "re.Match[str]") -> str:
            name = m.group("t")
            kind = m.group("k").upper()
            val = m.group("v").strip().strip("'\"")
            vt = _table(name)
            df = (
                vt.read(version=int(val))
                if kind == "VERSION"
                else vt.read_as_of(val)
            )
            view = (
                f"__tt_{name.replace('.', '_')}_{kind}_"
                f"{re.sub(r'[^A-Za-z0-9]', '_', val)}"
            )
            df.createOrReplaceTempView(view)
            return f" {view} "

        rewritten = _sub_outside_literals(
            r"\btable_changes\s*\(\s*'(?P<t>[\w.]+)'\s*,\s*(?P<a>\d+)\s*,"
            r"\s*(?P<b>\d+)\s*\)",
            _tc,
            s,
        )
        rewritten = _sub_outside_literals(
            r"\b(?P<t>[\w.]+)\s+(?P<k>VERSION|TIMESTAMP)\s+AS\s+OF\s+"
            r"(?P<v>'[^']*'|\d+)",
            _tt,
            rewritten,
        )
        rewritten, qualified = rewrite_qualify(rewritten)
        out = spark.sql(rewritten)
        return out.drop(QUALIFY_COL) if qualified else out

    if catalog is not None:
        m = re.match(
            r"\s*CREATE\s+TABLE\s+(?P<t>\w+)\s+AS\s+(?P<q>.+)$", s, re.I | re.S
        )
        if m:
            catalog.create_table(m.group("t"), spark.sql(m.group("q")))
            return
        m = re.match(
            r"\s*CREATE\s+TABLE\s+(?P<t>\w+)\s+LOCATION\s+'(?P<l>[^']+)'\s*$",
            s,
            re.I,
        )
        if m:
            catalog.create_table(m.group("t"), location=m.group("l"))
            return
        m = re.match(
            r"\s*DROP\s+TABLE\s+(?P<t>\w+)(?P<purge>\s+PURGE)?\s*$", s, re.I
        )
        if m:
            catalog.drop_table(m.group("t"), purge=bool(m.group("purge")))
            return
        m = re.match(
            r"\s*ALTER\s+TABLE\s+(?P<a>\w+)\s+RENAME\s+TO\s+(?P<b>\w+)\s*$",
            s,
            re.I,
        )
        if m:
            catalog.rename_table(m.group("a"), m.group("b"))
            return
        m = re.match(
            r"\s*CREATE\s+MATERIALIZED\s+VIEW\s+(?P<v>\w+)\s+AS\s+(?P<q>.+)$",
            s,
            re.I | re.S,
        )
        if m:
            catalog.create_materialized_view(m.group("v"), m.group("q").strip())
            return
        m = re.match(
            r"\s*REFRESH\s+MATERIALIZED\s+VIEW\s+(?P<v>\w+)\s*$", s, re.I
        )
        if m:
            catalog.refresh_materialized_view(m.group("v"))
            return
        m = re.match(
            r"\s*CREATE\s+VIEW\s+(?P<v>\w+)\s+AS\s+(?P<q>.+)$", s, re.I | re.S
        )
        if m:
            catalog.create_view(m.group("v"), m.group("q").strip())
            return
        m = re.match(r"\s*DROP\s+VIEW\s+(?P<v>\w+)\s*$", s, re.I)
        if m:
            catalog.drop_view(m.group("v"))
            return
        m = re.match(r"\s*SELECT\s+\*\s+FROM\s+(?P<v>\w+)\s*$", s, re.I)
        if m and m.group("v") in catalog.list_views():
            return catalog.view(m.group("v"))
        m = re.match(r"\s*SHOW\s+CREATE\s+TABLE\s+(?P<t>\w+)\s*$", s, re.I)
        if m:
            return spark.createDataFrame(
                [(catalog.show_create_table(m.group("t")),)],
                "createtab_stmt string",
            )
        if re.match(r"\s*SHOW\s+TABLES\s*$", s, re.I):
            return spark.createDataFrame(
                [(t,) for t in catalog.list_tables()], "table string"
            )
        m = re.match(r"\s*DESCRIBE\s+TABLE\s+(?P<t>\w+)\s*$", s, re.I)
        if m:
            schema = catalog.table(m.group("t")).read().schema
            return spark.createDataFrame(
                [(f.name, f.dataType.simpleString()) for f in schema],
                "col_name string, data_type string",
            )

    m = re.match(r"\s*DELETE\s+FROM\s+(?P<t>[\w.]+)\s+WHERE\s+(?P<c>.+)$", s, re.I | re.S)
    if m:
        _table(m.group("t")).delete_where(m.group("c").strip())
        return
    m = re.match(r"\s*UPDATE\s+(?P<t>[\w.]+)\s+SET\s+(?P<rest>.+)$", s, re.I | re.S)
    if m:
        rest = m.group("rest")
        where_pos = _top_positions(rest, "WHERE")
        if where_pos:
            body, cond = rest[: where_pos[0]], rest[where_pos[0] + 5 :].strip()
        else:
            body, cond = rest, "true"
        assignments = {}
        for part in _split_top_commas(body):
            i = _find_top_eq(part)
            lhs, rhs = part[:i].strip(), part[i + 1 :].strip()
            if not _WORD.fullmatch(lhs):
                raise ValueError(f"DML: bad SET column in {part!r}")
            assignments[lhs] = rhs
        _table(m.group("t")).update_where(cond, assignments)
        return
    m = re.match(
        r"\s*INSERT\s+INTO\s+(?P<t>[\w.]+)\s+REPLACE\s+WHERE\s+(?P<rest>.+)$",
        s,
        re.I | re.S,
    )
    if m:
        # Delta's selective overwrite: the predicate runs to the first
        # top-level SELECT/VALUES keyword, the remainder is the source
        vt = _table(m.group("t"))
        rest = m.group("rest")
        starts = sorted(
            p
            for w in ("SELECT", "WITH", "VALUES")
            for p in _top_positions(rest, w)
        )
        if not starts:
            raise ValueError("DML: REPLACE WHERE without a source query")
        cond, src = rest[: starts[0]].strip(), rest[starts[0] :].strip()
        if src.upper().startswith("VALUES"):
            df = spark.sql(src).toDF(*vt.read().columns)
        else:
            df = spark.sql(src)
        vt.replace_where(cond, df)
        return
    m = re.match(
        r"\s*INSERT\s+OVERWRITE\s+(?:TABLE\s+)?(?P<t>[\w.]+)\s+(?P<rest>.+)$",
        s,
        re.I | re.S,
    )
    if m:
        vt = _table(m.group("t"))
        rest = m.group("rest").strip()
        if rest.upper().startswith("VALUES"):
            df = spark.sql(rest).toDF(*vt.read().columns)
        elif rest.upper().startswith(("SELECT", "WITH")):
            df = spark.sql(rest)
        else:
            raise ValueError(f"DML: cannot parse INSERT OVERWRITE source {rest!r}")
        vt.overwrite(df)
        return
    m = re.match(r"\s*INSERT\s+INTO\s+(?P<t>[\w.]+)\s+(?P<rest>.+)$", s, re.I | re.S)
    if m:
        vt = _table(m.group("t"))
        rest = m.group("rest").strip()
        if rest.startswith("(") and _scan_balanced(rest, 0) == len(rest):
            rest = rest[1:-1].strip()
        if rest.upper().startswith("VALUES"):
            df = spark.sql(rest).toDF(*vt.read().columns)
        elif rest.upper().startswith(("SELECT", "WITH")):
            df = spark.sql(rest)
        else:
            raise ValueError(f"DML: cannot parse INSERT source {rest!r}")
        vt.append(df)
        return
    m = re.match(
        r"\s*RESTORE\s+TABLE\s+(?P<t>[\w.]+)\s+TO\s+VERSION\s+AS\s+OF\s+(?P<v>\d+)\s*$",
        s,
        re.I,
    )
    if m:
        _table(m.group("t")).restore(int(m.group("v")))
        return
    m = re.match(
        r"\s*COPY\s+INTO\s+(?P<t>[\w.]+)\s+FROM\s+'(?P<p>[^']+)'"
        r"(?:\s+FILEFORMAT\s*=\s*(?P<f>\w+))?"
        r"(?:\s+PATTERN\s*=\s*'(?P<g>[^']+)')?\s*$",
        s,
        re.I,
    )
    if m:
        loaded = _table(m.group("t")).copy_into(
            m.group("p"),
            file_format=(m.group("f") or "parquet").lower(),
            pattern=m.group("g"),
        )
        return spark.createDataFrame(
            [(p,) for p in loaded], "loaded_file string"
        )
    m = re.match(
        r"\s*CALL\s+system\.(?P<proc>\w+)\s*\((?P<args>.*)\)\s*$", s, re.I | re.S
    )
    if m:
        # Iceberg-style maintenance procedures (public Spark-SQL surface:
        # CALL catalog.system.<proc>(...)): positional or `name => value`
        # arguments, string literals quoted
        named: dict[str, str] = {}
        pos: list[str] = []
        for part in _split_top_commas(m.group("args")):
            part = part.strip()
            if not part:
                continue
            am = re.match(r"(?P<k>\w+)\s*=>\s*(?P<v>.+)$", part, re.S)
            if am:
                named[am.group("k").lower()] = am.group("v").strip().strip("'\"")
            else:
                pos.append(part.strip().strip("'\""))
        proc = m.group("proc").lower()
        tname = named.get("table", pos[0] if pos else None)
        if tname is None:
            raise ValueError(f"CALL system.{proc}: missing table argument")
        vt = _table(tname)

        def _arg(key: str, default=None):
            # NB: named wins; the positional fallback must be looked up
            # lazily (pos may be empty when every arg is named)
            if key in named:
                return named[key]
            if len(pos) > 1:
                return pos[1]
            return default

        if proc == "rollback_to_snapshot":
            vt.restore(int(_arg("version")))
            return
        if proc == "cherrypick_snapshot":
            vt.cherry_pick(int(_arg("version")))
            return
        if proc == "revert_commit":
            vt.revert(int(_arg("version")))
            return
        if proc == "expire_snapshots":
            vt.vacuum(keep_last=int(_arg("retain_last", 1)))
            return
        if proc == "purge_rows":
            # GDPR history purge as a procedure (Delta REORG ... APPLY
            # (PURGE) reaches only the head; this one reaches history)
            where = _arg("where")
            if where is None:
                raise ValueError(
                    "CALL system.purge_rows: missing where argument"
                )
            out = vt.purge_rows(where)
            return spark.createDataFrame(
                [(out["dirs_rewritten"], out["rows_removed"])],
                "dirs_rewritten int, rows_removed bigint",
            )
        if proc == "build_record_index":
            cols = _arg("key_cols")
            if cols is None:
                raise ValueError(
                    "CALL system.build_record_index: missing key_cols"
                )
            vt.build_record_index([c.strip() for c in cols.split(",")])
            return
        if proc == "create_branch":
            vt.create_branch(_arg("branch"))
            return
        if proc == "create_tag":
            v = named.get("version")
            vt.tag(_arg("tag"), int(v) if v is not None else None)
            return
        if proc == "fast_forward":
            vt.fast_forward(_arg("branch"))
            return
        if proc == "drop_branch":
            vt.drop_branch(_arg("branch"))
            return
        if proc == "remove_orphan_files":
            # Iceberg maintenance-procedure parity; dry_run => 'true'
            # reports without deleting
            paths = vt.remove_orphan_files(
                older_than_seconds=float(_arg("older_than_seconds", 86400.0)),
                dry_run=str(_arg("dry_run", "false")).lower() == "true",
            )
            return spark.createDataFrame(
                [(p,) for p in paths], "path string"
            )
        raise ValueError(f"DML: unknown procedure system.{proc}")
    m = re.match(
        r"\s*VACUUM\s+(?P<t>[\w.]+)(?:\s+RETAIN\s+(?P<n>\d+)\s+VERSIONS)?"
        r"(?P<dry>\s+DRY\s+RUN)?\s*$",
        s,
        re.I,
    )
    if m:
        vt = _table(m.group("t"))
        keep = int(m.group("n") or 1)
        if m.group("dry"):
            return spark.createDataFrame(
                [(p,) for p in vt.vacuum(keep_last=keep, dry_run=True)],
                "path string",
            )
        vt.vacuum(keep_last=keep)
        return
    m = re.match(
        r"\s*OPTIMIZE\s+(?P<t>[\w.]+)(?:\s+ZORDER\s+BY\s*\((?P<cols>[^)]+)\))?\s*$",
        s,
        re.I,
    )
    if m:
        cols = (
            [c.strip() for c in m.group("cols").split(",")] if m.group("cols") else None
        )
        _table(m.group("t")).compact(zorder_by=cols)
        return
    m = re.match(r"\s*SHOW\s+TBLPROPERTIES\s+(?P<t>[\w.]+)\s*$", s, re.I)
    if m:
        props = _table(m.group("t")).properties()
        return spark.createDataFrame(
            [(k, str(v)) for k, v in sorted(props.items())],
            "key string, value string",
        )
    m = re.match(r"\s*DESCRIBE\s+HISTORY\s+(?P<t>[\w.]+)\s*$", s, re.I)
    if m:
        return _table(m.group("t")).history_df()
    m = re.match(r"\s*DESCRIBE\s+DETAIL\s+(?P<t>[\w.]+)\s*$", s, re.I)
    if m:
        # Delta DESCRIBE DETAIL: surface VersionedTable.detail()'s
        # operational summary as a one-row DataFrame — the numbers a
        # maintenance runbook (OPTIMIZE/VACUUM sizing) starts from
        d = _table(m.group("t")).detail()
        return spark.createDataFrame(
            [
                (
                    d["location"],
                    d["version"],
                    d["num_snapshots"],
                    d["num_files"],
                    int(d["size_bytes"]),
                    len(d["constraints"]),
                )
            ],
            "location string, version bigint, num_snapshots int, "
            "num_files int, size_bytes bigint, num_constraints int",
        )
    m = re.match(
        r"\s*ALTER\s+TABLE\s+(?P<t>[\w.]+)\s+(?P<rest>.+)$", s, re.I | re.S
    )
    if m:
        # the schema-evolution + constraint DDL surface (Delta ALTER TABLE
        # statements), lowered onto the table's own CoW snapshot commits
        vt = _table(m.group("t"))
        rest = m.group("rest").strip()
        am = re.match(
            r"ADD\s+COLUMNS?\s*\(\s*(?P<c>\w+)\s+(?P<ty>[\w()<>,\s]+?)\s*\)\s*$"
            r"|ADD\s+COLUMNS?\s+(?P<c2>\w+)\s+(?P<ty2>[\w()<>,]+)\s*$",
            rest,
            re.I,
        )
        if am:
            vt.add_column(
                am.group("c") or am.group("c2"),
                (am.group("ty") or am.group("ty2")).strip(),
            )
            return
        am = re.match(
            r"RENAME\s+COLUMN\s+(?P<a>\w+)\s+TO\s+(?P<b>\w+)\s*$", rest, re.I
        )
        if am:
            vt.rename_column(am.group("a"), am.group("b"))
            return
        am = re.match(
            r"DROP\s+COLUMNS?\s*\(\s*(?P<c>\w+)\s*\)\s*$"
            r"|DROP\s+COLUMNS?\s+(?P<c2>\w+)\s*$",
            rest,
            re.I,
        )
        if am:
            vt.drop_column(am.group("c") or am.group("c2"))
            return
        am = re.match(
            r"ADD\s+CONSTRAINT\s+(?P<n>\w+)\s+CHECK\s*(?P<e>\(.+\))\s*$",
            rest,
            re.I | re.S,
        )
        if am:
            vt.add_constraint(am.group("n"), am.group("e"))
            return
        am = re.match(r"DROP\s+CONSTRAINT\s+(?P<n>\w+)\s*$", rest, re.I)
        if am:
            vt.drop_constraint(am.group("n"))
            return
        am = re.match(
            r"SET\s+TBLPROPERTIES\s*\((?P<kv>.+)\)\s*$", rest, re.I | re.S
        )
        if am:
            for part in _split_top_commas(am.group("kv")):
                i = _find_top_eq(part)
                key = part[:i].strip().strip("'\"")
                val = part[i + 1 :].strip().strip("'\"")
                lowered = {"true": True, "false": False}.get(val.lower(), val)
                vt.set_property(key, lowered)
            return
        am = re.match(
            r"UNSET\s+TBLPROPERTIES\s*\((?P<k>.+)\)\s*$", rest, re.I | re.S
        )
        if am:
            for part in _split_top_commas(am.group("k")):
                vt.unset_property(part.strip().strip("'\""))
            return
        am = re.match(
            r"ALTER\s+COLUMN\s+(?P<c>\w+)\s+SET\s+NOT\s+NULL\s*$", rest, re.I
        )
        if am:
            vt.set_not_null(am.group("c"))
            return
        am = re.match(
            r"ALTER\s+COLUMN\s+(?P<c>\w+)\s+DROP\s+NOT\s+NULL\s*$", rest, re.I
        )
        if am:
            vt.drop_not_null(am.group("c"))
            return
        raise ValueError(f"DML: unsupported ALTER TABLE action {rest[:60]!r}")
    raise ValueError(f"DML: unsupported statement {s[:60]!r}")


def merge_into_sql(
    spark: SparkSession,
    sql: str,
    tables: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Execute a MERGE statement against plain DataFrames and return the
    merged result (writing it back is the caller's choice — e.g.
    ``VersionedTable.overwrite``, mirroring how every other merge operator
    here separates compute from commit).

    ``tables`` resolves the target / named source (falling back to
    ``spark.table`` for registered views); a ``USING (<subquery>)`` source
    runs through ``spark.sql`` so it can reference any registered view,
    exactly like the reference's ``USING ({contact_update_qry}) src``.
    """
    spec = parse_merge(sql)
    tables = tables or {}

    def _resolve(name: str) -> DataFrame:
        if name in tables:
            return tables[name]
        short = name.split(".")[-1]
        if short in tables:
            return tables[short]
        return spark.table(name)

    target = _resolve(spec["target"])
    source = (
        spark.sql(spec["source_sql"])
        if spec["source_sql"] is not None
        else _resolve(spec["source"])
    )
    # standard SQL scoping: with no explicit alias, the (unqualified) table
    # name itself qualifies columns — rewrite it the same way
    ta = spec["target_alias"] or spec["target"].split(".")[-1]
    sa = spec["source_alias"] or (
        spec["source"].split(".")[-1] if spec["source"] else None
    )
    b = MergeIntoBuilder(target, source, F.expr(_rewrite(spec["on"], ta, sa)))

    seen: set[tuple[str, str]] = set()
    for clause in spec["clauses"]:
        kind, action = clause["kind"], clause["action"]
        cond = (
            F.expr(_rewrite(clause["condition"], ta, sa))
            if clause["condition"]
            else None
        )
        au = re.sub(r"\s+", " ", action.upper()).strip()
        if kind == "MATCHED" and au.startswith("UPDATE SET"):
            key = ("MATCHED", "UPDATE")
            if ("MATCHED", "DELETE") in seen:
                raise ValueError(
                    "MERGE: matched UPDATE must precede matched DELETE "
                    "(first-applicable-clause ordering)"
                )
            body = action[len("UPDATE SET") :].strip()
            if body == "*":
                b.when_matched_update(
                    set={c: F.col(f"s.{c}") for c in target.columns},
                    condition=cond,
                )
            else:
                b.when_matched_update(
                    set=_parse_assignments(body, ta, sa), condition=cond
                )
        elif kind == "MATCHED" and au == "DELETE":
            key = ("MATCHED", "DELETE")
            b.when_matched_delete(condition=cond)
        elif kind == "NOT MATCHED" and au == "INSERT *":
            key = ("NOT MATCHED", "INSERT")
            b.when_not_matched_insert_all(condition=cond)
        elif kind == "NOT MATCHED" and au.startswith("INSERT"):
            key = ("NOT MATCHED", "INSERT")
            body = action[len("INSERT") :].strip()
            if not body.startswith("("):
                raise ValueError(f"MERGE: cannot parse INSERT action {action!r}")
            cols_end = _scan_balanced(body, 0)
            cols = [c.strip() for c in _split_top_commas(body[1 : cols_end - 1])]
            tail = body[cols_end:].strip()
            if not tail.upper().startswith("VALUES"):
                raise ValueError(f"MERGE: INSERT without VALUES: {action!r}")
            vals_frag = tail[len("VALUES") :].strip()
            if not vals_frag.startswith("(") or _scan_balanced(vals_frag, 0) != len(
                vals_frag
            ):
                raise ValueError(f"MERGE: cannot parse VALUES in {action!r}")
            vals = _split_top_commas(vals_frag[1:-1])
            if len(cols) != len(vals):
                raise ValueError(
                    f"MERGE: INSERT has {len(cols)} columns but {len(vals)} values"
                )
            for c in cols:
                if not _WORD.fullmatch(c):
                    raise ValueError(f"MERGE: bad INSERT column {c!r}")
            b.when_not_matched_insert(
                values={
                    c: F.expr(_rewrite(v, ta, sa)) for c, v in zip(cols, vals)
                },
                condition=cond,
            )
        elif kind == "NOT MATCHED BY SOURCE" and au.startswith("UPDATE SET"):
            key = ("BY SOURCE", "UPDATE")
            body = action[len("UPDATE SET") :].strip()
            b.when_not_matched_by_source_update(
                set=_parse_assignments(body, ta, sa), condition=cond
            )
        elif kind == "NOT MATCHED BY SOURCE" and au == "DELETE":
            key = ("BY SOURCE", "DELETE")
            b.when_not_matched_by_source_delete(condition=cond)
        else:
            raise ValueError(f"MERGE: unsupported action {action!r} for WHEN {kind}")
        if key in seen:
            raise ValueError(f"MERGE: duplicate WHEN {key[0]} {key[1]} clause")
        seen.add(key)
    return b.execute()
