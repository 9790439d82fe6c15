"""Property fuzz of the time-travel / table_changes SQL rewrite layer
(VERDICT r6 task 5): hypothesis generates string literals and quoted
identifiers CONTAINING the rewrite trigger substrings (`VERSION AS OF`,
`TIMESTAMP AS OF`, `table_changes(...)` — including over a KNOWN table
name) and asserts the front-end either rewrites correctly (literal
payloads survive byte-for-byte, real sugar outside literals still
resolves) or refuses loudly (unknown table) — never a silent misparse
that rewrites data as syntax.
"""

import os
import sys
import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emr_on_eks_hudi_iceberg_delta_spark.operators.merge_sql import (
    _literal_spans,
    run_dml,
)
from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import VersionedTable

# fragments deliberately include the KNOWN table name `t` so a naive
# rewriter would resolve them; plus escaped-quote and plain noise
_FRAGMENTS = [
    "t VERSION AS OF 1",
    "t TIMESTAMP AS OF '2024-01-01'",
    "table_changes('t', 0, 1)",
    "VERSION AS OF",
    "TIMESTAMP  AS  OF 0",
    "it''s",
    "plain words",
    "t.v2 VERSION AS OF 3",
]

_TRIGGERS = [f for f in _FRAGMENTS if "AS OF" in f or "table_changes" in f]

# always at least one trigger fragment: payloads without one would not
# take the rewrite path at all (bare SELECTs are not DML statements)
payloads = st.tuples(
    st.sampled_from(_TRIGGERS),
    st.lists(st.sampled_from(_FRAGMENTS), min_size=0, max_size=2),
).map(lambda t: " ".join([t[0], *t[1]]))


@pytest.fixture(scope="module")
def vt(spark):
    table = VersionedTable(
        spark, tempfile.mkdtemp(prefix="vt_rewrite_fuzz_")
    )
    table.overwrite(
        spark.createDataFrame([(i, f"n{i}") for i in range(3)], "id long, note string")
    )  # v0: 3 rows
    table.append(
        spark.createDataFrame([(i, f"n{i}") for i in range(3, 5)], "id long, note string")
    )  # v1: 5 rows
    return table


def _esc(payload: str) -> str:
    return payload.replace("'", "''")


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(payload=payloads)
def test_trigger_text_inside_literal_survives(spark, vt, payload):
    """A literal containing trigger text over a KNOWN table must come
    back byte-for-byte while the REAL sugar around it still rewrites:
    `SELECT '<payload>' AS lit, count(*) AS n FROM t VERSION AS OF 0`
    returns the exact payload and v0's row count."""
    out = run_dml(
        spark,
        f"SELECT '{_esc(payload)}' AS lit, count(*) AS n "
        "FROM t VERSION AS OF 0",
        tables={"t": vt},
    )
    row = out.collect()[0]
    assert row["lit"] == payload
    assert row["n"] == 3


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(payload=payloads)
def test_trigger_only_inside_literal_is_plain_sql(spark, vt, payload):
    """Trigger text appearing ONLY inside a literal takes the rewrite
    path (the gate is textual) but must apply zero rewrites — the
    statement runs as plain SQL and returns the payload unchanged."""
    out = run_dml(
        spark, f"SELECT '{_esc(payload)}' AS lit", tables={"t": vt}
    )
    assert out.collect()[0]["lit"] == payload


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(payload=payloads)
def test_filter_against_trigger_literal_matches_data(spark, vt, payload):
    """WHERE note = '<trigger payload>' compares against the data, not a
    rewritten view name: equality with the DataFrame-API filter on the
    same payload (count 0 here — no note carries trigger text)."""
    out = run_dml(
        spark,
        f"SELECT count(*) AS n FROM t VERSION AS OF 1 "
        f"WHERE note = '{_esc(payload)}'",
        tables={"t": vt},
    )
    expected = vt.read(version=1).filter(F.col("note") == payload).count()
    assert out.collect()[0]["n"] == expected == 0


def test_backtick_identifier_with_trigger_untouched(spark, vt):
    """A backtick-quoted ALIAS containing trigger text is an identifier,
    not sugar: the output column must carry the alias verbatim."""
    out = run_dml(
        spark,
        "SELECT note AS `a VERSION AS OF 1` FROM t VERSION AS OF 0",
        tables={"t": vt},
    )
    assert out.columns == ["a VERSION AS OF 1"]
    assert out.count() == 3


def test_unknown_table_refuses_loudly(spark, vt):
    """Sugar over an unregistered table must raise, not silently pass
    misparsed SQL through."""
    with pytest.raises(ValueError, match="unknown table"):
        run_dml(
            spark, "SELECT * FROM ghost VERSION AS OF 0", tables={"t": vt}
        )


def test_real_sugar_beside_literal_sugar(spark, vt):
    """Both forms in one statement: the real table_changes rewrites, the
    literal one survives as data."""
    out = run_dml(
        spark,
        "SELECT count(*) AS n, 'table_changes(''t'', 0, 1)' AS lit "
        "FROM table_changes('t', 0, 1)",
        tables={"t": vt},
    )
    row = out.collect()[0]
    assert row["lit"] == "table_changes('t', 0, 1)"
    assert row["n"] > 0


def test_literal_spans_scanner():
    """The span scanner handles '' escapes and backticks."""
    s = "a 'x''y' b `q'r` c 'open"
    spans = _literal_spans(s)
    assert [s[a:b] for a, b in spans] == ["'x''y'", "`q'r`", "'open"]
