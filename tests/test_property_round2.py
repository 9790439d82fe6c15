"""Property-based invariants for the round-2 semantics fixes:

* table_changes is an exact multiset diff (matches DuckDB EXCEPT ALL on
  arbitrary duplicate-row multisets, both directions).
* upsert_by_key tie-breaking is layout-independent: the same winner under
  any repartitioning, and the incoming side wins precombine ties.
* SCD2 delta-variant A->B->A reverts never lose history rows.
"""

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from emr_on_eks_hudi_iceberg_delta_spark.functions.scd2 import with_scd2_columns
from emr_on_eks_hudi_iceberg_delta_spark.operators.merge import (
    scd2_merge_delta_style,
    upsert_by_key,
)
from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import table_changes

T = ["2024-0%d-01 00:00:00" % i for i in range(1, 8)]


rows = st.lists(
    st.tuples(st.integers(0, 3), st.sampled_from(["a", "b", "c"])),
    min_size=0,
    max_size=12,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(old=rows, new=rows)
def test_table_changes_matches_except_all(spark, old, new):
    schema = "id int, v string"
    old_df = spark.createDataFrame(old or [], schema)
    new_df = spark.createDataFrame(new or [], schema)
    got = sorted(
        (r["id"], r["v"], r["_change_type"])
        for r in table_changes(spark, old_df, new_df).collect()
    )
    con = duckdb.connect()
    con.register("o", pd.DataFrame(old, columns=["id", "v"]))
    con.register("n", pd.DataFrame(new, columns=["id", "v"]))
    want = sorted(
        map(
            tuple,
            con.execute(
                "SELECT id, v, 'insert' FROM (SELECT * FROM n EXCEPT ALL SELECT * FROM o)"
                " UNION ALL "
                "SELECT id, v, 'delete' FROM (SELECT * FROM o EXCEPT ALL SELECT * FROM n)"
            ).fetchall(),
        )
    )
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    n_parts=st.integers(1, 7),
    same_ts_keys=st.sets(st.integers(1, 8), min_size=1, max_size=8),
)
def test_upsert_tie_break_layout_independent(spark, n_parts, same_ts_keys):
    target = spark.createDataFrame(
        [Row(id=k, checksum="c", ts=T[0], v="stored") for k in range(1, 9)]
    ).repartition(n_parts)
    updates = spark.createDataFrame(
        [
            Row(id=k, checksum="c", ts=T[0] if k in same_ts_keys else T[1], v="incoming")
            for k in range(1, 9)
        ]
    ).repartition(max(1, 8 - n_parts))
    out = {
        r["id"]: r["v"]
        for r in upsert_by_key(target, updates, ["id", "checksum"], "ts").collect()
    }
    # incoming wins both on newer precombine AND on exact ties
    assert out == {k: "incoming" for k in range(1, 9)}


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(flips=st.lists(st.sampled_from(["A", "B"]), min_size=1, max_size=4))
def test_delta_merge_revert_chain_preserves_history(spark, flips):
    """Apply an arbitrary A/B flip sequence; the table must hold exactly
    one row per APPLIED change (consecutive duplicates are no-ops) with
    exactly one current row, regardless of revert patterns."""
    state = "A"
    tbl = with_scd2_columns(
        spark.createDataFrame([Row(id=1, attr="A")]),
        ["attr"], as_of=T[0], include_ts=False,
    )
    applied = 0
    for i, nxt in enumerate(flips):
        batch = spark.createDataFrame([Row(id=1, attr=nxt)])
        merged = scd2_merge_delta_style(tbl, batch, "id", ["attr"], as_of=T[i + 1])
        # re-materialize between commits (a real table store persists each
        # snapshot anyway) — keeps plan depth constant across the chain
        tbl = spark.createDataFrame(merged.collect(), merged.schema)
        if nxt != state:
            applied += 1
            state = nxt
    rows_ = tbl.collect()
    assert len(rows_) == 1 + applied
    current = [r for r in rows_ if r["iscurrent"] == 1]
    assert len(current) == 1 and current[0]["attr"] == state
