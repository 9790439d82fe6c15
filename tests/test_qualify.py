"""QUALIFY desugaring (operators/merge_sql.rewrite_qualify): textual
rewrite unit tests + execution equivalence + the round-7 rewrite
discipline (literal-aware triggers, loud refusal over silent misparse).
The value-level proof against DuckDB's native QUALIFY lives in the
registry (``qualify_top_n_sql``, tests/test_oracle_parity.py)."""

import pytest

from emr_on_eks_hudi_iceberg_delta_spark.operators.merge_sql import (
    rewrite_qualify,
    run_dml,
)


def test_no_qualify_passthrough():
    sql = "SELECT a FROM t WHERE b = 1"
    out, hit = rewrite_qualify(sql)
    assert out == sql and hit is False


def test_literal_and_backtick_qualify_do_not_trigger():
    for sql in (
        "SELECT ' QUALIFY x ' AS c FROM t",
        "SELECT `weird QUALIFY name` FROM t",
        'SELECT " QUALIFY " FROM t',
    ):
        out, hit = rewrite_qualify(sql)
        assert hit is False, sql


def test_basic_rewrite_shape():
    out, hit = rewrite_qualify(
        "SELECT a, b FROM t QUALIFY row_number() OVER (ORDER BY b) = 1"
    )
    assert hit
    assert out == (
        "SELECT * FROM (SELECT a, b, (row_number() OVER (ORDER BY b) = 1)"
        " AS __qualify__ FROM t) __qualify_src WHERE __qualify__ "
    )


def test_order_by_and_limit_stay_outside():
    out, _ = rewrite_qualify(
        "SELECT a FROM t QUALIFY rank() OVER (ORDER BY a) <= 2 "
        "ORDER BY a LIMIT 5"
    )
    assert out.endswith("WHERE __qualify__ ORDER BY a LIMIT 5")
    assert "ORDER BY a LIMIT 5" not in out.split("__qualify_src")[0]


def test_subquery_qualify_is_not_top_level():
    # QUALIFY nested inside a parenthesized subquery belongs to that
    # subquery's dialect scope, not ours — no top-level trigger
    sql = "SELECT * FROM (SELECT a FROM t) x WHERE a > 0"
    out, hit = rewrite_qualify(sql)
    assert hit is False and out == sql


def test_refusals_are_loud():
    with pytest.raises(ValueError, match="DISTINCT"):
        rewrite_qualify(
            "SELECT DISTINCT a FROM t QUALIFY row_number() OVER (ORDER BY a) = 1"
        )
    with pytest.raises(ValueError, match="UNION"):
        rewrite_qualify(
            "SELECT a FROM t UNION SELECT a FROM u "
            "QUALIFY row_number() OVER (ORDER BY a) = 1"
        )
    with pytest.raises(ValueError, match="multiple"):
        rewrite_qualify("SELECT a FROM t QUALIFY x QUALIFY y")
    with pytest.raises(ValueError, match="empty predicate"):
        rewrite_qualify("SELECT a FROM t QUALIFY ")
    with pytest.raises(ValueError, match="no top-level FROM"):
        rewrite_qualify("SELECT 1 QUALIFY x")


def test_execution_matches_handwritten_window(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (1, 30.0), (2, 5.0), (2, 7.0)],
        "k int, v double",
    )
    df.createOrReplaceTempView("qualify_t")
    got = run_dml(
        spark,
        "SELECT k, v FROM qualify_t "
        "QUALIFY row_number() OVER (PARTITION BY k ORDER BY v DESC) <= 1",
    )
    assert got.columns == ["k", "v"]  # helper column dropped
    assert sorted(tuple(r) for r in got.collect()) == [(1, 30.0), (2, 7.0)]


def test_execution_with_where_group_by_and_tail(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.0), (1, "a", 2.0), (1, "b", 9.0), (2, "a", 4.0),
         (2, "b", 1.0), (3, "a", 0.5)],
        "k int, g string, v double",
    )
    df.createOrReplaceTempView("qualify_t2")
    got = run_dml(
        spark,
        "SELECT g, SUM(v) AS s FROM qualify_t2 WHERE k <= 2 GROUP BY g "
        "QUALIFY rank() OVER (ORDER BY SUM(v) DESC) = 1 "
        "ORDER BY g LIMIT 10",
    )
    # a: 1+2+4 = 7, b: 9+1 = 10 -> b wins; k=3 filtered before grouping
    assert [tuple(r) for r in got.collect()] == [("b", 10.0)]


def test_with_cte_qualify(spark):
    spark.createDataFrame(
        [(1, 3.0), (1, 4.0), (2, 9.0)], "k int, v double"
    ).createOrReplaceTempView("qualify_t3")
    got = run_dml(
        spark,
        "WITH c AS (SELECT k, v FROM qualify_t3) "
        "SELECT k, v FROM c "
        "QUALIFY v = max(v) OVER (PARTITION BY k)",
    )
    assert sorted(tuple(r) for r in got.collect()) == [(1, 4.0), (2, 9.0)]
