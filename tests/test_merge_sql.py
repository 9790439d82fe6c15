"""SQL MERGE INTO front-end: grammar pins + execution equivalence with the
programmatic MergeIntoBuilder (which is itself oracle-proven)."""

import pytest
from pyspark.sql import functions as F

from emr_on_eks_hudi_iceberg_delta_spark.operators.merge import MergeIntoBuilder
from emr_on_eks_hudi_iceberg_delta_spark.operators.merge_sql import (
    merge_into_sql,
    parse_merge,
)

# ----------------------------------------------------------------- parser


def test_parse_reference_iceberg_shape():
    # iceberg/iceberg_scd_script.py:76-82 verbatim structure
    spec = parse_merge("""
        MERGE INTO glue_catalog.default.iceberg_contact tgt
        USING (SELECT * FROM updates WHERE checksum IS NOT NULL) src
        ON tgt.id = src.id
        AND tgt.checksum = src.checksum
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
    """)
    assert spec["target"] == "glue_catalog.default.iceberg_contact"
    assert spec["target_alias"] == "tgt" and spec["source_alias"] == "src"
    assert spec["source_sql"].startswith("SELECT * FROM updates")
    assert "tgt.checksum = src.checksum" in spec["on"]
    assert [c["kind"] for c in spec["clauses"]] == ["MATCHED", "NOT MATCHED"]
    assert spec["clauses"][0]["action"] == "UPDATE SET *"


def test_parse_reference_delta_shape():
    # delta/delta_scd_script.py:89-95 verbatim structure
    spec = parse_merge("""
        MERGE INTO delta_table_contact tgt
        USING (SELECT * FROM u) src
        ON tgt.id = src.mergeKey
        WHEN MATCHED AND src.checksum != tgt.checksum AND tgt.iscurrent = 1
          THEN UPDATE SET valid_to = src.valid_from, iscurrent = 0
        WHEN NOT MATCHED THEN INSERT *
    """)
    cl = spec["clauses"][0]
    assert cl["kind"] == "MATCHED"
    assert "src.checksum != tgt.checksum" in cl["condition"]
    assert cl["action"].startswith("UPDATE SET valid_to")


def test_parse_keywords_inside_subquery_are_ignored():
    # ON / WHEN / USING inside the source subquery must not split the
    # statement — only top-level keywords count
    spec = parse_merge("""
        MERGE INTO t
        USING (SELECT a, CASE WHEN b ON_ERROR THEN 1 END AS c
               FROM x JOIN y ON x.k = y.k) s
        ON t.a = s.a
        WHEN NOT MATCHED THEN INSERT *
    """.replace("ON_ERROR", "> 0"))
    assert spec["source_sql"].count("JOIN") == 1
    assert spec["on"] == "t.a = s.a"


@pytest.mark.parametrize(
    "sql,msg",
    [
        ("SELECT 1", "must start with MERGE INTO"),
        ("MERGE INTO t USING s ON t.k = s.k", "WHEN clause is required"),
        (
            "MERGE INTO t USING s ON t.k = s.k WHEN MATCHED THEN TRUNCATE",
            "unsupported action",
        ),
        (
            "MERGE INTO t USING s ON t.k = s.k "
            "WHEN MATCHED THEN DELETE WHEN MATCHED THEN UPDATE SET a = 1",
            "must precede matched DELETE",
        ),
        (
            "MERGE INTO t USING s ON t.k = s.k "
            "WHEN NOT MATCHED THEN INSERT (a, b) VALUES (1)",
            "2 columns but 1 values",
        ),
    ],
)
def test_parse_rejects_out_of_subset(spark, sql, msg):
    with pytest.raises(ValueError, match=msg):
        spec_or_df = merge_into_sql(
            spark, sql, tables={"t": spark.range(1), "s": spark.range(1)}
        )


# ------------------------------------------------------------- execution


def _nation_fixture(spark):
    t = spark.createDataFrame(
        [(1, "alpha", 10), (2, "beta", 20), (3, "gamma", 30)],
        ["k", "name", "v"],
    )
    s = spark.createDataFrame(
        [(2, "BETA", 21), (4, "delta", 40)], ["k", "name", "v"]
    )
    return t, s


def test_sql_update_star_insert_star_matches_builder(spark):
    t, s = _nation_fixture(spark)
    got = merge_into_sql(
        spark,
        """MERGE INTO tgt USING src ON tgt.k = src.k
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *""",
        tables={"tgt": t, "src": s},
    )
    want = (
        MergeIntoBuilder(t, s, F.expr("t.k = s.k"))
        .when_matched_update(set={c: F.col(f"s.{c}") for c in t.columns})
        .when_not_matched_insert_all()
        .execute()
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    rows = dict((r["k"], (r["name"], r["v"])) for r in got.collect())
    assert rows == {
        1: ("alpha", 10),
        2: ("BETA", 21),
        3: ("gamma", 30),
        4: ("delta", 40),
    }


def test_sql_conditional_update_and_explicit_insert(spark):
    t, s = _nation_fixture(spark)
    got = merge_into_sql(
        spark,
        """MERGE INTO tgt USING src ON tgt.k = src.k
           WHEN MATCHED AND src.v <> tgt.v THEN UPDATE SET v = src.v
           WHEN NOT MATCHED THEN
             INSERT (k, name, v) VALUES (src.k, lower(src.name), src.v + 1)""",
        tables={"tgt": t, "src": s},
    )
    rows = dict((r["k"], (r["name"], r["v"])) for r in got.collect())
    # matched conditional update keeps the target name, takes the new v;
    # explicit insert evaluates expressions over the source row
    assert rows == {
        1: ("alpha", 10),
        2: ("beta", 21),
        3: ("gamma", 30),
        4: ("delta", 41),
    }


def test_sql_full_sync_by_source(spark):
    t, s = _nation_fixture(spark)
    got = merge_into_sql(
        spark,
        """MERGE INTO tgt USING src ON tgt.k = src.k
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *
           WHEN NOT MATCHED BY SOURCE THEN DELETE""",
        tables={"tgt": t, "src": s},
    )
    assert sorted(r["k"] for r in got.collect()) == [2, 4]


def test_sql_subquery_source_and_views(spark):
    t, s = _nation_fixture(spark)
    s.createOrReplaceTempView("merge_sql_updates")
    t.createOrReplaceTempView("merge_sql_target")
    got = merge_into_sql(
        spark,
        """MERGE INTO merge_sql_target tgt
           USING (SELECT k, upper(name) AS name, v
                  FROM merge_sql_updates WHERE v < 30) src
           ON tgt.k = src.k
           WHEN MATCHED THEN UPDATE SET name = src.name
           WHEN NOT MATCHED THEN INSERT *""",
        tables={},
    )
    rows = dict((r["k"], r["name"]) for r in got.collect())
    assert rows == {1: "alpha", 2: "BETA", 3: "gamma"}


def test_sql_cardinality_check_fires(spark):
    t = spark.createDataFrame([(1, "a")], ["k", "name"])
    s = spark.createDataFrame([(1, "x"), (1, "y")], ["k", "name"])
    df = merge_into_sql(
        spark,
        """MERGE INTO tgt USING src ON tgt.k = src.k
           WHEN MATCHED THEN UPDATE SET *""",
        tables={"tgt": t, "src": s},
    )
    with pytest.raises(Exception, match="multiple source rows"):
        df.collect()


def test_parse_case_when_inside_conditions():
    spec = parse_merge("""
        MERGE INTO t USING s ON t.k = s.k
        WHEN MATCHED AND CASE WHEN s.v > t.v THEN true ELSE false END
          THEN UPDATE SET v = s.v
        WHEN NOT MATCHED THEN INSERT *
    """)
    assert len(spec["clauses"]) == 2
    assert "CASE WHEN s.v > t.v THEN true ELSE false END" in spec["clauses"][0]["condition"]
    assert spec["clauses"][0]["action"].startswith("UPDATE SET")


# ------------------------------------------------------------- DML strings


def test_run_dml_update_delete_insert(spark, tmp_path):
    from emr_on_eks_hudi_iceberg_delta_spark.operators.merge_sql import run_dml
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import VersionedTable

    vt = VersionedTable(spark, str(tmp_path / "dml_vt"))
    vt.overwrite(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["k", "name", "v"]
        )
    )
    run_dml(spark, "UPDATE dml_vt SET v = v + 1 WHERE k >= 2", {"dml_vt": vt})
    run_dml(spark, "DELETE FROM dml_vt WHERE k = 1", {"dml_vt": vt})
    run_dml(
        spark,
        "INSERT INTO dml_vt VALUES (4, 'd', 40), (5, 'e', 50)",
        {"dml_vt": vt},
    )
    rows = {r["k"]: (r["name"], r["v"]) for r in vt.read().collect()}
    assert rows == {2: ("b", 21), 3: ("c", 31), 4: ("d", 40), 5: ("e", 50)}
    # each statement committed one snapshot -> time travel sees all 4 states
    assert len(vt.history()) == 4
    assert vt.read(version=vt.history()[0]["version"]).count() == 3


def test_run_dml_insert_select(spark, tmp_path):
    from emr_on_eks_hudi_iceberg_delta_spark.operators.merge_sql import run_dml
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import VersionedTable

    vt = VersionedTable(spark, str(tmp_path / "dml_vt2"))
    vt.overwrite(spark.createDataFrame([(1, "a")], ["k", "name"]))
    spark.createDataFrame([(2, "b"), (3, "c")], ["k", "name"]).createOrReplaceTempView(
        "dml_src_view"
    )
    run_dml(
        spark,
        "INSERT INTO dml_vt2 SELECT k, upper(name) AS name FROM dml_src_view",
        {"dml_vt2": vt},
    )
    assert {r["name"] for r in vt.read().collect()} == {"a", "B", "C"}


def test_run_dml_rejects_unknown(spark):
    from emr_on_eks_hudi_iceberg_delta_spark.operators.merge_sql import run_dml

    with pytest.raises(ValueError, match="unknown table"):
        run_dml(spark, "DELETE FROM nope WHERE 1=1", {})
    with pytest.raises(ValueError, match="unsupported statement"):
        run_dml(spark, "TRUNCATE TABLE x", {"x": None})


def test_run_dml_utility_statements(spark, tmp_path):
    from emr_on_eks_hudi_iceberg_delta_spark.operators.merge_sql import run_dml
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import VersionedTable

    vt = VersionedTable(spark, str(tmp_path / "util_vt"))
    vt.overwrite(spark.createDataFrame([(i, i * 10) for i in range(20)], ["k", "v"]))
    run_dml(spark, "DELETE FROM t WHERE k >= 10", {"t": vt})
    good = vt.history()[0]["version"]
    run_dml(spark, f"RESTORE TABLE t TO VERSION AS OF {good}", {"t": vt})
    assert vt.read().count() == 20
    run_dml(spark, "OPTIMIZE t ZORDER BY (k, v)", {"t": vt})
    assert vt.read().count() == 20
    hist = run_dml(spark, "DESCRIBE HISTORY t", {"t": vt})
    assert hist.count() == 4  # load, delete, restore, optimize
    run_dml(spark, "VACUUM t RETAIN 1 VERSIONS", {"t": vt})
    assert len(vt.history()) == 1 and vt.read().count() == 20


# -- property: parser-lowered MERGE == programmatic builder ------------------
# VERDICT r4 item 7: the hand-rolled grammar parser is correctness-critical;
# hypothesis draws statements over the supported grammar (aliases, clause
# combinations, conditions, expressions) plus random data, renders BOTH the
# SQL text and the equivalent programmatic MergeIntoBuilder calls from the
# same spec, and asserts identical results row-for-row.

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# expression / condition pools in canonical {t}/{s} placeholder form —
# rendered with the statement's aliases for the SQL side and with the
# builder's canonical t/s for the programmatic side
_M_EXPRS = ["{s}.v + 1", "{t}.v * 2", "{s}.v", "0 - {t}.v", "{t}.v + {s}.v"]
_M_CONDS = ["{s}.v > {t}.v", "{t}.name = 'alpha'", "{s}.v % 2 = 0", None]
_T_ONLY_CONDS = ["{t}.v > 15", "{t}.name = 'gamma'", None]
_S_ONLY_CONDS = ["{s}.v >= 0", None]


@st.composite
def _merge_cases(draw):
    t_rows = draw(
        st.lists(
            st.tuples(
                st.integers(0, 6),
                st.sampled_from(["alpha", "gamma", "zz"]),
                st.integers(-20, 40),
            ),
            max_size=6,
            unique_by=lambda r: r[0],
        )
    )
    s_rows = draw(
        st.lists(
            st.tuples(
                st.integers(0, 8),
                st.sampled_from(["BETA", "delta", "alpha"]),
                st.integers(-20, 40),
            ),
            max_size=6,
            unique_by=lambda r: r[0],
        )
    )
    case = {
        "t_rows": t_rows,
        "s_rows": s_rows,
        "talias": draw(st.sampled_from([None, "t", "tgt2", "T1"])),
        "salias": draw(st.sampled_from([None, "s", "upd", "U"])),
        "upd": draw(st.sampled_from(["none", "star", "expr"])),
        "upd_cond": draw(st.sampled_from(_M_CONDS)),
        "upd_expr": draw(st.sampled_from(_M_EXPRS)),
        "mdel": draw(st.booleans()),
        "mdel_cond": draw(st.sampled_from(_M_CONDS)),
        "ins": draw(st.sampled_from(["none", "star", "cols"])),
        "ins_cond": draw(st.sampled_from(_S_ONLY_CONDS)),
        "ins_expr": draw(st.sampled_from(["{s}.v + 100", "{s}.v"])),
        "by_src": draw(st.sampled_from(["none", "delete", "update"])),
        "by_src_cond": draw(st.sampled_from(_T_ONLY_CONDS)),
    }
    if case["upd"] == "none" and not case["mdel"] and case["ins"] == "none" \
            and case["by_src"] == "none":
        case["ins"] = "star"  # the grammar requires at least one WHEN clause
    return case


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=_merge_cases())
def test_property_sql_matches_builder(spark, case):
    t = spark.createDataFrame(
        case["t_rows"], "k int, name string, v int"
    )
    s = spark.createDataFrame(
        case["s_rows"], "k int, name string, v int"
    )
    # SQL-side qualifiers: the alias if given, else the table name itself
    tq = case["talias"] or "tgt"
    sq = case["salias"] or "src"
    fmt_sql = lambda e: e.format(t=tq, s=sq)  # noqa: E731
    fmt_b = lambda e: e.format(t="t", s="s")  # noqa: E731

    sql = ["MERGE INTO tgt" + (f" AS {case['talias']}" if case["talias"] else "")]
    sql.append("USING src" + (f" {case['salias']}" if case["salias"] else ""))
    sql.append(f"ON {tq}.k = {sq}.k")
    b = MergeIntoBuilder(t, s, F.expr("t.k = s.k"))

    def _and(cond):
        return f" AND {fmt_sql(cond)}" if cond else ""

    def _bcond(cond):
        return F.expr(fmt_b(cond)) if cond else None

    if case["upd"] == "star":
        sql.append(f"WHEN MATCHED{_and(case['upd_cond'])} THEN UPDATE SET *")
        b.when_matched_update(
            set={c: F.col(f"s.{c}") for c in t.columns},
            condition=_bcond(case["upd_cond"]),
        )
    elif case["upd"] == "expr":
        sql.append(
            f"WHEN MATCHED{_and(case['upd_cond'])} THEN "
            f"UPDATE SET v = {fmt_sql(case['upd_expr'])}"
        )
        b.when_matched_update(
            set={"v": F.expr(fmt_b(case["upd_expr"]))},
            condition=_bcond(case["upd_cond"]),
        )
    if case["mdel"]:
        sql.append(f"WHEN MATCHED{_and(case['mdel_cond'])} THEN DELETE")
        b.when_matched_delete(condition=_bcond(case["mdel_cond"]))
    if case["ins"] == "star":
        sql.append(f"WHEN NOT MATCHED{_and(case['ins_cond'])} THEN INSERT *")
        b.when_not_matched_insert_all(condition=_bcond(case["ins_cond"]))
    elif case["ins"] == "cols":
        sql.append(
            f"WHEN NOT MATCHED{_and(case['ins_cond'])} THEN "
            f"INSERT (k, name, v) VALUES "
            f"({sq}.k, lower({sq}.name), {fmt_sql(case['ins_expr'])})"
        )
        b.when_not_matched_insert(
            values={
                "k": F.expr("s.k"),
                "name": F.expr("lower(s.name)"),
                "v": F.expr(fmt_b(case["ins_expr"])),
            },
            condition=_bcond(case["ins_cond"]),
        )
    if case["by_src"] == "delete":
        sql.append(
            f"WHEN NOT MATCHED BY SOURCE{_and(case['by_src_cond'])} THEN DELETE"
        )
        b.when_not_matched_by_source_delete(condition=_bcond(case["by_src_cond"]))
    elif case["by_src"] == "update":
        sql.append(
            f"WHEN NOT MATCHED BY SOURCE{_and(case['by_src_cond'])} THEN "
            f"UPDATE SET v = {tq}.v - 1"
        )
        b.when_not_matched_by_source_update(
            set={"v": F.expr("t.v - 1")}, condition=_bcond(case["by_src_cond"])
        )

    got = merge_into_sql(spark, "\n".join(sql), tables={"tgt": t, "src": s})
    want = b.execute()
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_run_dml_alter_table_surface(spark, tmp_path):
    """ALTER TABLE DDL through the SQL front-end: add/rename/drop column
    and add/drop constraint each commit one snapshot via the table's own
    schema-evolution methods."""
    import pytest as _pytest

    from emr_on_eks_hudi_iceberg_delta_spark.operators.merge_sql import run_dml
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import (
        ConstraintViolationError,
        VersionedTable,
    )

    vt = VersionedTable(spark, str(tmp_path / "vt_alter"))
    vt.overwrite(spark.range(5).selectExpr("id", "id * 2 AS v"))
    tables = {"t": vt}
    run_dml(spark, "ALTER TABLE t ADD COLUMN note string", tables)
    assert "note" in vt.read().columns
    run_dml(spark, "ALTER TABLE t ADD COLUMNS (score double)", tables)
    assert "score" in vt.read().columns
    run_dml(spark, "ALTER TABLE t RENAME COLUMN v TO value", tables)
    assert "value" in vt.read().columns and "v" not in vt.read().columns
    run_dml(spark, "ALTER TABLE t DROP COLUMN note", tables)
    assert "note" not in vt.read().columns
    run_dml(spark, "ALTER TABLE t ADD CONSTRAINT pos CHECK (id >= 0)", tables)
    with _pytest.raises(ConstraintViolationError):
        vt.append(spark.sql("SELECT -1 AS id, 0 AS value, 0.0 AS score"))
    run_dml(spark, "ALTER TABLE t DROP CONSTRAINT pos", tables)
    vt.append(spark.sql("SELECT -1 AS id, CAST(0 AS LONG) AS value, 0.0 AS score"))
    assert vt.read().count() == 6
    # time travel still serves the pre-evolution schema
    assert "v" in vt.read(version=0).columns
    with _pytest.raises(ValueError, match="unsupported ALTER"):
        run_dml(spark, "ALTER TABLE t CLUSTER BY (id)", tables)


def test_replace_where_programmatic_and_dml(spark, tmp_path):
    """Delta selective overwrite: exactly the predicate slice is swapped
    in one commit, incoming rows outside the slice are rejected, and the
    INSERT INTO ... REPLACE WHERE SQL form lowers onto the same method."""
    import pytest as _pytest

    from emr_on_eks_hudi_iceberg_delta_spark.operators.merge_sql import run_dml
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import (
        ConstraintViolationError,
        VersionedTable,
    )

    vt = VersionedTable(spark, str(tmp_path / "vt_rw"))
    vt.overwrite(
        spark.createDataFrame(
            [(1, "a", 10), (2, "a", 20), (3, "b", 30)],
            "id long, part string, v long",
        )
    )
    vt.replace_where(
        "part = 'a'",
        spark.createDataFrame([(9, "a", 99)], "id long, part string, v long"),
    )
    got = sorted((r["id"], r["v"]) for r in vt.read().collect())
    assert got == [(3, 30), (9, 99)]  # slice 'a' replaced, 'b' untouched
    # validation: a backfill writing outside its declared slice is a bug
    with _pytest.raises(ConstraintViolationError, match="replace_where"):
        vt.replace_where(
            "part = 'a'",
            spark.createDataFrame([(8, "b", 1)], "id long, part string, v long"),
        )
    # the SQL form
    run_dml(
        spark,
        "INSERT INTO t REPLACE WHERE part = 'b' "
        "SELECT CAST(7 AS LONG) AS id, 'b' AS part, CAST(70 AS LONG) AS v",
        {"t": vt},
    )
    got = sorted((r["id"], r["v"]) for r in vt.read().collect())
    assert got == [(7, 70), (9, 99)]
    assert vt.history()[-1]["operation"] == "REPLACE WHERE"
    # time travel still serves the pre-replace state
    assert vt.read(version=0).count() == 3


def test_run_dml_catalog_ddl_surface(spark, tmp_path):
    """Catalog DDL through the one SQL entry point: CTAS, external
    registration, SHOW/DESCRIBE, name resolution for DML targets, and
    DROP with/without PURGE."""
    import os

    import pytest as _pytest

    from emr_on_eks_hudi_iceberg_delta_spark.operators.merge_sql import run_dml
    from emr_on_eks_hudi_iceberg_delta_spark.sources.catalog import LakeCatalog
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import VersionedTable

    cat = LakeCatalog(spark, str(tmp_path / "cat"))
    spark.range(10).selectExpr("id", "id * 3 AS v").createOrReplaceTempView(
        "ddl_src"
    )
    run_dml(spark, "CREATE TABLE t1 AS SELECT * FROM ddl_src", catalog=cat)
    assert cat.table("t1").read().count() == 10
    # external registration of a pre-existing table
    ext = VersionedTable(spark, str(tmp_path / "ext"))
    ext.overwrite(spark.range(3).toDF("id"))
    run_dml(
        spark, f"CREATE TABLE t2 LOCATION '{tmp_path / 'ext'}'", catalog=cat
    )
    assert cat.table("t2").read().count() == 3
    shown = {r["table"] for r in run_dml(spark, "SHOW TABLES", catalog=cat).collect()}
    assert shown == {"t1", "t2"}
    desc = dict(
        map(tuple, run_dml(spark, "DESCRIBE TABLE t1", catalog=cat).collect())
    )
    assert desc == {"id": "bigint", "v": "bigint"}
    # catalog names resolve as DML targets without an explicit tables dict
    run_dml(spark, "DELETE FROM t1 WHERE id >= 5", catalog=cat)
    assert cat.table("t1").read().count() == 5
    # drop semantics: default keeps data, PURGE removes it
    run_dml(spark, "DROP TABLE t2", catalog=cat)
    assert os.path.exists(str(tmp_path / "ext"))
    run_dml(spark, "DROP TABLE t1 PURGE", catalog=cat)
    assert not os.path.exists(str(tmp_path / "cat" / "t1"))
    with _pytest.raises(ValueError, match="unknown table"):
        run_dml(spark, "DELETE FROM t1 WHERE id = 1", catalog=cat)


# -- round-5: TBLPROPERTIES / NOT NULL / VACUUM DRY RUN surfaces ------------


def test_sql_tblproperties_roundtrip(spark, tmp_path):
    from emr_on_eks_hudi_iceberg_delta_spark.operators.merge_sql import run_dml
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import VersionedTable

    vt = VersionedTable(spark, str(tmp_path / "vt_props"))
    vt.overwrite(spark.range(3))
    t = {"t": vt}
    run_dml(
        spark,
        "ALTER TABLE t SET TBLPROPERTIES ('owner' = 'pipeline', "
        "'rowTracking.enabled' = true)",
        t,
    )
    props = {
        r["key"]: r["value"]
        for r in run_dml(spark, "SHOW TBLPROPERTIES t", t).collect()
    }
    assert props["owner"] == "pipeline"
    assert props["rowTracking.enabled"] == "True"
    # the property is live: the next commit assigns row ids
    vt.append(spark.range(3, 5))
    assert "__row_id" in vt.read(with_row_ids=True).columns
    run_dml(spark, "ALTER TABLE t UNSET TBLPROPERTIES ('owner')", t)
    assert "owner" not in vt.properties()


def test_sql_not_null_constraint(spark, tmp_path):
    import pytest

    from emr_on_eks_hudi_iceberg_delta_spark.operators.merge_sql import run_dml
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import (
        ConstraintViolationError,
        VersionedTable,
    )

    vt = VersionedTable(spark, str(tmp_path / "vt_nn"))
    vt.overwrite(
        spark.createDataFrame([(1, "a"), (2, "b")], ["k", "s"])
    )
    t = {"t": vt}
    run_dml(spark, "ALTER TABLE t ALTER COLUMN s SET NOT NULL", t)
    with pytest.raises(ConstraintViolationError):
        vt.append(spark.createDataFrame([(3, None)], "k int, s string"))
    run_dml(spark, "ALTER TABLE t ALTER COLUMN s DROP NOT NULL", t)
    vt.append(spark.createDataFrame([(3, None)], "k int, s string"))
    assert vt.read().count() == 3
    # SET NOT NULL refuses when existing rows hold NULLs
    with pytest.raises(ConstraintViolationError):
        run_dml(spark, "ALTER TABLE t ALTER COLUMN s SET NOT NULL", t)


def test_sql_vacuum_dry_run_deletes_nothing(spark, tmp_path):
    import os

    from emr_on_eks_hudi_iceberg_delta_spark.operators.merge_sql import run_dml
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import VersionedTable

    vt = VersionedTable(spark, str(tmp_path / "vt_dry"))
    vt.overwrite(spark.range(3))
    vt.overwrite(spark.range(4))
    vt.overwrite(spark.range(5))
    paths = [
        r["path"]
        for r in run_dml(spark, "VACUUM t RETAIN 1 VERSIONS DRY RUN", {"t": vt}).collect()
    ]
    assert len(paths) == 2  # v0 and v1 would go
    assert all(os.path.isdir(p) for p in paths)  # nothing deleted
    assert len(vt.history()) == 3  # metadata untouched
    # the real vacuum then removes exactly the reported dirs
    run_dml(spark, "VACUUM t RETAIN 1 VERSIONS", {"t": vt})
    assert all(not os.path.isdir(p) for p in paths)
    assert len(vt.history()) == 1


def test_call_procedures_maintenance_surface(spark, tmp_path):
    """Iceberg-style CALL system.* procedures through run_dml: rollback,
    cherry-pick, revert, expire — positional and name => value args."""
    from pyspark.sql import functions as F

    from emr_on_eks_hudi_iceberg_delta_spark.operators.merge_sql import run_dml
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import VersionedTable

    vt = VersionedTable(spark, str(tmp_path / "vt_call"))
    vt.overwrite(spark.range(5).select("id", F.lit("base").alias("tag")))   # v0
    vt.append(spark.range(10, 12).select("id", F.lit("b1").alias("tag")))   # v1
    vt.append(spark.range(20, 21).select("id", F.lit("b2").alias("tag")))   # v2
    t = {"t": vt}

    run_dml(spark, "CALL system.revert_commit('t', 1)", tables=t)           # v3
    assert vt.read().filter("tag = 'b1'").count() == 0
    assert vt.read().filter("tag = 'b2'").count() == 1

    run_dml(spark, "CALL system.cherrypick_snapshot('t', 1)", tables=t)     # v4
    assert vt.read().filter("tag = 'b1'").count() == 2

    run_dml(
        spark, "CALL system.rollback_to_snapshot(table => 't', version => 0)",
        tables=t,
    )                                                                       # v5
    assert vt.read().count() == 5

    run_dml(
        spark,
        "CALL system.expire_snapshots(table => 't', retain_last => 1)",
        tables=t,
    )
    assert [s["version"] for s in vt.history()] == [5]

    import pytest

    with pytest.raises(ValueError, match="unknown procedure"):
        run_dml(spark, "CALL system.frobnicate('t')", tables=t)


def test_time_travel_select_sql(spark, tmp_path):
    """Delta time-travel SELECT syntax through the front-end: VERSION AS
    OF resolves per-reference (two different versions of the SAME table
    joinable in one statement); TIMESTAMP AS OF routes through
    read_as_of."""
    import time as _time

    from pyspark.sql import functions as F

    from emr_on_eks_hudi_iceberg_delta_spark.operators.merge_sql import run_dml
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import VersionedTable

    vt = VersionedTable(spark, str(tmp_path / "vt_tt"))
    vt.overwrite(spark.range(3).select("id", F.lit(0).alias("v")))   # v0
    vt.overwrite(spark.range(5).select("id", F.lit(1).alias("v")))   # v1
    t = {"t": vt}

    got = run_dml(
        spark, "SELECT COUNT(*) AS n FROM t VERSION AS OF 0", tables=t
    ).first()
    assert got["n"] == 3
    # both versions of one table inside one statement
    got = run_dml(
        spark,
        "SELECT (SELECT COUNT(*) FROM t VERSION AS OF 1) - "
        "(SELECT COUNT(*) FROM t VERSION AS OF 0) AS delta",
        tables=t,
    ).first()
    assert got["delta"] == 2
    # timestamp travel: 'now' resolves to the newest commit
    now = _time.strftime("%Y-%m-%d %H:%M:%S", _time.gmtime(_time.time() + 5))
    got = run_dml(
        spark,
        f"SELECT COUNT(*) AS n FROM t TIMESTAMP AS OF '{now}'",
        tables=t,
    ).first()
    assert got["n"] == 5


def test_table_changes_tvf_sql(spark, tmp_path):
    """Delta CDF SQL surface: SELECT over table_changes('t', a, b)
    returns per-commit row diffs with _commit_version/_change_type."""
    from pyspark.sql import functions as F

    from emr_on_eks_hudi_iceberg_delta_spark.operators.merge_sql import run_dml
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import VersionedTable

    vt = VersionedTable(spark, str(tmp_path / "vt_tcf"))
    vt.overwrite(spark.range(4).select("id", F.lit("a").alias("tag")))  # v0
    vt.append(spark.range(10, 12).select("id", F.lit("b").alias("tag")))  # v1
    vt.delete_where("id = 0")                                             # v2
    got = run_dml(
        spark,
        "SELECT _commit_version, _change_type, COUNT(*) AS n "
        "FROM table_changes('t', 0, 2) "
        "GROUP BY _commit_version, _change_type "
        "ORDER BY _commit_version, _change_type",
        tables={"t": vt},
    ).collect()
    assert [(r["_commit_version"], r["_change_type"], r["n"]) for r in got] == [
        (1, "insert", 2),
        (2, "delete", 1),
    ]


def test_combined_cdf_and_time_travel_in_one_statement(spark, tmp_path):
    """Both SELECT sugar forms compose: one statement joins the CDF TVF
    against a time-travel reference."""
    from pyspark.sql import functions as F

    from emr_on_eks_hudi_iceberg_delta_spark.operators.merge_sql import run_dml
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import VersionedTable

    vt = VersionedTable(spark, str(tmp_path / "vt_both"))
    vt.overwrite(spark.range(3).select("id", F.lit("a").alias("tag")))  # v0
    vt.append(spark.range(10, 13).select("id", F.lit("b").alias("tag")))  # v1
    got = run_dml(
        spark,
        "SELECT COUNT(*) AS n FROM table_changes('t', 0, 1) c "
        "LEFT ANTI JOIN t VERSION AS OF 0 v ON c.id = v.id",
        tables={"t": vt},
    ).first()
    # v1 inserted ids 10-12, none of which exist in v0
    assert got["n"] == 3


def test_describe_detail_sql(spark, tmp_path):
    from pyspark.sql import functions as F

    from emr_on_eks_hudi_iceberg_delta_spark.operators.merge_sql import (
        run_dml,
    )
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import (
        VersionedTable,
    )

    vt = VersionedTable(spark, str(tmp_path / "dd"))
    vt.overwrite(spark.range(10).select("id", F.lit("x").alias("v")))
    vt.append(spark.range(10, 20).select("id", F.lit("y").alias("v")))
    vt.add_constraint("id_nonneg", "id >= 0")
    row = run_dml(spark, "DESCRIBE DETAIL t", tables={"t": vt}).collect()[0]
    assert row["location"] == vt.location
    # overwrite=v0, append=v1; add_constraint is metadata-only (no commit)
    assert row["version"] == 1 and row["num_snapshots"] == 2
    assert row["num_files"] >= 1 and row["size_bytes"] > 0
    assert row["num_constraints"] == 1


def test_call_purge_rows_procedure(spark, tmp_path):
    from pyspark.sql import functions as F

    from emr_on_eks_hudi_iceberg_delta_spark.operators.merge_sql import (
        run_dml,
    )
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import (
        VersionedTable,
    )

    vt = VersionedTable(spark, str(tmp_path / "pp"))
    vt.overwrite(spark.range(10).select("id", (F.col("id") % 2).alias("s")))
    vt.append(spark.range(10, 14).select("id", (F.col("id") % 2).alias("s")))
    out = run_dml(
        spark,
        "CALL system.purge_rows(table => 't', where => 's = 1')",
        tables={"t": vt},
    ).collect()[0]
    # per-dir removals summed over history: 5 odd rows in the v0 copy
    # + 7 in the v1 full snapshot copy
    assert out["rows_removed"] == 12
    assert vt.read(version=0).filter("s = 1").count() == 0
    assert vt.read().count() == 7


def test_call_build_record_index(spark, tmp_path):
    from pyspark.sql import functions as F

    from emr_on_eks_hudi_iceberg_delta_spark.operators.merge_sql import (
        run_dml,
    )
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import (
        VersionedTable,
    )

    vt = VersionedTable(spark, str(tmp_path / "rli_sql"))
    vt.overwrite(spark.range(100).repartition(4).select("id", F.lit("x").alias("v")))
    run_dml(
        spark,
        "CALL system.build_record_index(table => 't', key_cols => 'id')",
        tables={"t": vt},
    )
    hit = vt.index_lookup({"id": 42})
    assert hit.count() == 1 and len(hit.inputFiles()) == 1


def test_call_procedure_args_with_commas_in_quotes(spark, tmp_path):
    """CALL arg parsing: a quoted where-predicate containing commas and
    parens must survive the top-level comma split intact."""
    from emr_on_eks_hudi_iceberg_delta_spark.operators.merge_sql import (
        run_dml,
    )
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import (
        VersionedTable,
    )
    from pyspark.sql import functions as F

    vt = VersionedTable(spark, str(tmp_path / "vt_callargs"))
    vt.overwrite(spark.range(10).select("id"))
    out = run_dml(
        spark,
        "CALL system.purge_rows(table => 't', where => 'id IN (1, 3, 5)')",
        tables={"t": vt},
    )
    assert out.collect()[0]["rows_removed"] == 3
    assert sorted(r["id"] for r in vt.read().collect()) == [
        0, 2, 4, 6, 7, 8, 9,
    ]


def test_call_branch_tag_procedures(spark, tmp_path):
    """WAP surface through SQL: CALL system.create_branch /
    create_tag / fast_forward / drop_branch against a catalog table."""
    from emr_on_eks_hudi_iceberg_delta_spark.operators.merge_sql import (
        run_dml,
    )
    from emr_on_eks_hudi_iceberg_delta_spark.sources import VersionedTable

    vt = VersionedTable(spark, str(tmp_path / "wap_sql"))
    vt.overwrite(spark.range(4).selectExpr("id AS k", "id AS v"))
    t = {"t": vt}
    run_dml(spark, "CALL system.create_tag('t', tag => 'v1')", tables=t)
    run_dml(spark, "CALL system.create_branch('t', branch => 'b')", tables=t)
    vt.branch("b").append(spark.range(10, 12).selectExpr("id AS k", "id AS v"))
    assert vt.read().count() == 4  # main blind to the branch write
    run_dml(spark, "CALL system.fast_forward('t', branch => 'b')", tables=t)
    assert vt.read().count() == 6
    assert vt.read_tag("v1").count() == 4
    run_dml(spark, "CALL system.drop_branch('t', branch => 'b')", tables=t)
    with pytest.raises(Exception):
        vt.branch("b")
