"""Catalog + writer-lock invariants (round 4 Glue/DynamoDB analogs)."""

import pytest
from pyspark.sql import functions as F

from emr_on_eks_hudi_iceberg_delta_spark.sources.catalog import LakeCatalog
from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import (
    ConcurrentCommitError,
    VersionedTable,
)


def test_catalog_create_sql_and_drop(spark, tmp_path):
    cat = LakeCatalog(spark, str(tmp_path / "cat"))
    cat.create_table(
        "cat_orders",
        spark.createDataFrame([(1, "O"), (2, "F")], "k long, status string"),
    )
    assert cat.list_tables() == ["cat_orders"]
    # resolvable by name through spark.sql immediately after create
    assert spark.sql("SELECT COUNT(*) AS n FROM cat_orders").first()["n"] == 2
    # commits through the catalog handle keep the view fresh
    cat.table("cat_orders").append(
        spark.createDataFrame([(3, "O")], "k long, status string")
    )
    assert spark.sql("SELECT COUNT(*) AS n FROM cat_orders").first()["n"] == 3
    with pytest.raises(ValueError, match="already exists"):
        cat.create_table("cat_orders")
    # drop without purge keeps the data; re-registering as external works
    loc = cat.table("cat_orders").location
    cat.drop_table("cat_orders")
    assert cat.list_tables() == []
    cat.create_table("cat_orders2", location=loc)
    cat.sync()
    assert spark.sql("SELECT COUNT(*) AS n FROM cat_orders2").first()["n"] == 3


def test_writer_lock_excludes_and_expires(spark, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "lk"))
    vt.overwrite(spark.createDataFrame([(1,)], "id long"))
    with vt.locked():
        other = VersionedTable(spark, vt.location)
        with pytest.raises(ConcurrentCommitError, match="writer lock"):
            with other.locked(timeout=0.3, poll=0.05):
                pass
    # released: acquirable again
    with vt.locked(timeout=1.0):
        pass
    # stale-lease break: a crashed holder's old lockfile is reclaimed
    import os
    import time

    path = os.path.join(vt.location, "_writer.lock")
    with open(path, "w") as f:
        f.write("dead")
    old = time.time() - 120
    os.utime(path, (old, old))
    with vt.locked(timeout=5.0, stale_after=60):  # breaks the stale lock
        pass


# -- round-5: rename / views / SHOW CREATE TABLE / INSERT OVERWRITE ---------


def test_catalog_rename_and_views(spark, tmp_path):
    from emr_on_eks_hudi_iceberg_delta_spark.operators.merge_sql import run_dml
    from emr_on_eks_hudi_iceberg_delta_spark.sources.catalog import LakeCatalog

    cat = LakeCatalog(spark, str(tmp_path / "cat_r5"))
    cat.create_table("raw", spark.range(5).withColumn("v", F.col("id") * 2))
    run_dml(spark, "ALTER TABLE raw RENAME TO base", catalog=cat)
    assert cat.list_tables() == ["base"]
    assert cat.table("base").read().count() == 5
    run_dml(
        spark,
        "CREATE VIEW big AS SELECT id, v FROM base WHERE v >= 4",
        catalog=cat,
    )
    got = run_dml(spark, "SELECT * FROM big", catalog=cat)
    assert got.count() == 3
    # a view is logical: new commits show through without re-creating it
    cat.table("base").append(
        spark.createDataFrame([(10, 40)], ["id", "v"])
    )
    assert cat.view("big").count() == 4
    run_dml(spark, "DROP VIEW big", catalog=cat)
    assert cat.list_views() == []


def test_show_create_table_reconstructs_ddl(spark, tmp_path):
    from emr_on_eks_hudi_iceberg_delta_spark.operators.merge_sql import run_dml
    from emr_on_eks_hudi_iceberg_delta_spark.sources.catalog import LakeCatalog

    cat = LakeCatalog(spark, str(tmp_path / "cat_ddl"))
    vt = cat.create_table("t1", spark.range(3).withColumn("s", F.lit("x")))
    vt.set_property("write.compression", "zstd")
    vt.add_constraint("pos_id", "id >= 0")
    stmt = run_dml(spark, "SHOW CREATE TABLE t1", catalog=cat).first()[0]
    assert "CREATE TABLE t1" in stmt and "id BIGINT" in stmt
    assert "CONSTRAINT pos_id CHECK (id >= 0)" in stmt
    assert "'write.compression' = 'zstd'" in stmt
    assert "LOCATION" in stmt


def test_insert_overwrite_sql(spark, tmp_path):
    from emr_on_eks_hudi_iceberg_delta_spark.operators.merge_sql import run_dml
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import VersionedTable

    vt = VersionedTable(spark, str(tmp_path / "vt_iow"))
    vt.overwrite(spark.createDataFrame([(1, "a")], ["k", "s"]))
    run_dml(
        spark,
        "INSERT OVERWRITE t VALUES (7, 'z'), (8, 'y')",
        {"t": vt},
    )
    rows = sorted((r["k"], r["s"]) for r in vt.read().collect())
    assert rows == [(7, "z"), (8, "y")]
    assert vt.read(version=0).count() == 1  # old snapshot time-travels


def test_materialized_view_lifecycle(spark, tmp_path):
    import pytest
    from pyspark.sql import functions as F

    from emr_on_eks_hudi_iceberg_delta_spark.sources.catalog import LakeCatalog

    cat = LakeCatalog(spark, str(tmp_path / "cat_mv"))
    cat.create_table("base", spark.range(10).select("id"))
    cat.create_materialized_view(
        "mv", "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base"
    )
    assert cat.list_materialized_views() == ["mv"]
    assert cat.table("mv").read().collect()[0]["n"] == 10
    cat.table("base").append(spark.range(10, 15).select("id"))
    # stale until refreshed (materialized, not a live view)
    assert cat.table("mv").read().collect()[0]["n"] == 10
    cat.refresh_materialized_view("mv")
    assert cat.table("mv").read().collect()[0]["n"] == 15
    # time travel over refreshes
    assert cat.table("mv").read(version=0).collect()[0]["n"] == 10
    with pytest.raises(ValueError, match="no materialized view"):
        cat.refresh_materialized_view("nope")


def test_mv_auto_rewrite_serves_from_materialized_table(spark, tmp_path):
    """Exact-text-tier MV matching: a statement equal to the defining
    SQL up to whitespace/keyword case (literals verbatim) is served
    from the MV's stored table — the plan reads the MV location, not
    the base table — while literal or structural differences pass
    through untouched."""
    from emr_on_eks_hudi_iceberg_delta_spark.sources.catalog import (
        LakeCatalog,
    )

    cat = LakeCatalog(spark, str(tmp_path / "cat"))
    base = spark.range(100).selectExpr(
        "id AS k", "CAST(id % 7 AS INT) AS g", "id * 2 AS v"
    )
    cat.create_table("base_t", base)
    mv_sql = "SELECT g, SUM(v) AS total FROM base_t WHERE g <> 3 GROUP BY g"
    cat.create_materialized_view("mv_totals", mv_sql)

    # whitespace + case variant matches; literals preserved
    variant = "select   G, sum(V) as TOTAL from base_t where g <> 3 GROUP BY g;"
    rewritten, used = cat.rewrite_with_materialized_views(variant)
    assert used == "mv_totals" and rewritten == "SELECT * FROM mv_totals"
    served = cat.serve(variant)
    direct = spark.sql(mv_sql)
    assert sorted(map(tuple, served.collect())) == sorted(
        map(tuple, direct.collect())
    )
    plan = served._jdf.queryExecution().executedPlan().toString()
    # one materialized FileScan of the MV schema; no aggregate subtree
    assert "struct<g:int,total:bigint>" in plan
    assert "HashAggregate" not in plan and "base_t" not in plan

    # a different predicate must NOT match (loud pass-through)
    other = "SELECT g, SUM(v) AS total FROM base_t WHERE g <> 4 GROUP BY g"
    rw2, used2 = cat.rewrite_with_materialized_views(other)
    assert used2 is None and rw2 == other


def test_mv_rewrite_literal_content_is_compared_verbatim(spark, tmp_path):
    from emr_on_eks_hudi_iceberg_delta_spark.sources.catalog import (
        LakeCatalog,
    )

    cat = LakeCatalog(spark, str(tmp_path / "cat2"))
    cat.create_table(
        "docs_t",
        spark.createDataFrame([(1, "En"), (2, "de")], "id bigint, lang string"),
    )
    cat.create_materialized_view(
        "mv_en", "SELECT id FROM docs_t WHERE lang = 'En'"
    )
    # case differs INSIDE the literal -> different query, no rewrite
    _, used = cat.rewrite_with_materialized_views(
        "SELECT id FROM docs_t WHERE lang = 'en'"
    )
    assert used is None
    # identical literal, shouty keywords -> rewrite
    _, used2 = cat.rewrite_with_materialized_views(
        "SELECT ID FROM DOCS_T WHERE LANG = 'En'"
    )
    assert used2 == "mv_en"


def test_mv_containment_rollup_serves_from_mv(spark, tmp_path):
    """Round-9 containment tier: a GROUP BY subset-of-view-keys query
    with derivable measures is served by re-aggregating the MV — the
    plan reads the materialized table, never the base."""
    from emr_on_eks_hudi_iceberg_delta_spark.sources.catalog import (
        LakeCatalog,
    )

    cat = LakeCatalog(spark, str(tmp_path / "cat_roll"))
    base = spark.range(1000).selectExpr(
        "CAST(id % 5 AS INT) AS a",
        "CAST(id % 3 AS INT) AS b",
        "CAST(id AS DECIMAL(18,4)) AS v",
    )
    cat.create_table("fact_t", base)
    cat.create_materialized_view(
        "mv_ab",
        "SELECT a, b, COUNT(*) AS n, SUM(v) AS s, MIN(v) AS lo,"
        " MAX(v) AS hi, COUNT(v) AS nv FROM fact_t GROUP BY a, b",
    )
    q = (
        "SELECT a, COUNT(*) AS n_rows, SUM(v) AS total, MIN(v) AS lo_v,"
        " MAX(v) AS hi_v, AVG(v) AS mean_v FROM fact_t GROUP BY a"
    )
    rewritten, used = cat.rewrite_with_materialized_views(q)
    assert used == "mv_ab"
    assert "mv_ab" in rewritten and "fact_t" not in rewritten
    served = cat.serve(q)
    # compare against a direct recompute on the registered temp view
    cat.sync()
    direct = spark.sql(q)
    got = {r["a"]: r for r in served.collect()}
    want = {r["a"]: r for r in direct.collect()}
    assert set(got) == set(want)
    for a in want:
        assert got[a]["n_rows"] == want[a]["n_rows"]
        assert got[a]["total"] == want[a]["total"]
        assert got[a]["lo_v"] == want[a]["lo_v"]
        assert got[a]["hi_v"] == want[a]["hi_v"]
        assert float(got[a]["mean_v"]) == float(want[a]["mean_v"])
    plan = served._jdf.queryExecution().executedPlan().toString()
    assert "fact_t" not in plan  # base table never scanned


def test_mv_containment_extra_predicate_on_view_keys(spark, tmp_path):
    from emr_on_eks_hudi_iceberg_delta_spark.sources.catalog import (
        LakeCatalog,
    )

    cat = LakeCatalog(spark, str(tmp_path / "cat_roll2"))
    base = spark.range(300).selectExpr(
        "CAST(id % 4 AS INT) AS a",
        "CAST(id % 2 AS INT) AS b",
        "id AS v",
    )
    cat.create_table("f2", base)
    cat.create_materialized_view(
        "mv2", "SELECT a, b, COUNT(*) AS n, SUM(v) AS s FROM f2 GROUP BY a, b"
    )
    q = "SELECT a, SUM(v) AS total FROM f2 WHERE b = 1 GROUP BY a"
    rewritten, used = cat.rewrite_with_materialized_views(q)
    assert used == "mv2" and "WHERE b = 1" in rewritten
    cat.sync()
    assert sorted(map(tuple, cat.serve(q).collect())) == sorted(
        map(tuple, spark.sql(q).collect())
    )
    # predicate on a NON-key column cannot be served by group filtering
    q_bad = "SELECT a, SUM(v) AS total FROM f2 WHERE v > 10 GROUP BY a"
    _, used_bad = cat.rewrite_with_materialized_views(q_bad)
    assert used_bad is None
    # view with its own WHERE only matches an identical query WHERE
    cat.create_materialized_view(
        "mv3", "SELECT a, SUM(v) AS s FROM f2 WHERE b = 0 GROUP BY a"
    )
    _, used_mismatch = cat.rewrite_with_materialized_views(
        "SELECT a, SUM(v) AS total FROM f2 WHERE b = 1 GROUP BY a"
    )
    assert used_mismatch == "mv2"  # NOT mv3 (predicate differs)


def test_mv_containment_refuses_non_derivable(spark, tmp_path):
    """The refusal contract: AVG without a stored count, DISTINCT
    aggregates, expression measures, and unaliased aggregates all pass
    through untouched."""
    from emr_on_eks_hudi_iceberg_delta_spark.sources.catalog import (
        LakeCatalog,
    )

    cat = LakeCatalog(spark, str(tmp_path / "cat_refuse"))
    base = spark.range(100).selectExpr(
        "CAST(id % 5 AS INT) AS a",
        "CAST(id % 3 AS INT) AS b",
        "id AS v",
    )
    cat.create_table("f3", base)
    # stored view has SUM but NO count of v
    cat.create_materialized_view(
        "mv_nosum", "SELECT a, b, SUM(v) AS s FROM f3 GROUP BY a, b"
    )
    for q in [
        # AVG without stored COUNT(v)
        "SELECT a, AVG(v) AS m FROM f3 GROUP BY a",
        # DISTINCT aggregate
        "SELECT a, COUNT(DISTINCT v) AS d FROM f3 GROUP BY a",
        # expression measure
        "SELECT a, SUM(v + 1) AS s1 FROM f3 GROUP BY a",
        # unaliased aggregate (output name not reproducible)
        "SELECT a, SUM(v) FROM f3 GROUP BY a",
        # measure the view does not store
        "SELECT a, MIN(v) AS lo FROM f3 GROUP BY a",
        # different table
        "SELECT a, SUM(v) AS s FROM other_t GROUP BY a",
        # join shape
        "SELECT a, SUM(v) AS s FROM f3 JOIN f3 USING (a) GROUP BY a",
    ]:
        out_sql, used = cat.rewrite_with_materialized_views(q)
        assert used is None and out_sql == q, q
