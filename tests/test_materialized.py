"""Incremental materialized-view maintenance invariants the parity test
can't see: the delete path, group drop-out at zero count, and equivalence
with a from-scratch recompute after multiple refresh generations."""

import pytest
from pyspark.sql import functions as F

from emr_on_eks_hudi_iceberg_delta_spark.operators.materialized import (
    aggregate_view,
    refresh_aggregate_view,
)
from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import table_changes


def _rows(df):
    return {
        tuple(r) for r in df.select(*sorted(df.columns)).collect()
    }


@pytest.fixture()
def base(spark):
    return spark.createDataFrame(
        [(i, "g%d" % (i % 3), float(i)) for i in range(1, 61)],
        "id long, grp string, val double",
    )


def test_refresh_equals_recompute(spark, base):
    new = base.withColumn(
        "val", F.when(F.col("id") % 5 == 0, F.col("val") * 3).otherwise(F.col("val"))
    ).filter(F.col("id") % 7 != 0)
    mv0 = aggregate_view(base, ["grp"], {"sum_val": "val"})
    mv1 = refresh_aggregate_view(
        mv0, table_changes(spark, base, new), ["grp"], {"sum_val": "val"}
    )
    assert _rows(mv1) == _rows(aggregate_view(new, ["grp"], {"sum_val": "val"}))


def test_group_drops_out_at_zero_count(spark, base):
    new = base.filter(F.col("grp") != "g1")
    mv0 = aggregate_view(base, ["grp"], {"sum_val": "val"})
    mv1 = refresh_aggregate_view(
        mv0, table_changes(spark, base, new), ["grp"], {"sum_val": "val"}
    )
    assert mv1.filter(F.col("grp") == "g1").count() == 0
    assert _rows(mv1) == _rows(aggregate_view(new, ["grp"], {"sum_val": "val"}))


def test_new_group_appears_via_insert_delta(spark, base):
    extra = spark.createDataFrame(
        [(100, "g9", 2.5), (101, "g9", 7.5)], "id long, grp string, val double"
    )
    new = base.unionByName(extra)
    mv0 = aggregate_view(base, ["grp"], {"sum_val": "val"})
    mv1 = refresh_aggregate_view(
        mv0, table_changes(spark, base, new), ["grp"], {"sum_val": "val"}
    )
    g9 = mv1.filter(F.col("grp") == "g9").first()
    assert g9["mv_n"] == 2 and float(g9["sum_val"]) == 10.0


def test_multi_generation_refresh_chain(spark, base):
    """Three successive refreshes stay exact — no drift across
    generations (the production refresh loop)."""
    states = [
        base,
        base.filter(F.col("id") % 4 != 0),
        base.filter(F.col("id") % 4 != 0).withColumn(
            "val", F.col("val") + F.lit(1.0)
        ),
        base.limit(0),
    ]
    mv = aggregate_view(states[0], ["grp"], {"sum_val": "val"})
    for old, new in zip(states, states[1:]):
        mv = refresh_aggregate_view(
            mv, table_changes(spark, old, new), ["grp"], {"sum_val": "val"}
        )
        assert _rows(mv) == _rows(aggregate_view(new, ["grp"], {"sum_val": "val"}))
    assert mv.count() == 0


def test_streaming_mv_refresh_is_multi_generation(spark):
    """The streaming MV query must actually exercise multiple incremental
    folds (4 micro-batches -> 4 view snapshots), not collapse into one
    batch — and a second identical replay must be a no-op (txn guard)."""
    import tempfile

    from emr_on_eks_hudi_iceberg_delta_spark.sources.parquet import load_table
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import VersionedTable
    from emr_on_eks_hudi_iceberg_delta_spark.streaming.events import EVENTS_SCHEMA
    from emr_on_eks_hudi_iceberg_delta_spark.streaming.scd2_stream import (
        stream_incremental_mv,
    )

    stage = tempfile.mkdtemp(prefix="mvs_")
    load_table(spark, "/root/testdata/sf0.001", "events").repartition(4).write.mode(
        "overwrite"
    ).parquet(stage)
    mv = VersionedTable(spark, tempfile.mkdtemp(prefix="mvt_"))
    ckpt = tempfile.mkdtemp(prefix="mvc_")

    def replay():
        stream = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )
        stream_incremental_mv(
            stream, mv, ["event_type"], {"sum_value": "value"}, ckpt
        ).awaitTermination()

    replay()
    n_snaps = len(mv.history())
    assert n_snaps == 4  # one fold per micro-batch
    total = mv.read().agg(F.sum("mv_n")).first()[0]
    assert total == load_table(spark, "/root/testdata/sf0.001", "events").count()
    # restart replay over the same checkpoint: nothing new, no extra commits
    replay()
    assert len(mv.history()) == n_snaps


def test_per_commit_cdf_folds_into_mv_like_endpoint_state(spark, tmp_path):
    """Composition pin: replaying changes_per_commit's steps IN ORDER
    through refresh_aggregate_view reproduces the from-scratch view of
    the final snapshot — the CDF range read and the incremental MV
    agree on every intermediate commit, including churn a netted
    endpoint diff would hide."""
    from emr_on_eks_hudi_iceberg_delta_spark.operators.materialized import (
        aggregate_view,
        refresh_aggregate_view,
    )
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import VersionedTable

    vt = VersionedTable(spark, str(tmp_path / "vt_cdf_mv"))
    vt.overwrite(
        spark.createDataFrame(
            [("a", 10.0), ("a", 5.0), ("b", 1.0)], ["g", "v"]
        )
    )
    vt.append(spark.createDataFrame([("b", 2.0), ("c", 7.0)], ["g", "v"]))
    vt.delete_where("g = 'a'")
    vt.update_where("g = 'c'", {"v": F.lit(9.0)})

    view = aggregate_view(vt.read(version=0), ["g"], {"sum_v": "v"})
    steps = vt.changes_per_commit(0, 3)
    for v in range(1, 4):
        view = refresh_aggregate_view(
            view,
            steps.filter(F.col("_commit_version") == v).drop("_commit_version"),
            ["g"],
            {"sum_v": "v"},
        )
    expect = sorted(map(tuple, aggregate_view(vt.read(), ["g"], {"sum_v": "v"}).collect()))
    got = sorted(map(tuple, view.collect()))
    assert got == expect
    assert [g for g, *_ in got] == ["b", "c"]  # 'a' dropped out entirely


def test_join_view_cross_term_is_live(spark):
    """Dropping the ΔA⋈ΔB term (the classic IVM bug) must give a WRONG
    refresh on the gate query's data — proving the test data exercises
    it — while the full identity matches the from-scratch recompute."""
    from pyspark.sql import functions as F

    from emr_on_eks_hudi_iceberg_delta_spark.operators.materialized import (
        _fold_signed_delta,
        _signed,
        aggregate_view,
        refresh_join_aggregate_view,
    )
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import (
        table_changes,
    )

    sf = "/root/testdata/sf0.001"
    orders = spark.read.parquet(f"{sf}/orders.parquet").select(
        "o_orderkey", F.col("o_custkey").alias("c_custkey"), "o_totalprice"
    )
    cust = spark.read.parquet(f"{sf}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    a_old, a_new = orders.filter(F.col("o_orderkey") % 3 != 0), orders
    b_old, b_new = cust, cust.filter(F.col("c_custkey") % 7 != 3)
    group, sums = ["c_mktsegment"], {"sum_price": "o_totalprice"}

    mv0 = aggregate_view(a_old.join(b_old, "c_custkey"), group, sums)
    da = table_changes(spark, a_old, a_new)
    db = table_changes(spark, b_old, b_new)

    full = refresh_join_aggregate_view(
        mv0, a_old, da, b_old, db, "c_custkey", group, sums
    )
    scratch = aggregate_view(a_new.join(b_new, "c_custkey"), group, sums)
    as_rows = lambda df: sorted(
        (r["c_mktsegment"], r["mv_n"], str(r["sum_price"]))
        for r in df.collect()
    )
    assert as_rows(full) == as_rows(scratch)

    # buggy refresh: only the two single-side terms
    sa, sb = _signed(da, "__sign_a"), _signed(db, "__sign_b")
    d1 = sa.join(b_old, "c_custkey").select(
        F.col("__sign_a").alias("__sign"), *group, *sums.values()
    )
    d2 = a_old.join(sb, "c_custkey").select(
        F.col("__sign_b").alias("__sign"), *group, *sums.values()
    )
    buggy = _fold_signed_delta(mv0, d1.unionByName(d2), group, sums)
    assert as_rows(buggy) != as_rows(scratch)


def test_join_view_empty_delta_is_noop(spark):
    from pyspark.sql import functions as F

    from emr_on_eks_hudi_iceberg_delta_spark.operators.materialized import (
        aggregate_view,
        refresh_join_aggregate_view,
    )
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import (
        table_changes,
    )

    sf = "/root/testdata/sf0.001"
    orders = spark.read.parquet(f"{sf}/orders.parquet").select(
        "o_orderkey", F.col("o_custkey").alias("c_custkey"), "o_totalprice"
    )
    cust = spark.read.parquet(f"{sf}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    group, sums = ["c_mktsegment"], {"sum_price": "o_totalprice"}
    mv0 = aggregate_view(orders.join(cust, "c_custkey"), group, sums)
    out = refresh_join_aggregate_view(
        mv0,
        orders,
        table_changes(spark, orders, orders),
        cust,
        table_changes(spark, cust, cust),
        "c_custkey",
        group,
        sums,
    )
    a = sorted(
        (r["c_mktsegment"], r["mv_n"], str(r["sum_price"]))
        for r in out.collect()
    )
    b = sorted(
        (r["c_mktsegment"], r["mv_n"], str(r["sum_price"]))
        for r in mv0.collect()
    )
    assert a == b
