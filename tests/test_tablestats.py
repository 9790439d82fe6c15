"""column_stats / estimate_equijoin_rows (operators/tablestats.py):
one-scan plan shape, HLL vs exact NDV agreement band, and the join
estimator landing on the true cardinality for a PK-FK join."""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emr_on_eks_hudi_iceberg_delta_spark.operators.tablestats import (
    column_stats,
    estimate_equijoin_rows,
)

SF = "/root/testdata/sf0.001"


def test_exact_stats_values(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (3, "b")], "k int, v string"
    )
    rows = {r["column"]: r for r in column_stats(df, exact=True).collect()}
    assert rows["k"]["n_rows"] == 4 and rows["k"]["n_nonnull"] == 4
    assert rows["k"]["n_distinct"] == 3
    assert rows["k"]["min_value"] == "1" and rows["k"]["max_value"] == "3"
    assert rows["v"]["n_nonnull"] == 3 and rows["v"]["n_distinct"] == 2


def test_hll_ndv_within_documented_band(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    approx = {
        r["column"]: r["n_distinct"]
        for r in column_stats(
            orders, ["o_orderkey", "o_custkey"], rsd=0.01
        ).collect()
    }
    exact = {
        r["column"]: r["n_distinct"]
        for r in column_stats(
            orders, ["o_orderkey", "o_custkey"], exact=True
        ).collect()
    }
    for c in approx:
        # rsd=0.01 -> 5% is a 5-sigma band
        assert abs(approx[c] - exact[c]) / exact[c] < 0.05


def test_single_scan_plan(spark):
    """All columns' stats ride one scan: exactly one parquet scan node
    in the approx plan (exact mode pays the documented Expand)."""
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    plan = (
        column_stats(orders, ["o_orderkey", "o_custkey", "o_orderstatus"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan parquet") == 1


def test_join_estimate_hits_pkfk_truth(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    so = {r["column"]: r for r in column_stats(orders, ["o_custkey"], exact=True).collect()}
    sc = {r["column"]: r for r in column_stats(cust, ["c_custkey"], exact=True).collect()}
    est = estimate_equijoin_rows(
        so["o_custkey"]["n_rows"], so["o_custkey"]["n_distinct"],
        sc["c_custkey"]["n_rows"], sc["c_custkey"]["n_distinct"],
    )
    actual = orders.join(cust, orders.o_custkey == cust.c_custkey).count()
    # PK side ndv == PK row count => estimate equals |orders| restricted
    # to matching keys; containment makes it exact here
    assert abs(est - actual) / actual < 0.05


def test_estimator_degenerate_inputs():
    assert estimate_equijoin_rows(10, 0, 10, 5) == 0.0
    assert estimate_equijoin_rows(100, 10, 50, 5) == 500.0


def test_suggest_broadcast_flips_sort_merge_to_broadcast(spark):
    """With auto-broadcast disabled, a plain join of two mid-size
    frames plans sort-merge; the stats advisor's hint flips the
    sub-threshold side to a broadcast hash join."""
    from emr_on_eks_hudi_iceberg_delta_spark.operators.tablestats import (
        plan_equijoin,
        suggest_broadcast,
    )
    from emr_on_eks_hudi_iceberg_delta_spark.plans.explain import (
        broadcast_join_count,
        shuffle_count,
    )

    big = spark.range(200_000).selectExpr("id AS k", "id * 2 AS v")
    small = spark.range(500).selectExpr("id AS k", "id + 1 AS w")
    big_stats = column_stats(big, ["k"], exact=True).collect()
    small_stats = column_stats(small, ["k"], exact=True).collect()

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain = big.join(small, "k")
        assert broadcast_join_count(plain) == 0  # sort-merge baseline

        joined, decision = plan_equijoin(
            big, small, "k", big_stats, small_stats
        )
        assert decision["broadcast"] == "right"
        assert decision["est_right_bytes"] <= decision["threshold_bytes"]
        assert broadcast_join_count(joined) == 1
        assert shuffle_count(joined) == 0  # the whole point of the hint

        hinted, d2 = suggest_broadcast(small, small_stats)
        assert d2["broadcast"] is True
        assert broadcast_join_count(big.join(hinted, "k")) == 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_suggest_broadcast_declines_over_threshold(spark):
    """An over-threshold estimate must NOT hint: broadcasting a big
    build side OOMs executors — declining is the advisor's other half."""
    from emr_on_eks_hudi_iceberg_delta_spark.operators.tablestats import (
        plan_equijoin,
        suggest_broadcast,
    )
    from emr_on_eks_hudi_iceberg_delta_spark.plans.explain import (
        broadcast_join_count,
    )

    a = spark.range(100_000).selectExpr("id AS k", "id AS v")
    b = spark.range(100_000).selectExpr("id AS k", "id AS w")
    sa = column_stats(a, ["k"], exact=True).collect()
    sb = column_stats(b, ["k"], exact=True).collect()

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # tiny threshold: both sides over it -> no hint, sort-merge kept
        joined, decision = plan_equijoin(
            a, b, "k", sa, sb, threshold_bytes=1024
        )
        assert decision["broadcast"] is None
        assert broadcast_join_count(joined) == 0

        _, d2 = suggest_broadcast(a, sa, threshold_bytes=1024)
        assert d2["broadcast"] is False
        # Selinger estimate rides along: PK-PK join of equal ranges
        assert abs(decision["est_join_rows"] - 100_000) < 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_estimated_size_uses_observed_string_widths(spark):
    from emr_on_eks_hudi_iceberg_delta_spark.operators.tablestats import (
        estimated_size_bytes,
    )

    short = spark.createDataFrame([(1, "ab")] * 10, "id bigint, s string")
    wide = spark.createDataFrame(
        [(1, "x" * 500)] * 10, "id bigint, s string"
    )
    s1 = column_stats(short, exact=True).collect()
    s2 = column_stats(wide, exact=True).collect()
    assert estimated_size_bytes(wide, s2) > 10 * estimated_size_bytes(
        short, s1
    )
