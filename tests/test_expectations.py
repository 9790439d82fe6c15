"""Expectations operators (operators/expectations.py): the split
partitions the input exactly, NULL rule results quarantine (with the
rule named), the report is a single-scan single-exchange plan, and the
quarantine projection involves no shuffle."""

import os
import sys

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emr_on_eks_hudi_iceberg_delta_spark.operators.expectations import (
    expectations_report,
    quarantine_split,
)
from emr_on_eks_hudi_iceberg_delta_spark.plans import shuffle_count

RULES = {
    "qty_le_30": "l_quantity <= 30",
    "discount_le_5pct": "l_discount <= 0.05",
}


def _li(spark):
    return spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")


def test_split_partitions_input(spark):
    li = _li(spark)
    valid, quarantined = quarantine_split(li, RULES)
    n, nv, nq = li.count(), valid.count(), quarantined.count()
    assert nv + nq == n and nq > 0 and nv > 0
    # no row in both: quarantined rows all fail a rule the valid side passes
    assert valid.filter(
        ~((F.col("l_quantity") <= 30) & (F.col("l_discount") <= 0.05))
    ).count() == 0


def test_report_counts_match_split(spark):
    li = _li(spark)
    report = {r["rule"]: r for r in expectations_report(li, RULES).collect()}
    assert set(report) == set(RULES)
    for name, rule in RULES.items():
        n_fail_direct = li.filter(f"NOT ({rule})").count()
        assert report[name]["n_fail"] == n_fail_direct
        assert report[name]["n_rows"] == li.count()
        assert report[name]["rank"] == list(RULES).index(name) + 1


def test_null_rule_result_quarantines(spark):
    df = spark.createDataFrame(
        [Row(id=1, v=5), Row(id=2, v=None), Row(id=3, v=50)]
    )
    rules = {"v_small": "v <= 30", "v_pos": "v > 0"}
    valid, quarantined = quarantine_split(df, rules)
    assert [r["id"] for r in valid.collect()] == [1]
    q = {r["id"]: r["failed_rules"] for r in quarantined.collect()}
    # NULL fails BOTH rules, named in declaration order
    assert q == {2: "v_small,v_pos", 3: "v_small"}
    rep = {r["rule"]: r["n_fail"] for r in expectations_report(df, rules).collect()}
    assert rep == {"v_small": 2, "v_pos": 1}


def test_plan_shapes(spark):
    li = _li(spark)
    # report: one scan folding all rules into one aggregate — a single
    # exchange (the one-row global agg), never one pass per rule
    assert shuffle_count(expectations_report(li, RULES)) <= 1
    # quarantine: pure per-row projection, zero shuffles
    _valid, quarantined = quarantine_split(li, RULES)
    assert shuffle_count(quarantined) == 0


def test_empty_rules_rejected(spark):
    li = _li(spark)
    with pytest.raises(ValueError):
        expectations_report(li, {})
    with pytest.raises(ValueError):
        quarantine_split(li, {})


def test_expect_or_fail_triad(spark):
    from emr_on_eks_hudi_iceberg_delta_spark.operators.expectations import (
        ExpectationFailure,
        expect_or_fail,
    )

    li = _li(spark)
    # passing rules chain through unchanged
    out = expect_or_fail(li, {"tax_ok": "l_tax >= 0"})
    assert out is li
    with pytest.raises(ExpectationFailure, match="qty_le_30"):
        expect_or_fail(li, RULES)
