"""Bloom-prefilter join (operators/scale.py, round 6): exactness vs the
plain join, the plan contract (both semi joins broadcast — the probe side
is never shuffled for the prefilter), false-positive robustness at tiny
``bits``, and the outer-flavor guard."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emr_on_eks_hudi_iceberg_delta_spark.operators.scale import (
    bloom_prefilter_join,
)
from emr_on_eks_hudi_iceberg_delta_spark.plans import broadcast_join_count

SF_DIR = "/root/testdata/sf0.001"


def _tables(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    build = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    return li, build


def test_equals_plain_join(spark):
    li, build = _tables(spark)
    got = sorted(
        (r["l_orderkey"], float(r["l_quantity"]))
        for r in bloom_prefilter_join(li, build, "l_orderkey").collect()
    )
    want = sorted(
        (r["l_orderkey"], float(r["l_quantity"]))
        for r in li.join(build, "l_orderkey").collect()
    )
    assert got == want and len(got) > 0


def test_tiny_bitmap_still_exact(spark):
    # bits=16 makes nearly every position occupied -> the prefilter passes
    # almost everything; the exact join must still drop all false positives
    li, build = _tables(spark)
    got = bloom_prefilter_join(li, build, "l_orderkey", bits=16).count()
    assert got == li.join(build, "l_orderkey").count()


def test_semi_flavor(spark):
    li, build = _tables(spark)
    got = bloom_prefilter_join(
        li, build, "l_orderkey", how="left_semi"
    ).count()
    assert got == li.join(build, "l_orderkey", "left_semi").count()


def test_prefilter_joins_are_broadcast(spark):
    li, build = _tables(spark)
    df = bloom_prefilter_join(li, build, "l_orderkey")
    # 2 broadcast semi joins (the prefilter) and, at this SF, Spark may
    # also broadcast the final join's build side — so >= 2, and the
    # explain must show no exchange feeding the semi joins' probe side
    assert broadcast_join_count(df) >= 2
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi, BuildRight" in plan


def test_outer_flavor_rejected(spark):
    li, build = _tables(spark)
    with pytest.raises(ValueError, match="inner/left_semi"):
        bloom_prefilter_join(li, build, "l_orderkey", how="left")


def test_pareto_skyline_bruteforce_and_duplicates(spark):
    import itertools
    import random

    from emr_on_eks_hudi_iceberg_delta_spark.operators.scale import (
        pareto_skyline,
    )

    rng = random.Random(11)
    rows = [
        (i, rng.randint(0, 12), float(rng.randint(0, 12)))
        for i in range(300)
    ]
    # planted duplicate optimum: two ids share the same frontier point
    rows += [(9001, 99, 0.0), (9002, 99, 0.0)]
    df = spark.createDataFrame(rows, "id int, x int, y double").repartition(7)

    def dominated(p, qs):
        return any(
            q[1] >= p[1] and q[2] <= p[2] and (q[1] > p[1] or q[2] < p[2])
            for q in qs
        )

    expected = sorted(r[0] for r in rows if not dominated(r, rows))
    got = sorted(
        r["id"]
        for r in pareto_skyline(df, "x", "y", "max", "min").collect()
    )
    assert got == expected
    assert 9001 in got and 9002 in got  # ties both survive


def test_pareto_skyline_partition_layout_independent(spark):
    import random

    from emr_on_eks_hudi_iceberg_delta_spark.operators.scale import (
        pareto_skyline,
    )

    rng = random.Random(12)
    rows = [(i, rng.random(), rng.random()) for i in range(500)]
    df1 = spark.createDataFrame(rows, "id int, x double, y double").coalesce(1)
    df13 = spark.createDataFrame(rows, "id int, x double, y double").repartition(13)
    a = sorted(r["id"] for r in pareto_skyline(df1, "x", "y").collect())
    b = sorted(r["id"] for r in pareto_skyline(df13, "x", "y").collect())
    assert a == b and len(a) >= 1
