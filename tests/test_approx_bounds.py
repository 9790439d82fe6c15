"""Error-bound checks for the sketch-based aggregates: approx_stats is the
registry's only rows-only entry (HLL/KLL sketches are engine-specific by
design), so pytest pins its accuracy against the exact aggregates instead
of a value-hash oracle."""

from pyspark.sql import functions as F

from emr_on_eks_hudi_iceberg_delta_spark.queries import REGISTRY
from emr_on_eks_hudi_iceberg_delta_spark.sources.parquet import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_approx_count_distinct_within_hll_error(spark):
    """approx_count_distinct runs HLL++ at the default rsd=0.05: every
    group's estimate must land within 3 standard deviations (15%) of the
    exact distinct count — a violation means the sketch config silently
    changed, not noise."""
    li = load_table(spark, SF_DIR, "lineitem")
    approx = REGISTRY["approx_stats"].fn(spark, SF_DIR)
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("exact_suppliers"),
    )
    joined = approx.join(exact, "l_returnflag").collect()
    assert len(joined) >= 2  # A, N, R flags
    for r in joined:
        rel_err = abs(r["approx_suppliers"] - r["exact_suppliers"]) / max(
            1, r["exact_suppliers"]
        )
        assert rel_err <= 0.15, (
            f"HLL estimate off by {rel_err:.1%} for flag {r['l_returnflag']} "
            f"({r['approx_suppliers']} vs {r['exact_suppliers']}) — "
            "outside 3x the 5% configured rsd"
        )


def test_approx_percentile_within_rank_error(spark):
    """percentile_approx at the default accuracy (10000) guarantees rank
    error <= 1/accuracy; assert the approx median falls between generous
    exact rank bounds (quantiles 0.49 and 0.51) per group."""
    li = load_table(spark, SF_DIR, "lineitem")
    approx = {
        r["l_returnflag"]: r["approx_median_qty"]
        for r in REGISTRY["approx_stats"].fn(spark, SF_DIR).collect()
    }
    bounds = {
        r["l_returnflag"]: (r["lo"], r["hi"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_quantity, 0.49)").alias("lo"),
            F.expr("percentile(l_quantity, 0.51)").alias("hi"),
        )
        .collect()
    }
    assert set(approx) == set(bounds)
    for flag, med in approx.items():
        lo, hi = bounds[flag]
        assert lo <= med <= hi, (
            f"approx median {med} for flag {flag} outside exact rank "
            f"bounds [{lo}, {hi}] — percentile_approx accuracy regressed"
        )
