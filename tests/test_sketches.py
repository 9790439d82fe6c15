"""Sketch-aggregate contracts beyond the oracle gate: exactness below
sketch capacity, mergeability (the property that makes sketches the
100 TB primitive), and KLL's rank-error bound.
"""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emr_on_eks_hudi_iceberg_delta_spark.operators.sketches import (
    grouped_distinct_hll,
    hll_partial_sketches,
    hll_rollup,
    kll_quantile_profile,
    theta_set_cardinalities,
)
from emr_on_eks_hudi_iceberg_delta_spark.sources.parquet import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_hll_exact_below_sparse_capacity(spark):
    part = load_table(spark, SF_DIR, "part")
    est = {
        r["p_brand"]: r["distinct_est"]
        for r in grouped_distinct_hll(part, ["p_brand"], "p_type").collect()
    }
    exact = {
        r["p_brand"]: r["n"]
        for r in part.groupBy("p_brand")
        .agg(F.countDistinct("p_type").alias("n"))
        .collect()
    }
    assert est == exact


def test_theta_set_algebra_exact_and_consistent(spark):
    o = load_table(spark, SF_DIR, "orders")
    a = o.filter(F.col("o_orderkey") % 3 == 0)
    b = o.filter(F.col("o_orderkey") % 2 == 0)
    r = theta_set_cardinalities(a, b, "o_custkey").first()
    ka = a.select("o_custkey").distinct()
    kb = b.select("o_custkey").distinct()
    inter = ka.intersect(kb).count()
    union = ka.union(kb).distinct().count()
    assert r["union_est"] == union
    assert r["intersection_est"] == inter
    assert r["difference_est"] == ka.count() - inter
    # inclusion-exclusion closes on the estimates themselves
    assert r["union_est"] == ka.count() + kb.count() - r["intersection_est"]


def test_hll_rollup_merges_partials_within_tolerance(spark):
    """Partial sketches per supplier union to the global estimate —
    rollup == direct whole-table sketch (identical merged state), and
    both within 2% of the exact distinct count (the union path
    re-estimates from merged registers, so integer exactness is not
    contractual the way the sparse direct path is)."""
    li = load_table(spark, SF_DIR, "lineitem")
    partials = hll_partial_sketches(li, ["l_suppkey"], "l_partkey", lgk=14)
    rolled = hll_rollup(partials, []).first()["distinct_est"]
    direct = li.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("l_partkey", F.lit(14)))
        .cast("bigint")
        .alias("n")
    ).first()["n"]
    exact = li.select("l_partkey").distinct().count()
    assert abs(rolled - exact) <= max(2, exact * 0.02), (rolled, exact)
    # a union of partials is the SAME sketch state as the direct build
    assert rolled == direct, (rolled, direct)


def test_kll_quantiles_within_rank_error(spark):
    docs = load_table(spark, SF_DIR, "documents")
    row = kll_quantile_profile(docs, "n_chars", [0.1, 0.5, 0.9]).first()
    vals = sorted(r["n_chars"] for r in docs.select("n_chars").collect())
    n = len(vals)
    for p, col in [(0.1, "q0_1"), (0.5, "q0_5"), (0.9, "q0_9")]:
        q = row[col]
        # true rank of the returned value must sit within 5% of the
        # target rank (k=200 guarantees ~1.65%; 5% leaves slack for the
        # randomized compaction)
        lo = sum(1 for v in vals if v < q) / n
        hi = sum(1 for v in vals if v <= q) / n
        assert lo - 0.05 <= p <= hi + 0.05, (p, q, lo, hi)
    # monotone across probabilities
    assert row["q0_1"] <= row["q0_5"] <= row["q0_9"]


def test_hll_partials_survive_parquet_roundtrip(spark, tmp_path):
    """The lakehouse claim behind the sketch layer: per-group partials
    persisted to parquet (binary column) and read back in a LATER job
    roll up to the same estimate as the live sketches — distinct counts
    compose across snapshots without rescanning the corpus."""
    li = load_table(spark, SF_DIR, "lineitem")
    partials = hll_partial_sketches(li, ["l_suppkey"], "l_partkey", lgk=14)
    path = str(tmp_path / "sketch_partials")
    partials.write.parquet(path)
    reread = spark.read.parquet(path)
    assert dict(reread.dtypes)["sketch"] == "binary"
    live = hll_rollup(partials, []).first()["distinct_est"]
    stored = hll_rollup(reread, []).first()["distinct_est"]
    assert stored == live


def test_stickiness_hll_twin_exact_at_gate_scale(spark):
    """Gate-scale cardinalities sit below the HLL sparse capacity, so
    the pane-rollup twin must equal the exact query integer-for-integer
    (the module's exactness contract), and its plan must contain NO
    explode (Generate) — the twin exists to remove that fan-out."""
    from emr_on_eks_hudi_iceberg_delta_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    exact = {
        r["day"]: r
        for r in REGISTRY["dau_wau_mau_stickiness"].fn(spark, sf).collect()
    }
    twin_df = REGISTRY["dau_wau_mau_stickiness_hll"].fn(spark, sf)
    plan = twin_df._jdf.queryExecution().optimizedPlan().toString()
    assert "Generate" not in plan  # zero explode fan-out
    twin = {r["day"]: r for r in twin_df.collect()}
    assert set(twin) == set(exact)
    for day, w in exact.items():
        g = twin[day]
        assert (g["dau"], g["wau"], g["mau"]) == (
            w["dau"], w["wau"], w["mau"]
        ), day
        assert abs(g["stickiness"] - w["stickiness"]) < 1e-12


def test_stickiness_hll_error_band_beyond_sparse_capacity(spark):
    """20k users/day pushes the sketches into estimation mode; every
    metric must stay within a conservative 5% of exact (documented RSE
    at lgk=12 is ~0.8%)."""
    import datetime

    from emr_on_eks_hudi_iceberg_delta_spark.operators.sketches import (
        hll_partial_sketches,
    )
    from pyspark.sql import functions as F

    n_days, users = 10, 20_000
    base = spark.range(n_days * users).selectExpr(
        f"CAST(date_add(DATE '2024-01-01', CAST(id % {n_days} AS INT)) "
        "AS DATE) AS pane_day",
        # ~60% of the user population active per day, day-dependent mix
        f"CAST(pmod(id * 2654435761, {int(users * 1.6)}) AS BIGINT) "
        "AS user_id",
    )
    panes = hll_partial_sketches(base, ["pane_day"], "user_id")
    days = panes.select(F.col("pane_day").alias("day"))
    est = (
        panes.join(
            F.broadcast(days),
            (F.col("pane_day") <= F.col("day"))
            & (F.col("pane_day") >= F.date_sub(F.col("day"), 6)),
        )
        .groupBy("day")
        .agg(
            F.hll_sketch_estimate(
                F.hll_union_agg("sketch", F.lit(True))
            ).cast("bigint").alias("wau_est")
        )
    )
    truth = (
        base.select(F.col("pane_day"), "user_id")
        .join(
            F.broadcast(days),
            (F.col("pane_day") <= F.col("day"))
            & (F.col("pane_day") >= F.date_sub(F.col("day"), 6)),
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").cast("bigint").alias("wau"))
    )
    got = {r["day"]: r["wau_est"] for r in est.collect()}
    want = {r["day"]: r["wau"] for r in truth.collect()}
    assert set(got) == set(want)
    for day, w in want.items():
        assert abs(got[day] - w) / w < 0.05, (day, got[day], w)
