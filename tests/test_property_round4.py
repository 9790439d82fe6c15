"""Property-based invariants for the round-4 operators:

* incremental MV refresh == from-scratch recompute on arbitrary old/new
  multiset pairs (the self-maintenance law, via table_changes diffs);
* ancestor_closure on random parent-pointer forests matches a pure-Python
  transitive walk (node count, depths, pair set);
* weighted_sample inclusion decisions are per-row pure: a sample of a
  subset == subset of the sample, given the same total weight.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from emr_on_eks_hudi_iceberg_delta_spark.operators.hierarchy import ancestor_closure
from emr_on_eks_hudi_iceberg_delta_spark.operators.materialized import (
    aggregate_view,
    refresh_aggregate_view,
)
from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import table_changes

rows = st.lists(
    st.tuples(
        st.integers(0, 20),
        st.sampled_from(["g0", "g1", "g2"]),
        st.integers(-50, 50).map(lambda x: x / 4.0),
    ),
    min_size=0,
    max_size=15,
)


def _mv_rows(df):
    return sorted(
        (r["grp"], r["mv_n"], float(r["sum_val"])) for r in df.collect()
    )


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(old=rows, new=rows)
def test_mv_refresh_equals_recompute(spark, old, new):
    schema = "id int, grp string, val double"
    old_df = spark.createDataFrame(old or [], schema)
    new_df = spark.createDataFrame(new or [], schema)
    mv0 = aggregate_view(old_df, ["grp"], {"sum_val": "val"})
    mv1 = refresh_aggregate_view(
        mv0, table_changes(spark, old_df, new_df), ["grp"], {"sum_val": "val"}
    )
    assert _mv_rows(mv1) == _mv_rows(
        aggregate_view(new_df, ["grp"], {"sum_val": "val"})
    )


parents = st.dictionaries(
    st.integers(2, 20), st.integers(1, 20), min_size=0, max_size=12
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(pmap=parents)
def test_closure_matches_python_walk(spark, pmap):
    # force acyclic: parent strictly smaller than node
    pmap = {n: p for n, p in pmap.items() if p < n}
    if not pmap:
        return
    edges = spark.createDataFrame(list(pmap.items()), "node long, parent long")
    got = {
        (r.node, r.anc, r.depth) for r in ancestor_closure(edges).collect()
    }
    want = set()
    for n in pmap:
        cur, d = n, 0
        while cur in pmap:
            cur = pmap[cur]
            d += 1
            want.add((n, cur, d))
    assert got == want


def test_weighted_sample_subset_consistency(spark):
    from emr_on_eks_hudi_iceberg_delta_spark.operators.sampling import (
        weighted_sample,
    )

    df = spark.createDataFrame(
        [(i, (i * 7) % 13 + 1) for i in range(300)], "id long, w long"
    )
    full = {r.id for r in weighted_sample(df, "id", "w", 60).collect()}
    # same rows, different physical layout: decisions must be identical
    again = {
        r.id
        for r in weighted_sample(df.orderBy(F.desc("id")), "id", "w", 60).collect()
    }
    assert full == again
