"""Property test: the keyed CDF is a relabeling of the plain multiset
diff — pre/post pairing must conserve the underlying insert/delete row
multisets for ANY pair of table states."""

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import (
    table_changes,
    table_changes_keyed,
)

rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 2), st.integers(0, 1)),
    min_size=0,
    max_size=8,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(old=rows, new=rows)
def test_cdf_conserves_the_multiset_diff(spark, old, new):
    schema = "k int, a int, b int"
    old_df = spark.createDataFrame(old, schema) if old else spark.createDataFrame([], schema)
    new_df = spark.createDataFrame(new, schema) if new else spark.createDataFrame([], schema)
    plain = table_changes(spark, old_df, new_df).collect()
    keyed = table_changes_keyed(spark, old_df, new_df, ["k"]).collect()

    def bag(rws, types):
        return Counter(
            (r["k"], r["a"], r["b"]) for r in rws if r["_change_type"] in types
        )

    # every insert row survives as insert-or-postimage, byte-identical
    assert bag(plain, {"insert"}) == bag(keyed, {"insert", "update_postimage"})
    assert bag(plain, {"delete"}) == bag(keyed, {"delete", "update_preimage"})
    # pairing is balanced per key
    pre = Counter(r["k"] for r in keyed if r["_change_type"] == "update_preimage")
    post = Counter(r["k"] for r in keyed if r["_change_type"] == "update_postimage")
    assert pre == post
