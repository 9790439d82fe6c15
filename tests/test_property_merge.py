"""Property-based SCD2 merge invariants (hypothesis): for ANY split of keys
into changed / unchanged / new, every merge variant must produce
exactly (|updates| + |changed|) rows, one current row per live key, and
expired rows stamped with the batch timestamp.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from emr_on_eks_hudi_iceberg_delta_spark.functions.scd2 import with_scd2_columns
from emr_on_eks_hudi_iceberg_delta_spark.operators.merge import (
    scd2_merge_delta_style,
    scd2_merge_hudi_style,
    scd2_merge_iceberg_style,
)

T1, T2 = "2024-01-01 00:00:00", "2024-02-01 00:00:00"
KEYS = list(range(1, 21))


@st.composite
def splits(draw):
    changed = draw(st.sets(st.sampled_from(KEYS), max_size=10))
    dropped = draw(st.sets(st.sampled_from(sorted(set(KEYS) - changed)), max_size=5))
    n_new = draw(st.integers(min_value=0, max_value=5))
    variant = draw(st.sampled_from(["hudi", "iceberg", "delta"]))
    return changed, dropped, n_new, variant


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(split=splits())
def test_merge_invariant_holds(spark, split):
    changed, dropped, n_new, variant = split
    initial = spark.createDataFrame(
        [Row(id=k, attr=f"v{k}") for k in KEYS]
    )
    update_rows = [
        Row(id=k, attr=f"v{k}_changed" if k in changed else f"v{k}")
        for k in KEYS
        if k not in dropped
    ] + [Row(id=100 + i, attr=f"new{i}") for i in range(n_new)]
    updates = spark.createDataFrame(update_rows)

    fn = {
        "hudi": scd2_merge_hudi_style,
        "iceberg": scd2_merge_iceberg_style,
        "delta": scd2_merge_delta_style,
    }[variant]
    target = with_scd2_columns(
        initial, ["attr"], as_of=T1, include_ts=(variant != "delta")
    )
    result = fn(target, updates, "id", ["attr"], as_of=T2).cache()

    n_updates = len(update_rows)
    n_changed = len(changed - dropped)
    n_dropped = len(dropped)
    # dropped keys keep their (still-current) target rows: merges never
    # delete rows absent from the update batch (reference semantics)
    assert result.count() == n_updates + n_changed + n_dropped
    assert result.filter("iscurrent = 1").count() == n_updates + n_dropped
    expired = result.filter("iscurrent = 0")
    assert expired.count() == n_changed
    assert (
        expired.filter(F.col("valid_to") != F.lit(T2).cast("timestamp_ntz")).count()
        == 0
    )
    dup = result.filter("iscurrent = 1").groupBy("id").count().filter("count > 1")
    assert dup.count() == 0
    result.unpersist()
