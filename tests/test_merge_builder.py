"""MergeIntoBuilder clause semantics (the plugin-free MERGE INTO, S10/S11)."""

from pyspark.sql import functions as F

from emr_on_eks_hudi_iceberg_delta_spark.operators.merge import MergeIntoBuilder


def _frames(spark):
    target = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1), (3, "c", 0)], "id int, v string, cur int"
    )
    source = spark.createDataFrame(
        [(1, "a2"), (3, "c2"), (9, "z")], "id int, v string"
    )
    return target, source


def test_unconditional_update_insert(spark):
    t, s = _frames(spark)
    out = (
        MergeIntoBuilder(t, s, F.col("t.id") == F.col("s.id"))
        .when_matched_update(set={"v": F.col("s.v")})
        .when_not_matched_insert_all()
        .execute()
    )
    rows = {r["id"]: (r["v"], r["cur"]) for r in out.collect()}
    assert rows == {1: ("a2", 1), 2: ("b", 1), 3: ("c2", 0), 9: ("z", None)}


def test_conditional_update_preserves_nonmatching(spark):
    t, s = _frames(spark)
    out = (
        MergeIntoBuilder(t, s, F.col("t.id") == F.col("s.id"))
        .when_matched_update(condition=F.col("t.cur") == 1, set={"v": F.col("s.v")})
        .execute()
    )
    rows = {r["id"]: r["v"] for r in out.collect()}
    # id=3 matched but cur=0 -> untouched; id=9 has no insert clause -> absent
    assert rows == {1: "a2", 2: "b", 3: "c"}


def test_matched_delete(spark):
    t, s = _frames(spark)
    out = (
        MergeIntoBuilder(t, s, F.col("t.id") == F.col("s.id"))
        .when_matched_delete(condition=F.col("t.cur") == 1)
        .execute()
    )
    rows = sorted(r["id"] for r in out.collect())
    # id=1 matched+cur=1 -> deleted; id=3 matched but cur=0 -> kept; id=2 unmatched
    assert rows == [2, 3]


def test_conditional_insert(spark):
    t, s = _frames(spark)
    out = (
        MergeIntoBuilder(t, s, F.col("t.id") == F.col("s.id"))
        .when_not_matched_insert_all(condition=F.col("s.v") != "z")
        .execute()
    )
    rows = sorted(r["id"] for r in out.collect())
    assert rows == [1, 2, 3]  # id=9 filtered out by insert condition


def test_null_merge_key_never_matches(spark):
    """The J4 NULL-mergeKey semantics: NULL = x is never true, so NULL-keyed
    source rows always take the insert branch (delta/delta_scd_script.py:76-91)."""
    t = spark.createDataFrame([(1, "a")], "id int, v string")
    s = spark.createDataFrame(
        [(None, "dup-of-1"), (1, "match-1")],
        "mergeKey int, v string",
    ).withColumn("id", F.coalesce("mergeKey", F.lit(-1)))
    out = (
        MergeIntoBuilder(t, s, F.col("t.id") == F.col("s.mergeKey"))
        .when_matched_update(set={"v": F.col("s.v")})
        .when_not_matched_insert_all()
        .execute()
    )
    vals = sorted(r["v"] for r in out.collect())
    assert vals == ["dup-of-1", "match-1"]


def test_multiple_source_matches_raise(spark):
    """Delta's MERGE cardinality check: >1 source row matching one target
    row raises instead of silently emitting duplicate updated copies
    (ADVICE r1: execute() previously skipped the docstring's promised check)."""
    import pytest
    from py4j.protocol import Py4JJavaError

    t = spark.createDataFrame([(1, "a")], "id int, v string")
    s = spark.createDataFrame([(1, "x"), (1, "y")], "id int, v string")
    out = (
        MergeIntoBuilder(t, s, F.col("t.id") == F.col("s.id"))
        .when_matched_update(set={"v": F.col("s.v")})
        .execute()
    )
    with pytest.raises(Exception) as ei:
        out.collect()
    assert "multiple source rows" in str(ei.value)


def test_cardinality_check_disabled_passes_duplicates(spark):
    t = spark.createDataFrame([(1, "a")], "id int, v string")
    s = spark.createDataFrame([(1, "x"), (1, "y")], "id int, v string")
    out = (
        MergeIntoBuilder(t, s, F.col("t.id") == F.col("s.id"))
        .when_matched_update(set={"v": F.col("s.v")})
        .with_cardinality_check(False)
        .execute()
    )
    assert sorted(r["v"] for r in out.collect()) == ["x", "y"]


def test_insert_only_merge_skips_cardinality_guard(spark):
    """No matched clause -> duplicates cannot corrupt the target; the guard
    (and its extra window shuffle) must not fire."""
    t = spark.createDataFrame([(1, "a")], "id int, v string")
    s = spark.createDataFrame([(1, "x"), (1, "y"), (2, "n")], "id int, v string")
    out = (
        MergeIntoBuilder(t, s, F.col("t.id") == F.col("s.id"))
        .when_not_matched_insert_all()
        .execute()
    )
    rows = sorted((r["id"], r["v"]) for r in out.collect())
    assert rows == [(1, "a"), (2, "n")]


def test_chained_matched_update_then_delete(spark):
    """Delta first-applicable-clause ordering: matched rows failing the
    UPDATE condition fall through to the chained DELETE; rows failing both
    conditions pass through unchanged. (The delete clause used to be
    silently ignored when an update clause was present.)"""
    t = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 0), (3, "c", 2)], "id int, v string, cur int"
    )
    s = spark.createDataFrame([(1, "u"), (2, "u"), (3, "u")], "id int, v string")
    out = (
        MergeIntoBuilder(t, s, F.col("t.id") == F.col("s.id"))
        .when_matched_update(condition=F.col("t.cur") == 1, set={"v": F.col("s.v")})
        .when_matched_delete(condition=F.col("t.cur") == 0)
        .execute()
    )
    rows = sorted((r["id"], r["v"]) for r in out.collect())
    # id=1 updated; id=2 deleted; id=3 fails both -> kept unchanged
    assert rows == [(1, "u"), (3, "c")]
