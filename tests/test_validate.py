"""table_digest / tables_equal (operators/validate.py): order and
layout independence, tamper detection (value flip, row drop, duplicate
row — the even-multiplicity case xor alone would miss), and the NULL
sentinel keeping ('a', NULL) distinct from concat-collapsed shapes."""

import os
import sys

from pyspark.sql import Row
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emr_on_eks_hudi_iceberg_delta_spark.operators.validate import (
    table_digest,
    tables_equal,
)

SF = "/root/testdata/sf0.001"
COLS = ["o_orderkey", "o_orderstatus"]


def _orders(spark):
    return spark.read.parquet(f"{SF}/orders.parquet").select(*COLS)


def test_layout_independence(spark):
    o = _orders(spark)
    assert tables_equal(o, o.repartition(13).orderBy(F.rand(7)), COLS)


def test_detects_value_flip_and_row_drop(spark):
    o = _orders(spark)
    flipped = o.withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") == 7, F.lit("X")).otherwise(
            F.col("o_orderstatus")
        ),
    )
    assert not tables_equal(o, flipped, COLS)
    assert not tables_equal(o, o.filter("o_orderkey != 7"), COLS)


def test_detects_even_multiplicity_duplicate(spark):
    # duplicating a row twice keeps xor unchanged; count+sum catch it
    o = _orders(spark)
    dup2 = o.unionAll(o.filter("o_orderkey = 7")).unionAll(
        o.filter("o_orderkey = 7")
    )
    da = table_digest(o, COLS).collect()[0]
    db = table_digest(dup2, COLS).collect()[0]
    assert da["hash_xor"] == db["hash_xor"]  # xor blind here, by design
    assert da["n_rows"] != db["n_rows"] and da["hash_sum"] != db["hash_sum"]


def test_null_sentinel_distinguishes(spark):
    a = spark.createDataFrame([Row(x="a", y=None)], "x string, y string")
    b = spark.createDataFrame([Row(x="a", y="")], "x string, y string")
    assert not tables_equal(a, b, ["x", "y"])


# ----------------------------- reconcile_tables -----------------------------

from emr_on_eks_hudi_iceberg_delta_spark.operators.validate import (  # noqa: E402
    reconcile_tables,
)


def test_reconcile_classifies_all_three_kinds(spark):
    src = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k int, v string"
    )
    tgt = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d")], "k int, v string"
    )
    out = {
        r["k"]: r["change_type"]
        for r in reconcile_tables(src, tgt, ["k"], ["v"]).collect()
    }
    assert out == {2: "update", 3: "insert", 4: "delete"}


def test_reconcile_equal_tables_empty(spark):
    src = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    assert reconcile_tables(src, src, ["k"], ["v"]).count() == 0


def test_reconcile_multiset_semantics(spark):
    # duplicate keys: same rows swapped between the two dup slots -> equal;
    # cardinality change under an identical payload -> update
    src = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "p")], "k int, v string"
    )
    same_swapped = spark.createDataFrame(
        [(1, "y"), (1, "x"), (2, "p")], "k int, v string"
    )
    assert reconcile_tables(src, same_swapped, ["k"], ["v"]).count() == 0
    extra_copy = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "p"), (2, "p")], "k int, v string"
    )
    rows = reconcile_tables(src, extra_copy, ["k"], ["v"]).collect()
    assert [(r["k"], r["change_type"], r["src_n"], r["tgt_n"]) for r in rows] \
        == [(2, "update", 1, 2)]


def test_reconcile_repair_roundtrip(spark):
    # applying the changeset to tgt reproduces src exactly
    src = _orders(spark)
    tgt = (
        src.filter("o_orderkey % 19 != 0")
        .unionAll(src.filter("o_orderkey % 23 = 0"))
        .withColumn(
            "o_orderstatus",
            F.when(F.col("o_orderkey") % 13 == 0, F.lit("Z")).otherwise(
                F.col("o_orderstatus")
            ),
        )
    )
    diff = reconcile_tables(src, tgt, ["o_orderkey"], ["o_orderstatus"])
    flagged = [r["o_orderkey"] for r in diff.collect()]
    # repair: drop every flagged key from tgt, re-insert src's rows for them
    repaired = tgt.join(
        diff.select("o_orderkey"), "o_orderkey", "left_anti"
    ).unionAll(src.join(diff.select("o_orderkey"), "o_orderkey", "left_semi"))
    assert flagged and tables_equal(src, repaired, COLS)


def test_schema_diff_all_change_kinds(spark):
    from emr_on_eks_hudi_iceberg_delta_spark.operators.validate import (
        schema_diff,
    )

    a = spark.createDataFrame([], "k int, gone string, t int, n int")
    b = spark.createDataFrame([], "k int, t string, n int, fresh double")
    # force a nullability difference on n
    from pyspark.sql.types import IntegerType, StructField, StructType

    b = spark.createDataFrame(
        [],
        StructType(
            [
                StructField("k", IntegerType(), True),
                StructField("t", b.schema["t"].dataType, True),
                StructField("n", IntegerType(), False),
                StructField("fresh", b.schema["fresh"].dataType, True),
            ]
        ),
    )
    got = {(d["column"], d["change"]) for d in schema_diff(a, b)}
    assert got == {
        ("gone", "removed"),
        ("t", "type_changed"),
        ("n", "nullability_changed"),
        ("fresh", "added"),
    }
    assert schema_diff(a, a) == []


def test_reconcile_agrees_with_cdf_on_stale_clone(spark, tmp_path):
    """Lakehouse cross-check: for a clone frozen at version v, the
    digest-based reconcile worklist (content compare, no history) must
    flag exactly the keys the version store's CDF says changed in
    (v, head] — two independent mechanisms, one truth."""
    from pyspark.sql import functions as F

    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import (
        VersionedTable,
    )

    src = VersionedTable(spark, str(tmp_path / "src"))
    base = spark.range(100).select(
        F.col("id").alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("payload"),
        F.lit(1).alias("seq"),
    )
    src = src.overwrite(base)
    stale = src.read()  # the clone's frozen content (version v)
    v = src.history()[-1]["version"]

    # advance src: 5 updates, 3 inserts
    upd = spark.createDataFrame(
        [(k, "CHANGED", 2) for k in (3, 17, 41, 77, 98)]
        + [(1000 + i, "new", 2) for i in range(3)],
        "k bigint, payload string, seq int",
    )
    src = src.upsert(upd, ["k"], "seq")

    recon = reconcile_tables(
        src.read(), stale, ["k"], ["payload"]
    )
    recon_keys = {
        (r["k"], r["change_type"]) for r in recon.collect()
    }

    cdf = src.changes(v, src.history()[-1]["version"])
    cdf_keys = set()
    for r in cdf.select("k", "_change_type").distinct().collect():
        cdf_keys.add(r["k"])
    # CDF reports updates as delete+insert on the same key; reconcile
    # reports them once as 'update'. Compare at key granularity.
    assert {k for k, _ in recon_keys} == cdf_keys
    assert {ct for k, ct in recon_keys if k < 1000} == {"update"}
    assert {ct for k, ct in recon_keys if k >= 1000} == {"insert"}
