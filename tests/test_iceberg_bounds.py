"""Iceberg manifest column bounds (sources/iceberg_bounds.py):
single-value codec roundtrips, write-time collection from parquet
footers, and min/max file skipping through read_hidden — the Delta
stats-skipping twin on the Iceberg layout."""

import datetime as dt
import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emr_on_eks_hudi_iceberg_delta_spark.sources.iceberg_bounds import (
    bounds_may_match,
    decode_bound,
    encode_bound,
)
from emr_on_eks_hudi_iceberg_delta_spark.sources.iceberg_layout import (
    IcebergTable,
)
from emr_on_eks_hudi_iceberg_delta_spark.sources import iceberg_deletes  # noqa: F401


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_single_value_codec_roundtrips():
    cases = [
        (42, "int"), (-1, "int"), (2**40, "long"), (-(2**40), "long"),
        (1.5, "double"), (True, "boolean"), (False, "boolean"),
        ("héllo", "string"), ("", "string"),
        (dt.date(2024, 2, 29), "date"),
        (dt.datetime(2024, 1, 15, 13, 45, 30, 123456), "timestamp"),
    ]
    for v, t in cases:
        b = encode_bound(v, t)
        assert b is not None, (v, t)
        got = decode_bound(b, t)
        if t == "date":
            assert got == (v - dt.date(1970, 1, 1)).days
        elif t == "timestamp":
            assert got == int(
                (v - dt.datetime(1970, 1, 1)).total_seconds() * 1_000_000
            )
        else:
            assert got == v, (v, t)
    # widened column: a 4-byte int bound decodes under the long type
    assert decode_bound(encode_bound(7, "int"), "long") == 7


def test_bounds_missing_or_undecodable_keep_the_file():
    assert bounds_may_match({}, {"c": 1}, {1: "long"}, [("c", "=", 5)])
    ef = {
        "lower_bounds": [{"key": 1, "value": b"\x00"}],  # bad length
        "upper_bounds": [{"key": 1, "value": b"\x00"}],
    }
    assert bounds_may_match(ef, {"c": 1}, {1: "long"}, [("c", "=", 5)])


def test_manifest_bounds_recorded_and_skip_files(spark, tmp_path):
    t = IcebergTable(spark, str(tmp_path / "b1"))
    df = (
        spark.range(10_000)
        .selectExpr("id", "CAST(id AS DOUBLE) * 0.5 AS v",
                    "concat('k', lpad(CAST(id AS STRING), 6, '0')) AS s")
        .repartitionByRange(5, "id")
    )
    t.append(df)
    entries = t._entries()
    assert len(entries) == 5
    for e in entries:
        f = e["data_file"]
        assert f["lower_bounds"] and f["upper_bounds"]
        keys = {r["key"] for r in f["lower_bounds"]}
        assert keys == {1, 2, 3}  # id, v, s all bounded
    # range predicate on the UNPARTITIONED id column prunes files
    got = t.read_hidden([("id", ">=", 9000)])
    assert _rows(got) == _rows(df.filter("id >= 9000"))
    assert len(got.inputFiles()) < 5
    # string bounds prune too
    got2 = t.read_hidden([("s", "<", "k001000")])
    assert _rows(got2) == _rows(df.filter(F.col("s") < "k001000"))
    assert len(got2.inputFiles()) < 5
    # an unprovable predicate keeps everything but stays exact
    got3 = t.read_hidden([("v", "=", 123.5)])
    assert _rows(got3) == _rows(df.filter("v = 123.5"))


def test_bounds_skip_timestamps_and_compose_with_deletes(spark, tmp_path):
    t = IcebergTable(spark, str(tmp_path / "b2"))
    rows = [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(hours=i)) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id bigint, ts timestamp").orderBy("ts")
    t.append(df.repartitionByRange(4, "ts"))
    t.delete("id % 10 = 0")  # position deletes compose
    lo = dt.datetime(2024, 1, 7)
    got = t.read_hidden([("ts", ">=", lo)])
    want = [r for r in rows if r[1] >= lo and r[0] % 10 != 0]
    assert len(_rows(got)) == len(want)
    assert len(got.inputFiles()) < 4


def test_sort_rewrite_makes_skipping_effective(spark, tmp_path):
    """The binpack-vs-sort story: hash-scattered files have overlapping
    bounds (no pruning); a SORT rewrite under the declared sort order
    lays files out range-disjoint, so the same predicate prunes — and
    the changelog stays silent through the rewrite."""
    from emr_on_eks_hudi_iceberg_delta_spark.sources import (  # noqa: F401
        iceberg_changelog,
    )

    t = IcebergTable(spark, str(tmp_path / "b4"))
    df = spark.range(8_000).selectExpr(
        "id", "CAST(hash(id) AS BIGINT) AS scatter"
    )
    # scatter the sort key across files: every file's id bounds overlap
    t.append(df.repartition(6, "scatter"))
    s0 = t.history()[-1]["snapshot_id"]
    before = t.read_hidden([("id", ">=", 7_000)])
    n_before = len(before.inputFiles())
    t.set_sort_order(["id"])
    md = t._metadata()
    assert md["default-sort-order-id"] == 1
    t.rewrite_data_files(target_files=6)  # uses the declared order
    after = t.read_hidden([("id", ">=", 7_000)])
    assert len(after.inputFiles()) < n_before
    assert _rows(after) == _rows(df.filter("id >= 7000"))
    assert _rows(t.read()) == _rows(df)
    # rows are sorted inside each rewritten file (tight bounds proof)
    import pyarrow.parquet as pq

    for e in t._entries():
        ks = pq.read_table(
            e["data_file"]["file_path"], columns=["id"]
        )["id"].to_pylist()
        assert ks == sorted(ks)
    # the sort rewrite is maintenance: zero changelog events
    assert t.changes(s0).count() == 0


def test_bounds_survive_carry_and_widening(spark, tmp_path):
    t = IcebergTable(spark, str(tmp_path / "b3"))
    t.append(
        spark.range(100).selectExpr("CAST(id AS INT) AS k")
        .repartitionByRange(2, "k")
    )
    # widen int -> long, then append long data; old files' 4-byte
    # bounds still decode and prune under the widened type
    t.append(
        spark.range(1_000_000, 1_000_100)
        .selectExpr("id AS k")
        .repartitionByRange(2, "k"),
        merge_schema=True,
    )
    got = t.read_hidden([("k", ">=", 1_000_050)])
    assert got.count() == 50
    assert len(got.inputFiles()) < 4
    got2 = t.read_hidden([("k", "<", 50)])
    assert got2.count() == 50
    assert len(got2.inputFiles()) < 4
