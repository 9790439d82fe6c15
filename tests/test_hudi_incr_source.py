"""Streaming Hudi incremental source (sources/hudi_incr_source.py —
the "hudiincr" format): instant offsets, read_incremental parity,
checkpoint-resume exactly-once, clustering in-range, MoR refusal."""

import os
import sys
import tempfile

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emr_on_eks_hudi_iceberg_delta_spark.sources import hudi_maintenance  # noqa: F401
from emr_on_eks_hudi_iceberg_delta_spark.sources.hudi_incr_source import (
    register_hudiincr_source,
)
from emr_on_eks_hudi_iceberg_delta_spark.sources.hudi_layout import (
    HudiCowTable,
    HudiMorTable,
)

COLS = ["k", "v", "_hoodie_commit_time"]


def _rows(df):
    return sorted(map(tuple, df.select(*COLS).collect()))


def _table(spark, path):
    t = HudiCowTable(
        spark, str(path), record_key="k", precombine_field="v",
    )
    i1 = t.bulk_insert(
        spark.range(20).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    )
    i2 = t.upsert(
        spark.range(5).selectExpr("id AS k", "CAST(id + 100.0 AS DOUBLE) AS v")
    )
    i3 = t.upsert(
        spark.range(20, 23).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    )
    return t, i1, i2, i3


def test_batch_reader_matches_read_incremental(spark, tmp_path):
    t, i1, i2, i3 = _table(spark, tmp_path / "incr")
    register_hudiincr_source(spark)
    got = (
        spark.read.format("hudiincr")
        .option("location", t.location)
        .option("startingInstant", i1)
        .load()
    )
    assert _rows(got) == _rows(t.read_incremental(i1))
    assert got.count() == 8  # 5 updates + 3 inserts
    # instant range slicing: only i2's changes
    sliced = (
        spark.read.format("hudiincr")
        .option("location", t.location)
        .option("startingInstant", i1)
        .option("endingInstant", i2)
        .load()
    )
    assert sliced.count() == 5
    assert set(r[0] for r in sliced.select("k").collect()) == set(range(5))
    # full replay (no start): every current row exactly once
    full = (
        spark.read.format("hudiincr")
        .option("location", t.location)
        .load()
    )
    assert full.count() == 23


def test_stream_tails_commits_exactly_once(spark, tmp_path):
    t, i1, i2, i3 = _table(spark, tmp_path / "stream")
    register_hudiincr_source(spark)
    out = tempfile.mkdtemp(prefix="hincr_sink_")
    ck = tempfile.mkdtemp(prefix="hincr_ck_")

    def run():
        q = (
            spark.readStream.format("hudiincr")
            .option("location", t.location)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run()
    schema = (
        "_hoodie_commit_time string, _hoodie_record_key string, "
        "_hoodie_partition_path string, k bigint, v double, "
        "_hoodie_file_name string"
    )
    got = spark.read.schema(schema).parquet(out)
    # first run replays the whole history: the 23 current keys, with
    # the 5 updated keys served at their UPDATED values exactly once
    assert got.count() == 23
    assert _rows(got) == _rows(t.read())
    # checkpointed offsets: a new upsert streams INCREMENTALLY
    i4 = t.upsert(
        spark.createDataFrame([(7, 777.0)], "k long, v double")
    )
    run()
    got2 = spark.read.schema(schema).parquet(out)
    assert got2.count() == 24
    new = got2.filter(F.col("_hoodie_commit_time") == i4)
    assert [(r["k"], r["v"]) for r in new.collect()] == [(7, 777.0)]
    # re-running with NO new commits appends nothing (exactly-once)
    run()
    assert spark.read.schema(schema).parquet(out).count() == 24


def test_clustering_in_range_serves_rows_once(spark, tmp_path):
    """A replacecommit inside the batch range retires the groups it
    replaced — in-range rows ride the new slices exactly once (both
    the stream source and batch read_incremental)."""
    t = HudiCowTable(
        spark, str(tmp_path / "clus"),
        record_key="k", precombine_field="v", n_file_groups=4,
    )
    i1 = t.bulk_insert(
        spark.range(40).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    )
    t.upsert(spark.range(6).selectExpr("id AS k", "CAST(id + 500.0 AS DOUBLE) AS v"))
    t.cluster(2)  # rewrites every group, stamps preserved
    inc = t.read_incremental(i1)
    assert inc.count() == 6
    assert sorted(r["k"] for r in inc.collect()) == list(range(6))
    register_hudiincr_source(spark)
    got = (
        spark.read.format("hudiincr")
        .option("location", t.location)
        .option("startingInstant", i1)
        .load()
    )
    assert got.count() == 6
    assert _rows(got) == _rows(inc)


def test_mor_incremental_matches_batch(spark, tmp_path):
    """MoR (r12 second half): per-file-group executor merge — the
    source must equal batch read_incremental through upserts, a
    tombstone delete, resurrection, and compaction."""
    m = HudiMorTable(
        spark, str(tmp_path / "mor"),
        record_key="k", precombine_field="v", n_file_groups=3,
    )
    i1 = m.bulk_insert(
        spark.range(30).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    )
    m.upsert(
        spark.range(6).selectExpr("id AS k", "CAST(id + 100 AS DOUBLE) AS v")
    )
    m.delete("k = 3")  # log tombstone
    m.upsert(
        spark.createDataFrame([(3, 999.0)], "k long, v double")
    )  # resurrection
    register_hudiincr_source(spark)
    got = (
        spark.read.format("hudiincr")
        .option("location", m.location)
        .option("startingInstant", i1)
        .load()
    )
    assert _rows(got) == _rows(m.read_incremental(i1))
    ks = {r["k"]: r["v"] for r in got.collect()}
    assert ks[3] == 999.0 and ks[0] == 100.0
    # untouched groups never enter the plan (cold-group scoping pin)
    m2 = HudiMorTable(
        spark, str(tmp_path / "mor2"),
        record_key="k", precombine_field="v", n_file_groups=4,
    )
    j1 = m2.bulk_insert(
        spark.range(40).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    )
    m2.upsert(spark.createDataFrame([(7, 777.0)], "k long, v double"))
    got2 = (
        spark.read.format("hudiincr")
        .option("location", m2.location)
        .option("startingInstant", j1)
        .load()
    )
    assert [(r["k"], r["v"]) for r in got2.collect()] == [(7, 777.0)]
    fg7 = int(
        m2._with_meta(
            spark.createDataFrame([(7, 0.0)], "k long, v double"),
            "x", m2._file_group_expr(),
        ).select("__fg").first()[0]
    )
    assert all(f"fg-{fg7}_" in os.path.basename(f) for f in got2.inputFiles())


def test_mor_stream_tails_exactly_once(spark, tmp_path):
    m = HudiMorTable(
        spark, str(tmp_path / "morstream"),
        record_key="k", precombine_field="v",
    )
    m.bulk_insert(
        spark.range(10).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    )
    register_hudiincr_source(spark)
    out = tempfile.mkdtemp(prefix="morincr_sink_")
    ck = tempfile.mkdtemp(prefix="morincr_ck_")

    def run():
        q = (
            spark.readStream.format("hudiincr")
            .option("location", m.location)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run()
    schema = (
        "k bigint, v double, _hoodie_commit_time string, "
        "_hoodie_record_key string, _hoodie_partition_path string, "
        "_hoodie_file_name string"
    )
    assert spark.read.schema(schema).parquet(out).count() == 10
    i2 = m.delete("k = 4")
    i3 = m.upsert(
        spark.createDataFrame([(2, 222.0)], "k long, v double")
    )
    run()
    got = spark.read.schema(schema).parquet(out)
    # the tail serves the surviving changed row; the tombstoned key
    # vanishes (MoR incremental = current values of changed keys)
    assert got.count() == 11
    assert [
        (r["k"], r["v"])
        for r in got.filter(
            F.col("_hoodie_commit_time").isin(i2, i3)
        ).collect()
    ] == [(2, 222.0)]
    run()
    assert spark.read.schema(schema).parquet(out).count() == 11
