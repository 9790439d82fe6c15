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


def test_mor_refuses(spark, tmp_path):
    m = HudiMorTable(
        spark, str(tmp_path / "mor"),
        record_key="k", precombine_field="v",
    )
    m.bulk_insert(spark.range(5).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v"))
    register_hudiincr_source(spark)
    with pytest.raises(Exception, match="COPY_ON_WRITE"):
        (
            spark.read.format("hudiincr")
            .option("location", m.location)
            .load()
        )
