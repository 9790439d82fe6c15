"""Streaming CDF source (sources/delta_cdf_source.py — the "deltacdf"
format): version offsets, per-commit change attribution matching the
batch table_changes, cdc-file passthrough, refusals."""

import os
import sys
import tempfile

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emr_on_eks_hudi_iceberg_delta_spark.sources import delta_cdf  # noqa: F401
from emr_on_eks_hudi_iceberg_delta_spark.sources import delta_dml  # noqa: F401
from emr_on_eks_hudi_iceberg_delta_spark.sources.delta_cdf_source import (
    register_deltacdf_source,
)
from emr_on_eks_hudi_iceberg_delta_spark.sources.delta_log import (
    DeltaLogTable,
)

EVENT_COLS = ["k", "v", "_change_type", "_commit_version"]


def _events(df):
    return sorted(map(tuple, df.select(*EVENT_COLS).collect()))


def _lifecycle_table(spark, tmp_path):
    dt = DeltaLogTable(spark, str(tmp_path / "cdfsrc"))
    dt.overwrite(
        spark.range(10).selectExpr("id AS k", "id * 2 AS v")
    )  # v0: inserts
    dt.set_table_properties(
        {"delta.enableChangeDataFeed": "true"}
    )  # v1: metadata-only
    dt.append(
        spark.range(10, 14).selectExpr("id AS k", "id * 2 AS v")
    )  # v2: inserts
    dt.delete("k < 3")  # v3: cdc-backed deletes
    dt.update("k = 12", {"v": "999"})  # v4: cdc pre/post images
    return dt


def test_batch_reader_matches_table_changes(spark, tmp_path):
    dt = _lifecycle_table(spark, tmp_path)
    register_deltacdf_source(spark)
    got = (
        spark.read.format("deltacdf")
        .option("location", dt.location)
        .load()
    )
    want = dt.table_changes(0)
    assert _events(got) == _events(want)
    # range options slice by version
    sliced = (
        spark.read.format("deltacdf")
        .option("location", dt.location)
        .option("startingVersion", 3)
        .option("endingVersion", 3)
        .load()
    )
    assert _events(sliced) == _events(dt.table_changes(3, 3))
    assert (
        sliced.select("_change_type").distinct().collect()[0][0]
        == "delete"
    )


def test_stream_replays_change_history_exactly_once(spark, tmp_path):
    dt = _lifecycle_table(spark, tmp_path)
    register_deltacdf_source(spark)
    out = tempfile.mkdtemp(prefix="cdf_sink_")
    ck = tempfile.mkdtemp(prefix="cdf_ck_")

    def run():
        q = (
            spark.readStream.format("deltacdf")
            .option("location", dt.location)
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
        "k bigint, v bigint, _change_type string, "
        "_commit_version bigint, _commit_timestamp bigint"
    )
    got = spark.read.schema(schema).parquet(out)
    assert _events(got) == _events(dt.table_changes(0))
    # checkpointed offsets: a new commit streams INCREMENTALLY —
    # re-running serves only the new version's events
    dt.append(spark.createDataFrame([(100, 0)], "k long, v long"))
    run()
    got2 = spark.read.schema(schema).parquet(out)
    assert len(_events(got2)) == len(_events(got)) + 1
    assert _events(got2) == _events(dt.table_changes(0))


def test_cdf_source_refusals(spark, tmp_path):
    register_deltacdf_source(spark)
    # pre-CDF rewrite commits refuse loudly
    dt = DeltaLogTable(spark, str(tmp_path / "precdf"))
    dt.overwrite(spark.range(10).selectExpr("id AS k", "id AS v"))
    dt.delete("k < 3")  # no CDF: remove+add rewrite
    with pytest.raises(Exception, match="change-data actions"):
        (
            spark.read.format("deltacdf")
            .option("location", dt.location)
            .load()
            .collect()
        )
    # column-mapped tables refuse at schema resolution
    from emr_on_eks_hudi_iceberg_delta_spark.sources import delta_colmap  # noqa: F401

    dm = DeltaLogTable(spark, str(tmp_path / "mapcdf"))
    dm.overwrite(spark.range(5).selectExpr("id AS k", "id AS v"))
    dm.enable_column_mapping()
    with pytest.raises(Exception, match="column-mapped"):
        (
            spark.read.format("deltacdf")
            .option("location", dm.location)
            .load()
        )
