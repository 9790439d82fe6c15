"""Streaming Hudi persisted-CDC source (sources/hudi_cdc_source.py —
the "hudicdc" format): batch-cdc_scan parity, checkpointed stream
tail, maintenance-instant skip, loud refusal toward inference for
unpersisted commits."""

import os
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emr_on_eks_hudi_iceberg_delta_spark.sources import hudi_cdc  # noqa: F401
from emr_on_eks_hudi_iceberg_delta_spark.sources import hudi_maintenance  # noqa: F401
from emr_on_eks_hudi_iceberg_delta_spark.sources.hudi_cdc_source import (
    register_hudicdc_source,
)
from emr_on_eks_hudi_iceberg_delta_spark.sources.hudi_layout import (
    HudiCowTable,
)


def _ev(df):
    return sorted(map(tuple, df.collect()))


def _table(spark, tmp_path, name="c", cdc=True):
    t = HudiCowTable(
        spark, str(tmp_path / name), record_key="k",
        precombine_field="v", n_file_groups=2, cdc_enabled=cdc,
    )
    t.bulk_insert(
        spark.createDataFrame(
            [(k, float(k)) for k in range(10)], "k long, v double"
        )
    )
    return t


def test_batch_reader_matches_cdc_scan(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.upsert(
        spark.createDataFrame([(3, 99.0), (42, 1.0)], "k long, v double")
    )
    t.delete("k % 4 = 1")
    register_hudicdc_source(spark)
    got = (
        spark.read.format("hudicdc")
        .option("location", t.location)
        .load()
    )
    assert _ev(got) == _ev(t.cdc_scan(""))
    kinds = {
        r["_change_type"]
        for r in got.select("_change_type").distinct().collect()
    }
    assert kinds == {
        "insert", "delete", "update_before", "update_after"
    }


def test_stream_tails_commits_exactly_once(spark, tmp_path):
    t = _table(spark, tmp_path, "tail")
    register_hudicdc_source(spark)
    out = tempfile.mkdtemp(prefix="hcdc_sink_")
    ck = tempfile.mkdtemp(prefix="hcdc_ck_")

    def run():
        q = (
            spark.readStream.format("hudicdc")
            .option("location", t.location)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run()  # batch 1: the bulk insert's inserts
    t.upsert(spark.createDataFrame([(5, 500.0)], "k long, v double"))
    t.cluster(n_file_groups=1)  # maintenance: emits nothing
    t.delete("k = 0")
    run()  # batch 2: upsert + delete events only
    schema = (
        spark.read.format("hudicdc")
        .option("location", t.location)
        .load()
        .schema
    )
    sunk = spark.read.schema(schema).parquet(out)
    assert _ev(sunk) == _ev(t.cdc_scan(""))
    assert (
        sunk.filter("_change_type = 'update_after' AND k = 5")
        .first()["v"]
        == 500.0
    )


def test_unpersisted_commit_refuses_toward_inference(spark, tmp_path):
    t = _table(spark, tmp_path, "nop", cdc=False)  # no persisted CDC
    t.upsert(spark.createDataFrame([(1, 9.0)], "k long, v double"))
    register_hudicdc_source(spark)
    with pytest.raises(Exception, match="no persisted CDC"):
        (
            spark.read.format("hudicdc")
            .option("location", t.location)
            .load()
            .collect()
        )
    # the batch cdc_scan (inference) still serves the same history
    assert t.cdc_scan("", use_persisted=False).count() > 0
