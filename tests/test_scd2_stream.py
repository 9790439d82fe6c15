"""Streaming SCD2 ingestion: two update micro-batches applied via
foreachBatch must equal the same merges applied sequentially in batch mode,
and the golden invariant must hold after each commit."""

import tempfile

from pyspark.sql import functions as F

from emr_on_eks_hudi_iceberg_delta_spark.functions.scd2 import with_scd2_columns
from emr_on_eks_hudi_iceberg_delta_spark.operators.merge import scd2_merge_hudi_style
from emr_on_eks_hudi_iceberg_delta_spark.sources.parquet import load_table
from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import VersionedTable
from emr_on_eks_hudi_iceberg_delta_spark.streaming.scd2_stream import stream_scd2_into

SF_DIR = "/root/testdata/sf0.001"
T0 = "2024-01-01 00:00:00"


def _batch(cust, mod, seg_suffix):
    return cust.withColumn(
        "c_mktsegment",
        F.when(
            F.col("c_custkey") % mod == 0,
            F.concat(F.col("c_mktsegment"), F.lit(seg_suffix)),
        ).otherwise(F.col("c_mktsegment")),
    )


def test_streaming_scd2_equals_sequential_batches(spark):
    cust = load_table(spark, SF_DIR, "customer")
    target0 = with_scd2_columns(cust, ["c_name", "c_mktsegment"], as_of=T0)

    b1 = _batch(cust, 13, "_v2")
    b2 = _batch(cust, 7, "_v3")

    # stage two parquet files -> two files replayed one per micro-batch
    stage = tempfile.mkdtemp(prefix="scd2stream_")
    b1.coalesce(1).write.mode("append").parquet(stage)
    b2.coalesce(1).write.mode("append").parquet(stage)

    stream = (
        spark.readStream.schema(cust.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_stream_"))
    vt.overwrite(target0)

    times = {0: "2024-02-01 00:00:00", 1: "2024-03-01 00:00:00"}
    q = stream_scd2_into(
        vt,
        stream,
        "c_custkey",
        ["c_name", "c_mktsegment"],
        tempfile.mkdtemp(prefix="ckpt_scd2_"),
        as_of_fn=lambda bid: times[bid],
    )
    q.awaitTermination()

    # file order == write order for the file source, but batch->timestamp
    # assignment is what we injected; replay the same merges in batch mode
    expected = scd2_merge_hudi_style(
        target0, b1, "c_custkey", ["c_name", "c_mktsegment"], as_of=times[0]
    )
    expected = scd2_merge_hudi_style(
        expected, b2, "c_custkey", ["c_name", "c_mktsegment"], as_of=times[1]
    )

    got = vt.read().toPandas().sort_values(["c_custkey", "checksum", "valid_from"]).reset_index(drop=True)
    exp = expected.toPandas().sort_values(["c_custkey", "checksum", "valid_from"]).reset_index(drop=True)
    assert got.equals(exp[got.columns])

    # invariant: exactly one current row per live key
    cur = vt.read().filter("iscurrent = 1")
    assert cur.groupBy("c_custkey").count().filter("count > 1").count() == 0
    # history depth: snapshots v0, v1, v2
    assert [s["version"] for s in vt.history()] == [0, 1, 2]
