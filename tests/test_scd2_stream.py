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


def test_streaming_partitioned_upsert_touches_only_batch_partitions(spark):
    """Streaming upsert into a PartitionedTable: each micro-batch rewrites
    only the partitions it touches, and the result equals the sequential
    batch upserts."""
    from emr_on_eks_hudi_iceberg_delta_spark.operators.merge import upsert_by_key
    from emr_on_eks_hudi_iceberg_delta_spark.sources.partitioned import (
        PartitionedTable,
    )
    from emr_on_eks_hudi_iceberg_delta_spark.streaming.scd2_stream import (
        stream_upsert_partitioned,
    )

    cust = load_table(spark, SF_DIR, "customer")
    t0 = with_scd2_columns(cust, ["c_name", "c_mktsegment"], as_of=T0)
    pt = PartitionedTable(
        spark, tempfile.mkdtemp(prefix="pt_stream_"), partition_col="c_nationkey"
    )
    pt.overwrite(t0)

    # two update batches, each touching a disjoint nation subset
    b1 = with_scd2_columns(
        _batch(cust.filter("c_nationkey < 3"), 1, "_s1"),
        ["c_name", "c_mktsegment"], as_of="2024-02-01 00:00:00",
    )
    b2 = with_scd2_columns(
        _batch(cust.filter("c_nationkey >= 20"), 1, "_s2"),
        ["c_name", "c_mktsegment"], as_of="2024-03-01 00:00:00",
    )
    stage = tempfile.mkdtemp(prefix="ptstream_")
    b1.coalesce(1).write.mode("append").parquet(stage)
    b2.coalesce(1).write.mode("append").parquet(stage)
    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    q = stream_upsert_partitioned(
        pt, stream, ["c_custkey", "checksum"], "ts",
        tempfile.mkdtemp(prefix="ckpt_pt_"),
    )
    q.awaitTermination()

    expected = upsert_by_key(
        upsert_by_key(t0, b1, ["c_custkey", "checksum"], "ts"),
        b2, ["c_custkey", "checksum"], "ts",
    )
    got = pt.read()
    key = ["c_custkey", "checksum"]
    assert got.count() == expected.count()
    assert got.join(expected, on=key, how="left_anti").count() == 0
    assert expected.join(got, on=key, how="left_anti").count() == 0

    # per-commit partition rewrite counts: batch 1 touched nations 0-2,
    # batch 2 touched nations >= 20 — never the whole table
    counts = dict(pt.touched_partition_counts())
    n_all = t0.select("c_nationkey").distinct().count()
    assert counts[1] == 3
    assert 0 < counts[2] < n_all
