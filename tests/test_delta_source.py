"""format("deltalog") Python DataSource (sources/delta_source.py):
batch snapshot/time-travel reads and the log-tailing stream source
(exact append attribution, OPTIMIZE no-ops, loud non-append refusal)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emr_on_eks_hudi_iceberg_delta_spark.sources.delta_log import DeltaLogTable
from emr_on_eks_hudi_iceberg_delta_spark.sources.delta_source import (
    register_deltalog_source,
)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_batch_read_and_time_travel(spark, tmp_path):
    register_deltalog_source(spark)
    loc = str(tmp_path / "s1")
    dt = DeltaLogTable(spark, loc)
    dt.overwrite(spark.range(10).selectExpr("id", "id * 2 AS v"))
    dt.append(spark.range(10, 13).selectExpr("id", "id * 2 AS v"))
    got = spark.read.format("deltalog").option("location", loc).load()
    assert _rows(got) == _rows(dt.read())
    v0 = (
        spark.read.format("deltalog")
        .option("location", loc).option("version", "0").load()
    )
    assert v0.count() == 10


def test_batch_read_partitioned_injects_typed_columns(spark, tmp_path):
    register_deltalog_source(spark)
    loc = str(tmp_path / "s2")
    dt = DeltaLogTable(spark, loc)
    dt.overwrite(
        spark.range(30).selectExpr("id", "CAST(id % 3 AS INT) AS p"),
        partition_by=["p"],
    )
    got = spark.read.format("deltalog").option("location", loc).load()
    assert dict(got.dtypes)["p"] == "int"
    assert _rows(got.select("id", "p")) == _rows(dt.read().select("id", "p"))


def test_stream_tails_commits_exactly(spark, tmp_path):
    register_deltalog_source(spark)
    loc = str(tmp_path / "s3")
    dt = DeltaLogTable(spark, loc)
    dt.overwrite(spark.range(5).selectExpr("id"))
    dt.append(spark.range(5, 9).selectExpr("id"))
    dt.write_checkpoint()  # metadata-only; must not disturb the stream
    dt.append(spark.range(9, 12).selectExpr("id"))

    out_dir = str(tmp_path / "out")
    q = (
        spark.readStream.format("deltalog").option("location", loc).load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir)
    assert _rows(got) == [(i,) for i in range(12)]

    # a later OPTIMIZE is a no-op for the stream; a new append arrives
    dt.optimize(target_files=1)
    dt.append(spark.range(12, 14).selectExpr("id"))
    q2 = (
        spark.readStream.format("deltalog").option("location", loc).load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    got2 = spark.read.parquet(out_dir)
    assert _rows(got2) == [(i,) for i in range(14)]  # no duplicates


def test_stream_refuses_non_append_commit(spark, tmp_path):
    import pytest

    register_deltalog_source(spark)
    loc = str(tmp_path / "s4")
    dt = DeltaLogTable(spark, loc)
    dt.overwrite(spark.range(5).selectExpr("id"))
    dt.overwrite(spark.range(3).selectExpr("id"))  # removes data

    q = (
        spark.readStream.format("deltalog").option("location", loc).load()
        .writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ck4"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="not an append"):
        q.awaitTermination(120)
        raise RuntimeError(q.exception() or "stream did not fail")


def test_batch_source_applies_deletion_vectors(spark, tmp_path):
    from emr_on_eks_hudi_iceberg_delta_spark.sources import (
        DeltaLogTable,
        register_deltalog_source,
    )

    loc = str(tmp_path / "dv_src")
    dt = DeltaLogTable(spark, loc)
    dt.overwrite(
        spark.range(100).selectExpr("id AS k", "id % 10 AS g")
        .repartition(4)
    )
    dt.delete("g = 3", mode="dv")
    register_deltalog_source(spark)
    got = (
        spark.read.format("deltalog").option("location", loc).load()
    )
    assert got.count() == 90
    assert got.filter("g = 3").count() == 0
    # parity with the table's own reader
    assert sorted(r["k"] for r in got.collect()) == sorted(
        r["k"] for r in dt.read().collect()
    )


def test_batch_source_serves_nulls_for_pre_evolution_files(spark, tmp_path):
    from emr_on_eks_hudi_iceberg_delta_spark.sources import (
        DeltaLogTable,
        register_deltalog_source,
    )

    loc = str(tmp_path / "evo_src")
    dt = DeltaLogTable(spark, loc)
    dt.overwrite(spark.createDataFrame([(1, "x")], "k int, s string"))
    dt.append(
        spark.createDataFrame([(2, "y", 5)], "k int, s string, n int"),
        merge_schema=True,
    )
    register_deltalog_source(spark)
    got = spark.read.format("deltalog").option("location", loc).load()
    rows = sorted((r["k"], r["s"], r["n"]) for r in got.collect())
    assert rows == [(1, "x", None), (2, "y", 5)]
