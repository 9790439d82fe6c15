"""MoR table semantics: cheap log appends, stale _ro vs merged _rt views,
compaction convergence — equivalence with the CoW upsert result."""

import tempfile

from pyspark.sql import functions as F

from emr_on_eks_hudi_iceberg_delta_spark.functions.scd2 import with_scd2_columns
from emr_on_eks_hudi_iceberg_delta_spark.operators.merge import upsert_by_key
from emr_on_eks_hudi_iceberg_delta_spark.sources.mor import MorTable
from emr_on_eks_hudi_iceberg_delta_spark.sources.parquet import load_table

SF_DIR = "/root/testdata/sf0.001"
T1, T2, T3 = "2024-01-01 00:00:00", "2024-02-01 00:00:00", "2024-03-01 00:00:00"
KEYS = ["c_custkey", "checksum"]


def _env(spark, as_of, mutate=None):
    cust = load_table(spark, SF_DIR, "customer")
    if mutate:
        cust = cust.withColumn(
            "c_mktsegment",
            F.when(F.col("c_custkey") % mutate == 0,
                   F.concat("c_mktsegment", F.lit(f"_m{mutate}")))
            .otherwise(F.col("c_mktsegment")),
        )
    return with_scd2_columns(cust, ["c_name", "c_mktsegment"], as_of=as_of)


def test_mor_views_and_compaction(spark):
    t0 = _env(spark, T1)
    b1 = _env(spark, T2, mutate=13)
    b2 = _env(spark, T3, mutate=7)

    mor = MorTable(spark, tempfile.mkdtemp(prefix="mor_"), KEYS, "ts")
    mor.bootstrap(t0)
    mor.append_log(b1)
    mor.append_log(b2)
    assert mor.log_depth() == 2

    # _ro is stale: still the bootstrap state
    assert mor.read_optimized().filter(F.col("valid_from") == F.lit(T1).cast("timestamp_ntz")).count() == t0.count()

    # _rt equals the CoW double upsert
    expected = upsert_by_key(upsert_by_key(t0, b1, KEYS, "ts"), b2, KEYS, "ts")
    rt = mor.read_realtime()
    assert rt.count() == expected.count()
    assert rt.join(expected, on=KEYS, how="left_anti").count() == 0
    assert expected.join(rt, on=KEYS, how="left_anti").count() == 0

    # after compaction _ro == _rt and logs are folded
    mor.compact()
    assert mor.log_depth() == 0
    ro = mor.read_optimized()
    assert ro.count() == expected.count()
    assert ro.join(expected, on=KEYS, how="left_anti").count() == 0


def test_mor_precombine_tie_latest_log_wins(spark):
    """ADVICE r1: with equal precombine values across base and log batches,
    the survivor used to be partition-order dependent. The _rt view now
    passes the log-batch index as writer sequence: latest batch wins."""
    mk = lambda v: spark.createDataFrame([(1, "k", "2024-01-01", v)], "id int, checksum string, ts string, v string")
    mor = MorTable(spark, tempfile.mkdtemp(prefix="mor_tie_"), ["id", "checksum"], "ts")
    mor.bootstrap(mk("base"))
    mor.append_log(mk("log1"))
    mor.append_log(mk("log2"))
    for _ in range(3):
        assert [r["v"] for r in mor.read_realtime().collect()] == ["log2"]
    assert "__writer_seq" not in mor.read_realtime().columns
