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


def test_positional_deletion_vectors(spark):
    """Positional (file, row-index) deletion vectors: batches chain, rows
    already deleted never re-match, time travel sees pre-delete states,
    and compaction materializes + clears the vectors. Works with NO
    record key (the point vs delete_where_deferred)."""
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import VersionedTable

    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_pdv_"))
    vt.overwrite(spark.range(100).toDF("id").repartition(4))

    vt.delete_where_positional("id % 2 = 0")
    assert vt.read().count() == 50
    # no data file was rewritten: metadata-only commit shares the dir
    h = vt.history()
    assert h[-1]["dir"] == h[-2]["dir"]
    assert len(h[-1]["dv"]) == 1

    # second batch chains; overlap with batch 1 is a no-op, not a dup
    vt.delete_where_positional("id < 20")
    assert vt.read().count() == 40  # odd ids in [21, 99]
    assert vt.read().agg(F.min("id")).collect()[0][0] == 21
    assert len(vt.history()[-1]["dv"]) == 2

    # time travel: each version reflects its own DV debt
    assert vt.read(version=0).count() == 100
    assert vt.read(version=1).count() == 50

    # DV debt triggers auto_compact; the rewrite materializes the deletes
    assert vt.auto_compact(max_files=10_000, max_tombstone_batches=1) is True
    head = vt.history()[-1]
    assert "dv" not in head and vt.read().count() == 40

    # SQL NULL semantics: predicate-NULL rows are KEPT
    vt2 = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_pdv2_"))
    vt2.overwrite(
        spark.range(10).toDF("id").withColumn(
            "v", F.when(F.col("id") < 5, F.col("id"))
        )
    )
    vt2.delete_where_positional("v > 2")  # only v=3,4 are TRUE
    assert vt2.read().count() == 8

    # read_pruned applies DVs too (stats computed on the published head)
    vt.compute_stats(["id"])
    assert vt.read_pruned([("id", ">=", 0)]).count() == 40
