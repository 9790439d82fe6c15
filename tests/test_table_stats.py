"""File-level min/max statistics, data-skipping reads, Z-order clustering —
the Delta stats / OPTIMIZE ZORDER analog on VersionedTable."""

import tempfile

from pyspark.sql import functions as F

from emr_on_eks_hudi_iceberg_delta_spark.sources.parquet import load_table
from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import VersionedTable

SF_DIR = "/root/testdata/sf0.001"


def _orders_table(spark, n_files=8, **compact_kw):
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_stats_"))
    vt.overwrite(load_table(spark, SF_DIR, "orders").repartition(n_files))
    vt.compact(target_partitions=n_files, **compact_kw)
    return vt


def test_stats_recorded_per_file(spark):
    vt = _orders_table(spark, cluster_by=["o_orderkey"])
    vt.compute_stats(["o_orderkey", "o_orderdate"])
    snap = vt.history()[-1]
    files = vt.files()
    assert set(snap["stats"].keys()) == {f["path"] for f in files}
    # clustered on o_orderkey -> file ranges are disjoint and ordered
    ranges = sorted(
        tuple(s["o_orderkey"]) for s in snap["stats"].values()
    )
    for (lo1, hi1), (lo2, _) in zip(ranges, ranges[1:]):
        assert lo1 <= hi1 < lo2


def test_pruned_read_correct_and_skips_files(spark):
    vt = _orders_table(spark, cluster_by=["o_orderkey"]).compute_stats(["o_orderkey"])
    filters = [("o_orderkey", "<=", 600)]
    pruned = vt.pruned_files(filters)
    assert 0 < len(pruned) < len(vt.files())  # skipping actually happened
    got = vt.read_pruned(filters)
    want = vt.read().filter(F.col("o_orderkey") <= 600)
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_prune_timestamp_survives_json_roundtrip(spark):
    vt = _orders_table(spark, cluster_by=["o_orderdate"]).compute_stats(["o_orderdate"])
    import datetime

    cut = datetime.datetime(1997, 1, 1)  # inside this table's 1995-2001 range
    filters = [("o_orderdate", "<", cut)]
    assert 0 < len(vt.pruned_files(filters)) < len(vt.files())
    got = vt.read_pruned(filters)
    want = vt.read().filter(F.col("o_orderdate") < F.lit(cut))
    assert got.count() == want.count()


def test_zorder_prunes_on_both_dimensions(spark):
    """Lexicographic clustering on (custkey) gives col-2 predicates nothing
    to skip; the Z-curve layout lets min/max stats prune on EITHER column."""
    stat_cols = ["o_custkey", "o_orderkey"]
    linear = _orders_table(spark, n_files=16, cluster_by=["o_custkey"]).compute_stats(
        stat_cols
    )
    zorder = _orders_table(spark, n_files=16, zorder_by=stat_cols).compute_stats(
        stat_cols
    )
    n = len(zorder.files())
    # narrow predicate on each dimension (~1/8 of the value range:
    # o_custkey spans 0-149, o_orderkey 0-1499 in this table)
    f_ck = [("o_custkey", "<=", 18)]
    f_ok = [("o_orderkey", "<=", 187)]
    # first dimension: both layouts skip
    assert len(linear.pruned_files(f_ck)) < n
    assert len(zorder.pruned_files(f_ck)) < n
    # second dimension: only the Z-order layout skips
    assert len(linear.pruned_files(f_ok)) == n
    assert len(zorder.pruned_files(f_ok)) < n
    # and results stay exact either way
    got = zorder.read_pruned(f_ok)
    want = zorder.read().filter(F.col("o_orderkey") <= 187)
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_unstatted_column_never_prunes(spark):
    vt = _orders_table(spark, cluster_by=["o_orderkey"]).compute_stats(["o_orderkey"])
    # no stats for o_custkey -> every file kept, residual filter still exact
    assert len(vt.pruned_files([("o_custkey", "<=", 5)])) == len(vt.files())
    got = vt.read_pruned([("o_custkey", "<=", 5)])
    want = vt.read().filter(F.col("o_custkey") <= 5)
    assert got.count() == want.count()


def test_lake_lifecycle_end_to_end(spark):
    """The full maintenance loop a production table lives through:
    bulk load -> keyed upsert -> Z-order OPTIMIZE -> stats -> pruned read
    -> schema evolution -> vacuum. Every step commits a snapshot; reads
    stay exact throughout."""
    from emr_on_eks_hudi_iceberg_delta_spark.functions.scd2 import with_scd2_columns

    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_life_"))
    cust = load_table(spark, SF_DIR, "customer")
    t0 = with_scd2_columns(cust, ["c_name", "c_mktsegment"], as_of="2024-01-01 00:00:00")
    vt.overwrite(t0.repartition(8))
    n0 = vt.read().count()

    # upsert a mutated batch (every 10th key changes segment)
    upd = with_scd2_columns(
        cust.withColumn(
            "c_mktsegment",
            F.when(F.col("c_custkey") % 10 == 0, F.lit("MUTATED")).otherwise(
                F.col("c_mktsegment")
            ),
        ),
        ["c_name", "c_mktsegment"],
        as_of="2024-02-01 00:00:00",
    )
    vt.upsert(upd, ["c_custkey", "checksum"], "ts")
    n_mutated = cust.filter(F.col("c_custkey") % 10 == 0).count()
    n1 = vt.read().count()
    # (key, checksum) record key: a mutated row is a NEW pair, the old
    # version stays (Hudi record-key semantics) — growth = mutated keys
    assert n1 == n0 + n_mutated

    vt.compact(target_partitions=8, zorder_by=["c_custkey", "c_nationkey"])
    assert vt.read().count() == n1
    vt.compute_stats(["c_custkey", "c_nationkey"])
    pruned = vt.read_pruned([("c_custkey", "<=", 20)])
    want = vt.read().filter(F.col("c_custkey") <= 20)
    assert pruned.count() == want.count()
    assert len(vt.pruned_files([("c_custkey", "<=", 20)])) < len(vt.files())

    vt.add_column("tier", "string", default="std")
    assert vt.read().filter(F.col("tier") == "std").count() == n1

    versions_before = len(vt.history())
    vt.vacuum(keep_last=1)
    assert len(vt.history()) == 1
    assert vt.read().count() == n1  # current snapshot intact after vacuum
    # load, upsert, compact, add_column commit; compute_stats only
    # annotates the current snapshot's metadata
    assert versions_before == 4


def test_bloom_equality_skipping(spark):
    """Point lookup on a NON-clustered column: min/max stats cannot prune
    (every file spans the full key range) but the per-file bloom can; the
    residual filter keeps results exact either way."""
    vt = _orders_table(spark, n_files=8, cluster_by=["o_custkey"])
    vt.compute_stats(["o_orderkey"]).compute_bloom(["o_orderkey"])
    target = 777
    # stats alone: o_orderkey spans ~the full range in every custkey-
    # clustered file -> no pruning from min/max
    stats_only = [
        p
        for p in (f["path"] for f in vt.files())
        if vt._file_may_match(
            vt.history()[-1]["stats"][p]["o_orderkey"], "=", target
        )
    ]
    assert len(stats_only) == len(vt.files())
    # bloom: all but the true file (plus rare false positives) prune
    pruned = vt.pruned_files([("o_orderkey", "=", target)])
    assert len(pruned) < len(vt.files())
    got = vt.read_pruned([("o_orderkey", "=", target)])
    want = vt.read().filter(F.col("o_orderkey") == target)
    assert got.count() == want.count() == 1
    assert got.collect()[0]["o_orderkey"] == target
    # a value that exists nowhere prunes everything (no false "hit" path)
    assert vt.read_pruned([("o_orderkey", "=", 10**9)]).count() == 0
