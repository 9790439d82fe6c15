"""Partition-scoped CoW upserts: only touched partitions rewrite, results
equal the full-table upsert, old versions stay readable."""

import tempfile

from pyspark.sql import functions as F

from emr_on_eks_hudi_iceberg_delta_spark.functions.scd2 import with_scd2_columns
from emr_on_eks_hudi_iceberg_delta_spark.operators.merge import upsert_by_key
from emr_on_eks_hudi_iceberg_delta_spark.sources.parquet import load_table
from emr_on_eks_hudi_iceberg_delta_spark.sources.partitioned import PartitionedTable

SF_DIR = "/root/testdata/sf0.001"
T1, T2 = "2024-01-01 00:00:00", "2024-02-01 00:00:00"


def _target(spark):
    cust = load_table(spark, SF_DIR, "customer")
    return with_scd2_columns(cust, ["c_name", "c_mktsegment"], as_of=T1)


def _updates(spark):
    # touch only nations 0-4: mutate segment for every key there
    cust = load_table(spark, SF_DIR, "customer").filter(F.col("c_nationkey") < 5)
    upd = cust.withColumn(
        "c_mktsegment", F.concat(F.col("c_mktsegment"), F.lit("_v2"))
    )
    return with_scd2_columns(upd, ["c_name", "c_mktsegment"], as_of=T2)


def test_partition_scoped_upsert_matches_full_upsert(spark):
    pt = PartitionedTable(
        spark, tempfile.mkdtemp(prefix="pt_"), partition_col="c_nationkey"
    )
    target = _target(spark)
    updates = _updates(spark)
    pt.overwrite(target)
    pt.upsert(updates, ["c_custkey", "checksum"], "ts")

    expected = upsert_by_key(target, updates, ["c_custkey", "checksum"], "ts")
    got = pt.read()
    key = ["c_custkey", "checksum"]
    assert got.count() == expected.count()
    assert got.join(expected, on=key, how="left_anti").count() == 0
    assert expected.join(got, on=key, how="left_anti").count() == 0

    # only the 5 touched partitions were rewritten by commit 1
    counts = dict(pt.touched_partition_counts())
    assert counts[1] == 5
    n_partitions = target.select("c_nationkey").distinct().count()
    assert counts[0] == n_partitions

    # time travel: version 0 is the untouched initial load
    assert pt.read(version=0).count() == target.count()
    assert pt.read(version=0).filter("iscurrent = 0").count() == 0

    # partition pruning: single-partition read only sees nation 3
    p3 = pt.read_partition(3)
    assert p3.filter("c_nationkey <> 3").count() == 0


def test_upsert_creates_new_partition(spark):
    pt = PartitionedTable(
        spark, tempfile.mkdtemp(prefix="pt_new_"), partition_col="c_nationkey"
    )
    target = _target(spark)
    pt.overwrite(target)
    newrows = _updates(spark).withColumn("c_nationkey", F.lit(99))
    pt.upsert(newrows, ["c_custkey", "checksum"], "ts")
    assert pt.read_partition(99).count() == newrows.count()
    assert pt.read().count() == target.count() + newrows.count()


def test_global_index_handles_partition_move(spark):
    """A key whose partition value changes: with global_index=True the old
    partition's row disappears and the key lives only in its new partition."""
    pt = PartitionedTable(
        spark, tempfile.mkdtemp(prefix="pt_gi_"), partition_col="c_nationkey"
    )
    target = _target(spark)
    pt.overwrite(target)
    pt.build_index(["c_custkey", "checksum"])

    # move every customer of nation 2 to nation 77 (same record key: the
    # checksum covers name+segment, untouched)
    movers = target.filter(F.col("c_nationkey") == 2)
    n_movers = movers.count()
    assert n_movers > 0
    moved = movers.withColumn("c_nationkey", F.lit(77)).withColumn(
        "ts", F.lit("2024-02-01 00:00:00").cast("timestamp_ntz")
    )
    pt.upsert(moved, ["c_custkey", "checksum"], "ts", global_index=True)

    assert pt.read_partition(77).count() == n_movers
    # the emptied partition is dropped from the manifest entirely
    assert "2" not in pt.history()[-1]["partitions"]
    assert pt.read().filter(F.col("c_nationkey") == 2).count() == 0
    assert pt.read().count() == target.count()
    # exactly one row per record key survives
    dup = (
        pt.read().groupBy("c_custkey", "checksum").count().filter("count > 1").count()
    )
    assert dup == 0


def test_partition_evolution_mixed_layout_reads(spark):
    """Iceberg-style partition evolution: after evolve_partition_spec,
    new commits land in the new layout while untouched old partitions
    stay in the old one; reads union both layouts transparently and the
    global index lazily migrates touched keys to the new spec."""
    pt = PartitionedTable(
        spark, tempfile.mkdtemp(prefix="pt_ev_"), partition_col="c_nationkey"
    )
    target = _target(spark)
    pt.overwrite(target)
    pt.build_index(["c_custkey", "checksum"])
    n0 = pt.read().count()

    pt.evolve_partition_spec("c_mktsegment")
    assert pt.partition_col == "c_mktsegment"
    # read before any new commit still serves the old layout
    assert pt.read().count() == n0

    updates = _updates(spark)
    pt.upsert(updates, ["c_custkey", "checksum"], "ts", global_index=True)

    expected = upsert_by_key(target, updates, ["c_custkey", "checksum"], "ts")
    got = pt.read()
    key = ["c_custkey", "checksum"]
    assert got.count() == expected.count()
    assert got.join(expected, on=key, how="left_anti").count() == 0
    assert expected.join(got, on=key, how="left_anti").count() == 0

    # manifest now mixes specs via composite "<spec>=<value>" keys:
    # rewritten partitions live under the new spec, untouched ones remain
    # under the old one — collision-free even with overlapping values
    live = pt.history()[-1]["partitions"]
    head = pt.history()[-1]["version"]
    assert any(
        v.startswith("c_mktsegment=") for v, cid in live.items() if cid == head
    )
    assert any(v.startswith("c_nationkey=") for v in live)

    # time travel across the evolution boundary still works
    assert pt.read(version=0).count() == n0


def _nation_with_two_segments(target):
    """(nationkey, segment) where the nation holds >= 2 distinct segments;
    the returned segment is the nation's most common one."""
    rows = (
        target.groupBy("c_nationkey", "c_mktsegment")
        .count()
        .orderBy(F.col("count").desc(), "c_nationkey", "c_mktsegment")
        .collect()
    )
    from collections import Counter

    nations = Counter(r["c_nationkey"] for r in rows)
    for r in rows:
        if nations[r["c_nationkey"]] >= 2:
            return r["c_nationkey"], r["c_mktsegment"]
    raise AssertionError("no nation with two segments in fixture")


def test_evolution_migration_preserves_colocated_rows(spark):
    """Upserting an EXISTING record key after evolve_partition_spec (the
    lazy-migration path): the key's whole old-spec partition rewrites under
    the new spec, including co-located rows whose new-spec value is absent
    from the update batch — those dirs must still land in the manifest, or
    they silently vanish from read()."""
    pt = PartitionedTable(
        spark, tempfile.mkdtemp(prefix="pt_mig_"), partition_col="c_nationkey"
    )
    target = _target(spark)
    pt.overwrite(target)
    pt.build_index(["c_custkey", "checksum"])
    n0 = pt.read().count()

    pt.evolve_partition_spec("c_mktsegment")
    # pick a nation with >= 2 segments and update only ONE segment's keys,
    # keeping name+segment (and so the record key) intact — an index match
    # that triggers migration of the whole nation partition, whose
    # other-segment rows are NOT in the batch
    nation, seg = _nation_with_two_segments(target)
    updates = (
        target.filter(
            (F.col("c_nationkey") == nation) & (F.col("c_mktsegment") == seg)
        )
        .withColumn("c_acctbal", F.col("c_acctbal") + 1000)
        .withColumn("ts", F.lit(T2).cast("timestamp_ntz"))
    )
    n_upd = updates.count()
    assert n_upd > 0
    other_segments = target.filter(
        (F.col("c_nationkey") == nation) & (F.col("c_mktsegment") != seg)
    ).count()
    assert other_segments > 0  # the co-located rows at risk
    pt.upsert(updates, ["c_custkey", "checksum"], "ts", global_index=True)

    got = pt.read()
    assert got.count() == n0  # no rows disappeared
    # the nation fully migrated: no old-spec dir remains for it
    assert f"c_nationkey={nation}" not in pt.history()[-1]["partitions"]
    assert got.filter(F.col("c_nationkey") == nation).count() == target.filter(
        F.col("c_nationkey") == nation
    ).count()
    # the update itself applied
    assert (
        got.filter(
            (F.col("c_nationkey") == nation) & (F.col("c_mktsegment") == seg)
        )
        .filter(F.col("ts") == F.lit(T2).cast("timestamp_ntz"))
        .count()
        == n_upd
    )


def test_evolution_migration_merges_existing_destination_partition(spark):
    """Migrated rows landing in a new-spec partition that ALREADY exists
    must read-merge it — otherwise pointing its manifest entry at the new
    commit orphans the rows the earlier commit wrote there."""
    pt = PartitionedTable(
        spark, tempfile.mkdtemp(prefix="pt_dest_"), partition_col="c_nationkey"
    )
    target = _target(spark)
    pt.overwrite(target)
    pt.build_index(["c_custkey", "checksum"])
    pt.evolve_partition_spec("c_mktsegment")

    nation, seg = _nation_with_two_segments(target)
    other_seg = (
        target.filter(
            (F.col("c_nationkey") == nation) & (F.col("c_mktsegment") != seg)
        )
        .select("c_mktsegment")
        .first()[0]
    )

    # commit 1: brand-new keys establish the new-spec partition for
    # other_seg — the nation's other_seg customers will migrate there later
    fresh = (
        target.filter(F.col("c_mktsegment") == other_seg)
        .limit(5)
        .withColumn("c_custkey", F.col("c_custkey") + 500000)
        .withColumn("ts", F.lit(T2).cast("timestamp_ntz"))
    )
    n_fresh = fresh.count()
    pt.upsert(fresh, ["c_custkey", "checksum"], "ts", global_index=True)
    n1 = pt.read().count()
    assert n1 == target.count() + n_fresh

    # commit 2: index-matched update of the nation's `seg` keys migrates the
    # whole nation — its other_seg rows land in the EXISTING new-spec dir
    updates = (
        target.filter(
            (F.col("c_nationkey") == nation) & (F.col("c_mktsegment") == seg)
        )
        .withColumn("c_acctbal", F.col("c_acctbal") + 1000)
        .withColumn("ts", F.lit(T2).cast("timestamp_ntz"))
    )
    pt.upsert(updates, ["c_custkey", "checksum"], "ts", global_index=True)

    got = pt.read()
    assert got.count() == n1  # commit-1 rows in the shared dir survived
    assert got.filter(F.col("c_custkey") >= 500000).count() == n_fresh
    dup = (
        got.groupBy("c_custkey", "checksum").count().filter("count > 1").count()
    )
    assert dup == 0


def test_null_partition_value_upsert_preserves_prior_rows(spark):
    """NULL partition values live in hive's __HIVE_DEFAULT_PARTITION__
    dir; manifest keys must use the same sentinel. Before the fix the key
    rendered as 'spec=None', never matched the dir name, and an upsert
    into the null partition skipped the read-merge — orphaning its prior
    rows."""
    pt = PartitionedTable(
        spark, tempfile.mkdtemp(prefix="pt_null_"), partition_col="grp"
    )
    base = spark.createDataFrame(
        [(1, None, 10), (2, None, 20), (3, "a", 30)],
        "id int, grp string, v int",
    )
    pt.overwrite(base)
    assert pt.read().count() == 3

    # upsert a new key into the NULL partition: rows 1 and 2 must survive
    upd = spark.createDataFrame([(4, None, 40)], "id int, grp string, v int")
    pt.upsert(upd, key_cols=["id"], precombine_col="v")
    got = {(r["id"], r["grp"], r["v"]) for r in pt.read().collect()}
    assert got == {(1, None, 10), (2, None, 20), (3, "a", 30), (4, None, 40)}

    # update an existing null-partition key: precombine replaces in place
    upd2 = spark.createDataFrame([(1, None, 99)], "id int, grp string, v int")
    pt.upsert(upd2, key_cols=["id"], precombine_col="v")
    got = {(r["id"], r["v"]) for r in pt.read().filter("grp IS NULL").collect()}
    assert got == {(1, 99), (2, 20), (4, 40)}

    # read_partition(None) addresses the null partition directly
    assert pt.read_partition(None).count() == 3

    # global index round-trips the sentinel: a key moving OUT of the null
    # partition has its old row expired there
    pt.build_index(["id"])
    mv = spark.createDataFrame([(2, "a", 21)], "id int, grp string, v int")
    pt.upsert(mv, key_cols=["id"], precombine_col="v", global_index=True)
    assert pt.read().filter("id = 2").count() == 1
    assert pt.read().filter("id = 2").collect()[0]["grp"] == "a"


def test_empty_partitions_state_reads_and_indexes(spark):
    """A manifest version whose partitions dict is empty (every partition
    dropped by prior upserts) must read back as ZERO rows with the table
    schema and must not crash index maintenance — reduce() over an empty
    scan list used to raise TypeError."""
    pt = PartitionedTable(
        spark, tempfile.mkdtemp(prefix="pt_empty_"), partition_col="grp"
    )
    pt.overwrite(
        spark.createDataFrame([(1, "a", 10)], "id int, grp string, v int")
    )
    # publish an empty-partition version (the state a key-draining upsert
    # leaves behind)
    pt._publish({}, commit_id=1)

    empty = pt.read()
    assert empty.count() == 0
    assert set(empty.columns) == {"id", "grp", "v"}

    # index write over the empty state succeeds and is readable
    pt.build_index(["id"])
    idx = pt._read_index(pt.history()[-1]["version"])
    assert idx is not None
    assert idx.count() == 0
    assert set(idx.columns) == {"id", "__part"}


def test_partitions_metadata_table(spark):
    """Iceberg .partitions analog: one metadata row per live partition
    with its owning commit and file stats; a partition-scoped upsert
    moves only the touched partition to the new commit."""
    import tempfile

    from pyspark.sql import functions as F

    from emr_on_eks_hudi_iceberg_delta_spark.sources.partitioned import (
        PartitionedTable,
    )

    pt = PartitionedTable(
        spark, tempfile.mkdtemp(prefix="pt_meta_"), partition_col="p"
    )
    pt.overwrite(
        spark.createDataFrame(
            [(1, "a", 1.0), (2, "b", 2.0)], "id long, p string, v double"
        )
    )
    pt.upsert(
        spark.createDataFrame([(1, "a", 9.0)], "id long, p string, v double"),
        key_cols=["id"],
        precombine_col="v",
    )
    rows = {r["partition"]: r for r in pt.partitions_df().collect()}
    assert set(rows) == {"p=a", "p=b"}
    assert rows["p=a"]["commit_id"] == 1  # rewritten by the upsert
    assert rows["p=b"]["commit_id"] == 0  # untouched
    assert all(r["n_files"] >= 1 and r["size_bytes"] > 0 for r in rows.values())


def test_dynamic_partition_overwrite_replaces_only_incoming(spark, tmp_path):
    from emr_on_eks_hudi_iceberg_delta_spark.sources.partitioned import (
        PartitionedTable,
    )

    pt = PartitionedTable(spark, str(tmp_path / "pt_dyn"), "p")
    pt.overwrite(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["k", "p", "v"]
        )
    )
    # batch covers only partition b, with entirely new content (no merge)
    pt.overwrite_partitions(
        spark.createDataFrame([(9, "b", 99)], ["k", "p", "v"])
    )
    rows = sorted((r["k"], r["p"], r["v"]) for r in pt.read().collect())
    assert rows == [(1, "a", 10), (3, "c", 30), (9, "b", 99)]
    # time travel still serves the pre-overwrite state
    old = sorted((r["k"], r["v"]) for r in pt.read(version=0).collect())
    assert old == [(1, 10), (2, 20), (3, 30)]


def test_dynamic_partition_overwrite_null_partition(spark, tmp_path):
    from emr_on_eks_hudi_iceberg_delta_spark.sources.partitioned import (
        PartitionedTable,
    )

    pt = PartitionedTable(spark, str(tmp_path / "pt_dyn_null"), "p")
    pt.overwrite(
        spark.createDataFrame(
            [(1, "a", 1), (2, None, 2)], "k int, p string, v int"
        )
    )
    pt.overwrite_partitions(
        spark.createDataFrame([(5, None, 50)], "k int, p string, v int")
    )
    rows = sorted(
        ((r["k"], r["p"], r["v"]) for r in pt.read().collect()),
        key=lambda t: t[0],
    )
    assert rows == [(1, "a", 1), (5, None, 50)]


def test_read_partitions_where_prunes_by_value(spark, tmp_path):
    import pytest

    from emr_on_eks_hudi_iceberg_delta_spark.sources.partitioned import (
        PartitionedTable,
    )

    pt = PartitionedTable(spark, str(tmp_path / "pt_prune"), "day")
    pt.overwrite(
        spark.createDataFrame(
            [(1, "2024-01-05", 1), (2, "2024-01-10", 2), (3, "2024-01-20", 3)],
            ["k", "day", "v"],
        )
    )
    got = sorted(
        r["k"]
        for r in pt.read_partitions_where(lambda d: d >= "2024-01-10").collect()
    )
    assert got == [2, 3]
    # the pruned partition's files never enter the plan
    plan = (
        pt.read_partitions_where(lambda d: d >= "2024-01-10")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "2024-01-05" not in plan
    assert pt.read_partitions_where(lambda d: d > "2025").count() == 0
    # mixed-layout refusal after spec evolution
    pt.evolve_partition_spec("k")
    pt.upsert(
        spark.createDataFrame([(9, "2024-01-05", 9)], ["k", "day", "v"]),
        ["k"],
        "v",
    )
    with pytest.raises(ValueError, match="other specs"):
        pt.read_partitions_where(lambda d: True)


def test_read_partitions_where_empty_table_raises_filenotfound(spark, tmp_path):
    import pytest

    from emr_on_eks_hudi_iceberg_delta_spark.sources.partitioned import (
        PartitionedTable,
    )

    pt = PartitionedTable(spark, str(tmp_path / "pt_empty_rpw"), "p")
    with pytest.raises(FileNotFoundError):
        pt.read_partitions_where(lambda v: True)


def test_partitioned_history_df_counts_touched(spark, tmp_path):
    from emr_on_eks_hudi_iceberg_delta_spark.sources.partitioned import (
        PartitionedTable,
    )

    pt = PartitionedTable(spark, str(tmp_path / "pt_hist"), "p")
    pt.overwrite(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], ["k", "p"]
        )
    )
    pt.overwrite_partitions(spark.createDataFrame([(9, "b")], ["k", "p"]))
    h = {r["version"]: r for r in pt.history_df().collect()}
    assert h[0]["n_partitions"] == 3 and h[0]["n_touched"] == 3
    assert h[1]["n_partitions"] == 3 and h[1]["n_touched"] == 1
