"""Symlink-format manifest (S13/S14 — delta/delta_scd_script.py:42-60):
manifest generation, the auto-regen table property, WAP/staged isolation,
and the merge-on-read incompatibility guards."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import VersionedTable


def _vt(spark, df):
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_symlink_t_"))
    vt.overwrite(df)
    return vt


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_manifest_reconstructs_table(spark):
    vt = _vt(spark, spark.range(100).withColumn("v", F.col("id") * 2))
    path = vt.generate_symlink_manifest()
    assert os.path.exists(path)
    with open(path) as f:
        lines = [line.strip() for line in f if line.strip()]
    assert lines and all(line.startswith("file:") for line in lines)
    assert {line.removeprefix("file:") for line in lines} == {
        e["path"] for e in vt.files()
    }
    assert _rows(vt.read_symlink_manifest()) == _rows(vt.read())


def test_autogen_refreshes_on_commit_but_not_on_stage(spark):
    vt = _vt(spark, spark.range(10).withColumn("v", F.lit(1)))
    vt.enable_symlink_manifest()
    before = _rows(vt.read_symlink_manifest())
    # a staged (unpublished) snapshot must NOT reach the external engine
    staged = vt.stage(spark.range(5).withColumn("v", F.lit(99)))
    assert _rows(vt.read_symlink_manifest()) == before
    # publishing moves the published head, so autogen must follow it —
    # ADVICE r4: an external engine would otherwise silently keep serving
    # the pre-publish state
    vt.publish(staged)
    assert _rows(vt.read_symlink_manifest()) == _rows(vt.read())
    # a regular commit regenerates automatically
    vt.overwrite(spark.range(3).withColumn("v", F.lit(7)))
    assert _rows(vt.read_symlink_manifest()) == _rows(vt.read())


def test_mor_deletes_refused_while_enabled(spark):
    vt = _vt(spark, spark.range(20).withColumn("v", F.col("id")))
    vt.enable_symlink_manifest()
    with pytest.raises(ValueError, match="symlink manifest"):
        vt.delete_where_deferred("id < 5", ["id"])
    with pytest.raises(ValueError, match="symlink manifest"):
        vt.delete_where_positional("id < 5")
    # CoW delete is fine and keeps the manifest current
    vt.delete_where("id < 5")
    assert _rows(vt.read_symlink_manifest()) == _rows(vt.read())
    assert vt.read_symlink_manifest().count() == 15


def test_generate_refused_with_pending_tombstones(spark):
    vt = _vt(spark, spark.range(20).withColumn("v", F.col("id")))
    vt.delete_where_deferred("id < 5", ["id"])
    with pytest.raises(ValueError, match="compact"):
        vt.generate_symlink_manifest()
    # compaction materializes the deletes; manifest becomes expressible
    vt.compact()
    vt.generate_symlink_manifest()
    assert vt.read_symlink_manifest().count() == 15
    assert _rows(vt.read_symlink_manifest()) == _rows(vt.read())


def test_partitioned_manifest_roundtrip_and_refresh(spark):
    from emr_on_eks_hudi_iceberg_delta_spark.sources.partitioned import (
        PartitionedTable,
    )

    pt = PartitionedTable(
        spark, tempfile.mkdtemp(prefix="pt_symlink_t_"), partition_col="p"
    )
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, None, 30.0), (4, "a", 40.0)],
        "id long, p string, v double",
    )
    pt.overwrite(df)
    mroot = pt.generate_symlink_manifest()
    # one manifest dir per live partition, null under the hive sentinel
    assert sorted(os.listdir(mroot)) == [
        "p=__HIVE_DEFAULT_PARTITION__", "p=a", "p=b",
    ]
    assert _rows(pt.read_symlink_manifest()) == _rows(pt.read())
    # partition-scoped upsert: regeneration reflects the touched partition
    pt.upsert(
        spark.createDataFrame([(1, "a", 99.0)], "id long, p string, v double"),
        key_cols=["id"],
        precombine_col="v",
    )
    pt.generate_symlink_manifest()
    got = _rows(pt.read_symlink_manifest())
    assert got == _rows(pt.read())
    # partition col is reconstructed from the dir name, appended last
    assert (1, 99.0, "a") in got


def test_partitioned_manifest_all_empty_returns_empty_with_schema(spark):
    """ADVICE r4 (low): when every partition manifest lists zero files,
    read_symlink_manifest must mirror read()'s empty-state contract —
    zero rows with the table schema — not a bare reduce() TypeError."""
    from emr_on_eks_hudi_iceberg_delta_spark.sources.partitioned import (
        PartitionedTable,
    )

    pt = PartitionedTable(
        spark, tempfile.mkdtemp(prefix="pt_symlink_e_"), partition_col="p"
    )
    pt.overwrite(
        spark.createDataFrame([(1, "a", 10.0)], "id long, p string, v double")
    )
    mroot = pt.generate_symlink_manifest()
    # externally truncate every manifest (the all-partitions-dropped state)
    for d in os.listdir(mroot):
        with open(os.path.join(mroot, d, "manifest"), "w"):
            pass
    out = pt.read_symlink_manifest()
    assert out.count() == 0
    assert set(out.columns) >= {"id", "v"}


def test_partitioned_manifest_drops_stale_partition_dirs(spark):
    from emr_on_eks_hudi_iceberg_delta_spark.sources.partitioned import (
        PartitionedTable,
    )

    pt = PartitionedTable(
        spark, tempfile.mkdtemp(prefix="pt_symlink_d_"), partition_col="p"
    )
    pt.overwrite(
        spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)], "id long, p string, v double")
    )
    mroot = pt.generate_symlink_manifest()
    assert sorted(os.listdir(mroot)) == ["p=a", "p=b"]
    # overwrite shrinks the table to one partition; stale dir must go
    pt.overwrite(spark.createDataFrame([(9, "a", 9.0)], "id long, p string, v double"))
    pt.generate_symlink_manifest()
    assert sorted(os.listdir(mroot)) == ["p=a"]
    assert _rows(pt.read_symlink_manifest()) == [(9, 9.0, "a")]
