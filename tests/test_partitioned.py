

def test_drop_partitions_where_retention(spark, tmp_path):
    """Time-based partition retention: dropped partitions vanish from
    the head but time travel still serves them; untouched partitions
    keep their files (metadata-only drop)."""
    from pyspark.sql import functions as F

    from emr_on_eks_hudi_iceberg_delta_spark.sources.partitioned import (
        PartitionedTable,
    )

    pt = PartitionedTable(spark, str(tmp_path / "ret"), "day")
    df = spark.range(40).select(
        "id",
        F.concat(
            F.lit("2024-01-"),
            F.lpad((F.col("id") % 4 + 1).cast("string"), 2, "0"),
        ).alias("day"),
    )
    pt.overwrite(df)
    v0 = pt.read().count()
    dropped = pt.drop_partitions_where(lambda d: d <= "2024-01-02")
    assert dropped == ["day=2024-01-01", "day=2024-01-02"]
    head = pt.read()
    assert head.count() == v0 // 2
    assert head.filter(F.col("day") <= "2024-01-02").count() == 0
    # time travel still serves the dropped days
    assert pt.read(version=0).count() == v0
    # no-op drop returns empty and publishes nothing
    n_versions = len(pt.history())
    assert pt.drop_partitions_where(lambda d: d == "1999-01-01") == []
    assert len(pt.history()) == n_versions


def test_vacuum_reclaims_unreferenced_commits(spark, tmp_path):
    """Version retention: old manifest versions expire and commit dirs
    no kept version references are deleted, while commit dirs a kept
    version still points at survive (shared-commit discipline)."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from emr_on_eks_hudi_iceberg_delta_spark.sources.partitioned import (
        PartitionedTable,
    )

    pt = PartitionedTable(spark, str(tmp_path / "vacp"), "day")
    mk = lambda lo, hi, day: spark.range(lo, hi).select(
        "id", F.lit(day).alias("day")
    )
    pt.overwrite(mk(0, 10, "d1"))                       # v0, commit 0
    pt.overwrite_partitions(mk(10, 15, "d2"))           # v1, commit 1
    pt.overwrite_partitions(mk(20, 30, "d1"))           # v2, commit 2 (d1 rewritten)
    head_before = sorted(r["id"] for r in pt.read().collect())

    deleted = pt.vacuum(keep_last=1)
    # commit 0's d1 is superseded (only v0/v1 referenced it) BUT commit 0
    # may still carry nothing referenced -> deleted; commit 1 (d2) is
    # still referenced by the head -> kept
    assert any("commit-0" in d for d in deleted)
    assert not any("commit-1" in d for d in deleted)
    assert sorted(r["id"] for r in pt.read().collect()) == head_before
    assert len(pt.history()) == 1
    with pytest.raises(ValueError):
        pt.read(version=0)  # expired
    files_root = os.path.join(pt.location, "files")
    assert "commit-0" not in os.listdir(files_root)
    with pytest.raises(ValueError):
        pt.vacuum(keep_last=0)


def test_stream_upsert_partitioned_idempotent_replay(spark, tmp_path):
    """A replayed batch merges to the same state (keyed upsert) — the
    exactly-once property the streaming sink claims; only touched days
    gain commits."""
    from pyspark.sql import functions as F

    from emr_on_eks_hudi_iceberg_delta_spark.sources.partitioned import (
        PartitionedTable,
    )

    pt = PartitionedTable(spark, str(tmp_path / "ps"), "day")
    pt.overwrite(
        spark.createDataFrame([], "event_id long, v double, day string")
    )
    batch = spark.range(10).select(
        F.col("id").alias("event_id"),
        F.col("id").cast("double").alias("v"),
        F.when(F.col("id") < 5, "d1").otherwise("d2").alias("day"),
    )
    pt.upsert(batch, key_cols=["event_id"], precombine_col="v")
    once = sorted(r["event_id"] for r in pt.read().collect())
    pt.upsert(batch, key_cols=["event_id"], precombine_col="v")  # replay
    twice = sorted(r["event_id"] for r in pt.read().collect())
    assert once == twice == list(range(10))
