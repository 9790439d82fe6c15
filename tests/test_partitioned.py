

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
