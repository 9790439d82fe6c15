"""Catalog + writer-lock invariants (round 4 Glue/DynamoDB analogs)."""

import pytest
from pyspark.sql import functions as F

from emr_on_eks_hudi_iceberg_delta_spark.sources.catalog import LakeCatalog
from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import (
    ConcurrentCommitError,
    VersionedTable,
)


def test_catalog_create_sql_and_drop(spark, tmp_path):
    cat = LakeCatalog(spark, str(tmp_path / "cat"))
    cat.create_table(
        "cat_orders",
        spark.createDataFrame([(1, "O"), (2, "F")], "k long, status string"),
    )
    assert cat.list_tables() == ["cat_orders"]
    # resolvable by name through spark.sql immediately after create
    assert spark.sql("SELECT COUNT(*) AS n FROM cat_orders").first()["n"] == 2
    # commits through the catalog handle keep the view fresh
    cat.table("cat_orders").append(
        spark.createDataFrame([(3, "O")], "k long, status string")
    )
    assert spark.sql("SELECT COUNT(*) AS n FROM cat_orders").first()["n"] == 3
    with pytest.raises(ValueError, match="already exists"):
        cat.create_table("cat_orders")
    # drop without purge keeps the data; re-registering as external works
    loc = cat.table("cat_orders").location
    cat.drop_table("cat_orders")
    assert cat.list_tables() == []
    cat.create_table("cat_orders2", location=loc)
    cat.sync()
    assert spark.sql("SELECT COUNT(*) AS n FROM cat_orders2").first()["n"] == 3


def test_writer_lock_excludes_and_expires(spark, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "lk"))
    vt.overwrite(spark.createDataFrame([(1,)], "id long"))
    with vt.locked():
        other = VersionedTable(spark, vt.location)
        with pytest.raises(ConcurrentCommitError, match="writer lock"):
            with other.locked(timeout=0.3, poll=0.05):
                pass
    # released: acquirable again
    with vt.locked(timeout=1.0):
        pass
    # stale-lease break: a crashed holder's old lockfile is reclaimed
    import os
    import time

    path = os.path.join(vt.location, "_writer.lock")
    with open(path, "w") as f:
        f.write("dead")
    old = time.time() - 120
    os.utime(path, (old, old))
    with vt.locked(timeout=5.0, stale_after=60):  # breaks the stale lock
        pass
