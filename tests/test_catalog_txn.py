"""CatalogTransaction (sources/catalog.py): all-or-nothing visibility
across tables via the atomic pin swap — commit, rollback, the
mid-commit-crash window (raw heads may move; pinned reads must not),
and idempotent commit retry."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emr_on_eks_hudi_iceberg_delta_spark.sources.catalog import (
    CatalogTransaction,
    LakeCatalog,
)


def _setup(spark, tmp_path):
    cat = LakeCatalog(spark, str(tmp_path / "cat"))
    cat.create_table(
        "detail", spark.range(10).select("id", F.lit("v1").alias("tag"))
    )
    cat.create_table("summary", spark.createDataFrame([(10,)], "n bigint"))
    return cat


def _consistent(spark, cat):
    n_detail = cat.read_pinned("detail").count()
    n_claimed = cat.read_pinned("summary").collect()[0]["n"]
    return n_detail == n_claimed


def test_commit_is_atomic_and_consistent(spark, tmp_path):
    cat = _setup(spark, tmp_path)
    assert _consistent(spark, cat)
    with cat.transaction() as txn:
        txn.write("detail", spark.range(25).select("id", F.lit("v2").alias("tag")))
        txn.write("summary", spark.createDataFrame([(25,)], "n bigint"))
    assert _consistent(spark, cat)
    assert cat.read_pinned("detail").count() == 25
    # raw heads advanced too
    assert cat.table("detail").read().count() == 25


def test_rollback_leaves_old_state(spark, tmp_path):
    cat = _setup(spark, tmp_path)
    try:
        with cat.transaction() as txn:
            txn.write("detail", spark.range(99).select("id", F.lit("x").alias("tag")))
            raise RuntimeError("abort")
    except RuntimeError:
        pass
    assert cat.read_pinned("detail").count() == 10
    assert cat.table("detail").read().count() == 10  # stage never published
    # the staged snapshot is gone, not lingering
    assert all(
        not s.get("staged") for s in cat.table("detail")._snapshots()
    )


def test_mid_commit_crash_keeps_pinned_view_consistent(spark, tmp_path):
    cat = _setup(spark, tmp_path)
    txn = cat.transaction()
    txn.write("detail", spark.range(40).select("id", F.lit("v3").alias("tag")))
    txn.write("summary", spark.createDataFrame([(40,)], "n bigint"))

    # simulate a crash after the FIRST publish: publish 'detail' by hand,
    # then die before the pin swap
    vt = cat.table("detail")
    vt.publish(txn._staged["detail"])
    # raw head of detail already moved (the Delta multi-table gap)...
    assert cat.table("detail").read().count() == 40
    # ...but the PINNED multi-table view is still the OLD consistent pair
    assert cat.read_pinned("detail").count() == 10
    assert _consistent(spark, cat)

    # recovery: re-running commit is idempotent (skips the published
    # table, publishes the rest, swaps pins once)
    txn.commit()
    assert _consistent(spark, cat)
    assert cat.read_pinned("detail").count() == 40
    assert cat.read_pinned("summary").collect()[0]["n"] == 40


def test_double_commit_rejected_and_rewrite_replaces_stage(spark, tmp_path):
    cat = _setup(spark, tmp_path)
    txn = cat.transaction()
    v1 = txn.write("detail", spark.range(5).select("id", F.lit("a").alias("tag")))
    v2 = txn.write("detail", spark.range(6).select("id", F.lit("b").alias("tag")))
    _ = v1  # the dropped stage frees its version id (may be reused)
    # the replaced stage was dropped
    staged = [s["version"] for s in cat.table("detail")._snapshots() if s.get("staged")]
    assert staged == [v2]
    txn.commit()
    assert cat.read_pinned("detail").count() == 6
    with pytest.raises(RuntimeError):
        txn.commit()
    with pytest.raises(RuntimeError):
        txn.write("summary", spark.createDataFrame([(6,)], "n bigint"))


def test_pinned_sync_serves_consistent_sql_view(spark, tmp_path):
    cat = _setup(spark, tmp_path)
    txn = cat.transaction()
    txn.write("detail", spark.range(77).select("id", F.lit("z").alias("tag")))
    txn.write("summary", spark.createDataFrame([(77,)], "n bigint"))
    # half-committed: one table published, pins not yet swapped
    cat.table("detail").publish(txn._staged["detail"])
    cat.sync(pinned=True)
    n = spark.sql("SELECT COUNT(*) AS c FROM detail").collect()[0]["c"]
    claim = spark.sql("SELECT n FROM summary").collect()[0]["n"]
    assert n == claim == 10  # the old consistent pair, not the torn one
    txn.commit()
    cat.sync(pinned=True)
    assert spark.sql("SELECT COUNT(*) AS c FROM detail").collect()[0]["c"] == 77


def test_catalog_doc_mutations_are_lock_serialized(spark, tmp_path):
    """ADVICE r6 (medium): concurrent catalog-doc writers must not lose
    each other's updates. 8 threads each register a distinct table; all
    8 registrations must land (the unlocked read-modify-write lost some
    under this exact schedule)."""
    import threading

    from emr_on_eks_hudi_iceberg_delta_spark.sources.catalog import (
        LakeCatalog,
    )

    cat = LakeCatalog(spark, str(tmp_path / "cat_race"))
    errs = []

    def make(i):
        try:
            cat.create_table(f"t{i}")
        except Exception as e:  # pragma: no cover - diagnostic
            errs.append(e)

    threads = [threading.Thread(target=make, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert cat.list_tables() == [f"t{i}" for i in range(8)]


def test_abandoned_baseline_pins_expire(spark, tmp_path):
    """ADVICE r6 (low): a transaction that dies after write() leaves a
    tagged baseline pin; expire_abandoned_pins removes it (pinned reads
    resume tracking the head) while committed pins are never expired."""
    from emr_on_eks_hudi_iceberg_delta_spark.sources.catalog import (
        LakeCatalog,
    )

    cat = LakeCatalog(spark, str(tmp_path / "cat_expire"))
    cat.create_table("t", spark.range(3).select("id"))

    # abandoned transaction: write() then the process "dies" (no
    # commit/rollback)
    txn = cat.transaction()
    txn.write("t", spark.range(5).select("id"))
    assert cat._doc()["pins"] == {"t": 0}
    assert cat._doc()["pin_baselines"]["t"]["txn"] == txn._txn_id

    # head advances non-transactionally; pinned read is frozen at v0
    cat.table("t").overwrite(spark.range(7).select("id"))
    assert cat.read_pinned("t").count() == 3

    # too young to expire; then old enough
    assert cat.expire_abandoned_pins(max_age_seconds=3600) == []
    assert cat.expire_abandoned_pins(max_age_seconds=0.0) == ["t"]
    assert cat.read_pinned("t").count() == 7
    assert "t" not in cat._doc().get("pin_baselines", {})

    # committed pins carry no baseline tag and never expire
    with cat.transaction() as txn2:
        txn2.write("t", spark.range(4).select("id"))
    assert cat.expire_abandoned_pins(max_age_seconds=0.0) == []
    assert cat.read_pinned("t").count() == 4


def test_rollback_unpin_is_tag_checked(spark, tmp_path):
    """rollback removes ONLY its own baseline pin: if an expiry (or a
    later transaction's commit) already replaced it, rollback must not
    clobber the newer pin."""
    from emr_on_eks_hudi_iceberg_delta_spark.sources.catalog import (
        LakeCatalog,
    )

    cat = LakeCatalog(spark, str(tmp_path / "cat_tagchk"))
    cat.create_table("t", spark.range(3).select("id"))

    txn = cat.transaction()
    txn.write("t", spark.range(5).select("id"))          # baseline pin @ v0
    # a second transaction commits meanwhile: pin moves to its snapshot
    # and the baseline tag is popped
    with cat.transaction() as txn2:
        txn2.write("t", spark.range(9).select("id"))
    committed_pin = cat._doc()["pins"]["t"]

    txn.rollback()
    assert cat._doc()["pins"]["t"] == committed_pin  # untouched
    assert cat.read_pinned("t").count() == 9
