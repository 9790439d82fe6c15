"""Change Data Feed + optimistic concurrency on the Delta-protocol
table (sources/delta_cdf.py; the put-if-absent _commit in
sources/delta_log.py).

Reference parity: the reference's Delta runtime exposes
readChangeFeed/table_changes over the SCD2 target table and relies on
a coordinating log store for multi-writer safety (the DynamoDB OCC its
Hudi job wires, hudi/hudi_scd_script.py:42-48); these tests pin the
log-native equivalents.
"""

import threading

import pytest
from pyspark.sql import functions as F

from emr_on_eks_hudi_iceberg_delta_spark.sources import DeltaLogTable
from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import (
    ConcurrentCommitError,
)


def _cdf_table(spark, tmp_path, name="c"):
    dt = DeltaLogTable(spark, str(tmp_path / name))
    dt.overwrite(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
            "k int, name string, v double",
        )
    )
    dt.set_table_properties({"delta.enableChangeDataFeed": "true"})
    return dt


def test_cdf_records_all_dml_change_types(spark, tmp_path):
    dt = _cdf_table(spark, tmp_path)
    dt.append(
        spark.createDataFrame([(4, "d", 40.0)], "k int, name string, v double")
    )  # v2: derived insert
    dt.delete("k = 2")  # v3: cdc delete
    dt.update("k = 3", {"v": "v * 10"})  # v4: cdc pre/post
    dt.merge_into(
        spark.createDataFrame(
            [(1, "A", 100.0), (9, "i", 9.0)], "k int, name string, v double"
        ),
        ["k"],
        when_matched_update={"name": "s.name"},
    )  # v5: cdc update pre/post + insert
    got = sorted(
        (r["_commit_version"], r["_change_type"], r["k"])
        for r in dt.table_changes(2, 5).collect()
    )
    assert got == [
        (2, "insert", 4),
        (3, "delete", 2),
        (4, "update_preimage", 3),
        (4, "update_postimage", 3),
        (5, "insert", 9),
        (5, "update_preimage", 1),
        (5, "update_postimage", 1),
    ] or got == sorted(
        [
            (2, "insert", 4),
            (3, "delete", 2),
            (4, "update_postimage", 3),
            (4, "update_preimage", 3),
            (5, "insert", 9),
            (5, "update_postimage", 1),
            (5, "update_preimage", 1),
        ]
    )
    post = dt.table_changes(4, 4).filter(
        "_change_type = 'update_postimage'"
    ).first()
    assert post["v"] == 300.0  # postimage carries the NEW value
    pre = dt.table_changes(4, 4).filter(
        "_change_type = 'update_preimage'"
    ).first()
    assert pre["v"] == 30.0  # preimage carries the OLD value


def test_cdf_dv_delete_and_derived_initial_insert(spark, tmp_path):
    dt = _cdf_table(spark, tmp_path)
    dt.delete("k = 1", mode="dv")
    ch = dt.table_changes(2, 2).collect()
    assert len(ch) == 1 and ch[0]["_change_type"] == "delete"
    # version 0 (pre-CDF) is add-only: derived inserts still work
    ch0 = dt.table_changes(0, 0)
    assert ch0.count() == 3
    assert {r["_change_type"] for r in ch0.collect()} == {"insert"}


def test_cdc_files_survive_vacuum_derived_ranges_refuse(spark, tmp_path):
    dt = _cdf_table(spark, tmp_path)
    dt.append(
        spark.createDataFrame([(4, "d", 4.0)], "k int, name string, v double")
    )  # v2 derived
    dt.delete("k = 2")  # v3 cdc
    dt.optimize(target_files=1)
    dt.vacuum()
    assert dt.table_changes(3, 3).count() == 1  # cdc-backed survives
    with pytest.raises(ValueError, match="VACUUM"):
        dt.table_changes(2, 2).count()  # derived range is gone, loudly


def test_cdf_without_cdc_on_rewrite_commit_refuses(spark, tmp_path):
    # a DML rewrite committed BEFORE CDF was enabled has add+remove
    # and no cdc actions — asking for its changes must refuse
    dt = DeltaLogTable(spark, str(tmp_path / "nocdf"))
    dt.overwrite(spark.createDataFrame([(1, 1.0)], "k int, v double"))
    dt.delete("k = 1")  # v1: rewrite without cdc (CDF off)
    dt.set_table_properties({"delta.enableChangeDataFeed": "true"})
    with pytest.raises(ValueError, match="predates"):
        dt.table_changes(1, 1).count()


def test_set_table_properties_is_a_commit(spark, tmp_path):
    dt = _cdf_table(spark, tmp_path)
    _, meta, v = dt._replay()
    assert meta["configuration"]["delta.enableChangeDataFeed"] == "true"
    assert v == 1
    assert dt.history()[1]["operation"] == "SET TBLPROPERTIES"


# --------------------- optimistic concurrency -----------------------


def test_commit_is_put_if_absent(spark, tmp_path):
    dt = DeltaLogTable(spark, str(tmp_path / "occ"))
    dt.overwrite(spark.range(3).selectExpr("id AS k"))
    with pytest.raises(ConcurrentCommitError, match="another writer"):
        dt._commit(0, [{"commitInfo": {"operation": "CLOBBER"}}])
    # the original commit is untouched
    assert dt.read().count() == 3


def test_concurrent_appends_rebase_and_all_land(spark, tmp_path):
    loc = str(tmp_path / "race")
    DeltaLogTable(spark, loc).overwrite(
        spark.range(1).selectExpr("id AS k")
    )
    errors = []

    def worker(base):
        try:
            h = DeltaLogTable(spark, loc)
            for j in range(2):
                h.append(
                    spark.createDataFrame(
                        [(base + j,)], "k bigint"
                    )
                )
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [
        threading.Thread(target=worker, args=(100 * (i + 1),))
        for i in range(4)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    # all 8 appended rows landed despite the version races
    assert DeltaLogTable(spark, loc).read().count() == 9
    # versions are a contiguous chain (no clobbered commits)
    vs = DeltaLogTable(spark, loc)._versions()
    assert vs == list(range(len(vs)))


# ------------------------ CHECK constraints -------------------------


def test_check_constraints_gate_every_write_path(spark, tmp_path):
    dt = DeltaLogTable(spark, str(tmp_path / "chk"))
    dt.overwrite(
        spark.createDataFrame([(1, 10.0), (2, 20.0)], "k int, v double")
    )
    dt.add_check_constraint("v_positive", "v > 0")
    _, meta, _ = dt._replay()
    assert (
        meta["configuration"]["delta.constraints.v_positive"] == "v > 0"
    )
    with pytest.raises(ValueError, match="v_positive"):
        dt.append(spark.createDataFrame([(3, -1.0)], "k int, v double"))
    # NULL passes — SQL CHECK semantics
    dt.append(spark.createDataFrame([(3, None)], "k int, v double"))
    with pytest.raises(ValueError, match="v_positive"):
        dt.update("k = 1", {"v": "-5.0"})
    with pytest.raises(ValueError, match="v_positive"):
        dt.merge_into(
            spark.createDataFrame([(9, -9.0)], "k int, v double"), ["k"]
        )
    with pytest.raises(ValueError, match="existing rows"):
        dt.add_check_constraint("k_small", "k < 2")
    dt.drop_check_constraint("v_positive")
    dt.append(spark.createDataFrame([(4, -2.0)], "k int, v double"))
    assert dt.read().count() == 4
    with pytest.raises(ValueError, match="no such constraint"):
        dt.drop_check_constraint("v_positive")


def test_describe_detail_and_history(spark, tmp_path):
    dt = DeltaLogTable(spark, str(tmp_path / "detail"))
    dt.overwrite(spark.range(50).selectExpr("id AS k").repartition(2))
    dt.set_table_properties({"delta.enableChangeDataFeed": "true"})
    dt.delete("k < 5", mode="dv")
    d = dt.describe_detail().first()
    assert d["format"] == "delta"
    assert d["num_files"] == 2 and d["version"] == 2
    assert d["min_reader_version"] == 3  # DV feature upgraded it
    assert "enableChangeDataFeed" in d["properties"]
    assert d["size_in_bytes"] > 0
    h = dt.describe_history().orderBy("version").collect()
    assert [r["operation"] for r in h] == [
        "WRITE", "SET TBLPROPERTIES", "DELETE",
    ]
