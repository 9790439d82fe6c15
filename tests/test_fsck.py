"""Table integrity verification (sources/fsck.py) — every claim the
metadata makes about the data plane is proved or reported, on clean
AND deliberately tampered tables.
"""

import os

from pyspark.sql import functions as F

from emr_on_eks_hudi_iceberg_delta_spark.sources import (
    DeltaLogTable,
    IcebergTable,
)


def test_delta_fsck_clean_table(spark, tmp_path):
    dt = DeltaLogTable(spark, str(tmp_path / "clean"))
    dt.overwrite(
        spark.range(100).selectExpr("id AS k", "id % 5 AS g")
        .repartition(3)
    )
    dt.delete("g = 0", mode="dv")
    dt.update("g = 1", {"k": "k + 1000"})
    dt.write_checkpoint()
    rep = dt.fsck()
    assert rep["ok"], rep["errors"]
    assert rep["files_checked"] >= 3


def test_delta_fsck_reports_every_defect(spark, tmp_path):
    dt = DeltaLogTable(spark, str(tmp_path / "tamper"))
    dt.overwrite(spark.range(100).selectExpr("id AS k").repartition(3))
    dt.delete("k < 10", mode="dv")
    live, _, _ = dt._replay()
    paths = sorted(live)
    # defect 1: size drift on one live file
    with open(os.path.join(str(tmp_path / "tamper"), paths[0]), "ab") as f:
        f.write(b"junk")
    # defect 2: a missing live file
    os.remove(os.path.join(str(tmp_path / "tamper"), paths[1]))
    # defect 3: corrupt EVERY DV payload (the one attached to the
    # missing file is skipped by fsck, so corrupting only the first
    # listed one would be flaky)
    for dvf in os.listdir(str(tmp_path / "tamper")):
        if not dvf.startswith("deletion_vector_"):
            continue
        with open(
            os.path.join(str(tmp_path / "tamper"), dvf), "r+b"
        ) as f:
            f.seek(8)
            f.write(b"\xff")
    rep = dt.fsck()
    assert not rep["ok"]
    msgs = "\n".join(rep["errors"])
    assert "size" in msgs
    assert "missing" in msgs
    assert "DV" in msgs


def test_iceberg_fsck_clean_and_tampered(spark, tmp_path):
    t = IcebergTable(spark, str(tmp_path / "ice"))
    t.overwrite(
        spark.range(50).selectExpr("id AS k").repartition(2)
    )
    t.delete("k = 5")
    rep = t.fsck()
    assert rep["ok"], rep["errors"]
    assert rep["files_checked"] == 3  # 2 data + 1 delete file
    gone = [e["data_file"]["file_path"] for e in t._entries()][0]
    os.remove(gone)
    rep2 = t.fsck()
    assert not rep2["ok"]
    assert any("missing" in e for e in rep2["errors"])


def test_iceberg_fsck_catches_record_count_drift(spark, tmp_path):
    t = IcebergTable(spark, str(tmp_path / "drift"))
    t.overwrite(spark.range(10).selectExpr("id AS k").coalesce(1))
    # overwrite the data file in place with fewer rows than the
    # manifest records
    path = [e["data_file"]["file_path"] for e in t._entries()][0]
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table({"k": pa.array([1, 2], pa.int64())}), path)
    rep = t.fsck()
    assert not rep["ok"]
    assert any("record_count" in e for e in rep["errors"])


def test_hudi_fsck_clean_and_tampered(spark, tmp_path):
    from emr_on_eks_hudi_iceberg_delta_spark.sources import (
        HudiCowTable,
        HudiMorTable,
    )
    from emr_on_eks_hudi_iceberg_delta_spark.sources import (  # noqa: F401
        hudi_maintenance,
    )

    rows = [(i, f"v{i}", 1) for i in range(40)]
    t = HudiCowTable(
        spark, str(tmp_path / "hfsck"), "k", "seq", n_file_groups=3
    )
    t.bulk_insert(spark.createDataFrame(rows, "k bigint, v string, seq bigint"))
    sp = t.savepoint()
    t.cluster(2)
    rep = t.fsck()
    assert rep["ok"], rep["errors"]
    assert rep["files_checked"] == 2  # the two clustered bases
    # tamper 1: truncate a live base -> size + footer errors
    live = sorted(t._file_slices().values())
    victim = os.path.join(str(tmp_path / "hfsck"), live[0])
    with open(victim, "wb") as f:
        f.write(b"xx")
    rep2 = t.fsck()
    assert not rep2["ok"]
    assert any("size" in e for e in rep2["errors"])
    assert any("footer" in e for e in rep2["errors"])
    # tamper 2: delete a savepoint-pinned file -> restore target broken
    pinned = t._savepoint_meta(sp)["preservedFiles"]
    os.remove(os.path.join(str(tmp_path / "hfsck"), pinned[0]))
    rep3 = t.fsck()
    assert any("restore target is broken" in e for e in rep3["errors"])
    # MoR: log slices are checked too
    m = HudiMorTable(
        spark, str(tmp_path / "hfsck2"), "k", "seq", n_file_groups=2
    )
    m.bulk_insert(spark.createDataFrame(rows, "k bigint, v string, seq bigint"))
    m.upsert(spark.createDataFrame([(1, "log", 2)], "k bigint, v string, seq bigint"))
    repm = m.fsck()
    assert repm["ok"], repm["errors"]
    assert repm["files_checked"] == 3  # 2 bases + 1 log
    logs = [
        p for s in m._mor_slices().values() for p in s["logs"]
    ]
    os.remove(os.path.join(str(tmp_path / "hfsck2"), logs[0]))
    assert any(
        "missing on disk" in e for e in m.fsck()["errors"]
    )
