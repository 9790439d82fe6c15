"""Delta UniForm (sources/uniform.py): a continuously synced Iceberg
metadata mirror over the Delta table's own parquet files — zero-copy
(inode-pinned), incremental, idempotent, loud refusals."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emr_on_eks_hudi_iceberg_delta_spark.sources import uniform  # noqa: F401
from emr_on_eks_hudi_iceberg_delta_spark.sources import delta_dml  # noqa: F401
from emr_on_eks_hudi_iceberg_delta_spark.sources.delta_log import (
    DeltaLogTable,
)
from emr_on_eks_hudi_iceberg_delta_spark.sources.iceberg_layout import (
    IcebergTable,
)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _inodes(root):
    return {
        os.stat(os.path.join(r, f)).st_ino
        for r, _, fs in os.walk(root)
        for f in fs
        if f.endswith(".parquet")
        and "_delta_log" not in r
        and os.sep + "metadata" not in r
    }


def _table(spark, tmp_path, name="u"):
    dt = DeltaLogTable(spark, str(tmp_path / name))
    dt.overwrite(
        spark.range(100).selectExpr("id AS k", "id * 2 AS v")
        .repartition(4)
    )
    return dt


def test_enable_and_incremental_sync(spark, tmp_path):
    dt = _table(spark, tmp_path)
    inodes0 = _inodes(dt.location)
    dt.enable_uniform()
    ice = IcebergTable(spark, dt.location)
    assert _rows(ice.read()) == _rows(dt.read())
    assert _inodes(dt.location) == inodes0  # zero bytes copied
    # idempotent: already at head
    assert dt.sync_uniform() is None
    # append + sync: the mirror catches up, again zero-copy
    dt.append(spark.range(100, 120).selectExpr("id AS k", "id * 2 AS v"))
    assert dt.sync_uniform() is not None
    assert _rows(ice.read()) == _rows(dt.read())
    assert ice.read().count() == 120
    # CoW delete + sync
    dt.delete("k < 10")
    dt.sync_uniform()
    assert _rows(ice.read()) == _rows(dt.read())
    assert ice.read().count() == 110
    # the mirror's history time-travels across delta states
    snaps = [s["snapshot_id"] for s in ice.history()]
    assert len(snaps) >= 3
    assert ice.read(snaps[0]).count() == 100


def test_sync_is_metadata_only_and_carries_counts(spark, tmp_path):
    dt = _table(spark, tmp_path, "meta")
    dt.enable_uniform()
    ice = IcebergTable(spark, dt.location)
    n_data0 = len(_inodes(dt.location))
    dt.append(spark.range(100, 105).selectExpr("id AS k", "id * 2 AS v"))
    dt.sync_uniform()
    # data files: only the append's new ones; record counts correct
    assert len(_inodes(dt.location)) > n_data0
    ents = {
        e["data_file"]["file_path"]: e["data_file"]["record_count"]
        for e in ice._entries()
    }
    assert sum(ents.values()) == 105


def test_uniform_refusals(spark, tmp_path):
    # sync without enable refuses
    d2 = _table(spark, tmp_path, "noen")
    with pytest.raises(ValueError, match="not enabled"):
        d2.sync_uniform()
    # schema drift after enable SYNCS THROUGH (r11: field-id-safe
    # evolution — retained names keep ids, new columns mint fresh)
    d3 = _table(spark, tmp_path, "drift")
    d3.enable_uniform()
    ice3 = IcebergTable(spark, d3.location)
    ids_before = {
        f["name"]: f["id"]
        for f in ice3._metadata()["schema"]["fields"]
    }
    d3.overwrite(
        spark.range(5).selectExpr(
            "id AS k", "id * 2 AS v", "'x' AS extra"
        )
    )
    assert d3.sync_uniform() is not None
    got = _rows(ice3.read())
    assert got == _rows(d3.read())
    md3 = ice3._metadata()
    ids_after = {
        f["name"]: f["id"]
        for f in next(
            s
            for s in md3["schemas"]
            if s["schema-id"] == md3["current-schema-id"]
        )["fields"]
    }
    assert ids_after["k"] == ids_before["k"]  # retained id
    assert ids_after["v"] == ids_before["v"]
    assert ids_after["extra"] > max(ids_before.values())  # fresh id
    # append a column via mergeSchema: old files serve typed NULLs
    d3.append(
        spark.createDataFrame(
            [(100, 200, "y", 7.5)],
            "k long, v long, extra string, w double",
        ),
        merge_schema=True,
    )
    assert d3.sync_uniform() is not None
    rows = {r["k"]: r["w"] for r in ice3.read().collect()}
    assert rows[100] == 7.5
    assert all(v is None for k, v in rows.items() if k != 100)


def test_vacuum_maintains_the_mirror(spark, tmp_path):
    """r11: VACUUM on a UniForm table first syncs the mirror to the
    Delta head and expires older mirror snapshots METADATA-ONLY —
    Iceberg readers never chase vacuumed files, and the mirror never
    deletes data it does not own."""
    dt = _table(spark, tmp_path, "vac")
    dt.enable_uniform()
    ice = IcebergTable(spark, dt.location)
    dt.overwrite(
        spark.range(50).selectExpr("id AS k", "id * 3 AS v")
    )  # supersedes every v0 file
    # mirror is deliberately STALE (no sync since the overwrite)
    removed = dt.vacuum()
    assert removed  # the old files actually went
    # the mirror was synced + expired: its head serves the new state
    assert sorted(r["k"] for r in ice.read().collect()) == list(range(50))
    assert len(ice.history()) == 1  # older mirror snapshots expired
    # and the DELTA side is untouched and correct
    assert dt.read().count() == 50
    # dry-run never touches the mirror
    dt.append(spark.range(50, 60).selectExpr("id AS k", "id * 3 AS v"))
    before = len(ice.history())
    assert dt.vacuum(dry_run=True) == []
    assert len(ice.history()) == before


def test_uniform_partitioned_mirror(spark, tmp_path):
    """r12: a hive-partitioned Delta table mirrors — manifest entries
    carry TYPED identity partition values, reads serve the file-absent
    partition columns as manifest constants, and the mirror prunes on
    them like any identity-partitioned Iceberg table."""
    import json as _json

    from emr_on_eks_hudi_iceberg_delta_spark.sources.avro_io import read_ocf

    dp = DeltaLogTable(spark, str(tmp_path / "pmirror"))
    dp.overwrite(
        spark.range(30).selectExpr("id AS k", "CAST(id % 3 AS INT) AS g"),
        partition_by=["g"],
    )
    dp.enable_uniform()
    ice = IcebergTable(spark, dp.location)
    assert _rows(ice.read()) == _rows(dp.read())
    # typed values in the manifest + spec-507 summaries
    md = ice._metadata()
    assert md["properties"]["uniform.partition-constants"] == "true"
    snap = next(
        s for s in md["snapshots"]
        if s["snapshot-id"] == md["current-snapshot-id"]
    )
    _, mrows = read_ocf(snap["manifest-list"])
    summ = mrows[-1]["partitions"][0]
    assert summ["name"] == "g"
    assert _json.loads(summ["lower_bound"]) == 0
    assert _json.loads(summ["upper_bound"]) == 2
    entry = ice._entries()[0]
    assert isinstance(entry["data_file"]["partition"]["g"], int)
    # manifest-level pruning serves exact rows
    got = ice.read_where(lambda pv: pv["g"] == 1)
    assert sorted(r["k"] for r in got.collect()) == [
        i for i in range(30) if i % 3 == 1
    ]
    # incremental sync after an append keeps the mirror exact
    dp.append(
        spark.range(30, 36).selectExpr(
            "id AS k", "CAST(id % 3 AS INT) AS g"
        )
    )
    assert dp.sync_uniform() is not None
    assert _rows(ice.read()) == _rows(dp.read())


def test_uniform_column_mapped_mirror(spark, tmp_path):
    """r12: a column-mapped Delta table mirrors — files store PHYSICAL
    names; the mirror publishes schema.name-mapping.default and scans
    resolve through it; a rename stays metadata-only on both sides."""
    dm = DeltaLogTable(spark, str(tmp_path / "mmirror"))
    dm.overwrite(
        spark.range(12).selectExpr("id AS k", "id * 2 AS v")
    )
    dm.enable_column_mapping()
    dm.enable_uniform()
    ice = IcebergTable(spark, dm.location)
    assert _rows(ice.read()) == _rows(dm.read())
    import json as _json

    nm = ice._metadata()["properties"]["schema.name-mapping.default"]
    assert {m["names"][0] for m in _json.loads(nm)} == {"k", "v"}
    # rename: logical name changes, files untouched, mirror follows —
    # the mapping still points the new logical field at the OLD
    # physical name inside the files
    dm.rename_column("v", "val")
    assert dm.sync_uniform() is not None
    got = ice.read()
    assert got.columns == ["k", "val"]
    assert _rows(got) == _rows(dm.read())
    md = ice._metadata()
    nm2 = _json.loads(md["properties"]["schema.name-mapping.default"])
    val_id = next(
        f["id"] for f in md["schema"]["fields"] if f["name"] == "val"
    )
    assert next(
        m["names"][0] for m in nm2 if m["field-id"] == val_id
    ) == "v"


def test_uniform_partitioned_and_mapped_mirror(spark, tmp_path):
    """Both at once: physical-named partition dirs + name mapping."""
    db = DeltaLogTable(spark, str(tmp_path / "both"))
    db.overwrite(
        spark.range(20).selectExpr("id AS k", "CAST(id % 2 AS INT) AS g"),
        partition_by=["g"],
    )
    db.enable_column_mapping()
    db.enable_uniform()
    ice = IcebergTable(spark, db.location)
    assert _rows(ice.read()) == _rows(db.read())
    got = ice.read_where(lambda pv: pv["g"] == 0)
    assert sorted(r["k"] for r in got.collect()) == list(range(0, 20, 2))


def _dv_files(dt):
    d = os.path.join(dt.location, "metadata", "uniform-deletes")
    return sorted(os.listdir(d)) if os.path.isdir(d) else []


def test_uniform_mirrors_live_deletion_vectors(spark, tmp_path):
    """r12: live DVs translate into v2 position-delete files in the
    mirror — the Iceberg read equals the Delta read, byte for byte,
    and unchanged DV batches are re-referenced, not rewritten."""
    dt = _table(spark, tmp_path, "dvm")
    dt.enable_uniform()
    dt.delete("k % 2 = 0", mode="dv")
    assert dt.sync_uniform() is not None
    ice = IcebergTable(spark, dt.location)
    assert _rows(ice.read()) == _rows(dt.read())
    # the mirror's delete manifest references a REAL pos-delete parquet
    dels = ice._live_delete_files()
    assert dels and all(d["content"] == 1 for d in dels)
    import pyarrow.parquet as pq

    assert pq.read_schema(dels[0]["file_path"]).names == [
        "file_path",
        "pos",
    ]
    assert ice._metadata()["format-version"] == 2
    # unrelated append: the unchanged DV batch is REUSED (no new
    # delete file written), and the read stays exact
    before = _dv_files(dt)
    dt.append(spark.createDataFrame([(9999, 1)], "k long, v long"))
    assert dt.sync_uniform() is not None
    assert _dv_files(dt) == before
    assert _rows(ice.read()) == _rows(dt.read())
    # a second DV delete churns the batch: rewritten, still exact
    dt.delete("k % 3 = 0", mode="dv")
    assert dt.sync_uniform() is not None
    assert _rows(ice.read()) == _rows(dt.read())


def test_uniform_dv_purge_drops_delete_files_and_gc(spark, tmp_path):
    """PURGE (optimize) materializes the DVs away: the next sync's
    mirror snapshot carries no delete manifest, and once expiry
    retires the DV-era snapshots the translated files GC."""
    dt = _table(spark, tmp_path, "dvpurge")
    dt.enable_uniform()
    dt.delete("k % 2 = 0", mode="dv")
    dt.sync_uniform()
    assert _dv_files(dt)
    dt.optimize()  # PURGE: rewrites files, drops DVs
    assert dt.sync_uniform() is not None
    ice = IcebergTable(spark, dt.location)
    assert not ice._live_delete_files()
    assert _rows(ice.read()) == _rows(dt.read())
    # old mirror snapshots still reference the translated files —
    # expiry retires them, the next sync GCs the orphans
    ice.expire_snapshots(keep_last=1, delete_data=False)
    dt.append(spark.createDataFrame([(777, 1)], "k long, v long"))
    dt.sync_uniform()
    assert _dv_files(dt) == []


def test_uniform_dv_on_partitioned_and_mapped_tables(spark, tmp_path):
    """DVs compose with the r12 partitioned + column-mapped mirror
    shapes (the delete anti-join must run against the PHYSICAL scan
    before names map back)."""
    # hive-partitioned
    dp = DeltaLogTable(spark, str(tmp_path / "dvpart"))
    dp.overwrite(
        spark.range(40).selectExpr(
            "id AS k", "CAST(id % 4 AS INT) AS p"
        ),
        partition_by=["p"],
    )
    dp.enable_uniform()
    dp.delete("k % 5 = 0", mode="dv")
    dp.sync_uniform()
    icep = IcebergTable(spark, dp.location)
    assert _rows(icep.read()) == _rows(dp.read())
    pruned = icep.read_where(lambda pv: pv["p"] == 2)
    assert sorted(r["k"] for r in pruned.collect()) == [
        k for k in range(40) if k % 4 == 2 and k % 5 != 0
    ]
    # column-mapped
    dm = DeltaLogTable(spark, str(tmp_path / "dvmap"))
    dm.overwrite(spark.range(30).selectExpr("id AS k", "id * 2 AS v"))
    dm.enable_column_mapping()
    dm.rename_column("v", "val")  # physical names now diverge
    dm.enable_uniform()
    dm.delete("k % 3 = 1", mode="dv")
    dm.sync_uniform()
    icem = IcebergTable(spark, dm.location)
    assert _rows(icem.read()) == _rows(dm.read())


def test_vacuum_with_live_dvs_keeps_mirror_exact(spark, tmp_path):
    """r12: VACUUM no longer aborts on live DVs — the mirror syncs
    (translating the DVs) before files go."""
    dt = _table(spark, tmp_path, "dvvac")
    dt.enable_uniform()
    dt.overwrite(
        spark.range(10, 30).selectExpr("id AS k", "id AS v")
    )  # strand the first files
    dt.delete("k >= 25", mode="dv")
    removed = dt.vacuum()
    assert removed  # the stranded first-write files went
    ice = IcebergTable(spark, dt.location)
    assert _rows(ice.read()) == _rows(dt.read())
    assert ice.read().count() == 15


def test_incremental_sync_appends_carry_manifests(spark, tmp_path):
    """r12: an append-only Delta commit syncs as a mirror APPEND —
    prior manifest-list rows carried verbatim plus ONE manifest of
    exactly the added files (sync cost O(added), not O(live))."""
    from emr_on_eks_hudi_iceberg_delta_spark.sources.avro_io import (
        read_ocf,
    )

    dt = _table(spark, tmp_path, "incr")
    dt.enable_uniform()
    ice = IcebergTable(spark, dt.location)

    def mlist():
        md = ice._metadata()
        snap = next(
            s for s in md["snapshots"]
            if s["snapshot-id"] == md["current-snapshot-id"]
        )
        _, rows = read_ocf(snap["manifest-list"])
        return rows

    before = mlist()
    n_live0 = len(dt._replay()[0])
    dt.append(
        spark.createDataFrame([(500, 1), (501, 2)], "k long, v long")
    )
    n_added = len(dt._replay()[0]) - n_live0
    assert dt.sync_uniform() is not None
    after = mlist()
    # carried verbatim + exactly one new manifest of the added files
    assert [m["manifest_path"] for m in after[: len(before)]] == [
        m["manifest_path"] for m in before
    ]
    new = after[len(before):]
    assert len(new) == 1 and new[0]["added_data_files_count"] >= 1
    _, entries = read_ocf(new[0]["manifest_path"])
    assert len(entries) == n_added  # O(added), never the live set
    assert _rows(ice.read()) == _rows(dt.read())
    # a REMOVAL (CoW delete) falls back to full state — still exact
    dt.delete("k < 5")
    assert dt.sync_uniform() is not None
    assert _rows(ice.read()) == _rows(dt.read())
    # DV churn also falls back (delete set changes) — still exact
    dt.delete("k % 7 = 0", mode="dv")
    assert dt.sync_uniform() is not None
    assert _rows(ice.read()) == _rows(dt.read())
    # and a DV-stable append after that rides the fast path again
    b2 = mlist()
    dt.append(spark.createDataFrame([(600, 3)], "k long, v long"))
    assert dt.sync_uniform() is not None
    a2 = mlist()
    assert [m["manifest_path"] for m in a2[: len(b2)]] == [
        m["manifest_path"] for m in b2
    ]
    assert _rows(ice.read()) == _rows(dt.read())
