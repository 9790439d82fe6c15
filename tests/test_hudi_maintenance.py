"""Hudi savepoint/restore and clustering (sources/hudi_maintenance.py):
timeline rollback to pinned instants, cleaner protection, and
replacecommit re-bucketing with time travel across it."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emr_on_eks_hudi_iceberg_delta_spark.sources.hudi_layout import (
    HudiCowTable,
    HudiMorTable,
)
from emr_on_eks_hudi_iceberg_delta_spark.sources import hudi_maintenance  # noqa: F401


def _rows(df, cols=("k", "v", "seq")):
    return sorted(map(tuple, df.select(*cols).collect()))


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k bigint, v string, seq bigint")


@pytest.fixture()
def base(spark):
    return _mk(spark, [(i, f"v{i}", 1) for i in range(20)])


def test_savepoint_restore_cow(spark, tmp_path, base):
    t = HudiCowTable(spark, str(tmp_path / "h1"), "k", "seq")
    i0 = t.bulk_insert(base)
    sp = t.savepoint()
    assert sp == i0 and t.savepoints() == [i0]
    t.upsert(_mk(spark, [(3, "CHANGED", 2), (100, "new", 2)]))
    t.upsert(_mk(spark, [(4, "ALSO", 3)]))
    assert t.read().count() == 21
    t.restore(i0)
    got = t.read()
    assert _rows(got) == _rows(_mk(spark, [(i, f"v{i}", 1) for i in range(20)]))
    assert t.instants() == [i0]
    # restore is itself usable state: new writes work
    t.upsert(_mk(spark, [(5, "post", 9)]))
    assert t.read().filter("v = 'post'").count() == 1


def test_restore_requires_savepoint(spark, tmp_path, base):
    t = HudiCowTable(spark, str(tmp_path / "h2"), "k", "seq")
    i0 = t.bulk_insert(base)
    t.upsert(_mk(spark, [(1, "x", 2)]))
    with pytest.raises(ValueError, match="no savepoint"):
        t.restore(i0)


def test_savepoint_protects_from_cleaner(spark, tmp_path, base):
    t = HudiCowTable(spark, str(tmp_path / "h3"), "k", "seq")
    i0 = t.bulk_insert(base)
    t.savepoint(i0)
    t.upsert(_mk(spark, [(1, "a", 2)]))
    t.upsert(_mk(spark, [(1, "b", 3)]))
    deleted = t.clean(retain_slices=1)
    # the savepointed instant's files survived the cleaner
    for rel in t._savepoint_meta(i0)["preservedFiles"]:
        assert os.path.exists(os.path.join(str(tmp_path / "h3"), rel)), rel
        assert rel not in deleted
    # and restore STILL works after cleaning
    t.restore(i0)
    assert t.read().count() == 20


def test_cluster_rebuckets_cow(spark, tmp_path):
    rows = [(i, f"v{i}", 1) for i in range(200)]
    t = HudiCowTable(
        spark, str(tmp_path / "h4"), "k", "seq", n_file_groups=4
    )
    i0 = t.bulk_insert(_mk(spark, rows))
    before = _rows(t.read())
    ci = t.cluster(2, sort_by=["k"])
    # data identical, file-group count changed, old groups retired
    assert _rows(t.read()) == before
    live = t._file_slices()
    assert {fid for (_p, fid) in live} == {"fg-0", "fg-1"}
    assert all(str(ci) in p for p in live.values())
    # time travel BEFORE the clustering sees the old 4-group layout
    old = t._file_slices(i0)
    assert {fid for (_p, fid) in old} == {f"fg-{i}" for i in range(4)}
    assert _rows(t.read(i0)) == before
    # upserts route by the NEW group count and stay exact
    t.upsert(_mk(spark, [(7, "CHANGED", 5), (1000, "new", 5)]))
    got = t.read()
    assert got.count() == 201
    assert got.filter("k = 7").select("v").first()["v"] == "CHANGED"
    # reopening from disk picks up the new group count
    t2 = HudiCowTable(spark, str(tmp_path / "h4"))
    assert t2.n_file_groups == 2
    assert t2.read().count() == 201
    # sort clustering: each clustered base is sorted by key
    import pyarrow.parquet as pq

    for (_p, _fid), rel in t._file_slices(ci).items():
        ks = pq.read_table(
            os.path.join(str(tmp_path / "h4"), rel), columns=["k"]
        )["k"].to_pylist()
        assert ks == sorted(ks)


def test_cluster_mor_requires_compaction(spark, tmp_path, base):
    t = HudiMorTable(
        spark, str(tmp_path / "h5"), "k", "seq", n_file_groups=4
    )
    t.bulk_insert(base)
    t.upsert(_mk(spark, [(1, "log", 2)]))
    with pytest.raises(ValueError, match="compact"):
        t.cluster(2)
    t.compact()
    before = _rows(t.read())
    t.cluster(2)
    assert _rows(t.read()) == before
    assert {fid for (_p, fid) in t._mor_slices()} == {"fg-0", "fg-1"}
    # post-cluster MoR upsert logs against the new groups and merges
    t.upsert(_mk(spark, [(2, "after", 9)]))
    assert t.read().filter("k = 2").select("v").first()["v"] == "after"


def test_timeline_and_file_slices_dataframes(spark, tmp_path, base):
    t = HudiMorTable(spark, str(tmp_path / "h7"), "k", "seq")
    t.bulk_insert(base)
    t.upsert(_mk(spark, [(1, "log", 2)]))
    t.savepoint()
    tl = {(r["action"], r["operation"]) for r in t.timeline_df().collect()}
    assert ("deltacommit", "BULK_INSERT") in tl
    assert ("deltacommit", "UPSERT") in tl
    assert any(a == "savepoint" for a, _o in tl)
    fs = t.file_slices_df().collect()
    assert len(fs) == 4  # n_file_groups
    assert sum(len(r["log_paths"]) for r in fs) == 1
    assert all(r["base_path"] for r in fs)


def test_cleaner_drops_retired_groups_after_cluster(spark, tmp_path, base):
    t = HudiCowTable(
        spark, str(tmp_path / "h6"), "k", "seq", n_file_groups=4
    )
    t.bulk_insert(base)
    old_files = set(t._file_slices().values())
    t.cluster(2)
    deleted = set(t.clean(retain_slices=1))
    assert old_files <= deleted  # retired groups are cleanable
    assert t.read().count() == 20  # current state untouched


def test_cluster_crash_before_properties_self_heals(spark, tmp_path):
    """r11: the routing count rides the atomic replacecommit; a crash
    between that commit and the hoodie.properties rewrite leaves a
    stale count that table OPEN reconciles from the timeline — a
    later upsert must not route an existing key into a second file
    group (the duplication the r10 advisor described)."""
    import os

    from emr_on_eks_hudi_iceberg_delta_spark.sources.hudi_layout import (
        HudiCowTable,
    )

    loc = str(tmp_path / "clcrash")
    t = HudiCowTable(
        spark, loc, record_key="k", precombine_field="ver",
        n_file_groups=4,
    )
    t.bulk_insert(
        spark.range(100).selectExpr(
            "id AS k", "id % 5 AS g", "CAST(1 AS LONG) AS ver"
        )
    )
    t.cluster(2)
    # simulate the crash: properties regress to the PRE-cluster count
    props = os.path.join(loc, ".hoodie", "hoodie.properties")
    txt = open(props).read().replace(
        "n.file.groups=2", "n.file.groups=4"
    )
    open(props, "w").write(txt)
    # a FRESH handle self-heals from the replacecommit
    t2 = HudiCowTable(spark, loc)
    assert t2.n_file_groups == 2
    assert "n.file.groups=2" in open(props).read()  # repaired on disk
    # and the upsert of an existing key does not duplicate it
    t2.upsert(
        spark.createDataFrame([(7, 0, 2)], "k long, g long, ver long")
    )
    got = t2.read().filter("k = 7").collect()
    assert len(got) == 1 and got[0]["ver"] == 2
    assert t2.read().count() == 100
