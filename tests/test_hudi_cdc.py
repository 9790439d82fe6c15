"""Hudi CDC (sources/hudi_cdc.py): before/after-image change records
derived from the timeline — CoW rewrites, MoR tombstones and
resurrection, maintenance-instant skipping, and range slicing."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emr_on_eks_hudi_iceberg_delta_spark.sources import hudi_cdc  # noqa: F401
from emr_on_eks_hudi_iceberg_delta_spark.sources import hudi_maintenance  # noqa: F401
from emr_on_eks_hudi_iceberg_delta_spark.sources.hudi_layout import (
    HudiCowTable,
    HudiMorTable,
)


def _base(spark, n=40):
    return spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 8).alias("g"),
        (F.col("id") * 1.0).alias("v"),
    )


def _ev(df):
    return sorted(
        map(
            tuple,
            df.select("k", "v", "_change_type").collect(),
        )
    )


def test_cow_cdc_insert_update_delete(spark, tmp_path):
    t = HudiCowTable(
        spark, str(tmp_path / "ccdc"),
        record_key="k", precombine_field="v",
    )
    i1 = t.bulk_insert(_base(spark))
    upd = _base(spark).filter("k % 10 = 3").withColumn(
        "v", F.col("v") + 100.0
    )
    new = spark.createDataFrame([(1000, 0, 1.0)], "k long, g long, v double")
    i2 = t.upsert(upd.unionByName(new))
    i3 = t.delete("k % 10 = 7")
    got = _ev(t.cdc_scan(i1))
    want = sorted(
        [(k, float(k), "update_before") for k in range(3, 40, 10)]
        + [(k, k + 100.0, "update_after") for k in range(3, 40, 10)]
        + [(1000, 1.0, "insert")]
        + [(k, float(k), "delete") for k in range(7, 40, 10)]
    )
    assert got == want
    # commit attribution + range slicing
    ev = t.cdc_scan(i1)
    by_commit = {
        r["_commit_instant"]
        for r in ev.select("_commit_instant").distinct().collect()
    }
    assert by_commit == {i2, i3}
    assert t.cdc_scan(i2).filter("_change_type != 'delete'").count() == 0
    assert t.cdc_scan(i1, end_instant=i2).filter(
        "_change_type = 'delete'"
    ).count() == 0
    assert t.cdc_scan(i3).count() == 0


def test_cow_cdc_initial_commit_is_inserts(spark, tmp_path):
    t = HudiCowTable(
        spark, str(tmp_path / "cinit"),
        record_key="k", precombine_field="v",
    )
    t.bulk_insert(_base(spark, 10))
    got = t.cdc_scan("")  # everything
    assert got.count() == 10
    assert (
        got.select("_change_type").distinct().collect()[0][0]
        == "insert"
    )


def test_mor_cdc_tombstone_and_resurrect(spark, tmp_path):
    t = HudiMorTable(
        spark, str(tmp_path / "mcdc"),
        record_key="k", precombine_field="v",
    )
    i1 = t.bulk_insert(_base(spark, 30))
    i2 = t.delete("k = 5")  # log tombstone, no base rewrite
    got = _ev(t.cdc_scan(i1, end_instant=i2))
    assert got == [(5, 5.0, "delete")]
    # resurrect the key (latest writer wins): CDC shows an insert
    t.upsert(
        spark.createDataFrame([(5, 5, 99.0)], "k long, g long, v double")
    )
    got2 = _ev(t.cdc_scan(i2))
    assert got2 == [(5, 99.0, "insert")]


def test_cdc_skips_maintenance_instants(spark, tmp_path):
    t = HudiCowTable(
        spark, str(tmp_path / "maint"),
        record_key="k", precombine_field="v",
    )
    i1 = t.bulk_insert(_base(spark, 20))
    t.cluster(2)  # replacecommit: no logical change
    assert t.cdc_scan(i1).count() == 0
    m = HudiMorTable(
        spark, str(tmp_path / "maintm"),
        record_key="k", precombine_field="v",
    )
    m.bulk_insert(_base(spark, 20))
    j1 = m.upsert(
        spark.createDataFrame([(3, 3, 50.0)], "k long, g long, v double")
    )
    m.compact()  # folds logs: no logical change
    assert m.cdc_scan(j1).count() == 0


def test_cow_cdc_reads_only_touched_groups(spark, tmp_path):
    """Scale pin: the per-commit diff reads only the file groups that
    commit touched — untouched groups' files never enter the plan."""
    t = HudiCowTable(
        spark, str(tmp_path / "scope"),
        record_key="k", precombine_field="v", n_file_groups=8,
    )
    i1 = t.bulk_insert(_base(spark, 400))
    one = spark.createDataFrame([(7, 7, 777.0)], "k long, g long, v double")
    t.upsert(one)
    ev = t.cdc_scan(i1)
    assert _ev(ev) == [(7, 7.0, "update_before"), (7, 777.0, "update_after")]
    files = {os.path.basename(f) for f in ev.inputFiles()}
    all_files = {
        os.path.basename(p)
        for p in t._file_slices().values()
    } | {
        os.path.basename(p)
        for p in t._file_slices(i1).values()
    }
    # the plan touches a strict subset of the table's slice files
    assert files < all_files
    assert len(files) <= 4  # old+new slice of ONE group (+name variants)


# ---------------------- persisted supplemental CDC (r12) ----------------------


def _cdc_table(spark, path, cls=HudiCowTable, **kw):
    t = cls(
        spark, str(path),
        record_key="k", precombine_field="v", cdc_enabled=True, **kw
    )
    i1 = t.bulk_insert(_base(spark))
    upd = _base(spark).filter("k % 10 = 3").withColumn(
        "v", F.col("v") + 100.0
    )
    new = spark.createDataFrame([(1000, 0, 1.0)], "k long, g long, v double")
    i2 = t.upsert(upd.unionByName(new))
    i3 = t.delete("k % 10 = 7")
    return t, i1, i2, i3


def test_persisted_cdc_equals_inference(spark, tmp_path):
    """Persisted supplemental files and timeline inference share one
    derivation — the scan answers are literally equal."""
    t, i1, i2, i3 = _cdc_table(spark, tmp_path / "pers")
    for inst in (i1, i2, i3):
        assert os.path.exists(
            os.path.join(t.location, "cdc", inst, "_SUCCESS")
        )
    persisted = _ev(t.cdc_scan(i1))
    inferred = _ev(t.cdc_scan(i1, use_persisted=False))
    assert persisted == inferred
    want = sorted(
        [(k, float(k), "update_before") for k in range(3, 40, 10)]
        + [(k, k + 100.0, "update_after") for k in range(3, 40, 10)]
        + [(1000, 1.0, "insert")]
        + [(k, float(k), "delete") for k in range(7, 40, 10)]
    )
    assert persisted == want


def test_persisted_cdc_scan_reads_only_cdc_files(spark, tmp_path):
    """Plan pin (the r12 contract): a multi-commit range over a
    CDC-enabled table is answered ENTIRELY from cdc/ supplemental
    files — no base or log slice enters the plan."""
    t = HudiCowTable(
        spark, str(tmp_path / "only"),
        record_key="k", precombine_field="v", cdc_enabled=True,
    )
    i1 = t.bulk_insert(_base(spark, 100))
    for step in range(10):
        t.upsert(
            spark.createDataFrame(
                [(step * 7 % 100, 0, 1000.0 + step)],
                "k long, g long, v double",
            )
        )
    ev = t.cdc_scan(i1)
    files = ev.inputFiles()
    assert files, "scan planned no files"
    assert all(f"{os.sep}cdc{os.sep}" in f for f in files), files
    # 10 upserts of an existing key: before+after per commit
    assert ev.count() == 20


def test_persisted_cdc_fallback_for_missing_supplemental(spark, tmp_path):
    """A commit whose supplemental file is absent (pre-CDC history, or
    a crash between commit and persist) falls back to inference — the
    mixed-mode scan still equals full inference."""
    import shutil

    t, i1, i2, i3 = _cdc_table(spark, tmp_path / "mixed")
    shutil.rmtree(os.path.join(t.location, "cdc", i2))
    assert _ev(t.cdc_scan(i1)) == _ev(t.cdc_scan(i1, use_persisted=False))


def test_cdc_flag_is_table_config(spark, tmp_path):
    """cdc_enabled round-trips through hoodie.properties: a reopen
    WITHOUT the kwarg keeps persisting (every writer honors the table
    config), and cluster()'s properties republish preserves the flag."""
    t, i1, _, _ = _cdc_table(spark, tmp_path / "flag")
    t2 = HudiCowTable(spark, t.location)
    assert t2.cdc_enabled
    t2.cluster(2)  # republishes hoodie.properties; no logical change
    t3 = HudiCowTable(spark, t.location)
    assert t3.cdc_enabled
    i4 = t3.upsert(
        spark.createDataFrame([(4, 4, 444.0)], "k long, g long, v double")
    )
    assert os.path.exists(
        os.path.join(t.location, "cdc", i4, "_SUCCESS")
    )
    # maintenance instants persist nothing (they change no logical row)
    cdc_dirs = set(os.listdir(os.path.join(t.location, "cdc")))
    assert all(d in t3.instants() for d in cdc_dirs)
    assert t3.cdc_scan(i1).filter("k = 4").count() == 2  # before+after


def test_mor_persisted_cdc_tombstone(spark, tmp_path):
    t = HudiMorTable(
        spark, str(tmp_path / "morp"),
        record_key="k", precombine_field="v", cdc_enabled=True,
    )
    i1 = t.bulk_insert(_base(spark, 30))
    i2 = t.delete("k = 5")
    assert os.path.exists(
        os.path.join(t.location, "cdc", i2, "_SUCCESS")
    )
    ev = t.cdc_scan(i1, end_instant=i2)
    assert _ev(ev) == [(5, 5.0, "delete")]
    assert all(f"{os.sep}cdc{os.sep}" in f for f in ev.inputFiles())
    t.compact()
    assert sorted(os.listdir(os.path.join(t.location, "cdc"))) == sorted(
        [i1, i2]
    )


def test_persisted_cdc_survives_cleaner(spark, tmp_path):
    """Inference needs the PREVIOUS slice of every touched group; the
    cleaner retires old slices. Persisted change files make history
    scans independent of slice retention."""
    t, i1, i2, i3 = _cdc_table(spark, tmp_path / "clean")
    expected = _ev(t.cdc_scan(i1))
    removed = t.clean(retain_slices=1)
    assert removed  # the old slices really went away
    got = t.cdc_scan(i1)
    assert _ev(got) == expected
    assert all(f"{os.sep}cdc{os.sep}" in f for f in got.inputFiles())
