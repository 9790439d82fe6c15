"""Iceberg changelog scan (sources/iceberg_changelog.py): manifest-
derived insert/delete events across appends, overwrites, position and
equality deletes, MoR updates, compaction skipping, and range
slicing."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emr_on_eks_hudi_iceberg_delta_spark.sources.iceberg_layout import (
    IcebergTable,
)
from emr_on_eks_hudi_iceberg_delta_spark.sources import iceberg_changelog  # noqa: F401
from emr_on_eks_hudi_iceberg_delta_spark.sources import iceberg_deletes  # noqa: F401


def _ev(df):
    return sorted(
        map(tuple, df.select("id", "v", "_change_type").collect())
    )


def _rng(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id", "id * 2 AS v")


def test_append_delete_overwrite_events(spark, tmp_path):
    t = IcebergTable(spark, str(tmp_path / "c1"))
    s0 = t.overwrite(_rng(spark, 0, 6).repartition(2))
    s1 = t.append(_rng(spark, 10, 13))
    t.delete("id >= 11 AND id <= 12")  # position delete
    # events since s0: inserts 10-12, deletes 11-12
    got = _ev(t.changes(s0))
    want = sorted(
        [(i, i * 2, "insert") for i in (10, 11, 12)]
        + [(i, i * 2, "delete") for i in (11, 12)]
    )
    assert got == want
    # since s1: only the delete events
    assert _ev(t.changes(s1)) == sorted(
        (i, i * 2, "delete") for i in (11, 12)
    )
    # overwrite: deletes of the LIVE prior state (already-deleted rows
    # are not re-reported), inserts of the new state
    s3 = t.history()[-1]["snapshot_id"]
    t.overwrite(_rng(spark, 100, 102))
    got2 = _ev(t.changes(s3))
    live_before = [0, 1, 2, 3, 4, 5, 10]
    want2 = sorted(
        [(i, i * 2, "delete") for i in live_before]
        + [(i, i * 2, "insert") for i in (100, 101)]
    )
    assert got2 == want2
    # commit attribution: every event carries its snapshot id
    snap_ids = {
        r["_commit_snapshot_id"]
        for r in t.changes(s0).select("_commit_snapshot_id").collect()
    }
    assert snap_ids <= set(s["snapshot_id"] for s in t.history())


def test_mor_update_emits_delete_insert_pair(spark, tmp_path):
    t = IcebergTable(spark, str(tmp_path / "c2"))
    s0 = t.overwrite(_rng(spark, 0, 5).repartition(1))
    t.update("id = 2", {"v": "999"})
    got = _ev(t.changes(s0))
    assert got == [(2, 4, "delete"), (2, 999, "insert")]


def test_equality_delete_events_and_upsert(spark, tmp_path):
    t = IcebergTable(spark, str(tmp_path / "c3"))
    s0 = t.overwrite(_rng(spark, 0, 6).repartition(2))
    # keyed upsert: eq-delete keys + new rows in ONE snapshot
    t.upsert_by_key(
        spark.createDataFrame([(2, 777), (50, 500)], "id bigint, v bigint"),
        ["id"],
    )
    got = _ev(t.changes(s0))
    want = sorted(
        [(2, 4, "delete")]  # key 50 matched nothing at the parent
        + [(2, 777, "insert"), (50, 500, "insert")]
    )
    assert got == want


def test_compaction_emits_nothing(spark, tmp_path):
    t = IcebergTable(spark, str(tmp_path / "c4"))
    s0 = t.overwrite(_rng(spark, 0, 8).repartition(4))
    t.delete("id < 2")
    s1 = t.history()[-1]["snapshot_id"]
    t.rewrite_data_files()
    # the rewrite snapshot contributes zero events
    assert t.changes(s1).count() == 0
    # and the full range still reports only the logical delete
    assert _ev(t.changes(s0)) == sorted(
        (i, i * 2, "delete") for i in (0, 1)
    )
    # to_snapshot slicing works
    assert t.changes(s0, s1).count() == 2
    # reversed ranges fail the ancestry walk (r11: lineage-based)
    with pytest.raises(ValueError, match="not an ancestor"):
        t.changes(s1, s0)


def test_changelog_eq_delete_events_after_rename(spark, tmp_path):
    """Equality-delete events align to the CURRENT schema even when a
    rename happened after the parent snapshot (the parent-state scan
    resolves by field id, and the delete's key columns resolve through
    the current schema)."""
    t = IcebergTable(spark, str(tmp_path / "c6"))
    s0 = t.overwrite(_rng(spark, 0, 6).repartition(2))
    t.rename_column("v", "val")
    t.equality_delete(
        spark.createDataFrame([(2,), (4,)], "id bigint")
    )
    got = sorted(
        map(
            tuple,
            t.changes(s0).select("id", "val", "_change_type").collect(),
        )
    )
    assert got == [(2, 4, "delete"), (4, 8, "delete")]


def test_changelog_aligns_renamed_schema(spark, tmp_path):
    """Events surface under the CURRENT schema even for files written
    before a rename (field-id alignment)."""
    t = IcebergTable(spark, str(tmp_path / "c5"))
    s0 = t.overwrite(_rng(spark, 0, 3).repartition(1))
    t.append(_rng(spark, 10, 12))
    t.rename_column("v", "val")
    got = sorted(
        map(tuple, t.changes(s0).select("id", "val", "_change_type").collect())
    )
    assert got == [(10, 20, "insert"), (11, 22, "insert")]


def test_branch_snapshot_not_leaked_into_main_changelog(spark, tmp_path):
    """r11 advisor fix: changes() walks PARENT ancestry, so an
    unpublished branch snapshot inside the metadata-list range never
    emits events on main's changelog."""
    from emr_on_eks_hudi_iceberg_delta_spark.sources import iceberg_refs  # noqa: F401

    t = IcebergTable(spark, str(tmp_path / "cbr"))
    s0 = t.overwrite(_rng(spark, 0, 4))
    t.create_branch("audit")
    s_br = t.append_to_branch(_rng(spark, 100, 103), "audit")
    s2 = t.append(_rng(spark, 10, 12))  # a real main commit AFTER the branch write
    got = _ev(t.changes(s0))
    # only main's own commit surfaces; the staged 100-102 rows do not
    assert got == sorted((i, i * 2, "insert") for i in (10, 11))
    # and a range that crosses lineages refuses loudly
    with pytest.raises(ValueError, match="not an ancestor"):
        t.changes(s_br, s2)
    with pytest.raises(ValueError, match="not an ancestor"):
        t.changes(s2, s_br)


def test_branch_scoped_changelog_for_wap_audit(spark, tmp_path):
    """r11: the ancestry walk makes a BRANCH-scoped range legal —
    changes(base, branch_head) audits staged rows through the
    changelog BEFORE publish, the write-audit-publish reviewer's
    view."""
    from emr_on_eks_hudi_iceberg_delta_spark.sources import iceberg_refs  # noqa: F401

    t = IcebergTable(spark, str(tmp_path / "cwap"))
    s0 = t.overwrite(_rng(spark, 0, 4))
    t.create_branch("audit")
    s_br = t.append_to_branch(_rng(spark, 100, 102), "audit")
    got = _ev(t.changes(s0, s_br))
    assert got == sorted((i, i * 2, "insert") for i in (100, 101))
    # main's own changelog stays blind to the staged rows
    assert t.changes(s0).count() == 0
