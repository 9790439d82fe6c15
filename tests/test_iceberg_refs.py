"""Iceberg refs (sources/iceberg_refs.py): tags, branches, branch
appends invisible to main, fast-forward publish (WAP), divergence
refusal, and expire_snapshots ref pinning."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emr_on_eks_hudi_iceberg_delta_spark.sources.iceberg_layout import (
    IcebergTable,
)
from emr_on_eks_hudi_iceberg_delta_spark.sources import iceberg_refs  # noqa: F401
from emr_on_eks_hudi_iceberg_delta_spark.sources import iceberg_deletes  # noqa: F401


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _rng(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id", "id * 2 AS v")


def test_tags_pin_snapshots_and_expiration(spark, tmp_path):
    t = IcebergTable(spark, str(tmp_path / "r1"))
    s0 = t.append(_rng(spark, 0, 5))
    t.create_tag("v1.0")
    assert t.refs()["v1.0"] == {"snapshot-id": s0, "type": "tag"}
    t.append(_rng(spark, 5, 8))
    t.append(_rng(spark, 8, 10))
    # the tag still reads the old state
    assert _rows(t.read_ref("v1.0")) == [(i, i * 2) for i in range(5)]
    # expiration keeps the tagged snapshot alive
    rep = t.expire_snapshots(keep_last=1)
    assert rep["snapshots"] == 1  # only the middle snapshot expired
    assert _rows(t.read_ref("v1.0")) == [(i, i * 2) for i in range(5)]
    # duplicate names and unknown refs refuse
    with pytest.raises(ValueError, match="already exists"):
        t.create_tag("v1.0")
    with pytest.raises(ValueError, match="no ref"):
        t.read_ref("nope")
    t.drop_ref("v1.0")
    assert "v1.0" not in t.refs()


def test_inspect_refs_table(spark, tmp_path):
    from emr_on_eks_hudi_iceberg_delta_spark.sources import (
        iceberg_inspect,  # noqa: F401 — attaches inspect_*
    )

    t = IcebergTable(spark, str(tmp_path / "r5"))
    s0 = t.append(_rng(spark, 0, 3))
    t.create_tag("rel-1")
    t.create_branch("dev")
    rows = {
        r["name"]: (r["type"], r["snapshot_id"])
        for r in t.inspect_refs().collect()
    }
    assert rows["main"] == ("branch", s0)
    assert rows["rel-1"] == ("tag", s0)
    assert rows["dev"] == ("branch", s0)


def test_wap_branch_write_audit_publish(spark, tmp_path):
    t = IcebergTable(spark, str(tmp_path / "r2"))
    t.append(_rng(spark, 0, 5))
    t.create_branch("audit")
    staged = t.append_to_branch(_rng(spark, 100, 103), "audit")
    # WRITE: main is blind to the staged snapshot
    assert _rows(t.read()) == [(i, i * 2) for i in range(5)]
    # AUDIT: the branch sees base + staged
    want = [(i, i * 2) for i in range(5)] + [
        (i, i * 2) for i in (100, 101, 102)
    ]
    assert _rows(t.read_ref("audit")) == sorted(want)
    # a second staged batch stacks on the branch
    t.append_to_branch(_rng(spark, 200, 201), "audit")
    assert _rows(t.read()) == [(i, i * 2) for i in range(5)]
    # PUBLISH: fast-forward moves main to the branch head
    head = t.fast_forward("audit")
    assert t._metadata()["current-snapshot-id"] == head
    assert _rows(t.read()) == sorted(want + [(200, 400)])
    # parent chain is recorded
    snaps = {s["snapshot-id"]: s for s in t._metadata()["snapshots"]}
    assert snaps[head]["parent-snapshot-id"] == staged
    # appending to a tag refuses
    t.create_tag("rel")
    with pytest.raises(ValueError, match="not a branch"):
        t.append_to_branch(_rng(spark, 0, 1), "rel")


def test_fast_forward_refuses_diverged_main(spark, tmp_path):
    t = IcebergTable(spark, str(tmp_path / "r3"))
    t.append(_rng(spark, 0, 3))
    t.create_branch("b")
    t.append_to_branch(_rng(spark, 10, 12), "b")
    t.append(_rng(spark, 20, 22))  # main moves past the fork point
    with pytest.raises(ValueError, match="diverged"):
        t.fast_forward("b")
    # main and branch both remain readable
    assert t.read().count() == 5
    assert t.read_ref("b").count() == 5


def test_branch_append_carries_deletes_and_publishes_them(spark, tmp_path):
    """Staged branch state composes with v2 deletes: a position delete
    on main before branching stays applied on the branch and after
    publish."""
    t = IcebergTable(spark, str(tmp_path / "r4"))
    t.overwrite(_rng(spark, 0, 10).repartition(2))
    t.delete("id < 3")  # v2 position delete on main
    t.create_branch("stage")
    t.append_to_branch(_rng(spark, 50, 52), "stage")
    got_branch = _rows(t.read_ref("stage"))
    want = [(i, i * 2) for i in range(3, 10)] + [(50, 100), (51, 102)]
    assert got_branch == sorted(want)
    t.fast_forward("stage")
    assert _rows(t.read()) == sorted(want)
