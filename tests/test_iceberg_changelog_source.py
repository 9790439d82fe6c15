"""Streaming Iceberg changelog source (sources/
iceberg_changelog_source.py — the "iceberglog" format): snapshot-id
offsets via ancestry, batch-changes parity, pos-delete events,
checkpoint exactly-once, WAP-branch exclusion, rename alignment,
equality-delete refusal."""

import os
import sys
import tempfile

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emr_on_eks_hudi_iceberg_delta_spark.sources import iceberg_changelog  # noqa: F401
from emr_on_eks_hudi_iceberg_delta_spark.sources import iceberg_deletes  # noqa: F401
from emr_on_eks_hudi_iceberg_delta_spark.sources import iceberg_refs  # noqa: F401
from emr_on_eks_hudi_iceberg_delta_spark.sources.iceberg_changelog_source import (
    register_iceberglog_source,
)
from emr_on_eks_hudi_iceberg_delta_spark.sources.iceberg_layout import (
    IcebergTable,
)

EVENT_COLS = ["k", "v", "_change_type"]


def _ev(df):
    return sorted(map(tuple, df.select(*EVENT_COLS).collect()))


def _lifecycle(spark, tmp_path):
    t = IcebergTable(spark, str(tmp_path / "icl"))
    s1 = t.append(spark.range(10).selectExpr("id AS k", "id * 2 AS v"))
    s2 = t.append(spark.range(10, 14).selectExpr("id AS k", "id * 2 AS v"))
    s3 = t.delete("k < 3")["snapshot_id"]  # position-delete events
    return t, s1, s2, s3


def test_batch_reader_matches_changes(spark, tmp_path):
    t, s1, s2, s3 = _lifecycle(spark, tmp_path)
    register_iceberglog_source(spark)
    got = (
        spark.read.format("iceberglog")
        .option("location", t.location)
        .option("startingSnapshot", s1)
        .load()
    )
    want = t.changes(s1).withColumnRenamed(
        "_commit_snapshot_id", "_commit_snapshot_id"
    )
    assert _ev(got) == _ev(want)
    # per-snapshot attribution
    by_snap = {
        r["_commit_snapshot_id"]
        for r in got.select("_commit_snapshot_id").distinct().collect()
    }
    assert by_snap == {s2, s3}
    # full replay (no start): the whole lineage
    full = (
        spark.read.format("iceberglog")
        .option("location", t.location)
        .load()
    )
    assert full.filter("_change_type = 'insert'").count() == 14
    assert _ev(full.filter(f"_commit_snapshot_id = {s3}")) == [
        (0, 0, "delete"), (1, 2, "delete"), (2, 4, "delete"),
    ]


def test_stream_tails_snapshots_exactly_once(spark, tmp_path):
    t, s1, s2, s3 = _lifecycle(spark, tmp_path)
    register_iceberglog_source(spark)
    out = tempfile.mkdtemp(prefix="icl_sink_")
    ck = tempfile.mkdtemp(prefix="icl_ck_")

    def run():
        q = (
            spark.readStream.format("iceberglog")
            .option("location", t.location)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run()
    schema = (
        "k bigint, v bigint, _change_type string, "
        "_commit_snapshot_id long"
    )
    got = spark.read.schema(schema).parquet(out)
    assert got.count() == 17  # 14 inserts + 3 delete events
    assert _ev(got) == sorted(
        [(i, i * 2, "insert") for i in range(14)]
        + [(i, i * 2, "delete") for i in range(3)]
    )
    # a new append streams INCREMENTALLY through the checkpoint
    s4 = t.append(
        spark.createDataFrame([(100, 0)], "k long, v long")
    )
    run()
    got2 = spark.read.schema(schema).parquet(out)
    assert got2.count() == 18
    assert _ev(got2.filter(f"_commit_snapshot_id = {s4}")) == [
        (100, 0, "insert")
    ]
    # no new commits: re-run appends nothing (exactly-once)
    run()
    assert spark.read.schema(schema).parquet(out).count() == 18


def test_wap_branch_snapshot_excluded_until_publish(spark, tmp_path):
    """A staged branch snapshot sits in the snapshot list but NOT on
    main's lineage — the stream must not leak its rows; after
    fast_forward publishes it, the rows surface as inserts."""
    t = IcebergTable(spark, str(tmp_path / "wap"))
    s1 = t.append(spark.range(5).selectExpr("id AS k", "id AS v"))
    t.create_branch("audit")
    staged = t.append_to_branch(
        spark.range(50, 53).selectExpr("id AS k", "id AS v"), "audit"
    )
    register_iceberglog_source(spark)
    got = (
        spark.read.format("iceberglog")
        .option("location", t.location)
        .option("startingSnapshot", s1)
        .load()
    )
    assert got.count() == 0  # the staged snapshot is invisible
    t.fast_forward("audit")
    got2 = (
        spark.read.format("iceberglog")
        .option("location", t.location)
        .option("startingSnapshot", s1)
        .load()
    )
    assert _ev(got2) == [
        (50, 50, "insert"), (51, 51, "insert"), (52, 52, "insert")
    ]
    assert {
        r[0]
        for r in got2.select("_commit_snapshot_id").distinct().collect()
    } == {staged}


def test_rename_alignment_in_stream(spark, tmp_path):
    """Files written before a RENAME serve their rows under today's
    names — the field-id colmap rides each partition."""
    t = IcebergTable(spark, str(tmp_path / "ren"))
    s1 = t.append(spark.range(4).selectExpr("id AS k", "id * 2 AS v"))
    t.rename_column("v", "val")
    t.append(spark.createDataFrame([(9, 99)], "k long, val long"))
    register_iceberglog_source(spark)
    got = (
        spark.read.format("iceberglog")
        .option("location", t.location)
        .load()
    )
    assert "val" in got.columns and "v" not in got.columns
    rows = sorted(
        map(tuple, got.select("k", "val", "_change_type").collect())
    )
    assert rows == sorted(
        [(i, i * 2, "insert") for i in range(4)] + [(9, 99, "insert")]
    )


def test_equality_delete_events_match_batch_changes(spark, tmp_path):
    """r12: EQUALITY-delete events stream — new key files emit the
    parent state's matching rows as deletes (pos/earlier-eq masks
    applied first), exactly the batch changes() attribution."""
    t = IcebergTable(spark, str(tmp_path / "eq"))
    s0 = t.append(spark.range(6).selectExpr("id AS k", "id AS v"))
    t.delete("k = 5")  # pos-delete: masks the parent state
    t.equality_delete(spark.createDataFrame([(2,), (5,)], "k long"))
    # second eq wave: k=2 is ALREADY deleted (earlier eq mask), so
    # only k=3 emits; null keys never match (null-safe semantics)
    t.equality_delete(
        spark.createDataFrame([(2,), (3,), (None,)], "k long")
    )
    register_iceberglog_source(spark)
    got = (
        spark.read.format("iceberglog")
        .option("location", t.location)
        .option("startingSnapshot", s0)
        .load()
    )
    assert _ev(got) == _ev(t.changes(s0))
    dels = sorted(
        r["k"]
        for r in got.filter("_change_type = 'delete'").collect()
    )
    assert dels == [2, 3, 5]


def test_eq_delete_streaming_upsert_tails(spark, tmp_path):
    """The streaming-CDC write shape streams end to end: upsert_by_key
    commits (eq-delete + data in ONE snapshot) emit delete events for
    the keys' PRIOR rows and insert events for the batch's own rows
    (same-sequence exemption), matching batch changes()."""
    t = IcebergTable(spark, str(tmp_path / "ups"))
    s0 = t.append(spark.range(4).selectExpr("id AS k", "id * 10 AS v"))
    t.upsert_by_key(
        spark.createDataFrame([(1, 111), (9, 999)], "k long, v long"),
        ["k"],
    )
    register_iceberglog_source(spark)
    got = (
        spark.read.format("iceberglog")
        .option("location", t.location)
        .option("startingSnapshot", s0)
        .load()
    )
    assert _ev(got) == _ev(t.changes(s0))
    assert _ev(got) == [
        (1, 10, "delete"),  # the key's PRIOR row
        (1, 111, "insert"),
        (9, 999, "insert"),  # no prior row: insert only
    ]
    # removed-file events over live eq deletes: an overwrite after the
    # upsert emits the POST-upsert state as deletes (eq masks applied)
    s_up = t._metadata()["current-snapshot-id"]
    t.overwrite(spark.createDataFrame([(100, 1)], "k long, v long"))
    got2 = (
        spark.read.format("iceberglog")
        .option("location", t.location)
        .option("startingSnapshot", s_up)
        .load()
    )
    assert _ev(got2) == _ev(t.changes(s_up))
    assert (1, 10, "delete") not in _ev(got2)  # masked: already gone


def test_eq_delete_over_ship_cap_refuses(spark, tmp_path):
    t = IcebergTable(spark, str(tmp_path / "eqcap"))
    t.append(spark.range(6).selectExpr("id AS k", "id AS v"))
    t.equality_delete(spark.createDataFrame([(2,), (4,)], "k long"))
    register_iceberglog_source(spark)
    with pytest.raises(Exception, match="ship cap"):
        (
            spark.read.format("iceberglog")
            .option("location", t.location)
            .option("eqShipCap", "1")
            .load()
            .collect()
        )
