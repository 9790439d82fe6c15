"""IcebergTable (sources/iceberg_layout.py): v1 metadata layout —
snapshot commits via the version-hint swap, avro manifest lists +
manifests with spec field-ids, time travel, incremental attribution."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emr_on_eks_hudi_iceberg_delta_spark.sources.avro_io import read_ocf
from emr_on_eks_hudi_iceberg_delta_spark.sources.iceberg_layout import (
    IcebergTable,
)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_append_overwrite_time_travel(spark, tmp_path):
    t = IcebergTable(spark, str(tmp_path / "i1"))
    s0 = t.append(spark.range(5).selectExpr("id", "id * 2 AS v"))
    s1 = t.append(spark.range(5, 8).selectExpr("id", "id * 2 AS v"))
    assert _rows(t.read()) == [(i, i * 2) for i in range(8)]
    assert _rows(t.read(snapshot_id=s0)) == [(i, i * 2) for i in range(5)]
    s2 = t.overwrite(spark.range(100, 103).selectExpr("id", "id AS v"))
    assert _rows(t.read()) == [(i, i) for i in (100, 101, 102)]
    # every older snapshot still time-travels (immutable metadata)
    assert _rows(t.read(snapshot_id=s1)) == [(i, i * 2) for i in range(8)]
    hist = t.history()
    assert [h["snapshot_id"] for h in hist] == [s0, s1, s2]
    assert [h["operation"] for h in hist] == [
        "append", "append", "overwrite"
    ]


def test_incremental_attribution(spark, tmp_path):
    t = IcebergTable(spark, str(tmp_path / "i2"))
    s0 = t.append(spark.range(4).selectExpr("id"))
    t.append(spark.range(4, 6).selectExpr("id"))
    t.append(spark.range(6, 9).selectExpr("id"))
    inc = t.read_appended_since(s0)
    assert _rows(inc) == [(i,) for i in range(4, 9)]
    assert t.read_appended_since(t.history()[-1]["snapshot_id"]).count() == 0
    # carried-forward files are EXISTING entries, attribution survives
    added = t.added_files(s0)
    assert all(f["record_count"] > 0 for f in added)


def test_layout_is_iceberg_shaped(spark, tmp_path):
    """On-disk contract: version-hint.text -> vN.metadata.json ->
    snap-*.avro manifest list -> manifest with the spec's field ids."""
    loc = str(tmp_path / "i3")
    t = IcebergTable(spark, loc)
    sid = t.append(spark.range(3).selectExpr("id", "CAST(id AS DOUBLE) AS x"))
    hint = open(os.path.join(loc, "metadata", "version-hint.text")).read()
    assert hint == "1"
    md = json.load(open(os.path.join(loc, "metadata", "v1.metadata.json")))
    assert md["format-version"] == 1
    assert md["current-snapshot-id"] == sid
    fields = {f["name"]: f for f in md["schema"]["fields"]}
    assert fields["id"]["type"] == "long" and fields["x"]["type"] == "double"
    assert all("id" in f for f in md["schema"]["fields"])
    mlist = md["snapshots"][0]["manifest-list"]
    schema, manifests = read_ocf(mlist)
    by_name = {f["name"]: f for f in schema["fields"]}
    assert by_name["manifest_path"]["field-id"] == 500
    assert by_name["added_snapshot_id"]["field-id"] == 503
    eschema, entries = read_ocf(manifests[0]["manifest_path"])
    dfields = {
        f["name"]: f
        for f in next(
            f for f in eschema["fields"] if f["name"] == "data_file"
        )["type"]["fields"]
    }
    assert dfields["file_path"]["field-id"] == 100
    assert dfields["record_count"]["field-id"] == 103
    for e in entries:
        assert e["data_file"]["file_format"] == "PARQUET"
        assert os.path.exists(e["data_file"]["file_path"])
        assert e["data_file"]["record_count"] >= 1


def test_unsupported_types_refuse_loudly(spark, tmp_path):
    import pytest

    t = IcebergTable(spark, str(tmp_path / "i4"))
    arr = spark.range(3).selectExpr("array(id) AS a")
    with pytest.raises(ValueError, match="not in the v1 subset"):
        t.append(arr)


def test_identity_partitioned_spec_and_pruning(spark, tmp_path):
    """Identity partitioning: data files CONTAIN the source column
    (the Iceberg contract, unlike hive/Delta layouts), the manifest
    entries carry typed partition values, and read_where prunes on
    the driver's manifest before any file is scheduled."""
    import pyarrow.parquet as pq

    t = IcebergTable(spark, str(tmp_path / "p1"))
    df = spark.range(90).selectExpr(
        "id", "CAST(id % 3 AS INT) AS bucket", "id * 2 AS v"
    )
    t.append(df, partition_by=["bucket"])
    # spec recorded in metadata
    md = t._metadata()
    spec = md["partition-specs"][0]["fields"]
    assert spec == [{
        "name": "bucket", "transform": "identity",
        "source-id": 2, "field-id": 1000,
    }]
    # data files contain the partition column
    for e in t._entries():
        names = pq.read_schema(e["data_file"]["file_path"]).names
        assert "bucket" in names
        assert e["data_file"]["partition"]["bucket"] in (0, 1, 2)
    # full read intact; pruned read touches only one partition's files
    assert t.read().count() == 90
    pruned = t.read_where(lambda p: p["bucket"] == 1)
    assert pruned.count() == 30
    assert all(
        "data" in f for f in pruned.inputFiles()
    )
    files_b1 = {
        e["data_file"]["file_path"]
        for e in t._entries()
        if e["data_file"]["partition"]["bucket"] == 1
    }
    got_files = {f.replace("file:", "").lstrip("/") for f in pruned.inputFiles()}
    assert got_files == {p.lstrip("/") for p in files_b1}


def test_partitioned_appends_inherit_spec_and_refuse_respec(spark, tmp_path):
    import pytest

    t = IcebergTable(spark, str(tmp_path / "p2"))
    df = spark.range(10).selectExpr("id", "CAST(id % 2 AS INT) AS p")
    t.append(df, partition_by=["p"])
    # later writes inherit the stored spec without restating it
    t.append(spark.range(10, 14).selectExpr("id", "CAST(id % 2 AS INT) AS p"))
    assert t.read().count() == 14
    with pytest.raises(ValueError, match="partition spec"):
        t.append(df, partition_by=["id"])
    with pytest.raises(ValueError, match="not supported"):
        t2 = IcebergTable(spark, str(tmp_path / "p3"))
        t2.append(
            spark.range(3).selectExpr("id", "CAST(id AS DECIMAL(10,2)) AS d"),
            partition_by=["d"],
        )


def test_expire_snapshots_retention(spark, tmp_path):
    """expireSnapshots: expired snapshots' metadata and unreferenced
    data files are deleted, retained snapshots (and files shared with
    them) survive, and expired ids refuse time travel loudly."""
    import pytest

    t = IcebergTable(spark, str(tmp_path / "e1"))
    s0 = t.append(spark.range(5).selectExpr("id"))
    s1 = t.append(spark.range(5, 8).selectExpr("id"))  # carries s0 files
    s2 = t.overwrite(spark.range(100, 104).selectExpr("id"))
    stats = t.expire_snapshots(keep_last=1)
    assert stats["snapshots"] == 2
    # s0/s1's data files are unreferenced by s2 -> deleted
    assert stats["files"] >= 1
    assert _rows(t.read()) == [(i,) for i in (100, 101, 102, 103)]
    assert [h["snapshot_id"] for h in t.history()] == [s2]
    with pytest.raises(ValueError, match="not found"):
        t.read(snapshot_id=s0)
    # shared-file safety: append-only chains share files with the head
    t2 = IcebergTable(spark, str(tmp_path / "e2"))
    t2.append(spark.range(3).selectExpr("id"))
    t2.append(spark.range(3, 6).selectExpr("id"))
    st = t2.expire_snapshots(keep_last=1)
    assert st["snapshots"] == 1 and st["files"] == 0  # all files shared
    assert _rows(t2.read()) == [(i,) for i in range(6)]


# ------------------- manifest reuse + list-level pruning (r12) -------------------


def _mlist(t, sid=None):
    from emr_on_eks_hudi_iceberg_delta_spark.sources.avro_io import read_ocf

    md = t._metadata()
    sid = sid if sid is not None else md["current-snapshot-id"]
    snap = next(s for s in md["snapshots"] if s["snapshot-id"] == sid)
    _, rows = read_ocf(snap["manifest-list"])
    return rows


def test_append_reuses_parent_manifests(spark, tmp_path):
    """r12: an append references the parent snapshot's manifests
    VERBATIM and writes one new manifest holding only its added files —
    write cost O(added), manifests naturally sharded one-per-commit."""
    from emr_on_eks_hudi_iceberg_delta_spark.sources.avro_io import read_ocf

    t = IcebergTable(spark, str(tmp_path / "reuse"))
    s1 = t.append(spark.range(10).selectExpr("id"))
    s2 = t.append(spark.range(10, 15).selectExpr("id"))
    s3 = t.append(spark.range(15, 18).selectExpr("id"))
    rows3 = [m for m in _mlist(t, s3) if m.get("content", 0) == 0]
    assert len(rows3) == 3  # one data manifest per append
    # the first two rows are the parent's rows, same paths (reuse)
    rows2 = [m for m in _mlist(t, s2) if m.get("content", 0) == 0]
    assert [m["manifest_path"] for m in rows3[:2]] == [
        m["manifest_path"] for m in rows2
    ]
    # the new manifest holds ONLY files this commit added — nothing
    # carried, every entry ADDED under s3
    _, es = read_ocf(rows3[-1]["manifest_path"])
    assert len(es) == rows3[-1]["added_data_files_count"]
    assert all(e["status"] == 1 and e["snapshot_id"] == s3 for e in es)
    assert _rows(t.read()) == [(i,) for i in range(18)]
    # incremental attribution still exact under reuse
    assert sorted(
        r[0]
        for r in t.read_appended_since(s1).select("id").collect()
    ) == list(range(10, 18))


def test_append_carries_delete_manifests_by_reference(spark, tmp_path):
    """Appends after a MoR DELETE keep the delete manifest applied —
    now carried by reference instead of decode-and-re-encode."""
    from emr_on_eks_hudi_iceberg_delta_spark.sources import iceberg_deletes  # noqa: F401

    t = IcebergTable(spark, str(tmp_path / "delcarry"))
    t.append(spark.range(10).selectExpr("id", "id * 2 AS v"))
    t.delete("id = 3")
    del_rows_before = [
        m for m in _mlist(t) if m.get("content", 0) == 1
    ]
    assert del_rows_before
    t.append(spark.range(10, 12).selectExpr("id", "id * 2 AS v"))
    del_rows_after = [
        m for m in _mlist(t) if m.get("content", 0) == 1
    ]
    assert [m["manifest_path"] for m in del_rows_after] == [
        m["manifest_path"] for m in del_rows_before
    ]
    got = sorted(r[0] for r in t.read().select("id").collect())
    assert got == [0, 1, 2, 4, 5, 6, 7, 8, 9, 10, 11]


def test_partition_summaries_recorded(spark, tmp_path):
    t = IcebergTable(spark, str(tmp_path / "summ"))
    t.append(
        spark.range(20).selectExpr("id", "CAST(id % 4 AS INT) AS b"),
        partition_by=["b"],
    )
    t.append(
        spark.range(20, 30).selectExpr("id", "CAST(7 AS INT) AS b"),
    )
    import json as _json

    rows = [m for m in _mlist(t) if m.get("content", 0) == 0]
    assert len(rows) == 2
    s0 = rows[0]["partitions"][0]
    assert s0["name"] == "b" and not s0["contains_null"]
    assert _json.loads(s0["lower_bound"]) == 0
    assert _json.loads(s0["upper_bound"]) == 3
    s1 = rows[1]["partitions"][0]
    assert _json.loads(s1["lower_bound"]) == 7
    assert _json.loads(s1["upper_bound"]) == 7


def test_read_hidden_prunes_manifests_before_decode(spark, tmp_path, monkeypatch):
    """List-level pruning: a day-filtered read over a table whose
    appends landed on different days DECODES only the matching
    commits' manifests — the others are proven out by their spec-507
    summaries before any entry decode."""
    from emr_on_eks_hudi_iceberg_delta_spark.sources import iceberg_layout as il

    t = IcebergTable(spark, str(tmp_path / "prune"))
    for day in ("2024-01-01", "2024-03-01", "2024-06-01"):
        t.append(
            spark.range(50).selectExpr(
                "id",
                f"CAST('{day} 10:00:00' AS TIMESTAMP_NTZ) AS ts",
            ),
            partition_by=["day(ts)"],
        )
    decoded = []
    real = il.read_ocf_cached

    def spy(path):
        decoded.append(os.path.basename(path))
        return real(path)

    monkeypatch.setattr(il, "read_ocf_cached", spy)
    import datetime

    out = t.read_hidden(
        [("ts", ">=", datetime.datetime(2024, 5, 1))]
    )
    assert out.count() == 50
    # one manifest list + ONE data manifest decoded (the June one);
    # January and March manifests were pruned before decode
    manifests = [p for p in decoded if "-m0" in p]
    assert len(manifests) == 1, decoded
    # exactness: the residual filter keeps semantics
    assert out.select("id").distinct().count() == 50


def test_prune_interval_unit():
    from emr_on_eks_hudi_iceberg_delta_spark.sources.iceberg_transforms import (
        prune_interval,
    )

    day = {"name": "ts_day", "transform": "day", "source": "ts"}
    bucket = {"name": "id_bucket", "transform": "bucket[8]", "source": "id"}
    ident = {"name": "g", "transform": "identity", "source": "g"}
    import datetime

    d = datetime.datetime(2024, 6, 1)
    ge = prune_interval(day, ">=", d, "timestamp_ntz")
    lift = ge  # keep iff hi >= t(lit)
    import math

    # day ordinal of 2024-06-01 vs intervals
    assert ge(None, None)  # unknown bounds keep
    assert not ge(19700, 19750)  # both way before 2024
    eq = prune_interval(ident, "=", 5, "int")
    assert eq(0, 9) and not eq(6, 9) and eq(None, 4)
    inp = prune_interval(ident, "in", [2, 11], "int")
    assert inp(10, 12) and not inp(3, 9)
    beq = prune_interval(bucket, "=", 42, "bigint")
    assert beq is not None  # equality survives bucketing
    brange = prune_interval(bucket, ">=", 42, "bigint")
    assert brange is None  # ranges don't survive hashing


def test_rewrite_manifests_compacts_preserves_and_prunes(
    spark, tmp_path, monkeypatch
):
    """rewrite_manifests (r12): partition-sorted re-binning of the
    head's data manifests — metadata only, entry status/snapshot_id
    preserved (incremental attribution survives), delete manifests by
    reference, maintenance-stamped (changelog silent), and the
    consolidated summaries prune tighter."""
    import datetime

    from emr_on_eks_hudi_iceberg_delta_spark.sources import iceberg_changelog  # noqa: F401
    from emr_on_eks_hudi_iceberg_delta_spark.sources import iceberg_deletes  # noqa: F401
    from emr_on_eks_hudi_iceberg_delta_spark.sources import iceberg_layout as il

    t = IcebergTable(spark, str(tmp_path / "rwm"))
    sids = []
    # two partition values (consecutive days) per append -> two data
    # files per append: hash-distributed partitioned writes emit
    # exactly one file per partition value (r12 optimization), so file
    # multiplicity comes from the partition values, not repartition()
    for day in ("2024-01-01", "2024-03-01", "2024-06-01"):
        sids.append(
            t.append(
                spark.range(20).selectExpr(
                    "id",
                    f"timestampadd(DAY, CAST(id % 2 AS INT), "
                    f"CAST('{day} 10:00:00' AS TIMESTAMP_NTZ)) AS ts",
                ),
                partition_by=["day(ts)"],
            )
        )
    before = _rows(t.read())
    stats = t.rewrite_manifests(target_entries=2)
    assert stats["manifests_before"] == 3
    assert stats["manifests_after"] == 3  # 6 entries / 2 per bin
    assert stats["entries"] == 6
    assert _rows(t.read()) == before  # data identical
    # attribution preserved: files added since the FIRST append are
    # still exactly the later two appends' files
    assert len(t.added_files(sids[0])) == 4
    # the maintenance snapshot emits NO change events
    assert t.changes(sids[-1]).count() == 0
    # partition-sorted bins: a day-filtered read decodes ONE manifest
    decoded = []
    real = il.read_ocf_cached

    def spy(path):
        decoded.append(os.path.basename(path))
        return real(path)

    monkeypatch.setattr(il, "read_ocf_cached", spy)
    out = t.read_hidden([("ts", ">=", datetime.datetime(2024, 5, 1))])
    assert out.count() == 20
    assert len([p for p in decoded if "-m" in p]) == 1, decoded


def test_rewrite_manifests_carries_delete_manifests(spark, tmp_path):
    from emr_on_eks_hudi_iceberg_delta_spark.sources import iceberg_deletes  # noqa: F401

    t = IcebergTable(spark, str(tmp_path / "rwmd"))
    t.append(spark.range(10).selectExpr("id AS k", "id AS v"))
    t.append(spark.range(10, 16).selectExpr("id AS k", "id AS v"))
    t.delete("k % 4 = 1")
    want = sorted(r["k"] for r in t.read().collect())
    stats = t.rewrite_manifests()
    assert stats["manifests_after"] == 1
    assert sorted(r["k"] for r in t.read().collect()) == want
    # a post-rewrite append keeps reusing (now 1 compacted + 1 new)
    t.append(spark.createDataFrame([(100, 0)], "k long, v long"))
    rows = [m for m in _mlist(t) if m.get("content", 0) == 0]
    assert len(rows) == 2


def test_add_files_adopts_foreign_parquet_by_reference(
    spark, tmp_path
):
    """r12 add_files: foreign parquet adopts zero-copy — one carried
    append commit, footer bounds collected (skipping works), schema /
    duplicate / purity refusals loud."""
    import pyarrow.parquet as pq

    src = tmp_path / "foreign"
    spark.range(50).selectExpr("id AS k", "id * 2 AS v").coalesce(
        2
    ).write.parquet(str(src))
    t = IcebergTable(spark, str(tmp_path / "adopt"))
    t.append(
        spark.createDataFrame([(1000, 0)], "k bigint, v bigint")
    )
    inodes = {
        os.stat(os.path.join(r, f)).st_ino
        for r, _, fs in os.walk(src)
        for f in fs
        if f.endswith(".parquet")
    }
    rep = t.add_files(str(src))
    assert rep["added_files"] == 2
    assert t.read().count() == 51
    # zero copy: the adopted files are the source inodes, in place
    adopted = {
        os.stat(e["data_file"]["file_path"]).st_ino
        for e in t._entries()
        if str(src) in e["data_file"]["file_path"]
    }
    assert adopted == inodes
    # footer bounds landed: a point read prunes to one adopted file
    hits = t.read_hidden([("k", "=", 7)])
    assert [r["k"] for r in hits.collect()] == [7]
    # duplicate adoption refuses
    import pytest as _pytest

    with _pytest.raises(ValueError, match="already referenced"):
        t.add_files(str(src))
    # schema mismatch refuses
    bad = tmp_path / "bad"
    spark.range(3).selectExpr("id AS k").write.parquet(str(bad))
    with _pytest.raises(ValueError, match="missing columns"):
        t.add_files(str(bad))


def test_add_files_partitioned_purity(spark, tmp_path):
    """Identity-partitioned adoption: partition values derive from
    footer min==max; impure files refuse; pruning works on adopted
    files."""
    import pytest as _pytest

    t = IcebergTable(spark, str(tmp_path / "padopt"))
    t.append(
        spark.createDataFrame([(0, "a")], "k bigint, p string"),
        partition_by=["p"],
    )
    pure = tmp_path / "pure"
    (
        spark.range(1, 9)
        .selectExpr("id AS k", "CASE WHEN id < 5 THEN 'a' ELSE 'b' END AS p")
        .repartition(2, "p")
        .write.parquet(str(pure))
    )
    rep = t.add_files(str(pure))
    assert rep["added_files"] >= 1
    got = t.read_where(lambda pv: pv["p"] == "b")
    assert sorted(r["k"] for r in got.collect()) == [5, 6, 7, 8]
    assert t.read().count() == 9
    impure = tmp_path / "impure"
    (
        spark.range(20, 26)
        .selectExpr("id AS k", "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS p")
        .coalesce(1)
        .write.parquet(str(impure))
    )
    with _pytest.raises(ValueError, match="partition-pure"):
        t.add_files(str(impure))
