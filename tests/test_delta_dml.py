"""DELETE / UPDATE DML, deletion vectors, schema evolution, and
Z-order clustering on the Delta-protocol table
(sources/delta_dml.py, sources/dv.py, sources/roaring.py, and the
round-9 extensions in sources/delta_log.py).

Reference parity: delta/delta_scd_script.py runs on a Delta runtime
where DELETE/UPDATE/DVs/mergeSchema/ZORDER are table operations; these
tests pin the log-native reimplementation to the same semantics.
"""

import json
import os
import struct

import pytest
from pyspark.sql import functions as F

from emr_on_eks_hudi_iceberg_delta_spark.sources import DeltaLogTable
from emr_on_eks_hudi_iceberg_delta_spark.sources import dv as dv_io
from emr_on_eks_hudi_iceberg_delta_spark.sources import roaring


# --------------------------- codec layer ---------------------------


def test_roaring_roundtrip_shapes():
    cases = [
        [],
        [0],
        [1, 2, 3, 65535, 65536, 131071],          # two containers
        list(range(0, 20000, 3)),                  # array containers
        list(range(0, 9000)),                      # dense -> bitmap
        [5, (1 << 32) + 7, (3 << 32) + 9],         # multi high key
    ]
    for vals in cases:
        assert roaring.deserialize(roaring.serialize(vals)) == sorted(
            set(vals)
        )


def test_roaring_known_answer_bytes():
    # handcrafted per the published RoaringFormatSpec: magic, one
    # 32-bit bitmap, no-run cookie, one array container {1,2,3}
    expected = (
        struct.pack("<I", 1681511377)
        + struct.pack("<q", 1)
        + struct.pack("<I", 12346)   # SERIAL_COOKIE_NO_RUNCONTAINER
        + struct.pack("<I", 1)       # container count
        + struct.pack("<HH", 0, 2)   # key 0, cardinality-1
        + struct.pack("<I", 16)      # container offset
        + struct.pack("<HHH", 1, 2, 3)
    )
    assert roaring.serialize([1, 2, 3]) == expected


def test_roaring_reads_run_containers():
    # our writer never emits runs; the reader must still accept them
    # (other writers do): cookie 12347, one run container [10..14]
    bitmap = (
        struct.pack("<I", 12347 | (0 << 16))  # cookie, count-1=0
        + bytes([0b1])                        # run-flag bitset
        + struct.pack("<HH", 0, 4)            # key 0, card-1
        + struct.pack("<H", 1)                # 1 run
        + struct.pack("<HH", 10, 4)           # start 10, len-1=4
    )
    buf = struct.pack("<I", 1681511377) + struct.pack("<q", 1) + bitmap
    assert roaring.deserialize(buf) == [10, 11, 12, 13, 14]


def test_z85_known_answer():
    # the ZeroMQ Z85 spec's reference vector
    assert roaring.z85_encode(
        bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
    ) == "HelloWorld"
    assert roaring.z85_decode("HelloWorld") == bytes(
        [0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B]
    )


def test_dv_file_roundtrip_and_tamper_refusal(tmp_path):
    loc = str(tmp_path)
    desc = dv_io.write_dv(loc, [3, 1, 4, 1, 5])
    assert desc["storageType"] == "u"
    assert desc["cardinality"] == 4
    assert dv_io.read_dv(loc, desc) == [1, 3, 4, 5]
    # flip one payload byte -> CRC must refuse
    path = dv_io.dv_file_path(loc, desc)
    with open(path, "r+b") as f:
        f.seek(7)
        b = f.read(1)
        f.seek(7)
        f.write(bytes([b[0] ^ 0xFF]))
    with pytest.raises(ValueError, match="checksum"):
        dv_io.read_dv(loc, desc)


# ----------------------------- DML --------------------------------


def _table(spark, tmp_path, name="t", files=4, n=400):
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 8).alias("g"),
        (F.col("id") * 1.5).alias("v"),
    )
    dt = DeltaLogTable(spark, str(tmp_path / name))
    dt.overwrite(df.repartition(files))
    return dt


def test_cow_delete_touches_only_hit_files(spark, tmp_path):
    dt = _table(spark, tmp_path)
    live0, _, _ = dt._replay()
    # delete one specific key: it lives in exactly one file
    rep = dt.delete("k = 137")
    assert rep["rows_deleted"] == 1
    assert rep["files_touched"] == 1
    live1, _, _ = dt._replay()
    # every untouched file's add action survives verbatim
    assert len(set(live0) & set(live1)) == len(live0) - 1
    assert dt.read().count() == 399
    assert dt.read().filter("k = 137").count() == 0
    # time travel still serves the pre-delete state
    assert dt.read(version=0).count() == 400


def test_delete_null_predicate_keeps_row(spark, tmp_path):
    dt = DeltaLogTable(spark, str(tmp_path / "nulls"))
    dt.overwrite(
        spark.createDataFrame(
            [(1, None), (2, 5), (3, 0)], "k int, x int"
        )
    )
    for mode in ("cow", "dv"):
        loc = DeltaLogTable(spark, str(tmp_path / f"nulls_{mode}"))
        loc.overwrite(dt.read())
        loc.delete("x > 1", mode=mode)
        kept = sorted(r["k"] for r in loc.read().collect())
        assert kept == [1, 3]  # NULL predicate row is NOT deleted


def test_dv_delete_rewrites_no_data_file(spark, tmp_path):
    dt = _table(spark, tmp_path, "dv")
    live0, _, _ = dt._replay()
    rep = dt.delete("g = 5", mode="dv")
    assert rep["rows_deleted"] == 50
    live1, _, _ = dt._replay()
    # identical physical file set: DVs attach, nothing rewrites
    assert set(live0) == set(live1)
    assert all(
        a.get("deletionVector") for a in live1.values()
    )  # g=5 hits every round-robin file
    assert dt.read().count() == 350
    assert dt.read().filter("g = 5").count() == 0
    proto = dt.current_protocol()
    assert proto["minReaderVersion"] == 3
    assert "deletionVectors" in proto["readerFeatures"]
    # parity vs a straight filter of the v0 snapshot
    exp = sorted(
        r["k"] for r in dt.read(version=0).filter("g <> 5").collect()
    )
    assert sorted(r["k"] for r in dt.read().collect()) == exp


def test_dv_second_delete_merges_bitmaps(spark, tmp_path):
    dt = _table(spark, tmp_path, "dv2")
    dt.delete("g = 1 and k < 200", mode="dv")
    dt.delete("g = 1 and k >= 200", mode="dv")
    assert dt.read().filter("g = 1").count() == 0
    assert dt.read().count() == 350
    live, _, _ = dt._replay()
    total_card = sum(
        a["deletionVector"]["cardinality"]
        for a in live.values()
        if a.get("deletionVector")
    )
    assert total_card == 50


def test_dv_full_file_delete_drops_add(spark, tmp_path):
    dt = DeltaLogTable(spark, str(tmp_path / "full"))
    lo = spark.range(0, 10).selectExpr("id AS k")
    hi = spark.range(10, 20).selectExpr("id AS k")
    dt.overwrite(lo.coalesce(1))
    dt.append(hi.coalesce(1))
    dt.delete("k < 10", mode="dv")
    live, _, _ = dt._replay()
    assert len(live) == 1  # the all-dead file is removed, not DV'd
    assert not any(a.get("deletionVector") for a in live.values())
    assert sorted(r["k"] for r in dt.read().collect()) == list(
        range(10, 20)
    )


def test_update_set_sees_old_row(spark, tmp_path):
    dt = DeltaLogTable(spark, str(tmp_path / "upd"))
    dt.overwrite(
        spark.createDataFrame([(1, 10, 20), (2, 3, 4)], "k int, a int, b int")
    )
    # swap a and b where k = 1: both RHS must read the OLD row
    rep = dt.update("k = 1", {"a": "b", "b": "a"})
    assert rep["rows_updated"] == 1
    rows = {r["k"]: (r["a"], r["b"]) for r in dt.read().collect()}
    assert rows == {1: (20, 10), 2: (3, 4)}


def test_update_moves_rows_across_partitions(spark, tmp_path):
    dt = DeltaLogTable(spark, str(tmp_path / "updpart"))
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "k int, p string"
    )
    dt.overwrite(df, partition_by=["p"])
    dt.update("k = 2", {"p": "'b'"})
    got = dt.read_where(lambda pv: pv["p"] == "b")
    assert sorted(r["k"] for r in got.collect()) == [2, 3]
    live, _, _ = dt._replay()
    assert all(
        a["partitionValues"]["p"] in ("a", "b") for a in live.values()
    )


def test_update_on_dv_table_respects_dvs(spark, tmp_path):
    dt = _table(spark, tmp_path, "updv")
    dt.delete("g = 2", mode="dv")
    dt.update("g = 3", {"v": "v + 1000"})
    assert dt.read().filter("g = 2").count() == 0  # DV survives rewrite
    assert dt.read().filter("g = 3 AND v < 1000").count() == 0
    assert dt.read().count() == 350


# ------------------------ schema evolution -------------------------


def test_merge_schema_append(spark, tmp_path):
    dt = DeltaLogTable(spark, str(tmp_path / "evo"))
    dt.overwrite(spark.createDataFrame([(1, "x")], "k int, s string"))
    with pytest.raises(ValueError, match="merge_schema"):
        dt.append(
            spark.createDataFrame([(2, "y", 5)], "k int, s string, n int")
        )
    dt.append(
        spark.createDataFrame([(2, "y", 5)], "k int, s string, n int"),
        merge_schema=True,
    )
    got = {r["k"]: (r["s"], r["n"]) for r in dt.read().collect()}
    assert got == {1: ("x", None), 2: ("y", 5)}  # old file serves NULL
    # type conflict refuses
    with pytest.raises(ValueError, match="type mismatch"):
        dt.append(
            spark.createDataFrame([(3, 1.0)], "k int, s double"),
            merge_schema=True,
        )
    # a batch may omit nullable columns: readers fill NULL
    dt.append(spark.createDataFrame([(7,)], "k int"))
    row = dt.read().filter("k = 7").first()
    assert row["s"] is None and row["n"] is None


# --------------------------- Z-ORDER -------------------------------


def test_zorder_improves_two_column_skipping(spark, tmp_path):
    n = 20_000
    df = spark.range(n).select(
        (F.col("id") % 100).alias("x"),
        (F.col("id") % 97).alias("y"),
        F.col("id").alias("payload"),
    )
    # linear layout: files ordered by rowid -> x,y stripes span files
    lin = DeltaLogTable(spark, str(tmp_path / "lin"))
    lin.overwrite(df.repartition(16))
    zord = DeltaLogTable(spark, str(tmp_path / "zord"))
    zord.overwrite(df.repartition(16))
    zord.optimize(target_files=16, zorder_by=["x", "y"])
    filters = [("x", "==", 7), ("y", "==", 13)]
    lin_files = len(lin.files_matching(filters))
    z_files = len(zord.files_matching(filters))
    assert z_files < lin_files, (z_files, lin_files)
    # and of course the answers agree
    a = sorted(r["payload"] for r in lin.read_filtered(filters).collect())
    b = sorted(r["payload"] for r in zord.read_filtered(filters).collect())
    assert a == b and a  # non-empty


def test_zorder_is_datachange_false_and_content_stable(spark, tmp_path):
    dt = _table(spark, tmp_path, "zstable", files=8)
    before = sorted(
        (r["k"], r["g"], float(r["v"])) for r in dt.read().collect()
    )
    dt.optimize(target_files=4, zorder_by=["k", "v"])
    after = sorted(
        (r["k"], r["g"], float(r["v"])) for r in dt.read().collect()
    )
    assert before == after
    hist = dt.history()[-1]
    assert hist["operation"] == "OPTIMIZE"
    with open(
        os.path.join(
            str(dt.location), "_delta_log", f"{hist['version']:020d}.json"
        )
    ) as f:
        acts = [json.loads(line) for line in f if line.strip()]
    assert all(
        not a["add"]["dataChange"] for a in acts if "add" in a
    )


# ------------------- lifecycle interactions ------------------------


def test_checkpoint_carries_dvs(spark, tmp_path):
    dt = _table(spark, tmp_path, "ckpt")
    dt.delete("g = 4", mode="dv")
    dt.write_checkpoint()
    dt.clean_log()
    fresh = DeltaLogTable(spark, str(tmp_path / "ckpt"))
    assert fresh.read().count() == 350
    assert fresh.read().filter("g = 4").count() == 0
    proto = fresh.current_protocol()
    assert "deletionVectors" in (proto.get("readerFeatures") or [])


def test_optimize_materializes_dvs_then_vacuum_drops_bins(
    spark, tmp_path
):
    dt = _table(spark, tmp_path, "purge")
    dt.delete("g = 6", mode="dv")
    live, _, _ = dt._replay()
    assert any(a.get("deletionVector") for a in live.values())
    dt.optimize(target_files=2)
    live2, _, _ = dt._replay()
    assert not any(a.get("deletionVector") for a in live2.values())
    assert dt.read().count() == 350
    removed = dt.vacuum()
    assert any(r.endswith(".bin") for r in removed)
    assert dt.read().count() == 350


def test_vacuum_keeps_live_dv_bins(spark, tmp_path):
    dt = _table(spark, tmp_path, "keepbins")
    dt.delete("g = 7", mode="dv")
    removed = dt.vacuum()
    assert not any(r.endswith(".bin") for r in removed)
    assert dt.read().filter("g = 7").count() == 0


def test_restore_across_dml(spark, tmp_path):
    dt = _table(spark, tmp_path, "restore")
    dt.delete("g = 0", mode="dv")       # v1
    dt.update("g = 1", {"v": "0.0"})    # v2
    dt.restore(1)                       # back to post-delete state
    assert dt.read().filter("g = 0").count() == 0
    assert dt.read().filter("g = 1 AND v = 0.0").count() == 0
    assert dt.read().count() == 350


def test_restore_past_dv_delete_resurrects_rows(spark, tmp_path):
    """ADVICE r9: a DV-mode DELETE re-adds the SAME path with a
    deletionVector descriptor, so restore must diff full add actions —
    a path-set diff emits an empty RESTORE and rows stay deleted."""
    dt = _table(spark, tmp_path, "dvrestore", files=2, n=10)
    assert dt.read().count() == 10
    dt.delete("k < 3", mode="dv")       # v1: same paths, +DV
    assert dt.read().count() == 7
    dt.restore(0)                       # v2: must re-point at DV-free adds
    assert dt.read().count() == 10
    # the restore commit is non-empty and itself time-travel-able
    live, _, head = dt._replay()
    assert head == 2
    assert not any(a.get("deletionVector") for a in live.values())
    assert dt.read(version=1).count() == 7


# ---------------------------- MERGE INTO ----------------------------


def test_merge_into_full_clause_set(spark, tmp_path):
    dt = DeltaLogTable(spark, str(tmp_path / "merge"))
    dt.overwrite(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
            "k int, name string, v double",
        ).repartition(2)
    )
    src = spark.createDataFrame(
        [(2, "B", 200.0), (4, "DEL", 0.0), (9, "new", 90.0),
         (None, "nullkey", 1.0)],
        "k int, name string, v double",
    )
    rep = dt.merge_into(
        src, ["k"],
        when_matched_update={"name": "s.name", "v": "t.v + s.v"},
        when_matched_delete="s.name = 'DEL'",
    )
    assert rep["rows_deleted"] == 1
    assert rep["rows_updated"] == 1
    assert rep["rows_inserted"] == 2  # unmatched key + NULL key
    rows = {r["k"]: (r["name"], r["v"]) for r in dt.read().collect()}
    assert rows[1] == ("a", 10.0)          # untouched row intact
    assert rows[2] == ("B", 220.0)         # update RHS saw OLD t.v
    assert 4 not in rows                   # matched-delete clause
    assert rows[9] == ("new", 90.0)
    assert rows[None] == ("nullkey", 1.0)  # NULL merge key inserts
    # time travel across the MERGE
    assert dt.read(version=0).count() == 4


def test_merge_into_refuses_ambiguous_source(spark, tmp_path):
    dt = DeltaLogTable(spark, str(tmp_path / "dup"))
    dt.overwrite(spark.createDataFrame([(1, 1.0)], "k int, v double"))
    src = spark.createDataFrame(
        [(1, 2.0), (1, 3.0)], "k int, v double"
    )
    with pytest.raises(ValueError, match="multiple source rows"):
        dt.merge_into(src, ["k"], when_matched_update={"v": "s.v"})


def test_merge_into_insert_only_and_noop(spark, tmp_path):
    dt = DeltaLogTable(spark, str(tmp_path / "insonly"))
    dt.overwrite(spark.createDataFrame([(1, 1.0)], "k int, v double"))
    rep = dt.merge_into(
        spark.createDataFrame([(5, 5.0)], "k int, v double"), ["k"]
    )
    assert rep["rows_inserted"] == 1 and rep["files_rewritten"] == 0
    # everything matched / nothing enabled -> no empty commit
    v = dt._replay()[2]
    rep2 = dt.merge_into(
        spark.createDataFrame([(5, 9.0)], "k int, v double"),
        ["k"], insert_unmatched=False,
    )
    assert rep2["version"] is None and dt._replay()[2] == v


def test_merge_insert_fills_missing_columns_with_null(spark, tmp_path):
    dt = DeltaLogTable(spark, str(tmp_path / "missing"))
    dt.overwrite(
        spark.createDataFrame([(1, "x", 0.5)], "k int, s string, v double")
    )
    rep = dt.merge_into(
        spark.createDataFrame([(7, 7.0)], "k int, v double"), ["k"]
    )
    assert rep["rows_inserted"] == 1
    row = dt.read().filter("k = 7").first()
    assert row["s"] is None and row["v"] == 7.0


# ----------------------- TIMESTAMP AS OF -----------------------------


def test_timestamp_time_travel(spark, tmp_path):
    import os
    import time as _time

    dt = DeltaLogTable(spark, str(tmp_path / "ts"))
    dt.overwrite(spark.range(10).selectExpr("id AS k"))
    # pin distinct mtimes without sleeping: backdate commit 0
    c0 = os.path.join(str(tmp_path / "ts"), "_delta_log",
                      f"{0:020d}.json")
    t0 = _time.time() - 100
    os.utime(c0, (t0, t0))
    dt.append(spark.range(10, 15).selectExpr("id AS k"))
    mid_ms = int((t0 + 50) * 1000)
    assert dt.version_at_timestamp(mid_ms) == 0
    assert dt.read_as_of_timestamp(mid_ms).count() == 10
    now_ms = int((_time.time() + 5) * 1000)
    assert dt.version_at_timestamp(now_ms) == 1
    with pytest.raises(ValueError, match="no commit"):
        dt.version_at_timestamp(int((t0 - 10) * 1000))


def test_dv_tables_refuse_raw_file_exports(spark, tmp_path):
    """Surfaces that hand raw parquet paths to DV-unaware readers
    (symlink manifests, Iceberg adoption) must refuse while DVs are
    live, and work again after optimize() materializes them."""
    from emr_on_eks_hudi_iceberg_delta_spark.sources.convert import (
        convert_delta_to_iceberg,
    )

    dt = _table(spark, tmp_path, "export")
    dt.delete("g = 2", mode="dv")
    with pytest.raises(ValueError, match="deletion vectors|DVs"):
        dt.generate_symlink_manifest()
    with pytest.raises(ValueError, match="deletion vectors"):
        convert_delta_to_iceberg(
            spark, dt.location, str(tmp_path / "adopted")
        )
    dt.optimize(target_files=2)  # PURGE
    dt.generate_symlink_manifest()  # now fine
    t = convert_delta_to_iceberg(
        spark, dt.location, str(tmp_path / "adopted2")
    )
    assert t.read().count() == 350


def test_partitioned_optimize_compacts_selectively(spark, tmp_path):
    import collections

    dt = DeltaLogTable(spark, str(tmp_path / "popt"))
    df = spark.range(300).selectExpr(
        "id AS k", "CAST(id % 3 AS STRING) AS p"
    )
    dt.overwrite(df, partition_by=["p"])
    dt.append(df.filter("k < 50"))  # p=0/1/2 gain a 2nd file
    before = sorted((r["k"], r["p"]) for r in dt.read().collect())
    dt.optimize()
    live, _, _ = dt._replay()
    per_part = collections.Counter(
        tuple(a["partitionValues"].items()) for a in live.values()
    )
    assert all(v == 1 for v in per_part.values())  # bin-packed
    assert sorted(
        (r["k"], r["p"]) for r in dt.read().collect()
    ) == before
    v = dt._replay()[2]
    dt.optimize()  # already compact: no empty commit
    assert dt._replay()[2] == v
    # a DV on a partitioned table is materialized by optimize
    dt.delete("k = 7", mode="dv")
    dt.optimize()
    assert not any(
        a.get("deletionVector") for a in dt._replay()[0].values()
    )
    assert dt.read().filter("k = 7").count() == 0
    with pytest.raises(ValueError, match="ZORDER"):
        dt.optimize(zorder_by=["k"])


def test_zorder_supports_strings_and_dates(spark, tmp_path):
    dt = DeltaLogTable(spark, str(tmp_path / "zmix"))
    df = spark.range(20000).selectExpr(
        "id AS k",
        "concat('cust-', lpad(CAST(id % 500 AS STRING), 4, '0')) AS code",
        "date_add(DATE '2024-01-01', CAST(id % 365 AS INT)) AS d",
    )
    dt.overwrite(df.repartition(16))
    before = len(dt.files_matching([("code", "==", "cust-0123")]))
    dt.optimize(target_files=16, zorder_by=["code", "d"])
    after = len(dt.files_matching([("code", "==", "cust-0123")]))
    assert after < before  # string-column skipping engaged
    assert dt.read_filtered([("code", "==", "cust-0123")]).count() == 40
    datef = [("d", ">=", "2024-02-01"), ("d", "<", "2024-02-08")]
    assert len(dt.files_matching(datef)) < 16
    assert (
        dt.read_filtered(datef).count()
        == df.filter("d >= '2024-02-01' AND d < '2024-02-08'").count()
    )
    # unsupported types refuse instead of silently not clustering
    dt2 = DeltaLogTable(spark, str(tmp_path / "zbad"))
    dt2.overwrite(spark.range(10).selectExpr("id AS k", "array(id) AS arr"))
    with pytest.raises(ValueError, match="ZORDER BY column"):
        dt2.optimize(zorder_by=["arr"])


def test_vacuum_retention_and_dry_run(spark, tmp_path):
    import os as _os
    import time as _time

    dt = _table(spark, tmp_path, "vac", files=2)
    dt.optimize(target_files=1)  # old files become unreferenced
    # dry run lists without deleting
    would = dt.vacuum(dry_run=True)
    assert would
    live, _, _ = dt._replay()
    assert all(
        _os.path.exists(_os.path.join(dt.location, p)) for p in would
    )
    # retention window: fresh files survive a retain-1h vacuum
    assert dt.vacuum(retain_hours=1.0) == []
    # backdate them past the window -> reclaimed
    for rel in would:
        full = _os.path.join(dt.location, rel)
        t0 = _time.time() - 7200
        _os.utime(full, (t0, t0))
    removed = dt.vacuum(retain_hours=1.0)
    assert removed == would
    assert dt.read().count() == 400


def test_dv_protocol_upgrade_preserves_active_features(spark, tmp_path):
    """ADVICE r9: the (3,7) upgrade must list ALL active table
    features — legacy-implied writer features carry forward and
    changeDataFeed is declared when the property is set."""
    dt = _table(spark, tmp_path, "dvproto", files=2, n=20)
    dt.set_table_properties({"delta.enableChangeDataFeed": "true"})
    dt.delete("k < 3", mode="dv")
    proto = dt.current_protocol()
    assert proto["minReaderVersion"] == 3
    assert proto["minWriterVersion"] == 7
    assert "deletionVectors" in proto["readerFeatures"]
    w = set(proto["writerFeatures"])
    # legacy minWriterVersion=2 implies appendOnly+invariants; CDF on
    assert {"deletionVectors", "appendOnly", "invariants",
            "changeDataFeed"} <= w


def test_dv_delete_builds_bitmaps_executor_side(
    spark, tmp_path, monkeypatch
):
    """r10 pin, r12 scope: ABOVE broadcast-grade cardinality no
    position list crosses the driver (below it the anti-join's own
    BroadcastExchange materializes every pair on the driver anyway, so
    dv_pairs_df expands there directly — equivalence pinned in
    test_dv_pairs_driver_expansion_matches_executor). Thresholds are
    forced to 0 here so the scale path is what executes: the roaring
    build (write_dv) and prior-DV merge (read_dv) must then run in
    Python WORKER processes — a call from the driver's own PID fails
    the delete (the poisoned wrappers ship to workers too, where the
    PID check lets the real codec run)."""
    from emr_on_eks_hudi_iceberg_delta_spark.sources import delta_dml

    monkeypatch.setattr(dv_io, "DV_DRIVER_EXPAND_MAX_PAIRS", 0)
    monkeypatch.setattr(delta_dml, "DV_BROADCAST_MAX_PAIRS", 0)
    driver_pid = os.getpid()
    real_write, real_read = dv_io.write_dv, dv_io.read_dv

    def write_guard(*a, **k):
        if os.getpid() == driver_pid:
            raise AssertionError("DV bitmap built on the driver")
        return real_write(*a, **k)

    def read_guard(*a, **k):
        if os.getpid() == driver_pid:
            raise AssertionError("DV positions read on the driver")
        return real_read(*a, **k)

    monkeypatch.setattr(dv_io, "write_dv", write_guard)
    monkeypatch.setattr(dv_io, "read_dv", read_guard)
    dt = _table(spark, tmp_path, "execside", files=3, n=300)
    rep = dt.delete("k < 100", mode="dv")
    assert rep["rows_deleted"] == 100
    rep2 = dt.delete("k < 150", mode="dv")  # merges prior DVs too
    assert rep2["rows_deleted"] == 50
    assert dt.read().count() == 150


def test_dv_pairs_driver_expansion_matches_executor(
    spark, tmp_path, monkeypatch
):
    """r12: the under-threshold driver-side DV pair expansion emits
    exactly the pairs the executor-side mapInPandas path emits."""
    dt = _table(spark, tmp_path, "dvpairs", files=3, n=300)
    dt.delete("k % 3 = 0", mode="dv")
    live, _meta, _ = dt._replay()
    dvd = [a for a in live.values() if a.get("deletionVector")]
    assert dvd
    drv = sorted(
        map(tuple, dv_io.dv_pairs_df(spark, dt.location, dvd).collect())
    )
    monkeypatch.setattr(dv_io, "DV_DRIVER_EXPAND_MAX_PAIRS", 0)
    ex = sorted(
        map(tuple, dv_io.dv_pairs_df(spark, dt.location, dvd).collect())
    )
    assert drv == ex and len(drv) == 100


def test_dml_scan_plans_bounded_file_scans(spark, tmp_path):
    """r10 pin: a many-file table's DML positional scan plans
    O(partition tuples) parquet scans, not O(files)."""
    from emr_on_eks_hudi_iceberg_delta_spark.plans import file_scan_count
    from emr_on_eks_hudi_iceberg_delta_spark.sources.delta_dml import (
        _scan_with_pos,
    )

    dt = DeltaLogTable(spark, str(tmp_path / "manyfiles"))
    dt.overwrite(
        spark.range(4000).selectExpr("id AS k", "id % 5 AS g")
        .repartition(100)
    )
    live, meta, _ = dt._replay()
    assert len(live) == 100
    scan = _scan_with_pos(dt, list(live.values()), meta)
    # unpartitioned table: ONE multi-path scan + the tiny name-map
    # side (an in-memory LocalTableScan, not a file scan)
    assert file_scan_count(scan) <= 2
    # and the scan is still correct
    assert scan.count() == 4000
    assert scan.select("__file").distinct().count() == 100


def test_dv_antijoin_shuffles_above_broadcast_threshold(
    spark, tmp_path, monkeypatch
):
    """r10 pin: past DV_BROADCAST_MAX_PAIRS total cardinality the DV
    read anti-join switches from broadcast to a shuffled join."""
    from emr_on_eks_hudi_iceberg_delta_spark.plans import (
        broadcast_join_count,
        formatted_plan,
    )
    from emr_on_eks_hudi_iceberg_delta_spark.sources import delta_dml

    dt = _table(spark, tmp_path, "bigdv", files=2, n=200)
    dt.delete("k % 2 = 0", mode="dv")
    monkeypatch.setattr(delta_dml, "DV_BROADCAST_MAX_PAIRS", 10)
    df = dt.read()
    plan = formatted_plan(df)
    assert "LeftAnti" in plan
    assert broadcast_join_count(df) == 0  # no broadcast above cutoff
    assert sorted(r["k"] for r in df.collect()) == list(range(1, 200, 2))


def test_dv_mode_update_rewrites_no_old_file(spark, tmp_path):
    """r10: UPDATE mode='dv' — matched rows are deletion-vectored in
    place and their SET-applied copies land as fresh files, one
    commit, zero pre-update files rewritten."""
    dt = _table(spark, tmp_path, "dvupd", files=3, n=300)
    live0, _, _ = dt._replay()
    rep = dt.update("g = 2", {"v": "v + 1000"}, mode="dv")
    assert rep["rows_updated"] == 38  # 300 rows, g = k % 8 == 2
    live1, _, _ = dt._replay()
    # every old path still live (now DV-bearing) + fresh update files
    assert set(live0) <= set(live1)
    assert any(
        live1[p].get("deletionVector") for p in live0
    )
    # values: g=2 rows moved, others untouched; count conserved
    assert dt.read().count() == 300
    assert dt.read().filter("g = 2 AND v < 1000").count() == 0
    assert dt.read().filter("g = 2").count() == 38
    exp = sorted(
        (r["k"], r["v"] + (1000 if r["g"] == 2 else 0))
        for r in dt.read(version=0).collect()
    )
    assert sorted((r["k"], r["v"]) for r in dt.read().collect()) == exp
    # SET sees the OLD row; a second dv update composes with prior DVs
    rep2 = dt.update("g = 2 AND v < 1010", {"v": "0.0"}, mode="dv")
    assert rep2["version"] == 2
    assert dt.read().count() == 300


def test_dv_mode_update_cdf_images(spark, tmp_path):
    dt = _table(spark, tmp_path, "dvupdcdf", files=2, n=40)
    dt.set_table_properties({"delta.enableChangeDataFeed": "true"})
    dt.update("k < 5", {"v": "v * 2"}, mode="dv")
    ch = dt.table_changes(2, 2)
    kinds = {r["_change_type"] for r in ch.collect()}
    assert kinds == {"update_preimage", "update_postimage"}
    assert ch.count() == 10


def test_dv_read_plans_bounded_scans_many_files(spark, tmp_path):
    """r11 pin: a read over MANY DV-bearing files plans one multi-path
    scan per partition tuple (+ the executor-side pair expansion), not
    O(files) per-file plan pieces — mirroring the r10 DML-scan fix."""
    from emr_on_eks_hudi_iceberg_delta_spark.plans import file_scan_count

    dt = _table(spark, tmp_path, "manydv", files=40, n=4000)
    dt.delete("k % 2 = 0", mode="dv")  # every file gets a DV
    live, _, _ = dt._replay()
    assert sum(1 for a in live.values() if a.get("deletionVector")) == 40
    df = dt.read()
    assert file_scan_count(df) <= 2  # one data scan (+ pair expansion)
    assert df.count() == 2000
    assert df.filter("k % 2 = 0").count() == 0
