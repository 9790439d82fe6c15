"""DeltaLogTable (sources/delta_log.py): protocol-correct JSON action
log + parquet data — snapshot reads, time travel, partition-value
injection, metadata pruning, and log-file shape (one JSON per commit,
replayable by any protocol-v1 Delta reader)."""

import json
import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emr_on_eks_hudi_iceberg_delta_spark.sources.delta_log import DeltaLogTable


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_overwrite_append_read_roundtrip(spark, tmp_path):
    dt = DeltaLogTable(spark, str(tmp_path / "t1"))
    a = spark.range(10).selectExpr("id", "id * 2 AS v")
    b = spark.range(10, 15).selectExpr("id", "id * 2 AS v")
    dt.overwrite(a)
    assert _rows(dt.read()) == _rows(a)
    dt.append(b)
    assert _rows(dt.read()) == _rows(a.unionByName(b))
    # time travel: version 0 is the pre-append snapshot
    assert _rows(dt.read(version=0)) == _rows(a)
    hist = dt.history()
    assert [h["version"] for h in hist] == [0, 1]
    assert hist[1]["n_removed"] == 0 and hist[1]["n_added"] >= 1


def test_overwrite_removes_prior_files(spark, tmp_path):
    dt = DeltaLogTable(spark, str(tmp_path / "t2"))
    dt.overwrite(spark.range(5).selectExpr("id"))
    dt.overwrite(spark.range(100, 103).selectExpr("id"))
    assert _rows(dt.read()) == [(100,), (101,), (102,)]
    assert _rows(dt.read(version=0)) == [(i,) for i in range(5)]
    hist = dt.history()
    assert hist[1]["n_removed"] >= 1  # remove actions emitted


def test_partitioned_table_injects_typed_partition_columns(
    spark, tmp_path
):
    dt = DeltaLogTable(spark, str(tmp_path / "t3"))
    df = spark.createDataFrame(
        [(1, 10, "x"), (2, 10, "y"), (3, 20, "z")],
        "id bigint, bucket int, payload string",
    )
    dt.overwrite(df, partition_by=["bucket"])
    got = dt.read()
    assert dict(got.dtypes)["bucket"] == "int"  # typed, not string
    assert _rows(got.select("id", "bucket", "payload")) == _rows(df)
    # the data files must NOT contain the partition column (protocol)
    import pyarrow.parquet as pq

    root = str(tmp_path / "t3")
    data_files = [
        os.path.join(r, f)
        for r, _, fs in os.walk(root)
        for f in fs
        if f.endswith(".parquet") and "_delta_log" not in r
    ]
    assert data_files
    for p in data_files:
        assert "bucket" not in pq.read_schema(p).names


def test_partition_pruning_is_metadata_only(spark, tmp_path):
    dt = DeltaLogTable(spark, str(tmp_path / "t4"))
    df = spark.range(100).selectExpr(
        "id", "CAST(id % 4 AS INT) AS cell"
    )
    dt.overwrite(df, partition_by=["cell"])
    pruned = dt.read_where(lambda pv: pv["cell"] == "2")
    rows = pruned.collect()
    assert len(rows) == 25 and all(r["cell"] == 2 for r in rows)
    # the scan lists exactly the one partition's files
    files = pruned.inputFiles()
    assert files and all("cell=2" in f for f in files)


def test_log_is_protocol_shaped_json(spark, tmp_path):
    """The on-disk log must be replayable by ANY protocol-v1 reader:
    one newline-delimited JSON file per commit with protocol/metaData/
    add actions carrying the spec's required fields."""
    dt = DeltaLogTable(spark, str(tmp_path / "t5"))
    dt.overwrite(spark.range(3).selectExpr("id"))
    log0 = str(tmp_path / "t5" / "_delta_log" / f"{0:020d}.json")
    actions = [json.loads(line) for line in open(log0) if line.strip()]
    kinds = [next(iter(a)) for a in actions]
    assert "protocol" in kinds and "metaData" in kinds and "add" in kinds
    proto = next(a["protocol"] for a in actions if "protocol" in a)
    assert proto == {"minReaderVersion": 1, "minWriterVersion": 2}
    meta = next(a["metaData"] for a in actions if "metaData" in a)
    assert meta["format"] == {"provider": "parquet", "options": {}}
    schema = json.loads(meta["schemaString"])
    assert schema["type"] == "struct"
    for a in actions:
        if "add" in a:
            add = a["add"]
            assert set(add) >= {
                "path", "partitionValues", "size",
                "modificationTime", "dataChange",
            }
            assert os.path.exists(
                os.path.join(str(tmp_path / "t5"), add["path"])
            )


def test_reader_refuses_higher_protocol(spark, tmp_path):
    import pytest

    dt = DeltaLogTable(spark, str(tmp_path / "t6"))
    dt.overwrite(spark.range(3).selectExpr("id"))
    # reader v3 demanding a feature this reader lacks → refuse
    log1 = str(tmp_path / "t6" / "_delta_log" / f"{1:020d}.json")
    with open(log1, "w") as f:
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["typeWidening"],
        }}) + "\n")
    with pytest.raises(ValueError, match="typeWidening"):
        dt.read()
    # reader v2 (legacy columnMapping era) → supported since r10
    with open(log1, "w") as f:
        f.write(json.dumps({"protocol": {"minReaderVersion": 2,
                                         "minWriterVersion": 5}}) + "\n")
    assert dt.read().count() == 3
    # reader v3 whose features we DO implement → read fine
    with open(log1, "w") as f:
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors", "columnMapping"],
        }}) + "\n")
    assert dt.read().count() == 3


def test_null_partition_value_roundtrip(spark, tmp_path):
    dt = DeltaLogTable(spark, str(tmp_path / "t7"))
    df = spark.createDataFrame(
        [(1, "a"), (2, None)], "id bigint, grp string"
    )
    dt.overwrite(df, partition_by=["grp"])
    assert _rows(dt.read().select("id", "grp")) == [(1, "a"), (2, None)]


def test_optimize_compacts_without_changing_rows(spark, tmp_path):
    dt = DeltaLogTable(spark, str(tmp_path / "t8"))
    df = spark.range(100).selectExpr("id", "id * 3 AS v").repartition(8)
    dt.overwrite(df)
    before = _rows(dt.read())
    n_files_before = len(dt.read().inputFiles())
    assert n_files_before > 1
    dt.optimize(target_files=1)
    assert len(dt.read().inputFiles()) == 1
    assert _rows(dt.read()) == before  # identical contents
    # the compaction commit is flagged dataChange=false throughout
    log1 = str(tmp_path / "t8" / "_delta_log" / f"{1:020d}.json")
    for line in open(log1):
        a = json.loads(line)
        if "add" in a:
            assert a["add"]["dataChange"] is False
        if "remove" in a:
            assert a["remove"]["dataChange"] is False
    # pre-compaction version still time-travels (files not yet vacuumed)
    assert _rows(dt.read(version=0)) == before


def test_vacuum_deletes_only_unreferenced_files(spark, tmp_path):
    dt = DeltaLogTable(spark, str(tmp_path / "t9"))
    dt.overwrite(spark.range(50).selectExpr("id").repartition(4))
    dt.optimize(target_files=1)
    live_before = set(dt.read().inputFiles())
    deleted = dt.vacuum()
    assert len(deleted) >= 1
    assert set(dt.read().inputFiles()) == live_before  # head unharmed
    assert _rows(dt.read()) == [(i,) for i in range(50)]


def test_append_idempotent_skips_replayed_batch(spark, tmp_path):
    dt = DeltaLogTable(spark, str(tmp_path / "t10"))
    b0 = spark.range(5).selectExpr("id")
    b1 = spark.range(5, 8).selectExpr("id")
    assert dt.append_idempotent(b0, "appA", 0) is True
    assert dt.append_idempotent(b1, "appA", 1) is True
    # replay of batch 1 (restart redelivery) must be a no-op
    assert dt.append_idempotent(b1, "appA", 1) is False
    assert dt.append_idempotent(b0, "appA", 0) is False
    assert _rows(dt.read()) == [(i,) for i in range(8)]
    assert dt.txn_versions() == {"appA": 1}
    # a DIFFERENT app's version counter is independent
    assert dt.append_idempotent(
        spark.range(100, 101).selectExpr("id"), "appB", 0
    ) is True
    assert dt.txn_versions() == {"appA": 1, "appB": 0}


def test_stream_to_delta_log_exactly_once(spark, tmp_path):
    """availableNow stream into the protocol table: rerunning the SAME
    stream over the SAME checkpoint re-delivers nothing, and rerunning
    with a FRESH checkpoint (forcing batch replay) is absorbed by the
    txn guard — the table never double-counts."""
    from emr_on_eks_hudi_iceberg_delta_spark.sources.delta_log import (
        stream_to_delta_log,
    )

    src_dir = str(tmp_path / "src")
    spark.range(20).selectExpr("id").write.parquet(src_dir)
    stream = spark.readStream.schema("id bigint").parquet(src_dir)
    loc = str(tmp_path / "t11")
    q = stream_to_delta_log(
        stream, loc, "job1", str(tmp_path / "ckpt1")
    )
    q.awaitTermination(60)
    dt = DeltaLogTable(spark, loc)
    assert dt.read().count() == 20
    # fresh checkpoint -> source replays batch 0 -> txn guard absorbs it
    q2 = stream_to_delta_log(
        spark.readStream.schema("id bigint").parquet(src_dir),
        loc, "job1", str(tmp_path / "ckpt2"),
    )
    q2.awaitTermination(60)
    assert dt.read().count() == 20  # no double-count


def test_checkpoint_and_log_cleanup(spark, tmp_path):
    """Real Delta tables expire old JSON behind a parquet checkpoint;
    the reader must replay checkpoint + JSON suffix and refuse loudly
    when neither path can reconstruct a requested version."""
    import pytest

    dt = DeltaLogTable(spark, str(tmp_path / "t12"))
    dt.overwrite(spark.range(5).selectExpr("id"))
    dt.append(spark.range(5, 8).selectExpr("id"))
    dt.append(spark.range(8, 10).selectExpr("id"))
    v = dt.write_checkpoint()
    assert v == 2 and dt.last_checkpoint_version() == 2
    dt.append(spark.range(10, 12).selectExpr("id"))
    removed = dt.clean_log()
    assert removed  # early JSON expired
    # head read goes checkpoint + suffix
    assert _rows(dt.read()) == [(i,) for i in range(12)]
    assert _rows(dt.read(version=2)) == [(i,) for i in range(10)]
    # version below the checkpoint is gone with the JSON: loud refusal
    with pytest.raises(ValueError, match="truncated"):
        dt.read(version=0)
    # appends still work from checkpoint-seeded state
    dt.append(spark.range(12, 13).selectExpr("id"))
    assert _rows(dt.read()) == [(i,) for i in range(13)]


def test_checkpoint_preserves_txn_bookkeeping(spark, tmp_path):
    """Idempotent-writer state must survive log cleanup via the
    checkpoint's txn rows — otherwise a replayed batch would
    double-count after retention kicked in."""
    dt = DeltaLogTable(spark, str(tmp_path / "t13"))
    dt.append_idempotent(spark.range(5).selectExpr("id"), "app", 0)
    dt.append_idempotent(spark.range(5, 8).selectExpr("id"), "app", 1)
    dt.write_checkpoint()
    dt.append(spark.range(8, 9).selectExpr("id"))
    dt.clean_log()
    assert dt.txn_versions() == {"app": 1}
    # the replay of batch 1 is still recognized post-cleanup
    assert dt.append_idempotent(
        spark.range(5, 8).selectExpr("id"), "app", 1
    ) is False
    assert dt.read().count() == 9


def test_checkpoint_partitioned_table(spark, tmp_path):
    dt = DeltaLogTable(spark, str(tmp_path / "t14"))
    df = spark.range(40).selectExpr("id", "CAST(id % 2 AS INT) AS p")
    dt.overwrite(df, partition_by=["p"])
    dt.write_checkpoint()
    dt.clean_log()  # keeps only the newest json + checkpoint
    got = dt.read()
    assert got.count() == 40 and dict(got.dtypes)["p"] == "int"
    pruned = dt.read_where(lambda pv: pv["p"] == "1")
    assert pruned.count() == 20


def test_symlink_manifest_from_protocol_table(spark, tmp_path):
    """The reference's GENERATE symlink_format_manifest call, served
    from the protocol table: the manifest lists exactly the LIVE files
    and a plain parquet read of those URIs equals the snapshot."""
    dt = DeltaLogTable(spark, str(tmp_path / "t15"))
    dt.overwrite(spark.range(20).selectExpr("id").repartition(3))
    dt.append(spark.range(20, 25).selectExpr("id"))
    base = dt.generate_symlink_manifest()
    uris = [
        line.strip()
        for line in open(os.path.join(base, "manifest"))
    ]
    assert uris == sorted(uris) and all(u.startswith("file:") for u in uris)
    paths = [u[len("file:"):] for u in uris]
    # manifest lists exactly the live snapshot's files
    live = {f.split("file:")[-1].lstrip("/") for f in dt.read().inputFiles()}
    assert {p.lstrip("/") for p in paths} == live
    got = sorted(map(tuple, spark.read.parquet(*paths).collect()))
    assert got == _rows(dt.read())
    # partitioned: one manifest per partition dir
    dp = DeltaLogTable(spark, str(tmp_path / "t16"))
    dp.overwrite(
        spark.range(10).selectExpr("id", "CAST(id % 2 AS INT) AS p"),
        partition_by=["p"],
    )
    base2 = dp.generate_symlink_manifest()
    assert os.path.exists(os.path.join(base2, "p=0", "manifest"))
    assert os.path.exists(os.path.join(base2, "p=1", "manifest"))


def test_stats_based_file_skipping(spark, tmp_path):
    """Add actions carry the protocol's per-file stats JSON (folded
    from parquet footers, metadata-only); read_filtered prunes files
    whose min/max prove the predicate cannot match, and the result
    equals an unpruned filtered read exactly."""
    dt = DeltaLogTable(spark, str(tmp_path / "t17"))
    # 4 files with disjoint id ranges (repartitionByRange -> sorted files)
    df = spark.range(400).selectExpr("id", "id % 7 AS v")
    dt.overwrite(df.repartitionByRange(4, "id"))
    live, _, _ = dt._replay()
    assert all("stats" in a for a in live.values())
    st = json.loads(next(iter(live.values()))["stats"])
    assert set(st) >= {"numRecords", "minValues", "maxValues", "nullCount"}

    pruned = dt.read_filtered([("id", ">=", 350)])
    want = sorted((i, i % 7) for i in range(350, 400))
    assert _rows(pruned) == want
    # the scan touched only the file(s) whose range can match
    assert len(pruned.inputFiles()) < 4

    eq = dt.read_filtered([("id", "==", 13)])
    assert _rows(eq) == [(13, 6)]
    assert len(eq.inputFiles()) == 1

    # files without stats are never pruned (skip-safety)
    for a in live.values():
        a.pop("stats", None)
    # simulate a stats-less table via a fresh write with stats stripped
    dt2 = DeltaLogTable(spark, str(tmp_path / "t18"))
    dt2.overwrite(df.repartitionByRange(4, "id"))
    log0 = str(tmp_path / "t18" / "_delta_log" / f"{0:020d}.json")
    lines = []
    for line in open(log0):
        a = json.loads(line)
        if "add" in a:
            a["add"].pop("stats", None)
        lines.append(json.dumps(a))
    open(log0, "w").write("\n".join(lines) + "\n")
    noskip = dt2.read_filtered([("id", ">=", 350)])
    assert _rows(noskip) == want
    assert len(noskip.inputFiles()) == 4  # nothing pruned, still exact


def test_stats_survive_checkpoint(spark, tmp_path):
    dt = DeltaLogTable(spark, str(tmp_path / "t19"))
    dt.overwrite(
        spark.range(100).selectExpr("id").repartitionByRange(4, "id")
    )
    dt.write_checkpoint()
    dt.append(spark.range(100, 110).selectExpr("id"))
    dt.clean_log()
    pruned = dt.read_filtered([("id", "<", 10)])
    assert sorted(r["id"] for r in pruned.collect()) == list(range(10))
    assert len(pruned.inputFiles()) <= 2  # checkpoint kept the stats


def test_restore_rolls_back_without_rewriting_history(spark, tmp_path):
    dt = DeltaLogTable(spark, str(tmp_path / "t20"))
    dt.overwrite(spark.range(5).selectExpr("id"))
    dt.append(spark.range(5, 8).selectExpr("id"))
    dt.overwrite(spark.range(100, 103).selectExpr("id"))
    dt.restore(1)
    assert _rows(dt.read()) == [(i,) for i in range(8)]
    # history intact: the bad overwrite still time-travels
    assert _rows(dt.read(version=2)) == [(100,), (101,), (102,)]
    hist = dt.history()
    assert hist[-1]["operation"] == "RESTORE"
    assert len(hist) == 4  # restore is a NEW version, not a rewrite
    # restore is itself restorable-from
    dt.restore(2)
    assert _rows(dt.read()) == [(100,), (101,), (102,)]


def test_decimal_column_write_and_stats_safe(spark, tmp_path):
    """r11 self-review fix: a DECIMAL column used to crash the whole
    stats dump (json.dumps on decimal.Decimal) — the write now
    succeeds, decimal min/max are OMITTED (omission is the only
    always-safe stats encoding), and other columns keep theirs."""
    import json as _json

    dt = DeltaLogTable(spark, str(tmp_path / "dec"))
    dt.overwrite(
        spark.range(50).selectExpr(
            "id AS k", "CAST(id AS DECIMAL(10,2)) * 1.5 AS amount"
        )
    )
    assert dt.read().count() == 50
    live, _, _ = dt._replay()
    stats = [_json.loads(a["stats"]) for a in live.values() if a.get("stats")]
    assert stats and all(s["numRecords"] > 0 for s in stats)
    assert all("amount" not in s["minValues"] for s in stats)
    assert any("k" in s["minValues"] for s in stats)


def test_v2_checkpoint_sidecars_roundtrip_and_reuse(spark, tmp_path):
    """r12 V2 checkpoints: add actions shard into content-addressed
    sidecars; replay through the checkpoint after clean_log is exact
    (adds, DVs, txns); re-checkpointing after a small commit rewrites
    only the churned buckets (written <= new files) and reuses the
    rest byte-for-byte; clean_log GCs unreferenced sidecars."""
    import glob
    import json as _json
    import os as _os

    from emr_on_eks_hudi_iceberg_delta_spark.sources import (  # noqa
        delta_dml,
    )

    loc = str(tmp_path / "v2")
    t = DeltaLogTable(spark, loc)
    t.overwrite(
        spark.range(100).selectExpr("id AS k", "id * 2 AS v")
        .repartition(8)
    )
    v = t.write_checkpoint(v2=True, sidecar_target_adds=3)
    lc = _json.load(
        open(_os.path.join(loc, "_delta_log", "_last_checkpoint"))
    )
    assert lc["v2"] and lc["sidecars"] >= 2
    assert "v2Checkpoint" in (
        t.current_protocol().get("readerFeatures") or []
    )
    t.append(
        spark.createDataFrame(
            [(999, 1)], "k bigint, v bigint"
        ).coalesce(1)
    )
    t.clean_log()
    # replay MUST seed from the v2 checkpoint now
    assert t.read().count() == 101
    assert sorted(
        r["k"] for r in t.read().filter("k > 500").collect()
    ) == [999]
    # small commit + re-checkpoint: bucket hysteresis keeps the
    # sharding stable, so at most the touched buckets rewrite
    n_live0 = len(t._replay()[0])
    t.append(
        spark.createDataFrame(
            [(1000, 2)], "k bigint, v bigint"
        ).coalesce(1)
    )
    n_added = len(t._replay()[0]) - n_live0 + 1  # + the 999 append
    t.write_checkpoint(v2=True, sidecar_target_adds=3)
    lc2 = _json.load(
        open(_os.path.join(loc, "_delta_log", "_last_checkpoint"))
    )
    assert lc2["buckets"] == lc["buckets"]
    # at most one churned bucket per appended file
    assert lc2["sidecarsWritten"] <= n_added
    assert lc2["sidecarsReused"] >= lc2["sidecars"] - n_added
    removed = t.clean_log()
    assert t.read().count() == 102
    # DVs round-trip through the checkpoint
    t.delete("k % 10 = 3", mode="dv")
    assert t.read().count() == 102 - 10
    t.write_checkpoint(v2=True, sidecar_target_adds=3)
    t.clean_log()
    assert t.read().count() == 92
    assert t.read().filter("k = 13").count() == 0
    # txn bookkeeping survives v2-checkpoint-seeded replay
    assert t.append_idempotent(
        spark.createDataFrame([(2000, 9)], "k bigint, v bigint"),
        "appA",
        1,
    )
    t.write_checkpoint(v2=True, sidecar_target_adds=3)
    t.clean_log()
    assert t.txn_versions().get("appA") == 1
    assert not t.append_idempotent(
        spark.createDataFrame([(2001, 9)], "k bigint, v bigint"),
        "appA",
        1,
    )  # replayed epoch skipped — the txn row rode the v2 top file
    # sidecar GC: only files referenced by remaining checkpoints live
    side = _os.path.join(loc, "_delta_log", "_sidecars")
    names = set(_os.listdir(side))
    referenced = set()
    for fn in _os.listdir(_os.path.join(loc, "_delta_log")):
        if ".checkpoint." in fn and fn.endswith(".parquet"):
            import pyarrow.parquet as pq

            tbl = pq.read_table(
                _os.path.join(loc, "_delta_log", fn)
            )
            if "sidecar" in tbl.schema.names:
                for s in tbl.column("sidecar").to_pylist():
                    if s:
                        referenced.add(
                            _os.path.basename(s["path"])
                        )
    assert names <= referenced
