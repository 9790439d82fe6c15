"""HudiCowTable (sources/hudi_layout.py): timeline replay, CoW file
slices, time travel, incremental pull, and touched-group-only rewrite."""

import json
import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emr_on_eks_hudi_iceberg_delta_spark.sources.hudi_layout import (
    HudiCowTable,
    HudiMorTable,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "id int, name string, ts bigint")


def _data(df):
    return sorted(
        (r["id"], r["name"], r["ts"])
        for r in df.select("id", "name", "ts").collect()
    )


def test_bulk_insert_upsert_snapshot(spark, tmp_path):
    t = HudiCowTable(
        spark, str(tmp_path / "h1"), record_key="id",
        precombine_field="ts", n_file_groups=3,
    )
    i0 = t.bulk_insert(_mk(spark, [(1, "a", 1), (2, "b", 1), (3, "c", 1)]))
    assert _data(t.read()) == [(1, "a", 1), (2, "b", 1), (3, "c", 1)]
    i1 = t.upsert(_mk(spark, [(2, "B2", 2), (4, "d", 2)]))
    assert _data(t.read()) == [
        (1, "a", 1), (2, "B2", 2), (3, "c", 1), (4, "d", 2)
    ]
    # time travel to the pre-upsert instant
    assert _data(t.read(instant=i0)) == [(1, "a", 1), (2, "b", 1), (3, "c", 1)]
    assert t.instants() == [i0, i1]


def test_precombine_keeps_newest_version(spark, tmp_path):
    t = HudiCowTable(
        spark, str(tmp_path / "h2"), record_key="id",
        precombine_field="ts", n_file_groups=2,
    )
    t.bulk_insert(_mk(spark, [(1, "new", 5)]))
    t.upsert(_mk(spark, [(1, "stale", 3)]))  # older ts must NOT win
    assert _data(t.read()) == [(1, "new", 5)]


def test_upsert_rewrites_only_touched_file_groups(spark, tmp_path):
    t = HudiCowTable(
        spark, str(tmp_path / "h3"), record_key="id",
        precombine_field="ts", n_file_groups=4,
    )
    t.bulk_insert(_mk(spark, [(i, f"n{i}", 1) for i in range(40)]))
    meta0 = t._commit_meta(t.instants()[0])
    groups0 = {s["fileId"] for s in meta0["partitionToWriteStats"][""]}
    t.upsert(_mk(spark, [(7, "X", 2)]))
    meta1 = t._commit_meta(t.instants()[-1])
    stats1 = meta1["partitionToWriteStats"][""]
    assert len(stats1) == 1  # one key -> one file group rewritten
    assert stats1[0]["fileId"] in groups0
    # untouched groups' ORIGINAL files still serve the snapshot
    slices = t._file_slices()
    old_instant, new_instant = t.instants()
    carried = [p for p in slices.values() if old_instant in p]
    assert len(carried) == len(groups0) - 1


def test_incremental_pull_is_exactly_the_delta(spark, tmp_path):
    t = HudiCowTable(
        spark, str(tmp_path / "h4"), record_key="id",
        precombine_field="ts", n_file_groups=2,
    )
    i0 = t.bulk_insert(_mk(spark, [(1, "a", 1), (2, "b", 1), (3, "c", 1)]))
    t.upsert(_mk(spark, [(2, "B2", 2), (4, "d", 2)]))
    inc = t.read_incremental(i0)
    # only the changed/new keys — carried rows in the rewritten slice
    # keep their old commit stamp and are filtered out
    assert _data(inc) == [(2, "B2", 2), (4, "d", 2)]
    assert t.read_incremental(t.instants()[-1]).count() == 0


def test_layout_is_hudi_shaped(spark, tmp_path):
    """On-disk contract: .hoodie/<instant>.commit JSON with
    partitionToWriteStats; base files named <fileId>_<token>_<instant>
    .parquet; _hoodie_* meta columns inside the data files."""
    import pyarrow.parquet as pq

    loc = str(tmp_path / "h5")
    t = HudiCowTable(
        spark, loc, record_key="id", precombine_field="ts",
        n_file_groups=2,
    )
    instant = t.bulk_insert(_mk(spark, [(1, "a", 1), (2, "b", 1)]))
    commits = [f for f in os.listdir(os.path.join(loc, ".hoodie"))
               if f.endswith(".commit")]
    assert commits == [f"{instant}.commit"]
    meta = json.load(open(os.path.join(loc, ".hoodie", commits[0])))
    assert "partitionToWriteStats" in meta
    for st in meta["partitionToWriteStats"][""]:
        assert st["path"].endswith(f"_{instant}.parquet")
        assert st["path"].startswith(st["fileId"] + "_")
        names = pq.read_schema(os.path.join(loc, st["path"])).names
        assert "_hoodie_commit_time" in names
        assert "_hoodie_record_key" in names
    # reopening from disk restores the table config
    t2 = HudiCowTable(spark, loc)
    assert t2.record_key == "id" and t2.n_file_groups == 2


def test_upsert_reads_only_touched_groups(spark, tmp_path, monkeypatch):
    """r10 pin: upsert tagging prunes at the FILE level off the
    timeline — an upsert whose keys hash into one group reads exactly
    that group's base file, not the whole table."""
    t = HudiCowTable(
        spark, str(tmp_path / "prune"), record_key="id",
        precombine_field="ts", n_file_groups=4,
    )
    t.bulk_insert(_mk(spark, [(i, f"n{i}", 1) for i in range(40)]))
    seen = {}
    real = HudiCowTable._read_slices

    def spy(self, slices, **kw):
        seen["n_files"] = len(slices)
        return real(self, slices, **kw)

    monkeypatch.setattr(HudiCowTable, "_read_slices", spy)
    # all updates share one key -> exactly one file group touched
    t.upsert(_mk(spark, [(8, "new8", 2)]))
    assert seen["n_files"] == 1
    got = {r["id"]: r["name"] for r in t.read().collect()}
    assert got[8] == "new8" and len(got) == 40


def test_bloom_index_skips_merge_join_for_new_keys(spark, tmp_path):
    """r10 pin: a batch of provably-new keys (bloom negative) takes
    the union fast path — results identical to the merge path, and
    the write stats carry key-range + bloom metadata."""
    t = HudiCowTable(
        spark, str(tmp_path / "bloom"), record_key="id",
        precombine_field="ts", n_file_groups=2,
    )
    t.bulk_insert(_mk(spark, [(i, f"n{i}", 1) for i in range(20)]))
    stats = t._latest_key_stats()
    assert set(stats) == {0, 1}
    assert all("bloom" in s and "minKey" in s for s in stats.values())
    # brand-new keys, far outside the stored key range
    may = t._consult_index(
        t._with_meta(
            _mk(spark, [(1000 + i, "x", 2) for i in range(10)]),
            "00000000000001", t._file_group_expr(),
        ),
        stats,
    )
    assert may and not any(may.values())  # provably absent everywhere
    # and EXISTING keys are always bloom-positive (no false negatives)
    may2 = t._consult_index(
        t._with_meta(
            _mk(spark, [(3, "y", 2)]), "00000000000002",
            t._file_group_expr(),
        ),
        stats,
    )
    assert any(may2.values())
    # end-to-end: insert-only upsert lands correctly, dedups the batch
    t.upsert(_mk(spark, [(500, "a", 1), (500, "b", 2), (501, "c", 1)]))
    got = {r["id"]: r["name"] for r in t.read().collect()}
    assert got[500] == "b" and got[501] == "c" and len(got) == 22
    # mixed batch (one existing + one new key) still exact
    t.upsert(_mk(spark, [(3, "upd3", 2), (777, "new", 1)]))
    got = {r["id"]: r["name"] for r in t.read().collect()}
    assert got[3] == "upd3" and got[777] == "new" and len(got) == 23


def test_read_pruned_skips_files_by_column_stats(spark, tmp_path):
    """r12 column-stats skipping (Hudi's metadata-table column_stats
    re-derived): commit write stats carry per-file footer min/max;
    read_pruned never lists slices whose ranges provably miss, and
    stats refresh when CoW rewrites a slice. The fixture builds v
    correlated with each key's HASH GROUP (the host router) so
    per-file ranges are tight — the data shape skipping serves."""
    t = HudiCowTable(
        spark, str(tmp_path / "cs"), record_key="k",
        precombine_field="v", n_file_groups=4,
    )
    rows = [
        (k, float(t._host_fg(k) * 1000 + k)) for k in range(100)
    ]
    t.bulk_insert(spark.createDataFrame(rows, "k long, v double"))
    full_files = set(t.read().inputFiles())
    assert len(full_files) == 4
    got = t.read_pruned([("v", ">=", 3000.0)])  # only group 3
    assert sorted(r["k"] for r in got.collect()) == sorted(
        k for k, v in rows if v >= 3000.0
    )
    assert len(set(got.inputFiles())) == 1  # three files skipped
    # CoW upsert rewrites a slice: its stats refresh, result exact
    some_k = next(k for k in range(100) if t._host_fg(k) == 0)
    t.upsert(
        spark.createDataFrame(
            [(some_k, 7777.0)], "k long, v double"
        )
    )
    hit = t.read_pruned([("v", ">=", 7000.0)])
    assert [(r["k"], r["v"]) for r in hit.collect()] == [
        (some_k, 7777.0)
    ]
    # conjunction that provably misses everything: empty, schema kept
    none = t.read_pruned([("v", ">", 1e12)])
    assert none.count() == 0
    assert set(none.columns) == set(t.read().columns)


def test_read_by_key_point_lookup_single_group(spark, tmp_path):
    """r12 read_by_key: the host-side md5 router sends each key to
    ITS hash group — a point lookup plans exactly one file; a key the
    group's key-range + bloom PROVES absent plans zero files."""
    t = HudiCowTable(
        spark, str(tmp_path / "pk"), record_key="k",
        precombine_field="v", n_file_groups=4,
    )
    t.bulk_insert(
        spark.createDataFrame(
            [(k, float(k)) for k in range(0, 200, 2)],
            "k long, v double",
        )
    )
    got = t.read_by_key([10])
    assert [(r["k"], r["v"]) for r in got.collect()] == [(10, 10.0)]
    assert len(set(got.inputFiles())) == 1  # one group's file only
    # two keys in different groups: at most two files
    ks = [10, 14]
    got2 = t.read_by_key(ks)
    assert sorted(r["k"] for r in got2.collect()) == ks
    assert len(set(got2.inputFiles())) <= 2
    # an absent key outside every range/bloom: zero files planned
    missing = t.read_by_key([99999])
    assert missing.count() == 0
    assert missing.inputFiles() == []


def test_mor_read_pruned_and_point_lookup(spark, tmp_path):
    """A MoR group with live log files can hold matching rows its
    base footer never saw — it must survive pruning, and point
    lookups on it read MERGED (log writes invalidate the group's
    bloom, so skipping never fires on it)."""
    t = HudiMorTable(
        spark, str(tmp_path / "morcs"), record_key="k",
        precombine_field="v", n_file_groups=2,
    )
    t.bulk_insert(
        spark.createDataFrame(
            [(k, float(k)) for k in range(20)], "k long, v double"
        )
    )
    # log-route a row whose v is far outside every base range
    t.upsert(
        spark.createDataFrame(
            [(3, 1_000_000.0)], "k long, v double"
        )
    )
    got = t.read_pruned([("v", ">=", 999_999.0)])
    assert [(r["k"], r["v"]) for r in got.collect()] == [
        (3, 1_000_000.0)
    ]
    # point lookup sees the LOG version (merged), not the base one
    pk = t.read_by_key([3])
    assert [(r["k"], r["v"]) for r in pk.collect()] == [
        (3, 1_000_000.0)
    ]
    # a brand-new key that lives only in a log file is found
    t.upsert(
        spark.createDataFrame([(500, 5.0)], "k long, v double")
    )
    assert [(r["k"], r["v"]) for r in t.read_by_key([500]).collect()] \
        == [(500, 5.0)]
    # compaction folds logs into fresh bases with fresh stats
    t.compact()
    got2 = t.read_pruned([("v", ">=", 999_999.0)])
    assert [(r["k"], r["v"]) for r in got2.collect()] == [
        (3, 1_000_000.0)
    ]
    assert t.read_pruned([("v", "<", 0.0)]).count() == 0
