"""VersionedTable lake-format capabilities: compaction, vacuum, CDC."""

import glob
import os
import tempfile

import pytest

from pyspark.sql import functions as F

from emr_on_eks_hudi_iceberg_delta_spark.sources.parquet import load_table
from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import VersionedTable

SF_DIR = "/root/testdata/sf0.001"


def test_compact_reduces_files_keeps_data(spark):
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_c_"))
    df = load_table(spark, SF_DIR, "orders").repartition(16)
    vt.overwrite(df)
    n_before = len(glob.glob(vt.current_snapshot_dir() + "/*.parquet"))
    assert n_before >= 16
    vt.compact(target_partitions=2)
    n_after = len(glob.glob(vt.current_snapshot_dir() + "/*.parquet"))
    assert n_after <= 2
    assert vt.read().count() == df.count()
    assert [s["version"] for s in vt.history()] == [0, 1]


def test_vacuum_drops_old_snapshots(spark):
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_v_"))
    vt.overwrite(spark.range(10).toDF("id"))
    vt.overwrite(spark.range(20).toDF("id"))
    vt.overwrite(spark.range(30).toDF("id"))
    vt.vacuum(keep_last=1)
    assert [s["version"] for s in vt.history()] == [2]
    assert vt.read().count() == 30
    try:
        vt.read(version=0)
        raised = False
    except ValueError:
        raised = True
    assert raised


def test_cdc_changes(spark):
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_cdc_"))
    vt.overwrite(spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string"))
    vt.overwrite(spark.createDataFrame([(1, "a"), (2, "b2"), (3, "c")], "id int, v string"))
    ch = {(r["id"], r["v"], r["_change_type"]) for r in vt.changes(0, 1).collect()}
    assert ch == {(2, "b2", "insert"), (3, "c", "insert"), (2, "b", "delete")}


def test_asof_join_no_prior_match_is_null(spark):
    from emr_on_eks_hudi_iceberg_delta_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (1, "2024-01-01 12:00:00"), (2, "2024-01-01 10:00:00")],
        "k int, ts string",
    ).selectExpr("k", "cast(ts as timestamp_ntz) ts")
    right = spark.createDataFrame(
        [(1, "2024-01-01 11:00:00", 5.0), (1, "2024-01-01 09:00:00", 3.0)],
        "k int, ts string, v double",
    ).selectExpr("k", "cast(ts as timestamp_ntz) ts", "v")
    out = {
        (r["k"], r["ts"].isoformat()): r["v_asof"]
        for r in asof_join(left, right, on="k").collect()
    }
    assert out == {
        (1, "2024-01-01T10:00:00"): 3.0,   # prior purchase only
        (1, "2024-01-01T12:00:00"): 5.0,   # latest prior wins
        (2, "2024-01-01T10:00:00"): None,  # key with no right rows
    }


def test_asof_join_inclusive_equal_ts(spark):
    from emr_on_eks_hudi_iceberg_delta_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00")], "k int, ts string"
    ).selectExpr("k", "cast(ts as timestamp_ntz) ts")
    right = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 7.0)], "k int, ts string, v double"
    ).selectExpr("k", "cast(ts as timestamp_ntz) ts", "v")
    (row,) = asof_join(left, right, on="k").collect()
    assert row["v_asof"] == 7.0  # equal timestamps match (inclusive)


def test_ann_paths_structural(spark):
    """LSH and IVF approximate top-k: structurally valid results (5 ranked
    rows per query, cosines within the exact-scoring range) and measurable
    recall against brute force."""
    from emr_on_eks_hudi_iceberg_delta_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
        lsh_ann_topk,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter("vec_id < 10")
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    for name, approx_df in [
        ("lsh", lsh_ann_topk(emb, queries, k=5)),
        ("ivf", ivf_topk(emb, queries, k=5, nprobe=8)),
    ]:
        rows = approx_df.collect()
        per_query = {}
        for r in rows:
            per_query.setdefault(r["query_id"], []).append(r["rank"])
        for q, ranks in per_query.items():
            assert sorted(ranks) == list(range(1, len(ranks) + 1)), (name, q)
        hits = len({(r["query_id"], r["neighbor_id"]) for r in rows} & exact)
        # random 64-dim embeddings: approximate recall is inherently modest;
        # assert it is nonzero and the plumbing returns full result sets
        assert hits > 0, name


def test_occ_conflict_detection_and_retry(spark):
    """Optimistic concurrency: a commit with a stale expected version
    raises; upsert() re-derives from the new snapshot and retries, so no
    committed update is lost."""
    import pytest as _pytest

    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import (
        ConcurrentCommitError,
    )

    loc = tempfile.mkdtemp(prefix="vt_occ_")
    writer_a = VersionedTable(spark, loc)
    writer_b = VersionedTable(spark, loc)
    writer_a.overwrite(
        spark.createDataFrame([(1, "a", 1)], "id int, v string, ts int")
    )

    # writer B reads v0, writer A commits v1 in between -> B's CAS fails
    df_b = spark.createDataFrame([(2, "b", 2)], "id int, v string, ts int")
    writer_a.overwrite(spark.createDataFrame([(1, "a2", 2)], "id int, v string, ts int"))
    with _pytest.raises(ConcurrentCommitError):
        writer_b._commit(df_b, expected_version=0)

    # the retrying upsert succeeds despite racing writers and loses nothing
    writer_b.upsert(df_b, ["id"], "ts")
    rows = {r["id"]: r["v"] for r in writer_b.read().collect()}
    assert rows == {1: "a2", 2: "b"}


def test_meta_columns_lineage(spark):
    """Commit-lineage columns (_commit_version/_commit_time) — the
    _hoodie_* metadata analog; schema-tolerant merges still work against
    meta-bearing frames via unionByName(allowMissingColumns=True)."""
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_meta_"))
    vt.overwrite(spark.createDataFrame([(1, "a")], "id int, v string"))
    vt.overwrite(spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string"))
    df = vt.read(with_meta=True)
    assert set(df.columns) == {"id", "v", "_commit_version", "_commit_time"}
    assert df.select("_commit_version").distinct().collect()[0][0] == 1
    v0 = vt.read(version=0, with_meta=True)
    assert v0.select("_commit_version").distinct().collect()[0][0] == 0
    # schema-tolerant union against a meta-less frame (O1 semantics)
    plain = spark.createDataFrame([(3, "c")], "id int, v string")
    u = df.unionByName(plain, allowMissingColumns=True)
    assert u.count() == 3
    assert u.filter("_commit_version IS NULL").count() == 1


def test_schema_evolution_upsert(spark):
    """Schema evolution: an update batch carrying a NEW column upserts
    cleanly; prior rows read NULL for it (unionByName allowMissingColumns
    inside upsert_by_key — the Hudi/Delta mergeSchema behavior)."""
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_evo_"))
    vt.overwrite(spark.createDataFrame([(1, "a", 1)], "id int, v string, ts int"))
    evolved = spark.createDataFrame(
        [(2, "b", 2, "extra")], "id int, v string, ts int, note string"
    )
    vt.upsert(evolved, ["id"], "ts")
    rows = {r["id"]: r["note"] for r in vt.read().collect()}
    assert rows == {1: None, 2: "extra"}


def test_schema_evolution_append_merge_schema(spark):
    """append(merge_schema=True) = Delta mergeSchema: new columns backfill
    NULL for existing rows, omitted columns fill NULL for incoming rows,
    shared columns widen to the union type (int -> bigint). Default append
    keeps Delta's strict enforcement (mismatch raises), and the prior
    snapshot keeps its original schema for time travel."""
    import pytest

    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_ms_"))
    vt.overwrite(spark.createDataFrame([(1, "a")], "id int, v string"))

    widened = spark.createDataFrame(
        [(2 ** 40, "b", 9.5)], "id bigint, v string, score double"
    )
    with pytest.raises(Exception):
        vt.append(widened)  # strict by default, like Delta
    vt.append(widened, merge_schema=True)
    vt.append(
        spark.createDataFrame([(3,)], "id int"), merge_schema=True
    )  # omitted columns fill NULL

    got = {r["id"]: (r["v"], r["score"]) for r in vt.read().collect()}
    assert got == {1: ("a", None), 2 ** 40: ("b", 9.5), 3: (None, None)}
    assert dict(vt.read().dtypes)["id"] == "bigint"  # widened
    assert vt.read(version=0).columns == ["id", "v"]  # time travel keeps old schema


def test_compact_cluster_by_sorts_and_ranges(spark):
    """Sort-clustered compaction (OPTIMIZE ZORDER analog): files carry
    disjoint key ranges and rows are sorted within each — the layout that
    makes parquet row-group min/max stats selective for data skipping."""
    import pandas as pd

    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_z_"))
    orders = load_table(spark, SF_DIR, "orders").repartition(8)
    vt.overwrite(orders)
    vt.compact(target_partitions=4, cluster_by=["o_custkey"])
    files = sorted(glob.glob(vt.current_snapshot_dir() + "/*.parquet"))
    assert 1 < len(files) <= 4
    ranges = []
    for f in files:
        pdf = pd.read_parquet(f, columns=["o_custkey"])
        assert (pdf["o_custkey"].diff().dropna() >= 0).all()  # sorted within file
        ranges.append((pdf["o_custkey"].min(), pdf["o_custkey"].max()))
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo  # disjoint (touching at most) key ranges across files
    assert vt.read().count() == orders.count()


def test_delete_where_null_predicate_keeps_rows(spark):
    """DELETE only removes predicate-TRUE rows; NULL-predicate rows stay
    (SQL three-valued logic) — and time travel still sees the deleted."""
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_del_"))
    df = spark.createDataFrame(
        [(1, 5.0), (2, -3.0), (3, None)], ["id", "bal"]
    )
    vt.overwrite(df)
    vt.delete_where("bal < 0")
    assert {r.id for r in vt.read().collect()} == {1, 3}  # NULL row kept
    assert vt.read(version=0).count() == 3  # time travel pre-delete


def test_update_where_untouched_rows_identical(spark):
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_upd_"))
    df = spark.createDataFrame([(1, "a"), (2, "b"), (20, "c")], ["id", "v"])
    vt.overwrite(df)
    vt.update_where("id >= 10", {"v": "upper(v)"})
    got = {r.id: r.v for r in vt.read().collect()}
    assert got == {1: "a", 2: "b", 20: "C"}


def test_restore_rolls_forward(spark):
    """RESTORE re-commits an old snapshot as a NEW version — history is
    append-only, never rewritten."""
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_r_"))
    vt.overwrite(spark.range(10).toDF("id"))
    vt.overwrite(spark.range(99).toDF("id"))  # the "bad" write
    vt.restore(version=0)
    assert vt.read().count() == 10
    assert [s["version"] for s in vt.history()] == [0, 1, 2]
    assert vt.read(version=1).count() == 99  # bad version still reachable


def test_clone_is_independent(spark):
    src = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_s_"))
    src.overwrite(spark.range(5).toDF("id"))
    dst = src.clone(tempfile.mkdtemp(prefix="vt_d_"))
    dst.overwrite(spark.range(50).toDF("id"))
    assert src.read().count() == 5  # source untouched by clone writes
    assert dst.read().count() == 50
    assert [s["version"] for s in dst.history()] == [0, 1]


def test_txn_version_makes_writes_idempotent(spark):
    """Delta txnAppId/txnVersion pattern: a replayed batch id is visible
    via txn_version so the writer skips it instead of re-applying."""
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_txn_"))
    vt.overwrite(spark.range(5).toDF("id"))
    assert vt.txn_version("app") == -1
    vt._commit(spark.range(6).toDF("id"), txn=("app", 0))
    vt._commit(spark.range(7).toDF("id"), txn=("app", 1))
    vt._commit(spark.range(8).toDF("id"), txn=("other", 9))
    assert vt.txn_version("app") == 1
    assert vt.txn_version("other") == 9
    # the writer-side guard: replaying batch 1 is a no-op
    if 1 <= vt.txn_version("app"):
        pass  # skip path taken
    else:
        raise AssertionError("replay would have re-applied")
    assert vt.read().count() == 8


def test_check_constraints_enforced_on_write(spark):
    """Delta CHECK semantics: FALSE rows rejected at add-time and at every
    later commit; NULL passes (three-valued logic); constraints survive
    vacuum (metadata round-trip)."""
    import pytest

    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import (
        ConstraintViolationError,
    )

    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_ck_"))
    vt.overwrite(spark.createDataFrame([(1, 5.0), (2, None)], ["id", "bal"]))
    vt.add_constraint("bal_nonneg", "bal >= 0")  # NULL row passes
    with pytest.raises(ConstraintViolationError):
        vt.overwrite(spark.createDataFrame([(3, -1.0)], ["id", "bal"]))
    assert vt.read().count() == 2  # failed commit left no snapshot
    vt.overwrite(spark.createDataFrame([(3, 1.0)], ["id", "bal"]))
    vt.vacuum(keep_last=1)
    with pytest.raises(ConstraintViolationError):  # survives vacuum
        vt.overwrite(spark.createDataFrame([(4, -9.0)], ["id", "bal"]))
    vt.drop_constraint("bal_nonneg")
    vt.overwrite(spark.createDataFrame([(4, -9.0)], ["id", "bal"]))
    assert vt.read().count() == 1


def test_files_and_detail_metadata(spark):
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_md_"))
    vt.overwrite(spark.range(100).toDF("id").repartition(4))
    vt.add_constraint("id_nonneg", "id >= 0")
    d = vt.detail()
    assert d["version"] == 0 and d["num_files"] >= 4 and d["size_bytes"] > 0
    assert d["constraints"] == {"id_nonneg": "id >= 0"}
    vt.compact(target_partitions=1)
    assert len(vt.files()) == 1
    assert len(vt.files(version=0)) >= 4  # old snapshot's files still listed


def test_vacuum_keep_zero_empties_table_consistently(spark):
    """ADVICE r1: vacuum(keep_last=0) used to rmtree every snapshot dir yet
    keep all metadata entries (snaps[-0:] == whole list) — pointers into
    deleted dirs. Now metadata and disk agree: zero snapshots."""
    import pytest

    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_v0_"))
    vt.overwrite(spark.range(10).toDF("id"))
    vt.overwrite(spark.range(20).toDF("id"))
    vt.vacuum(keep_last=0)
    assert vt.history() == []
    with pytest.raises(FileNotFoundError):
        vt.read()
    # table remains writable after the wipe
    vt.overwrite(spark.range(5).toDF("id"))
    assert vt.read().count() == 5


def test_cdc_changes_multiplicity_aware(spark):
    """ADVICE r1: set-semantics anti-joins missed duplicate-row multiplicity
    changes (2 identical old rows -> 1 new row reported nothing). Multiset
    diff reports the dropped copy as a delete and an added copy as insert."""
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import table_changes

    old = spark.createDataFrame([(1, "a"), (1, "a"), (2, "b")], "id int, v string")
    new = spark.createDataFrame([(1, "a"), (2, "b"), (2, "b"), (2, "b")], "id int, v string")
    ch = sorted(
        (r["id"], r["v"], r["_change_type"])
        for r in table_changes(spark, old, new).collect()
    )
    assert ch == [(1, "a", "delete"), (2, "b", "insert"), (2, "b", "insert")]


def test_schema_evolution_ddl(spark):
    """ADD/RENAME/DROP column are snapshot commits: the live schema
    changes, history keeps every older schema for time travel."""
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_ddl_"))
    vt.overwrite(spark.createDataFrame([(1, "a")], "id int, v string"))
    vt.add_column("score", "double", default=0.5)
    assert vt.read().columns == ["id", "v", "score"]
    assert vt.read().collect()[0]["score"] == 0.5
    vt.rename_column("v", "label")
    assert vt.read().columns == ["id", "label", "score"]
    assert vt.read().collect()[0]["label"] == "a"
    vt.drop_column("score")
    assert vt.read().columns == ["id", "label"]
    # time travel serves each historical schema unchanged
    assert vt.read(version=0).columns == ["id", "v"]
    assert vt.read(version=1).columns == ["id", "v", "score"]
    assert vt.read(version=2).columns == ["id", "label", "score"]
    assert [s["version"] for s in vt.history()] == [0, 1, 2, 3]


def test_deferred_delete_tombstones(spark):
    """Merge-on-read delete: tombstone commit instead of file rewrite —
    reads apply it, time travel sees pre-delete state, compaction
    materializes and clears it."""
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_dv_"))
    vt.overwrite(
        spark.createDataFrame(
            [(i, "keep" if i % 3 else "drop") for i in range(30)], "id int, v string"
        )
    )
    data_dir_v0 = vt.history()[0]["dir"]
    vt.delete_where_deferred("v = 'drop'", key_cols=["id"])
    # metadata-only commit: same data dir, one tombstone batch
    assert vt.history()[-1]["dir"] == data_dir_v0
    assert len(vt.history()[-1]["tombstones"]) == 1
    assert vt.read().count() == 20
    assert vt.read().filter("v = 'drop'").count() == 0
    # time travel: version 0 still sees all 30 rows
    assert vt.read(version=0).count() == 30

    # a second deferred delete stacks
    vt.delete_where_deferred("id < 3", key_cols=["id"])
    assert len(vt.history()[-1]["tombstones"]) == 2
    assert vt.read().count() == 18  # ids 1, 2 removed (0 already dropped)

    # NULL-predicate rows are kept (SQL semantics)
    vt2 = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_dv2_"))
    vt2.overwrite(spark.createDataFrame([(1, None), (2, "x")], "id int, v string"))
    vt2.delete_where_deferred("v = 'x'", key_cols=["id"])
    assert vt2.read().count() == 1

    # compaction materializes: new snapshot, no tombstones, same rows
    vt.compact(target_partitions=1)
    assert "tombstones" not in vt.history()[-1] or not vt.history()[-1]["tombstones"]
    assert vt.read().count() == 18

    # stats + pruned reads respect pending tombstones too
    vt3 = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_dv3_"))
    vt3.overwrite(spark.range(100).toDF("id"))
    vt3.compact(target_partitions=4, cluster_by=["id"]).compute_stats(["id"])
    vt3.delete_where_deferred("id % 2 = 0", key_cols=["id"])
    got = vt3.read_pruned([("id", "<", 50)])
    assert got.count() == 25  # odd ids below 50


def test_tags_and_write_audit_publish(spark):
    """Iceberg tags + the WAP workflow: staged snapshots are auditable by
    version but invisible to read() until published; failed audits drop
    cleanly; tags pin historical states by name."""
    import pytest

    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_wap_"))
    vt.overwrite(spark.range(10).toDF("id"))
    vt.tag("train-run-1")

    # stage a bad batch, audit, reject
    bad = vt.stage(spark.range(0).toDF("id"))
    assert vt.read().count() == 10  # invisible to readers
    assert vt.read(version=bad).count() == 0  # auditable by version
    vt.drop_staged(bad)
    assert all(not s.get("staged") for s in vt.history())

    # stage a good batch, audit, publish
    good = vt.stage(spark.range(25).toDF("id"))
    assert vt.read().count() == 10
    assert vt.read(version=good).count() == 25
    vt.publish(good)
    assert vt.read().count() == 25

    # the tag still serves the pre-publish state; publishing again fails
    assert vt.read_tag("train-run-1").count() == 10
    with pytest.raises(ValueError):
        vt.publish(good)
    # normal commits continue cleanly after WAP traffic
    vt.overwrite(spark.range(3).toDF("id"))
    assert vt.read().count() == 3


def test_auto_compact_policy(spark):
    """auto_compact fires only when the small-file (or tombstone-debt)
    problem is real, and sizes the rewrite by bytes/target."""
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_ac_"))
    vt.overwrite(spark.range(1000).toDF("id").repartition(40))
    assert len(vt.files()) >= 40
    # under thresholds: no-op
    assert vt.auto_compact(max_files=64) is False
    assert len(vt.history()) == 1
    # over file threshold: compacts (tiny table -> 1 file)
    assert vt.auto_compact(max_files=16) is True
    assert len(vt.files()) == 1
    assert vt.read().count() == 1000
    # tombstone debt triggers even under the file threshold
    for i in range(3):
        vt.delete_where_deferred(f"id = {i}", key_cols=["id"])
    assert vt.auto_compact(max_files=64, max_tombstone_batches=2) is True
    assert not vt.history()[-1].get("tombstones")
    assert vt.read().count() == 997


def test_read_as_of_timestamp_and_metadata_tables(spark):
    import time as _time

    from pyspark.sql import functions as F

    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_asof_"))
    vt.overwrite(spark.range(5).toDF("id"))
    t_between = _time.gmtime(vt.history()[-1]["committed_at"] + 1.5)
    _time.sleep(2.2)
    vt.overwrite(spark.range(50).toDF("id"))

    stamp = _time.strftime("%Y-%m-%d %H:%M:%S", t_between)
    assert vt.read_as_of(stamp).count() == 5  # newest commit at/before stamp
    future = _time.strftime("%Y-%m-%d %H:%M:%S", _time.gmtime(_time.time() + 60))
    assert vt.read_as_of(future).count() == 50
    import pytest

    with pytest.raises(ValueError):
        vt.read_as_of("2000-01-01 00:00:00")

    h = vt.history_df()
    assert h.count() == 2
    assert {r["version"] for r in h.collect()} == {0, 1}
    f = vt.files_df()
    assert f.count() >= 1
    assert f.agg(F.sum("size_bytes")).collect()[0][0] > 0


def test_wap_staged_snapshot_never_leaks_into_maintenance(spark):
    """The staged (write-audit-publish) head-resolution invariant: after
    stage(), EVERY maintenance/read path — compute_stats, compute_bloom,
    pruned_files/read_pruned, delete_where_deferred, auto_compact, files,
    detail, tag — must operate on the newest PUBLISHED snapshot, never the
    staged one (mirror of Iceberg WAP: staged data is invisible until
    audited and published)."""
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_wapiso_"))
    vt.overwrite(spark.range(100).toDF("id"))  # published head: ids 0..99
    published_dir = vt.current_snapshot_dir()

    # stage unaudited data with a disjoint id range and MORE files
    staged = vt.stage(
        spark.range(1000, 1200).toDF("id").repartition(8)
    )

    # file listing + detail describe the published head
    assert all(f["path"].startswith(published_dir) for f in vt.files())
    assert vt.detail()["version"] == 0
    assert vt.current_snapshot_dir() == published_dir

    # stats/bloom are computed on (and attached to) the published head
    vt.compute_stats(["id"]).compute_bloom(["id"])
    head = next(s for s in vt.history() if s["version"] == 0)
    stag = next(s for s in vt.history() if s["version"] == staged)
    assert "stats" in head and "bloom" in head
    assert "stats" not in stag and "bloom" not in stag

    # pruning scans only published files; staged rows are invisible
    assert vt.read_pruned([("id", ">=", 0)]).count() == 100
    assert vt.read_pruned([("id", "=", 1100)]).count() == 0
    for p in vt.pruned_files([("id", ">=", 0)]):
        assert p.startswith(published_dir)

    # a deferred delete chains off the published head, not the staged dir
    vt.delete_where_deferred("id >= 50", key_cols=["id"])
    assert vt.read().count() == 50
    assert vt.read().agg(F.max("id")).collect()[0][0] == 49
    new_head = vt.history()[-1]
    assert not new_head.get("staged")
    assert new_head["dir"] == published_dir  # metadata-only commit

    # the staged snapshot is still intact and auditable
    assert vt.read(version=staged).count() == 200

    # auto_compact consults the published head's tombstone debt
    assert vt.auto_compact(max_files=10_000, max_tombstone_batches=0) is True
    assert vt.read().count() == 50

    # tag() default pins the published head, not the staged entry
    vt.tag("after-compact")
    assert vt.read_tag("after-compact").count() == 50


def test_publish_keeps_version_id_and_tags_stable(spark):
    """publish() must not renumber: the id returned by stage() — and any
    tag pointing at it — keeps addressing the same data after publish,
    and later commits never collide with existing version ids."""
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_pubstable_"))
    vt.overwrite(spark.range(10).toDF("id"))      # v0
    v = vt.stage(spark.range(25).toDF("id"))      # v1 staged
    vt.overwrite(spark.range(40).toDF("id"))      # v2 published over it
    vt.tag("audited", v)

    vt.publish(v)
    # the staged id is stable: direct read, tag read, and read() all agree
    assert vt.read(version=v).count() == 25
    assert vt.read_tag("audited").count() == 25
    assert vt.read().count() == 25
    assert vt.detail()["version"] == v

    # a later commit allocates a FRESH id (max+1), no collision
    vt.overwrite(spark.range(7).toDF("id"))
    versions = [s["version"] for s in vt.history()]
    assert len(versions) == len(set(versions))
    assert vt.read().count() == 7
    # time travel across the whole history still resolves
    assert vt.read(version=0).count() == 10
    assert vt.read(version=2).count() == 40


def test_bloom_probe_type_safety(spark):
    """Bloom skipping may only ever KEEP extra files, never drop one that
    contains the probed value. Build-side hashes Spark's CAST(col AS
    STRING); probe-side hashes Python str(value) — so bloom is (a)
    restricted to string/integral columns at build time and (b) bypassed
    for non-str/int probe values (bool str forms diverge: 'True' vs '1')."""
    import pytest

    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_bloomty_"))
    df = spark.range(10).toDF("id").withColumn(
        "price", F.col("id").cast("double") * 1e-7
    ).withColumn("flag", (F.col("id") % 2 == 0))
    vt.overwrite(df)

    # double/boolean columns are rejected at build time
    with pytest.raises(ValueError):
        vt.compute_bloom(["price"])
    with pytest.raises(ValueError):
        vt.compute_bloom(["flag"])

    # int build + bool probe: True's Python str is 'True', the build-side
    # strings are '0'/'1' — before the guard this wrongly pruned the file
    vt.compute_bloom(["id"])
    assert vt.pruned_files([("id", "=", True)]) == [
        f["path"] for f in vt.files()
    ]
    # well-typed probes still prune: a value present is always kept, a
    # value absent may be (and here is) pruned
    assert len(vt.pruned_files([("id", "=", 5)])) >= 1
    assert vt.read_pruned([("id", "=", 5)]).count() == 1
    assert vt.pruned_files([("id", "=", 12345)]) == []


# -- generated columns + shallow clone (round 4) ----------------------------


def test_generated_column_computed_and_validated(spark, tmp_path):
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import (
        ConstraintViolationError,
        VersionedTable,
    )

    vt = VersionedTable(spark, str(tmp_path / "gen"))
    vt.overwrite(
        spark.createDataFrame([(1, 10.0), (2, 20.0)], "id long, amount double")
    )
    vt.add_generated_column("amount_cents", "CAST(amount * 100 AS BIGINT)")
    # backfilled on existing rows
    assert {r.amount_cents for r in vt.read().collect()} == {1000, 2000}
    # an append omitting the column gets it computed
    vt.append(spark.createDataFrame([(3, 30.0)], "id long, amount double"))
    got = {r.id: r.amount_cents for r in vt.read().collect()}
    assert got == {1: 1000, 2: 2000, 3: 3000}
    # supplying a NON-matching value is rejected
    bad = spark.createDataFrame(
        [(4, 40.0, 9999)], "id long, amount double, amount_cents long"
    )
    with pytest.raises(ConstraintViolationError, match="generated column"):
        vt.append(bad)
    # supplying the MATCHING value passes
    ok = spark.createDataFrame(
        [(4, 40.0, 4000)], "id long, amount double, amount_cents long"
    )
    vt.append(ok)
    assert vt.read().count() == 4
    # dropping the rule makes the column freely writable again
    vt.drop_generated_column("amount_cents")
    vt.append(bad)
    assert vt.read().count() == 5


def test_shallow_clone_is_metadata_only_and_isolated(spark, tmp_path):
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import VersionedTable

    src = VersionedTable(spark, str(tmp_path / "src"))
    src.overwrite(spark.createDataFrame([(i, i * 2) for i in range(20)], "id long, v long"))
    clone = src.shallow_clone(str(tmp_path / "clone"))
    assert clone.read().count() == 20
    # no data files under the clone location yet (metadata only)
    import glob

    assert not glob.glob(str(tmp_path / "clone" / "snapshot-*" / "*.parquet"))
    # clone writes are CoW under the clone; source unaffected
    clone.delete_where("id < 10")
    assert clone.read().count() == 10
    assert src.read().count() == 20
    # vacuum on the clone must NOT reclaim the source-owned directory
    clone.vacuum(keep_last=1)
    assert src.read().count() == 20


def test_shallow_clone_inherits_pending_tombstones(spark, tmp_path):
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import VersionedTable

    src = VersionedTable(spark, str(tmp_path / "src2"))
    src.overwrite(spark.createDataFrame([(i, i) for i in range(10)], "id long, v long"))
    src.delete_where_deferred("id >= 8", key_cols=["id"])
    clone = src.shallow_clone(str(tmp_path / "clone2"))
    assert clone.read().count() == 8  # MoR deletes visible through the clone


def test_identity_column_continues_across_batches(spark, tmp_path):
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import VersionedTable

    vt = VersionedTable(spark, str(tmp_path / "ident"))
    b1 = spark.createDataFrame([("c",), ("a",), ("b",)], "name string")
    b2 = spark.createDataFrame([("e",), ("d",)], "name string")
    vt.append_with_identity(b1, "row_id", ["name"])
    vt.append_with_identity(b2, "row_id", ["name"])
    got = {r.name: r.row_id for r in vt.read().collect()}
    # batch 1 ordered a,b,c -> 1,2,3; batch 2 ordered d,e -> 4,5
    assert got == {"a": 1, "b": 2, "c": 3, "d": 4, "e": 5}
    # layout independence: same ids regardless of input partitioning
    vt2 = VersionedTable(spark, str(tmp_path / "ident2"))
    vt2.append_with_identity(b1.repartition(3), "row_id", ["name"])
    assert {r.name: r.row_id for r in vt2.read().collect()} == {"a": 1, "b": 2, "c": 3}


def test_branch_write_audit_publish_lifecycle(spark, tmp_path):
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import VersionedTable

    vt = VersionedTable(spark, str(tmp_path / "br"))
    vt.overwrite(spark.createDataFrame([(i, "x") for i in range(10)], "id long, v string"))
    dev = vt.create_branch("dev")
    # branch sees main's state without copying data
    assert dev.read().count() == 10
    # branch commits are invisible to main
    dev.delete_where("id >= 8")
    dev.append(spark.createDataFrame([(100, "new")], "id long, v string"))
    assert dev.read().count() == 9
    assert vt.read().count() == 10
    # fast-forward publishes the branch state atomically
    vt.fast_forward("dev")
    assert vt.read().count() == 9
    assert {r.id for r in vt.read().collect()} == set(range(8)) | {100}
    # dropping the branch never harms main (including time travel)
    vt.drop_branch("dev")
    assert vt.read().count() == 9
    assert vt.read(version=0).count() == 10
    with pytest.raises(ValueError, match="not found"):
        vt.branch("dev")


def test_branch_name_collision_and_main_vacuum_safety(spark, tmp_path):
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import VersionedTable

    vt = VersionedTable(spark, str(tmp_path / "br2"))
    vt.overwrite(spark.createDataFrame([(1, "a")], "id long, v string"))
    dev = vt.create_branch("dev")
    with pytest.raises(ValueError, match="already exists"):
        vt.create_branch("dev")
    # main moves on and vacuums aggressively — the dir the branch's v0
    # references must survive (retention never breaks a live ref)
    vt.overwrite(spark.createDataFrame([(2, "b")], "id long, v string"))
    vt.vacuum(keep_last=1)
    assert dev.read().count() == 1
    assert {r.id for r in dev.read().collect()} == {1}
    vt.drop_branch("dev")
    assert vt.read().count() == 1
    assert {r.id for r in vt.read().collect()} == {2}


def test_fast_forward_refuses_diverged_main(spark, tmp_path):
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import (
        ConcurrentCommitError,
        VersionedTable,
    )

    vt = VersionedTable(spark, str(tmp_path / "br3"))
    vt.overwrite(spark.createDataFrame([(1, "a")], "id long, v string"))
    dev = vt.create_branch("dev")
    dev.append(spark.createDataFrame([(2, "b")], "id long, v string"))
    # main moves on independently -> histories diverged
    vt.append(spark.createDataFrame([(3, "c")], "id long, v string"))
    with pytest.raises(ConcurrentCommitError, match="advanced"):
        vt.fast_forward("dev")
    # main's commit survives; the branch is still readable for rebase
    assert {r.id for r in vt.read().collect()} == {1, 3}
    assert {r.id for r in dev.read().collect()} == {1, 2}


def test_fast_forward_advances_fork_point(spark, tmp_path):
    """VERDICT r4 item 4: a published branch stays USABLE. fast_forward
    advances the branch's fork point to the new main head (the published
    snapshot IS the branch state, so the branch is trivially up to date),
    enabling the natural commit -> publish -> commit -> publish loop —
    while a foreign main commit between publishes is still refused."""
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import (
        ConcurrentCommitError,
        VersionedTable,
    )
    from pyspark.sql import functions as F

    vt = VersionedTable(spark, str(tmp_path / "vt_ffcycle"))
    vt.overwrite(spark.range(5).withColumn("v", F.lit(0)))
    dev = vt.create_branch("dev")
    dev.append(spark.createDataFrame([(100, 1)], "id long, v int"))
    vt.fast_forward("dev")
    assert vt.read().count() == 6
    # second round on the SAME branch: commit then publish again
    dev.append(spark.createDataFrame([(200, 2)], "id long, v int"))
    vt.fast_forward("dev")  # r4 behavior: refused ("main advanced")
    assert {r.id for r in vt.read().collect()} == set(range(5)) | {100, 200}
    # true divergence is still caught: a foreign commit on main between
    # publishes refuses the next fast-forward
    dev.append(spark.createDataFrame([(300, 3)], "id long, v int"))
    vt.append(spark.createDataFrame([(999, 9)], "id long, v int"))
    with pytest.raises(ConcurrentCommitError, match="advanced"):
        vt.fast_forward("dev")


def test_vacuum_older_than_protects_head_and_tags(spark, tmp_path):
    """Time-based retention: snapshots older than the cut expire, but the
    published head, tag-referenced snapshots, and shared data dirs
    survive (retention never breaks a reference)."""
    import os

    from pyspark.sql import functions as F

    vt = VersionedTable(spark, str(tmp_path / "vt_retain"))
    vt.overwrite(spark.range(10).withColumn("v", F.lit(0)))   # v0 (old)
    vt.overwrite(spark.range(10).withColumn("v", F.lit(1)))   # v1 (old, tagged)
    vt.tag("pinned", 1)
    vt.overwrite(spark.range(10).withColumn("v", F.lit(2)))   # v2 head
    # age the first two commits well past any cut
    meta = vt._meta()
    for s in meta["snapshots"]:
        if s["version"] in (0, 1):
            s["committed_at"] = 0.0
    vt._write_meta(meta)
    vt.vacuum_older_than("2000-01-01 00:00:00")
    versions = {s["version"] for s in vt.history()}
    assert versions == {1, 2}  # v0 expired; tagged v1 + head v2 kept
    assert vt.read_tag("pinned").agg(F.max("v")).first()[0] == 1
    assert vt.read().agg(F.max("v")).first()[0] == 2
    # v0's directory is gone from disk
    assert not any(
        d.endswith("snapshot-00000") for d in os.listdir(vt.location)
    )


def test_vacuum_older_than_keeps_shared_dirs_of_metadata_commits(spark, tmp_path):
    """A deferred-delete (metadata-only) commit shares its parent's data
    dir; expiring the parent must not delete the dir the live head still
    references."""
    from pyspark.sql import functions as F

    vt = VersionedTable(spark, str(tmp_path / "vt_retain_mor"))
    vt.overwrite(spark.range(20).withColumn("v", F.col("id")))  # v0
    vt.delete_where_deferred("id < 5", ["id"])                  # v1 shares v0's dir
    meta = vt._meta()
    meta["snapshots"][0]["committed_at"] = 0.0
    vt._write_meta(meta)
    vt.vacuum_older_than("2000-01-01 00:00:00")
    assert {s["version"] for s in vt.history()} == {1}
    assert vt.read().count() == 15  # data dir survived, deletes applied


def test_vacuum_count_based_protects_tags(spark, tmp_path):
    """VERDICT r4 (low): vacuum(keep_last=...) must honor the same
    'retention never breaks a reference' contract as vacuum_older_than —
    a tagged snapshot outside the keep window survives with its data."""
    import os

    from pyspark.sql import functions as F

    vt = VersionedTable(spark, str(tmp_path / "vt_tagkeep"))
    vt.overwrite(spark.range(10).withColumn("v", F.lit(0)))   # v0
    vt.overwrite(spark.range(10).withColumn("v", F.lit(1)))   # v1 (tagged)
    vt.tag("pinned", 1)
    vt.overwrite(spark.range(10).withColumn("v", F.lit(2)))   # v2 head
    vt.vacuum(keep_last=1)
    assert {s["version"] for s in vt.history()} == {1, 2}
    assert vt.read_tag("pinned").agg(F.max("v")).first()[0] == 1
    assert vt.read().agg(F.max("v")).first()[0] == 2
    # the untagged v0 really was reclaimed
    assert not any(
        d.endswith("snapshot-00000") for d in os.listdir(vt.location)
    )


def test_vacuum_protects_staged_wap_snapshots(spark, tmp_path):
    """ADVICE r4 (low): neither retention path may expire a staged
    (unpublished) WAP snapshot — it is a pending ref; publish(version)
    must still work after a retention pass inside the audit window."""
    from pyspark.sql import functions as F

    vt = VersionedTable(spark, str(tmp_path / "vt_wapkeep"))
    vt.overwrite(spark.range(10).withColumn("v", F.lit(0)))       # v0
    staged = vt.stage(spark.range(5).withColumn("v", F.lit(99)))  # v1 staged
    vt.overwrite(spark.range(10).withColumn("v", F.lit(2)))       # v2 head
    # age everything; only the cut decides — head + staged must survive
    meta = vt._meta()
    for s in meta["snapshots"]:
        s["committed_at"] = 0.0
    vt._write_meta(meta)
    vt.vacuum_older_than("2100-01-01 00:00:00")
    assert {s["version"] for s in vt.history()} == {staged, 2}
    vt.publish(staged)
    assert vt.read().agg(F.max("v")).first()[0] == 99

    # count-based flavor: keep window of 1 is the staged tail entry, yet
    # the published head must survive too (a staged snapshot is not the
    # published state)
    vt2 = VersionedTable(spark, str(tmp_path / "vt_wapkeep2"))
    vt2.overwrite(spark.range(10).withColumn("v", F.lit(0)))        # v0
    vt2.overwrite(spark.range(10).withColumn("v", F.lit(1)))        # v1 head
    staged2 = vt2.stage(spark.range(5).withColumn("v", F.lit(7)))   # v2 staged
    vt2.vacuum(keep_last=1)
    assert {s["version"] for s in vt2.history()} == {1, staged2}
    assert vt2.read().agg(F.max("v")).first()[0] == 1  # head intact
    vt2.publish(staged2)
    assert vt2.read().agg(F.max("v")).first()[0] == 7


def test_vacuum_reclaims_orphaned_tombstone_and_dv_dirs(spark, tmp_path):
    """ADVICE r4 (low): expiring metadata-only DELETE commits must also
    remove their tombstone/deletion-vector dirs from disk (not just the
    metadata entries) — but ONLY when no kept snapshot still references
    them."""
    import glob
    import os

    from pyspark.sql import functions as F

    vt = VersionedTable(spark, str(tmp_path / "vt_dvleak"))
    vt.overwrite(spark.range(20).withColumn("v", F.col("id")))  # v0
    vt.delete_where_deferred("id < 5", ["id"])                  # v1: +tombstones
    vt.delete_where_positional("id >= 18")                      # v2: +dv
    # head v3 is a full CoW rewrite: folds the deletes, references neither
    vt.overwrite(vt.read())                                     # v3
    assert glob.glob(os.path.join(vt.location, "tombstones-*"))
    assert glob.glob(os.path.join(vt.location, "dv-*"))
    vt.vacuum(keep_last=1)
    assert {s["version"] for s in vt.history()} == {3}
    # the aux dirs of the dropped MoR commits are gone from disk
    assert not glob.glob(os.path.join(vt.location, "tombstones-*"))
    assert not glob.glob(os.path.join(vt.location, "dv-*"))
    assert vt.read().count() == 13  # 20 - 5 - 2


def test_vacuum_keeps_tombstone_dirs_still_referenced_by_head(spark, tmp_path):
    """The other half of the reclaim contract: when the HEAD is itself a
    metadata-only DELETE commit, vacuuming its ancestors must keep the
    tombstone dirs the head still applies on read."""
    from pyspark.sql import functions as F

    vt = VersionedTable(spark, str(tmp_path / "vt_dvkeep"))
    vt.overwrite(spark.range(20).withColumn("v", F.col("id")))  # v0
    vt.delete_where_deferred("id < 5", ["id"])                  # v1
    vt.delete_where_deferred("id >= 18", ["id"])                # v2 head (MoR)
    vt.vacuum(keep_last=1)
    assert {s["version"] for s in vt.history()} == {2}
    assert vt.read().count() == 13  # both tombstone batches still apply


def test_history_records_operation_names(spark, tmp_path):
    """DESCRIBE HISTORY parity: each commit path records its operation
    (Delta's operation column); legacy entries default to WRITE."""
    from pyspark.sql import functions as F

    vt = VersionedTable(spark, str(tmp_path / "vt_ops"))
    vt.overwrite(spark.range(20).withColumn("v", F.col("id")))
    vt.upsert(
        spark.range(5).withColumn("v", F.lit(99)), key_cols=["id"], precombine_col="v"
    )
    vt.update_where("id = 1", {"v": "v + 1"})
    vt.delete_where("id >= 15")
    vt.compact()
    good = vt.history()[0]["version"]
    vt.restore(good)
    staged = vt.stage(spark.range(3).withColumn("v", F.lit(0)))
    vt.publish(staged)
    ops = [s.get("operation") for s in vt.history()]
    assert ops == [
        "WRITE", "MERGE", "UPDATE", "DELETE", "OPTIMIZE", "RESTORE", "PUBLISH",
    ]
    hist = vt.history_df()
    assert "operation" in hist.columns
    assert hist.filter(F.col("operation") == "MERGE").count() == 1


def test_orphan_snapshot_dirs_harmless_and_reclaimable(spark, tmp_path):
    """A writer crashing between its data write and its metadata commit
    leaves an unreferenced snapshot dir. Metadata is the source of truth,
    so reads and further commits are unaffected — and cleanup_orphans
    reclaims exactly the debris, never a referenced dir."""
    import os

    from pyspark.sql import functions as F

    vt = VersionedTable(spark, str(tmp_path / "vt_orphan"))
    vt.overwrite(spark.range(10).withColumn("v", F.lit(1)))
    # simulate the crash: data written for a would-be snapshot, meta never
    # updated (a number the next writer will not claim — version allocation
    # is metadata-based, so a reclaimed number is simply overwritten)
    orphan = str(tmp_path / "vt_orphan" / "snapshot-00099")
    spark.range(99).write.mode("overwrite").parquet(orphan)
    assert vt.read().count() == 10  # reader unaffected
    vt.append(spark.range(10, 15).withColumn("v", F.lit(2)))
    assert vt.read().count() == 15
    # the age guard: a FRESH unreferenced dir could be a live concurrent
    # writer mid-commit — the default 1 h threshold leaves it alone
    assert vt.cleanup_orphans() == []
    removed = vt.cleanup_orphans(older_than_seconds=0)
    # every removed path was unreferenced; all referenced dirs survive
    live = {s["dir"] for s in vt.history()}
    assert removed and all(d not in live for d in removed)
    for d in live:
        assert os.path.isdir(d)
    assert vt.read().count() == 15
    assert vt.cleanup_orphans(older_than_seconds=0) == []  # idempotent


# -- keyed CDF (Delta Change Data Feed pre/post images) ---------------------


def test_changes_cdf_pairs_updates_by_key(spark, tmp_path):
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import VersionedTable

    vt = VersionedTable(spark, str(tmp_path / "vt_cdf"))
    vt.overwrite(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["k", "s", "v"]
        )
    )
    # update k=1, delete k=2, insert k=4, keep k=3 unchanged
    vt.overwrite(
        spark.createDataFrame(
            [(1, "a", 11), (3, "c", 30), (4, "d", 40)], ["k", "s", "v"]
        )
    )
    rows = vt.changes_cdf(0, 1, ["k"]).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["_change_type"], []).append((r["k"], r["s"], r["v"]))
    assert by_type["update_preimage"] == [(1, "a", 10)]
    assert by_type["update_postimage"] == [(1, "a", 11)]
    assert by_type["delete"] == [(2, "b", 20)]
    assert by_type["insert"] == [(4, "d", 40)]
    assert len(rows) == 4  # unchanged k=3 emits nothing


def test_changes_cdf_multiplicity_yields_pair_plus_delete(spark, tmp_path):
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import VersionedTable

    vt = VersionedTable(spark, str(tmp_path / "vt_cdf_multi"))
    # key 1 has TWO old rows; the new state keeps one (changed) row
    vt.overwrite(spark.createDataFrame([(1, 10), (1, 20)], ["k", "v"]))
    vt.overwrite(spark.createDataFrame([(1, 15)], ["k", "v"]))
    rows = sorted(
        (r["_change_type"], r["v"]) for r in vt.changes_cdf(0, 1, ["k"]).collect()
    )
    # deterministic pairing: positions sort by v -> (10 vs 15) pair, 20 deletes
    assert rows == [
        ("delete", 20),
        ("update_postimage", 15),
        ("update_preimage", 10),
    ]


def test_changes_cdf_key_only_table_degenerates_to_plain_diff(spark, tmp_path):
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import VersionedTable

    vt = VersionedTable(spark, str(tmp_path / "vt_cdf_keys"))
    vt.overwrite(spark.createDataFrame([(1,), (2,)], ["k"]))
    vt.overwrite(spark.createDataFrame([(2,), (3,)], ["k"]))
    rows = sorted(
        (r["_change_type"], r["k"]) for r in vt.changes_cdf(0, 1, ["k"]).collect()
    )
    assert rows == [("delete", 1), ("insert", 3)]


# -- .refs metadata table ---------------------------------------------------


def test_refs_df_lists_head_tags_and_branches(spark, tmp_path):
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import VersionedTable

    vt = VersionedTable(spark, str(tmp_path / "vt_refs"))
    vt.overwrite(spark.range(3))
    vt.tag("run-1")
    vt.append(spark.range(3, 5))
    vt.create_branch("audit")
    vt.branch("audit").append(spark.range(5, 6))
    refs = {r["name"]: r for r in vt.refs_df().collect()}
    assert refs["main"]["type"] == "HEAD" and refs["main"]["version"] == 1
    assert refs["run-1"]["type"] == "TAG" and refs["run-1"]["version"] == 0
    assert refs["audit"]["type"] == "BRANCH"
    assert refs["audit"]["forked_at"] == 1
    assert refs["audit"]["version"] == 1  # branch committed once past fork
    assert refs["main"]["forked_at"] is None


def test_refs_df_empty_table_has_no_rows(spark, tmp_path):
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import VersionedTable

    vt = VersionedTable(spark, str(tmp_path / "vt_refs_empty"))
    assert vt.refs_df().count() == 0


# -- row tracking (stable hidden __row_id across CoW rewrites) --------------


def _ids(vt):
    return {
        tuple(r[c] for c in vt.read().columns): r["__row_id"]
        for r in vt.read(with_row_ids=True).collect()
    }


def test_row_tracking_survives_update_delete_compact(spark, tmp_path):
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import VersionedTable

    vt = VersionedTable(spark, str(tmp_path / "vt_rt"))
    vt.overwrite(
        spark.createDataFrame([(1, 10), (2, 20), (3, 30)], ["k", "v"])
    )
    vt.enable_row_tracking()
    ids0 = {r["k"]: r["__row_id"] for r in vt.read(with_row_ids=True).collect()}
    assert len(set(ids0.values())) == 3  # unique
    assert "__row_id" not in vt.read().columns  # hidden from plain reads
    vt.update_where("k = 2", {"v": F.lit(99)})
    vt.delete_where("k = 3")
    vt.compact(target_partitions=1)
    ids1 = {r["k"]: r["__row_id"] for r in vt.read(with_row_ids=True).collect()}
    assert ids1 == {1: ids0[1], 2: ids0[2]}  # ids stable through rewrites


def test_row_tracking_appends_get_fresh_ids(spark, tmp_path):
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import VersionedTable

    vt = VersionedTable(spark, str(tmp_path / "vt_rt_app"))
    vt.enable_row_tracking()
    vt.overwrite(spark.createDataFrame([(1,), (2,)], ["k"]))
    ids0 = {r["k"]: r["__row_id"] for r in vt.read(with_row_ids=True).collect()}
    vt.append(spark.createDataFrame([(3,), (4,)], ["k"]))
    ids1 = {r["k"]: r["__row_id"] for r in vt.read(with_row_ids=True).collect()}
    assert ids1[1] == ids0[1] and ids1[2] == ids0[2]
    assert len(set(ids1.values())) == 4
    # fresh ids sit above the prior high-water mark
    assert min(ids1[3], ids1[4]) > max(ids0.values())


def test_row_tracking_upsert_preserves_matched_key_ids(spark, tmp_path):
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import VersionedTable

    vt = VersionedTable(spark, str(tmp_path / "vt_rt_up"))
    vt.overwrite(
        spark.createDataFrame([(1, 10, 1), (2, 20, 1)], ["k", "v", "seq"])
    )
    vt.enable_row_tracking()
    ids0 = {r["k"]: r["__row_id"] for r in vt.read(with_row_ids=True).collect()}
    vt.upsert(
        spark.createDataFrame([(2, 99, 2), (3, 30, 2)], ["k", "v", "seq"]),
        ["k"],
        "seq",
    )
    rows = {r["k"]: r for r in vt.read(with_row_ids=True).collect()}
    assert rows[2]["v"] == 99 and rows[2]["__row_id"] == ids0[2]  # kept id
    assert rows[1]["__row_id"] == ids0[1]
    assert rows[3]["__row_id"] not in ids0.values()  # new key, fresh id


def test_row_tracking_restore_and_time_travel_keep_ids(spark, tmp_path):
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import VersionedTable

    vt = VersionedTable(spark, str(tmp_path / "vt_rt_restore"))
    vt.overwrite(spark.createDataFrame([(1, 10), (2, 20)], ["k", "v"]))
    vt.enable_row_tracking()  # v1 backfills ids
    ids0 = {r["k"]: r["__row_id"] for r in vt.read(with_row_ids=True).collect()}
    vt.delete_where("k = 2")  # v2
    vt.restore(1)  # v3 == v1's data
    ids1 = {r["k"]: r["__row_id"] for r in vt.read(with_row_ids=True).collect()}
    assert ids1 == ids0
    # time travel exposes the ids as written at that version
    old = {
        r["k"]: r["__row_id"]
        for r in vt.read(version=1, with_row_ids=True).collect()
    }
    assert old == ids0


def test_row_tracking_schema_ddl_keeps_ids(spark, tmp_path):
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import VersionedTable

    vt = VersionedTable(spark, str(tmp_path / "vt_rt_ddl"))
    vt.overwrite(spark.createDataFrame([(1, 10)], ["k", "v"]))
    vt.enable_row_tracking()
    rid = vt.read(with_row_ids=True).first()["__row_id"]
    vt.add_column("w", "int", default=0)
    vt.rename_column("w", "w2")
    vt.drop_column("w2")
    assert vt.read(with_row_ids=True).first()["__row_id"] == rid


# -- WAP audit expectations -------------------------------------------------


def test_audit_staged_counts_violations_per_check(spark, tmp_path):
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import VersionedTable

    vt = VersionedTable(spark, str(tmp_path / "vt_audit"))
    vt.overwrite(spark.createDataFrame([(1, 10)], ["k", "v"]))
    v = vt.stage(
        spark.createDataFrame(
            [(2, 20), (3, None), (4, -5)], "k int, v int"
        )
    )
    res = vt.audit_staged(
        v, {"v_positive": "v > 0", "v_not_null": "v IS NOT NULL", "k_ok": "k < 100"}
    )
    # NULL predicate counts as a violation in an audit (unlike CHECK)
    assert res == {"v_positive": 2, "v_not_null": 1, "k_ok": 0}
    assert vt.read().count() == 1  # still unpublished


def test_publish_if_clean_gates_and_cleans_up(spark, tmp_path):
    import pytest

    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import (
        ConstraintViolationError,
        VersionedTable,
    )

    vt = VersionedTable(spark, str(tmp_path / "vt_audit_pub"))
    vt.overwrite(spark.createDataFrame([(1, 10)], ["k", "v"]))
    bad = vt.stage(spark.createDataFrame([(2, -1)], ["k", "v"]))
    with pytest.raises(ConstraintViolationError, match="failed audit"):
        vt.publish_if_clean(bad, {"v_positive": "v > 0"})
    # failed audit leaves no staged debris
    assert all(not s.get("staged") for s in vt.history())
    assert vt.read().count() == 1
    good = vt.stage(spark.createDataFrame([(2, 5)], ["k", "v"]))
    vt.publish_if_clean(good, {"v_positive": "v > 0"})
    assert vt.read().count() == 1 and vt.read().first()["v"] == 5
    # auditing a published (non-staged) version refuses
    with pytest.raises(ValueError, match="no staged snapshot"):
        vt.audit_staged(good, {"x": "true"})


def test_write_compression_property(spark, tmp_path):
    import glob

    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import VersionedTable

    vt = VersionedTable(spark, str(tmp_path / "vt_zstd"))
    vt.set_property("write.compression", "zstd")
    vt.overwrite(spark.range(100))
    files = glob.glob(str(tmp_path / "vt_zstd" / "snapshot-00000" / "*.parquet"))
    assert files and all(".zstd." in f for f in files)
    assert vt.read().count() == 100  # codec transparent to readers
    vt.unset_property("write.compression")
    vt.append(spark.range(100, 110))
    files1 = glob.glob(str(tmp_path / "vt_zstd" / "snapshot-00001" / "*.parquet"))
    assert files1 and not any(".zstd." in f for f in files1)


def test_diff_summary_counts_change_types(spark, tmp_path):
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import VersionedTable

    vt = VersionedTable(spark, str(tmp_path / "vt_diff"))
    vt.overwrite(
        spark.createDataFrame([(1, 10), (2, 20), (3, 30)], ["k", "v"])
    )
    vt.overwrite(
        spark.createDataFrame([(1, 11), (3, 30), (4, 40)], ["k", "v"])
    )
    assert vt.diff_summary(0, 1, ["k"]) == {
        "inserted": 1,
        "deleted": 1,
        "updated": 1,
    }


def test_enable_row_tracking_idempotent_and_ddl_paths_keep_ids(spark, tmp_path):
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import VersionedTable

    vt = VersionedTable(spark, str(tmp_path / "vt_rt_idem"))
    vt.overwrite(spark.createDataFrame([(1, "2024-01-02 03:04:05")], ["k", "ts"]))
    vt.enable_row_tracking()
    rid = vt.read(with_row_ids=True).first()["__row_id"]
    vt.enable_row_tracking()  # idempotent: no reassignment, no new commit
    assert vt.read(with_row_ids=True).first()["__row_id"] == rid
    # generated-column backfill preserves ids
    vt.add_generated_column("day", "substring(ts, 1, 10)")
    assert vt.read(with_row_ids=True).first()["__row_id"] == rid
    # branch fast-forward preserves ids
    vt.create_branch("b")
    vt.branch("b").update_where("k = 1", {"k": F.lit(2)})
    vt.fast_forward("b")
    assert vt.read(with_row_ids=True).first()["__row_id"] == rid


def test_rename_column_migrates_not_null(spark, tmp_path):
    import pytest

    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import (
        ConstraintViolationError,
        VersionedTable,
    )

    vt = VersionedTable(spark, str(tmp_path / "vt_nn_rename"))
    vt.overwrite(spark.createDataFrame([(1, "a")], ["k", "s"]))
    vt.set_not_null("s")
    vt.rename_column("s", "s2")
    assert vt._meta()["not_null"] == ["s2"]
    with pytest.raises(ConstraintViolationError):
        vt.append(spark.createDataFrame([(2, None)], "k int, s2 string"))


def test_rename_column_guards_constraint_and_generated_references(spark, tmp_path):
    import pytest

    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import VersionedTable

    vt = VersionedTable(spark, str(tmp_path / "vt_rename_guard"))
    vt.overwrite(spark.createDataFrame([(1, 5)], ["k", "v"]))
    vt.add_constraint("v_pos", "v > 0")
    with pytest.raises(ValueError, match="constraint 'v_pos' references"):
        vt.rename_column("v", "v2")
    vt.drop_constraint("v_pos")
    vt.add_generated_column("v_sq", "v * v")
    with pytest.raises(ValueError, match="generated column 'v_sq' references"):
        vt.rename_column("v", "v2")
    # renaming the GENERATED column itself re-keys the registration —
    # no resurrected old column, and the expression keeps computing
    vt.rename_column("v_sq", "v_squared")
    assert "v_sq" not in vt.read().columns
    vt.append(spark.createDataFrame([(2, 3)], ["k", "v"]))
    rows = {r["k"]: r["v_squared"] for r in vt.read().collect()}
    assert rows == {1: 25, 2: 9}


def test_history_df_with_file_stats(spark, tmp_path):
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import VersionedTable

    vt = VersionedTable(spark, str(tmp_path / "vt_hist_stats"))
    vt.overwrite(spark.range(100))
    vt.append(spark.range(100, 300))
    h = {r["version"]: r for r in vt.history_df(with_file_stats=True).collect()}
    assert all(r["n_files"] >= 1 and r["size_bytes"] > 0 for r in h.values())
    assert h[1]["size_bytes"] > h[0]["size_bytes"]  # append grew the snapshot
    # the plain form keeps its original schema
    assert "n_files" not in vt.history_df().columns


def test_concurrent_writers_serialize_and_lose_no_updates(spark, tmp_path):
    """VERDICT r5 task 4: two OS processes (two Spark JVMs) race
    interleaved locked-upsert cycles on one table. Serializability
    contract: because precombine timestamps are globally unique and
    upsert keeps max-ts per key, EVERY serial order yields the same
    final state — so the final table must equal that state exactly
    (any lost update, torn pointer, or skipped batch breaks it), and
    the version history must hold exactly one commit per upsert with
    no duplicate or skipped version ids."""
    import json
    import os
    import subprocess
    import sys

    from pyspark.sql import functions as F

    CYCLES, KEYS = 4, 60
    loc = str(tmp_path / "vt_race")
    vt = VersionedTable(spark, loc)
    vt.overwrite(
        spark.range(KEYS).select(
            F.col("id"),
            F.lit(-1).cast("bigint").alias("ts"),
            F.lit("seed").alias("val"),
        )
    )

    worker = os.path.join(os.path.dirname(__file__), "concurrent_writer_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, loc, str(w), str(CYCLES), str(KEYS)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for w in (0, 1)
    ]
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"writer failed:\n{out}\n{err}"

    # expected state: per key, the covering batch with max ts
    expect = {}
    for k in range(KEYS):
        best = (-1, "seed")
        for w in (0, 1):
            for c in range(CYCLES):
                if (k + w + c) % 3 != 0:
                    ts = c * 10 + w
                    if ts > best[0]:
                        best = (ts, f"w{w}c{c}")
        expect[k] = best

    got = {
        r["id"]: (r["ts"], r["val"]) for r in vt.read().collect()
    }
    assert got == expect

    # history: seed + one commit per upsert, contiguous version ids,
    # and the pointer document is well-formed JSON (no torn metadata)
    versions = [s["version"] for s in vt.history()]
    assert sorted(versions) == list(range(1 + 2 * CYCLES))
    with open(os.path.join(loc, "_current_snapshot.json")) as fh:
        json.load(fh)


def test_revert_unpicks_one_commit_keeping_later_ones(spark, tmp_path):
    """revert(v) removes exactly commit v's effect while later commits
    survive — unlike restore, which discards them. Multiset semantics:
    duplicate multiplicities subtract correctly."""
    from pyspark.sql import functions as F

    vt = VersionedTable(spark, str(tmp_path / "vt_revert"))
    base = spark.range(10).select("id", F.lit("base").alias("tag"))
    vt.overwrite(base)                                           # v0
    vt.append(spark.range(3).select("id", F.lit("batch1").alias("tag")))  # v1
    vt.append(spark.range(2).select("id", F.lit("batch2").alias("tag")))  # v2
    vt.revert(1)                                                 # v3
    got = sorted((r["id"], r["tag"]) for r in vt.read().collect())
    want = sorted(
        [(i, "base") for i in range(10)] + [(i, "batch2") for i in range(2)]
    )
    assert got == want
    # revert of the revert restores batch1 (an involution on multisets)
    vt.revert(3)
    assert vt.read().filter("tag = 'batch1'").count() == 3
    # history grew (no rewrite): v0..v4 all present
    assert [s["version"] for s in vt.history()] == [0, 1, 2, 3, 4]


def test_revert_is_saturating_when_later_commit_deleted_rows(spark, tmp_path):
    """Rows a later commit already removed subtract nothing: revert uses
    exceptAll (saturating multiset difference), never going negative."""
    from pyspark.sql import functions as F

    vt = VersionedTable(spark, str(tmp_path / "vt_revsat"))
    vt.overwrite(spark.range(5).select("id", F.lit("base").alias("tag")))   # v0
    vt.append(spark.range(100, 103).select("id", F.lit("x").alias("tag")))  # v1
    vt.delete_where("id >= 101")                                            # v2
    vt.revert(1)                                                            # v3
    got = sorted(r["id"] for r in vt.read().collect())
    assert got == [0, 1, 2, 3, 4]  # only id=100 (still present) unpicked


def test_cherry_pick_replays_staged_commit_onto_advanced_head(spark, tmp_path):
    """The WAP race cherry-pick exists for: stage a batch against base,
    head advances meanwhile, pick the staged delta onto the new head —
    both the staged rows and the concurrent commit's rows land."""
    from pyspark.sql import functions as F

    vt = VersionedTable(spark, str(tmp_path / "vt_pick"))
    vt.overwrite(spark.range(5).select("id", F.lit("base").alias("tag")))  # v0
    staged = vt.stage(
        vt.read().unionByName(
            spark.range(200, 202).select("id", F.lit("staged").alias("tag"))
        )
    )
    vt.append(spark.range(300, 301).select("id", F.lit("rush").alias("tag")))
    vt.cherry_pick(staged)
    got = sorted((r["id"], r["tag"]) for r in vt.read().collect())
    want = sorted(
        [(i, "base") for i in range(5)]
        + [(200, "staged"), (201, "staged"), (300, "rush")]
    )
    assert got == want


def test_copy_into_loads_each_file_exactly_once(spark, tmp_path):
    """COPY INTO contract: per-file idempotence. First call loads the
    two staged files, a re-run is a no-op (no empty commit), and after
    a third file arrives only IT is appended — the retryable scheduled
    ingest pattern, bookkeeping inside the table metadata."""
    import os

    from pyspark.sql import functions as F

    src = tmp_path / "landing"
    spark.range(3).select("id", F.lit("a").alias("tag")).coalesce(1).write.parquet(
        str(src / "f1")
    )
    spark.range(10, 12).select("id", F.lit("b").alias("tag")).coalesce(
        1
    ).write.parquet(str(src / "f2"))

    vt = VersionedTable(spark, str(tmp_path / "vt_copy"))
    vt.overwrite(
        spark.range(0).select("id", F.lit("seed").alias("tag"))
    )  # v0 empty seed
    loaded = vt.copy_into(str(src), pattern="*.parquet")
    assert len(loaded) == 2 and all(p.endswith(".parquet") for p in loaded)
    assert vt.read().count() == 5

    assert vt.copy_into(str(src), pattern="*.parquet") == []  # idempotent
    assert vt.read().count() == 5
    assert len(vt.history()) == 2  # no empty commit on the no-op

    spark.range(100, 101).select("id", F.lit("c").alias("tag")).coalesce(
        1
    ).write.parquet(str(src / "f3"))
    loaded = vt.copy_into(str(src), pattern="*.parquet")
    assert len(loaded) == 1 and "f3" in loaded[0]
    assert vt.read().filter("tag = 'c'").count() == 1

    # the SQL front-end form returns the loaded-file list
    from emr_on_eks_hudi_iceberg_delta_spark.operators.merge_sql import run_dml

    spark.range(200, 202).select("id", F.lit("d").alias("tag")).coalesce(
        1
    ).write.parquet(str(src / "f4"))
    out = run_dml(
        spark,
        f"COPY INTO t FROM '{src}' FILEFORMAT = PARQUET PATTERN = '*.parquet'",
        tables={"t": vt},
    )
    assert out.count() == 1
    assert vt.read().count() == 8


def test_killed_lock_holder_lease_expires_and_table_unharmed(spark, tmp_path):
    """Crash-durability: a writer SIGKILLed while holding the O_EXCL
    lock must not deadlock the table — the stale-lease break
    (locked(stale_after=...)) reclaims it — and the atomic pointer flip
    means the table stays readable at its last committed state with no
    torn metadata, including a leftover pointer .tmp from a dead
    writer."""
    import json
    import os
    import signal
    import subprocess
    import sys
    import time as _time

    from pyspark.sql import functions as F

    loc = str(tmp_path / "vt_crash")
    vt = VersionedTable(spark, loc)
    vt.overwrite(spark.range(5).select("id", F.lit("base").alias("tag")))

    # a process that takes the lock and then hangs forever
    holder = subprocess.Popen(
        [
            sys.executable,
            "-c",
            (
                "import os, sys, time\n"
                f"sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})\n"
                f"fd = os.open(os.path.join({loc!r}, '_writer.lock'), "
                "os.O_CREAT | os.O_EXCL | os.O_WRONLY)\n"
                "os.write(fd, b'holder'); os.close(fd)\n"
                "print('LOCKED', flush=True)\n"
                "time.sleep(600)\n"
            ),
        ],
        stdout=subprocess.PIPE,
        text=True,
    )
    assert holder.stdout.readline().strip() == "LOCKED"
    holder.send_signal(signal.SIGKILL)
    holder.wait()

    # lock file is still on disk; a live writer with a short stale lease
    # breaks it and commits
    lock_path = os.path.join(loc, "_writer.lock")
    assert os.path.exists(lock_path)
    # age the lock past the lease (mtime backdate = deterministic stale)
    past = _time.time() - 3600
    os.utime(lock_path, (past, past))
    with vt.locked(timeout=5.0, stale_after=60.0):
        vt.append(spark.range(10, 12).select("id", F.lit("after").alias("tag")))
    assert vt.read().count() == 7

    # a dead writer's half-written pointer tmp must not corrupt reads
    with open(os.path.join(loc, "_current_snapshot.json.tmp"), "w") as fh:
        fh.write('{"snapshots": [TRUNCATED')
    assert vt.read().count() == 7
    with open(os.path.join(loc, "_current_snapshot.json")) as fh:
        json.load(fh)  # the real pointer is intact JSON


def test_upsert_auto_schema_evolution(spark, tmp_path):
    """Delta autoMerge semantics on MERGE: an upsert whose updates carry
    a brand-new column evolves the table schema in the same commit —
    existing rows read NULL for it, updated keys carry the value, and
    time travel still serves the old schema."""
    from pyspark.sql import functions as F

    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import (
        VersionedTable,
    )

    vt = VersionedTable(spark, str(tmp_path / "vt_ev"))
    vt.overwrite(spark.range(5).select("id", F.lit(1).alias("v")))
    vt.upsert(
        spark.range(3, 8).select(
            "id", F.lit(2).alias("v"), F.lit("x").alias("extra")
        ),
        ["id"],
        "v",
    )
    rows = sorted(
        (r["id"], r["v"], r["extra"]) for r in vt.read().collect()
    )
    assert rows == [(i, 1, None) for i in range(3)] + [
        (i, 2, "x") for i in range(3, 8)
    ]
    assert "extra" not in vt.read(version=0).columns


def test_purge_rows_rewrites_all_history(spark, tmp_path):
    """GDPR purge: the subject's rows vanish from EVERY version (time
    travel included), everything else is preserved exactly, the audit
    trail records the purge, and stale file stats are dropped."""
    import pytest
    from pyspark.sql import functions as F

    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import (
        VersionedTable,
    )

    vt = VersionedTable(spark, str(tmp_path / "vt_purge"))
    vt.overwrite(
        spark.range(10).select("id", (F.col("id") % 3).alias("subject"))
    )                                                            # v0
    vt.append(
        spark.range(10, 20).select("id", (F.col("id") % 3).alias("subject"))
    )                                                            # v1
    vt.delete_where("id >= 18")                                  # v2
    vt.compute_stats(["id"])
    before_v1_keep = sorted(
        r["id"] for r in vt.read(version=1).filter("subject != 1").collect()
    )

    out = vt.purge_rows("subject = 1")
    assert out["rows_removed"] > 0

    for v in (0, 1, 2):
        assert vt.read(version=v).filter("subject = 1").count() == 0
    # non-subject rows of every version are untouched
    assert sorted(r["id"] for r in vt.read(version=1).collect()) == before_v1_keep
    # head serves the post-delete, post-purge intersection
    assert sorted(r["id"] for r in vt.read().collect()) == [
        i for i in range(18) if i % 3 != 1
    ]
    # audit entry recorded; stats REBUILT over the purged files (round-7
    # task 3: purge leaves the skipping stack functional), with every
    # recorded path alive on disk
    assert vt._meta()["purges"][0]["rows_removed"] == out["rows_removed"]
    head = vt._snapshots()[-1]
    assert head.get("stats_cols") == ["id"]
    assert head.get("stats"), "head stats must be rebuilt post-purge"
    assert all(os.path.exists(p) for p in head["stats"])

    # refusal: MoR state present
    vt2 = VersionedTable(spark, str(tmp_path / "vt_purge_mor"))
    vt2.overwrite(spark.range(5).select("id", F.lit(0).alias("subject")))
    vt2.delete_where_positional("id = 2")
    with pytest.raises(ValueError, match="tombstones/deletion"):
        vt2.purge_rows("subject = 0")


def test_compact_by_target_file_size(spark, tmp_path):
    import pytest
    from pyspark.sql import functions as F

    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import (
        VersionedTable,
    )

    vt = VersionedTable(spark, str(tmp_path / "binpack"))
    vt.overwrite(
        spark.range(20000)
        .repartition(16)  # 16 small files
        .select("id", F.concat(F.lit("pad-"), F.col("id")).alias("s"))
    )
    total = sum(f["size_bytes"] for f in vt.files())
    assert len(vt.files()) == 16
    vt.compact(target_file_size_bytes=total // 4 + 1)
    n_files = len(vt.files())
    assert 2 <= n_files <= 5  # ~4 bins (re-encoding shifts sizes a bit)
    assert vt.read().count() == 20000
    with pytest.raises(ValueError, match="OR target_file_size_bytes"):
        vt.compact(target_partitions=2, target_file_size_bytes=1)


def test_record_level_index_point_lookup(spark, tmp_path):
    """RLI: exact key->file mapping serves a point lookup from ONE data
    file; stale index (head advanced) refuses; empty key returns empty."""
    import pytest
    from pyspark.sql import functions as F

    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import (
        VersionedTable,
    )

    vt = VersionedTable(spark, str(tmp_path / "rli"))
    vt.overwrite(
        spark.range(10000)
        .repartition(8)  # 8 data files
        .select("id", (F.col("id") * 2).alias("v"))
    )
    assert len(vt.files()) == 8
    vt.build_record_index(["id"])

    hit = vt.index_lookup({"id": 4321})
    rows = hit.collect()
    assert [(r["id"], r["v"]) for r in rows] == [(4321, 8642)]
    # exactly one data file opened
    assert len(hit.inputFiles()) == 1
    assert vt.index_lookup({"id": -5}).count() == 0
    with pytest.raises(ValueError, match="index covers"):
        vt.index_lookup({"nope": 1})

    vt.append(spark.range(10000, 10010).select("id", (F.col("id") * 2).alias("v")))
    with pytest.raises(ValueError, match="no record index"):
        vt.index_lookup({"id": 4321})


def test_append_only_property_enforced(spark, tmp_path):
    """delta.appendOnly: once set, appends commit but any rewrite path
    (overwrite/delete/update/upsert/restore) refuses; unsetting the
    property re-enables rewrites — the audit-log table contract."""
    import pytest
    from pyspark.sql import functions as F

    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import (
        AppendOnlyViolationError,
        VersionedTable,
    )

    vt = VersionedTable(spark, str(tmp_path / "ao"))
    vt.overwrite(spark.range(5).select("id", F.lit("a").alias("v")))
    vt.set_property("delta.appendOnly", "true")
    vt.append(spark.range(5, 8).select("id", F.lit("b").alias("v")))
    assert vt.read().count() == 8
    for action in (
        lambda: vt.overwrite(spark.range(2).select("id", F.lit("x").alias("v"))),
        lambda: vt.delete_where("id = 1"),
        lambda: vt.update_where("id = 1", {"v": "'z'"}),
        lambda: vt.upsert(
            spark.range(1).select("id", F.lit("u").alias("v")), ["id"], "v"
        ),
        lambda: vt.restore(0),
    ):
        with pytest.raises(AppendOnlyViolationError):
            action()
    assert vt.read().count() == 8
    # fast-forward can fold branch rewrites into main — blocked too
    vt.create_branch("audit")
    vt.branch("audit").append(
        spark.range(100, 101).select("id", F.lit("b").alias("v"))
    )
    with pytest.raises(AppendOnlyViolationError):
        vt.fast_forward("audit")
    assert vt.read().count() == 8
    vt.set_property("delta.appendOnly", "false")
    vt.delete_where("id = 0")
    assert vt.read().count() == 7

    # identity appends ARE appends: they must commit under appendOnly
    # (ADVICE r6: the default op="WRITE" used to refuse them)
    ao2 = VersionedTable(spark, str(tmp_path / "ao_ident"))
    ao2.append_with_identity(
        spark.createDataFrame([("a",), ("b",)], "v string"), "rid", ["v"]
    )
    ao2.set_property("delta.appendOnly", "true")
    ao2.append_with_identity(
        spark.createDataFrame([("c",)], "v string"), "rid", ["v"]
    )
    assert sorted(
        (r["rid"], r["v"]) for r in ao2.read().collect()
    ) == [(1, "a"), (2, "b"), (3, "c")]
    # and the no-id-column misuse path refuses instead of replacing
    vt_plain = VersionedTable(spark, str(tmp_path / "ao_plain"))
    vt_plain.overwrite(spark.range(3).select("id"))
    with pytest.raises(ValueError, match="identity must be established"):
        vt_plain.append_with_identity(
            spark.createDataFrame([("x",)], "v string"), "rid", ["v"]
        )
    assert vt_plain.read().count() == 3


def test_purge_rows_single_scan_per_dir(spark, tmp_path):
    """Round-7 task 3: each unique data dir costs ONE Spark job (the
    observe()-metered filtered write) — no count-then-rewrite double
    scan. Job count inside a dedicated job group == number of dirs."""
    vt = VersionedTable(spark, str(tmp_path / "vt_purge_scan"))
    vt.overwrite(spark.range(10).select("id", (F.col("id") % 3).alias("subject")))
    vt.append(spark.range(10, 20).select("id", (F.col("id") % 3).alias("subject")))

    sc = spark.sparkContext
    sc.setJobGroup("purge-scan-count", "purge")
    try:
        out = vt.purge_rows("subject = 1")
    finally:
        sc.setJobGroup(None, None)
    st = sc.statusTracker()
    jobs = st.getJobIdsForGroup("purge-scan-count")
    assert out["rows_removed"] > 0
    assert out["dirs_rewritten"] == 2
    # per dir: exactly ONE data-pass job (the observe-metered filtered
    # write, task count = data partitions) — schema inference shows up
    # as 1-task footer reads, which touch no row data
    data_jobs = 0
    for jid in jobs:
        info = st.getJobInfo(jid)
        tasks = max(
            (st.getStageInfo(s).numTasks for s in info.stageIds
             if st.getStageInfo(s) is not None),
            default=0,
        )
        if tasks > 1:
            data_jobs += 1
    assert data_jobs == 2, f"expected 1 data pass per dir, saw {data_jobs}"
    assert len(jobs) <= 4


def test_purge_rows_removes_record_indexes(spark, tmp_path):
    """ADVICE r6 (high): record-level index files persist the raw key
    values being purged — purge must delete every record_index dir, pop
    the metadata entries, and rebuild the HEAD's index so index_lookup
    works over post-purge paths (never stale pre-purge files)."""
    vt = VersionedTable(spark, str(tmp_path / "vt_purge_rli"))
    vt.overwrite(spark.range(10).select("id", (F.col("id") % 3).alias("subject")))
    vt.build_record_index(["id"])          # index on v0
    vt.append(spark.range(10, 20).select("id", (F.col("id") % 3).alias("subject")))
    vt.build_record_index(["id"])          # index on v1 (head)
    idx_dirs_before = glob.glob(os.path.join(vt.location, "record_index-*"))
    assert len(idx_dirs_before) == 2

    vt.purge_rows("subject = 1")

    # v0's stale index dir is gone; only the rebuilt head index remains,
    # and it references only live post-purge files
    idx_dirs = glob.glob(os.path.join(vt.location, "record_index-*"))
    assert len(idx_dirs) == 1
    snaps = vt._snapshots()
    assert "record_index" not in snaps[0]
    head_idx = snaps[-1].get("record_index")
    assert head_idx is not None and head_idx["key_cols"] == ["id"]
    files = {
        r["__file"].removeprefix("file://").removeprefix("file:")
        for r in spark.read.parquet(head_idx["dir"]).select("__file").collect()
    }
    assert files and all(os.path.exists(f) for f in files)
    # purged subject absent from the index keys; lookups still work
    assert spark.read.parquet(head_idx["dir"]).filter("id % 3 = 1").count() == 0
    assert vt.index_lookup({"id": 6}).count() == 1
    assert vt.index_lookup({"id": 7}).count() == 0  # purged subject


def test_purge_rows_without_index_has_no_index_after(spark, tmp_path):
    """No index before the purge -> none after (no surprise rebuild)."""
    vt = VersionedTable(spark, str(tmp_path / "vt_purge_noidx"))
    vt.overwrite(spark.range(6).select("id", (F.col("id") % 2).alias("subject")))
    vt.purge_rows("subject = 1")
    assert all("record_index" not in s for s in vt._snapshots())
    assert not glob.glob(os.path.join(vt.location, "record_index-*"))


def test_vacuum_reclaims_record_index_dirs(spark, tmp_path):
    """A vacuumed snapshot's record-level index dir (raw key values!)
    must be deleted with its data; the kept head's index survives and
    dry-run reports without deleting."""
    vt = VersionedTable(spark, str(tmp_path / "vt_vac_rli"))
    vt.overwrite(spark.range(5).select("id"))          # v0
    vt.build_record_index(["id"])
    v0_idx = vt._snapshots()[0]["record_index"]["dir"]
    vt.overwrite(spark.range(8).select("id"))          # v1
    vt.build_record_index(["id"])
    v1_idx = vt._snapshots()[-1]["record_index"]["dir"]

    would = vt.vacuum(keep_last=1, dry_run=True)
    assert v0_idx in would and v1_idx not in would
    assert os.path.isdir(v0_idx)                       # dry run deletes nothing

    vt.vacuum(keep_last=1)
    assert not os.path.exists(v0_idx)
    assert os.path.isdir(v1_idx)
    assert vt.index_lookup({"id": 7}).count() == 1     # head index intact


def test_purge_cleans_crashed_purge_debris(spark, tmp_path):
    """*.__purge_tmp dirs left by a killed purge are reclaimed by the
    next purge (they are stale by construction under the writer lock)."""
    vt = VersionedTable(spark, str(tmp_path / "vt_purge_debris"))
    vt.overwrite(spark.range(6).select("id", (F.col("id") % 2).alias("subject")))
    stale = vt._snapshots()[0]["dir"] + ".__purge_tmp"
    os.makedirs(stale)
    with open(os.path.join(stale, "junk"), "w") as f:
        f.write("x")
    vt.purge_rows("subject = 1")
    assert not os.path.exists(stale)
    assert sorted(r["id"] for r in vt.read().collect()) == [0, 2, 4]


def test_remove_orphan_files(spark, tmp_path):
    """Orphan-artifact cleanup (Iceberg remove_orphan_files analog):
    unreferenced snapshot-shaped debris deletes after the grace window;
    referenced dirs, young debris, and unrecognized entries survive."""
    import time as _time

    vt = VersionedTable(spark, str(tmp_path / "vt_orphans"))
    vt.overwrite(spark.range(4).select("id"))
    live_dir = vt._snapshots()[0]["dir"]

    orphan = os.path.join(vt.location, "snapshot-00999")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-junk.parquet"), "w") as f:
        f.write("x")
    young = os.path.join(vt.location, "dv-00998")
    os.makedirs(young)
    stranger = os.path.join(vt.location, "my_notes")
    os.makedirs(stranger)
    old = _time.time() - 7200
    os.utime(orphan, (old, old))

    # dry run reports the aged orphan only, deletes nothing
    would = vt.remove_orphan_files(older_than_seconds=3600, dry_run=True)
    assert would == [orphan]
    assert os.path.isdir(orphan)

    got = vt.remove_orphan_files(older_than_seconds=3600)
    assert got == [orphan]
    assert not os.path.exists(orphan)
    assert os.path.isdir(young)        # inside grace window
    assert os.path.isdir(stranger)     # unrecognized: never touched
    assert os.path.isdir(live_dir)
    assert vt.read().count() == 4

    # SQL procedure surface
    from emr_on_eks_hudi_iceberg_delta_spark.operators.merge_sql import (
        run_dml,
    )

    os.makedirs(orphan)
    os.utime(orphan, (old, old))
    out = run_dml(
        spark,
        "CALL system.remove_orphan_files(table => 't', "
        "older_than_seconds => 3600)",
        tables={"t": vt},
    )
    assert [r["path"] for r in out.collect()] == [orphan]
    assert not os.path.exists(orphan)


def test_export_import_snapshot_verifies_digest(spark, tmp_path):
    from emr_on_eks_hudi_iceberg_delta_spark.operators.validate import (
        tables_equal,
    )
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import (
        VersionedTable,
        export_snapshot,
        import_snapshot,
    )

    src = VersionedTable(spark, str(tmp_path / "src"))
    src.overwrite(
        spark.range(500).selectExpr("id AS k", "concat('v', id) AS v")
    )
    exp = str(tmp_path / "exp")
    manifest = export_snapshot(src, exp)
    assert manifest["n_rows"] == 500 and manifest["digest_cols"] == ["k", "v"]

    imp = import_snapshot(spark, exp, str(tmp_path / "dst"))
    assert tables_equal(src.read(), imp.read(), ["k", "v"])
    assert [s["version"] for s in imp.history()] == [0]

    # tamper: delete one data file -> import must refuse
    import glob
    import os

    victim = sorted(glob.glob(exp + "/data/part-*.parquet"))[0]
    os.remove(victim)
    import pytest

    with pytest.raises(ValueError, match="digest mismatch"):
        import_snapshot(spark, exp, str(tmp_path / "dst2"))


def test_export_snapshot_time_travel_version(spark, tmp_path):
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import (
        VersionedTable,
        export_snapshot,
        import_snapshot,
    )

    src = VersionedTable(spark, str(tmp_path / "tt"))
    src.overwrite(spark.range(10).selectExpr("id AS k", "'a' AS v"))
    src.overwrite(spark.range(99).selectExpr("id AS k", "'b' AS v"))
    exp = str(tmp_path / "exp_v0")
    m = export_snapshot(src, exp, version=0)
    assert m["n_rows"] == 10 and m["source_version"] == 0
    imp = import_snapshot(spark, exp, str(tmp_path / "dst_v0"))
    assert imp.read().count() == 10
