"""Hudi MERGE_ON_READ table in Hudi's own storage layout
(sources/hudi_layout.py:HudiMorTable).

Reference parity: hudi/hudi_scd_script.py:13-18,33 selects CoW vs MoR
per run; README.md:157-160 queries the MoR table through its
``_rt`` / ``_ro`` views. These tests pin the deltacommit timeline, the
log-file slices, both views, and compaction.
"""

import os

import pytest
from pyspark.sql import functions as F

from emr_on_eks_hudi_iceberg_delta_spark.sources import (
    HudiCowTable,
    HudiMorTable,
)


def _base(spark, n=100):
    return spark.createDataFrame(
        [(i, 1, f"v{i}") for i in range(n)], "k int, ts int, val string"
    )


def _mk(spark, tmp_path, name="m"):
    t = HudiMorTable(
        spark, str(tmp_path / name),
        record_key="k", precombine_field="ts", n_file_groups=4,
    )
    i0 = t.bulk_insert(_base(spark))
    return t, i0


def test_upsert_appends_logs_without_touching_bases(spark, tmp_path):
    t, _ = _mk(spark, tmp_path)
    loc = t.location
    bases0 = {
        f: os.path.getmtime(os.path.join(loc, f))
        for f in os.listdir(loc)
        if f.endswith(".parquet") and ".log." not in f
        and not f.startswith("_")
    }
    t.upsert(
        spark.createDataFrame(
            [(i, 2, f"u{i}") for i in range(0, 20, 2)],
            "k int, ts int, val string",
        )
    )
    logs = [f for f in os.listdir(loc) if ".log." in f]
    assert logs  # the batch landed as log files...
    for f, mtime in bases0.items():  # ...and every base is untouched
        assert os.path.getmtime(os.path.join(loc, f)) == mtime
    # timeline: bulk insert + upsert are BOTH deltacommits
    hoodie = os.listdir(os.path.join(loc, ".hoodie"))
    assert sum(1 for f in hoodie if f.endswith(".deltacommit")) == 2


def test_ro_is_stale_rt_is_merged(spark, tmp_path):
    t, _ = _mk(spark, tmp_path)
    t.upsert(
        spark.createDataFrame(
            [(0, 2, "updated"), (500, 2, "new")],
            "k int, ts int, val string",
        )
    )
    ro = {r["k"]: r["val"] for r in t.read_optimized().collect()}
    rt = {r["k"]: r["val"] for r in t.read().collect()}
    assert ro[0] == "v0" and 500 not in ro  # _ro: pre-upsert state
    assert rt[0] == "updated" and rt[500] == "new" and len(rt) == 101


def test_precombine_wins_and_commit_time_breaks_ties(spark, tmp_path):
    t, _ = _mk(spark, tmp_path)
    # lower precombine than base -> base row survives the merge
    t.upsert(
        spark.createDataFrame([(1, 0, "stale")], "k int, ts int, val string")
    )
    # equal precombine in a LATER log -> latest writer wins
    t.upsert(
        spark.createDataFrame([(2, 1, "tie-late")], "k int, ts int, val string")
    )
    rt = {r["k"]: r["val"] for r in t.read().collect()}
    assert rt[1] == "v1"
    assert rt[2] == "tie-late"


def test_compaction_folds_logs_and_equalizes_views(spark, tmp_path):
    t, _ = _mk(spark, tmp_path)
    t.upsert(
        spark.createDataFrame(
            [(i, 2, f"u{i}") for i in range(10)], "k int, ts int, val string"
        )
    )
    rt_before = sorted(
        (r["k"], r["val"]) for r in t.read().collect()
    )
    ci = t.compact()
    assert ci is not None
    ro = sorted((r["k"], r["val"]) for r in t.read_optimized().collect())
    rt = sorted((r["k"], r["val"]) for r in t.read().collect())
    assert ro == rt == rt_before
    # compaction is a .commit (not a deltacommit), per the MoR timeline
    assert os.path.exists(
        os.path.join(t.location, ".hoodie", f"{ci}.commit")
    )
    # nothing left to compact
    assert t.compact() is None


def test_time_travel_and_incremental(spark, tmp_path):
    t, i0 = _mk(spark, tmp_path)
    i1 = t.upsert(
        spark.createDataFrame([(3, 2, "u3")], "k int, ts int, val string")
    )
    t.upsert(
        spark.createDataFrame([(4, 2, "u4")], "k int, ts int, val string")
    )
    assert t.read(instant=i0).count() == 100
    assert {r["k"]: r["val"] for r in t.read(instant=i1).collect()}[3] == "u3"
    inc = {r["k"] for r in t.read_incremental(i1).collect()}
    assert inc == {4}
    # compaction preserves original commit times: incremental after it
    ci = t.compact()
    assert t.read_incremental(ci).count() == 0


def test_reopen_and_type_guard(spark, tmp_path):
    t, _ = _mk(spark, tmp_path)
    again = HudiMorTable(spark, t.location)
    assert again.read().count() == 100
    with pytest.raises(ValueError, match="MERGE_ON_READ"):
        HudiCowTable(spark, t.location)


def test_hudi_instant_collision_refuses(spark, tmp_path):
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import (
        ConcurrentCommitError,
    )

    t, _ = _mk(spark, tmp_path, "occ")
    inst = t.instants()[-1]
    with pytest.raises(ConcurrentCommitError, match="another writer"):
        t._commit(inst, [], suffix=".deltacommit")


def test_exactly_once_streaming_upsert_sink(spark, tmp_path):
    from emr_on_eks_hudi_iceberg_delta_spark.sources.hudi_layout import (
        stream_to_hudi,
    )

    src = str(tmp_path / "src" / "data")
    spark.createDataFrame(
        [(i, 1, f"v{i}") for i in range(20)], "k int, ts int, val string"
    ).coalesce(1).write.parquet(src)
    loc = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    for _ in range(2):  # second run = checkpoint replay, no dups
        q = (
            stream_to_hudi(
                spark.readStream.schema(
                    "k int, ts int, val string"
                ).parquet(src),
                loc, ckpt,
                record_key="k", precombine_field="ts",
                table_cls=HudiMorTable,
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    t = HudiMorTable(spark, loc)
    assert t.read().count() == 20
    # direct replay check on the idempotency surface
    assert not t.upsert_idempotent(
        spark.createDataFrame([(0, 9, "dup")], "k int, ts int, val string"),
        "hudi-sink", 0,
    )


def test_cleaner_retains_latest_slices(spark, tmp_path):
    t, i0 = _mk(spark, tmp_path, "clean")
    t.upsert(
        spark.createDataFrame([(1, 2, "u1")], "k int, ts int, val string")
    )
    t.compact()  # slice 2 for the touched group
    t.upsert(
        spark.createDataFrame([(1, 3, "u1b")], "k int, ts int, val string")
    )
    would = t.clean(retain_slices=1, dry_run=True)
    assert would  # old base slice is reclaimable
    removed = t.clean(retain_slices=1)
    assert removed == would
    # current state still fully readable
    rt = {r["k"]: r["val"] for r in t.read().collect()}
    assert rt[1] == "u1b" and len(rt) == 100
    assert {r["k"] for r in t.read_optimized().collect()} == set(range(100))
    # time travel to the cleaned slice now fails loudly
    import pytest as _pytest

    with _pytest.raises(Exception):
        t.read(instant=i0).collect()


def test_cow_delete_rewrites_only_touched_groups(spark, tmp_path):
    c = HudiCowTable(
        spark, str(tmp_path / "cowdel"),
        record_key="k", precombine_field="ts", n_file_groups=4,
    )
    c.bulk_insert(_base(spark))
    i0 = c.instants()[0]
    assert c.delete("k = 99999") is None  # no match, no commit
    c.delete("k % 10 = 0")
    assert c.read().count() == 90
    assert c.read().filter("k % 10 = 0").count() == 0
    assert c.read(instant=i0).count() == 100  # time travel intact
    # deleting EVERYTHING leaves a readable empty table (explicit
    # empty slices — replay must not resurrect old files)
    c.delete("k >= 0")
    assert c.read().count() == 0


def test_mor_delete_is_a_log_tombstone(spark, tmp_path):
    t, _ = _mk(spark, tmp_path, "mordel")
    di = t.delete("k < 10")
    assert di is not None
    assert t.read().count() == 90
    # no base rewrite: the _ro view still serves the pre-delete state
    assert t.read_optimized().count() == 100
    # a LATER upsert of a tombstoned key resurrects it (latest wins)
    t.upsert(
        spark.createDataFrame([(5, 2, "back")], "k int, ts int, val string")
    )
    rt = {r["k"]: r["val"] for r in t.read().collect()}
    assert rt[5] == "back" and len(rt) == 91
    # compaction folds tombstones physically; marker never leaks
    t.compact()
    assert t.read_optimized().count() == 91
    assert "_hoodie_is_deleted" not in t.read().columns


def test_mor_delete_after_data_log_survives_schema_merge(spark, tmp_path):
    """ADVICE r9: a data log (no _hoodie_is_deleted) written BEFORE the
    tombstone log must not mask the marker column — the log read merges
    footers, so delete ordering never matters."""
    t = HudiMorTable(
        spark, str(tmp_path / "morder"),
        record_key="k", precombine_field="ts", n_file_groups=2,
    )
    t.bulk_insert(_base(spark, 20))
    # upsert first: creates data logs lexicographically BEFORE the
    # tombstone logs the delete writes
    t.upsert(
        spark.createDataFrame(
            [(i, 2, f"u{i}") for i in range(20)], "k int, ts int, val string"
        )
    )
    di = t.delete("k < 5")
    assert di is not None
    got = sorted(r["k"] for r in t.read().collect())
    assert got == list(range(5, 20))
    # and after compaction too
    t.compact()
    assert sorted(r["k"] for r in t.read_optimized().collect()) == list(
        range(5, 20)
    )


def test_rt_read_merges_only_log_bearing_groups(spark, tmp_path, monkeypatch):
    """r10: the _rt merge shuffles only HOT (log-bearing) groups;
    log-less groups' bases pass through outside the key shuffle."""
    t = HudiMorTable(
        spark, str(tmp_path / "hotcold"),
        record_key="k", precombine_field="ts", n_file_groups=4,
    )
    t.bulk_insert(_base(spark, 80))
    # all updates hit ONE key -> one hot group
    t.upsert(
        spark.createDataFrame([(5, 9, "hot")], "k int, ts int, val string")
    )
    calls = []
    real = HudiMorTable._read_slices

    def spy(self, slices, **kw):
        calls.append(sorted(slices))
        return real(self, slices, **kw)

    monkeypatch.setattr(HudiMorTable, "_read_slices", spy)
    got = {r["k"]: r["val"] for r in t.read().collect()}
    assert got[5] == "hot" and len(got) == 80
    # three reads: hot bases (1), logs (1), cold bases (3)
    sizes = sorted(len(c) for c in calls)
    assert sizes == [1, 1, 3]
