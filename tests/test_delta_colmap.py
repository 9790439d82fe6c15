"""Delta column mapping, name mode (sources/delta_colmap.py):
rename/drop column evolution with zero data rewrites, physical-name
scans, protocol feature declaration, and checkpoint carry.

Reference parity: delta/delta_scd_script.py runs on a Delta runtime
where ALTER TABLE ... RENAME COLUMN works once
delta.columnMapping.mode = 'name'; these tests pin the log-native
implementation to PROTOCOL.md's Column Mapping section.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from emr_on_eks_hudi_iceberg_delta_spark.sources import DeltaLogTable


def _table(spark, tmp_path, name="t", n=100, files=3):
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).alias("g"),
        F.concat(F.lit("v"), F.col("id")).alias("label"),
    )
    dt = DeltaLogTable(spark, str(tmp_path / name))
    dt.overwrite(df.repartition(files))
    return dt


def test_rename_serves_old_files_without_rewrite(spark, tmp_path):
    dt = _table(spark, tmp_path, "ren")
    live0, _, _ = dt._replay()
    dt.enable_column_mapping()
    dt.rename_column("label", "doc_label")
    live1, _, _ = dt._replay()
    assert set(live0) == set(live1)  # zero data files rewritten
    got = dt.read()
    assert got.columns == ["k", "g", "doc_label"]
    rows = {r["k"]: r["doc_label"] for r in got.collect()}
    assert rows[7] == "v7" and len(rows) == 100
    # physical name is immutable: the field still maps to 'label'
    _, meta, _ = dt._replay()
    schema = json.loads(meta["schemaString"])
    f = [x for x in schema["fields"] if x["name"] == "doc_label"][0]
    assert f["metadata"]["delta.columnMapping.physicalName"] == "label"


def test_rename_refused_without_mapping(spark, tmp_path):
    dt = _table(spark, tmp_path, "refuse")
    with pytest.raises(ValueError, match="requires column mapping"):
        dt.rename_column("label", "x")
    with pytest.raises(ValueError, match="requires column mapping"):
        dt.drop_column("label")


def test_protocol_declares_column_mapping(spark, tmp_path):
    dt = _table(spark, tmp_path, "proto")
    dt.enable_column_mapping()
    p = dt.current_protocol()
    assert p["minReaderVersion"] == 3 and p["minWriterVersion"] == 7
    assert "columnMapping" in p["readerFeatures"]
    assert "columnMapping" in p["writerFeatures"]
    # legacy-implied writer features preserved by the merge
    assert {"appendOnly", "invariants"} <= set(p["writerFeatures"])
    cfg = dt._replay()[1]["configuration"]
    assert cfg["delta.columnMapping.mode"] == "name"
    assert cfg["delta.columnMapping.maxColumnId"] == "3"


def test_append_after_rename_writes_physical_names(spark, tmp_path):
    import pyarrow.parquet as pq

    dt = _table(spark, tmp_path, "append", n=10, files=1)
    dt.enable_column_mapping()
    dt.rename_column("label", "tag")
    dt.append(
        spark.createDataFrame(
            [(100, 0, "new")], "k bigint, g bigint, tag string"
        )
    )
    got = {r["k"]: r["tag"] for r in dt.read().collect()}
    assert got[100] == "new" and got[3] == "v3" and len(got) == 11
    # the NEW file stores the PHYSICAL column name ('label')
    live, _, _ = dt._replay()
    newest = max(live.values(), key=lambda a: a["modificationTime"])
    cols = pq.read_schema(
        os.path.join(dt.location, newest["path"])
    ).names
    assert "label" in cols and "tag" not in cols


def test_merge_schema_append_on_mapped_table_gets_fresh_id(
    spark, tmp_path
):
    dt = _table(spark, tmp_path, "evolve", n=10, files=1)
    dt.enable_column_mapping()
    dt.append(
        spark.createDataFrame(
            [(200, 1, "x", 3.5)],
            "k bigint, g bigint, label string, score double",
        ),
        merge_schema=True,
    )
    _, meta, _ = dt._replay()
    schema = json.loads(meta["schemaString"])
    f = [x for x in schema["fields"] if x["name"] == "score"][0]
    assert f["metadata"]["delta.columnMapping.id"] == 4
    assert f["metadata"][
        "delta.columnMapping.physicalName"
    ].startswith("col-")
    assert meta["configuration"]["delta.columnMapping.maxColumnId"] == "4"
    rows = {r["k"]: r["score"] for r in dt.read().collect()}
    assert rows[200] == 3.5 and rows[3] is None


def test_drop_column_is_metadata_only(spark, tmp_path):
    dt = _table(spark, tmp_path, "drop")
    live0, _, _ = dt._replay()
    dt.enable_column_mapping()
    dt.drop_column("label")
    live1, _, _ = dt._replay()
    assert set(live0) == set(live1)
    got = dt.read()
    assert got.columns == ["k", "g"]
    assert got.count() == 100
    with pytest.raises(ValueError, match="no such column"):
        dt.drop_column("label")


def test_checkpoint_carries_mapping(spark, tmp_path):
    dt = _table(spark, tmp_path, "ckpt")
    dt.enable_column_mapping()
    dt.rename_column("g", "bucket")
    dt.write_checkpoint()
    dt.clean_log()
    # replay now seeds from the checkpoint — mapping must survive
    again = DeltaLogTable(spark, dt.location)
    got = again.read()
    assert got.columns == ["k", "bucket", "label"]
    assert got.count() == 100
    assert got.filter("bucket = 2").count() == 20


def test_time_travel_serves_pre_rename_schema_values(spark, tmp_path):
    dt = _table(spark, tmp_path, "tt", n=20, files=1)
    dt.enable_column_mapping()          # v1
    dt.rename_column("label", "name2")  # v2
    # time travel to v0 reads with the THEN-current metadata
    assert dt.read(version=0).columns == ["k", "g", "label"]
    assert dt.read(version=2).columns == ["k", "g", "name2"]
    assert dt.read(version=0).count() == 20


def test_optimize_on_mapped_table_keeps_physical_names(spark, tmp_path):
    dt = _table(spark, tmp_path, "opt", n=60, files=4)
    dt.enable_column_mapping()
    dt.rename_column("label", "txt")
    dt.optimize(target_files=1)
    got = dt.read()
    assert got.columns == ["k", "g", "txt"]
    assert got.count() == 60
    live, _, _ = dt._replay()
    assert len(live) == 1


def test_overwrite_on_mapped_tables(spark, tmp_path):
    """r10: matching-schema DATA overwrite keeps the mapped schema
    (ids/physical names survive, rename still serves). r11: a
    schema-CHANGING overwrite reconciles by logical name — retained
    columns keep their ids/physical names, new columns get fresh
    ones, and the mapping machinery keeps working afterwards."""
    import json as _json

    dt = _table(spark, tmp_path, "refu2", n=10, files=1)
    dt.enable_column_mapping()
    dt.rename_column("label", "txt")
    dt.overwrite(
        spark.createDataFrame(
            [(1, 0, "fresh")], "k bigint, g bigint, txt string"
        )
    )
    got = dt.read().collect()
    assert len(got) == 1 and got[0]["txt"] == "fresh"
    # mapping survived: a further rename is still metadata-only
    dt.rename_column("txt", "txt2")
    assert dt.read().columns == ["k", "g", "txt2"]
    _, meta_before, _ = dt._replay()
    phys_before = {
        f["name"]: f["metadata"]["delta.columnMapping.physicalName"]
        for f in _json.loads(meta_before["schemaString"])["fields"]
    }
    # r11: SCHEMA-CHANGING overwrite — drops g/txt2, adds extra
    dt.overwrite(
        spark.createDataFrame(
            [(7, "new")], "k bigint, extra string"
        )
    )
    assert dt.read().columns == ["k", "extra"]
    assert dt.read().collect()[0]["extra"] == "new"
    _, meta_after, _ = dt._replay()
    fields = {
        f["name"]: f["metadata"]
        for f in _json.loads(meta_after["schemaString"])["fields"]
    }
    # retained column kept its physical name; new column got col-<uuid>
    assert (
        fields["k"]["delta.columnMapping.physicalName"]
        == phys_before["k"]
    )
    assert fields["extra"][
        "delta.columnMapping.physicalName"
    ].startswith("col-")
    # the mapping machinery still works on the new shape
    dt.rename_column("extra", "extra2")
    assert dt.read().columns == ["k", "extra2"]
    assert dt.read().count() == 1
    with pytest.raises(ValueError, match="enable_column_mapping"):
        dt.set_table_properties({"delta.columnMapping.mode": "name"})


def test_generated_and_identity_on_mapped_tables(spark, tmp_path):
    """r11 (both were refusals): declaring generated / identity
    columns on a column-mapped table works — the declarations ride
    reconciled field metadata, files store physical names, the
    protocol unions features instead of downgrading, and rename
    keeps serving afterwards."""
    import json as _json

    dt = _table(spark, tmp_path, "genmap", n=20, files=2)
    dt.enable_column_mapping()
    dt.rename_column("label", "txt")
    proto_mapped = dt.current_protocol()
    assert "columnMapping" in proto_mapped["writerFeatures"]
    dt.overwrite_generated(
        spark.createDataFrame(
            [(i, i % 3, f"v{i}") for i in range(12)],
            "k bigint, g bigint, txt string",
        ),
        generated={"gbucket": "g % 2"},
    )
    got = dt.read()
    assert sorted(got.columns) == ["g", "gbucket", "k", "txt"]
    assert all(
        r["gbucket"] == r["g"] % 2 for r in got.collect()
    )
    proto = dt.current_protocol()
    assert "generatedColumns" in proto["writerFeatures"]
    assert "columnMapping" in proto["writerFeatures"]  # not downgraded
    _, meta, _ = dt._replay()
    fmd = {
        f["name"]: f["metadata"]
        for f in _json.loads(meta["schemaString"])["fields"]
    }
    assert fmd["gbucket"][
        "delta.columnMapping.physicalName"
    ].startswith("col-")
    # appends keep computing the generated column; rename still works
    dt.append(
        spark.createDataFrame(
            [(100, 5, "x")], "k bigint, g bigint, txt string"
        )
    )
    assert dt.read().filter("k = 100").collect()[0]["gbucket"] == 1
    dt.rename_column("gbucket", "gb2")
    assert "gb2" in dt.read().columns

    # identity declaration on a mapped table
    di = _table(spark, tmp_path, "idmap", n=10, files=1)
    di.enable_column_mapping()
    di.rename_column("label", "txt")
    di.overwrite_identity(
        spark.createDataFrame(
            [(i, 0, f"v{i}") for i in range(10)],
            "k bigint, g bigint, txt string",
        ),
        identity={"rid": {"start": 5, "step": 3}},
    )
    ids = sorted(r["rid"] for r in di.read().select("rid").collect())
    assert ids == list(range(5, 5 + 3 * 10, 3))
    proto = di.current_protocol()
    assert "identityColumns" in proto["writerFeatures"]
    assert "columnMapping" in proto["writerFeatures"]
    # append allocates above the watermark, mapping intact
    di.append(
        spark.createDataFrame([(99, 1, "y")], "k bigint, g bigint, txt string")
    )
    ids2 = sorted(r["rid"] for r in di.read().select("rid").collect())
    assert len(ids2) == 11 and len(set(ids2)) == 11 and ids2[-1] == 35
    di.rename_column("rid", "row_id")
    assert "row_id" in di.read().columns
    # checkpoint carries the combined state (mapping + identity)
    di.write_checkpoint()
    assert di.read().count() == 11
    ids3 = sorted(
        r["row_id"] for r in di.read().select("row_id").collect()
    )
    assert ids3 == ids2


def test_dml_works_on_mapped_tables(spark, tmp_path):
    """r10: DELETE (cow + dv), UPDATE, and MERGE INTO run on mapped
    tables — scans translate physical->logical, rewrites and DV adds
    keep physical names, results read back by logical name."""
    import pyarrow.parquet as pq

    dt = _table(spark, tmp_path, "dmlmap", n=100, files=3)
    dt.enable_column_mapping()
    dt.rename_column("label", "txt")
    rep = dt.delete("k < 10")                      # CoW
    assert rep["rows_deleted"] == 10
    assert dt.read().count() == 90
    rep = dt.delete("k >= 90", mode="dv")          # MoR
    assert rep["rows_deleted"] == 10
    assert dt.read().count() == 80
    rep = dt.update("k = 50", {"txt": "'updated'"})
    assert rep["rows_updated"] == 1
    got = {r["k"]: r["txt"] for r in dt.read().collect()}
    assert got[50] == "updated" and got[49] == "v49"
    # rewritten files store PHYSICAL names
    live, _, _ = dt._replay()
    newest = max(live.values(), key=lambda a: a["modificationTime"])
    cols = pq.read_schema(
        os.path.join(dt.location, newest["path"])
    ).names
    assert "label" in cols and "txt" not in cols
    # MERGE over the renamed column
    src = spark.createDataFrame(
        [(50, 9, "merged"), (500, 0, "new")],
        "k bigint, g bigint, txt string",
    )
    rep = dt.merge_into(
        src, ["k"], when_matched_update={"txt": "s.txt"}
    )
    assert rep["rows_updated"] == 1 and rep["rows_inserted"] == 1
    got = {r["k"]: r["txt"] for r in dt.read().collect()}
    assert got[50] == "merged" and got[500] == "new"
    assert len(got) == 81


def test_cdf_on_mapped_tables(spark, tmp_path):
    """r10: CDF change files store physical names; table_changes
    serves logical names."""
    dt = _table(spark, tmp_path, "cdfmap", n=20, files=1)
    dt.set_table_properties({"delta.enableChangeDataFeed": "true"})
    dt.enable_column_mapping()
    dt.rename_column("label", "txt")
    v = dt.update("k = 3", {"txt": "'x'"})["version"]
    ch = dt.table_changes(v, v)
    assert "txt" in ch.columns
    kinds = {r["_change_type"] for r in ch.collect()}
    assert kinds == {"update_preimage", "update_postimage"}


def test_stats_skipping_translates_to_physical(spark, tmp_path):
    dt = _table(spark, tmp_path, "skip", n=400, files=4)
    dt.optimize(target_files=4, zorder_by=["k"])
    dt.enable_column_mapping()
    dt.rename_column("k", "key_id")
    matched = dt.files_matching([("key_id", "<", 100)])
    live, _, _ = dt._replay()
    assert 1 <= len(matched) < len(live)  # skipping still effective
    got = dt.read_filtered([("key_id", "<", 100)])
    assert got.count() == 100
    assert got.columns == ["key_id", "g", "label"]


def test_partitioned_mapped_table_roundtrip(spark, tmp_path):
    """r10: partitioned tables under column mapping — rename of a
    partition column is metadata-only; reads, pruned reads (logical
    keys in the predicate), appends, and partitioned OPTIMIZE all
    work through physical partitionValues."""
    dt = DeltaLogTable(spark, str(tmp_path / "pmap"))
    dt.overwrite(
        spark.createDataFrame(
            [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "b", 40)],
            "k int, seg string, v int",
        ),
        partition_by=["seg"],
    )
    dt.enable_column_mapping()
    dt.rename_column("seg", "segment")
    got = dt.read()
    assert sorted(got.columns) == ["k", "segment", "v"]
    assert got.count() == 4
    # pruned read with the LOGICAL key
    pr = dt.read_where(lambda pv: pv.get("segment") == "b")
    assert sorted(r["k"] for r in pr.collect()) == [3, 4]
    # append after the rename: physical dirs, logical read-back
    dt.append(
        spark.createDataFrame(
            [(5, "b", 50)], "k int, segment string, v int"
        )
    )
    pr2 = dt.read_where(lambda pv: pv.get("segment") == "b")
    assert sorted(r["k"] for r in pr2.collect()) == [3, 4, 5]
    # partitioned OPTIMIZE keeps physical names and contents
    dt.optimize()
    assert dt.read().count() == 5
    assert sorted(
        r["k"] for r in dt.read_where(
            lambda pv: pv.get("segment") == "a"
        ).collect()
    ) == [1, 2]


def test_generated_pruning_on_mapped_table(spark, tmp_path):
    """r11: hidden-partition pruning through generated columns works
    on a MAPPED table — partitionValues carry PHYSICAL keys, and the
    pruning decision resolves them (it used to silently keep every
    file: safe, but no skipping)."""
    import datetime as _dt

    dt = DeltaLogTable(spark, str(tmp_path / "genprune"))
    df = spark.createDataFrame(
        [
            (i, _dt.datetime(2020 + (i % 4), 1 + (i % 12), 5))
            for i in range(40)
        ],
        "k long, ts timestamp",
    )
    dt.overwrite(df)
    dt.enable_column_mapping()
    dt.rename_column("k", "key")
    dt.overwrite_generated(
        df.selectExpr("k AS key", "ts"),
        generated={"y": "year(ts)"},
        partition_by=["y"],
    )
    all_files = set(dt._replay()[0])
    kept = dt.files_matching_generated(
        [("ts", ">=", _dt.datetime(2023, 1, 1))]
    )
    assert 0 < len(kept) < len(all_files)  # skipping engaged
    got = dt.read_generated([("ts", ">=", _dt.datetime(2023, 1, 1))])
    want = dt.read().filter(F.col("ts") >= F.lit(_dt.datetime(2023, 1, 1)))
    assert sorted(map(tuple, got.select("key", "ts", "y").collect())) == sorted(
        map(tuple, want.select("key", "ts", "y").collect())
    )
