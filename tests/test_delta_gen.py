"""Delta generated columns (sources/delta_gen.py): declaration with
delta.generationExpression metadata, write-side compute/validate,
UPDATE/MERGE recompute, and hidden partition pruning through the
generation expression."""

import datetime as dt
import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emr_on_eks_hudi_iceberg_delta_spark.sources.delta_log import (
    DeltaLogTable,
)
from emr_on_eks_hudi_iceberg_delta_spark.sources import delta_gen  # noqa: F401
from emr_on_eks_hudi_iceberg_delta_spark.sources import delta_dml  # noqa: F401
from emr_on_eks_hudi_iceberg_delta_spark.sources.delta_gen import (
    GEN_KEY,
    generated_exprs,
)


def _rows(df, cols=None):
    if cols:
        df = df.select(*cols)
    return sorted(map(tuple, df.collect()))


@pytest.fixture()
def ts_df(spark):
    rows = [
        (
            i,
            dt.datetime(2024, 1, 1 + (i % 20), 6 + (i % 12), 30, 0),
            float(i) * 1.5,
        )
        for i in range(200)
    ]
    return spark.createDataFrame(rows, "id bigint, ts timestamp, v double")


def test_declare_compute_and_protocol(spark, tmp_path, ts_df):
    t = DeltaLogTable(spark, str(tmp_path / "g1"))
    t.overwrite_generated(
        ts_df,
        generated={"event_date": "CAST(ts AS DATE)"},
        partition_by=["event_date"],
    )
    got = t.read()
    assert "event_date" in got.columns
    assert (
        got.filter(
            F.col("event_date") != F.col("ts").cast("date")
        ).count()
        == 0
    )
    assert got.count() == 200
    # declaration is in the schema metadata; protocol is writer v4
    _, meta, _ = t._replay()
    assert generated_exprs(meta) == {"event_date": "CAST(ts AS DATE)"}
    assert t.current_protocol()["minWriterVersion"] >= 4
    # partition dirs carry the derived value
    assert any(
        "event_date=2024-01-05" in p for p in t.read().inputFiles()
    )


def test_append_computes_validates_and_refuses(spark, tmp_path, ts_df):
    t = DeltaLogTable(spark, str(tmp_path / "g2"))
    t.overwrite_generated(
        ts_df,
        generated={"event_date": "CAST(ts AS DATE)"},
        partition_by=["event_date"],
    )
    more = spark.createDataFrame(
        [(1000, dt.datetime(2024, 2, 2, 9, 0, 0), 1.0)],
        "id bigint, ts timestamp, v double",
    )
    t.append(more)  # omitted generated column -> computed
    assert t.read().filter("event_date = DATE'2024-02-02'").count() == 1
    ok = more.selectExpr(
        "id + 1 AS id", "ts", "v", "CAST(ts AS DATE) AS event_date"
    )
    t.append(ok)  # supplied-and-correct -> accepted
    bad = more.selectExpr(
        "id + 2 AS id", "ts", "v", "DATE'1999-01-01' AS event_date"
    )
    with pytest.raises(ValueError, match="generationExpression"):
        t.append(bad)
    # overwrite keeps declarations (and still computes)
    t.overwrite(ts_df, partition_by=["event_date"])
    _, meta, _ = t._replay()
    assert GEN_KEY in meta["schemaString"]
    assert t.read().count() == 200


def test_hidden_pruning_through_generated_partition(spark, tmp_path, ts_df):
    t = DeltaLogTable(spark, str(tmp_path / "g3"))
    t.overwrite_generated(
        ts_df,
        generated={"event_date": "CAST(ts AS DATE)"},
        partition_by=["event_date"],
    )
    all_files = t.files_matching([])
    lo = dt.datetime(2024, 1, 5, 0, 0, 0)
    hi = dt.datetime(2024, 1, 8, 23, 0, 0)
    flt = [("ts", ">=", lo), ("ts", "<=", hi)]
    pruned_files = t.files_matching_generated(flt)
    assert 0 < len(pruned_files) < len(all_files)
    got = t.read_generated(flt)
    want = t.read().filter(
        (F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi))
    )
    assert want.count() > 0
    assert _rows(got) == _rows(want)


def test_year_substring_and_cyclic_recognizers(spark, tmp_path):
    rows = [
        (i, dt.datetime(2020 + (i % 5), 1 + (i % 12), 3, 12, 0, 0),
         f"cat-{i % 4}-{i}")
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "id bigint, ts timestamp, code string")
    t = DeltaLogTable(spark, str(tmp_path / "g4"))
    t.overwrite_generated(
        df,
        generated={
            "y": "year(ts)",
            "m": "month(ts)",
            "c4": "substring(code, 1, 5)",
        },
        partition_by=["y", "c4"],
    )
    total = len(t.files_matching([]))
    # year: range prunes (order-preserving, numeric partition compare)
    f1 = [("ts", ">=", dt.datetime(2023, 1, 1))]
    assert 0 < len(t.files_matching_generated(f1)) < total
    assert _rows(t.read_generated(f1)) == _rows(
        t.read().filter(F.col("ts") >= F.lit(dt.datetime(2023, 1, 1)))
    )
    # substring prefix: equality prunes
    f2 = [("code", "==", "cat-2-50")]
    assert 0 < len(t.files_matching_generated(f2)) < total
    assert _rows(t.read_generated(f2)) == _rows(
        t.read().filter(F.col("code") == "cat-2-50")
    )
    # month is NOT a partition column here, so nothing prunes on it,
    # but the residual stays exact
    f3 = [("ts", "==", dt.datetime(2022, 3, 3, 12, 0, 0))]
    assert _rows(t.read_generated(f3)) == _rows(
        t.read().filter(F.col("ts") == F.lit(dt.datetime(2022, 3, 3, 12, 0)))
    )


def test_update_recomputes_and_forbids_direct_set(spark, tmp_path, ts_df):
    for mode in ("cow", "dv"):
        t = DeltaLogTable(spark, str(tmp_path / f"g5_{mode}"))
        t.overwrite_generated(
            ts_df,
            generated={"event_date": "CAST(ts AS DATE)"},
            partition_by=["event_date"],
        )
        with pytest.raises(ValueError, match="generated column"):
            t.update(
                "id = 3", {"event_date": "DATE'2030-01-01'"}, mode=mode
            )
        # moving the base column moves the generated partition value
        t.update(
            "id < 10",
            {"ts": "ts + INTERVAL 365 DAYS"},
            mode=mode,
        )
        got = t.read()
        assert (
            got.filter(
                F.col("event_date") != F.col("ts").cast("date")
            ).count()
            == 0
        )
        assert got.filter("event_date >= DATE'2024-12-31'").count() == 10
        assert got.count() == 200


def test_merge_computes_generated_for_inserts_and_updates(
    spark, tmp_path, ts_df
):
    t = DeltaLogTable(spark, str(tmp_path / "g6"))
    t.overwrite_generated(
        ts_df,
        generated={"event_date": "CAST(ts AS DATE)"},
        partition_by=["event_date"],
    )
    src = spark.createDataFrame(
        [
            (5, dt.datetime(2025, 6, 1, 1, 0, 0), 9.9),   # matched
            (9999, dt.datetime(2025, 7, 2, 2, 0, 0), 1.1),  # insert
        ],
        "id bigint, ts timestamp, v double",
    )
    with pytest.raises(ValueError, match="generated column"):
        t.merge_into(
            src, ["id"],
            when_matched_update={"event_date": "DATE'2030-01-01'"},
        )
    rep = t.merge_into(
        src, ["id"],
        when_matched_update={"ts": "s.ts", "v": "s.v"},
    )
    assert rep["rows_updated"] == 1 and rep["rows_inserted"] == 1
    got = t.read()
    assert (
        got.filter(
            F.col("event_date") != F.col("ts").cast("date")
        ).count()
        == 0
    )
    assert got.filter("event_date = DATE'2025-06-01'").count() == 1
    assert got.filter("event_date = DATE'2025-07-02'").count() == 1


def test_identity_allocation_dense_and_watermarked(spark, tmp_path):
    from emr_on_eks_hudi_iceberg_delta_spark.sources.delta_gen import (
        identity_cols,
    )

    df = spark.createDataFrame(
        [(f"u{i}", float(i)) for i in range(100)], "name string, v double"
    ).repartition(6)
    t = DeltaLogTable(spark, str(tmp_path / "i1"))
    t.overwrite_identity(df, identity={"rid": {"start": 10, "step": 2}})
    got = t.read()
    ids = sorted(r["rid"] for r in got.select("rid").collect())
    # dense block: start, start+step, ... unique, exactly N values
    assert ids == list(range(10, 10 + 2 * 100, 2))
    _, meta, _ = t._replay()
    assert identity_cols(meta)["rid"]["highWaterMark"] == 10 + 2 * 99
    assert t.current_protocol()["minWriterVersion"] >= 6
    # append continues above the watermark, no reuse
    t.append(
        spark.createDataFrame([("x", 1.0), ("y", 2.0)], "name string, v double")
    )
    ids2 = sorted(r["rid"] for r in t.read().select("rid").collect())
    assert len(ids2) == 102 and len(set(ids2)) == 102
    assert ids2[-2:] == [210, 212]
    # supplying the column refuses (GENERATED ALWAYS)
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        t.append(
            spark.createDataFrame(
                [("z", 3.0, 999)], "name string, v double, rid bigint"
            )
        )
    # overwrite keeps the declaration and keeps advancing (no reuse)
    t.overwrite(
        spark.createDataFrame([("o", 9.0)], "name string, v double")
    )
    only = t.read().collect()
    assert len(only) == 1 and only[0]["rid"] >= 214


def test_identity_dml_contract(spark, tmp_path):
    df = spark.createDataFrame(
        [(f"u{i}", float(i)) for i in range(30)], "name string, v double"
    )
    t = DeltaLogTable(spark, str(tmp_path / "i2"))
    t.overwrite_identity(df, identity={"rid": {}})
    with pytest.raises(ValueError, match="identity column"):
        t.update("v = 1.0", {"rid": "999"})
    t.update("v < 5.0", {"v": "v + 100"})
    got = t.read()
    assert got.count() == 30
    assert got.select("rid").distinct().count() == 30  # ids stable
    # merge: inserts allocate fresh ids above the watermark
    src = spark.createDataFrame(
        [("u3", 7.7), ("brand-new", 1.23)], "name string, v double"
    )
    rep = t.merge_into(src, ["name"], when_matched_update={"v": "s.v"})
    assert rep["rows_inserted"] == 1
    got2 = t.read()
    assert got2.count() == 31
    assert got2.select("rid").distinct().count() == 31
    new_id = got2.filter("name = 'brand-new'").first()["rid"]
    assert new_id == max(r["rid"] for r in got2.select("rid").collect())
    # a source that SUPPLIES the identity column refuses inserts
    bad = spark.createDataFrame(
        [("q", 1.0, 5)], "name string, v double, rid bigint"
    )
    with pytest.raises(ValueError, match="allowExplicitInsert"):
        t.merge_into(bad, ["name"])


def test_streaming_append_honors_generated_and_identity(spark, tmp_path, ts_df):
    """foreachBatch micro-batches (append_idempotent) run the same
    generated/identity contract as batch appends: the generated
    partition column is computed per batch and identity ids keep
    allocating above the watermark across batches."""
    from emr_on_eks_hudi_iceberg_delta_spark.sources.delta_log import (
        stream_to_delta_log,
    )

    # generated table fed by a stream
    t = DeltaLogTable(spark, str(tmp_path / "sg"))
    t.overwrite_generated(
        ts_df,
        generated={"event_date": "CAST(ts AS DATE)"},
        partition_by=["event_date"],
    )
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(900 + i, dt.datetime(2025, 3, 1 + i, 1, 0, 0), 1.0) for i in range(3)],
        "id bigint, ts timestamp, v double",
    ).write.parquet(src)
    q = stream_to_delta_log(
        spark.readStream.schema("id bigint, ts timestamp, v double")
        .parquet(src),
        str(tmp_path / "sg"),
        "genjob",
        str(tmp_path / "ck1"),
    )
    q.awaitTermination(60)
    got = t.read()
    assert got.count() == 203
    assert (
        got.filter(F.col("event_date") != F.col("ts").cast("date")).count()
        == 0
    )
    # identity table fed by a stream: dense ids continue per batch
    t2 = DeltaLogTable(spark, str(tmp_path / "si"))
    t2.overwrite_identity(
        spark.createDataFrame([("a",), ("b",)], "name string"),
        identity={"rid": {}},
    )
    src2 = str(tmp_path / "src2")
    spark.createDataFrame(
        [(f"s{i}",) for i in range(5)], "name string"
    ).write.parquet(src2)
    q2 = stream_to_delta_log(
        spark.readStream.schema("name string").parquet(src2),
        str(tmp_path / "si"),
        "idjob",
        str(tmp_path / "ck2"),
    )
    q2.awaitTermination(60)
    ids = sorted(r["rid"] for r in t2.read().select("rid").collect())
    assert ids == [1, 2, 3, 4, 5, 6, 7]


def test_restore_restores_schema_but_never_lowers_watermark(spark, tmp_path):
    """RESTORE rolls metadata back with the data — except identity
    high watermarks, which only ever go UP (lowering one would
    double-allocate after the next write, Delta's special case)."""
    from emr_on_eks_hudi_iceberg_delta_spark.sources.delta_gen import (
        identity_cols,
    )

    t = DeltaLogTable(spark, str(tmp_path / "r1"))
    t.overwrite_identity(
        spark.createDataFrame([("a",), ("b",)], "name string"),
        identity={"rid": {}},
    )  # v0: ids 1,2 ; hwm 2
    t.append(spark.createDataFrame([("c",), ("d",)], "name string"))
    # v1: ids 3,4 ; hwm 4
    t.append(
        spark.createDataFrame([("e", 1.5)], "name string, extra double"),
        merge_schema=True,
    )  # v2: schema gains `extra`; hwm 5
    t.restore(0)
    got = t.read()
    assert "extra" not in got.columns  # schema rolled back
    assert sorted(r["rid"] for r in got.collect()) == [1, 2]
    _, meta, _ = t._replay()
    assert identity_cols(meta)["rid"]["highWaterMark"] == 5  # never down
    t.append(spark.createDataFrame([("z",)], "name string"))
    ids = sorted(r["rid"] for r in t.read().select("rid").collect())
    assert ids == [1, 2, 6]  # fresh id above the preserved watermark


def test_declaration_refusals(spark, tmp_path, ts_df):
    t = DeltaLogTable(spark, str(tmp_path / "g7"))
    with pytest.raises(ValueError, match="reference itself"):
        t.overwrite_generated(ts_df, generated={"v2": "v2 + 1"})
    with pytest.raises(ValueError, match="already in the batch"):
        t.overwrite_generated(ts_df, generated={"v": "id * 2"})


def test_identity_nondeterministic_source_unique_nonnull(spark, tmp_path):
    """r11 advisor fix: the identity offset map is keyed by
    spark_partition_id over a source the write job re-evaluates —
    assign_identity now pins the layout (localCheckpoint) before
    counting, so a NON-DETERMINISTIC source (rand-keyed repartition)
    still allocates unique, non-null ids."""
    df = (
        spark.range(500)
        .withColumn("r", F.rand(seed=None))
        .repartition(11, "r")
        .selectExpr("CAST(id AS STRING) AS name", "r AS v")
    )
    t = DeltaLogTable(spark, str(tmp_path / "indet"))
    t.overwrite_identity(df, identity={"rid": {"start": 1, "step": 1}})
    got = t.read().select("rid").collect()
    ids = [r["rid"] for r in got]
    assert all(i is not None for i in ids)
    assert len(ids) == 500 and len(set(ids)) == 500
    assert sorted(ids) == list(range(1, 501))


def test_declarations_preserve_tblproperties_and_protocol(spark, tmp_path):
    """r11 self-review fix: declaring generated/identity columns on an
    existing NON-mapped table keeps the table id, tblproperties
    (CDF/UniForm/constraints config), and never downgrades an active
    feature protocol."""
    from emr_on_eks_hudi_iceberg_delta_spark.sources import uniform  # noqa: F401

    dt = DeltaLogTable(spark, str(tmp_path / "keepcfg"))
    dt.overwrite(
        spark.range(20).selectExpr("id AS k", "id * 2.0 AS v")
    )
    dt.enable_uniform()
    _, meta0, _ = dt._replay()
    dt.delete("k = 0", mode="dv")  # activates the (3,7) DV protocol
    proto0 = dt.current_protocol()
    assert "deletionVectors" in proto0["writerFeatures"]
    dt.optimize()  # purge DVs so the declaration overwrite is clean
    dt.overwrite_generated(
        spark.range(20).selectExpr("id AS k", "id * 2.0 AS v"),
        generated={"b": "k % 10"},
    )
    _, meta1, _ = dt._replay()
    assert meta1["id"] == meta0["id"]
    assert (meta1["configuration"] or {}).get(
        "delta.universalFormat.enabledFormats"
    ) == "iceberg"
    proto1 = dt.current_protocol()
    assert "generatedColumns" in proto1["writerFeatures"]
    assert "deletionVectors" in proto1["writerFeatures"]  # kept
    # the UniForm config survived the declaration commit (pre-fix it
    # was silently dropped and sync raised "not enabled"), and the
    # mirror evolves through the added generated column
    assert dt.sync_uniform() is not None
    from emr_on_eks_hudi_iceberg_delta_spark.sources.iceberg_layout import (
        IcebergTable,
    )

    ice = IcebergTable(spark, dt.location)
    assert sorted(ice.read().columns) == ["b", "k", "v"]
    assert ice.read().count() == 20
