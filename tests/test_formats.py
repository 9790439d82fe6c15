"""Source-format breadth: ORC and JSON-lines round-trips preserve values
exactly; malformed JSON is quarantined, not silently nulled into the batch.
"""

import os
import tempfile

from pyspark.sql import functions as F

from emr_on_eks_hudi_iceberg_delta_spark.sources.formats import (
    read_json_lines,
    read_orc,
    write_json_lines,
    write_orc,
)
from emr_on_eks_hudi_iceberg_delta_spark.sources.parquet import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_orc_roundtrip_exact(spark):
    o = load_table(spark, SF_DIR, "orders")
    path = tempfile.mkdtemp(prefix="orc_t_")
    write_orc(o, path)
    back = read_orc(spark, path, o.schema)
    assert back.schema == o.schema
    assert back.exceptAll(o).count() == 0 and o.exceptAll(back).count() == 0


def test_json_roundtrip_exact(spark):
    d = load_table(spark, SF_DIR, "documents")
    path = tempfile.mkdtemp(prefix="jsonl_t_")
    write_json_lines(d, path)
    back = read_json_lines(spark, path, d.schema)
    assert back.exceptAll(d).count() == 0 and d.exceptAll(back).count() == 0


def test_json_corrupt_records_quarantined(spark):
    d = load_table(spark, SF_DIR, "nation")
    path = tempfile.mkdtemp(prefix="jsonl_bad_")
    write_json_lines(d, path)
    # inject a malformed line as its own file (appending to a part file
    # would invalidate its Hadoop .crc sidecar)
    with open(os.path.join(path, "part-99999-bad.json"), "w") as fh:
        fh.write('{"n_nationkey": "not-a-number", "n_name": broken\n')
    # Spark disallows referencing ONLY the corrupt column from a raw file
    # scan (the parser would never be asked to fail); cache materializes
    # the parse so the quarantine filter is queryable
    back = read_json_lines(spark, path, d.schema, corrupt_col="_corrupt").cache()
    bad = back.filter(F.col("_corrupt").isNotNull())
    good = back.filter(F.col("_corrupt").isNull())
    assert bad.count() == 1
    assert good.count() == d.count()
    # the malformed line is preserved verbatim for the dead-letter sink
    assert "not-a-number" in bad.collect()[0]["_corrupt"]


# -- Spark 4 Python DataSource (vtable format) ------------------------------


def test_vtable_datasource_reads_head_and_versions(spark, tmp_path):
    from emr_on_eks_hudi_iceberg_delta_spark.sources.datasource import (
        register_vtable_source,
    )
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import VersionedTable

    register_vtable_source(spark)
    loc = str(tmp_path / "vt")
    vt = VersionedTable(spark, loc)
    vt.overwrite(spark.range(30).selectExpr("id", "id * 2 AS v"))
    vt.overwrite(spark.range(10).selectExpr("id", "id * 3 AS v"))
    head = spark.read.format("vtable").option("location", loc).load()
    assert head.count() == 10
    assert head.schema.simpleString() == "struct<id:bigint,v:bigint>"
    v0 = (
        spark.read.format("vtable")
        .option("location", loc)
        .option("version", 0)
        .load()
    )
    assert v0.count() == 30


def test_vtable_datasource_refuses_pending_mor_state(spark, tmp_path):
    import pytest

    from emr_on_eks_hudi_iceberg_delta_spark.sources.datasource import (
        register_vtable_source,
    )
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import VersionedTable

    register_vtable_source(spark)
    loc = str(tmp_path / "vt_mor")
    vt = VersionedTable(spark, loc)
    vt.overwrite(spark.range(20).selectExpr("id", "id AS v"))
    vt.delete_where_deferred("id >= 10", key_cols=["id"])
    with pytest.raises(Exception, match="merge-on-read"):
        spark.read.format("vtable").option("location", loc).load().count()
    # compaction folds the tombstones; the source works again
    vt.compact()
    assert spark.read.format("vtable").option("location", loc).load().count() == 10


def test_vtable_datasource_prunes_files_via_stats(spark, tmp_path):
    """Filter pushdown through the Python DataSource: with collected
    min/max stats and range-clustered files, a comparison filter prunes
    whole files at planning time — and results stay exact because Spark
    re-applies every filter row-level."""
    from emr_on_eks_hudi_iceberg_delta_spark.sources.datasource import (
        _pruned_files,
        _resolve_snapshot,
        register_vtable_source,
    )
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import VersionedTable

    register_vtable_source(spark)
    loc = str(tmp_path / "vt_prune")
    vt = VersionedTable(spark, loc)
    vt.overwrite(spark.range(1000).selectExpr("id", "id % 7 AS v"))
    vt.compact(target_partitions=8, cluster_by=["id"])
    vt.compute_stats(["id"])
    snap = _resolve_snapshot({"location": loc})
    all_files = _pruned_files(snap, [])
    hit_files = _pruned_files(snap, [("id", ">=", 900)])
    assert len(all_files) == 8
    assert len(hit_files) < len(all_files)  # pruning actually happened
    # end-to-end: pushed filter + exact results
    df = (
        spark.read.format("vtable")
        .option("location", loc)
        .load()
        .filter("id >= 900")
    )
    assert df.count() == 100
    assert df.agg({"id": "min"}).first()[0] == 900


def test_vtable_datasource_write_roundtrip_and_append(spark, tmp_path):
    """df.write.format("vtable"): overwrite creates snapshot v0, append
    hard-links prior files + adds staged ones (new snapshot, zero copy),
    and both states stay addressable by version through the reader AND
    through VersionedTable (one shared commit protocol)."""
    from emr_on_eks_hudi_iceberg_delta_spark.sources.datasource import (
        register_vtable_source,
    )
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import VersionedTable

    register_vtable_source(spark)
    loc = str(tmp_path / "vtw")
    spark.range(100).selectExpr("id", "id * 2 AS v").write.format(
        "vtable"
    ).option("location", loc).mode("overwrite").save()
    spark.range(100, 130).selectExpr("id", "id * 2 AS v").write.format(
        "vtable"
    ).option("location", loc).mode("append").save()
    head = spark.read.format("vtable").option("location", loc).load()
    assert head.count() == 130
    assert (
        spark.read.format("vtable").option("location", loc).option("version", 0).load().count()
        == 100
    )
    # interoperable with the table store API (same pointer protocol)
    vt = VersionedTable(spark, loc)
    assert vt.read().count() == 130
    assert len(vt.history()) == 2
    # vacuum with hard-linked files: dropping v0 must not corrupt v1
    vt.vacuum(keep_last=1)
    assert vt.read().count() == 130


def test_vtable_writer_append_refuses_pending_mor(spark, tmp_path):
    import pytest

    from emr_on_eks_hudi_iceberg_delta_spark.sources.datasource import (
        register_vtable_source,
    )
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import VersionedTable

    register_vtable_source(spark)
    loc = str(tmp_path / "vtw_mor")
    vt = VersionedTable(spark, loc)
    vt.overwrite(spark.range(20).selectExpr("id", "id AS v"))
    vt.delete_where_deferred("id >= 10", key_cols=["id"])
    with pytest.raises(Exception, match="merge-on-read"):
        spark.range(5).selectExpr("id", "id AS v").write.format(
            "vtable"
        ).option("location", loc).mode("append").save()


def test_vtable_stream_source_replays_appends(spark, tmp_path):
    """readStream.format("vtable"): each append commit becomes exactly one
    micro-batch of its added rows; the initial batch replays the table;
    restart from checkpoint picks up only new commits."""
    from emr_on_eks_hudi_iceberg_delta_spark.sources.datasource import (
        register_vtable_source,
    )

    register_vtable_source(spark)
    loc = str(tmp_path / "vts")
    ckpt = str(tmp_path / "vts_ckpt")

    def write(lo, hi, mode):
        spark.range(lo, hi).selectExpr("id", "id * 2 AS v").write.format(
            "vtable"
        ).option("location", loc).mode(mode).save()

    out = str(tmp_path / "vts_out")
    write(0, 50, "overwrite")
    write(50, 80, "append")

    def drain():
        q = (
            spark.readStream.format("vtable")
            .option("location", loc)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    assert spark.read.parquet(out).count() == 80
    # two more commits -> restart drains ONLY the new rows
    write(80, 90, "append")
    write(90, 95, "append")
    drain()
    assert spark.read.parquet(out).count() == 95
    assert spark.read.parquet(out).select("id").distinct().count() == 95


def test_vtable_stream_source_refuses_rewrites(spark, tmp_path):
    import pytest

    from emr_on_eks_hudi_iceberg_delta_spark.sources.datasource import (
        register_vtable_source,
    )

    register_vtable_source(spark)
    loc = str(tmp_path / "vts_rw")

    def write(lo, hi, mode):
        spark.range(lo, hi).selectExpr("id", "id * 2 AS v").write.format(
            "vtable"
        ).option("location", loc).mode(mode).save()

    write(0, 10, "overwrite")
    write(0, 5, "overwrite")  # second overwrite = rewrite, not append
    with pytest.raises(Exception, match="not an append"):
        q = (
            spark.readStream.format("vtable")
            .option("location", loc)
            .load()
            .writeStream.format("memory")
            .queryName("vts_rw_sink")
            .option("checkpointLocation", str(tmp_path / "vts_rw_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


def test_vtable_stream_writer_end_to_end(spark, tmp_path):
    """Full kappa loop inside the format: a file stream writes INTO a
    vtable via writeStream (one append commit per micro-batch,
    exactly-once batch ids), and the result equals the batch input; the
    written table is itself streamable (append-only by construction)."""
    from emr_on_eks_hudi_iceberg_delta_spark.sources.datasource import (
        register_vtable_source,
    )
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import VersionedTable

    register_vtable_source(spark)
    src = str(tmp_path / "src")
    loc = str(tmp_path / "sink_vt")
    spark.range(200).selectExpr("id", "id % 5 AS v").repartition(3).write.parquet(src)
    q = (
        spark.readStream.schema("id long, v long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.format("vtable")
        .option("location", loc)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    vt = VersionedTable(spark, loc)
    assert vt.read().count() == 200
    assert len(vt.history()) == 3  # one commit per micro-batch
    # every commit carries its exactly-once batch id
    assert [s["txn"]["version"] for s in vt.history()] == [0, 1, 2]
    # the sink's output is itself a valid stream source
    out = (
        spark.readStream.format("vtable")
        .option("location", loc)
        .load()
        .writeStream.format("memory")
        .queryName("vtsw_roundtrip")
        .trigger(availableNow=True)
        .start()
    )
    out.awaitTermination()
    assert spark.table("vtsw_roundtrip").count() == 200


def test_vtable_datasource_timestamp_time_travel(spark, tmp_path):
    import time

    from emr_on_eks_hudi_iceberg_delta_spark.sources.datasource import (
        register_vtable_source,
    )
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import VersionedTable

    register_vtable_source(spark)
    loc = str(tmp_path / "vt_ts")
    vt = VersionedTable(spark, loc)
    vt.overwrite(spark.range(40).selectExpr("id"))
    time.sleep(1.1)  # let the whole-second mark land after the commit
    mark = time.strftime("%Y-%m-%d %H:%M:%S", time.gmtime())
    time.sleep(1.1)
    vt.overwrite(spark.range(10).selectExpr("id"))
    at = (
        spark.read.format("vtable")
        .option("location", loc)
        .option("timestamp", mark)
        .load()
    )
    assert at.count() == 40  # the pre-mark snapshot
    head = spark.read.format("vtable").option("location", loc).load()
    assert head.count() == 10


# ------------------------------ Arrow IPC -----------------------------------

def test_arrow_ipc_roundtrip_values_and_nulls(spark, tmp_path):
    from emr_on_eks_hudi_iceberg_delta_spark.sources.formats import (
        read_arrow_ipc,
        write_arrow_ipc,
    )

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, None), (3, "c", -0.25)],
        "k bigint, s string, x double",
    )
    loc = str(tmp_path / "ipc")
    paths = write_arrow_ipc(df.repartition(2), loc)
    assert paths and all(p.endswith(".arrow") for p in paths)
    back = read_arrow_ipc(spark, loc, df.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    # no temp debris left behind
    import os

    assert not [f for f in os.listdir(loc) if f.startswith("._tmp_")]


def test_arrow_ipc_empty_partitions_write_no_files(spark, tmp_path):
    from emr_on_eks_hudi_iceberg_delta_spark.sources.formats import (
        write_arrow_ipc,
    )

    df = spark.range(2).repartition(8)  # 6 empty partitions
    paths = write_arrow_ipc(df, str(tmp_path / "ipc2"))
    assert 1 <= len(paths) <= 2


# ------------------------------ WAV codec -----------------------------------

def test_wav_pcm16_roundtrip_mono(spark):
    """decode(encode(x)) must reproduce the source integers' frame
    energies exactly (int64 sum of squares)."""
    from emr_on_eks_hudi_iceberg_delta_spark.operators.multimodal import (
        synthesize_wav_pcm16,
        wav_pcm16_features,
    )

    rows = [(1, [100, -200, 300, 40, 5]), (2, [0, 0, 32767, -32768])]
    df = spark.createDataFrame(rows, "doc_id bigint, samples array<int>")
    wav = synthesize_wav_pcm16(df, values_col="samples", sample_rate=8000)
    got = wav_pcm16_features(wav, frame_size=3).collect()
    by = {(r["doc_id"], r["frame"]): r for r in got}
    assert by[(1, 0)]["sum_sq"] == 100**2 + 200**2 + 300**2
    assert by[(1, 1)]["sum_sq"] == 40**2 + 5**2
    assert by[(1, 1)]["n_samples"] == 2
    assert by[(2, 0)]["sum_sq"] == 32767**2  # frame 0 = [0, 0, 32767]
    assert by[(2, 1)]["sum_sq"] == 32768**2  # frame 1 = [-32768]
    assert all(r["sample_rate"] == 8000 and r["channels"] == 1 for r in got)


def test_wav_pcm16_stereo_channels_split(spark):
    from emr_on_eks_hudi_iceberg_delta_spark.operators.multimodal import (
        synthesize_wav_pcm16,
        wav_pcm16_features,
    )

    # interleaved L/R: L = 10,20 ; R = 1,2
    df = spark.createDataFrame(
        [(7, [10, 1, 20, 2])], "doc_id bigint, samples array<int>"
    )
    wav = synthesize_wav_pcm16(df, channels=2, sample_rate=16000)
    got = {(r["channel"], r["frame"]): r
           for r in wav_pcm16_features(wav, frame_size=4).collect()}
    assert got[(0, 0)]["sum_sq"] == 100 + 400
    assert got[(1, 0)]["sum_sq"] == 1 + 4
    assert got[(0, 0)]["channels"] == 2


def test_wav_parser_walks_unknown_chunks_and_refuses_malformed(spark):
    import struct

    import pytest

    from emr_on_eks_hudi_iceberg_delta_spark.operators.multimodal import (
        wav_pcm16_features,
    )

    # hand-built WAV with a LIST chunk BEFORE fmt/data (seen in the wild)
    pcm = struct.pack("<3h", 3, 4, 5)
    lst = b"LIST" + struct.pack("<I", 4) + b"INFO"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
    data = b"data" + struct.pack("<I", len(pcm)) + pcm
    body = lst + fmt + data
    blob = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    df = spark.createDataFrame([(1, bytearray(blob))],
                               "doc_id bigint, payload binary")
    rows = wav_pcm16_features(df, frame_size=8).collect()
    assert rows[0]["sum_sq"] == 9 + 16 + 25

    bad = spark.createDataFrame([(2, bytearray(b"NOTAWAVFILE"))],
                                "doc_id bigint, payload binary")
    with pytest.raises(Exception, match="RIFF"):
        wav_pcm16_features(bad).collect()
