"""Structured Streaming operators: replay the deterministic events table
through a file source (AvailableNow) and compare against batch results."""

import tempfile

import pytest
from pyspark.sql import functions as F

from emr_on_eks_hudi_iceberg_delta_spark.sources.parquet import load_table
from emr_on_eks_hudi_iceberg_delta_spark.streaming import (
    run_stream_to_memory,
    stage_events_as_stream_source,
    stream_distinct_users,
    stream_session_windows,
    stream_tumbling_counts,
    stream_user_running_totals,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_stream(spark):
    stage = tempfile.mkdtemp(prefix="evstage_")
    return stage_events_as_stream_source(spark, SF_DIR, stage)


def test_stream_tumbling_matches_batch(spark, events_stream):
    got = run_stream_to_memory(stream_tumbling_counts(events_stream)).toPandas()
    exp = stream_tumbling_counts(load_table(spark, SF_DIR, "events")).toPandas()
    key = ["window_start", "event_type"]
    got = got.sort_values(key).reset_index(drop=True)
    exp = exp.sort_values(key).reset_index(drop=True)
    assert got.equals(exp[got.columns])


def test_stream_distinct_users(spark, events_stream):
    got = run_stream_to_memory(
        stream_distinct_users(events_stream), output_mode="append"
    )
    exp = load_table(spark, SF_DIR, "events").select("user_id").distinct()
    assert got.count() == exp.count()
    assert got.join(exp, "user_id", "left_anti").count() == 0


def test_stream_session_windows(spark, events_stream):
    got = run_stream_to_memory(
        stream_session_windows(events_stream), output_mode="append"
    )
    n = got.count()
    assert n > 0
    # sessions are per-user, non-overlapping, end = last event + gap
    bad = got.filter(F.col("session_end") <= F.col("session_start")).count()
    assert bad == 0


def test_stream_stateful_running_totals(spark, events_stream):
    got = run_stream_to_memory(
        stream_user_running_totals(events_stream), output_mode="update"
    ).toPandas()
    exp = (
        load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"), F.max("value").alias("max_value"))
        .toPandas()
    )
    got = got.sort_values("user_id").reset_index(drop=True)
    exp = exp.sort_values("user_id").reset_index(drop=True)
    assert got.equals(exp[got.columns])


def test_watermark_drops_late_data(spark):
    """Append-mode tumbling windows with a 1-hour watermark: an event
    arriving in batch 2 with event time far behind batch 1's max is
    dropped; an on-time event is counted. Pins the late-data semantics a
    100 TB stream relies on to bound state."""
    import tempfile as _tf

    from pyspark.sql import functions as F

    stage = _tf.mkdtemp(prefix="late_")
    mk = lambda rows: spark.createDataFrame(rows, "event_id bigint, ts string").select(
        "event_id", F.col("ts").cast("timestamp_ntz").alias("ts")
    )
    # batch 0: events across hours 00-10 -> watermark will advance to 09:15
    batch0 = mk([(i, f"2024-06-01 {h:02d}:15:00") for i, h in enumerate(range(11))])
    # batch 1: on-time progress (watermark commit batch — Spark applies a
    # new watermark to input filtering one batch after computing it)
    batch1 = mk([(50, "2024-06-01 10:30:00")])
    # batch 2: one hopelessly late event (01:30, far behind the in-force
    # 09:15 watermark) + one on-time event
    batch2 = mk([(100, "2024-06-01 01:30:00"), (101, "2024-06-01 11:30:00")])
    # the file source processes oldest-mtime first; pin mtimes so batch
    # order is guaranteed (write order alone is not)
    import glob as _glob
    import os as _os
    import shutil as _shutil
    import time as _time

    for idx, b in enumerate([batch0, batch1, batch2]):
        tmp = _tf.mkdtemp(prefix="late_b_")
        b.coalesce(1).write.mode("overwrite").parquet(tmp)
        dst = f"{stage}/batch-{idx}.parquet"
        (src,) = _glob.glob(tmp + "/part-*.parquet")
        _shutil.copy(src, dst)
        _os.utime(dst, (_time.time() - 1000 + idx * 300,) * 2)

    stream = (
        spark.readStream.schema("event_id bigint, ts timestamp_ntz")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    agg = (
        stream.withColumn("__ts", F.col("ts").cast("timestamp"))
        .withWatermark("__ts", "1 hour")
        .groupBy(F.window("__ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").cast("timestamp_ntz").alias("ws"), "n")
    )
    from emr_on_eks_hudi_iceberg_delta_spark.streaming import run_stream_to_memory

    result = {
        r["ws"].isoformat(): r["n"]
        for r in run_stream_to_memory(agg, output_mode="append").collect()
    }
    # hour 01 window closed with only the on-time batch-1 event: the late
    # arrival (01:30, behind the watermark) was dropped
    assert result.get("2024-06-01T01:00:00") == 1
    # every batch-1 hour window emitted exactly once
    for h in range(9):
        assert result.get(f"2024-06-01T{h:02d}:00:00") == 1


def test_stream_stream_join_matches_batch(spark, events_stream):
    """Stream-stream interval join (click -> purchase attribution within
    1 h) equals the equivalent batch join."""
    from emr_on_eks_hudi_iceberg_delta_spark.streaming.events import (
        stream_stream_join,
    )

    clicks = events_stream.filter(F.col("event_type") == "click")
    purchases = events_stream.filter(F.col("event_type") == "purchase")
    got = run_stream_to_memory(
        stream_stream_join(clicks, purchases), output_mode="append"
    )

    ev = load_table(spark, SF_DIR, "events")
    bc = ev.filter("event_type = 'click'").select(
        F.col("user_id").alias("u"), F.col("ts").alias("cts"), F.col("event_id").alias("cid")
    )
    bp = ev.filter("event_type = 'purchase'").select(
        F.col("user_id").alias("u"), F.col("ts").alias("pts"), F.col("event_id").alias("pid")
    )
    exp = bc.join(bp, "u").filter(
        (F.col("pts") >= F.col("cts"))
        & (F.col("pts") <= F.expr("cts + INTERVAL 1 HOUR"))
    )
    assert got.count() == exp.count()
    g = {(r["click_id"], r["purchase_id"]) for r in got.collect()}
    e = {(r["cid"], r["pid"]) for r in exp.collect()}
    assert g == e


def test_session_windows_state_carries_across_micro_batches(spark, tmp_path):
    """Splitting the same events over two micro-batches must yield the
    same final sessions as one batch — the state-carry contract of
    watermarked session windows (batches split mid-timeline, so open
    sessions must survive the batch boundary)."""
    from emr_on_eks_hudi_iceberg_delta_spark.sources.parquet import load_table
    from emr_on_eks_hudi_iceberg_delta_spark.streaming.events import (
        EVENTS_SCHEMA,
        run_stream_to_memory,
        stream_session_windows,
    )

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    cut = "2024-01-15 00:00:00"
    one = str(tmp_path / "one")
    ev.coalesce(1).write.parquet(one)
    split = str(tmp_path / "split")
    ev.filter(F.col("ts") < cut).coalesce(1).write.mode("append").parquet(split)
    ev.filter(F.col("ts") >= cut).coalesce(1).write.mode("append").parquet(split)

    def run(path, max_files):
        stream = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", max_files)
            .parquet(path)
        )
        out = run_stream_to_memory(
            stream_session_windows(stream), output_mode="complete"
        )
        return sorted(map(tuple, out.collect()))

    assert run(one, 10) == run(split, 1)


def test_stream_stateful_running_totals_tws(spark, events_stream):
    """transformWithStateInPandas twin: identical final emissions to the
    applyInPandasWithState path and the batch aggregate — or, in this
    container (no protobuf wheel, so the TWS state-server worker cannot
    start), a clear gated refusal pointing at the shipped operator."""
    import pytest

    from emr_on_eks_hudi_iceberg_delta_spark.streaming.events import (
        stream_user_running_totals_tws,
        tws_available,
        with_rocksdb_state_store,
    )

    if not tws_available():
        with pytest.raises(
            ModuleNotFoundError, match="stream_user_running_totals"
        ):
            stream_user_running_totals_tws(events_stream)
        return

    with with_rocksdb_state_store(spark):
        got = run_stream_to_memory(
            stream_user_running_totals_tws(events_stream), output_mode="update"
        ).toPandas()
    # provider conf restored for subsequent streaming tests
    assert "RocksDB" not in (
        spark.conf.get(
            "spark.sql.streaming.stateStore.providerClass", "default"
        )
        or "default"
    )
    exp = (
        load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"), F.max("value").alias("max_value"))
        .toPandas()
    )
    got = got.sort_values("user_id").reset_index(drop=True)
    exp = exp.sort_values("user_id").reset_index(drop=True)
    assert got.equals(exp[got.columns])


def test_stateful_totals_carry_across_micro_batches(spark, tmp_path):
    """State must CARRY between micro-batches: replay the events table
    as four separate files (four micro-batches under AvailableNow) and
    assert the stateful operator's final per-user emission still equals
    the batch aggregate — the cross-batch GroupState contract the
    single-batch replay can't exercise. Also pins the HLL streaming
    aggregate across batches."""
    from emr_on_eks_hudi_iceberg_delta_spark.sources.parquet import load_table
    from emr_on_eks_hudi_iceberg_delta_spark.streaming.events import (
        EVENTS_SCHEMA,
        run_stream_to_memory,
        stream_distinct_users_hll,
        stream_user_running_totals,
    )

    ev = load_table(spark, SF_DIR, "events")
    stage = str(tmp_path / "ev_multi")
    ev.repartition(4).write.parquet(stage)
    import glob as _glob

    assert len(_glob.glob(stage + "/part-*.parquet")) == 4

    def stream():
        return (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)   # one file per micro-batch
            .parquet(stage)
        )

    got = run_stream_to_memory(
        stream_user_running_totals(stream()), output_mode="update"
    )
    # update mode re-emits a user on every batch that touches it: keep
    # the LAST emission per user (max n_events is monotone)
    final = (
        got.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
        )
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    exp = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert final.equals(exp[final.columns])

    hll = run_stream_to_memory(
        stream_distinct_users_hll(stream()), output_mode="complete"
    ).first()["distinct_users"]
    assert hll == ev.select("user_id").distinct().count()


def test_full_outer_stream_join_emits_both_null_sides(spark):
    """The full-outer gate query must contain BOTH outer flavors:
    clicks with no purchase (NULL purchase_id) AND purchases with no
    click (NULL click_id) — proving both state stores flushed."""
    from emr_on_eks_hudi_iceberg_delta_spark.queries import REGISTRY

    res = REGISTRY["streaming_stream_full_join"].fn(
        spark, "/root/testdata/sf0.001"
    )
    rows = res.collect()
    assert any(r["purchase_id"] is None for r in rows)
    assert any(r["click_id"] is None for r in rows)
    assert any(
        r["purchase_id"] is not None and r["click_id"] is not None
        for r in rows
    )


def test_observation_metrics_single_pass(spark):
    """Spark's Observation API: pipeline metrics (row counts, null
    counts, sums) collected as a side effect of the SAME action — the
    production observability hook (no second scan, no separate count
    job). Verifies the observed values against direct aggregates."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    obs = Observation("ingest_metrics")
    gated = (
        li.observe(
            obs,
            F.count(F.lit(1)).alias("rows_seen"),
            F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("qty_sum"),
            F.count_if(F.col("l_discount") > 0.05).alias("high_discount"),
        )
        .filter(F.col("l_quantity") <= 30)
    )
    kept = gated.count()  # the one action; metrics ride along
    m = obs.get
    assert m["rows_seen"] == li.count()
    assert m["high_discount"] == li.filter("l_discount > 0.05").count()
    assert float(m["qty_sum"]) == float(
        li.agg(F.sum(F.col("l_quantity").cast("decimal(18,4)"))).collect()[0][0]
    )
    assert kept < m["rows_seen"]  # observed BEFORE the gate filter


def test_stream_cusum_matches_batch_single_batch(spark, events_stream):
    """Streaming latched CUSUM == batch cusum_scores(latched=True)
    bit-for-bit on a single-micro-batch replay."""
    from emr_on_eks_hudi_iceberg_delta_spark.operators.sequence import (
        cusum_scores,
    )
    from emr_on_eks_hudi_iceberg_delta_spark.sources.parquet import load_table
    from emr_on_eks_hudi_iceberg_delta_spark.streaming.events import (
        run_stream_to_memory,
        stream_cusum_scores,
    )

    got = (
        run_stream_to_memory(
            stream_cusum_scores(events_stream), output_mode="update"
        )
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    exp = (
        cusum_scores(load_table(spark, SF_DIR, "events"), latched=True)
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert got["n_events"].tolist() == exp["n_events"].tolist()
    assert got["cusum_final"].tolist() == exp["cusum_final"].tolist()
    assert got["cusum_max"].tolist() == exp["cusum_max"].tolist()
    assert got["alert"].tolist() == exp["alert"].tolist()


def test_stream_cusum_state_carries_across_batches(spark, tmp_path):
    """Four TIME-ORDERED micro-batches (quartile files, oldest-first
    file-source ordering): the carried (n, s, smax) scalars must
    reproduce the batch fold exactly across batch boundaries — the
    unbounded-key contract (state is 3 scalars, never history)."""
    from pyspark.sql import functions as FF

    from emr_on_eks_hudi_iceberg_delta_spark.operators.sequence import (
        cusum_scores,
    )
    from emr_on_eks_hudi_iceberg_delta_spark.sources.parquet import load_table
    from emr_on_eks_hudi_iceberg_delta_spark.streaming.events import (
        EVENTS_SCHEMA,
        run_stream_to_memory,
        stream_cusum_scores,
    )

    ev = load_table(spark, SF_DIR, "events")
    # split by ts quantiles so batch time ranges are disjoint and
    # sequential (NTZ doesn't cast to double; derive epoch micros)
    ev2 = ev.withColumn(
        "__us",
        FF.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).cast("double"),
    )
    tcuts = ev2.approxQuantile("__us", [0.25, 0.5, 0.75], 0.0)
    stage = str(tmp_path / "ev_cusum_multi")
    tsd = FF.col("__us")
    slices = [
        ev2.filter(tsd <= tcuts[0]),
        ev2.filter((tsd > tcuts[0]) & (tsd <= tcuts[1])),
        ev2.filter((tsd > tcuts[1]) & (tsd <= tcuts[2])),
        ev2.filter(tsd > tcuts[2]),
    ]
    for i, sl in enumerate(slices):
        sl.drop("__us").coalesce(1).write.mode("append").parquet(stage)
    import glob as _glob

    assert len(_glob.glob(stage + "/part-*.parquet")) == 4

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    got_all = run_stream_to_memory(
        stream_cusum_scores(stream), output_mode="update"
    )
    # update mode re-emits per touched batch: keep the final emission
    # (n_events is monotone per user)
    import pandas as pd

    gp = got_all.toPandas()
    got = (
        gp.sort_values(["user_id", "n_events"])
        .groupby("user_id", as_index=False)
        .last()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    exp = (
        cusum_scores(ev, latched=True)
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert got["n_events"].tolist() == exp["n_events"].tolist()
    assert got["cusum_final"].tolist() == exp["cusum_final"].tolist()
    assert got["cusum_max"].tolist() == exp["cusum_max"].tolist()


def test_stream_ewma_matches_batch(spark, events_stream):
    """Streaming EWMA == batch ewma_scores bit-for-bit on single-batch
    replay."""
    from emr_on_eks_hudi_iceberg_delta_spark.operators.sequence import (
        ewma_scores,
    )
    from emr_on_eks_hudi_iceberg_delta_spark.sources.parquet import load_table
    from emr_on_eks_hudi_iceberg_delta_spark.streaming.events import (
        run_stream_to_memory,
        stream_ewma_scores,
    )

    got = (
        run_stream_to_memory(
            stream_ewma_scores(events_stream), output_mode="update"
        )
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    exp = (
        ewma_scores(load_table(spark, SF_DIR, "events"))
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert got["n_events"].tolist() == exp["n_events"].tolist()
    assert got["ewma_score"].tolist() == exp["ewma_score"].tolist()


def test_pattern_alerts_state_carries_across_batches(spark, tmp_path):
    """A purchase in micro-batch 1 must still trigger on an error in
    micro-batch 2 (the one-bigint GroupState carry), and the full
    replay must equal the single-batch result."""
    import pandas as pd

    from emr_on_eks_hudi_iceberg_delta_spark.streaming.events import (
        EVENTS_SCHEMA,
        run_stream_to_memory,
        stream_pattern_alerts,
    )

    def mk(rows, path):
        pdf = pd.DataFrame(
            rows,
            columns=["event_id", "ts", "user_id", "event_type", "value",
                     "props"],
        )
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        sdf = spark.createDataFrame(pdf).select(
            F.col("event_id").cast("long"),
            F.col("ts").cast("timestamp_ntz"),
            F.col("user_id").cast("long"),
            "event_type",
            F.col("value").cast("double"),
            "props",
        )
        sdf.coalesce(1).write.mode("overwrite").parquet(path)

    stage = str(tmp_path / "stage")
    # batch 1: user 7 purchases; user 9 errors with no prior purchase
    mk(
        [
            (1, "2024-01-01 10:00:00", 7, "purchase", 1.0, "{}"),
            (2, "2024-01-01 10:05:00", 9, "error", 1.0, "{}"),
        ],
        stage + "/b1",
    )
    # batch 2: user 7 errors 20 min after the batch-1 purchase (alert),
    # then again 3 hours later (no alert)
    mk(
        [
            (3, "2024-01-01 10:20:00", 7, "error", 1.0, "{}"),
            (4, "2024-01-01 13:30:00", 7, "error", 1.0, "{}"),
        ],
        stage + "/b2",
    )
    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage + "/b*")
    )
    out = run_stream_to_memory(
        stream_pattern_alerts(src), output_mode="append"
    ).collect()
    assert [(r["user_id"], r["event_id"], r["gap_us"]) for r in out] == [
        (7, 3, 20 * 60 * 1000000)
    ]
