"""Structured Streaming operators over the events stream.

The reference is batch-only (SURVEY.md §2.9) — "incremental" there means a
second batch job. This module adds the real streaming surface a 100 TB
pipeline needs: event-time tumbling/sliding windows, session windows,
streaming dedup, and a custom stateful operator via
``applyInPandasWithState``.

Every operator is a function DataFrame->DataFrame that works on a streaming
input (``readStream``), so the same code path serves batch backfill and
live ingestion — the classic kappa pattern. Tests replay the deterministic
events table through a file source with ``Trigger.AvailableNow`` and
compare against the batch oracles.

Scale notes: watermarks bound state size (without one, windowed state grows
forever); session windows and stateful ops shuffle on the grouping key once;
``spark.sql.shuffle.partitions`` sizes the state store instance count —
pick it for the steady-state key cardinality, not the data volume.
"""

from __future__ import annotations

import os
import uuid

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp_ntz, user_id bigint, event_type string, "
    "value double, props string"
)


def stage_events_as_stream_source(
    spark: SparkSession, sf_dir: str, stage_dir: str, single_file: bool = True
) -> DataFrame:
    """Replay the batch events table as a file-source stream: stage the
    (ns-normalized) parquet into ``stage_dir`` and open a readStream over
    it. ``single_file`` keeps replay to one micro-batch so stateful
    operators emit one deterministic result set."""
    from ..sources.parquet import load_table

    ev = load_table(spark, sf_dir, "events")
    writer = ev.coalesce(1) if single_file else ev
    writer.write.mode("overwrite").parquet(stage_dir)
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(stage_dir)


def stream_tumbling_counts(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling event-time window aggregate — streaming twin of the batch
    ``events_tumbling_hourly`` query (identical results in complete mode)."""
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


def stream_sliding_counts(
    events: DataFrame, window: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    return (
        events.groupBy(F.window("ts", window, slide).alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


def stream_session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Native session windows (``F.session_window``): window end = last
    event + gap. The watermark lets Spark finalize sessions and evict state
    — required in append mode, and the knob that bounds state at scale.

    Watermarks only accept TIMESTAMP (not NTZ), so event time converts at
    the boundary (session timezone is pinned to UTC by session.configure,
    so wall-clock values are preserved) and back on output."""
    return (
        events.withColumn("__ts", F.col("ts").cast("timestamp"))
        .withWatermark("__ts", watermark)
        .groupBy("user_id", F.session_window("__ts", gap).alias("sw"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").cast("timestamp_ntz").alias("session_start"),
            F.col("sw.end").cast("timestamp_ntz").alias("session_end"),
            "n_events",
        )
    )


def stream_distinct_users(events: DataFrame) -> DataFrame:
    """Streaming dedup: first-arrival keep per user_id. State = one entry
    per key; pair with a watermark + dropDuplicatesWithinWatermark when keys
    are unbounded."""
    return events.dropDuplicates(["user_id"]).select("user_id")


def stream_dedup_within_watermark(
    events: DataFrame, delay: str = "2 hours"
) -> DataFrame:
    """Streaming dedup with BOUNDED state: ``dropDuplicatesWithinWatermark``
    evicts a key's dedup state once event time passes the watermark — the
    unbounded-key-space companion to ``stream_distinct_users`` (whose state
    grows one entry per key forever). Semantics: exact dedup for duplicates
    arriving within ``delay`` of each other — precisely the at-least-once
    source-retry case it exists for. Same NTZ boundary conversion as
    session windows."""
    return (
        events.withColumn("__ts", F.col("ts").cast("timestamp"))
        .withWatermark("__ts", delay)
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "user_id", "event_type")
    )


def stream_user_running_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running (count, max(value)) kept in explicit GroupState — the escape
    hatch for aggregations Spark's built-in windowed state can't express.
    Emits the updated stats each micro-batch. (count/max rather than sum so
    results are exactly comparable against a SQL oracle — float sums are
    accumulation-order-dependent.)"""

    def update(key, pdf_iter, state: GroupState):
        (user_id,) = key
        n, mx = state.get if state.exists else (0, None)
        for pdf in pdf_iter:
            n += len(pdf)
            batch_max = float(pdf["value"].max()) if len(pdf) else None
            if batch_max is not None:
                mx = batch_max if mx is None else max(mx, batch_max)
        state.update((n, mx))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "max_value": [mx]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id bigint, n_events bigint, max_value double",
        stateStructType="n bigint, mx double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_cusum_scores(
    events: DataFrame,
    drift: float = 55.0,
    threshold: float = 300.0,
) -> DataFrame:
    """Streaming latched CUSUM — the UNBOUNDED-KEY path of the change-
    detection family (operators/sequence.py round 7): per-user state is
    THREE scalars ``(n, s, smax)`` in GroupState, so a key alive for
    years carries bytes, not history — the contract neither the batch
    streaming fold (bounded per run) nor the segmented twin (bounded per
    partition set) can make for an infinite stream.

    Each micro-batch sorts ITS OWN rows per key by (ts, event_id) and
    folds them into the carried state with the exact IEEE sequence the
    batch engine uses, then emits the updated
    ``(user_id, n_events, cusum_final, cusum_max, alert)`` row (update
    mode; ``alert`` latches on ``cusum_max``). Exactness contract: equal
    to ``cusum_scores(latched=True)`` bit-for-bit when micro-batches
    respect per-key event-time order (a log replay / ordered ingest —
    the standard condition for ANY sequential streaming statistic;
    pinned single- and multi-batch in tests/test_streaming.py). Late
    out-of-order arrivals fold where they land, the usual streaming
    approximation.
    """
    d = float(drift)
    t = float(threshold)

    def update(key, pdf_iter, state: GroupState):
        (user_id,) = key
        n, s, smax = state.get if state.exists else (0, 0.0, 0.0)
        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
            pdf = pdf.sort_values(["ts", "event_id"])
            for x in pdf["value"].astype(float):
                s = s + x - d
                if s < 0.0:
                    s = 0.0
                if s > smax:
                    smax = s
                n += 1
        state.update((n, s, smax))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "cusum_final": [s],
                "cusum_max": [smax],
                "alert": [smax > t],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=(
            "user_id bigint, n_events bigint, cusum_final double, "
            "cusum_max double, alert boolean"
        ),
        stateStructType="n bigint, s double, smax double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_ewma_scores(events: DataFrame, alpha: float = 0.5) -> DataFrame:
    """Streaming EWMA — ``stream_cusum_scores``'s recency-score sibling:
    per-user state is two scalars ``(n, s)``; each micro-batch sorts its
    rows per key by (ts, event_id) and folds ``s = (1-a)s + a x`` (first
    element seeds) in the exact IEEE order of the batch engine. Same
    ordered-ingest exactness contract; emits
    ``(user_id, n_events, ewma_score)`` per touched key (update mode)."""
    a = float(alpha)
    one_m_a = 1.0 - a

    def update(key, pdf_iter, state: GroupState):
        (user_id,) = key
        n, s = state.get if state.exists else (0, None)
        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
            pdf = pdf.sort_values(["ts", "event_id"])
            for x in pdf["value"].astype(float):
                s = x if s is None else s * one_m_a + x * a
                n += 1
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "ewma_score": [s]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id bigint, n_events bigint, ewma_score double",
        stateStructType="n bigint, s double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stream_to_memory(
    sdf: DataFrame, output_mode: str = "complete", name: str | None = None
) -> DataFrame:
    """Run a streaming DataFrame to completion (AvailableNow) into a memory
    sink and return the result as a batch DataFrame."""
    name = name or f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join("/tmp", f"ckpt_{name}"))
        .start()
    )
    q.awaitTermination()
    return sdf.sparkSession.table(name)


def stream_stream_join(
    clicks: DataFrame,
    purchases: DataFrame,
    within: str = "INTERVAL 1 HOUR",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: purchases attributed to a prior click by
    the same user within ``within``. Both sides carry watermarks and the
    join condition bounds event-time distance — the two requirements that
    let Spark evict join state (unbounded otherwise; the knob that keeps
    a 100 TB/day dual-stream join feasible).
    """
    c = (
        clicks.select(
            F.col("user_id").alias("c_user"),
            F.col("ts").cast("timestamp").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        ).withWatermark("click_ts", watermark)
    )
    p = (
        purchases.select(
            F.col("user_id").alias("p_user"),
            F.col("ts").cast("timestamp").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value").alias("purchase_value"),
        ).withWatermark("purchase_ts", watermark)
    )
    return c.join(
        p,
        F.expr(
            f"c_user = p_user AND purchase_ts >= click_ts "
            f"AND purchase_ts <= click_ts + {within}"
        ),
        "inner",
    ).select(
        F.col("c_user").alias("user_id"),
        F.col("click_ts").cast("timestamp_ntz").alias("click_ts"),
        F.col("purchase_ts").cast("timestamp_ntz").alias("purchase_ts"),
        "click_id",
        "purchase_id",
        "purchase_value",
    )


def stream_static_enrich(
    events: DataFrame, dim: DataFrame, on: str = "user_id"
) -> DataFrame:
    """Stream-static join: every micro-batch of the stream equi-joins a
    static (batch) dimension — the standard enrichment step before a
    streaming aggregate. Stateless on the stream side (no watermark
    needed for an inner equi-join); the static side is broadcast, so at
    scale each executor joins its stream partitions map-side with zero
    stream-side shuffle. Spark re-evaluates the static plan per batch,
    which is what makes slowly-refreshed dimension snapshots pick up
    mid-stream (Delta's stream-static semantics)."""
    return events.join(F.broadcast(dim), on)


def stream_stream_left_join(
    clicks: DataFrame,
    purchases: DataFrame,
    within: str = "INTERVAL 1 HOUR",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: like ``stream_stream_join``
    but unmatched clicks are emitted NULL-padded once the combined
    watermark passes their join window — the outer-join state-eviction
    semantics (Spark holds a left row until no future purchase could
    match it, then releases it with NULLs). The watermark is therefore
    not just a state bound here; it is what makes outer results emit at
    all, which is why replay harnesses must advance it past the data
    (see ``q_streaming_stream_left_join``)."""
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("ts").cast("timestamp").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").cast("timestamp").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    ).withWatermark("purchase_ts", watermark)
    return c.join(
        p,
        F.expr(
            f"c_user = p_user AND purchase_ts >= click_ts "
            f"AND purchase_ts <= click_ts + {within}"
        ),
        "leftOuter",
    ).select(
        F.col("c_user").alias("user_id"),
        F.col("click_ts").cast("timestamp_ntz").alias("click_ts"),
        F.col("purchase_ts").cast("timestamp_ntz").alias("purchase_ts"),
        "click_id",
        "purchase_id",
        "purchase_value",
    )


def stream_stream_full_join(
    clicks: DataFrame,
    purchases: DataFrame,
    within: str = "INTERVAL 1 HOUR",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream FULL OUTER interval join — completes the outer
    family (inner / left / full): unmatched CLICKS flush NULL-padded
    when no future purchase can join them, and unmatched PURCHASES flush
    NULL-padded when no future click can (both sides' state is
    watermark-evicted, so a 100 TB/day dual stream stays bounded).
    ``user_id`` is coalesced across sides since either may be NULL."""
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("ts").cast("timestamp").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").cast("timestamp").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    ).withWatermark("purchase_ts", watermark)
    return c.join(
        p,
        F.expr(
            f"c_user = p_user AND purchase_ts >= click_ts "
            f"AND purchase_ts <= click_ts + {within}"
        ),
        "fullOuter",
    ).select(
        F.coalesce(F.col("c_user"), F.col("p_user")).alias("user_id"),
        F.col("click_ts").cast("timestamp_ntz").alias("click_ts"),
        F.col("purchase_ts").cast("timestamp_ntz").alias("purchase_ts"),
        "click_id",
        "purchase_id",
        "purchase_value",
    )


def tws_available() -> bool:
    """``transformWithStateInPandas`` runs its state server over
    protobuf; this container ships pyspark without the ``protobuf``
    wheel (verified: the TWS driver worker crashes at import), so the
    v2 path gates exactly like the Delta jar — clear refusal plus a
    pointer to the equivalent shipped operator."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def stream_user_running_totals_tws(events: DataFrame) -> DataFrame:
    """The Spark-4 ``transformWithStateInPandas`` twin of
    ``stream_user_running_totals``: same per-user running (count, max)
    contract, expressed through the arbitrary-stateful-processing v2
    API (typed ValueState handles, explicit processor lifecycle,
    optional timers/TTL) instead of ``applyInPandasWithState``'s single
    tuple state. This is the surface new stateful operators should
    target — state is schema'd and composable (value/list/map handles
    per processor), TTL bounds state growth without hand-rolled timeout
    plumbing, and the RocksDB state store it requires is the provider a
    100 TB deployment runs anyway (bounded heap, incremental
    checkpoint). Emits updated stats per key per micro-batch.

    Requires ``spark.sql.streaming.stateStore.providerClass`` =
    RocksDBStateStoreProvider (the caller sets it; see
    ``with_rocksdb_state_store``) and the ``protobuf`` package
    (``tws_available``) — without it the TWS state-server worker
    crashes at startup, so refuse clearly here instead."""
    if not tws_available():
        raise ModuleNotFoundError(
            "transformWithStateInPandas needs the protobuf package, which "
            "is not installed; use stream_user_running_totals "
            "(applyInPandasWithState — same contract, verified against "
            "the same batch-aggregate oracle)."
        )
    from pyspark.sql.streaming import StatefulProcessor

    class _RunningTotals(StatefulProcessor):
        def init(self, handle) -> None:
            self._totals = handle.getValueState("totals", "n bigint, mx double")

        def handleInputRows(self, key, rows, timer_values):
            n, mx = (
                tuple(self._totals.get()) if self._totals.exists() else (0, None)
            )
            for pdf in rows:
                n += len(pdf)
                if len(pdf):
                    batch_max = float(pdf["value"].max())
                    mx = batch_max if mx is None else max(mx, batch_max)
            self._totals.update((n, mx))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "max_value": [mx]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_RunningTotals(),
        outputStructType="user_id bigint, n_events bigint, max_value double",
        outputMode="update",
        timeMode="none",
    )


class with_rocksdb_state_store:
    """Context manager scoping the RocksDB state store provider to one
    streaming run: ``transformWithState`` refuses the default HDFS
    provider, but flipping the session conf permanently would silently
    re-provider every OTHER streaming query started afterwards."""

    _KEY = "spark.sql.streaming.stateStore.providerClass"
    _ROCKSDB = (
        "org.apache.spark.sql.execution.streaming."
        "state.RocksDBStateStoreProvider"
    )

    def __init__(self, spark: SparkSession):
        self._spark = spark
        self._prev = None

    def __enter__(self):
        try:
            self._prev = self._spark.conf.get(self._KEY)
        except Exception:
            self._prev = None
        self._spark.conf.set(self._KEY, self._ROCKSDB)
        return self

    def __exit__(self, *exc):
        if self._prev is None:
            self._spark.conf.unset(self._KEY)
        else:
            self._spark.conf.set(self._KEY, self._prev)
        return False


def stream_distinct_users_hll(events: DataFrame, lgk: int = 14) -> DataFrame:
    """Streaming distinct-user cardinality via an HLL sketch aggregate —
    the BOUNDED-STATE twin of ``stream_distinct_users``: the built-in
    dropDuplicates path keeps one state entry PER KEY forever, while the
    sketch aggregation's state is a single ≤ ~0.75·2^lgk-byte register
    array no matter how many users arrive — the only way a running
    distinct count survives an unbounded key space. Complete-mode
    emission of the current estimate; exact below the sketch's sparse
    capacity (operators/sketches.py module docstring), documented RSE
    beyond."""
    return events.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(lgk)))
        .cast("bigint")
        .alias("distinct_users")
    )


def stream_pattern_alerts(
    events: DataFrame,
    window_minutes: int = 30,
    first_type: str = "purchase",
    then_type: str = "error",
) -> DataFrame:
    """Streaming A-then-B pattern detection with CONSTANT state: emit
    one alert per ``then_type`` event that follows a ``first_type``
    event of the same user within ``window_minutes`` — the
    fraud/incident sequence-rule primitive (CEP's simplest shape).

    The unbounded-key trick mirrors stream_cusum_scores: because the
    NEAREST preceding A decides the rule, per-user GroupState is ONE
    bigint (the last A's epoch-microseconds) — a user alive for years
    carries 8 bytes, never an event buffer. Each micro-batch folds its
    rows in (ts, event_id) order; A updates the state, B emits an
    alert row when the gap is inside the window (append mode —
    alerts only). Integer-microsecond comparisons keep the oracle
    exact under ordered replay (the standard condition, pinned in
    tests)."""
    win_us = int(window_minutes) * 60_000_000

    def update(key, pdf_iter, state: GroupState):
        (user_id,) = key
        (last_a,) = state.get if state.exists else (None,)
        out_ids, out_ts, out_gap = [], [], []
        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
            pdf = pdf.sort_values(["ts", "event_id"])
            ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
            for eid, t_us, etype, ts_raw in zip(
                pdf["event_id"], ts_us, pdf["event_type"], pdf["ts"]
            ):
                if etype == first_type:
                    last_a = int(t_us)
                elif etype == then_type and last_a is not None:
                    gap = int(t_us) - last_a
                    if 0 <= gap <= win_us:
                        out_ids.append(int(eid))
                        out_ts.append(ts_raw)
                        out_gap.append(gap)
        state.update((last_a,))
        yield pd.DataFrame(
            {
                "user_id": pd.Series(
                    [user_id] * len(out_ids), dtype="int64"
                ),
                "event_id": pd.Series(out_ids, dtype="int64"),
                "ts": pd.Series(out_ts, dtype="datetime64[us]"),
                "gap_us": pd.Series(out_gap, dtype="int64"),
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=(
            "user_id bigint, event_id bigint, ts timestamp_ntz, "
            "gap_us bigint"
        ),
        stateStructType="last_a bigint",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
