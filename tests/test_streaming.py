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
