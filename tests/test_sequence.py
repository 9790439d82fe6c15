"""Semantic tests for operators/sequence.py — hand-built edge cases the
registry parity test (randomized events) can't pin down individually:
cross-midnight clipping, back-to-back non-concurrency, gap detection.
"""

import datetime

from pyspark.sql import functions as F

from emr_on_eks_hudi_iceberg_delta_spark.operators.sequence import (
    activity_streaks,
    daily_peak_concurrency,
    sessions_from_events,
)


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, datetime.datetime.fromisoformat(ts), uid, "t", 0.0) for i, (uid, ts) in enumerate(rows)],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, value double",
    )


def test_activity_streaks_splits_on_gap(spark):
    ev = _events(
        spark,
        [
            (1, "2024-01-01 10:00:00"),
            (1, "2024-01-01 23:00:00"),  # same day, no new streak day
            (1, "2024-01-02 00:30:00"),
            (1, "2024-01-03 09:00:00"),
            (1, "2024-01-06 09:00:00"),  # gap of 2 days -> new streak
            (2, "2024-01-05 12:00:00"),
        ],
    )
    out = {
        (r["user_id"], str(r["streak_start"])): (str(r["streak_end"]), r["n_days"])
        for r in activity_streaks(ev).collect()
    }
    assert out == {
        (1, "2024-01-01"): ("2024-01-03", 3),
        (1, "2024-01-06"): ("2024-01-06", 1),
        (2, "2024-01-05"): ("2024-01-05", 1),
    }


def test_peak_concurrency_back_to_back_not_concurrent(spark):
    # two intervals where one STARTS exactly when the other ENDS: the
    # half-open sweep (ends before starts at equal instants) counts 1
    iv = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", "2024-01-01 11:00:00"),
            (2, "2024-01-01 11:00:00", "2024-01-01 12:00:00"),
        ],
        "user_id long, session_start string, session_end string",
    ).select(
        "user_id",
        F.col("session_start").cast("timestamp_ntz").alias("session_start"),
        F.col("session_end").cast("timestamp_ntz").alias("session_end"),
    )
    rows = daily_peak_concurrency(iv).collect()
    assert len(rows) == 1 and rows[0]["peak_concurrency"] == 1


def test_peak_concurrency_overlap_and_cross_midnight(spark):
    iv = spark.createDataFrame(
        [
            # overlapping pair on Jan 1 -> peak 2
            (1, "2024-01-01 10:00:00", "2024-01-01 11:00:00"),
            (2, "2024-01-01 10:30:00", "2024-01-01 11:30:00"),
            # cross-midnight session: contributes to Jan 2 AND Jan 3
            (3, "2024-01-02 23:00:00", "2024-01-03 01:00:00"),
        ],
        "user_id long, session_start string, session_end string",
    ).select(
        F.col("session_start").cast("timestamp_ntz").alias("session_start"),
        F.col("session_end").cast("timestamp_ntz").alias("session_end"),
    )
    out = {str(r["day"]): r["peak_concurrency"] for r in daily_peak_concurrency(iv).collect()}
    assert out == {"2024-01-01": 2, "2024-01-02": 1, "2024-01-03": 1}


def test_sessions_from_events_gap_split(spark):
    ev = _events(
        spark,
        [
            (1, "2024-01-01 10:00:00"),
            (1, "2024-01-01 10:20:00"),  # within 30 min -> same session
            (1, "2024-01-01 11:00:00"),  # 40 min gap -> new session
        ],
    )
    sess = sessions_from_events(ev).orderBy("session_id").collect()
    assert [r["session_id"] for r in sess] == [1, 2]
    assert str(sess[0]["session_end"]) == "2024-01-01 10:20:00"


def test_ewma_matches_pandas_recursion(spark):
    """ewma_scores == pandas ewm(adjust=False) over the time-ordered
    values, per key."""
    import pandas as pd

    from emr_on_eks_hudi_iceberg_delta_spark.operators.sequence import (
        ewma_scores,
    )

    rows = [
        (1, "2024-01-01 00:00:00", 1, 10.0),
        (1, "2024-01-01 01:00:00", 2, 20.0),
        (1, "2024-01-01 02:00:00", 3, 0.0),
        (2, "2024-01-05 00:00:00", 4, 7.5),   # single event: score = value
        (3, "2024-01-02 00:00:00", 6, 4.0),
        (3, "2024-01-01 00:00:00", 5, 2.0),   # out-of-order input
    ]
    df = spark.createDataFrame(
        rows, "user_id int, ts string, event_id int, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = {r["user_id"]: r for r in ewma_scores(df).collect()}
    for uid in (1, 2, 3):
        vals = sorted((r for r in rows if r[0] == uid), key=lambda r: (r[1], r[2]))
        ref = pd.Series([v[3] for v in vals]).ewm(alpha=0.5, adjust=False).mean().iloc[-1]
        assert abs(out[uid]["ewma_score"] - ref) < 1e-12, uid
        assert out[uid]["n_events"] == len(vals)
    assert out[2]["ewma_score"] == 7.5
    # ordering matters: user 3 folds 2.0 then 4.0 -> 3.0 (not 2.0-first = 3.0... assert exact)
    assert out[3]["ewma_score"] == 3.0


# ------------------------------ resample_lerp -------------------------------

def test_resample_lerp_midpoints_and_edges(spark):
    from emr_on_eks_hudi_iceberg_delta_spark.operators.temporal import (
        resample_lerp,
    )

    rows = [
        # key a: events at 00:30 (v=10) and 02:30 (v=30)
        (1, "2024-01-01 00:30:00", 10.0, "a"),
        (2, "2024-01-01 02:30:00", 30.0, "a"),
        # key b: single event exactly on a grid hour
        (3, "2024-01-01 01:00:00", 7.0, "b"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id bigint, ts string, value double, k string"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = {
        (r["k"], str(r["grid_ts"])): r["value_lerp"]
        for r in resample_lerp(
            ev, key_col="k", ts_col="ts", value_col="value",
            order_col="event_id",
        ).collect()
    }
    # grid: 00:00, 01:00, 02:00 (t1 = 02:30 -> last grid point 02:00)
    assert out[("a", "2024-01-01 00:00:00")] is None      # before first
    assert out[("a", "2024-01-01 01:00:00")] == 15.0      # quarter point
    assert out[("a", "2024-01-01 02:00:00")] == 25.0      # 3/4 point
    assert out[("b", "2024-01-01 01:00:00")] == 7.0       # exact hit, no next
    assert out[("b", "2024-01-01 02:00:00")] is None      # after last
