"""Property-based invariants for operators/sequence.py:

* activity_streaks PARTITIONS each user's distinct active days: streak
  day-counts sum to the distinct-day count, streak ranges are internally
  gap-free (n_days == end - start + 1), and consecutive streaks of one
  user are separated by at least one inactive day;
* daily_peak_concurrency against a brute-force per-instant reference:
  peak on each day equals the max over interval endpoints of the number
  of half-open intervals [s, e) covering that instant, computed in plain
  Python on the same data.
"""

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from emr_on_eks_hudi_iceberg_delta_spark.operators.sequence import (
    activity_streaks,
    daily_peak_concurrency,
)

BASE = datetime.datetime(2024, 1, 1)

event_rows = st.lists(
    st.tuples(
        st.integers(0, 3),  # user_id
        st.integers(0, 20 * 24 * 3600),  # seconds offset into a 20-day span
    ),
    min_size=1,
    max_size=25,
)

interval_rows = st.lists(
    st.tuples(
        st.integers(0, 5 * 24 * 3600),  # start offset (seconds)
        st.integers(0, 12 * 3600),  # duration (seconds, may be 0)
    ),
    min_size=1,
    max_size=20,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(rows=event_rows)
def test_streaks_partition_distinct_days(spark, rows):
    ev = spark.createDataFrame(
        [
            (i, BASE + datetime.timedelta(seconds=off), uid, "t", 0.0)
            for i, (uid, off) in enumerate(rows)
        ],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, value double",
    )
    streaks = activity_streaks(ev).collect()
    days = {(uid, (BASE + datetime.timedelta(seconds=off)).date()) for uid, off in rows}
    # day counts partition the distinct active days
    assert sum(r["n_days"] for r in streaks) == len(days)
    by_user = {}
    for r in streaks:
        # internally gap-free
        assert (r["streak_end"] - r["streak_start"]).days + 1 == r["n_days"]
        by_user.setdefault(r["user_id"], []).append(r)
    for uid, rs in by_user.items():
        rs.sort(key=lambda r: r["streak_start"])
        for a, b in zip(rs, rs[1:]):
            # separated by at least one inactive day
            assert (b["streak_start"] - a["streak_end"]).days >= 2
        # every streak day is genuinely active
        for r in rs:
            d = r["streak_start"]
            while d <= r["streak_end"]:
                assert (uid, d) in days
                d += datetime.timedelta(days=1)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(rows=interval_rows)
def test_peak_concurrency_matches_bruteforce(spark, rows):
    ivs = [
        (
            BASE + datetime.timedelta(seconds=s),
            BASE + datetime.timedelta(seconds=s + d),
        )
        for s, d in rows
    ]
    df = spark.createDataFrame(
        ivs, "session_start timestamp_ntz, session_end timestamp_ntz"
    )
    got = {r["day"]: r["peak_concurrency"] for r in daily_peak_concurrency(df).collect()}
    # brute force: half-open [s, e) coverage evaluated at every start
    # instant (peaks can only occur at starts), bucketed by day
    expect = {}
    days = set()
    for s, e in ivs:
        d = s.date()
        while d <= e.date():
            days.add(d)
            d += datetime.timedelta(days=1)
    for day in days:
        day_lo = datetime.datetime.combine(day, datetime.time())
        day_hi = day_lo + datetime.timedelta(days=1)
        peak = 0
        probes = [max(s, day_lo) for s, e in ivs] + [day_lo]
        for p in probes:
            if not (day_lo <= p < day_hi):
                continue
            peak = max(peak, sum(1 for s, e in ivs if s <= p < e))
        expect[day] = peak
    # days whose only segments are zero-length emit no row at all (the
    # sweep filters empty segments), so the operator's day set may be a
    # strict subset of the brute-force one — those dropped days are
    # exactly the peak-0 days
    assert set(got) <= set(expect)
    for day, peak in got.items():
        assert peak == expect[day], (day, peak, expect[day])
    for day in set(expect) - set(got):
        assert expect[day] == 0, (day, expect[day])
