"""interval_overlap_join edge cases: half-open semantics, bin-boundary
exclusivity, first-shared-bin dedup, empty-interval hygiene."""

import datetime

from emr_on_eks_hudi_iceberg_delta_spark.operators.temporal import (
    interval_overlap_join,
)


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def _mk(spark, rows, id_col, s_col, e_col):
    return spark.createDataFrame(
        [(1, k, _ts(a), _ts(b)) for k, a, b in rows],
        f"key int, {id_col} int, {s_col} timestamp_ntz, {e_col} timestamp_ntz",
    )


def _pairs(spark, left_rows, right_rows, bin_seconds=3600):
    left = _mk(spark, left_rows, "lid", "ls", "le")
    right = _mk(spark, right_rows, "rid", "rs", "re")
    out = interval_overlap_join(
        left, right, ["key"], "ls", "le", "rs", "re", bin_seconds=bin_seconds
    )
    return sorted((r["lid"], r["rid"]) for r in out.collect())


def test_touching_endpoints_do_not_overlap(spark):
    # [10:00,11:00) vs [11:00,12:00): half-open — no overlap
    got = _pairs(
        spark,
        [(1, "2024-01-01T10:00:00", "2024-01-01T11:00:00")],
        [(2, "2024-01-01T11:00:00", "2024-01-01T12:00:00")],
    )
    assert got == []


def test_containment_and_partial_overlap(spark):
    got = _pairs(
        spark,
        [
            (1, "2024-01-01T10:00:00", "2024-01-01T14:00:00"),  # contains 2
            (2, "2024-01-01T13:30:00", "2024-01-01T15:00:00"),  # partial w/ 2
            (3, "2024-01-01T16:00:00", "2024-01-01T17:00:00"),  # disjoint
        ],
        [(9, "2024-01-01T12:00:00", "2024-01-01T14:00:00")],
    )
    assert got == [(1, 9), (2, 9)]


def test_long_intervals_emit_each_pair_once(spark):
    # both spans cover many hourly bins; the pair must appear exactly once
    got = _pairs(
        spark,
        [(1, "2024-01-01T00:00:00", "2024-01-03T00:00:00")],
        [(2, "2024-01-02T00:00:00", "2024-01-05T00:00:00")],
    )
    assert got == [(1, 2)]


def test_end_on_bin_boundary_is_exclusive(spark):
    # left ends exactly on a bin boundary; right starts in that bin —
    # overlap only if right starts strictly before the left end
    got = _pairs(
        spark,
        [(1, "2024-01-01T10:30:00", "2024-01-01T12:00:00")],
        [
            (2, "2024-01-01T11:59:59", "2024-01-01T13:00:00"),  # overlaps 1s
            (3, "2024-01-01T12:00:00", "2024-01-01T13:00:00"),  # touches only
        ],
    )
    assert got == [(1, 2)]


def test_empty_and_negative_intervals_dropped(spark):
    got = _pairs(
        spark,
        [
            (1, "2024-01-01T10:00:00", "2024-01-01T10:00:00"),  # empty
            (2, "2024-01-01T11:00:00", "2024-01-01T10:00:00"),  # negative
            (3, "2024-01-01T10:00:00", "2024-01-01T11:00:00"),
        ],
        [(9, "2024-01-01T09:00:00", "2024-01-01T12:00:00")],
    )
    assert got == [(3, 9)]


def test_different_keys_never_join(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts("2024-01-01T10:00:00"), _ts("2024-01-01T11:00:00"))],
        "key int, lid int, ls timestamp_ntz, le timestamp_ntz",
    )
    right = spark.createDataFrame(
        [(2, 9, _ts("2024-01-01T10:00:00"), _ts("2024-01-01T11:00:00"))],
        "key int, rid int, rs timestamp_ntz, re timestamp_ntz",
    )
    out = interval_overlap_join(
        left, right, ["key"], "ls", "le", "rs", "re"
    )
    assert out.count() == 0


def test_pre_1970_timestamps_overlap_correctly(spark):
    """ADVICE r8: cast-truncation binning collapsed negative-epoch bin
    ids around 0; floor division must keep pre-1970 pairs joined."""
    got = _pairs(
        spark,
        [(1, "1969-12-31T22:30:00", "1969-12-31T23:30:00")],
        [(2, "1969-12-31T23:00:00", "1970-01-01T00:30:00"),
         (3, "1969-12-30T01:00:00", "1969-12-30T02:00:00")],
    )
    assert got == [(1, 2)]


def test_pre_1970_each_pair_emitted_once(spark):
    # long interval spanning the epoch boundary: still exactly one row
    got = _pairs(
        spark,
        [(1, "1969-12-31T20:00:00", "1970-01-01T04:00:00")],
        [(2, "1969-12-31T21:00:00", "1970-01-01T01:00:00")],
    )
    assert got == [(1, 2)]


def test_point_in_interval_pre_1970(spark):
    import datetime

    from emr_on_eks_hudi_iceberg_delta_spark.operators.temporal import (
        range_join_binned,
    )

    pts = spark.createDataFrame(
        [(1, _ts("1969-12-31T23:15:00")), (2, _ts("1969-12-29T00:00:00"))],
        "pid int, ts timestamp_ntz",
    )
    iv = spark.createDataFrame(
        [(10, _ts("1969-12-31T23:00:00"), _ts("1970-01-01T01:00:00"))],
        "iid int, s timestamp_ntz, e timestamp_ntz",
    )
    out = range_join_binned(pts, iv, "ts", "s", "e")
    assert sorted((r["pid"], r["iid"]) for r in out.collect()) == [(1, 10)]
