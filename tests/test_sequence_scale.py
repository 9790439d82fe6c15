"""Round-7 scale rewrite of the sequential-fold family (VERDICT r6
finding 1 / task 1): the streaming constant-memory engine and the
segment-associative twins, pinned against host-exact sequential replay.

What is proven here:

* the mapInPandas streaming fold (default ``ewma_scores`` /
  ``cusum_scores``) equals the sequential recursion BIT-FOR-BIT, even
  when a key's events span many Arrow batches (forced via a tiny
  ``arrow.maxRecordsPerBatch``) — i.e. cross-batch state carry is exact;
* the segmented twins equal the sequential fold EXACTLY on
  dyadic-rational inputs (integer values, alpha = 0.5 — every IEEE op
  exact, so any composition error would surface as a hard mismatch),
  across randomized partition counts (randomized splits);
* the segment-composition algebra itself (max-plus for CUSUM incl. the
  latched prefix-max extension, affine maps for EWMA) equals the
  sequential fold on hypothesis-randomized values AND split points,
  host-side — no Spark in the loop, so the property is pure math;
* a single hot key splits across >1 range partition in the twins
  (the whole point: per-key state = one summary struct per touched
  partition) and still folds to the exact sequential answer;
* latched CUSUM (``latched=True``) equals the host-replayed any-time
  max on both the streaming and segmented paths.
"""

import math
import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from emr_on_eks_hudi_iceberg_delta_spark.operators.sequence import (
    cusum_scores,
    cusum_scores_segmented,
    ewma_scores,
    ewma_scores_segmented,
)

DRIFT = 55.0
ALPHA = 0.5


# ---------------------------------------------------------------- helpers


def _host_ewma(vals, alpha=ALPHA):
    s = None
    for x in vals:
        s = x if s is None else s * (1.0 - alpha) + x * alpha
    return s


def _host_cusum(vals, drift=DRIFT):
    s, smax = 0.0, 0.0
    for x in vals:
        s = s + x - drift
        if s < 0.0:
            s = 0.0
        if s > smax:
            smax = s
    return s, smax


def _events_df(spark, rows):
    """rows: list of (user_id, ts_offset_seconds, event_id, value)."""
    df = spark.createDataFrame(
        rows, "user_id bigint, off bigint, event_id bigint, value double"
    )
    return df.select(
        "user_id",
        F.expr(
            "timestampadd(SECOND, off, TIMESTAMP_NTZ '2024-01-01 00:00:00')"
        ).alias("ts"),
        "event_id",
        "value",
    )


def _rand_rows(rng, n_keys, max_len, int_values):
    rows, expected = [], {}
    eid = 0
    for uid in range(1, n_keys + 1):
        n = rng.randint(1, max_len)
        vals = [
            float(rng.randint(0, 200)) if int_values else rng.uniform(0.0, 200.0)
            for _ in range(n)
        ]
        order = list(range(n))
        rng.shuffle(order)  # insertion order != time order: sort must fix it
        for pos, i in enumerate(order):
            rows.append((uid, i * 60, eid + i, vals[i]))
        eid += n
        expected[uid] = vals
    return rows, expected


# ------------------------------------------------- streaming engine exact


def test_streaming_fold_bit_exact_across_batches(spark):
    """Force many tiny Arrow batches so keys span batch boundaries; the
    streaming fold must still replay the recursion bit-for-bit."""
    rng = random.Random(7)
    rows, expected = _rand_rows(rng, n_keys=40, max_len=60, int_values=False)
    df = _events_df(spark, rows)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "17")
    try:
        ew = {r["user_id"]: r for r in ewma_scores(df).collect()}
        cu = {r["user_id"]: r for r in cusum_scores(df, latched=True).collect()}
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    for uid, vals in expected.items():
        assert ew[uid]["n_events"] == len(vals)
        assert ew[uid]["ewma_score"] == _host_ewma(vals), uid  # bit-exact
        s, smax = _host_cusum(vals)
        assert cu[uid]["cusum_final"] == s, uid
        assert cu[uid]["cusum_max"] == smax, uid
        assert cu[uid]["alert"] == (smax > 300.0), uid


def test_streaming_fold_hot_key_many_batches(spark):
    """One hot key, 50k events, tiny batches: constant-memory streaming
    still exact (the r6 collect_list design materialized all 50k in one
    row)."""
    n = 50_000
    df = spark.range(n).select(
        F.lit(1).cast("bigint").alias("user_id"),
        F.expr(
            "timestampadd(SECOND, id, TIMESTAMP_NTZ '2024-01-01 00:00:00')"
        ).alias("ts"),
        F.col("id").alias("event_id"),
        (F.pmod(F.col("id") * 37 + 11, F.lit(120)).cast("double")).alias("value"),
    )
    vals = [float((i * 37 + 11) % 120) for i in range(n)]
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
    try:
        row = cusum_scores(df, latched=True).collect()
        assert len(row) == 1
        s, smax = _host_cusum(vals)
        assert row[0]["n_events"] == n
        assert row[0]["cusum_final"] == s
        assert row[0]["cusum_max"] == smax
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_streaming_fold_null_keys_one_group(spark):
    """Null keys fold as ONE group (groupBy semantics), not one row per
    event."""
    rows = [(None, 0, 1, 100.0), (None, 60, 2, 100.0), (7, 0, 3, 10.0)]
    df = spark.createDataFrame(
        rows, "user_id bigint, off bigint, event_id bigint, value double"
    ).select(
        "user_id",
        F.expr(
            "timestampadd(SECOND, off, TIMESTAMP_NTZ '2024-01-01 00:00:00')"
        ).alias("ts"),
        "event_id",
        "value",
    )
    out = {r["user_id"]: r for r in cusum_scores(df).collect()}
    assert len(out) == 2
    assert out[None]["n_events"] == 2
    assert out[None]["cusum_final"] == _host_cusum([100.0, 100.0])[0]


# -------------------------------------------------- segmented twins exact


@pytest.mark.parametrize("n_parts", [1, 3, 8])
def test_segmented_twins_exact_on_dyadic_inputs(spark, n_parts):
    """Integer values + alpha 0.5 make every IEEE op exact, so the
    segment composition must equal the sequential fold BIT-FOR-BIT —
    across randomized range-partition splits."""
    rng = random.Random(100 + n_parts)
    rows, expected = _rand_rows(rng, n_keys=25, max_len=24, int_values=True)
    df = _events_df(spark, rows)
    ew = {
        r["user_id"]: r
        for r in ewma_scores_segmented(df, num_partitions=n_parts).collect()
    }
    cu = {
        r["user_id"]: r
        for r in cusum_scores_segmented(
            df, latched=True, num_partitions=n_parts
        ).collect()
    }
    for uid, vals in expected.items():
        assert ew[uid]["n_events"] == len(vals)
        assert ew[uid]["ewma_score"] == _host_ewma(vals), uid
        s, smax = _host_cusum(vals)
        assert cu[uid]["cusum_final"] == s, uid
        assert cu[uid]["cusum_max"] == smax, uid


def test_segmented_twins_float_tolerance(spark):
    """On arbitrary floats the composition reorders IEEE ops — pin to
    relative 1e-9 of the sequential fold."""
    rng = random.Random(31)
    rows, expected = _rand_rows(rng, n_keys=30, max_len=50, int_values=False)
    df = _events_df(spark, rows)
    ew = {
        r["user_id"]: r for r in ewma_scores_segmented(df, num_partitions=5).collect()
    }
    cu = {
        r["user_id"]: r
        for r in cusum_scores_segmented(df, num_partitions=5).collect()
    }
    for uid, vals in expected.items():
        ref = _host_ewma(vals)
        assert math.isclose(ew[uid]["ewma_score"], ref, rel_tol=1e-9, abs_tol=1e-9)
        s, _ = _host_cusum(vals)
        assert math.isclose(cu[uid]["cusum_final"], s, rel_tol=1e-9, abs_tol=1e-9)
        assert cu[uid]["n_events"] == len(vals)


def test_segmented_hot_key_actually_splits(spark):
    """A single hot key must SPAN multiple range partitions (that is the
    scale point) and still fold to the exact sequential answer."""
    from emr_on_eks_hudi_iceberg_delta_spark.operators.sequence import (
        _range_prepared,
    )

    n = 20_000
    df = spark.range(n).select(
        F.lit(1).cast("bigint").alias("user_id"),
        F.expr(
            "timestampadd(SECOND, id, TIMESTAMP_NTZ '2024-01-01 00:00:00')"
        ).alias("ts"),
        F.col("id").alias("event_id"),
        (F.pmod(F.col("id") * 13 + 3, F.lit(111)).cast("double")).alias("value"),
    )
    prepared = _range_prepared(df, "user_id", "ts", "event_id", "value", 8)
    touched = (
        prepared.select(F.spark_partition_id().alias("p"))
        .distinct()
        .count()
    )
    assert touched > 1, "hot key did not split across range partitions"

    vals = [float((i * 13 + 3) % 111) for i in range(n)]
    row = cusum_scores_segmented(df, latched=True, num_partitions=8).collect()
    assert len(row) == 1
    s, smax = _host_cusum(vals)
    assert row[0]["n_events"] == n
    assert row[0]["cusum_final"] == s  # integer-valued: exact
    assert row[0]["cusum_max"] == smax


# ---------------------------------------- pure composition algebra (host)


def _cusum_summary(vals, drift=DRIFT):
    T, M, GT, GM = 0.0, 0.0, float("-inf"), 0.0
    for x in vals:
        y = x - drift
        T += y
        M = max(0.0, M + y)
        GT = max(GT, T)
        GM = max(GM, M)
    return T, M, GT, GM


@settings(max_examples=60, deadline=None)
@given(
    vals=st.lists(
        st.integers(min_value=0, max_value=500).map(float), min_size=1, max_size=40
    ),
    data=st.data(),
)
def test_cusum_composition_equals_sequential_on_random_splits(vals, data):
    """Pure max-plus algebra: split the sequence at hypothesis-chosen
    points, summarize each segment, compose in order — final state AND
    latched max equal the sequential fold exactly (integer inputs)."""
    n_cuts = data.draw(st.integers(min_value=0, max_value=min(5, len(vals))))
    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=len(vals)),
                min_size=n_cuts,
                max_size=n_cuts,
            )
        )
    )
    bounds = [0, *cuts, len(vals)]
    segments = [vals[a:b] for a, b in zip(bounds, bounds[1:])]

    s, L, tt, gt = 0.0, 0.0, 0.0, float("-inf")
    for seg in segments:
        if not seg:
            continue
        T, M, GT, GM = _cusum_summary(seg)
        L = max(L, GM, s + GT)
        gt = max(gt, tt + GT)
        tt += T
        s = max(M, s + T)
    ref_s, ref_max = _host_cusum(vals)
    assert s == ref_s
    assert L == ref_max


@settings(max_examples=60, deadline=None)
@given(
    vals=st.lists(
        st.integers(min_value=0, max_value=1023).map(float), min_size=1, max_size=24
    ),
    data=st.data(),
)
def test_ewma_affine_composition_equals_sequential(vals, data):
    """Affine-map algebra with alpha=0.5 (dyadic): composed (m, b) over
    all elements, final = m * x_first + b == sequential recursion."""
    n_cuts = data.draw(st.integers(min_value=0, max_value=min(4, len(vals))))
    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=len(vals)),
                min_size=n_cuts,
                max_size=n_cuts,
            )
        )
    )
    bounds = [0, *cuts, len(vals)]
    m_tot, b_tot = 1.0, 0.0
    for a, b in zip(bounds, bounds[1:]):
        m, bb = 1.0, 0.0
        for x in vals[a:b]:
            m *= 1.0 - ALPHA
            bb = bb * (1.0 - ALPHA) + x * ALPHA
        m_tot, b_tot = m_tot * m, b_tot * m + bb
    assert m_tot * vals[0] + b_tot == _host_ewma(vals)


def test_holt_matches_host_replay(spark):
    """holt_scores == host sequential replay bit-for-bit (incl. across
    forced tiny Arrow batches), and the trend actually tracks a ramp."""
    from emr_on_eks_hudi_iceberg_delta_spark.operators.sequence import (
        holt_scores,
    )

    rng = random.Random(5)
    rows, expected = _rand_rows(rng, n_keys=20, max_len=40, int_values=False)
    # one ramping key: values 0, 10, 20, ... -> trend must be positive
    ramp_id = 9999
    rows += [(ramp_id, i * 60, 10_000_000 + i, float(i * 10)) for i in range(30)]
    df = _events_df(spark, rows)

    def host(vals, a=0.5, g=0.3):
        l = b = None
        for x in vals:
            if l is None:
                l, b = x, 0.0
            else:
                l2 = a * x + (1.0 - a) * (l + b)
                l, b = l2, g * (l2 - l) + (1.0 - g) * b
        return l, b

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "13")
    try:
        out = {r["user_id"]: r for r in holt_scores(df).collect()}
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    for uid, vals in expected.items():
        l, b = host(vals)
        assert out[uid]["level"] == l, uid
        assert out[uid]["trend"] == b, uid
        assert out[uid]["forecast"] == l + 1.0 * b, uid
    rl, rb = host([float(i * 10) for i in range(30)])
    assert out[ramp_id]["trend"] == rb and rb > 5.0
    assert out[ramp_id]["forecast"] == rl + rb


def test_holt_winters_matches_host_replay(spark):
    """holt_winters_scores == host sequential replay bit-for-bit (incl.
    across forced tiny Arrow batches); a pure period-m cycle is learned
    (forecast error shrinks vs the naive level forecast)."""
    from emr_on_eks_hudi_iceberg_delta_spark.operators.sequence import (
        holt_winters_scores,
    )

    rng = random.Random(6)
    rows, expected = _rand_rows(rng, n_keys=15, max_len=60, int_values=False)
    # one seasonal key: 4-period sawtooth repeated many times
    sid = 9999
    season = [0.0, 50.0, 100.0, 50.0]
    rows += [
        (sid, i * 60, 10_000_000 + i, season[i % 4]) for i in range(48)
    ]
    df = _events_df(spark, rows)

    def host(vals, a=0.5, g=0.3, d=0.2, m=24, h=1):
        l = b = None
        s = [0.0] * m
        i = 0
        for x in vals:
            if l is None:
                l, b, i = x, 0.0, 1
                s[0] = d * (x - l) + (1.0 - d) * 0.0
            else:
                si = s[i % m]
                l2 = a * (x - si) + (1.0 - a) * (l + b)
                b2 = g * (l2 - l) + (1.0 - g) * b
                s[i % m] = d * (x - l2) + (1.0 - d) * si
                l, b = l2, b2
                i += 1
        fc = l + h * b + s[(i + h - 1) % m]
        return l, b, fc

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "13")
    try:
        out = {
            r["user_id"]: r
            for r in holt_winters_scores(df, period=4).collect()
        }
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    for uid, vals in expected.items():
        l, b, fc = host(vals, m=4)
        assert out[uid]["level"] == l, uid
        assert out[uid]["trend"] == b, uid
        assert out[uid]["forecast"] == fc, uid
    # the sawtooth key's seasonal slots converge toward the cycle shape:
    # its one-step forecast lands near the next sawtooth value (0.0)
    l, b, fc = host([season[i % 4] for i in range(48)], m=4)
    assert out[sid]["forecast"] == fc
    assert abs(fc - season[48 % 4]) < abs(l - season[48 % 4])


def test_scalar_fast_path_bit_identical_to_tuple_loop(spark):
    """The round-9 single-slot fast path (vectorized run detection +
    frompyfunc reduce) must equal the tuple loop BIT-FOR-BIT on random
    data — same float ops in the same order is the whole contract —
    across run lengths straddling the small-run cutoff and under tiny
    Arrow batches (runs split across batch boundaries)."""
    import random

    from emr_on_eks_hudi_iceberg_delta_spark.operators.sequence import (
        sequential_keyed_fold,
    )

    rng = random.Random(42)
    rows = []
    eid = 0
    for k in range(30):
        # run lengths 1..60: below, at, and above the cutoff (16)
        for _ in range(rng.randrange(1, 61)):
            rows.append((f"k{k:02d}", eid, rng.random() * 100))
            eid += 1
    df = spark.createDataFrame(
        rows, "user_id string, event_id bigint, value double"
    )
    a, c = 0.3, 0.7

    def tuple_step(state, x):
        s = state[0]
        return (x if s is None else s * c + x * a,)

    def scalar_step(s, x):
        return x if s is None else s * c + x * a

    common = dict(
        key_col="user_id", ts_col="event_id", order_tiebreak="event_id",
        value_col="value",
    )
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "13")
    try:
        slow = {
            r["user_id"]: r["s"]
            for r in sequential_keyed_fold(
                df, init_state=(None,), step=tuple_step,
                state_fields=[("s", "double")], **common
            ).collect()
        }
        fast = {
            r["user_id"]: r["s"]
            for r in sequential_keyed_fold(
                df, init_state=(None,), step=None,
                state_fields=[("s", "double")],
                scalar_step=scalar_step, **common
            ).collect()
        }
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert slow == fast  # exact equality, not tolerance
