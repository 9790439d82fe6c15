"""Hypothesis properties for the round-10 tranche-4 surfaces —
PRUNING SOUNDNESS: whenever a partition-value predicate derived from a
query predicate excludes a file, NO row in that file can satisfy the
query predicate. (Completeness is not required — keeping too much is
an IO cost, dropping too much is corruption.) Pure-python: the
transforms and prune functions are host-side driver code.
"""

import datetime as dt
import os
import sys

from hypothesis import given, settings, strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emr_on_eks_hudi_iceberg_delta_spark.sources.iceberg_transforms import (
    parse_partition_spec,
    prune_predicate,
    transform_literal,
)
from emr_on_eks_hudi_iceberg_delta_spark.sources.delta_gen import (
    _recognize,
)

_OPS = {
    "=": lambda a, b: a == b,
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
}

_TS = st.datetimes(
    min_value=dt.datetime(1902, 1, 1),
    max_value=dt.datetime(2200, 1, 1),
)


def _assert_sound(field, source_type, op, literal, row_value):
    """If the derived partition predicate rejects the row's partition
    value, the row must NOT satisfy the query predicate."""
    fn = prune_predicate(field, op, literal, source_type)
    if fn is None:
        return  # no pruning claimed: trivially sound
    pv = transform_literal(field["transform"], row_value, source_type)
    if not fn(pv):
        if op == "in":
            assert row_value not in literal, (
                field, op, literal, row_value, pv,
            )
        else:
            assert not _OPS[op](row_value, literal), (
                field, op, literal, row_value, pv,
            )


@settings(max_examples=300, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=64),
    lit=st.integers(min_value=-(2**40), max_value=2**40),
    row=st.integers(min_value=-(2**40), max_value=2**40),
    op=st.sampled_from(["=", "<", "<=", ">", ">="]),
)
def test_bucket_and_truncate_int_prune_sound(n, lit, row, op):
    bucket = parse_partition_spec(f"bucket({n}, c)")
    _assert_sound(bucket, "bigint", op, lit, row)
    trunc = parse_partition_spec(f"truncate({n}, c)")
    _assert_sound(trunc, "bigint", op, lit, row)


@settings(max_examples=300, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=8),
    lit=st.text(max_size=12),
    row=st.text(max_size=12),
    op=st.sampled_from(["=", "<", "<=", ">", ">="]),
)
def test_truncate_string_prune_sound(w, lit, row, op):
    trunc = parse_partition_spec(f"truncate({w}, c)")
    _assert_sound(trunc, "string", op, lit, row)
    bucket = parse_partition_spec("bucket(16, c)")
    _assert_sound(bucket, "string", op, lit, row)


@settings(max_examples=300, deadline=None)
@given(
    lit=_TS,
    row=_TS,
    op=st.sampled_from(["=", "<", "<=", ">", ">="]),
    word=st.sampled_from(["year", "month", "day", "hour"]),
)
def test_temporal_prune_sound(lit, row, op, word):
    fld = parse_partition_spec(f"{word}(c)")
    _assert_sound(fld, "timestamp", op, lit, row)


@settings(max_examples=300, deadline=None)
@given(
    lit=_TS,
    row=_TS,
    op=st.sampled_from(["==", "<", "<=", ">", ">="]),
    expr=st.sampled_from(
        [
            "CAST(c AS DATE)",
            "to_date(c)",
            "year(c)",
            "month(c)",
            "date_format(c, 'yyyy-MM')",
            "date_format(c, 'yyyy-MM-dd')",
        ]
    ),
)
def test_delta_generated_recognizers_prune_sound(lit, row, op, expr):
    """The delta_gen recognizers' mapper + op rules never exclude a
    file that could hold a matching row: model the file as holding
    exactly ``row``, its partition value as mapper(row)."""
    r = _recognize(expr)
    assert r is not None
    base, mapper, order_ok, _numeric = r
    w = mapper(lit)
    pv = mapper(row)
    excluded = False
    if op == "==":
        excluded = pv != w
    elif order_ok and op in (">", ">="):
        excluded = not (pv >= w)
    elif order_ok and op in ("<", "<="):
        excluded = not (pv <= w)
    if excluded:
        q = _OPS["=" if op == "==" else op]
        assert not q(row, lit), (expr, op, lit, row, pv, w)


@settings(max_examples=200, deadline=None)
@given(
    lit=st.text(max_size=10),
    row=st.text(max_size=10),
    n=st.integers(min_value=1, max_value=6),
    op=st.sampled_from(["==", "<", "<=", ">", ">="]),
)
def test_delta_substring_recognizer_prune_sound(lit, row, n, op):
    r = _recognize(f"substring(c, 1, {n})")
    assert r is not None
    _base, mapper, order_ok, _num = r
    assert order_ok
    w, pv = mapper(lit), mapper(row)
    if op == "==":
        excluded = pv != w
    elif op in (">", ">="):
        excluded = not (pv >= w)
    else:
        excluded = not (pv <= w)
    if excluded:
        q = _OPS["=" if op == "==" else op]
        assert not q(row, lit), (op, lit, row, pv, w)
