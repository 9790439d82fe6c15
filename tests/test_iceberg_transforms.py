"""Iceberg spec partition transforms (sources/iceberg_transforms.py +
IcebergTable hidden partitioning): murmur3 pinned to the spec's
Appendix B known answers, JVM-expression == pure-python parity,
table roundtrips under bucket/day/truncate specs, and manifest-level
pruning from SOURCE-column predicates.

Distinct from tests/test_hidden_partition.py: that covers the generic
``HiddenPartitionedTable`` (crc32 buckets, string date partitions —
an engine-internal layout); this covers the ICEBERG layout's
spec-compliant transforms (murmur3 seed 0, epoch ordinals) whose
manifests a real Iceberg reader could prune.
"""

import datetime as dt
import os
import random
import struct
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emr_on_eks_hudi_iceberg_delta_spark.sources.iceberg_layout import (
    IcebergTable,
)
from emr_on_eks_hudi_iceberg_delta_spark.sources.iceberg_transforms import (
    add_mm3_long_column,
    add_mm3_string_column,
    bucket_literal,
    murmur3_32,
    parse_partition_spec,
    transform_literal,
    truncate_literal,
    temporal_literal,
)


def _signed(h: int) -> int:
    return h - (1 << 32) if h >= (1 << 31) else h


def _rows(df):
    return sorted(map(tuple, df.collect()))


# ------------------------- spec known answers -------------------------


def test_murmur3_spec_appendix_b_known_answers():
    """The Iceberg spec's hash requirement vectors (Appendix B)."""
    assert _signed(murmur3_32(struct.pack("<q", 34))) == 2017239379
    assert _signed(murmur3_32("iceberg".encode())) == 1210000089
    days = (dt.date(2017, 11, 16) - dt.date(1970, 1, 1)).days
    assert _signed(murmur3_32(struct.pack("<q", days))) == -653330422
    micros = int(
        dt.datetime(
            2017, 11, 16, 22, 31, 8, tzinfo=dt.timezone.utc
        ).timestamp()
        * 1_000_000
    )
    assert _signed(murmur3_32(struct.pack("<q", micros))) == -2047944441


def test_literal_transforms_follow_spec_semantics():
    # truncate: ints floor toward -inf, strings take codepoint prefix
    assert truncate_literal(17, 10, "bigint") == 10
    assert truncate_literal(-1, 10, "bigint") == -10
    assert truncate_literal(-10, 10, "bigint") == -10
    assert truncate_literal("icebergs", 5, "string") == "icebe"
    assert truncate_literal("日本語テキスト", 3, "string") == "日本語"
    # temporal ordinals from epoch
    assert temporal_literal(dt.date(1970, 1, 1), "day", "date") == 0
    assert temporal_literal(dt.date(1969, 12, 31), "day", "date") == -1
    assert temporal_literal(dt.date(2024, 1, 15), "year", "date") == 54
    assert temporal_literal(dt.date(1970, 2, 1), "month", "date") == 1
    ts = dt.datetime(1970, 1, 2, 3, 0, 0, tzinfo=dt.timezone.utc)
    assert temporal_literal(ts, "hour", "timestamp") == 27
    pre = dt.datetime(1969, 12, 31, 23, 0, 0, tzinfo=dt.timezone.utc)
    assert temporal_literal(pre, "hour", "timestamp") == -1
    assert temporal_literal(pre, "day", "timestamp") == -1
    # bucket: nulls stay null, result in [0, n)
    assert bucket_literal(None, 8, "bigint") is None
    assert 0 <= bucket_literal(34, 8, "bigint") < 8
    # int and long of equal value share a bucket (spec: both hash as
    # the 64-bit little-endian form, so int/long columns can evolve)
    assert bucket_literal(34, 97, "int") == bucket_literal(34, 97, "bigint")


def test_parse_partition_spec_forms():
    assert parse_partition_spec("c") == {
        "transform": "identity", "source": "c", "name": "c",
    }
    assert parse_partition_spec("days(ts)") == {
        "transform": "day", "source": "ts", "name": "ts_day",
    }
    assert parse_partition_spec("bucket(16, id)") == {
        "transform": "bucket[16]", "source": "id", "name": "id_bucket",
    }
    assert parse_partition_spec("truncate(4, s)") == {
        "transform": "truncate[4]", "source": "s", "name": "s_trunc",
    }
    with pytest.raises(ValueError):
        parse_partition_spec("zorder(ts)")


# --------------------- JVM expression == python ---------------------


def test_mm3_long_column_matches_python(spark):
    vals = [
        34, 0, -1, -34, 2**62, -(2**62), 123456789012345, 7, -7,
        2**63 - 1, -(2**63),
    ]
    rng = random.Random(11)
    vals += [rng.randint(-(2**63), 2**63 - 1) for _ in range(50)]
    df = spark.createDataFrame([(v,) for v in vals], "v bigint")
    got = [
        r[0]
        for r in add_mm3_long_column(df, F.col("v"), "h", "t")
        .select("h")
        .collect()
    ]
    want = [
        murmur3_32(struct.pack("<Q", v & 0xFFFFFFFFFFFFFFFF))
        for v in vals
    ]
    assert got == want


def test_mm3_string_column_matches_python(spark):
    rng = random.Random(13)
    strs = [
        "iceberg", "", "a", "ab", "abc", "abcd", "abcde",
        "héllo wörld", "日本語テキスト", "x" * 137,
    ]
    strs += [
        "".join(
            rng.choice("abcdefg hij-ã😀") for _ in range(rng.randint(0, 40))
        )
        for _ in range(40)
    ]
    df = spark.createDataFrame([(s,) for s in strs], "s string")
    got = [
        r[0]
        for r in add_mm3_string_column(df, F.col("s"), "h", "t")
        .select("h")
        .collect()
    ]
    want = [murmur3_32(s.encode("utf-8")) for s in strs]
    assert got == want


def test_mm3_string_column_null_is_null(spark):
    df = spark.createDataFrame([("a",), (None,)], "s string")
    got = {
        r[0]
        for r in add_mm3_string_column(df, F.col("s"), "h", "t")
        .select("h")
        .collect()
    }
    assert None in got and len(got) == 2


def test_transform_write_plan_stays_jvm(spark):
    """The bucket/temporal write projections are pure JVM expressions:
    no Python evaluation node anywhere in the physical plan (the
    'stay JVM-side' contract for the murmur3 pipeline)."""
    from emr_on_eks_hudi_iceberg_delta_spark.sources.iceberg_transforms import (
        add_transform_column,
    )

    df = spark.createDataFrame(
        [(1, "abc", dt.datetime(2024, 1, 1, 2, 0, 0))],
        "id bigint, s string, ts timestamp",
    )
    out = add_transform_column(
        df, {"transform": "bucket[8]", "source": "id", "name": "b1"},
        "b1", "bigint",
    )
    out = add_transform_column(
        out, {"transform": "bucket[8]", "source": "s", "name": "b2"},
        "b2", "string",
    )
    out = add_transform_column(
        out, {"transform": "day", "source": "ts", "name": "d"},
        "d", "timestamp",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF",
                   "MapInPandas"):
        assert marker not in plan, marker


def test_ntz_transforms_match_literals(spark):
    """timestamp_ntz (what parquet scans of the testdata produce)
    transforms on the LOCAL value — day/hour ordinals and bucket
    micros derive from datetime fields, not unix_micros (which only
    accepts instants), staying session-timezone independent."""
    import datetime as dt

    from emr_on_eks_hudi_iceberg_delta_spark.sources.iceberg_transforms import (
        add_transform_column,
    )

    vals = [
        dt.datetime(2024, 1, 15, 13, 45, 30, 123456),
        dt.datetime(1969, 12, 31, 23, 0, 0, 5),
        dt.datetime(1970, 1, 1, 0, 0, 0),
        dt.datetime(2024, 2, 29, 23, 59, 59, 999999),
    ]
    df = spark.createDataFrame([(v,) for v in vals], "t timestamp_ntz")
    for tr in ("day", "hour", "month", "year", "bucket[16]"):
        fld = {"transform": tr, "source": "t", "name": "p"}
        got = [
            r[0]
            for r in add_transform_column(df, fld, "p", "timestamp_ntz")
            .select("p")
            .collect()
        ]
        want = [
            transform_literal(tr, v, "timestamp_ntz") for v in vals
        ]
        assert got == want, (tr, got, want)


# -------------------- table roundtrips + pruning --------------------


@pytest.fixture()
def ts_events(spark):
    rows = []
    rng = random.Random(5)
    base = dt.datetime(2024, 1, 10, 0, 0, 0)
    for i in range(400):
        rows.append(
            (
                i,
                base + dt.timedelta(hours=rng.randint(0, 24 * 12)),
                rng.randint(1, 40),
                rng.choice("abcde") * 3,
            )
        )
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, tag string"
    )


def test_day_bucket_table_roundtrip_and_manifest_values(spark, tmp_path, ts_events):
    t = IcebergTable(spark, str(tmp_path / "hidden1"))
    t.append(ts_events, partition_by=["day(ts)", "bucket(4, user_id)"])
    assert _rows(t.read()) == _rows(ts_events)
    # manifest partition values equal the python spec transforms
    entries = t._entries()
    assert entries
    for e in entries:
        pv = e["data_file"]["partition"]
        assert set(pv) == {"ts_day", "user_id_bucket"}
        assert isinstance(pv["ts_day"], int)
        assert 0 <= pv["user_id_bucket"] < 4
    # spot-check one file's contents agree with its partition values
    e0 = entries[0]["data_file"]
    one = spark.read.parquet(e0["file_path"]).collect()
    for r in one:
        assert (
            transform_literal("day", r["ts"], "timestamp")
            == e0["partition"]["ts_day"]
        )
        assert (
            bucket_literal(r["user_id"], 4, "bigint")
            == e0["partition"]["user_id_bucket"]
        )


def test_hidden_read_prunes_on_source_predicates(spark, tmp_path, ts_events):
    t = IcebergTable(spark, str(tmp_path / "hidden2"))
    t.append(ts_events, partition_by=["day(ts)", "bucket(4, user_id)"])
    total_files = len(t.read().inputFiles())
    lo = dt.datetime(2024, 1, 12, 6, 0, 0)
    hi = dt.datetime(2024, 1, 13, 18, 0, 0)
    pruned = t.read_hidden([("ts", ">=", lo), ("ts", "<=", hi)])
    # exactness: identical to the unpruned filter
    want = ts_events.filter(
        (F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi))
    )
    assert _rows(pruned) == _rows(want)
    assert want.count() > 0
    # IO elision: strictly fewer files scheduled than a full scan
    assert 0 < len(pruned.inputFiles()) < total_files
    # bucket pruning: equality on the bucketed source reads only that
    # bucket's files (1/4 of day-files touched, modulo day spread)
    eq = t.read_hidden([("user_id", "=", 7)])
    assert _rows(eq) == _rows(ts_events.filter(F.col("user_id") == 7))
    assert len(eq.inputFiles()) < total_files
    # a range over the BUCKETED column cannot prune (hash destroys
    # order) but stays exact
    rng_q = t.read_hidden([("user_id", ">=", 35)])
    assert _rows(rng_q) == _rows(ts_events.filter(F.col("user_id") >= 35))


def test_truncate_spec_roundtrip_and_range_prune(spark, tmp_path):
    rows = [(i, f"k{i % 7}{'x' * (i % 3)}", i * 10) for i in range(60)]
    df = spark.createDataFrame(rows, "id bigint, code string, v bigint")
    t = IcebergTable(spark, str(tmp_path / "hidden3"))
    t.append(df, partition_by=["truncate(2, code)", "truncate(100, v)"])
    assert _rows(t.read()) == _rows(df)
    entries = t._entries()
    for e in entries:
        pv = e["data_file"]["partition"]
        assert set(pv) == {"code_trunc", "v_trunc"}
        assert pv["v_trunc"] % 100 == 0
    total = len(t.read().inputFiles())
    got = t.read_hidden([("v", ">=", 380), ("v", "<", 420)])
    assert _rows(got) == _rows(
        df.filter((F.col("v") >= 380) & (F.col("v") < 420))
    )
    assert 0 < len(got.inputFiles()) < total
    got2 = t.read_hidden([("code", "=", "k3")])
    assert _rows(got2) == _rows(df.filter(F.col("code") == "k3"))
    assert 0 < len(got2.inputFiles()) < total


def test_hidden_spec_survives_appends_and_dml(spark, tmp_path, ts_events):
    """The stored spec re-applies on later appends without re-stating
    it; position-delete DML composes with transformed partitioning."""
    t = IcebergTable(spark, str(tmp_path / "hidden4"))
    half = ts_events.filter("event_id < 200")
    rest = ts_events.filter("event_id >= 200")
    t.append(half, partition_by=["day(ts)", "bucket(4, user_id)"])
    t.append(rest)  # spec comes from the table
    assert _rows(t.read()) == _rows(ts_events)
    # restating a DIFFERENT spec refuses
    with pytest.raises(ValueError):
        t.append(rest, partition_by=["day(ts)"])
    # restating the SAME spec (either spelling) is accepted
    t.append(
        ts_events.limit(0), partition_by=["days(ts)", "bucket(4, user_id)"]
    )
    # v2 position-delete DML on the transformed table stays exact
    t.delete("user_id = 7")
    want = ts_events.filter("user_id <> 7")
    assert _rows(t.read()) == _rows(want)
    pruned = t.read_hidden([("user_id", "=", 7)])
    assert pruned.count() == 0


def test_spec_evolution_to_transform(spark, tmp_path, ts_events):
    """evolve_partition_spec accepts transform specs: old identity-era
    files keep their values, new writes land day-partitioned, and
    read_hidden prunes against BOTH eras' fields."""
    t = IcebergTable(spark, str(tmp_path / "hidden6"))
    half = ts_events.filter("event_id < 200")
    rest = ts_events.filter("event_id >= 200")
    t.append(half, partition_by=["tag"])  # identity era
    t.evolve_partition_spec(["day(ts)", "bucket(4, user_id)"])
    t.append(rest)  # transform era
    assert _rows(t.read()) == _rows(ts_events)
    # entries carry the union of both eras' fields
    kinds = {frozenset(
        k for k, v in e["data_file"]["partition"].items() if v is not None
    ) for e in t._entries()}
    assert frozenset({"tag"}) in kinds
    assert frozenset({"ts_day", "user_id_bucket"}) in kinds
    # hidden pruning on the NEW era's source predicates stays exact
    # (old-era files lack ts_day -> kept conservatively)
    lo = dt.datetime(2024, 1, 12)
    got = t.read_hidden([("ts", ">=", lo)])
    assert _rows(got) == _rows(ts_events.filter(F.col("ts") >= F.lit(lo)))
    n_all = len(t.read().inputFiles())
    assert 0 < len(got.inputFiles()) < n_all


def test_identity_still_refuses_unsupported_and_date_hour_invalid(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, dt.date(2024, 1, 1))], "id bigint, d date"
    )
    t = IcebergTable(spark, str(tmp_path / "hidden5"))
    # identity over date is outside _PART_AVRO -> loud error
    with pytest.raises(ValueError):
        t.append(df, partition_by=["d"])
    # hour() over a date column is invalid per spec
    with pytest.raises(ValueError):
        t.append(df, partition_by=["hour(d)"])
    # but day/month/year over date work
    t.append(df, partition_by=["month(d)"])
    pv = t._entries()[0]["data_file"]["partition"]
    assert pv["d_month"] == (2024 - 1970) * 12
