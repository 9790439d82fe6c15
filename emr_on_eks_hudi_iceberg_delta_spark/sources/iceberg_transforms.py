"""Iceberg partition TRANSFORMS (hidden partitioning) — spec §Partition
Transforms: ``identity``, ``bucket[N]``, ``truncate[W]``, ``year``,
``month``, ``day``, ``hour``.

The point of hidden partitioning is that queries filter on the SOURCE
column (``ts``, ``id``) and the engine prunes on the TRANSFORMED
partition value (``ts_day``, ``id_bucket``) — users never see or
maintain the derived column. Three pieces implement that here:

* ``transform_literal`` — the pure-Python transform, used driver-side
  to fold query literals into partition-value predicates for manifest
  pruning, and to parse manifest partition values back.
* ``add_transform_column`` — the SAME transform as a Spark Column
  pipeline for write-time partition assignment. ``bucket`` is the
  spec's 32-bit Murmur3 (x86, seed 0) over the value's little-endian
  8-byte form (int/long/date-days/timestamp-micros) or UTF-8 bytes
  (string), built ENTIRELY from JVM expressions: fixed-width values
  take a staged two-block mix; strings decode their bytes into one
  array column and fold blocks with ``F.aggregate``. Every mix stage
  lands in a NAMED intermediate column — murmur's rotate/multiply
  steps reference their input several times, and inlining them
  (a single giant Column) duplicates the subtree exponentially;
  named attributes keep the plan linear because CollapseProject
  refuses to inline non-trivial expressions referenced more than
  once.
* ``prune_predicate`` — maps a (source column, op, literal) query
  predicate to a partition-value predicate per transform: bucket
  supports ``=``/``in`` (hash destroys order), truncate and the
  temporal transforms support ranges too (they are order-preserving),
  anything unprovable returns None and the file is kept — pruning
  must only ever be an optimization.

Murmur3 correctness is pinned to the spec's Appendix B known answers
(int 34 -> 2017239379, string "iceberg" -> 1210000089, date
2017-11-16 -> -653330422, timestamp 2017-11-16T22:31:08 ->
-2047944441) and to expression==python parity on randomized inputs in
tests/test_iceberg_transforms.py.

Reference parity note: the reference writes Iceberg through the Spark
runtime jar (iceberg/iceberg_submit.sh:33-34), which provides these
transforms; this module re-derives them from the public spec.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column, DataFrame, functions as F

_M32 = 0xFFFFFFFF
_C1, _C2 = 0xCC9E2D51, 0x1B873593

_EPOCH_DATE = _dt.date(1970, 1, 1)
_EPOCH_TS = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)


# ----------------------------- pure python -----------------------------


def murmur3_32(data: bytes, seed: int = 0) -> int:
    """32-bit Murmur3 (x86 variant), unsigned result — the hash the
    Iceberg spec's bucket transform is defined over."""
    h = seed
    n = len(data) // 4
    for i in range(n):
        k = int.from_bytes(data[4 * i: 4 * i + 4], "little")
        k = (k * _C1) & _M32
        k = ((k << 15) | (k >> 17)) & _M32
        k = (k * _C2) & _M32
        h ^= k
        h = ((h << 13) | (h >> 19)) & _M32
        h = (h * 5 + 0xE6546B64) & _M32
    tail = data[4 * n:]
    if tail:
        k = int.from_bytes(tail, "little")
        k = (k * _C1) & _M32
        k = ((k << 15) | (k >> 17)) & _M32
        k = (k * _C2) & _M32
        h ^= k
    h ^= len(data)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _M32
    h ^= h >> 16
    return h


def _long_ordinal(value, source_type: str) -> int:
    """The spec's long form of a value for hashing / temporal math:
    int/long as themselves, date as days from epoch, timestamp as
    microseconds from epoch (naive datetimes are taken as UTC — the
    test sessions run with a UTC session zone)."""
    if source_type in ("int", "bigint", "smallint", "tinyint"):
        return int(value)
    if source_type == "date":
        if isinstance(value, _dt.datetime):
            value = value.date()
        return (value - _EPOCH_DATE).days
    if source_type in ("timestamp", "timestamp_ntz"):
        if isinstance(value, str):
            value = _dt.datetime.fromisoformat(value)
        if value.tzinfo is None:
            value = value.replace(tzinfo=_dt.timezone.utc)
        delta = value - _EPOCH_TS
        return (
            (delta.days * 86_400 + delta.seconds) * 1_000_000
            + delta.microseconds
        )
    raise ValueError(f"no long ordinal for type {source_type}")


def bucket_literal(value, n: int, source_type: str) -> int | None:
    """spec: (murmur3(v) & Integer.MAX_VALUE) % N; null -> null."""
    if value is None:
        return None
    if source_type == "string":
        h = murmur3_32(str(value).encode("utf-8"))
    else:
        v = _long_ordinal(value, source_type) & 0xFFFFFFFFFFFFFFFF
        h = murmur3_32(v.to_bytes(8, "little"))
    return (h & 0x7FFFFFFF) % n


def truncate_literal(value, w: int, source_type: str):
    """spec: ints truncate toward negative infinity to a multiple of
    W; strings truncate to the first W unicode codepoints."""
    if value is None:
        return None
    if source_type == "string":
        return str(value)[:w]
    v = int(value)
    return v - (((v % w) + w) % w)


def temporal_literal(value, transform: str, source_type: str):
    """spec ordinals: year -> years from 1970, month -> months from
    1970-01, day -> days from epoch, hour -> hours from epoch."""
    if value is None:
        return None
    if transform == "hour":
        micros = _long_ordinal(value, source_type)
        return micros // 3_600_000_000
    if source_type == "date":
        d = value.date() if isinstance(value, _dt.datetime) else value
    else:
        micros = _long_ordinal(value, source_type)
        d = (_EPOCH_DATE + _dt.timedelta(days=micros // 86_400_000_000))
    if transform == "day":
        return (d - _EPOCH_DATE).days
    if transform == "year":
        return d.year - 1970
    if transform == "month":
        return (d.year - 1970) * 12 + d.month - 1
    raise ValueError(f"unknown temporal transform {transform}")


def transform_literal(transform: str, value, source_type: str):
    """Apply a parsed transform to a driver-side literal."""
    name, param = parse_transform(transform)
    if name == "identity":
        return value
    if name == "bucket":
        return bucket_literal(value, param, source_type)
    if name == "truncate":
        return truncate_literal(value, param, source_type)
    return temporal_literal(value, name, source_type)


# ----------------------------- spec parsing -----------------------------

_TEMPORALS = ("year", "month", "day", "hour")
#: accepted spellings per transform word (Iceberg SQL uses plurals)
_ALIASES = {
    "years": "year", "months": "month", "days": "day", "hours": "hour",
    "year": "year", "month": "month", "day": "day", "hour": "hour",
    "bucket": "bucket", "truncate": "truncate",
}


def parse_transform(transform: str) -> tuple[str, int | None]:
    """'bucket[8]' -> ('bucket', 8); 'day' -> ('day', None)."""
    if transform.endswith("]") and "[" in transform:
        name, _, arg = transform[:-1].partition("[")
        return name, int(arg)
    return transform, None


def parse_partition_spec(spec: str) -> dict:
    """One PARTITIONED BY element -> a partition-field dict.

    Accepted forms (matching Iceberg SQL): ``col`` (identity),
    ``day(col)`` / ``days(col)`` / ``year|month|hour`` likewise,
    ``bucket(8, col)``, ``truncate(4, col)``. Returns
    {'transform': canonical transform string, 'source': column name,
    'name': partition field name} with Iceberg's conventional field
    names (``col_day``, ``col_bucket``, ``col_trunc``)."""
    s = spec.strip()
    if "(" not in s:
        return {"transform": "identity", "source": s, "name": s}
    fn, _, rest = s.partition("(")
    fn = fn.strip().lower()
    if not rest.endswith(")"):
        raise ValueError(f"malformed partition spec {spec!r}")
    args = [a.strip() for a in rest[:-1].split(",")]
    if fn not in _ALIASES:
        raise ValueError(
            f"unknown partition transform {fn!r} in {spec!r} (have "
            "identity, bucket, truncate, year, month, day, hour)"
        )
    word = _ALIASES[fn]
    if word in _TEMPORALS:
        if len(args) != 1:
            raise ValueError(f"{word}() takes one column: {spec!r}")
        return {
            "transform": word,
            "source": args[0],
            "name": f"{args[0]}_{word}",
        }
    if len(args) != 2:
        raise ValueError(f"{word}(N, col) takes two args: {spec!r}")
    n, col = int(args[0]), args[1]
    suffix = "bucket" if word == "bucket" else "trunc"
    return {
        "transform": f"{word}[{n}]",
        "source": col,
        "name": f"{col}_{suffix}",
    }


def unparse_partition_spec(field: dict) -> str:
    """Canonical spec string for comparisons and error messages."""
    t, param = parse_transform(field["transform"])
    if t == "identity":
        return field["source"]
    if param is not None:
        return f"{t}({param}, {field['source']})"
    return f"{t}({field['source']})"


def result_spark_type(transform: str, source_spark_type: str) -> str:
    """Spark type of the transformed partition value."""
    name, _ = parse_transform(transform)
    if name == "identity":
        return source_spark_type
    if name == "truncate":
        return source_spark_type
    return "int"


def result_avro_type(transform: str, source_avro_type: str) -> str:
    """Avro type of the transformed value in the manifest partition
    record."""
    name, _ = parse_transform(transform)
    if name in ("identity", "truncate"):
        return source_avro_type
    return "int"


# --------------------------- column pipeline ---------------------------


def _mul32(k: Column, c: int) -> Column:
    """(k * c) mod 2^32 without 64-bit overflow: split k into 16-bit
    halves (each partial product stays under 2^48)."""
    lo = k.bitwiseAND(F.lit(0xFFFF)) * F.lit(c)
    hi = F.shiftleft(
        (F.shiftrightunsigned(k, 16) * F.lit(c)).bitwiseAND(F.lit(0xFFFF)),
        16,
    )
    return (lo + hi).bitwiseAND(F.lit(_M32))


def _rotl(k: Column, r: int) -> Column:
    return (
        F.shiftleft(k, r).bitwiseOR(F.shiftrightunsigned(k, 32 - r))
    ).bitwiseAND(F.lit(_M32))


def _kmix(k: Column) -> Column:
    return _mul32(_rotl(_mul32(k, _C1), 15), _C2)


def _hmix(h: Column, k: Column) -> Column:
    h = h.bitwiseXOR(_kmix(k))
    return (_rotl(h, 13) * F.lit(5) + F.lit(0xE6546B64)).bitwiseAND(
        F.lit(_M32)
    )


def _staged_fmix(df: DataFrame, h: Column, ln, out: str, p: str):
    """Final avalanche, one named column per step (see module doc on
    why stages must be named attributes, not one inline tree)."""
    h = h.bitwiseXOR(ln)
    df = df.withColumn(p + "f1", h.bitwiseXOR(F.shiftrightunsigned(h, 16)))
    df = df.withColumn(p + "f2", _mul32(F.col(p + "f1"), 0x85EBCA6B))
    df = df.withColumn(
        p + "f3",
        F.col(p + "f2").bitwiseXOR(
            F.shiftrightunsigned(F.col(p + "f2"), 13)
        ),
    )
    df = df.withColumn(p + "f4", _mul32(F.col(p + "f3"), 0xC2B2AE35))
    df = df.withColumn(
        out,
        F.col(p + "f4").bitwiseXOR(
            F.shiftrightunsigned(F.col(p + "f4"), 16)
        ),
    )
    return df.drop(p + "f1", p + "f2", p + "f3", p + "f4")


def add_mm3_long_column(
    df: DataFrame, v: Column, out: str, tag: str
) -> DataFrame:
    """``out`` = unsigned murmur3_32 of the little-endian 8 bytes of
    ``v`` (bigint Column) — the spec's hash for int/long/date/ts."""
    p = f"__mm3_{tag}_"
    v = v.cast("long")
    df = df.withColumn(
        p + "h1",
        _hmix(F.lit(0).cast("long"), v.bitwiseAND(F.lit(_M32))),
    )
    df = df.withColumn(
        p + "h2", _hmix(F.col(p + "h1"), F.shiftrightunsigned(v, 32))
    )
    df = _staged_fmix(
        df, F.col(p + "h2"), F.lit(8), out, p
    )
    return df.drop(p + "h1", p + "h2")


def add_mm3_string_column(
    df: DataFrame, src: Column, out: str, tag: str
) -> DataFrame:
    """``out`` = unsigned murmur3_32 of the UTF-8 bytes of ``src``.

    The bytes land in ONE array<long> column (hex + fixed-width
    slicing — decoded once, referenced many times); full blocks fold
    through ``F.aggregate``, the 1-3 tail bytes mix conditionally.
    NULL input produces NULL out (nullness rides the expressions)."""
    p = f"__mm3_{tag}_"
    hx, ln, by, hb, ht = (
        p + "hx", p + "len", p + "bytes", p + "hbody", p + "htail",
    )
    df = df.withColumn(hx, F.hex(F.encode(src, "UTF-8")))
    df = df.withColumn(ln, (F.length(F.col(hx)) / 2).cast("long"))
    empty = F.array().cast("array<long>")
    df = df.withColumn(
        by,
        F.when(
            F.col(ln) > 0,
            F.transform(
                F.sequence(
                    F.lit(1), F.col(ln).cast("int"), F.lit(1)
                ),
                lambda j: F.conv(
                    F.substring(
                        F.col(hx), (j * 2 - 1).cast("int"), F.lit(2)
                    ),
                    16,
                    10,
                ).cast("long"),
            ),
        ).otherwise(F.when(F.col(ln) == 0, empty)),
    )
    L = F.col(ln)
    nblocks = F.shiftright(L, 2)

    def byte(j: Column) -> Column:  # 0-based index into the bytes array
        return F.element_at(F.col(by), (j + 1).cast("int"))

    def block(i: Column) -> Column:  # 4-byte little-endian block i
        j = i * 4
        return (
            byte(j)
            + F.shiftleft(byte(j + 1), 8)
            + F.shiftleft(byte(j + 2), 16)
            + F.shiftleft(byte(j + 3), 24)
        )

    body = F.aggregate(
        F.sequence(F.lit(0).cast("long"), nblocks - 1, F.lit(1)),
        F.lit(0).cast("long"),
        lambda h, i: _hmix(h, block(i)),
    )
    df = df.withColumn(
        hb,
        F.when(nblocks > 0, body).otherwise(F.lit(0).cast("long")),
    )
    r = L.bitwiseAND(F.lit(3))
    tail_k = None
    for t in range(3):
        piece = F.when(
            r > t, F.shiftleft(byte(nblocks * 4 + t), 8 * t)
        ).otherwise(F.lit(0).cast("long"))
        tail_k = piece if tail_k is None else tail_k + piece
    df = df.withColumn(
        ht,
        F.when(r > 0, F.col(hb).bitwiseXOR(_kmix(tail_k))).otherwise(
            F.col(hb)
        ),
    )
    df = _staged_fmix(df, F.col(ht), L, out, p)
    return df.drop(hx, ln, by, hb, ht)


def _micros_col(source: str, source_type: str) -> Column:
    """Microseconds-from-epoch of a timestamp column. ``timestamp``
    (instant) uses ``unix_micros``; ``timestamp_ntz`` derives the
    ordinal from its LOCAL datetime fields (datediff + date_part) —
    per the spec, transforms over a zoneless timestamp are defined on
    the local value, and this stays exact and session-timezone
    independent (pinned under a non-UTC session in tests)."""
    if source_type == "timestamp":
        return F.unix_micros(F.col(source))
    days = F.datediff(
        F.col(source).cast("date"), F.lit("1970-01-01").cast("date")
    ).cast("long")
    sec_of_min = F.date_part(F.lit("SECOND"), F.col(source))
    return (
        days * 86_400
        + F.hour(F.col(source)).cast("long") * 3_600
        + F.minute(F.col(source)).cast("long") * 60
    ) * F.lit(1_000_000) + (sec_of_min * 1_000_000).cast("long")


def _day_ordinal_col(source: str, source_type: str) -> Column:
    """days-from-epoch as an exact integer: floor division of the
    microsecond ordinal via pmod (``div`` truncates toward zero —
    wrong for pre-1970; and float division loses exactness at large
    magnitudes)."""
    if source_type == "date":
        return F.datediff(F.col(source), F.lit("1970-01-01").cast("date"))
    um = _micros_col(source, source_type)
    d = F.lit(86_400_000_000)
    return ((um - F.pmod(um, d)) / d).cast("long")


def _hour_ordinal_col(source: str, source_type: str) -> Column:
    um = _micros_col(source, source_type)
    d = F.lit(3_600_000_000)
    return ((um - F.pmod(um, d)) / d).cast("long")


def add_transform_column(
    df: DataFrame, field: dict, out: str, source_type: str
) -> DataFrame:
    """Add ``out`` = transform(source) to ``df`` — write-time partition
    assignment, all JVM expressions (see module doc)."""
    name, param = parse_transform(field["transform"])
    src = field["source"]
    if src not in df.columns:
        raise ValueError(f"partition source column {src!r} not in batch")
    if name == "identity":
        return df.withColumn(out, F.col(src))
    if name == "truncate":
        if source_type == "string":
            return df.withColumn(out, F.substring(F.col(src), 1, param))
        if source_type in ("int", "bigint", "smallint", "tinyint"):
            return df.withColumn(
                out, F.col(src) - F.pmod(F.col(src), F.lit(param))
            )
        raise ValueError(
            f"truncate over {source_type} not supported (int/long/"
            "string per the implemented spec subset)"
        )
    if name in _TEMPORALS:
        if source_type == "date":
            if name == "hour":
                raise ValueError("hour() over a date column is invalid")
            if name == "day":
                col = _day_ordinal_col(src, source_type)
            elif name == "year":
                col = F.year(F.col(src)) - F.lit(1970)
            else:
                col = (
                    (F.year(F.col(src)) - F.lit(1970)) * F.lit(12)
                    + F.month(F.col(src))
                    - F.lit(1)
                )
            return df.withColumn(out, col.cast("int"))
        if source_type in ("timestamp", "timestamp_ntz"):
            if name == "hour":
                return df.withColumn(
                    out, _hour_ordinal_col(src, source_type).cast("int")
                )
            days = _day_ordinal_col(src, source_type)
            if name == "day":
                return df.withColumn(out, days.cast("int"))
            # year/month derive from the UTC calendar date of the day
            # ordinal — session-timezone independent
            d0 = F.date_from_unix_date(days.cast("int"))
            if name == "year":
                col = F.year(d0) - F.lit(1970)
            else:
                col = (
                    (F.year(d0) - F.lit(1970)) * F.lit(12)
                    + F.month(d0)
                    - F.lit(1)
                )
            return df.withColumn(out, col.cast("int"))
        raise ValueError(
            f"{name}() over {source_type} not supported (date/timestamp)"
        )
    if name == "bucket":
        tag = out.strip("_")
        if source_type == "string":
            df = add_mm3_string_column(df, F.col(src), out + "__h", tag)
        elif source_type in (
            "int", "bigint", "smallint", "tinyint"
        ):
            df = add_mm3_long_column(df, F.col(src), out + "__h", tag)
        elif source_type == "date":
            df = add_mm3_long_column(
                df,
                _day_ordinal_col(src, source_type),
                out + "__h",
                tag,
            )
        elif source_type in ("timestamp", "timestamp_ntz"):
            df = add_mm3_long_column(
                df, _micros_col(src, source_type), out + "__h", tag
            )
        else:
            raise ValueError(
                f"bucket over {source_type} not supported"
            )
        out_col = (
            F.col(out + "__h").bitwiseAND(F.lit(0x7FFFFFFF))
            % F.lit(param)
        ).cast("int")
        return df.withColumn(out, out_col).drop(out + "__h")
    raise ValueError(f"unknown transform {field['transform']!r}")


# ------------------------------- pruning -------------------------------

_RANGE_OPS = {"<", "<=", ">", ">="}


def prune_predicate(
    field: dict, op: str, literal, source_type: str
):
    """A partition-value predicate proving manifest entries OUT for a
    query predicate ``source op literal``, or None when the transform
    cannot prove anything (callers must then KEEP the entry).

    bucket: equality/IN only (hashing destroys order). truncate and
    the temporal transforms are order-preserving, so ranges map to
    ranges over the transformed ordinal; equality maps to equality.
    A None partition value (null partition) is never pruned."""
    name, _param = parse_transform(field["transform"])
    t = field["transform"]

    def lift(v):
        return transform_literal(t, v, source_type)

    if op == "in":
        wanted = {lift(v) for v in literal}
        return lambda pv: pv is None or pv in wanted
    if op == "=":
        w = lift(literal)
        return lambda pv: pv is None or pv == w
    if name == "bucket":
        return None  # ranges don't survive hashing
    if op not in _RANGE_OPS:
        return None
    w = lift(literal)
    # order-preserving transforms floor their input, so boundaries
    # must stay inclusive on the transformed scale: v > L implies
    # t(v) >= t(L), and v < L implies t(v) <= t(L).
    if op in (">", ">="):
        return lambda pv: pv is None or pv >= w
    return lambda pv: pv is None or pv <= w


def prune_interval(field: dict, op: str, literal, source_type: str):
    """MANIFEST-LIST-level twin of ``prune_predicate``: a predicate
    over a manifest's per-field summary interval ``(lower, upper)``
    (spec field_summary 510/511) proving a WHOLE MANIFEST out before
    its entries are decoded, or None when the transform cannot prove
    anything. Same lifting rules: equality/IN survive every transform
    (bucket included — equal sources hash equal); ranges survive only
    the order-preserving transforms, with floor-inclusive boundaries.
    Unknown bounds (None — pre-summary manifests) always keep."""
    name, _param = parse_transform(field["transform"])
    t = field["transform"]

    def lift(v):
        return transform_literal(t, v, source_type)

    if op == "in":
        wanted = {lift(v) for v in literal}
        return lambda lo, hi: (
            lo is None
            or hi is None
            or any(lo <= w <= hi for w in wanted)
        )
    if op == "=":
        w = lift(literal)
        return lambda lo, hi: (
            lo is None or hi is None or lo <= w <= hi
        )
    if name == "bucket":
        return None  # ranges don't survive hashing
    if op not in _RANGE_OPS:
        return None
    w = lift(literal)
    if op in (">", ">="):
        return lambda lo, hi: hi is None or hi >= w
    return lambda lo, hi: lo is None or lo <= w


def residual_column(col: str, op: str, literal) -> Column:
    """The exact query predicate, applied on the pruned scan — pruning
    selects files, the residual selects rows."""
    c = F.col(col)
    if op == "=":
        return c == F.lit(literal)
    if op == "in":
        return c.isin(list(literal))
    if op == "<":
        return c < F.lit(literal)
    if op == "<=":
        return c <= F.lit(literal)
    if op == ">":
        return c > F.lit(literal)
    if op == ">=":
        return c >= F.lit(literal)
    raise ValueError(f"unknown predicate op {op!r}")
