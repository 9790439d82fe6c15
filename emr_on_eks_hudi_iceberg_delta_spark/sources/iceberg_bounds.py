"""Iceberg per-file COLUMN BOUNDS — the manifest's ``lower_bounds`` /
``upper_bounds`` maps (spec field-ids 125/128, values in the spec's
single-value binary serialization), collected from parquet FOOTERS at
write time and consulted for min/max FILE SKIPPING at read time.

This is the Iceberg twin of the Delta stats-skipping path
(delta_log.py:_collect_file_stats / _stats_may_match): without it,
a predicate on any non-partition column scans every live file; with
it, the driver's manifest pass proves files out before Spark lists
anything. ``IcebergTable.read_hidden`` consults bounds IN THE SAME
PASS as hidden-partition pruning, so one filter list drives both.

Encodings (spec Appendix D single-value serialization): int/date =
4-byte little-endian, long/timestamp-micros = 8-byte little-endian,
float/double = IEEE little-endian, boolean = 1 byte, string = UTF-8
bytes. Bounds are keyed by FIELD ID, so renames never invalidate
them; decode resolves each id's type through the schema history
(int-vs-long width disambiguates widened columns). Columns whose
footer stats are absent or unsupported simply have no bounds — and a
file without bounds is never skipped (skipping is one-sided, like
every pruning path in this repo).
"""

from __future__ import annotations

import datetime as _dt
import struct

_EPOCH_DATE = _dt.date(1970, 1, 1)
_EPOCH_TS = _dt.datetime(1970, 1, 1)

#: avro schema factory for one bounds map (spec: map<int, bytes> as a
#: k_v array record; names must be unique per embedding site)
def bounds_avro(name: str, field_id: int) -> dict:
    return {
        "type": "array",
        "items": {
            "type": "record",
            "name": f"k_v_{field_id}",
            "fields": [
                {"name": "key", "type": "int", "field-id": field_id + 1},
                {
                    "name": "value",
                    "type": "bytes",
                    "field-id": field_id + 2,
                },
            ],
        },
    }


def _micros(dt_val) -> int:
    if isinstance(dt_val, _dt.datetime):
        base = dt_val.replace(tzinfo=None)
        delta = base - _EPOCH_TS
        return (
            (delta.days * 86_400 + delta.seconds) * 1_000_000
            + delta.microseconds
        )
    raise TypeError(type(dt_val))


def encode_bound(value, ice_type: str) -> bytes | None:
    """Spec single-value serialization; None for unsupported types."""
    try:
        if ice_type == "int":
            return struct.pack("<i", int(value))
        if ice_type == "long":
            return struct.pack("<q", int(value))
        if ice_type == "float":
            return struct.pack("<f", float(value))
        if ice_type == "double":
            return struct.pack("<d", float(value))
        if ice_type == "boolean":
            return b"\x01" if value else b"\x00"
        if ice_type == "string":
            return str(value).encode("utf-8")
        if ice_type == "date":
            if isinstance(value, _dt.datetime):
                value = value.date()
            return struct.pack("<i", (value - _EPOCH_DATE).days)
        if ice_type in ("timestamp", "timestamptz"):
            return struct.pack("<q", _micros(value))
    except (ValueError, TypeError, struct.error, OverflowError):
        return None
    return None


def decode_bound(raw: bytes, ice_type: str):
    """Inverse of encode_bound. Temporals decode to their ORDINALS
    (days / micros) — comparisons happen on the ordinal scale, so
    literal coercion is integer math, never timezone-sensitive.
    A 4-byte payload under a ``long`` type is a pre-widening int
    bound and up-casts losslessly."""
    if ice_type in ("int", "date"):
        return struct.unpack("<i", raw)[0]
    if ice_type in ("long", "timestamp", "timestamptz"):
        if len(raw) == 4:
            return struct.unpack("<i", raw)[0]
        return struct.unpack("<q", raw)[0]
    if ice_type == "float":
        if len(raw) == 8:
            return struct.unpack("<d", raw)[0]
        return struct.unpack("<f", raw)[0]
    if ice_type == "double":
        if len(raw) == 4:
            return struct.unpack("<f", raw)[0]
        return struct.unpack("<d", raw)[0]
    if ice_type == "boolean":
        return raw != b"\x00"
    if ice_type == "string":
        return raw.decode("utf-8")
    raise ValueError(f"no bound decoding for {ice_type}")


def literal_ordinal(value, ice_type: str):
    """A query literal on the same comparison scale decode_bound
    uses."""
    if ice_type == "date":
        if isinstance(value, _dt.datetime):
            value = value.date()
        if isinstance(value, _dt.date):
            return (value - _EPOCH_DATE).days
        return int(value)
    if ice_type in ("timestamp", "timestamptz"):
        if isinstance(value, _dt.datetime):
            return _micros(value)
        return int(value)
    if ice_type == "string":
        return str(value)
    if ice_type == "boolean":
        return bool(value)
    if ice_type in ("float", "double"):
        return float(value)
    return int(value)


def collect_bounds(path: str, name_to_type: dict[str, str]) -> tuple:
    """(lower, upper) single-value-encoded bounds per column NAME from
    one parquet footer — metadata only, no data pages. Columns with
    unusable stats in ANY row group are omitted entirely."""
    import pyarrow.parquet as pq

    try:
        md = pq.read_metadata(path)
    except Exception:
        return {}, {}
    mins: dict = {}
    maxs: dict = {}
    dropped: set = set()
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema
            st = col.statistics
            if (
                "." in name
                or name not in name_to_type
                or st is None
                or not st.has_min_max
                or isinstance(st.min, bytes)
            ):
                dropped.add(name)
                continue
            lo, hi = st.min, st.max
            mins[name] = lo if name not in mins else min(mins[name], lo)
            maxs[name] = hi if name not in maxs else max(maxs[name], hi)
    lower: dict[str, bytes] = {}
    upper: dict[str, bytes] = {}
    for name in mins:
        if name in dropped:
            continue
        t = name_to_type[name]
        lo_b = encode_bound(mins[name], t)
        hi_b = encode_bound(maxs[name], t)
        if lo_b is not None and hi_b is not None:
            lower[name] = lo_b
            upper[name] = hi_b
    return lower, upper


def bounds_may_match(
    entry_file: dict,
    ids_by_col: dict[str, int],
    types_by_id: dict[int, str],
    filters: list[tuple],
) -> bool:
    """True unless the data file's bounds PROVE the predicate
    conjunction cannot match — one-sided, absent bounds keep."""
    lower = {
        r["key"]: r["value"] for r in entry_file.get("lower_bounds") or []
    }
    upper = {
        r["key"]: r["value"] for r in entry_file.get("upper_bounds") or []
    }
    if not lower or not upper:
        return True
    for col, op, value in filters:
        fid = ids_by_col.get(col)
        if fid is None or fid not in lower or fid not in upper:
            continue
        t = types_by_id.get(fid)
        if t is None:
            continue
        try:
            lo = decode_bound(lower[fid], t)
            hi = decode_bound(upper[fid], t)
            v = literal_ordinal(value, t)
            if op in ("=", "==") and not (lo <= v <= hi):
                return False
            if op in (">", ">=") and hi < v:
                return False
            if op == ">" and hi == v and lo == hi:
                return False
            if op in ("<", "<=") and lo > v:
                return False
            if op == "<" and lo == v and lo == hi:
                return False
            if op == "in":
                vals = [literal_ordinal(x, t) for x in value]
                if all(not (lo <= x <= hi) for x in vals):
                    return False
        except (ValueError, TypeError, struct.error):
            continue  # undecodable: keep the file
    return True
