"""Minimal pure-Python Avro Object Container File codec — the missing
dependency that unlocks Iceberg's metadata layer in this container.

Iceberg stores its manifests and manifest lists as Avro OCF; the
container has neither spark-avro (verified absent in round 6 —
``iceberg_submit.sh:33-34``'s packages never land here) nor
avro/fastavro. But the Avro 1.x binary encoding is a small, public
spec (https://avro.apache.org/docs/1.11.1/specification/): zigzag
varints, length-prefixed strings/bytes, fields in schema order,
block-framed arrays/maps, and an OCF wrapper of
``Obj\\x01 + metadata map + 16-byte sync`` followed by
``(count, size, payload, sync)`` blocks. This module implements
exactly that — schema-driven encode/decode for null / boolean / int /
long / float / double / bytes / string / record / array / map /
union / fixed / enum, with ``null`` and ``deflate`` (raw DEFLATE,
per spec) codecs.

Scope contract: this is a METADATA-scale codec (manifests are KBs to
MBs); the data plane stays parquet read by Spark. Logical types pass
through as their base type. Schema resolution (reader != writer
schema) is not implemented — Iceberg manifests embed their writer
schema, which is the one we decode with.

Guard against symmetric bugs: tests decode HAND-COMPUTED byte strings
(zigzag vectors straight from the spec, a hand-assembled OCF) rather
than only round-tripping through this module's own encoder.
"""

from __future__ import annotations

import io
import json
import os
import struct
import uuid
import zlib

MAGIC = b"Obj\x01"


# ------------------------------ primitives ---------------------------------


def zigzag_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def zigzag_decode(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        (b,) = buf.read(1)
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _encode_bytes(b: bytes) -> bytes:
    return zigzag_encode(len(b)) + b


def _encode_str(s: str) -> bytes:
    return _encode_bytes(s.encode("utf-8"))


# ----------------------------- schema codec --------------------------------


def _norm(schema, named: dict):
    """Resolve schema references and register named types."""
    if isinstance(schema, str):
        if schema in named:
            return named[schema]
        return schema  # primitive name
    if isinstance(schema, list):
        return schema
    t = schema.get("type")
    if t in ("record", "fixed", "enum"):
        named[schema["name"]] = schema
    return schema


def encode_value(value, schema, named: dict | None = None) -> bytes:
    named = named if named is not None else {}
    schema = _norm(schema, named)
    if isinstance(schema, list):  # union: [index] + value
        for i, branch in enumerate(schema):
            bt = branch if isinstance(branch, str) else branch.get("type")
            if value is None and bt == "null":
                return zigzag_encode(i)
            if value is not None and bt != "null":
                return zigzag_encode(i) + encode_value(
                    value, branch, named
                )
        raise ValueError(f"no union branch for {value!r} in {schema}")
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return b""
    if t == "boolean":
        return b"\x01" if value else b"\x00"
    if t in ("int", "long"):
        return zigzag_encode(int(value))
    if t == "float":
        return struct.pack("<f", float(value))
    if t == "double":
        return struct.pack("<d", float(value))
    if t == "bytes":
        return _encode_bytes(bytes(value))
    if t == "string":
        return _encode_str(value)
    if t == "fixed":
        b = bytes(value)
        if len(b) != schema["size"]:
            raise ValueError("fixed size mismatch")
        return b
    if t == "enum":
        return zigzag_encode(schema["symbols"].index(value))
    if t == "record":
        out = bytearray()
        for f in schema["fields"]:
            out += encode_value(value.get(f["name"]), f["type"], named)
        return bytes(out)
    if t == "array":
        if not value:
            return zigzag_encode(0)
        out = bytearray(zigzag_encode(len(value)))
        for item in value:
            out += encode_value(item, schema["items"], named)
        out += zigzag_encode(0)
        return bytes(out)
    if t == "map":
        if not value:
            return zigzag_encode(0)
        out = bytearray(zigzag_encode(len(value)))
        for k, v in value.items():
            out += _encode_str(k)
            out += encode_value(v, schema["values"], named)
        out += zigzag_encode(0)
        return bytes(out)
    raise ValueError(f"unsupported schema {schema!r}")


def decode_value(buf: io.BytesIO, schema, named: dict | None = None):
    named = named if named is not None else {}
    schema = _norm(schema, named)
    if isinstance(schema, list):
        idx = zigzag_decode(buf)
        return decode_value(buf, schema[idx], named)
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) == b"\x01"
    if t in ("int", "long"):
        return zigzag_decode(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        return buf.read(zigzag_decode(buf))
    if t == "string":
        return buf.read(zigzag_decode(buf)).decode("utf-8")
    if t == "fixed":
        return buf.read(schema["size"])
    if t == "enum":
        return schema["symbols"][zigzag_decode(buf)]
    if t == "record":
        return {
            f["name"]: decode_value(buf, f["type"], named)
            for f in schema["fields"]
        }
    if t == "array":
        out = []
        while True:
            n = zigzag_decode(buf)
            if n == 0:
                return out
            if n < 0:  # block with byte size prefix
                n = -n
                zigzag_decode(buf)  # skip size
            for _ in range(n):
                out.append(decode_value(buf, schema["items"], named))
    if t == "map":
        out = {}
        while True:
            n = zigzag_decode(buf)
            if n == 0:
                return out
            if n < 0:
                n = -n
                zigzag_decode(buf)
            for _ in range(n):
                k = buf.read(zigzag_decode(buf)).decode("utf-8")
                out[k] = decode_value(buf, schema["values"], named)
    raise ValueError(f"unsupported schema {schema!r}")


# ------------------------------- OCF layer ---------------------------------


def write_ocf(
    path: str, schema: dict, records: list[dict], codec: str = "deflate"
) -> None:
    """Write an Avro Object Container File (one block; manifests are
    metadata-sized)."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    sync = uuid.uuid4().bytes
    named: dict = {}
    payload = b"".join(encode_value(r, schema, named) for r in records)
    if codec == "deflate":
        comp = zlib.compressobj(9, zlib.DEFLATED, -15)
        payload = comp.compress(payload) + comp.flush()
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": codec.encode(),
    }
    out = bytearray(MAGIC)
    out += zigzag_encode(len(meta))
    for k, v in meta.items():
        out += _encode_str(k)
        out += _encode_bytes(v)
    out += zigzag_encode(0)
    out += sync
    if records:
        out += zigzag_encode(len(records))
        out += zigzag_encode(len(payload))
        out += payload
        out += sync
    with open(path, "wb") as f:
        f.write(bytes(out))


def read_ocf(path: str) -> tuple[dict, list[dict]]:
    """Read an Avro OCF: returns (writer schema, records)."""
    buf = io.BytesIO(open(path, "rb").read())
    if buf.read(4) != MAGIC:
        raise ValueError(f"{path}: not an Avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        n = zigzag_decode(buf)
        if n == 0:
            break
        if n < 0:
            n = -n
            zigzag_decode(buf)
        for _ in range(n):
            k = buf.read(zigzag_decode(buf)).decode("utf-8")
            meta[k] = buf.read(zigzag_decode(buf))
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec {codec!r}")
    sync = buf.read(16)
    records: list[dict] = []
    named: dict = {}
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, 1)
        count = zigzag_decode(buf)
        size = zigzag_decode(buf)
        block = buf.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        bbuf = io.BytesIO(block)
        for _ in range(count):
            records.append(decode_value(bbuf, schema, named))
        if buf.read(16) != sync:
            raise ValueError(f"{path}: sync marker mismatch")
    return schema, records


# --------------------------- planning cache ---------------------------

#: (abspath, size, mtime_ns) -> (schema, records). Iceberg manifests
#: and manifest lists are IMMUTABLE (uuid/snapshot-named, written once,
#: atomically published), so a stat-keyed cache is sound; the key's
#: size+mtime guard covers the paranoid case of an overwritten path.
#: Measured need (tools/manifest_planning_bench.py, r11): pure-python
#: OCF decode costs ~30 us/entry — ~30 s for a 10^6-file manifest —
#: and every read/DML re-plans through _entries, so repeated planning
#: re-paid it. CONTRACT: callers must treat returned records as
#: READ-ONLY (the carried-forward commit paths build fresh wrapper
#: dicts and never mutate decoded ones).
_OCF_CACHE: dict[tuple, tuple] = {}
_OCF_CACHE_MAX_FILES = 32
_OCF_CACHE_MAX_RECORDS = 4_000_000


def read_ocf_cached(path: str) -> tuple[dict, list[dict]]:
    """``read_ocf`` behind the immutability-keyed planning cache."""
    st = os.stat(path)
    key = (os.path.abspath(path), st.st_size, st.st_mtime_ns)
    hit = _OCF_CACHE.get(key)
    if hit is not None:
        return hit
    out = read_ocf(path)
    if len(out[1]) > _OCF_CACHE_MAX_RECORDS:
        return out  # uncacheable: never evict the warm state for it
    total = sum(len(v[1]) for v in _OCF_CACHE.values())
    while _OCF_CACHE and (
        len(_OCF_CACHE) >= _OCF_CACHE_MAX_FILES
        or total + len(out[1]) > _OCF_CACHE_MAX_RECORDS
    ):
        oldest = next(iter(_OCF_CACHE))  # FIFO eviction
        total -= len(_OCF_CACHE.pop(oldest)[1])
    _OCF_CACHE[key] = out
    return out
