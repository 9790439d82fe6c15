"""Pure-Python 64-bit RoaringBitmapArray codec — the serialization the
Delta protocol mandates for deletion vectors.

The Delta PROTOCOL.md ("Deletion Vector Format") stores a DV's row
indexes as a 64-bit RoaringBitmapArray in its *portable* serialization:

* 4-byte little-endian magic number ``1681511377``
* 8-byte little-endian count of 32-bit bitmaps
* that many 32-bit Roaring bitmaps, DENSE by their high-32-bit key
  (index ``i`` holds the low 32 bits of every value whose high 32 bits
  equal ``i``; gaps are serialized as empty bitmaps), each in the
  standard Roaring interchange format (RoaringFormatSpec).

The standard 32-bit format, as published at
https://github.com/RoaringBitmap/RoaringFormatSpec:

* cookie ``12346`` (SERIAL_COOKIE_NO_RUNCONTAINER, 4-byte LE) followed
  by a 4-byte LE container count — OR cookie ``12347`` (SERIAL_COOKIE)
  in the low 16 bits with ``count - 1`` in the high 16, followed by a
  ``ceil(count / 8)``-byte run-container bitset;
* per-container descriptive headers: ``uint16`` key (the value's bits
  16..31), ``uint16`` cardinality-1;
* a 4-byte LE offset per container (no-run cookie always; run cookie
  only when ``count >= 4``), measured from the start of the bitmap;
* container payloads in key order: *array* containers (cardinality
  <= 4096) are sorted ``uint16`` values; *bitmap* containers are 1024
  little-endian ``uint64`` words (8 KiB); *run* containers are a
  ``uint16`` run count then (start, length-1) ``uint16`` pairs.

This writer always emits the no-run form (array / bitmap containers
only — canonical and always legal); the reader accepts all three
container kinds so DVs produced by other writers replay too. Like the
pure-Python Avro OCF codec (avro_io.py), this exists because the
container has no Delta runtime to lean on — the format itself is an
open, published spec.

Reference parity: the reference's Delta job (delta/delta_scd_script.py)
runs on a Delta runtime where deletion vectors are a table feature;
this codec is what lets the log-native table (delta_log.py) implement
the same feature honestly instead of refusing it.
"""

from __future__ import annotations

import struct

MAGIC = 1681511377  # RoaringBitmapArray portable magic (Delta PROTOCOL.md)
_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE = 12347
_NO_OFFSET_THRESHOLD = 4
_ARRAY_MAX = 4096


def _serialize_bitmap32(values: list[int]) -> bytes:
    """Standard-format serialization of one 32-bit Roaring bitmap.
    ``values`` must be sorted unique ints in [0, 2**32)."""
    # bucket by high-16 key
    containers: dict[int, list[int]] = {}
    for v in values:
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    k = len(keys)
    out = bytearray()
    out += struct.pack("<I", _SERIAL_COOKIE_NO_RUN)
    out += struct.pack("<I", k)
    for key in keys:
        out += struct.pack("<HH", key, len(containers[key]) - 1)
    # offsets: from the start of this bitmap's stream
    header_len = 8 + 4 * k + 4 * k
    off = header_len
    payloads = []
    for key in keys:
        vals = containers[key]
        if len(vals) <= _ARRAY_MAX:
            payload = struct.pack(f"<{len(vals)}H", *vals)
        else:
            words = [0] * 1024
            for lo in vals:
                words[lo >> 6] |= 1 << (lo & 63)
            payload = struct.pack("<1024Q", *words)
        payloads.append(payload)
        out += struct.pack("<I", off)
        off += len(payload)
    for p in payloads:
        out += p
    return bytes(out)


def _deserialize_bitmap32(buf: bytes, pos: int) -> tuple[list[int], int]:
    """Parse one standard-format 32-bit bitmap at ``pos``; returns
    (sorted values, next position)."""
    start = pos
    (cookie32,) = struct.unpack_from("<I", buf, pos)
    pos += 4
    cookie = cookie32 & 0xFFFF
    run_flags = b""
    if cookie == _SERIAL_COOKIE:
        k = (cookie32 >> 16) + 1
        nbytes = (k + 7) // 8
        run_flags = buf[pos:pos + nbytes]
        pos += nbytes
        has_offsets = k >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (k,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        has_offsets = True
    else:
        raise ValueError(f"bad roaring cookie {cookie32:#x} at {start}")
    headers = []
    for _ in range(k):
        key, card_m1 = struct.unpack_from("<HH", buf, pos)
        pos += 4
        headers.append((key, card_m1 + 1))
    if has_offsets:
        pos += 4 * k  # offsets are redundant for a sequential parse
    values: list[int] = []
    for i, (key, card) in enumerate(headers):
        is_run = bool(run_flags) and bool(run_flags[i // 8] & (1 << (i % 8)))
        base = key << 16
        if is_run:
            (nruns,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(nruns):
                s, lm1 = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.extend(base + x for x in range(s, s + lm1 + 1))
        elif card <= _ARRAY_MAX:
            vals = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            values.extend(base + v for v in vals)
        else:
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            for wi, w in enumerate(words):
                while w:
                    b = (w & -w).bit_length() - 1
                    values.append(base + (wi << 6) + b)
                    w &= w - 1
    return values, pos


def serialize(values) -> bytes:
    """64-bit RoaringBitmapArray portable serialization of an iterable
    of non-negative ints (row indexes). Deterministic: same set, same
    bytes."""
    vals = sorted(set(int(v) for v in values))
    if vals and vals[0] < 0:
        raise ValueError("roaring values must be non-negative")
    buckets: dict[int, list[int]] = {}
    for v in vals:
        buckets.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    n = (max(buckets) + 1) if buckets else 0
    if n > 1 << 20:
        raise ValueError(
            f"high-32 key {n - 1} implies {n} dense bitmaps — not a "
            "plausible row-index set"
        )
    out = bytearray()
    out += struct.pack("<I", MAGIC)
    out += struct.pack("<q", n)
    for i in range(n):
        out += _serialize_bitmap32(buckets.get(i, []))
    return bytes(out)


def deserialize(buf: bytes) -> list[int]:
    """Inverse of :func:`serialize`; returns sorted row indexes."""
    (magic,) = struct.unpack_from("<I", buf, 0)
    if magic != MAGIC:
        raise ValueError(f"bad RoaringBitmapArray magic {magic}")
    (n,) = struct.unpack_from("<q", buf, 4)
    pos = 12
    values: list[int] = []
    for i in range(n):
        lows, pos = _deserialize_bitmap32(buf, pos)
        values.extend((i << 32) + lo for lo in lows)
    if pos != len(buf):
        raise ValueError(
            f"trailing bytes after bitmap array ({len(buf) - pos})"
        )
    return values


# --- Z85 (ZeroMQ base-85), the encoding Delta uses for DV UUIDs and
# --- inline DV payloads (Base85Codec in the Delta reference impl).

_Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_DECODE = {c: i for i, c in enumerate(_Z85_ALPHABET)}


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise ValueError("z85 input must be a multiple of 4 bytes")
    out = []
    for i in range(0, len(data), 4):
        (word,) = struct.unpack(">I", data[i:i + 4])
        chunk = []
        for _ in range(5):
            chunk.append(_Z85_ALPHABET[word % 85])
            word //= 85
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError("z85 input must be a multiple of 5 chars")
    out = bytearray()
    for i in range(0, len(text), 5):
        word = 0
        for c in text[i:i + 5]:
            word = word * 85 + _Z85_DECODE[c]
        out += struct.pack(">I", word)
    return bytes(out)
