"""Pure-Python Avro OCF codec (sources/avro_io.py): spec byte vectors
(hand-computed, NOT round-tripped through our own encoder), nested
schema round-trips, deflate blocks, malformed-file refusals."""

import io
import json
import os
import struct
import sys
import uuid
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emr_on_eks_hudi_iceberg_delta_spark.sources.avro_io import (
    decode_value,
    encode_value,
    read_ocf,
    write_ocf,
    zigzag_decode,
    zigzag_encode,
)


def test_zigzag_spec_vectors():
    """Straight from the Avro spec's varint/zigzag table."""
    vectors = {
        0: b"\x00", -1: b"\x01", 1: b"\x02", -2: b"\x03", 2: b"\x04",
        -64: b"\x7f", 64: b"\x80\x01", -65: b"\x81\x01",
        8192: b"\x80\x80\x01",
    }
    for n, b in vectors.items():
        assert zigzag_encode(n) == b, n
        assert zigzag_decode(io.BytesIO(b)) == n, n
    big = 2**62 - 7
    assert zigzag_decode(io.BytesIO(zigzag_encode(big))) == big
    assert zigzag_decode(io.BytesIO(zigzag_encode(-big))) == -big


def test_primitive_encodings_match_spec():
    assert encode_value("foo", "string") == b"\x06foo"
    assert encode_value(b"\x01\x02", "bytes") == b"\x04\x01\x02"
    assert encode_value(True, "boolean") == b"\x01"
    assert encode_value(3.5, "double") == struct.pack("<d", 3.5)
    # union [null, string]: null -> index 0 only; string -> index 1+body
    u = ["null", "string"]
    assert encode_value(None, u) == b"\x00"
    assert encode_value("a", u) == b"\x02\x02a"


def test_record_array_map_roundtrip():
    schema = {
        "type": "record", "name": "m", "fields": [
            {"name": "path", "type": "string"},
            {"name": "n", "type": "long"},
            {"name": "opt", "type": ["null", "double"]},
            {"name": "tags", "type": {"type": "array", "items": "string"}},
            {"name": "props", "type": {"type": "map", "values": "long"}},
            {"name": "nested", "type": {
                "type": "record", "name": "inner", "fields": [
                    {"name": "a", "type": "int"}]}},
        ],
    }
    rec = {
        "path": "s3://x/y.parquet", "n": 12345, "opt": None,
        "tags": ["a", "b"], "props": {"k1": 7, "k2": -7},
        "nested": {"a": 3},
    }
    enc = encode_value(rec, schema)
    assert decode_value(io.BytesIO(enc), schema) == rec


def test_ocf_roundtrip_both_codecs(tmp_path):
    schema = {
        "type": "record", "name": "r", "fields": [
            {"name": "k", "type": "string"},
            {"name": "v", "type": "long"}]
    }
    recs = [{"k": f"k{i}", "v": i * 11} for i in range(100)]
    for codec in ("null", "deflate"):
        p = str(tmp_path / f"t_{codec}.avro")
        write_ocf(p, schema, recs, codec=codec)
        got_schema, got = read_ocf(p)
        assert got == recs
        assert got_schema["name"] == "r"


def test_read_hand_assembled_ocf(tmp_path):
    """Decode an OCF assembled BYTE BY BYTE (not by our writer): one
    uncompressed block, two records of {name:string, id:long}."""
    schema = {"type": "record", "name": "t", "fields": [
        {"name": "name", "type": "string"},
        {"name": "id", "type": "long"}]}
    sj = json.dumps(schema).encode()
    sync = uuid.uuid4().bytes
    body = b"\x06abc" + b"\x54" + b"\x02z" + b"\x01"  # (abc,42), (z,-1)
    blob = (
        b"Obj\x01"
        + b"\x04"  # 2 metadata entries
        + b"\x16avro.schema" + zigzag_encode(len(sj)) + sj
        + b"\x14avro.codec" + b"\x08null"
        + b"\x00"
        + sync
        + b"\x04"  # 2 records
        + zigzag_encode(len(body)) + body
        + sync
    )
    p = str(tmp_path / "hand.avro")
    open(p, "wb").write(blob)
    _, recs = read_ocf(p)
    assert recs == [{"name": "abc", "id": 42}, {"name": "z", "id": -1}]


def test_read_refuses_non_avro_and_bad_sync(tmp_path):
    import pytest

    p = str(tmp_path / "bad")
    open(p, "wb").write(b"PAR1not avro")
    with pytest.raises(ValueError, match="not an Avro"):
        read_ocf(p)

    schema = {"type": "record", "name": "r",
              "fields": [{"name": "v", "type": "long"}]}
    good = str(tmp_path / "good.avro")
    write_ocf(good, schema, [{"v": 1}], codec="null")
    blob = bytearray(open(good, "rb").read())
    blob[-1] ^= 0xFF  # corrupt the trailing sync marker
    bad2 = str(tmp_path / "bad2.avro")
    open(bad2, "wb").write(bytes(blob))
    with pytest.raises(ValueError, match="sync"):
        read_ocf(bad2)


def test_read_ocf_cached_immutability_key(tmp_path):
    """r11 planning cache: a second read of an unchanged file is a
    cache hit (same object), a REWRITE at the same path (new
    size/mtime) invalidates, and results always equal the uncached
    decode."""
    import time as _time

    from emr_on_eks_hudi_iceberg_delta_spark.sources.avro_io import (
        read_ocf,
        read_ocf_cached,
        write_ocf,
    )

    schema = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "x", "type": "long"}],
    }
    p = str(tmp_path / "c.avro")
    write_ocf(p, schema, [{"x": i} for i in range(100)])
    s1, r1 = read_ocf_cached(p)
    s2, r2 = read_ocf_cached(p)
    assert r1 is r2  # hit
    assert r1 == read_ocf(p)[1]
    _time.sleep(0.01)  # distinct mtime_ns even on coarse clocks
    write_ocf(p, schema, [{"x": i} for i in range(7)])
    _, r3 = read_ocf_cached(p)
    assert len(r3) == 7  # rewrite invalidated the old entry
    assert r3 == read_ocf(p)[1]


def test_read_ocf_cached_oversized_file_does_not_wipe_cache(tmp_path, monkeypatch):
    """r11 self-review fix: a manifest too big to cache must be served
    WITHOUT evicting the warm planning state."""
    from emr_on_eks_hudi_iceberg_delta_spark.sources import avro_io

    monkeypatch.setattr(avro_io, "_OCF_CACHE", {})
    monkeypatch.setattr(avro_io, "_OCF_CACHE_MAX_RECORDS", 100)
    schema = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "x", "type": "long"}],
    }
    small = str(tmp_path / "small.avro")
    avro_io.write_ocf(small, schema, [{"x": i} for i in range(50)])
    _, warm = avro_io.read_ocf_cached(small)
    big = str(tmp_path / "big.avro")
    avro_io.write_ocf(big, schema, [{"x": i} for i in range(500)])
    _, huge = avro_io.read_ocf_cached(big)
    assert len(huge) == 500
    # the warm entry survived and still hits
    _, again = avro_io.read_ocf_cached(small)
    assert again is warm
