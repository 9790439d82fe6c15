"""Measure DRIVER-side Iceberg planning cost at large file counts.

The layout writes ONE full-state manifest per snapshot (appends carry
prior files forward as EXISTING), so planning a read decodes one Avro
manifest with O(total files) entries and builds the live-path list —
all driver-side, the same boundary real single-node readers have.
This benchmark synthesizes manifests at 10^4 .. 10^6 entries with the
production schema (bounds populated) and times the decode + live-set
build, answering the r10 verdict's "quantify the planning cost and
document the measured boundary" item. Results land in SCALE.md.

Usage: python tools/manifest_planning_bench.py
Prints one JSON line: {"rows": {n_entries: {"write_s", "decode_s",
"liveset_s", "mb"}}, ...}
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emr_on_eks_hudi_iceberg_delta_spark.sources.avro_io import (
    read_ocf,
    read_ocf_cached,
    write_ocf,
)
from emr_on_eks_hudi_iceberg_delta_spark.sources.iceberg_layout import (
    STATUS_DELETED,
    manifest_entry_schema,
)


def synth_entries(n: int) -> list[dict]:
    return [
        {
            "status": 1,
            "snapshot_id": 12345,
            "data_file": {
                "file_path": f"/warehouse/t/data/part-{i:08d}-"
                f"0000aaaa-bbbb-cccc-dddd-{i:012d}.parquet",
                "file_format": "PARQUET",
                "partition": {"p": i % 1024},
                "record_count": 10_000,
                "file_size_in_bytes": 128 << 20,
                "block_size_in_bytes": 1 << 27,
                "lower_bounds": [{"key": 1, "value": b"\x00" * 8}],
                "upper_bounds": [{"key": 1, "value": b"\xff" * 8}],
            },
        }
        for i in range(n)
    ]


def main() -> None:
    schema = manifest_entry_schema([("p", "int")])
    out: dict[str, dict] = {}
    for n in (10_000, 100_000, 1_000_000):
        entries = synth_entries(n)
        path = os.path.join(
            tempfile.mkdtemp(prefix="mplan_"), f"m{n}.avro"
        )
        t0 = time.perf_counter()
        write_ocf(path, schema, entries)
        t_write = time.perf_counter() - t0
        t0 = time.perf_counter()
        _, decoded = read_ocf(path)
        t_decode = time.perf_counter() - t0
        t0 = time.perf_counter()
        live = [
            e["data_file"]["file_path"]
            for e in decoded
            if e["status"] != STATUS_DELETED
        ]
        t_live = time.perf_counter() - t0
        assert len(live) == n
        read_ocf_cached(path)  # populate
        t0 = time.perf_counter()
        _, again = read_ocf_cached(path)
        t_cached = time.perf_counter() - t0
        assert len(again) == n
        out[str(n)] = {
            "write_s": round(t_write, 3),
            "decode_s": round(t_decode, 3),
            "liveset_s": round(t_live, 3),
            "cached_replan_s": round(t_cached, 6),
            "mb": round(os.path.getsize(path) / 1e6, 1),
        }
        os.remove(path)
    print(json.dumps({"metric": "manifest_planning", "rows": out}))


if __name__ == "__main__":
    main()
