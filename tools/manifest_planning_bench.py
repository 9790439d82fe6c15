"""Measure DRIVER-side Iceberg planning cost at large file counts.

Monolithic scenario (pre-r12 layout): ONE full-state manifest per
snapshot means planning decodes O(total files) Avro entries on the
first plan — the measured ~30 us/entry boundary (36 s at 10^6 files)
the r11 verdict documented.

Sharded scenario (r12 layout): appends REUSE parent manifests and add
one manifest per commit, each carrying spec-507 partition summaries in
the manifest list. A partition-filtered first plan prunes whole
manifests BEFORE decode, so the decode cost is O(matching manifests) —
sub-linear in table size. This benchmark shards the same 10^6 entries
into 256 manifests and times a point-partition-filtered first plan
end-to-end (list decode + summary pruning + matching-manifest decode),
beside the monolithic numbers.

Usage: python tools/manifest_planning_bench.py
Prints one JSON line: {"rows": {n_entries: {"write_s", "decode_s",
"liveset_s", "mb"}}, "sharded": {...}}
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

    # ---- sharded scenario (r12): 10^6 entries over 256 manifests ----
    from emr_on_eks_hudi_iceberg_delta_spark.sources.iceberg_layout import (
        MANIFEST_FILE_SCHEMA,
        partition_summaries,
    )
    from emr_on_eks_hudi_iceberg_delta_spark.sources.iceberg_transforms import (
        prune_interval,
    )

    n, shards = 1_000_000, 256
    per = n // shards
    d = tempfile.mkdtemp(prefix="mplan_shard_")
    t0 = time.perf_counter()
    mrows = []
    for s in range(shards):
        # contiguous partition range per shard: p in [s*4, s*4+3]
        es = synth_entries(per)
        for i, e in enumerate(es):
            e["data_file"]["partition"] = {"p": s * 4 + (i % 4)}
        mp = os.path.join(d, f"m{s:04d}.avro")
        write_ocf(mp, schema, es)
        mrows.append(
            {
                "manifest_path": mp,
                "manifest_length": os.path.getsize(mp),
                "partition_spec_id": 0,
                "added_snapshot_id": 1,
                "added_data_files_count": per,
                "existing_data_files_count": 0,
                "deleted_data_files_count": 0,
                "content": 0,
                "partitions": partition_summaries(
                    es, [("p", "int")]
                ),
            }
        )
    mlist = os.path.join(d, "snap-1.avro")
    write_ocf(mlist, MANIFEST_FILE_SCHEMA, mrows)
    t_build = time.perf_counter() - t0

    # first plan, partition-filtered: p = 777 -> exactly one shard
    ifn = prune_interval(
        {"name": "p", "transform": "identity", "source": "p"},
        "=", 777, "int",
    )
    t0 = time.perf_counter()
    _, manifests = read_ocf(mlist)
    decoded_manifests = 0
    live = []
    for m in manifests:
        summ = m.get("partitions")
        if summ:
            s0 = summ[0]
            lo = s0.get("lower_bound")
            hi = s0.get("upper_bound")
            if not ifn(
                None if lo is None else json.loads(lo),
                None if hi is None else json.loads(hi),
            ):
                continue
        _, es = read_ocf(m["manifest_path"])
        decoded_manifests += 1
        live.extend(
            e["data_file"]["file_path"]
            for e in es
            if e["status"] != STATUS_DELETED
            and e["data_file"]["partition"]["p"] == 777
        )
    t_pruned_plan = time.perf_counter() - t0
    want = sum(1 for i in range(per) if 194 * 4 + (i % 4) == 777)
    assert decoded_manifests == 1 and len(live) == want
    for m in mrows:
        os.remove(m["manifest_path"])
    os.remove(mlist)
    os.rmdir(d)
    sharded = {
        "entries": n,
        "shards": shards,
        "build_s": round(t_build, 3),
        "pruned_first_plan_s": round(t_pruned_plan, 4),
        "decoded_manifests": decoded_manifests,
    }
    print(
        json.dumps(
            {
                "metric": "manifest_planning",
                "rows": out,
                "sharded": sharded,
            }
        )
    )


if __name__ == "__main__":
    main()
