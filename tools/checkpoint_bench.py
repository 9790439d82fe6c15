"""Measure classic vs V2 Delta checkpoint write cost as the live set
grows — the evidence behind SCALE.md's O(live) vs O(changed buckets)
claim. The log is synthesized driver-side (raw JSON commits naming
fake parquet paths — checkpoints re-encode actions and never stat
data files), so the measurement isolates checkpoint IO.

Usage::

    python tools/checkpoint_bench.py [n_adds ...]

Per size prints one line: classic full-checkpoint seconds, v2 initial
checkpoint seconds (all buckets written), and v2 RE-checkpoint seconds
after ONE small append (the steady-state cost — a handful of churned
buckets, everything else content-address-reused).
"""

import json
import os
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emr_on_eks_hudi_iceberg_delta_spark.session import get_spark  # noqa: E402
from emr_on_eks_hudi_iceberg_delta_spark.sources.delta_log import (  # noqa: E402
    DeltaLogTable,
)


def synth_table(spark, n_adds: int) -> DeltaLogTable:
    loc = tempfile.mkdtemp(prefix=f"ckptbench_{n_adds}_")
    logdir = os.path.join(loc, "_delta_log")
    os.makedirs(logdir)
    meta = {
        "id": str(uuid.uuid4()),
        "format": {"provider": "parquet", "options": {}},
        "schemaString": json.dumps(
            {
                "type": "struct",
                "fields": [
                    {"name": "k", "type": "long", "nullable": True,
                     "metadata": {}},
                ],
            }
        ),
        "partitionColumns": [],
        "configuration": {},
        "createdTime": 0,
    }
    with open(os.path.join(logdir, f"{0:020d}.json"), "w") as f:
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 1, "minWriterVersion": 2}}) + "\n")
        f.write(json.dumps({"metaData": meta}) + "\n")
        for i in range(n_adds):
            f.write(json.dumps({"add": {
                "path": f"part-{i:08d}-{uuid.uuid4().hex}.parquet",
                "partitionValues": {},
                "size": 1024,
                "modificationTime": 0,
                "dataChange": True,
                "stats": json.dumps({"numRecords": 100}),
            }}) + "\n")
    return DeltaLogTable(spark, loc)


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [10_000, 100_000]
    spark = get_spark("ckptbench", master="local[8]",
                      shuffle_partitions=8)
    print("n_adds  classic_s  v2_initial_s  v2_recheckpoint_s  "
          "v2_written/reused")
    for n in sizes:
        t = synth_table(spark, n)
        t0 = time.time()
        t.write_checkpoint()
        classic = time.time() - t0
        t2 = synth_table(spark, n)
        t0 = time.time()
        t2.write_checkpoint(v2=True, sidecar_target_adds=10_000)
        v2_init = time.time() - t0
        # one-file append, then the steady-state re-checkpoint
        with open(
            os.path.join(t2.location, "_delta_log",
                         f"{2:020d}.json"), "w"
        ) as f:
            f.write(json.dumps({"add": {
                "path": f"part-app-{uuid.uuid4().hex}.parquet",
                "partitionValues": {}, "size": 1024,
                "modificationTime": 0, "dataChange": True,
                "stats": json.dumps({"numRecords": 1}),
            }}) + "\n")
        t0 = time.time()
        t2.write_checkpoint(v2=True, sidecar_target_adds=10_000)
        v2_re = time.time() - t0
        lc = json.load(open(os.path.join(
            t2.location, "_delta_log", "_last_checkpoint")))
        print(f"{n:>6}  {classic:9.2f}  {v2_init:12.2f}  "
              f"{v2_re:17.2f}  {lc['sidecarsWritten']}/"
              f"{lc['sidecarsReused']}")


if __name__ == "__main__":
    main()
