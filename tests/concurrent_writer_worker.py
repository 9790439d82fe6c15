"""Subprocess body for the concurrent-writer stress test (VERDICT r5
task 4): one OS process = one Spark JVM = one racing writer performing
``with table.locked(): table.upsert(...)`` cycles against a shared
VersionedTable — the local analog of two EMR jobs contending on the
reference's DynamoDB lock provider (hudi/hudi_scd_script.py:41-48).

Invoked as: python concurrent_writer_worker.py LOC WORKER CYCLES KEYS
Batch (worker w, cycle c) covers keys where (k + w + c) % 3 != 0 with
precombine ts = c * 10 + w (globally unique), so the expected final
state is computable host-side and identical for EVERY serial order.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(loc: str, worker: int, cycles: int, keys: int) -> None:
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "2g")
    from emr_on_eks_hudi_iceberg_delta_spark.session import get_spark
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import VersionedTable

    spark = get_spark(
        f"stress-writer-{worker}", master="local[2]", shuffle_partitions=2
    )
    vt = VersionedTable(spark, loc)
    for c in range(cycles):
        ts = c * 10 + worker
        rows = [
            (k, ts, f"w{worker}c{c}")
            for k in range(keys)
            if (k + worker + c) % 3 != 0
        ]
        df = spark.createDataFrame(rows, "id bigint, ts bigint, val string")
        with vt.locked(timeout=120.0):
            vt.upsert(df, ["id"], "ts")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
