"""Capture .explain('formatted') output for named registry queries.

Usage::

    python tools/capture_plans.py <out_dir> <suffix> <query> [query ...]

Writes ``<out_dir>/<query>_<suffix>.txt`` per query. Lake queries
execute their table builds as a side effect of fn(); the captured plan
is the returned (read-path) DataFrame's formatted physical plan.

Set SPARK_GRAFT_PLANS_BENCH_ENV=1 to capture under the bench's
execution environment (tables cached with the bench's keyed layout),
so the plan shows what the timed runs execute.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BENCH_ENV = os.environ.get("SPARK_GRAFT_PLANS_BENCH_ENV", "0") == "1"
if BENCH_ENV:
    os.environ.setdefault("SPARK_GRAFT_SCAN_REPARTITION", "1")

from emr_on_eks_hudi_iceberg_delta_spark.queries import REGISTRY  # noqa: E402
from emr_on_eks_hudi_iceberg_delta_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    out_dir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture_plans", master="local[8]", shuffle_partitions=8)
    if BENCH_ENV:
        from emr_on_eks_hudi_iceberg_delta_spark.sources.parquet import (
            TABLES,
            load_table,
        )

        for t in TABLES:
            df = load_table(spark, SF_DIR, t)
            df.cache()
            df.count()
    for name in names:
        df = REGISTRY[name].fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
