"""Physical-plan audit over the bench queries — the 100 TB design
evidence as ONE committed artifact: per query, the shuffle count,
broadcast-join count, parquet-scan count, and whole-stage-codegen span
count of the executed plan at a small SF (plan SHAPE is SF-independent
for these queries; AQE may collapse further at scale).

Usage::

    python tools/plan_audit.py [out.json]

Writes/prints a JSON object {query: {shuffles, broadcasts, scans,
codegen_spans}} plus a summary row. Committed as PLANS_r{N}.json per
round so plan-shape regressions show up in review diffs, complementing
tests/test_plans.py's hard assertions on the headline queries.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emr_on_eks_hudi_iceberg_delta_spark.plans import (  # noqa: E402
    broadcast_join_count,
    shuffle_count,
)
from emr_on_eks_hudi_iceberg_delta_spark.queries import REGISTRY  # noqa: E402
from emr_on_eks_hudi_iceberg_delta_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("plan_audit", master="local[8]", shuffle_partitions=8)
    names = sorted(
        n
        for n, spec in REGISTRY.items()
        if {"bench", "bench_ext", "bench_lake"}
        & set(getattr(spec, "tags", ()))
    )
    out = {}
    import re

    for name in names:
        # shape metrics on the UNEXECUTED plan (the helpers' contract —
        # post-execution AQE prints Final AND Initial sections, which
        # would double-count); codegen spans from a separately executed
        # twin's final adaptive plan
        df = REGISTRY[name].fn(spark, SF_DIR)
        shuffles = shuffle_count(df)
        broadcasts = broadcast_join_count(df)
        executed = REGISTRY[name].fn(spark, SF_DIR)
        executed.collect()
        plan = executed._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        out[name] = {
            "shuffles": shuffles,
            "broadcasts": broadcasts,
            "scans": final.count("Scan parquet"),
            "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", final))),
        }
    legacy = sorted(
        n for n, spec in REGISTRY.items() if "bench" in getattr(spec, "tags", ())
    )
    payload = {
        "sf_dir": SF_DIR,
        "queries": out,
        "totals": {
            k: sum(v[k] for v in out.values())
            for k in ("shuffles", "broadcasts", "scans", "codegen_spans")
        },
        # the r1-comparable subset: totals over the legacy "bench" tag
        # set only, so cross-round plan-shape diffs keep a stable ruler
        "legacy13_totals": {
            k: sum(out[n][k] for n in legacy)
            for k in ("shuffles", "broadcasts", "scans", "codegen_spans")
        },
    }
    text = json.dumps(payload, indent=1, sort_keys=True)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            f.write(text + "\n")
    print(text)


if __name__ == "__main__":
    main()
