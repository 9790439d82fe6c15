#!/usr/bin/env python
"""Benchmark harness: runs the headline queries (registry tag "bench") at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:

    {"metric": "bench_total_sec", "value": N, "unit": "sec",
     "queries": {name: sec, ...}, "sf": "...", "iters": K,
     "round_totals": [...]}

Each query is fully materialized through the ``noop`` sink (computes every
output column — ``count()`` would let Catalyst prune the work away).

Per-query times are MEDIANS over $SPARK_GRAFT_BENCH_ITERS rounds (default
5), run round-robin so environment drift spreads evenly across queries
instead of biasing whichever ran last; ``value`` is the sum of medians and
``round_totals`` exposes the raw per-round spread (rounds 1-3 totals drifted
9.95 -> 10.19 -> 10.90 s on IDENTICAL query code — single-shot timings were
the problem, not the plans).

Noise-floor discipline (round-5): FOUR untimed warmup passes, not one —
round-4's timed totals still declined monotonically 8.48 -> 6.96 s, i.e.
JIT/GC ramp was leaking into the first timed rounds. The bench JVM pins
its heap (Xms == Xmx) so GC ergonomics cannot resize it between rounds.
The JSON line records ``loadavg_1m`` (machine load when timing started),
``noise_band_pct`` ((max-min)/median of the timed round totals), and
``best_round_total`` (the min round — the standard contention-free
estimator). Measured reality on this box (documented in NOTES.md): the
environment intermittently stalls a whole round 5-8x (45-70 s round
totals with identical plans — VM host CPU steal, not engine behavior),
so (a) per-query medians over 5 rounds keep the headline robust to one
stolen round, and (b) cross-round regression calls should compare
``best_round_total`` and distrust any run whose loadavg was elevated."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from emr_on_eks_hudi_iceberg_delta_spark.queries import REGISTRY
from emr_on_eks_hudi_iceberg_delta_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
ITERS = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "5"))

# Fixed-size heap for the bench JVM: with the default growable heap, GC
# ergonomics keep resizing across rounds and the totals drift ~10-20% with
# identical plans. Xms == Xmx removes that degree of freedom.
os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
os.environ.setdefault("SPARK_GRAFT_DRIVER_JAVA_OPTS", "-Xms24g")


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark("bench", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    bench_queries = [n for n, s in sorted(REGISTRY.items()) if "bench" in s.tags]

    # Steady-state methodology (TPC-style power run): hot data + compiled
    # plans. Cache the input tables once (Spark's CacheManager then serves
    # every matching scan sub-plan from memory), run one untimed warmup pass
    # (codegen/JIT compile), then time.
    from emr_on_eks_hudi_iceberg_delta_spark.sources.parquet import TABLES, load_table

    for t in TABLES:
        df = load_table(spark, SF_DIR, t)
        df.cache()
        df.count()
    for _ in range(4):
        for name in bench_queries:
            materialize(REGISTRY[name].fn(spark, SF_DIR))

    from statistics import median

    loadavg_1m = round(os.getloadavg()[0], 2)

    samples: dict[str, list[float]] = {n: [] for n in bench_queries}
    round_totals: list[float] = []
    for _ in range(ITERS):
        rt = 0.0
        for name in bench_queries:
            t0 = time.perf_counter()
            materialize(REGISTRY[name].fn(spark, SF_DIR))
            dt = time.perf_counter() - t0
            samples[name].append(dt)
            rt += dt
        round_totals.append(round(rt, 3))

    timings = {n: round(median(ts), 3) for n, ts in samples.items()}
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "bench_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
                "iters": ITERS,
                "round_totals": round_totals,
                "loadavg_1m": loadavg_1m,
                "best_round_total": min(round_totals),
                "noise_band_pct": round(
                    100
                    * (max(round_totals) - min(round_totals))
                    / median(round_totals),
                    1,
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
