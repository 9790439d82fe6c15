"""Iterative graph operators over edge DataFrames.

Connected components (the dedup keep-canonical machinery) lives in
``operators/dedup.py``; this module adds rank propagation. The design
problem for an ORACLE-CHECKED PageRank is floating point: rank updates
sum many small contributions, and double addition is order-dependent —
a groupBy sum would differ run-to-run and engine-to-engine. The answer
here is FIXED-POINT INTEGER arithmetic: ranks are BIGINT micro-units,
contributions use integral division (``DIV``), and damping multiplies
by ``85`` then integer-divides by ``100``. Every operation is exact and
order-independent, so the whole iteration replays bit-identically in
any engine with 64-bit integers — the same trick the repo's DECIMAL
accumulations use, taken to its limit.

The cost: ranks are unnormalized (they start at ``unit`` per node and
floor-division leaks up to 1 micro-unit per edge per iteration), which
is irrelevant for the ranking/thresholding uses a data pipeline has.

Scale: one shuffle per iteration (contributions grouped on dst) plus a
key-partitioned join of ranks onto edges — the textbook Pregel cost.
``localCheckpoint`` every few iterations truncates the lineage exactly
like the connected-components loop (dedup.py) so long runs do not
compound the DAG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_fixedpoint(
    edges: DataFrame,
    iters: int = 2,
    damping_num: int = 85,
    damping_den: int = 100,
    unit: int = 10**9,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 5,
) -> DataFrame:
    """PageRank over a directed edge list, in BIGINT fixed point.

    Per iteration, for every node v::

        rank'(v) = (unit * (den - num)) DIV den
                   + (num * Σ_{u→v} (rank(u) DIV outdeg(u))) DIV den

    All arithmetic is 64-bit integral, so the result is exactly
    reproducible across engines, partitionings, and runs. Nodes are the
    distinct union of both edge endpoints; nodes with no out-edges are
    dangling (their mass leaks — pass a symmetrized edge list when the
    standard no-sink behavior is wanted); nodes with no in-edges hold
    the teleport base. Overflow bound: ``damping_num * total_mass``
    must stay under 2^63, i.e. ``nodes * unit < 2^63 / damping_num``
    — at the default unit that is ~10^8 nodes; lower ``unit`` for
    bigger graphs.

    Returns ``(node, rank)`` with rank in micro-units of ``unit``.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    base = (unit * (damping_den - damping_num)) // damping_den

    ranks = nodes.withColumn("rank", F.lit(unit).cast("bigint"))
    for i in range(iters):
        contrib = (
            ranks.join(outdeg, ranks.node == outdeg.src)
            .join(e, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank DIV outdeg").alias("c"),
            )
        )
        inbound = contrib.groupBy("node").agg(
            F.sum("c").cast("bigint").alias("inbound")
        )
        ranks = (
            nodes.join(inbound, "node", "left")
            .select(
                "node",
                (
                    F.lit(base).cast("bigint")
                    + F.expr(
                        f"({damping_num} * coalesce(inbound, 0L)) "
                        f"DIV {damping_den}"
                    )
                ).cast("bigint").alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
