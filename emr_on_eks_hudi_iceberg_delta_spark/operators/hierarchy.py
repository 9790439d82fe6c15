"""Hierarchical / recursive-query operators.

Spark SQL has no ``WITH RECURSIVE``; the engine supplies the capability the
way distributed engines actually run it — an iterative driver loop of
self-joins with a convergence check, the same shape as
``dedup.connected_components``. The DuckDB oracles use a real recursive CTE,
so correctness of the iteration is pinned against the textbook semantics.

Reference scope note: the reference has no recursive-query surface (its
three scripts are flat SCD2 pipelines); this is a capability extension per
SURVEY.md §2, same footing as the streaming and training-data operators.

The test hierarchy is the implicit binary tree ``parent(k) = k DIV 2`` over
any positive integer key — deterministic, derivable from every table, depth
``log2(max key)``, which keeps the iteration count logarithmic (the property
that makes the loop viable at 100 TB: 2^40 keys is still only 40 rounds).

Scale notes: each round shuffles the frontier on the ancestor key only —
the frontier shrinks as paths hit the root, so rounds get cheaper;
``localCheckpoint`` every few rounds truncates the lineage exactly as the
connected-components loop does. For bushier trees swap the parent-pointer
step for pointer doubling (anc -> anc-of-anc), halving the round count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ancestor_closure(
    edges: DataFrame,
    node_col: str = "node",
    parent_col: str = "parent",
    max_rounds: int = 64,
) -> DataFrame:
    """Transitive ancestor closure of a parent-pointer table: every
    (node, ancestor, depth) pair with depth >= 1, where depth counts edges
    walked. ``edges`` rows with ``parent == node`` (self-loop roots) stop
    the walk; rows whose parent is absent from ``edges`` stop after the
    first hop.

    Equivalent to::

        WITH RECURSIVE a(node, anc, depth) AS (
          SELECT node, parent, 1 FROM edges WHERE parent <> node
          UNION ALL
          SELECT a.node, e.parent, a.depth + 1
          FROM a JOIN edges e ON e.node = a.anc WHERE e.parent <> e.node)

    which is exactly what the oracle runs.
    """
    base = (
        edges.filter(F.col(parent_col) != F.col(node_col))
        .select(
            F.col(node_col).alias("node"),
            F.col(parent_col).alias("anc"),
            F.lit(1).alias("depth"),
        )
    )
    parent_of = edges.filter(F.col(parent_col) != F.col(node_col)).select(
        F.col(node_col).alias("anc"), F.col(parent_col).alias("next_anc")
    )
    out = base
    frontier = base
    for i in range(max_rounds):
        frontier = (
            frontier.join(parent_of, "anc")
            .select(
                "node",
                F.col("next_anc").alias("anc"),
                (F.col("depth") + 1).alias("depth"),
            )
        )
        if i % 4 == 3:
            frontier = frontier.localCheckpoint(eager=True)
        if frontier.isEmpty():
            break
        out = out.unionByName(frontier)
    else:
        raise RuntimeError(f"hierarchy deeper than max_rounds={max_rounds}")
    return out


def subtree_rollup(
    nodes: DataFrame,
    closure: DataFrame,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """Per-ancestor rollup over the closure: for every node that is an
    ancestor of anything, the count of proper descendants and the exact
    DECIMAL sum of their ``value_col`` — the BOM-explosion / org-chart
    aggregation a recursive CTE exists for. One shuffle on the ancestor
    key; the closure's size (nodes x depth) is the real cost driver."""
    vals = nodes.select(
        F.col(key_col).alias("node"), F.col(value_col).alias("__v")
    )
    return (
        closure.join(vals, "node")
        .groupBy(F.col("anc").alias(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_descendants"),
            F.sum(F.col("__v").cast("decimal(18,4)"))
            .cast("decimal(28,4)")
            .alias("sum_value"),
        )
    )
