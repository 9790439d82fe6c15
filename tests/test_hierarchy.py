"""Recursive closure invariants the oracle parity test can't see: depth
semantics, self-loop roots, depth bound enforcement, frontier termination."""

import pytest
from pyspark.sql import functions as F

from emr_on_eks_hudi_iceberg_delta_spark.operators.hierarchy import (
    ancestor_closure,
    subtree_rollup,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "node long, parent long")


def test_chain_closure_depths(spark):
    # 4 -> 3 -> 2 -> 1 (1 is a root: no edge row)
    closure = ancestor_closure(_edges(spark, [(4, 3), (3, 2), (2, 1)]))
    got = {(r.node, r.anc): r.depth for r in closure.collect()}
    assert got == {
        (4, 3): 1, (4, 2): 2, (4, 1): 3,
        (3, 2): 1, (3, 1): 2,
        (2, 1): 1,
    }


def test_self_loop_root_stops_walk(spark):
    # root written as its own parent must not loop forever or emit pairs
    closure = ancestor_closure(_edges(spark, [(2, 1), (1, 1)]))
    got = {(r.node, r.anc): r.depth for r in closure.collect()}
    assert got == {(2, 1): 1}


def test_max_rounds_guard(spark):
    edges = _edges(spark, [(i, i - 1) for i in range(2, 12)])  # depth 10
    with pytest.raises(RuntimeError, match="max_rounds"):
        ancestor_closure(edges, max_rounds=3)


def test_subtree_rollup_counts_proper_descendants(spark):
    closure = ancestor_closure(_edges(spark, [(4, 3), (3, 2), (2, 1)]))
    nodes = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0), (4, 40.0)], "k long, v double"
    )
    roll = {
        r.k: (r.n_descendants, float(r.sum_value))
        for r in subtree_rollup(nodes, closure, "k", "v").collect()
    }
    # node 1's subtree = {2,3,4}; node 2's = {3,4}; node 3's = {4}
    assert roll == {1: (3, 90.0), 2: (2, 70.0), 3: (1, 40.0)}
