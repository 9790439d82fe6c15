"""pagerank_fixedpoint (operators/graph.py): hand-computed exact values
on a tiny graph (the arithmetic is integral, so equality is exact, not
approximate), dangling-leak semantics, and determinism across layouts."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emr_on_eks_hudi_iceberg_delta_spark.operators.graph import (
    pagerank_fixedpoint,
)


def _ranks(df):
    return {r["node"]: r["rank"] for r in df.collect()}


def test_hand_computed_path_graph(spark):
    # symmetrized path 1-2-3; unit=100, damping 85/100, base=15
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2)], "src long, dst long"
    )
    # iter 1: inbound 1<-50, 2<-(100+100), 3<-50
    assert _ranks(pagerank_fixedpoint(edges, iters=1, unit=100)) == {
        1: 57, 2: 185, 3: 57,
    }
    # iter 2: contrib 57//1, 185//2=92, 57//1 -> inbound 92/114/92
    assert _ranks(pagerank_fixedpoint(edges, iters=2, unit=100)) == {
        1: 93, 2: 111, 3: 93,
    }


def test_dangling_node_leaks_mass(spark):
    # 1 -> 2 only: node 2 has no out-edges, its mass leaks next round
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    r1 = _ranks(pagerank_fixedpoint(edges, iters=1, unit=100))
    assert r1 == {1: 15, 2: 100}  # 15 + (85*100)//100
    r2 = _ranks(pagerank_fixedpoint(edges, iters=2, unit=100))
    # node 2's 100 is gone (dangling); node 1 only keeps the base
    assert r2 == {1: 15, 2: 15 + (85 * 15) // 100}


def test_deterministic_across_layouts(spark):
    import random

    rnd = random.Random(7)
    pairs = list({(rnd.randrange(50), rnd.randrange(50)) for _ in range(300)})
    pairs = [(a, b) for a, b in pairs if a != b]
    sym = pairs + [(b, a) for a, b in pairs]
    e1 = spark.createDataFrame(sym, "src long, dst long")
    e2 = spark.createDataFrame(sym, "src long, dst long").repartition(13)
    a = _ranks(pagerank_fixedpoint(e1, iters=3))
    b = _ranks(pagerank_fixedpoint(e2, iters=3))
    assert a == b
    # symmetric graph, no dangling: total mass is conserved up to the
    # deterministic floor-division leak (< 1 micro-unit per edge+node op)
    n, unit = len(a), 10**9
    assert sum(a.values()) <= n * unit
    assert sum(a.values()) >= n * unit - (len(sym) + 2 * n) * 3


def test_triangle_count_hand_computed(spark):
    from emr_on_eks_hudi_iceberg_delta_spark.operators.graph import triangle_count

    # K4 on {1,2,3,4} -> C(4,3)=4 triangles; pendant path 4-5-6 adds none
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)],
        "u int, v int",
    )
    assert triangle_count(edges).collect()[0]["n_triangles"] == 4


def test_triangle_count_star_hub_has_none(spark):
    from emr_on_eks_hudi_iceberg_delta_spark.operators.graph import triangle_count

    # a pure hub (star) has wedges but zero closures; with degree
    # orientation the hub is ranked LAST, so it sources no wedges at all
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 30)], "u int, v int"
    )
    assert triangle_count(edges).collect()[0]["n_triangles"] == 0


def test_triangle_count_matches_bruteforce_random(spark):
    import itertools
    import random

    from emr_on_eks_hudi_iceberg_delta_spark.operators.graph import triangle_count

    rng = random.Random(8)
    nodes = list(range(20))
    edges = sorted(
        {(a, b) for a, b in itertools.combinations(nodes, 2) if rng.random() < 0.3}
    )
    adj = {n: set() for n in nodes}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    expected = sum(
        1
        for x, y, z in itertools.combinations(nodes, 3)
        if y in adj[x] and z in adj[x] and z in adj[y]
    )
    got = triangle_count(
        spark.createDataFrame(edges, "u int, v int")
    ).collect()[0]["n_triangles"]
    assert got == expected


def test_bfs_hops_hand_computed(spark):
    from emr_on_eks_hudi_iceberg_delta_spark.operators.graph import bfs_hops

    # path 0-1-2-3-4 plus isolated 9; seed at 0 and 9
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4)], "u int, v int"
    )
    seeds = spark.createDataFrame([(0,), (9,)], "node int")
    got = {
        r["node"]: r["hops"]
        for r in bfs_hops(edges, seeds, max_hops=2).collect()
    }
    assert got == {0: 0, 9: 0, 1: 1, 2: 2}  # 3,4 beyond the cap


def test_bfs_hops_matches_bruteforce_random(spark):
    import random
    from collections import deque

    from emr_on_eks_hudi_iceberg_delta_spark.operators.graph import bfs_hops

    rng = random.Random(17)
    nodes = list(range(30))
    edges = sorted(
        {
            (a, b)
            for a in nodes
            for b in nodes
            if a < b and rng.random() < 0.08
        }
    )
    adj = {n: set() for n in nodes}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    seeds = [0, 7]
    expected, q = {s: 0 for s in seeds}, deque(seeds)
    while q:
        n = q.popleft()
        for m in adj[n]:
            if m not in expected:
                expected[m] = expected[n] + 1
                q.append(m)
    cap = 3
    expected = {n: h for n, h in expected.items() if h <= cap}
    got = {
        r["node"]: r["hops"]
        for r in bfs_hops(
            spark.createDataFrame(edges, "u int, v int"),
            spark.createDataFrame([(s,) for s in seeds], "node int"),
            max_hops=cap,
        ).collect()
    }
    assert got == expected


def test_bfs_hops_early_stop_on_exhausted_frontier(spark):
    from emr_on_eks_hudi_iceberg_delta_spark.operators.graph import bfs_hops

    edges = spark.createDataFrame([(0, 1)], "u int, v int")
    seeds = spark.createDataFrame([(0,)], "node int")
    # cap far beyond the component diameter: loop must stop at the
    # empty frontier, not run 50 joins
    got = {
        r["node"]: r["hops"]
        for r in bfs_hops(edges, seeds, max_hops=50).collect()
    }
    assert got == {0: 0, 1: 1}


# ------------------------ degree_assortativity ------------------------------

def test_assortativity_star_is_negative_one(spark):
    """A star graph is maximally disassortative: r = -1 exactly."""
    from emr_on_eks_hudi_iceberg_delta_spark.operators.graph import (
        degree_assortativity,
    )

    star = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "u bigint, v bigint"
    )
    row = degree_assortativity(star).collect()[0]
    assert row["n_nodes"] == 6 and row["n_edges"] == 5
    assert row["assortativity"] == -1.0


def test_assortativity_matches_host_pearson(spark):
    """Seeded random graph vs a straightforward host-side replay."""
    import math
    import random

    from emr_on_eks_hudi_iceberg_delta_spark.operators.graph import (
        degree_assortativity,
    )

    rng = random.Random(17)
    edges = set()
    while len(edges) < 60:
        a, b = rng.randrange(25), rng.randrange(25)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    df = spark.createDataFrame(sorted(edges), "u bigint, v bigint")
    got = degree_assortativity(df).collect()[0]

    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    xs, ys = [], []
    for a, b in edges:
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    want = (n * sxy - sx * sy) / (
        math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
    )
    assert got["n_nodes"] == len(deg) and got["n_edges"] == len(edges)
    assert abs(got["assortativity"] - want) < 1e-12


def test_assortativity_regular_graph_is_null_not_crash(spark):
    """ADVICE r8: degree-regular graphs (zero degree variance) have an
    undefined correlation — NULL, never an ANSI DIVIDE_BY_ZERO."""
    from emr_on_eks_hudi_iceberg_delta_spark.operators.graph import (
        degree_assortativity,
    )

    for edges, n_nodes, n_edges in [
        ([(0, 1)], 2, 1),  # single edge
        ([(0, 1), (2, 3)], 4, 2),  # perfect matching
        ([(0, 1), (1, 2), (2, 3), (3, 0)], 4, 4),  # 4-cycle
    ]:
        df = spark.createDataFrame(edges, "u bigint, v bigint")
        row = degree_assortativity(df).collect()[0]
        assert row["n_nodes"] == n_nodes and row["n_edges"] == n_edges
        assert row["assortativity"] is None
