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


def triangle_count(edges: DataFrame, u: str = "u", v: str = "v") -> DataFrame:
    """Global triangle count over an undirected edge list (rows are
    distinct canonical pairs, ``u < v``), via DEGREE ORIENTATION — the
    skew-safe distributed algorithm (Suri & Vassilvitskii's MR-friendly
    variant; also what GraphFrames/Spark GraphX implement):

    1. compute each node's degree (one shuffle);
    2. orient every edge from the lower-rank endpoint to the higher,
       where rank = (degree, node id) — a total order, so orientation is
       deterministic and every triangle has exactly ONE source node with
       out-edges to the other two;
    3. per edge (a, b), count |N_out(a) ∩ N_out(b)| — each triangle's
       unique source sees both other vertices, so summing the
       intersection sizes over edges counts every triangle exactly
       once. The intersections run as ``array_intersect`` over
       collected out-adjacency arrays (JVM-side, no wedge row
       explosion): this replaced the classic wedge self-join +
       closure semi-join, which materialized Σ d_out² shuffle rows —
       measured 10.0 s -> 3.5 s warm on the sf0.1 co-purchase graph
       (1.9M triangles), identical counts.

    Why orientation matters at 100x: out-degree under (deg, id) rank is
    O(sqrt(m)) amortized, so adjacency arrays are O(sqrt(m)) long and
    the joined data volume is ≈ m^{3/2} worst case instead of Σ d²,
    which a single celebrity hub would otherwise blow up
    quadratically. Three shuffles total (degrees, adjacency build,
    edge-adjacency join) — no collect, no driver state.

    Returns a 1-row DataFrame ``(n_triangles bigint)``.
    """
    e = edges.select(F.col(u).alias("a"), F.col(v).alias("b"))
    deg = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("db"))
    lower_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = (
        e.join(da, "a")
        .join(db, "b")
        .select(
            F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("src"),
            F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
        )
    )
    # the oriented edge set feeds THREE consumers (the adjacency build
    # and both sides of the edge-adjacency join), each shuffled on a
    # different key — without a cut here Spark recomputes the whole
    # upstream (edge derivation + two degree joins) per consumer; a
    # LAZY localCheckpoint materializes it once at first use, same
    # lineage-truncation idiom as the module's iterative loops
    oriented = oriented.localCheckpoint(eager=False)
    adj = oriented.groupBy("src").agg(F.collect_list("dst").alias("nbrs"))
    # NOT checkpointed (r13, measured): the adjacency feeds both sides of
    # the edge-adjacency join, but a localCheckpoint here SLOWED the query
    # (3.4 -> 4.9 s median at sf0.1) — serializing the per-node arrays
    # through the block manager costs more than recomputing the aggregate
    # from the (already checkpointed) oriented edges, and both builds run
    # concurrently as independent broadcast stages anyway
    a_side = adj.select(F.col("src"), F.col("nbrs").alias("na"))
    b_side = adj.select(
        F.col("src").alias("dst"), F.col("nbrs").alias("nb")
    )
    # inner joins are correct: an endpoint with no out-neighbors
    # contributes |∅ ∩ ·| = 0 triangles anyway
    per_edge = (
        oriented.join(a_side, "src")
        .join(b_side, "dst")
        .select(F.size(F.array_intersect("na", "nb")).alias("t"))
    )
    return per_edge.agg(
        F.coalesce(F.sum("t"), F.lit(0)).cast("bigint").alias("n_triangles")
    )


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int,
    u: str = "u",
    v: str = "v",
    node: str = "node",
) -> DataFrame:
    """Multi-source BFS: exact shortest HOP distance from any seed node,
    capped at ``max_hops`` — the reachability primitive behind "every
    document within k citation hops of a trusted source" / contamination
    blast-radius queries. ``edges`` is an undirected edge list (rows are
    distinct pairs; both orientations are derived here), ``seeds`` a
    one-column node frame.

    Level-synchronous frontier expansion, the Pregel/GraphX BFS:

    * ``dist`` starts as the seeds at hop 0;
    * each round joins the CURRENT FRONTIER (only the nodes discovered
      last round, not the whole dist set) onto the edge list, then
      anti-joins against ``dist`` so settled nodes never re-enter;
    * first discovery IS the shortest hop count (BFS invariant), so no
      min-aggregation or re-relaxation is ever needed — each round is
      one frontier-sized join + one anti-join, and a node crosses the
      shuffle at most twice over the whole run (once discovered, once
      as frontier).

    The driver loop holds ONLY a row count per round (the empty-frontier
    stop test); ``localCheckpoint`` truncates lineage each round exactly
    like ``pagerank_fixedpoint``. All arithmetic is integral — the
    result replays bit-identically in any engine (the oracle is a
    depth-bounded recursive CTE taking MIN over walk lengths, equal by
    the BFS invariant).

    Returns ``(node, hops int)`` — every node whose shortest distance to
    a seed is <= max_hops, seeds included at 0.
    """
    fwd = edges.select(F.col(u).alias("n"), F.col(v).alias("m"))
    sym = fwd.unionByName(
        edges.select(F.col(v).alias("n"), F.col(u).alias("m"))
    )
    dist = (
        seeds.select(F.col(node).alias("n"))
        .distinct()
        .withColumn("hops", F.lit(0))
        .localCheckpoint(eager=True)
    )
    frontier = dist.select("n")
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(sym, "n")
            .select(F.col("m").alias("n"))
            .distinct()
            .join(dist.select("n"), "n", "left_anti")
            .withColumn("hops", F.lit(h))
            .localCheckpoint(eager=True)
        )
        if not nxt.take(1):
            break
        dist = dist.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("n")
    return dist.select(
        F.col("n").alias(node), F.col("hops").cast("int").alias("hops")
    )


def degree_assortativity(
    edges: DataFrame, u: str = "u", v: str = "v"
) -> DataFrame:
    """Exact degree assortativity (Newman's r) of an undirected simple
    graph given as canonical ``u < v`` edges: the Pearson correlation of
    endpoint degrees over DIRECTED edge incidences (each edge counted
    both ways, making the two coordinates exchangeable — the standard
    definition). Positive r = hubs link to hubs (social nets), negative
    = hub-and-spoke (catalogs, web) — the one-number skew diagnostic
    for whether a graph's joins will be hub-dominated.

    Exactness discipline (the module pattern): degrees are integers, so
    every correlation moment accumulates as integer DECIMAL(38,0) —
    order-independent, engine-exact — and the epilogue is a fixed
    sequence of correctly-rounded casts, two sqrt, one division.

    Scale: degree = one aggregate over 2m incidences; the degree join
    back onto edges is two key-partitioned equi-joins (or one, with the
    incidence union keyed on the source endpoint); the moment fold is
    map-side-combined to a single row. No step is quadratic in degree —
    hub skew affects only join fan-IN, which AQE splits.

    Returns one row: ``(n_nodes, n_edges, assortativity)``.
    """
    inc = edges.select(
        F.col(u).alias("s"), F.col(v).alias("t")
    ).unionAll(edges.select(F.col(v).alias("s"), F.col(u).alias("t")))
    deg = inc.groupBy(F.col("s").alias("node")).agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("degree")
    )
    ds = deg.select(F.col("node").alias("s"), F.col("degree").alias("x"))
    dt = deg.select(F.col("node").alias("t"), F.col("degree").alias("y"))
    xy = inc.join(ds, "s").join(dt, "t")
    m = xy.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,0)").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("decimal(38,0)").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("decimal(38,0)").alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "decimal(38,0)"
    )
    den1 = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "decimal(38,0)"
    )
    den2 = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "decimal(38,0)"
    )
    nodes = deg.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    return (
        m.crossJoin(F.broadcast(nodes))
        .select(
            "n_nodes",
            (F.col("n") / 2).cast("bigint").alias("n_edges"),
            # Degree-regular graphs (single edge, perfect matching,
            # cycle) have zero degree variance on both endpoint sides:
            # the correlation is undefined, so emit NULL instead of
            # letting ANSI mode throw DIVIDE_BY_ZERO (same discipline
            # as q_events_autocorrelation's den != 0 filter).
            F.when(
                (den1 > 0) & (den2 > 0),
                num.cast("double")
                / (
                    F.sqrt(den1.cast("double"))
                    * F.sqrt(den2.cast("double"))
                ),
            ).alias("assortativity"),
        )
    )
