"""Skew- and scale-management operators.

AQE's skew-join splitting handles most skew at runtime
(``spark.sql.adaptive.skewJoin.enabled``, on in session.py); these
operators are the explicit versions for the cases AQE can't fix:

* ``salted_join`` — a hot key on the probe side explodes one straggler
  task. Salting replicates the build side R ways and scatters the probe
  side across the replicas, trading R x build-side duplication for even
  task sizes. Results are exactly equal to the plain join.
* ``two_phase_agg`` — high-cardinality groupBy with a few giant groups:
  pre-aggregate on (key, salt), then combine. Exact for algebraic
  aggregates (count/sum/min/max).

Both are pure DataFrame compositions — deterministic salts (id-derived,
not random) so results are reproducible and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi join with salted keys: ``left`` (large, possibly skewed) gets a
    deterministic salt from its own row content; ``right`` is exploded once
    per salt value. Output equals ``left.join(right, key, how)`` exactly.
    """
    # salt derived from the full row hash: deterministic across runs and
    # partitionings (monotonically_increasing_id would not be)
    salted_left = left.withColumn(
        "__salt", F.abs(F.xxhash64(*left.columns)) % salt_buckets
    )
    exploded_right = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    joined = salted_left.join(exploded_right, [key, "__salt"], how)
    return joined.drop("__salt")


def two_phase_agg(
    df: DataFrame,
    key: str,
    agg_exprs: dict[str, tuple[str, Column]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation: partial agg on (key, salt) then final combine.

    ``agg_exprs`` maps output name -> (combine_fn_name, partial_expr), e.g.
    ``{"n": ("sum", F.count("*")), "mx": ("max", F.max("value"))}``.
    Exact for algebraic aggregates; a straight win when single keys carry
    billions of rows (the partial shuffle spreads each key over
    ``salt_buckets`` reducers).
    """
    salted = df.withColumn("__salt", F.abs(F.xxhash64(*df.columns)) % salt_buckets)
    partial = salted.groupBy(key, "__salt").agg(
        *[expr.alias(f"__p_{name}") for name, (_, expr) in agg_exprs.items()]
    )
    final = partial.groupBy(key).agg(
        *[
            getattr(F, fn)(f"__p_{name}").alias(name)
            for name, (fn, _) in agg_exprs.items()
        ]
    )
    return final


def bloom_prefilter_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    how: str = "inner",
    bits: int = 1 << 17,
    num_hashes: int = 2,
) -> DataFrame:
    """Equi join with a Bloom-filter prefilter on the probe side — the
    scale strategy for the join Spark's planner has no good answer for:
    ``build`` is too large to broadcast AS ROWS, but the Bloom bitmap of
    its join keys fits in memory everywhere. Spark's own runtime Bloom
    pushdown (``spark.sql.optimizer.runtime.bloomFilter.enabled``)
    applies the same idea inside AQE; this is the explicit, composable
    version with a deterministic, oracle-checkable result.

    Mechanics (pure DataFrame algebra, no driver collect of keys):

    1. Build the filter AS A TABLE: each build key hashes to
       ``num_hashes`` positions in ``[0, bits)`` via seeded xxhash64;
       ``explode + distinct`` yields at most ``bits`` distinct position
       ints — bounded metadata regardless of build-side row count.
    2. Prefilter the probe with ``num_hashes`` chained BROADCAST
       left-semi joins against that position table (a Bloom hit = ALL
       positions present). No shuffle of the probe side happens here —
       each semi join broadcasts ≤ ``bits`` ints.
    3. Run the exact equi join on the survivors. Bloom false positives
       are dropped here, so the result is EXACTLY
       ``probe.join(build, key, how)``.

    Only ``inner`` and ``left_semi`` are legal: an outer flavor must
    keep non-matching probe rows, which the prefilter would discard.

    Scale: at 1000 executors the win is shuffle volume — only probe rows
    whose key *might* match get exchanged (for a 1%-selective build side
    that is a ~99% cut), while the prefilter itself moves ``bits`` ints
    per executor. Deterministic seeds keep results reproducible.
    """
    if how not in ("inner", "left_semi", "semi", "leftsemi"):
        raise ValueError(
            f"bloom_prefilter_join supports inner/left_semi, got {how!r}"
        )

    def _pos(col: Column, seed: int) -> Column:
        return F.abs(F.xxhash64(col, F.lit(seed))) % bits

    positions = (
        build.select(
            F.explode(
                F.array(*[_pos(F.col(key), s) for s in range(num_hashes)])
            ).alias("__pos")
        )
        .distinct()
    )
    filtered = probe
    for s in range(num_hashes):
        filtered = filtered.join(
            F.broadcast(positions),
            _pos(F.col(key), s) == F.col("__pos"),
            "left_semi",
        )
    return filtered.join(build, key, how)


def key_skew_stats(
    df: DataFrame,
    key_col: str,
    top_n: int = 10,
) -> DataFrame:
    """Shuffle-key skew diagnosis — the measurement behind every salting
    / AQE-skew-join decision: the ``top_n`` heaviest key values with
    their row counts, each key's share of all rows, and its ratio to
    the MEAN key load (``skew_factor`` — a key at 50× the mean is why a
    shuffle straggles). Run this BEFORE picking ``salted_join``'s salt
    fan-out; the factor is the fan-out lower bound.

    Exactness: counts are BIGINT; share and skew_factor are fixed
    two-op IEEE sequences (one multiply-free division each), so the
    oracle replays exactly.

    Scale: one map-side-combined aggregate on the key + a distributed
    TakeOrdered for the top-N; totals fold in as one-row broadcasts.
    The diagnosis costs one pass — strictly cheaper than the skewed
    shuffle it prevents.
    """
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").alias("__rows"), F.count(F.lit(1)).alias("__keys")
    )
    # distributed TakeOrdered first (orderBy+limit never materializes a
    # global sort), THEN rank the <= top_n survivors — a bare
    # row_number over an unpartitioned window would funnel the whole
    # per-key counts table through one task, making the skew-diagnosis
    # operator the straggler it exists to prevent
    top = (
        counts.crossJoin(F.broadcast(totals))
        .orderBy(F.col("cnt").desc(), F.col(key_col).asc())
        .limit(int(top_n))
    )
    ranked = top.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.col("cnt").desc(), F.col(key_col).asc())
        ),
    )
    return ranked.select(
        F.col(key_col),
        F.col("cnt").cast("bigint").alias("cnt"),
        "rank",
        (F.col("cnt").cast("double") / F.col("__rows").cast("double")).alias(
            "share"
        ),
        (
            F.col("cnt").cast("double")
            / (F.col("__rows").cast("double") / F.col("__keys").cast("double"))
        ).alias("skew_factor"),
    )


def pareto_skyline(
    df: DataFrame,
    x_col: str,
    y_col: str,
    x_mode: str = "max",
    y_mode: str = "max",
) -> DataFrame:
    """2-D Pareto skyline: rows not STRICTLY dominated by any other row
    (dominated = other is >= on both objectives and > on at least one,
    after orienting each objective by ``x_mode``/``y_mode``). Duplicate
    optimal points all survive (neither strictly dominates the other).

    Two-phase distributed shape — the skyline operator's defining
    algebraic property is ``skyline(A ∪ B) = skyline(skyline(A) ∪
    skyline(B))``, so:

    1. **local prefilter** (mapInPandas, zero shuffle): each input
       partition sorts its own rows by (x desc, y desc) and keeps its
       local skyline with one linear scan — survivors per partition are
       the partition's frontier, typically O(log n), worst-case the
       partition size (then nothing was prunable anyway);
    2. **exact global pass** over the survivor union: group max-y per
       distinct x (one shuffle of the already-pruned rows), a running
       strict-max window over the distinct-x frontier, and a broadcast
       semi-join back to recover every surviving row (ties included).

    The global ordered window runs over DISTINCT SURVIVOR x values —
    after local pruning that is frontier-sized, not data-sized, which is
    what makes the plan safe at 100x. All comparisons happen on the
    oriented (possibly negated) values; the output carries the original
    columns unchanged.
    """
    xs = F.col(x_col) if x_mode == "max" else -F.col(x_col)
    ys = F.col(y_col) if y_mode == "max" else -F.col(y_col)
    work = df.withColumn("__x", xs.cast("double")).withColumn(
        "__y", ys.cast("double")
    )
    cols = work.columns

    def local_skyline(pdfs):
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            s = pdf.sort_values(["__x", "__y"], ascending=[False, False])
            keep = []
            best_y = float("-inf")   # max y among STRICTLY greater x
            cur_x = None
            cur_top_y = None
            for i, (x, y) in enumerate(zip(s["__x"], s["__y"])):
                if x != cur_x:
                    if cur_top_y is not None:
                        best_y = max(best_y, cur_top_y)
                    cur_x, cur_top_y = x, y
                # survivor iff top of its x-group and beats all greater-x
                keep.append(y == cur_top_y and y > best_y)
            yield s[keep]

    survivors = work.mapInPandas(
        local_skyline, work.schema
    )
    per_x = survivors.groupBy("__x").agg(F.max("__y").alias("__my"))
    w = Window.orderBy(F.col("__x").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    frontier = (
        per_x.withColumn("__prior", F.max("__my").over(w))
        .filter(F.col("__prior").isNull() | (F.col("__my") > F.col("__prior")))
        .select("__x", "__my")
    )
    return (
        survivors.join(
            F.broadcast(frontier),
            (survivors["__x"] == frontier["__x"])
            & (survivors["__y"] == frontier["__my"]),
            "left_semi",
        )
        .select([c for c in cols if not c.startswith("__")])
    )
