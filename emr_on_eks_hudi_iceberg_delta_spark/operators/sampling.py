"""Deterministic sampling and dataset-splitting operators.

Training-data pipelines need *reproducible* sampling: the same row must land
in the same split on every run, on any cluster layout, even as the table
grows. ``df.sample()`` can't promise that (seeded per-partition RNG changes
with repartitioning), so everything here derives the decision from a
portable content hash (functions/hashing.py) — a pure per-row map, zero
shuffle, scan-speed at 100 TB, and exactly reproducible in any engine that
has md5 (the DuckDB oracles prove it).

Reference scope note: the reference has no sampling surface at all; these
are capability extensions for the LLM-pipeline north star (BASELINE.json).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_hash64

#: modulus for hash-bucket decisions — 10_000 gives 0.01 % rate granularity
BUCKETS = 10_000


def hash_bucket(key: Column, salt: str = "") -> Column:
    """Stable bucket in [0, BUCKETS) from a key column. ``salt`` decouples
    independent sampling decisions made from the same key (sampling for
    eval vs. sampling for dedup must not correlate)."""
    keyed = F.concat(F.lit(salt), key.cast("string")) if salt else key.cast("string")
    return (md5_hash64(keyed) % BUCKETS).cast("int")


def deterministic_sample(
    df: DataFrame, key_col: str, rate: float, salt: str = ""
) -> DataFrame:
    """Keep ~``rate`` of rows, decided by key hash — reproducible across
    runs, cluster layouts, and engines (unlike ``df.sample``)."""
    return df.filter(hash_bucket(F.col(key_col), salt) < int(rate * BUCKETS))


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: Mapping[str, float],
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Label every row with a split name by hash range; fractions must sum
    to <= 1 (any remainder is labelled with the last split). Rows with the
    same key always land in the same split — the leakage-safe train/test
    split for grouped data."""
    bucket = hash_bucket(F.col(key_col), salt)
    expr = None
    edge = 0
    names = list(splits)
    for name in names[:-1]:
        edge += int(splits[name] * BUCKETS)
        expr = (
            F.when(bucket < edge, F.lit(name))
            if expr is None
            else expr.when(bucket < edge, F.lit(name))
        )
    label = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn(split_col, label)


def stratified_sample(
    df: DataFrame, key_col: str, strata_col: str, rates: Mapping[str, float],
    default_rate: float = 0.0, salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. keep 80 % of English docs
    but 100 % of low-resource languages) — the language-rebalancing
    primitive. Strata absent from ``rates`` get ``default_rate``."""
    threshold = None
    for stratum, rate in sorted(rates.items()):
        t = F.lit(int(rate * BUCKETS))
        threshold = (
            F.when(F.col(strata_col) == stratum, t)
            if threshold is None
            else threshold.when(F.col(strata_col) == stratum, t)
        )
    threshold = (
        F.lit(int(default_rate * BUCKETS))
        if threshold is None
        else threshold.otherwise(F.lit(int(default_rate * BUCKETS)))
    )
    return df.filter(hash_bucket(F.col(key_col), salt) < threshold)


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    target_rows: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic weight-proportional (Poisson) sampling: each row is
    kept independently with probability ``min(1, target_rows * w / W)``
    where ``W = SUM(w)`` — so the expected sample size is ``target_rows``
    and inclusion probability is proportional to weight (the standard
    quality-weighted document selection step in training-data curation).

    The keep decision is the portable hash, not an RNG: row kept iff
    ``h * W < target_rows * w * 2^60`` with ``h = md5_hash64(key)`` in
    ``[0, 2^60)``. Both sides evaluate as two IEEE-double products of
    identical inputs, so the decision is bit-reproducible across runs,
    cluster layouts, and engines (the DuckDB oracle replays it verbatim).
    ``weight_col`` must be integral and non-negative so ``W`` is an exact
    bigint aggregate on every engine.

    Scale: one scalar aggregate (broadcast back as a literal-sized scalar
    join) + one scan-speed filter — no shuffle of the data itself.
    """
    total = df.agg(F.sum(F.col(weight_col)).cast("bigint").alias("__w_total"))
    h = md5_hash64(
        F.concat(F.lit(salt), F.col(key_col).cast("string"))
        if salt
        else F.col(key_col).cast("string")
    )
    return (
        df.crossJoin(F.broadcast(total))
        .filter(
            h.cast("double") * F.col("__w_total").cast("double")
            < F.lit(float(target_rows))
            * F.col(weight_col).cast("double")
            * F.lit(float(1 << 60))
        )
        .drop("__w_total")
    )


def sample_to_mixture(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    weights: Mapping[str, float],
    total_rows: int,
    salt: str = "",
) -> DataFrame:
    """Domain mixing: downsample each stratum so the output approximates
    ``total_rows`` distributed by ``weights`` (e.g. 50 % web / 30 % code /
    20 % wiki) — the mixture-rebalancing step in front of training.

    Per-stratum keep rate = min(1, total_rows * weight / stratum_count):
    a stratum smaller than its target keeps everything (the standard
    behavior — upsampling is a separate epoch-repeat concern). Counting is
    one tiny aggregate (rows-per-stratum, collected driver-side — k rows
    for k strata); the sampling pass itself is the zero-shuffle
    deterministic hash filter, so the whole operator costs one scan + one
    k-row aggregate at any scale. Strata missing from ``weights`` are
    dropped (weight 0).
    """
    counts = {
        r[strata_col]: r["n"]
        for r in df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    rates = {
        s: min(1.0, total_rows * w / counts[s]) for s, w in weights.items() if s in counts
    }
    return stratified_sample(
        df, key_col, strata_col, rates, default_rate=0.0, salt=salt
    )


def exact_k_per_stratum(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Take EXACTLY min(k, |stratum|) rows per stratum, chosen by
    portable-hash rank — the deterministic form of per-group reservoir
    sampling ("100 docs per language"), reproducible across runs,
    layouts, and engines (the same md5-rank idiom as
    ``deterministic_sample``; fraction-based ``stratified_sample`` is
    the expected-size sibling).

    Scale: one shuffle on the stratum key for the ranking window; ties
    impossible (the hash includes the unique key). Hot strata put their
    full membership through one partition — for millions-per-stratum
    inputs pre-filter with an approximate hash-threshold pass first.
    """
    h = md5_hash64(
        F.concat(F.lit(salt), F.col(key_col).cast("string"))
        if salt
        else F.col(key_col).cast("string")
    )
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= int(k))
        .drop("__rk")
    )


def leakage_safe_split(
    docs: DataFrame,
    dup_pairs: DataFrame,
    id_col: str,
    splits: Mapping[str, float],
    salt: str = "",
) -> DataFrame:
    """Train/test split at NEAR-DUP-CLUSTER granularity — the
    eval-contamination trap ``hash_split`` alone cannot close: two
    near-identical documents hash independently, so one lands in train
    and its twin in test, leaking the answer. Here the split key is the
    connected component over the verified duplicate pairs (the same
    clusters dedup's keep-canonical uses), so a whole near-dup family
    moves together; singleton docs are their own component and split
    exactly as ``hash_split`` would on their id.

    ``dup_pairs`` is any (id_a, id_b) verified-pair frame (LSH+Jaccard,
    embedding cosine, fuzzy keys...). Returns ``docs`` plus
    ``component`` and ``split`` columns.

    Scale: the component pass is the CC loop (one shuffle per round,
    rounds = cluster diameter); the assignment itself is a zero-shuffle
    map on the component + one key join back to the docs.
    """
    from .dedup import connected_components

    comp = connected_components(dup_pairs, docs.select(id_col), id_col)
    labeled = hash_split(comp, "component", splits, salt)
    return docs.join(labeled, id_col)


#: Poisson(1) CDF split points scaled to the md5_hash64 range [0, 2^60):
#: a 60-bit hash u encodes the bootstrap weight w = |{k : u >= T[k]}|
#: (0..5). Integer thresholds make the draw ENGINE-EXACT — no float
#: uniform, no transcendental evaluated at query time; the e^-1 series
#: is baked in here once and replayed verbatim in oracle SQL.
POISSON1_THRESHOLDS_2_60 = (
    424136118829305344,
    848272237658610688,
    1060340297073263360,
    1131029650211480960,
    1148701988496035328,
)


def poisson_bootstrap_ci(
    df,
    group_col: str,
    value_col: str,
    id_col: str,
    reps: int = 32,
    lo_rank: int = 2,
    hi_rank: int | None = None,
    salt: str = "boot",
):
    """Deterministic Poisson-bootstrap confidence interval for per-group
    means — THE distributed bootstrap: classical resampling needs n draws
    WITH replacement per replicate (a shuffle per replicate, plus global
    coordination of sample membership), while the Poisson(1)
    approximation gives every row an i.i.d. replicate weight locally, so
    all ``reps`` replicates ride ONE explode + ONE (group, rep)
    aggregate. Replicate weights derive from md5 of (salt, rep, row id)
    against integer CDF thresholds (POISSON1_THRESHOLDS_2_60), so the
    same rows produce the same resamples on any engine, any
    partitioning, any run — the property that makes an exact SQL oracle
    (and reproducible science) possible.

    The interval is the percentile bootstrap with type-1 (ceiling)
    empirical quantiles: replicate means sorted ascending, ``lo_rank``-th
    and ``hi_rank``-th picked (defaults 2 and reps-1 = a 90% CI at
    reps=32). Replicate means are exact: DECIMAL(18,4) weighted sums,
    one closing IEEE division each.

    Scale: fan-out is the rep count (32x rows into a map-side-combined
    aggregate of reps x groups rows); the per-group order statistic
    sorts ``reps`` values inside one row group — constant memory. No
    step touches a per-row shuffle wider than the base aggregate.

    Returns (group, mean, ci_lo, ci_hi, reps) per group.
    """
    hi_rank = hi_rank if hi_rank is not None else reps - 1
    reps_df = bootstrap_replicate_means(
        df, group_col, value_col, id_col, reps, salt
    )
    rn = F.row_number().over(
        Window.partitionBy("__g").orderBy("__mean_b", "b")
    )
    ci = (
        reps_df.withColumn("__rn", rn)
        .groupBy("__g")
        .agg(
            F.max(F.when(F.col("__rn") == lo_rank, F.col("__mean_b"))).alias(
                "ci_lo"
            ),
            F.max(F.when(F.col("__rn") == hi_rank, F.col("__mean_b"))).alias(
                "ci_hi"
            ),
        )
    )
    point = df.groupBy(F.col(group_col).alias("__g")).agg(
        (
            F.sum(F.col(value_col).cast("decimal(18,4)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("mean")
    )
    return (
        point.join(ci, "__g")
        .select(
            F.col("__g").alias(group_col),
            "mean",
            "ci_lo",
            "ci_hi",
            F.lit(reps).cast("int").alias("reps"),
        )
    )


def class_balanced_sample(
    df: DataFrame,
    id_col: str,
    label_col: str,
    per_class: int | None = None,
    salt: str = "bal",
) -> DataFrame:
    """Deterministic class-balanced downsample: keep exactly
    ``per_class`` rows per label (default: the minority class size, i.e.
    perfect balance), chosen by md5 rank so the selection is identical
    on any engine / layout / run — the label-rebalancing step before
    classifier fine-tuning, with none of ``sampleBy``'s RNG drift.

    A fixed ``per_class`` delegates to ``exact_k_per_stratum`` (same
    hash-rank idiom, same salt contract). The new path here is the
    AUTO cap: the minority size is itself a query result, computed as a
    one-row aggregate and broadcast into the rank filter — no driver
    round trip, so the whole operator stays a single lazy plan that
    composes into pipelines and streams.

    Plan: one label-count aggregate (folded to a broadcast one-row
    min), one per-label rank window, one filter. The window sorts each
    label's rows by hash; for a dominant label at 100 TB, compose with
    a hash-threshold prefilter — ``hash < ceil(2^60 * cap * (1+slack) /
    label_n)`` keeps ~cap*(1+slack) rows per label in one scan with no
    sort, and the exact rank then runs over survivors only (verify
    survivor count >= cap per label, retry with larger slack on the
    astronomically-rare undershoot; the two-phase result equals this
    operator's output exactly because the rank order is the same
    hash)."""
    if per_class is not None:
        return exact_k_per_stratum(
            df, label_col, id_col, per_class, salt=f"{salt}:"
        )
    h = md5_hash64(
        F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(label_col).orderBy(h.asc(), F.col(id_col).asc())
    cap = (
        df.groupBy(label_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .agg(F.min("__n").alias("__cap"))
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .crossJoin(F.broadcast(cap))
        .filter(F.col("__rn") <= F.col("__cap"))
        .drop("__rn", "__cap")
    )


def _poisson1_weight(h) -> Column:
    """Poisson(1) weight from a MATERIALIZED md5 hash column: the
    count of CDF thresholds at or below ``h`` as a sum of 15 integer
    comparisons. Callers must project the hash into a real column
    first — referencing the md5 expression tree here directly would
    re-evaluate it per threshold (15 md5s per row per replicate; the
    r10 measurement showed Spark does NOT CSE it), while a projected
    column is computed once per row and CollapseProject leaves
    non-cheap multiply-referenced expressions un-inlined. A
    higher-order-function form (array filter) was measured 4x SLOWER
    than this: HOFs drop out of whole-stage codegen."""
    return sum(
        (h >= F.lit(t)).cast("int") for t in POISSON1_THRESHOLDS_2_60
    )


def _cpu_rebalance(df: DataFrame) -> DataFrame:
    """The bootstrap draw stage is CPU-bound (reps x one md5 per
    row); a small input — e.g. ONE parquet split — would run the whole
    reps-fold fan-out on a single core (measured r10: 5.3 s -> <1 s at
    sf0.1 from this alone). Repartition up to default parallelism when
    the scan yields fewer partitions; at real scale a big table's scan
    already has >= that many splits and this is a no-op."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


def bootstrap_replicate_means(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    reps: int,
    salt: str = "boot",
) -> DataFrame:
    """The shared bootstrap core: per (group, replicate) the exact
    Poisson-weighted mean ``(__g, b, __mean_b)`` — one explode + one
    aggregate (see poisson_bootstrap_ci for the full scheme). Exposed
    so derived statistics (difference CIs, ratio CIs) can combine
    replicates of SEVERAL groups at matching replicate index b — the
    pairing that makes bootstrap contrasts valid.

    Empty-resample semantics: a (group, replicate) where EVERY row drew
    Poisson weight 0 (near-certain for 1-row groups: P = e^-n per
    replicate) has no resample mean — the replicate is DROPPED for that
    group rather than emitted as NULL or a division by zero (Spark 4's
    ANSI default would throw DIVIDE_BY_ZERO). The DuckDB oracles mirror
    this with ``HAVING SUM(w) > 0`` so replicate ranks stay aligned;
    consumers ranking replicates must rank the survivors (both CI
    builders here do, identically to their oracles)."""
    b = F.explode(F.sequence(F.lit(0), F.lit(reps - 1))).alias("b")
    rows = _cpu_rebalance(df).select(
        F.col(group_col).alias("__g"),
        F.col(value_col).cast("decimal(18,4)").alias("__v"),
        F.col(id_col).cast("string").alias("__id"),
        b,
    )
    h = md5_hash64(
        F.concat(
            F.lit(salt),
            F.col("b").cast("string"),
            F.lit(":"),
            F.col("__id"),
        )
    )
    hashed = rows.select("__g", "b", "__v", h.alias("__h"))
    w = _poisson1_weight(F.col("__h")).alias("__w")
    return (
        hashed.select("__g", "b", "__v", w)
        .groupBy("__g", "b")
        .agg(
            F.sum(F.col("__w") * F.col("__v")).alias("__swv"),
            F.sum("__w").cast("bigint").alias("__sw"),
        )
        .filter(F.col("__sw") > 0)
        .select(
            "__g",
            "b",
            (
                F.col("__swv").cast("double")
                / F.col("__sw").cast("double")
            ).alias("__mean_b"),
        )
    )


def poisson_bootstrap_diff_ci(
    df: DataFrame,
    group_col: str,
    group_a: str,
    group_b: str,
    value_col: str,
    id_col: str,
    reps: int = 32,
    lo_rank: int = 2,
    hi_rank: int | None = None,
    salt: str = "boot",
) -> DataFrame:
    """A/B-test contrast: percentile-bootstrap CI for the DIFFERENCE of
    means (group_a - group_b). The statistically load-bearing detail:
    both groups' replicate means are computed from the SAME draw
    (identical salt and replicate index), then differenced per
    replicate — paired replicates, the correct bootstrap for a
    contrast — and the interval is the same type-1 percentile scheme
    as poisson_bootstrap_ci. If the CI excludes 0, the difference is
    significant at the corresponding level. One extra self-join of the
    reps x 2 replicate table; everything else shares the single-pass
    core."""
    hi_rank = hi_rank if hi_rank is not None else reps - 1
    sub = df.filter(F.col(group_col).isin([group_a, group_b]))
    reps_df = bootstrap_replicate_means(
        sub, group_col, value_col, id_col, reps, salt
    )
    a = reps_df.filter(F.col("__g") == group_a).select(
        "b", F.col("__mean_b").alias("__ma")
    )
    bb = reps_df.filter(F.col("__g") == group_b).select(
        "b", F.col("__mean_b").alias("__mb")
    )
    diffs = a.join(bb, "b").select(
        "b", (F.col("__ma") - F.col("__mb")).alias("__d")
    )
    rn = F.row_number().over(Window.orderBy("__d", "b"))
    ci = (
        diffs.withColumn("__rn", rn)
        .agg(
            F.max(F.when(F.col("__rn") == lo_rank, F.col("__d"))).alias(
                "ci_lo"
            ),
            F.max(F.when(F.col("__rn") == hi_rank, F.col("__d"))).alias(
                "ci_hi"
            ),
        )
    )
    pt = (
        sub.groupBy(group_col)
        .agg(
            (
                F.sum(F.col(value_col).cast("decimal(18,4)")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("__m")
        )
    )
    pa = pt.filter(F.col(group_col) == group_a).select(
        F.col("__m").alias("mean_a")
    )
    pb = pt.filter(F.col(group_col) == group_b).select(
        F.col("__m").alias("mean_b")
    )
    return (
        pa.crossJoin(pb)
        .crossJoin(F.broadcast(ci))
        .select(
            F.lit(group_a).alias("group_a"),
            F.lit(group_b).alias("group_b"),
            "mean_a",
            "mean_b",
            (F.col("mean_a") - F.col("mean_b")).alias("diff"),
            "ci_lo",
            "ci_hi",
            (
                ~((F.col("ci_lo") <= 0) & (F.col("ci_hi") >= 0))
            ).cast("int").alias("significant"),
        )
    )


def poisson_bootstrap_ci_wide(
    df,
    group_col: str,
    value_col: str,
    id_col: str,
    reps: int = 32,
    lo_rank: int = 2,
    hi_rank: int | None = None,
    salt: str = "boot",
):
    """The NO-EXPLODE twin of ``poisson_bootstrap_ci``: the ``reps``
    replicates are ``2*reps`` aggregate expressions over ONE pass of
    the base rows (sum(w_b*v), sum(w_b) per replicate) instead of a
    ``reps``-fold explode — identical md5 draws, identical
    DECIMAL(18,4) sums, identical closing IEEE division, so the
    interval endpoints are bit-equal to the tall path and share its
    oracle. The per-group order statistic becomes an
    ``array_sort`` over the <= reps surviving replicate means inside
    one row. Trade: no 32x row fan-out or 32x-row aggregate, at the
    cost of ``2*reps`` aggregation buffers per group — the right side
    of the trade whenever rows >> groups (measured r10: ~2.3x faster
    at sf0.1).

    Tie semantics: equal replicate means are interchangeable VALUES,
    so rank-by-(mean, b) (tall) and rank-by-mean (wide) pick identical
    endpoint values. Empty resamples drop, matching the tall path and
    the oracle's ``HAVING SUM(w) > 0``."""
    hi_rank = hi_rank if hi_rank is not None else reps - 1
    idc = F.col(id_col).cast("string")
    v = F.col(value_col).cast("decimal(18,4)")
    # materialize the reps hash columns FIRST (one md5 per replicate
    # per row; the weight comparisons then reference plain columns —
    # see _poisson1_weight's docstring for why this matters)
    base = _cpu_rebalance(df).select(
        F.col(group_col).alias("__g"),
        v.alias("__v"),
        *[
            md5_hash64(
                F.concat(F.lit(salt), F.lit(str(b)), F.lit(":"), idc)
            ).alias(f"__h{b}")
            for b in range(reps)
        ],
    )
    aggs = []
    for b in range(reps):
        w = _poisson1_weight(F.col(f"__h{b}"))
        aggs.append(F.sum(w * F.col("__v")).alias(f"__swv{b}"))
        aggs.append(F.sum(w).cast("bigint").alias(f"__sw{b}"))
    aggs.append(F.sum("__v").alias("__sv"))
    aggs.append(F.count(F.lit(1)).cast("double").alias("__n"))
    g = base.groupBy("__g").agg(*aggs)
    means = F.array(
        *[
            F.when(
                F.col(f"__sw{b}") > 0,
                F.col(f"__swv{b}").cast("double")
                / F.col(f"__sw{b}").cast("double"),
            )
            for b in range(reps)
        ]
    )
    survivors = F.array_sort(
        F.filter(means, lambda x: x.isNotNull())
    )
    return g.select(
        F.col("__g").alias(group_col),
        (F.col("__sv").cast("double") / F.col("__n")).alias("mean"),
        F.get(survivors, F.lit(lo_rank - 1)).alias("ci_lo"),
        F.get(survivors, F.lit(hi_rank - 1)).alias("ci_hi"),
        F.lit(reps).cast("int").alias("reps"),
    )
