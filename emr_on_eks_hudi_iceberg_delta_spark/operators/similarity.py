"""Similarity search over embedding columns (``array<float>``).

Three paths:
* ``cosine_topk`` — exact brute-force top-k: the correctness baseline and
  the right choice when the query set is small (broadcast queries, one
  scan of the corpus, per-partition top-k then global top-k).
* ``lsh_ann_pairs`` / ``lsh_ann_topk`` — random-hyperplane LSH with
  literal-plane sequential folds: the ORACLE-PARITY path. Dot products
  use ``zip_with``+``aggregate`` (sequential double fold) — bit-identical
  to DuckDB's ``list_dot_product``, which keeps exact oracles possible.
  Caveat: higher-order functions are CodegenFallback in Spark (interpreted
  per row, not whole-stage-codegen), and the plan embeds n_planes x dim
  literal nodes — right for test dims (16x64), wrong for production dims.
* ``lsh_ann_pairs_blas`` / ``hyperplane_band_keys_blas`` — the PRODUCTION
  path for wide vectors / many planes: one BLAS matmul per Arrow batch
  inside ``mapInPandas``; planes are regenerated from the seed on each
  executor, so plan size is O(1) in (n_planes, dim). Same banding, same
  bucket-join, same cap — only signature computation differs (matmul
  accumulation order != sequential fold, so near-zero dots may flip a
  bit vs the literal path: rows-only checked, not oracle-exact).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _with_double_vec(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Cast to array<double> once and precompute the L2 norm."""
    e = F.col(vec_col).cast("array<double>")
    nrm = F.sqrt(
        F.aggregate(
            F.transform(e, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )
    return df.select(F.col(id_col), e.alias("e"), nrm.alias("nrm"))


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` is broadcast (small by assumption); the corpus is scanned
    once; ranking is a window over (query, cosine desc, neighbor id) — the
    tie-break keeps results deterministic.
    """
    corpus = _with_double_vec(emb, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("e").alias("ec"), F.col("nrm").alias("nc")
    )
    qs = _with_double_vec(queries, id_col, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("e").alias("eq"), F.col("nrm").alias("nq")
    )
    dot = F.aggregate(
        F.zip_with("eq", "ec", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    scored = (
        F.broadcast(qs)
        .join(corpus, F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", dot / (F.col("nq") * F.col("nc")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def hyperplane_matrix(n_planes: int = 16, dim: int = 64, seed: int = 7) -> np.ndarray:
    """Seeded random hyperplanes, shape (dim, n_planes). Generated once on
    the driver and embedded as literal arrays — both in the Spark plan and
    in the DuckDB oracle SQL (``signature_sql``) — so the two engines see
    bit-identical plane coefficients."""
    rng = np.random.RandomState(seed)
    return rng.randn(dim, n_planes)


def hyperplane_signatures(
    emb: DataFrame,
    n_planes: int = 16,
    dim: int = 64,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane (SimHash-for-vectors) LSH signature per vector.

    Pure column expressions: each sign bit is a sequential
    ``zip_with``+``aggregate`` double fold against a literal plane array —
    zero Python in the hot path, and IEEE-exact left-to-right accumulation
    that DuckDB's ``list_dot_product`` replays bit-identically (see
    ``signature_sql``), making LSH output oracle-checkable despite the
    RNG-derived planes.

    Scale caveats (why this is the oracle path, not the production path):
    higher-order functions (``zip_with``/``aggregate``) are CodegenFallback
    in Spark — evaluated interpreted, outside whole-stage codegen — and the
    plan carries n_planes x dim literal expression nodes (100k+ at 128
    planes x 768 dims: a driver-side planning bottleneck). For production
    dims use ``hyperplane_band_keys_blas`` / ``lsh_ann_pairs_blas``.
    """
    planes = hyperplane_matrix(n_planes, dim, seed)
    e = F.col(vec_col).cast("array<double>")
    sig = F.lit(0).cast("bigint")
    for j in range(n_planes):
        plane = F.array(*[F.lit(float(planes[i, j])) for i in range(dim)])
        dot = F.aggregate(
            F.zip_with(e, plane, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(dot > 0, F.lit(1 << j).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    return emb.select(F.col(id_col), sig.alias("signature"))


def signature_sql(
    vec_expr: str = "CAST(embedding AS DOUBLE[])",
    n_planes: int = 16,
    dim: int = 64,
    seed: int = 7,
) -> str:
    """The DuckDB expression computing the exact same signature as
    ``hyperplane_signatures`` — plane coefficients inlined via shortest
    round-trip ``repr`` (exact for binary64), dot product via
    ``list_dot_product`` (same sequential fold as the Spark side)."""
    planes = hyperplane_matrix(n_planes, dim, seed)
    terms = []
    for j in range(n_planes):
        lit = "[" + ",".join(repr(float(planes[i, j])) for i in range(dim)) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product({vec_expr}, CAST({lit} AS DOUBLE[])) > 0 "
            f"THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        )
    return "(" + " + ".join(terms) + ")"


# single source of truth for the LSH bucket cap — interpolated into the
# DuckDB oracle SQL strings (queries.py) AND used as the operator default,
# so changing it cannot silently desynchronize oracle and engine
DEFAULT_MAX_BUCKET_SIZE = 10_000


def cap_buckets(
    buckets: DataFrame, max_bucket_size: int | None, keys: tuple[str, ...] = ("band", "key")
) -> DataFrame:
    """Drop LSH buckets larger than ``max_bucket_size`` — the guard against
    the O(b^2) pair blow-up a degenerate bucket causes (boilerplate-heavy
    corpora put thousands of rows behind one band digest; AQE skew-join
    splits the shuffle but not the pair count). Oversized buckets carry
    almost no dedup signal, so dropping them is standard practice. The
    window count rides the same (band, key) exchange the self-join needs,
    so the cap adds no extra shuffle. ``lsh_bucket_stats`` reports what a
    given cap would drop."""
    if max_bucket_size is None:
        return buckets
    w = Window.partitionBy(*keys)
    return (
        buckets.withColumn("__bsz", F.count(F.lit(1)).over(w))
        .filter(F.col("__bsz") <= max_bucket_size)
        .drop("__bsz")
    )


def lsh_bucket_stats(
    buckets: DataFrame, max_bucket_size: int, keys: tuple[str, ...] = ("band", "key")
) -> DataFrame:
    """Per-bucket sizes for buckets above the cap: (band, key, n_rows) —
    the observability side of ``cap_buckets`` (run it to log how much a
    cap drops before committing to one)."""
    return (
        buckets.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > max_bucket_size)
    )


def lsh_ann_pairs(
    emb: DataFrame,
    n_planes: int = 16,
    bands: int = 4,
    dim: int = 64,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
) -> DataFrame:
    """Approximate near-neighbor candidate pairs: band the hyperplane
    signature, self-join on (band, band-bits). Sub-quadratic: the shuffle
    is on bucket keys, and bucket sizes bound the pair blow-up — buckets
    above ``max_bucket_size`` are dropped (see ``cap_buckets``)."""
    bits_per_band = n_planes // bands
    sig = hyperplane_signatures(emb, n_planes, dim, seed, id_col, vec_col)
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftrightunsigned(F.col("signature"), b * bits_per_band)
            .bitwiseAND(F.lit((1 << bits_per_band) - 1))
            .alias("key"),
        )
        for b in range(bands)
    ]
    buckets = sig.select(
        F.col(id_col), F.explode(F.array(*band_structs)).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    buckets = cap_buckets(buckets, max_bucket_size)
    a, b = buckets.alias("a"), buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def lsh_ann_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 16,
    bands: int = 4,
    dim: int = 64,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multi_probe: bool = False,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
) -> DataFrame:
    """Approximate top-k: restrict exact cosine scoring to LSH bucket
    co-occupants of each query. The IVF-style pattern: probe buckets, score
    candidates exactly, rank.

    ``multi_probe=True`` additionally probes every bucket one bit-flip away
    from each query band key (the classic multi-probe LSH recall boost:
    bits_per_band extra probes per band on the tiny query side only — the
    corpus bucketing is untouched). Corpus buckets above
    ``max_bucket_size`` are dropped (``cap_buckets``) — a degenerate bucket
    would otherwise dominate every probing query's candidate set."""
    bits_per_band = n_planes // bands

    def bucketize(df, name, probe: bool = False):
        sig = hyperplane_signatures(df, n_planes, dim, seed, id_col, vec_col)
        bandc = []
        for b in range(bands):
            key = (
                F.shiftrightunsigned(F.col("signature"), b * bits_per_band)
                .bitwiseAND(F.lit((1 << bits_per_band) - 1))
            )
            bandc.append(F.struct(F.lit(b).alias("band"), key.alias("key")))
            if probe:
                for j in range(bits_per_band):
                    bandc.append(
                        F.struct(
                            F.lit(b).alias("band"),
                            key.bitwiseXOR(F.lit(1 << j)).alias("key"),
                        )
                    )
        return sig.select(
            F.col(id_col).alias(name), F.explode(F.array(*bandc)).alias("bk")
        ).select(name, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))

    qb = bucketize(queries, "query_id", probe=multi_probe).distinct()
    cb = cap_buckets(bucketize(emb, "neighbor_id"), max_bucket_size)
    cand = (
        F.broadcast(qb)
        .join(cb, ["band", "key"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qv = _with_double_vec(queries, id_col, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("e").alias("eq"), F.col("nrm").alias("nq")
    )
    cv = _with_double_vec(emb, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("e").alias("ec"), F.col("nrm").alias("nc")
    )
    dot = F.aggregate(
        F.zip_with("eq", "ec", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .withColumn("cosine", dot / (F.col("nq") * F.col("nc")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def recommended_lsh_params(
    corpus_size: int,
    bands: int = 8,
    target_bucket_size: int = 1_000,
    min_bits: int = 4,
    max_bits: int = 62,
) -> dict:
    """Corpus-size-aware LSH parameterization. With random sign bits a
    band key spreads the corpus over ~2^bits buckets, so expected bucket
    size is corpus_size / 2^bits: bits = ceil(log2(corpus / target)).

    Why this matters at 100 TB: the test-default 4-bit band keys give only
    16 buckets per band — past ~10^5 vectors EVERY bucket exceeds a 10k
    cap and the capped pipeline silently returns zero candidates. At 10^9
    vectors with target 1k this picks 20-bit keys (~1M buckets/band,
    n_planes = bands x 20 = 160 — BLAS-path territory)."""
    import math

    bits = math.ceil(math.log2(max(2, corpus_size) / target_bucket_size))
    bits = max(min_bits, min(max_bits, bits))
    return {
        "n_planes": bands * bits,
        "bands": bands,
        "bits_per_band": bits,
        "expected_bucket_size": corpus_size / (1 << bits),
    }


def hyperplane_band_keys_blas(
    emb: DataFrame,
    n_planes: int = 64,
    bands: int = 8,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Production-dim hyperplane band keys: one BLAS matmul per Arrow
    batch instead of n_planes literal-array folds.

    Returns (id, band, key) — the same bucket shape the literal path
    bands into, computed as ``sign(V @ P)`` over the whole batch matrix.
    The planes are REGENERATED from the seed inside each task (numpy
    RandomState is deterministic cross-platform), so the Spark plan
    carries zero plane literals: plan size is O(1) in (n_planes, dim)
    where the literal-fold path is O(n_planes x dim) expression nodes —
    the difference between planning milliseconds and planning minutes at
    128 planes x 768+ dims. Matmul accumulation order differs from the
    sequential fold, so near-zero dots may land in a different bucket
    than the literal path: this is the rows-only production path, while
    the literal path keeps oracle parity at test dims.

    Scale: mapInPandas is a scan-speed map (no shuffle); the banded
    explode that follows is JVM-side posexplode.
    """
    if n_planes % bands:
        raise ValueError("n_planes must be divisible by bands")
    bits_per_band = n_planes // bands
    if bits_per_band > 62:
        raise ValueError("band key must fit in a signed 64-bit int")

    import pandas as pd
    from pyspark.sql import types as T

    id_field = emb.schema[id_col]
    schema = T.StructType(
        [id_field, T.StructField("keys", T.ArrayType(T.LongType()))]
    )

    def make_keys(batches):
        planes = None
        weights = 1 << np.arange(bits_per_band, dtype=np.int64)
        for pdf in batches:
            if pdf.empty:
                continue
            V = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            if planes is None:
                planes = hyperplane_matrix(n_planes, V.shape[1], seed)
            bits = (V @ planes) > 0  # (n, n_planes) — ONE gemm per batch
            keys = np.empty((len(pdf), bands), dtype=np.int64)
            for b in range(bands):
                keys[:, b] = (
                    bits[:, b * bits_per_band : (b + 1) * bits_per_band]
                    @ weights
                )
            yield pd.DataFrame({id_col: pdf[id_col], "keys": list(keys)})

    return (
        emb.select(id_col, vec_col)
        .mapInPandas(make_keys, schema)
        .select(F.col(id_col), F.posexplode("keys").alias("band", "key"))
    )


def lsh_ann_pairs_blas(
    emb: DataFrame,
    n_planes: int = 64,
    bands: int = 8,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
) -> DataFrame:
    """ANN candidate pairs on the BLAS signature path — identical banding,
    bucket cap, and self-join to ``lsh_ann_pairs``; only the signature
    computation differs (see ``hyperplane_band_keys_blas``). This is the
    default to reach for past ~10^5 vectors or ~128 dims; pick parameters
    with ``recommended_lsh_params``."""
    buckets = cap_buckets(
        hyperplane_band_keys_blas(emb, n_planes, bands, seed, id_col, vec_col),
        max_bucket_size,
    )
    a, b = buckets.alias("a"), buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def ivf_assign(
    emb: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine_iters: int = 0,
) -> tuple[DataFrame, DataFrame]:
    """IVF coarse quantizer: deterministic seed centroids (the first
    ``n_centroids`` vectors by id), optional Lloyd refinement iterations
    (per-cell mean via posexplode + grouped avg — all built-ins), final
    assignment pass (broadcast centroids, argmin L2). Returns
    (assignments(id, cell), centroids(cell, vector)).

    This is the ORACLE-PARITY path: the crossJoin+window argmin
    multiplies every row by ``n_centroids`` and then shuffles on the id —
    at 100 TB use ``ivf_assign_blas`` (zero-shuffle gemm twin, pinned
    assignment-identical at test dims) and run any refinement on a
    sample."""
    e = _with_double_vec(emb, id_col, vec_col)
    dist = F.aggregate(
        F.zip_with("e", "ce", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )

    def assign(centroids: DataFrame) -> DataFrame:
        w = Window.partitionBy(id_col).orderBy("dist", "cell")
        return (
            e.crossJoin(F.broadcast(centroids))
            .withColumn("dist", dist)
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(F.col(id_col), F.col("cell"))
        )

    centroids = (
        e.orderBy(id_col)
        .limit(n_centroids)
        .select(F.col(id_col).alias("cell"), F.col("e").alias("ce"))
    )
    for _ in range(refine_iters):
        members = assign(centroids).join(e, id_col)
        means = (
            members.select("cell", F.posexplode("e").alias("pos", "v"))
            .groupBy("cell", "pos")
            .agg(F.avg("v").alias("m"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s.m,
                ).alias("ce")
            )
        )
        centroids = means  # cells that lost all members drop out (k shrinks)
    return assign(centroids), centroids


def ivf_assign_blas(
    emb: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Production-scale IVF assignment: one argmin-over-centroids gemm
    per Arrow batch — the third literal→BLAS swap (after LSH band keys
    and PQ encode), targeting ``ivf_assign``'s scale smell: its
    crossJoin-then-window plan multiplies every corpus row by
    ``n_centroids`` BEFORE a full shuffle on the id for the per-id
    argmin. This path multiplies nothing and shuffles nothing — the
    centroids ride in the task closure (metadata-sized) and assignment
    is a scan-speed map.

    Same deterministic seeding (first ``n_centroids`` vectors by id,
    cell = seed's vec id) and the same first-minimum tie-break (numpy
    argmin over centroid columns ordered by ascending cell id ==
    ``ORDER BY dist, cell``), so at test dims the two paths agree
    assignment-for-assignment (pinned in tests); exact float ties could
    differ (gemm accumulation order), making this the rows-only
    production path like its LSH/PQ siblings.

    Returns (assignments(id, cell), centroids(cell, ce)) — the same
    shapes ``ivf_assign`` returns, so downstream composition (probing,
    ADC, semantic dedup) is unchanged.
    """
    e = emb.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("e")
    )
    seeds = e.orderBy(id_col).limit(n_centroids).collect()
    cells = [r[0] for r in seeds]  # ascending id == ORDER BY cell tie-break
    C = np.vstack([np.asarray(r["e"], dtype=np.float64) for r in seeds])
    c_sq = (C * C).sum(axis=1)

    import pandas as pd
    from pyspark.sql import types as T

    id_field = emb.schema[id_col]
    schema = T.StructType(
        [id_field, T.StructField("cell", id_field.dataType)]
    )
    cells_arr = np.asarray(cells)

    def assign(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            V = np.vstack(pdf["e"].to_numpy()).astype(np.float64)
            d = (V * V).sum(axis=1, keepdims=True) - 2.0 * (V @ C.T) + c_sq
            yield pd.DataFrame(
                {id_col: pdf[id_col], "cell": cells_arr[d.argmin(axis=1)]}
            )

    centroids = (
        e.orderBy(id_col)
        .limit(n_centroids)
        .select(F.col(id_col).alias("cell"), F.col("e").alias("ce"))
    )
    return e.mapInPandas(assign, schema), centroids


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine_iters: int = 0,
) -> DataFrame:
    """IVF approximate top-k: corpus bucketed by nearest centroid; each
    query probes its ``nprobe`` nearest cells and exact-scores only those
    candidates. Cost ~ (nprobe / n_centroids) of brute force; recall < 1
    (vectors outside probed cells are invisible)."""
    assigned, centroids = ivf_assign(emb, n_centroids, id_col, vec_col, refine_iters)
    qv = _with_double_vec(queries, id_col, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("e").alias("eq"), F.col("nrm").alias("nq")
    )
    dist = F.aggregate(
        F.zip_with("eq", "ce", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    wq = Window.partitionBy("query_id").orderBy("dist", "cell")
    probes = (
        qv.crossJoin(F.broadcast(centroids))
        .withColumn("dist", dist)
        .withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= nprobe)
        .select("query_id", "cell")
    )
    cv = _with_double_vec(emb, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("e").alias("ec"), F.col("nrm").alias("nc")
    )
    cand = (
        F.broadcast(probes)
        .join(assigned.withColumnRenamed(id_col, "neighbor_id"), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    dot = F.aggregate(
        F.zip_with("eq", "ec", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .withColumn("cosine", dot / (F.col("nq") * F.col("nc")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def quantize_embeddings(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
) -> DataFrame:
    """Symmetric per-vector scalar quantization (the int8 compression step
    of a scale ANN index — 4x smaller vectors, integer dot products):
    ``scale = max|v| / qmax``, ``q_i = floor(v_i / scale + 0.5)``, plus the
    per-vector max absolute reconstruction error.

    floor(x + 0.5) rather than round(): round-half-even vs half-up differs
    between engines, floor is exact everywhere — and /, *, abs are
    IEEE-exact, so quantized vectors are bit-identical cross-engine.
    Pure per-row column arithmetic: zero shuffle, scan speed at any scale.
    """
    qmax = float((1 << (bits - 1)) - 1)
    e = F.col(vec_col).cast("array<double>")
    mx = F.array_max(F.transform(e, lambda x: F.abs(x)))
    scale = F.when(mx > 0, mx / F.lit(qmax)).otherwise(F.lit(1.0))
    qvec = F.transform(e, lambda x: F.floor(x / scale + F.lit(0.5)).cast("int"))
    err = F.array_max(
        F.transform(
            e, lambda x: F.abs(x - F.floor(x / scale + F.lit(0.5)) * scale)
        )
    )
    return emb.select(
        F.col(id_col),
        scale.alias("scale"),
        qvec.alias("qvec"),
        err.alias("max_abs_err"),
    )


def pq_encode(
    emb: DataFrame,
    m: int = 4,
    k_codes: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Product-quantization encoder: split each vector into ``m`` subspaces
    and store, per subspace, the 1-based index of the nearest codeword —
    ``m`` small ints instead of ``dim`` floats (compression the third ANN
    family, beside LSH and IVF, rests on).

    Codebooks are DETERMINISTIC: subspace slices of the first ``k_codes``
    vectors by id (the same zero-iteration seeding as ``ivf_assign``), so
    the whole encode replays exactly in SQL. Codebooks collect to the
    driver (k_codes x dim doubles — metadata-sized, like IVF centroids)
    and embed as literal arrays, making the encode a pure per-row
    expression: argmin is ``array_position(dists, array_min(dists))`` —
    first-minimum tie-break, matching ORDER BY (dist, codeword) replay —
    with ZERO shuffle at any corpus size.

    Plan size is O(m * k_codes * dim/m) literals; for production dims the
    same mapInPandas BLAS swap as ``hyperplane_band_keys_blas`` applies —
    the plumbing (codes schema, downstream ADC) is unchanged.

    Returns (codes DataFrame with ``code_0..code_{m-1}``, codebooks as
    nested Python lists ``[subspace][codeword][component]``).
    """
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    e = _with_double_vec(emb, id_col, vec_col)
    seeds = e.orderBy(id_col).limit(k_codes).select(id_col, "e").collect()
    codebooks = [
        [list(r["e"][j * sub : (j + 1) * sub]) for r in seeds] for j in range(m)
    ]
    return _pq_encode_with(e, codebooks, id_col), codebooks


def _pq_encode_with(
    e: DataFrame, codebooks: list, id_col: str
) -> DataFrame:
    """Encode an ``_with_double_vec``-prepared frame against GIVEN
    codebooks (the shared core of ``pq_encode`` and the persisted
    index's append path): per subspace, argmin over the codebook with
    first-minimum tie-break — a pure per-row expression, zero
    shuffle."""
    sub = len(codebooks[0][0])
    out = [F.col(id_col), F.col("e")]
    for j, cb in enumerate(codebooks):
        cblit = F.array(*[F.array(*[F.lit(float(x)) for x in cw]) for cw in cb])
        subv = F.slice("e", j * sub + 1, sub)
        dists = F.transform(
            cblit,
            lambda cw: F.aggregate(
                F.zip_with(subv, cw, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        out.append(
            F.array_position(dists, F.array_min(dists)).cast("int").alias(f"code_{j}")
        )
    return e.select(*out)


def pq_encode_blas(
    emb: DataFrame,
    m: int = 4,
    k_codes: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks: list | None = None,
):
    """Production-dim PQ encoder: one BLAS gemm per subspace per Arrow
    batch instead of ``m * k_codes`` literal-array folds — the same
    literal→BLAS swap ``hyperplane_band_keys_blas`` made for LSH.

    Same deterministic codebooks as ``pq_encode`` (subspace slices of the
    first ``k_codes`` vectors by id), same 1-based first-minimum argmin
    (numpy argmin returns the first minimum, matching
    ``array_position(dists, array_min(dists))``). The codebooks ride in
    the pickled task closure — metadata-sized, k_codes x dim doubles —
    so the Spark plan carries ZERO codebook literals: plan size is O(1)
    in (m, k_codes, dim) where the literal path is O(k_codes x dim)
    expression nodes, interpreted (higher-order functions are
    CodegenFallback). At 256 codes x 4096 dims that literal plan is ~1M
    nodes — driver planning minutes; this path plans in milliseconds.

    Distances use the expanded gemm form ``|s|^2 - 2 s.c + |c|^2``, whose
    accumulation order differs from the literal path's sequential fold —
    so an exact-tie (or near-tie at float precision) argmin may pick a
    different codeword. That makes this the rows-only production path;
    the literal ``pq_encode`` keeps oracle parity at test dims, and
    ``tests/test_ann_blas.py`` pins that both paths agree code-for-code
    on real embeddings.

    Returns (codes DataFrame with ``id_col, code_0..code_{m-1}``,
    codebooks). Unlike ``pq_encode`` the full vectors are NOT carried
    through Python — codes are the product; re-join the source for
    anything needing raw vectors.
    """
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    # not _with_double_vec: its precomputed norm is an aggregate fold the
    # plan-size contract of this path forbids (and PQ never needs it)
    e = emb.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("e")
    )
    if codebooks is None:
        seeds = e.orderBy(id_col).limit(k_codes).collect()
        codebooks = [
            [list(r["e"][j * sub : (j + 1) * sub]) for r in seeds]
            for j in range(m)
        ]
    cb = np.asarray(codebooks, dtype=np.float64)  # (m, k_codes, sub)
    cb_sq = (cb * cb).sum(axis=2)  # (m, k_codes) — precomputed |c|^2

    import pandas as pd
    from pyspark.sql import types as T

    id_field = emb.schema[id_col]
    schema = T.StructType(
        [id_field]
        + [T.StructField(f"code_{j}", T.IntegerType()) for j in range(m)]
    )

    def encode(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            V = np.vstack(pdf["e"].to_numpy()).astype(np.float64)  # (n, dim)
            out = {id_col: pdf[id_col]}
            for j in range(m):
                S = V[:, j * sub : (j + 1) * sub]  # (n, sub)
                # ONE gemm per subspace per batch
                d = (
                    (S * S).sum(axis=1, keepdims=True)
                    - 2.0 * (S @ cb[j].T)
                    + cb_sq[j]
                )
                out[f"code_{j}"] = (d.argmin(axis=1) + 1).astype(np.int32)
            yield pd.DataFrame(out)

    return e.select(id_col, "e").mapInPandas(encode, schema), codebooks


def pq_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 4,
    k_codes: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ approximate top-k via asymmetric distance computation (ADC):
    corpus vectors are replaced by their codebook reconstructions (concat
    of the ``m`` chosen codewords), queries stay full-precision, and every
    (query, code) pair scores with the exact sequential-fold L2 — so the
    scan touches ``m`` ints per corpus vector plus the shared codebooks
    instead of ``dim`` floats. Recall < 1 (quantization error); the
    compression ratio is the point at 100 TB.

    Scale shape: queries broadcast; the corpus side is one scan of the
    codes (zero-shuffle encode, see ``pq_encode``) + the per-query top-k
    window — identical to ``cosine_topk``'s shape but on 8x-32x smaller
    data. Deterministic end-to-end, replayed exactly by the DuckDB oracle.
    """
    codes, codebooks = pq_encode(emb, m, k_codes, dim, id_col, vec_col)
    rec = F.concat(
        *[
            F.element_at(
                F.array(
                    *[
                        F.array(*[F.lit(float(x)) for x in cw])
                        for cw in codebooks[j]
                    ]
                ),
                F.col(f"code_{j}"),
            )
            for j in range(m)
        ]
    )
    corpus = codes.select(
        F.col(id_col).alias("neighbor_id"), rec.alias("r")
    )
    qv = _with_double_vec(queries, id_col, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("e").alias("eq")
    )
    adc = F.aggregate(
        F.zip_with("eq", "r", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
    return (
        corpus.crossJoin(F.broadcast(qv))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("adc_dist", adc)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc_dist", "rank")
    )


def pq_topk_blas(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 4,
    k_codes: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Production-dim PQ top-k via precomputed ADC distance tables — the
    query-side half of the literal→BLAS swap (``pq_encode_blas`` is the
    encode half), completing the PQ production story.

    The FAISS ADC layout: for each query, precompute driver-side the
    (m x k_codes) table of subspace distances to every codeword —
    metadata-sized, n_queries x m x k_codes doubles — then score a corpus
    code row as ``sum_j dtable[q, j, code_j]``: a vectorized GATHER per
    Arrow batch, no per-row distance arithmetic at all, touching only the
    m small ints per corpus vector. Each batch emits only its per-query
    top-k partials (numpy argpartition), so the shuffle into the global
    top-k window is bounded at (batches x queries x k) rows — the
    textbook distributed top-k, independent of corpus size.

    Rows-only path: dtable entries accumulate in numpy order, not the
    sequential fold, so ADC ties at float precision are not
    SQL-replayable; ``pq_topk`` keeps oracle parity at test dims and
    tests/test_ann_blas.py pins that both paths return the same
    neighbors on the real embeddings.
    """
    import pandas as pd
    from pyspark.sql import types as T

    sub = dim // m
    codes, codebooks = pq_encode_blas(
        emb, m, k_codes, dim, id_col, vec_col
    )
    cb = np.asarray(codebooks, dtype=np.float64)  # (m, k_eff, sub)
    q_rows = (
        queries.select(
            F.col(id_col), F.col(vec_col).cast("array<double>").alias("e")
        )
        .orderBy(id_col)
        .collect()
    )
    qids = [r[0] for r in q_rows]
    Q = np.vstack([np.asarray(r["e"], dtype=np.float64) for r in q_rows])
    # (n_q, m, k_eff): squared L2 of every query subvector to every codeword
    dtable = np.stack(
        [
            ((Q[:, j * sub : (j + 1) * sub, None] - cb[j].T[None, :, :]) ** 2).sum(
                axis=1
            )
            for j in range(m)
        ],
        axis=1,
    )

    id_field = emb.schema[id_col]
    schema = T.StructType(
        [
            T.StructField("query_id", id_field.dataType),
            T.StructField("neighbor_id", id_field.dataType),
            T.StructField("adc_dist", T.DoubleType()),
        ]
    )

    def score(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            C = (
                np.stack(
                    [pdf[f"code_{j}"].to_numpy() for j in range(m)], axis=1
                )
                - 1
            )  # (n, m), 0-based
            ids = pdf[id_col].to_numpy()
            n = len(pdf)
            D = np.zeros((len(qids), n))
            for j in range(m):
                D += dtable[:, j, C[:, j]]
            out_q, out_n, out_d = [], [], []
            for qi, qid in enumerate(qids):
                mask = ids != qid
                d, nn = D[qi][mask], ids[mask]
                if len(d) > k:
                    part = np.argpartition(d, k - 1)[:k]
                else:
                    part = np.arange(len(d))
                out_q.extend([qid] * len(part))
                out_n.extend(nn[part])
                out_d.extend(d[part])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "adc_dist": out_d}
            )

    partials = codes.mapInPandas(score, schema)
    w = Window.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
    return (
        partials.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc_dist", "rank")
    )


def pq_reconstruct_expr(codebooks: list) -> "F.Column":
    """Column expression rebuilding a vector from its ``code_j`` columns:
    concat of the chosen codeword per subspace (literal codebooks — the
    same metadata-sized driver collect as ``pq_encode``)."""
    return F.concat(
        *[
            F.element_at(
                F.array(*[F.array(*[F.lit(float(x)) for x in cw]) for cw in cb]),
                F.col(f"code_{j}"),
            )
            for j, cb in enumerate(codebooks)
        ]
    )


def ivf_pq_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    m: int = 4,
    k_codes: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ: the two approximations composed the way production ANN
    indexes (FAISS IVFPQ) do — the coarse quantizer prunes the corpus to
    ``nprobe`` cells per query, and only those candidates score, against
    PQ reconstructions via asymmetric distance instead of raw vectors.
    Cost ~ (nprobe/n_centroids) of a scan x (m ints instead of dim floats)
    per candidate — the two savings multiply, which is why the combination
    is the standard billion-scale layout.

    This is the no-residual variant (PQ codes the raw vectors, not
    centroid residuals): every stage stays deterministic — seed centroids
    AND seed codebooks are the first vectors by id — so the full pipeline
    replays exactly in the DuckDB oracle, like each piece alone.

    Scale shape: centroids and codebooks are metadata-sized broadcasts;
    the corpus side is one zero-shuffle encode + one shuffle on the cell
    key for candidate generation + the per-query top-k window.
    """
    assigned, centroids = ivf_assign(emb, n_centroids, id_col, vec_col)
    qv = _with_double_vec(queries, id_col, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("e").alias("eq")
    )
    cdist = F.aggregate(
        F.zip_with("eq", "ce", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    wq = Window.partitionBy("query_id").orderBy("dist", "cell")
    probes = (
        qv.crossJoin(F.broadcast(centroids))
        .withColumn("dist", cdist)
        .withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= nprobe)
        .select("query_id", "cell")
    )
    codes, codebooks = pq_encode(emb, m, k_codes, dim, id_col, vec_col)
    corpus = codes.select(
        F.col(id_col).alias("neighbor_id"),
        pq_reconstruct_expr(codebooks).alias("r"),
    )
    cand = (
        F.broadcast(probes)
        .join(assigned.withColumnRenamed(id_col, "neighbor_id"), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    adc = F.aggregate(
        F.zip_with("eq", "r", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
    return (
        cand.join(F.broadcast(qv), "query_id")
        .join(corpus, "neighbor_id")
        .withColumn("adc_dist", adc)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc_dist", "rank")
    )


def quantized_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k over int8-quantized vectors (the serving layout
    ``quantize_embeddings`` produces): scores are INTEGER dot products of
    the quantized codes — 4x less memory traffic than float vectors, and
    exact int64 arithmetic (max |q|=127, so 127^2 * dim stays far inside
    int64) — rescaled by the two per-vector scales
    (``dot * scale_q * scale_c``, two deterministic IEEE products).
    Approximate only through quantization error; bit-reproducible and
    fully SQL-replayable, unlike any float-accumulation scoring.

    Scale shape: identical to ``cosine_topk`` (broadcast queries, one
    corpus scan, per-query top-k window) on 4x smaller data.
    """
    q = quantize_embeddings(queries, id_col, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("qvec").alias("qq"),
        F.col("scale").alias("sq"),
    )
    c = quantize_embeddings(emb, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("qvec").alias("qc"),
        F.col("scale").alias("sc"),
    )
    idot = F.aggregate(
        F.zip_with(
            "qq", "qc", lambda x, y: (x.cast("bigint") * y.cast("bigint"))
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("score", idot.cast("double") * F.col("sq") * F.col("sc"))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def kcenter_sample(
    emb: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    checkpoint_every: int = 4,
) -> DataFrame:
    """Greedy k-center (farthest-point) diversity sampling: pick the
    lowest-id vector, then repeatedly the vector farthest (squared L2)
    from everything chosen so far — the classic 2-approximation to the
    k-center coverage problem, used to select a maximally diverse subset
    of an embedded corpus (coreset seeding, eval-set picking, dedup-aware
    curation).

    Returns one row per selected vector: ``selection_order`` (1-based)
    and ``dist_sq`` — its min squared distance to the previously chosen
    set at selection time (non-increasing; the k-th value bounds the
    corpus coverage radius).

    Deterministic: seed = lowest id; ties in farthest-point break on the
    lower id; distance folds are sequential left-folds, so results are
    reproducible run-to-run and against a same-op-order host reference
    (tests/test_similarity_extra.py).

    Scale: greedy k-center is inherently sequential in k — each step is
    one distributed ``least(min-dist, dist-to-new-center)`` map plus one
    TakeOrdered(1) (driver receives ONE row per step, never data).
    Centers enter the plan as literal arrays (k×dim literal nodes);
    for production dims the same mapInPandas BLAS swap as
    ``hyperplane_band_keys_blas`` applies — the greedy loop structure is
    unchanged. ``checkpoint_every`` truncates the growing lineage.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if int(checkpoint_every) < 1:
        raise ValueError("checkpoint_every must be >= 1")
    id_type = emb.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_type}, selection_order int, dist_sq double"
    base = _with_double_vec(emb, id_col, vec_col).select(F.col(id_col), "e")

    def sq_dist_to(vec: list) -> "F.Column":
        lit_vec = F.array(*[F.lit(float(v)) for v in vec])
        return F.aggregate(
            F.zip_with("e", lit_vec, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    seed_rows = base.orderBy(F.col(id_col).asc()).limit(1).collect()
    if not seed_rows:
        return emb.sparkSession.createDataFrame([], out_schema)
    first = seed_rows[0]
    chosen: list[tuple] = [(first[id_col], 1, 0.0)]
    cur = base.filter(F.col(id_col) != F.lit(first[id_col])).withColumn(
        "__mind", sq_dist_to(first["e"])
    )
    for step in range(2, int(k) + 1):
        far_rows = (
            cur.orderBy(F.col("__mind").desc(), F.col(id_col).asc())
            .limit(1)
            .collect()
        )
        if not far_rows:
            break  # corpus smaller than k
        far = far_rows[0]
        chosen.append((far[id_col], step, float(far["__mind"])))
        cur = cur.filter(F.col(id_col) != F.lit(far[id_col])).withColumn(
            "__mind", F.least(F.col("__mind"), sq_dist_to(far["e"]))
        )
        if step % int(checkpoint_every) == 0:
            cur = cur.localCheckpoint(eager=False)
    return emb.sparkSession.createDataFrame(chosen, out_schema)


def grouped_top_eigen(
    emb: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-group covariance spectrum summary: for every group of
    embeddings, the top covariance eigenvalue and its explained-variance
    ratio (top_eig / trace) — the spread diagnostic behind cluster
    quality checks, whitening decisions, and intrinsic-dimensionality
    probes on embedded corpora.

    Custom numeric operator via ``applyInPandas`` (the grouped-map
    escape hatch SURVEY.md reserves for semantics built-ins cannot
    express): one shuffle on the group key, then each group's (n × dim)
    matrix reduces to a dim × dim covariance and one symmetric eigh per
    group — O(dim²·n + dim³) in vectorized numpy, never per-row Python.
    Degenerate groups (n < 2) report NULL eigenvalues.

    Scale: per-task memory is the group's matrix; dim is small by
    construction (embedding width), and groups far larger than memory
    should pre-aggregate the Gram matrix with a two-stage map-side
    combine (sum of outer products is associative) — the docstring
    contract, same shape as every bounded-state caveat in this repo.
    """
    import pandas as pd

    out_schema = (
        f"{group_col} bigint, n bigint, top_eigenvalue double, "
        "explained_ratio double"
    )

    def spectrum(key, pdf: "pd.DataFrame") -> "pd.DataFrame":
        mat = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
        n = mat.shape[0]
        if n < 2:
            return pd.DataFrame(
                {
                    group_col: [key[0]],
                    "n": [n],
                    "top_eigenvalue": [None],
                    "explained_ratio": [None],
                }
            )
        cov = np.cov(mat, rowvar=False)
        eigs = np.linalg.eigvalsh(cov)
        top = float(eigs[-1])
        trace = float(np.trace(cov))
        return pd.DataFrame(
            {
                group_col: [key[0]],
                "n": [n],
                "top_eigenvalue": [top],
                "explained_ratio": [top / trace if trace else None],
            }
        )

    return emb.select(group_col, vec_col).groupBy(group_col).applyInPandas(
        spectrum, schema=out_schema
    )


def kmeans_lloyd(
    emb: DataFrame,
    k: int = 8,
    max_iters: int = 10,
    tol: float = 1e-6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame, list]:
    """Distributed Lloyd's k-means — the clustering primitive behind
    cluster-then-curate pipelines (SemDeDup's cluster stage, topic
    bucketing, IVF codebook training). ``ivf_assign(refine_iters=N)`` is
    the oracle-parity literal twin; THIS is the production shape:

    * **Assignment fused with the update partials**: each iteration is
      ONE ``mapInPandas`` scan. Per Arrow batch, a single gemm argmin
      assigns every row, and the SAME batch emits <= k partial rows
      ``(cell, n, sumvec, sse)``. The only shuffle per iteration moves
      (batches x k) partial rows — never data rows, never a join.
    * **Driver-side reduce**: partials fold to k centroid means +
      global inertia via one grouped aggregate collected as k rows
      (metadata-sized, like the k-center seeds). New centroids are
      rounded to 1e-9 before broadcast so run-to-run double-sum
      accumulation order cannot flip a near-tie assignment — the
      determinism knob that keeps the gate reproducible.
    * **Convergence**: stops early when relative inertia improvement
      falls under ``tol``; ``history`` returns the inertia per
      iteration so callers can see the curve.

    Seeding is deterministic (the first ``k`` vectors by id — same
    convention as ``ivf_assign``/``pq_encode``). Empty cells keep their
    previous centroid (scikit-learn re-seeds from worst rows; constant
    is simpler and deterministic).

    Returns ``(assignments(id, cell int), centroids(cell, ce), history)``.

    Scale: per iteration one scan + one tiny partial shuffle; centroids
    ride in task closures (k x dim doubles). At 100 TB run the loop on a
    sample, then one final assignment pass over the corpus — the same
    split faiss uses for IVF training.
    """
    import pandas as pd
    from pyspark.sql import types as T

    e = emb.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("e")
    )
    seeds = e.orderBy(id_col).limit(k).collect()
    C = np.vstack([np.asarray(r["e"], dtype=np.float64) for r in seeds])
    dim = C.shape[1]

    partial_schema = T.StructType(
        [
            T.StructField("cell", T.IntegerType()),
            T.StructField("n", T.LongType()),
            T.StructField("sumvec", T.ArrayType(T.DoubleType())),
            T.StructField("sse", T.DoubleType()),
        ]
    )

    def make_partials(centroids: np.ndarray):
        c_sq = (centroids * centroids).sum(axis=1)

        def partials(batches):
            for pdf in batches:
                if pdf.empty:
                    continue
                V = np.vstack(pdf["e"].to_numpy()).astype(np.float64)
                d = (
                    (V * V).sum(axis=1, keepdims=True)
                    - 2.0 * (V @ centroids.T)
                    + c_sq
                )
                cell = d.argmin(axis=1)
                rows = []
                for c in np.unique(cell):
                    m = cell == c
                    rows.append(
                        {
                            "cell": int(c),
                            "n": int(m.sum()),
                            "sumvec": V[m].sum(axis=0).tolist(),
                            "sse": float(np.maximum(d[m, c], 0.0).sum()),
                        }
                    )
                yield pd.DataFrame(rows)

        return partials

    history: list = []
    for _ in range(max_iters):
        # ONE scan per iteration: assignment+partials in the map, then a
        # single grouped aggregate over the <= batches*k partial rows
        # (collect_list is safe here — it holds per-BATCH partials, not
        # per-row vectors; batch count is bounded by input partitions)
        base = e.mapInPandas(make_partials(C), partial_schema)
        folded = base.groupBy("cell").agg(
            F.sum("n").alias("n"),
            F.sum("sse").alias("sse"),
            F.aggregate(
                F.collect_list("sumvec"),
                F.array_repeat(F.lit(0.0), dim),
                lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b),
            ).alias("sumvec"),
        )
        rows = {r["cell"]: r for r in folded.collect()}
        inertia = float(sum(r["sse"] for r in rows.values()))
        new_C = C.copy()
        for c, r in rows.items():
            if r["n"] > 0:
                new_C[c] = np.asarray(r["sumvec"]) / r["n"]
        C = np.round(new_C, 9)
        if history and history[-1] > 0 and (
            (history[-1] - inertia) / history[-1] < tol
        ):
            history.append(inertia)
            break
        history.append(inertia)

    id_field = emb.schema[id_col]
    out_schema = T.StructType(
        [id_field, T.StructField("cell", T.IntegerType())]
    )
    c_sq = (C * C).sum(axis=1)
    Cf = C

    def assign(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            V = np.vstack(pdf["e"].to_numpy()).astype(np.float64)
            d = (V * V).sum(axis=1, keepdims=True) - 2.0 * (V @ Cf.T) + c_sq
            yield pd.DataFrame(
                {id_col: pdf[id_col], "cell": d.argmin(axis=1).astype("int32")}
            )

    spark = emb.sparkSession
    centroids = spark.createDataFrame(
        [(int(i), C[i].tolist()) for i in range(k)], schema="cell int, ce array<double>"
    )
    return e.mapInPandas(assign, out_schema), centroids, history


def hard_negative_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Contrastive hard-negative mining — for every query vector, the
    ``k`` MOST similar corpus vectors carrying a DIFFERENT label (the
    near-but-wrong examples contrastive/triplet training wants; easy
    negatives are useless, same-label neighbors are positives). Same
    plan shape as ``cosine_topk`` — broadcast queries, one corpus scan,
    deterministic rank tie-break — with the label inequality folded into
    the join condition so excluded rows never reach scoring. Rows with
    NULL labels are excluded from both sides (an unknown label can't be
    certified negative). At production scale swap the scan for the IVF/
    LSH candidate stage exactly as with plain top-k; the label predicate
    rides along unchanged."""
    corpus = _with_double_vec(
        emb.filter(F.col(label_col).isNotNull()), id_col, vec_col
    ).join(
        emb.select(F.col(id_col), F.col(label_col).alias("nl")), id_col
    ).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("e").alias("ec"),
        F.col("nrm").alias("nc"),
        "nl",
    )
    qs = _with_double_vec(
        queries.filter(F.col(label_col).isNotNull()), id_col, vec_col
    ).join(
        queries.select(F.col(id_col), F.col(label_col).alias("ql")), id_col
    ).select(
        F.col(id_col).alias("query_id"),
        F.col("e").alias("eq"),
        F.col("nrm").alias("nq"),
        "ql",
    )
    dot = F.aggregate(
        F.zip_with("eq", "ec", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        F.broadcast(qs)
        .join(
            corpus,
            (F.col("query_id") != F.col("neighbor_id"))
            & (F.col("ql") != F.col("nl")),
        )
        .withColumn("cosine", dot / (F.col("nq") * F.col("nc")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("ql").alias("query_label"),
            "neighbor_id",
            F.col("nl").alias("neighbor_label"),
            "cosine",
            "rank",
        )
    )


def build_ivf_index(
    emb: DataFrame,
    location: str,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine_iters: int = 0,
):
    """Persist an IVF index AS A TABLE — the productionized form of
    ``ivf_topk``'s transient clustering: corpus rows land in a
    ``PartitionedTable`` partitioned BY CELL (so probing reads only
    ``nprobe`` partition directories — manifest-level pruning, zero I/O
    for every other cell) and the centroid codebook persists beside it
    (``_ivf_centroids``). Build once, serve many: the index survives the
    session, versions like any table (CoW commits), and refreshes by
    re-running build at a new location or upserting changed cells.

    Same deterministic seeding/assignment as ``ivf_assign`` (literal
    path), so queries through the persisted index return IDENTICAL rows
    to the transient ``ivf_topk`` — which is what lets the index path
    share its exact DuckDB oracle. Returns the ``PartitionedTable``.
    """
    from ..sources.partitioned import PartitionedTable

    assigned, centroids = ivf_assign(
        emb, n_centroids, id_col, vec_col, refine_iters
    )
    data = emb.join(assigned, id_col)
    pt = PartitionedTable(emb.sparkSession, location, "cell")
    pt.overwrite(data)
    centroids.write.mode("overwrite").parquet(location + "/_ivf_centroids")
    return pt


def ivf_index_topk(
    spark,
    location: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Serve approximate top-k from a PERSISTED IVF index
    (``build_ivf_index``): rank cells per query against the stored
    codebook (broadcast, metadata-sized), then read ONLY the probed
    cells' partition directories — the scan never lists the other
    cells' files — and exact-score candidates within them. Operation
    order mirrors ``ivf_topk`` exactly, so results are identical
    row-for-row (pinned by test and by sharing its oracle)."""
    from ..sources.partitioned import PartitionedTable

    centroids = spark.read.parquet(location + "/_ivf_centroids")
    qv = _with_double_vec(queries, id_col, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("e").alias("eq"),
        F.col("nrm").alias("nq"),
    )
    dist = F.aggregate(
        F.zip_with("eq", "ce", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    wq = Window.partitionBy("query_id").orderBy("dist", "cell")
    probes = (
        qv.crossJoin(F.broadcast(centroids))
        .withColumn("dist", dist)
        .withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= nprobe)
        .select("query_id", "cell")
    )
    # metadata-sized collect: nprobe x |queries| cell ids -> the pruned
    # partition set the manifest read is restricted to
    probe_cells = {
        str(r["cell"]) for r in probes.select("cell").distinct().collect()
    }
    pt = PartitionedTable(spark, location, "cell")
    data = pt.read_partitions_where(lambda v: v in probe_cells)
    cv = _with_double_vec(data, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("e").alias("ec"),
        F.col("nrm").alias("nc"),
    )
    members = data.select(
        F.col(id_col).alias("neighbor_id"), F.col("cell")
    )
    cand = (
        F.broadcast(probes)
        .join(members, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    dot = F.aggregate(
        F.zip_with("eq", "ec", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .withColumn("cosine", dot / (F.col("nq") * F.col("nc")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def grouped_gram_spectrum(
    emb: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
    max_driver_labels: int = 4096,
) -> DataFrame:
    """Scale twin of ``grouped_top_eigen`` — IMPLEMENTS the two-stage
    map-side Gram combine its docstring contracts (sum of outer products
    is associative), so no task ever holds a group's full (n x dim)
    matrix:

    1. one ``mapInPandas`` pass emits PARTIAL moments per (arrow batch,
       label): count, sum vector, Gram matrix — flattened to long-form
       ``(label, pos, val)`` rows, 1 + d + d² positions per label;
    2. ``groupBy(label, pos).sum`` combines partials — the shuffle
       carries |labels| x (1 + d + d²) doubles, independent of corpus
       size;
    3. the epilogue reconstructs each label's covariance
       ``C = (G - s sᵀ/n) / (n-1)`` and eigensolves (dim x dim, numpy).
       Up to ``max_driver_labels`` distinct labels it runs on the
       driver (|labels| x d² floats of driver state — fine for typical
       label counts); above the threshold the SAME math runs as an
       ``applyInPandas`` per label over the d²-sized moment rows, so
       driver state is O(1), the result stays O(labels) rows, and no
       task ever holds more than one label's d² cells. Both paths
       consume the identical combined moments and execute the identical
       float sequence, so they agree bit-for-bit (pinned by test).

    Per-task memory is O(arrow batch + labels-in-batch x d²) — a label
    with 10^8 members streams through like any other (the same fix shape
    as the round-7 sequential-fold engine). Output schema and values
    match ``grouped_top_eigen`` (parity-pinned at 1e-9 — float partials
    re-associate, so bit-equality is not expected)."""
    import pandas as pd

    def partial_moments(pdfs):
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            out_lab, out_pos, out_val = [], [], []
            for lab, g in pdf.groupby(group_col, dropna=False):
                x = np.asarray(g[vec_col].tolist(), dtype=np.float64)
                n, d = x.shape
                s = x.sum(axis=0)
                gram = x.T @ x
                vals = np.concatenate(([float(n)], s, gram.ravel()))
                out_lab.extend([lab] * len(vals))
                out_pos.extend(range(len(vals)))
                out_val.extend(vals.tolist())
            yield pd.DataFrame(
                {group_col: out_lab, "pos": out_pos, "val": out_val}
            )

    lab_type = emb.schema[group_col].dataType.simpleString()
    partials = emb.select(group_col, vec_col).mapInPandas(
        partial_moments, f"{group_col} {lab_type}, pos int, val double"
    )
    # materialize the combined moments once: the label-count probe and
    # the epilogue both read them without recomputing the corpus pass
    combined_df = (
        partials.groupBy(group_col, "pos")
        .agg(F.sum("val").alias("val"))
        .localCheckpoint(eager=False)
    )
    out_schema = (
        f"{group_col} {lab_type}, n bigint, top_eigenvalue double, "
        "explained_ratio double"
    )

    def solve_moments(moments: dict):
        """The shared epilogue math — one label's 1+d+d² moment cells
        to (n, top_eigenvalue, explained_ratio)."""
        n = int(round(moments[0]))
        # solve d from 1 + d + d^2 = len(moments)
        d = int((-1 + (1 + 4 * (len(moments) - 1)) ** 0.5) / 2)
        if n < 2:
            return n, None, None
        s = np.array([moments[1 + i] for i in range(d)])
        g = np.array(
            [moments[1 + d + i] for i in range(d * d)]
        ).reshape(d, d)
        cov = (g - np.outer(s, s) / n) / (n - 1)
        eig = np.linalg.eigvalsh(cov)
        top = float(eig[-1])
        trace = float(np.trace(cov))
        return n, top, top / trace if trace else None

    n_labels = combined_df.select(group_col).distinct().count()
    if n_labels > max_driver_labels:
        # distributed epilogue: one applyInPandas group per label —
        # driver never holds the labels x d² moment table
        def eigen_epilogue(pdf: "pd.DataFrame") -> "pd.DataFrame":
            lab = pdf[group_col].iloc[0]
            n, top, ratio = solve_moments(
                dict(zip(pdf["pos"], pdf["val"]))
            )
            return pd.DataFrame(
                {
                    group_col: [lab],
                    "n": [n],
                    "top_eigenvalue": [top],
                    "explained_ratio": [ratio],
                }
            )

        return combined_df.groupBy(group_col).applyInPandas(
            eigen_epilogue, out_schema
        )
    combined = combined_df.collect()
    by_label: dict = {}
    for r in combined:
        by_label.setdefault(r[group_col], {})[r["pos"]] = r["val"]
    rows = []
    for lab, moments in sorted(by_label.items(), key=lambda kv: (kv[0] is None, kv[0])):
        rows.append((lab, *solve_moments(moments)))
    spark = emb.sparkSession
    return spark.createDataFrame(rows, out_schema)


#: dims packed into the binary-quantized signature: bits 0..62 keep the
#: BIGINT non-negative in every engine (DuckDB's << errors at bit 63)
BQ_BITS = 63


def bq_signature_expr(vec_col: str) -> "F.Column":
    """Binary quantization: bit j set iff ``vec[j] > 0`` (first BQ_BITS
    dims). Sign bits of floats are engine-exact — no rounding surface —
    so BQ signatures are perfectly reproducible anywhere, unlike every
    float-accumulating sketch.

    The index sequence is bounded at ``least(size(vec), BQ_BITS)`` so
    reduced-dimension embeddings (d < 63) sign only their real dims
    instead of throwing INVALID_ARRAY_INDEX_IN_ELEMENT_AT under Spark
    4's ANSI default; an empty/NULL-sized vector signs to 0."""
    return F.expr(
        f"if(coalesce(size({vec_col}), 0) <= 0, 0L, "
        f"aggregate(sequence(0, least(size({vec_col}), {BQ_BITS}) - 1), "
        f"0L, (acc, j) -> "
        f"acc + if(element_at({vec_col}, j + 1) > cast(0.0 as double), "
        f"shiftleft(1L, j), 0L)))"
    )


def _bq_screen_rerank(
    emb, queries, sigs, k, screen_m, id_col, vec_col
):
    """Shared BQ core: Hamming screen over a (neighbor_id, nsig) frame,
    exact-cosine rerank of the screen_m survivors (see bq_topk)."""
    qsigs = queries.select(
        F.col(id_col).alias("query_id"),
        bq_signature_expr(vec_col).alias("qsig"),
    )
    screened = (
        F.broadcast(qsigs)
        .join(sigs, F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "hamming",
            F.bit_count(F.col("qsig").bitwiseXOR(F.col("nsig"))).cast("int"),
        )
    )
    ws = Window.partitionBy("query_id").orderBy("hamming", "neighbor_id")
    cand = (
        screened.withColumn("__sr", F.row_number().over(ws))
        .filter(F.col("__sr") <= screen_m)
        .select("query_id", "neighbor_id", "hamming")
    )
    vec = F.col(vec_col).cast("array<double>")
    nrm = F.sqrt(
        F.aggregate(
            F.transform(vec, lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    corpus = emb.select(
        F.col(id_col).alias("neighbor_id"), vec.alias("ec"), nrm.alias("nc")
    )
    qvec = queries.select(
        F.col(id_col).alias("query_id"), vec.alias("eq"), nrm.alias("nq")
    )
    dot = F.aggregate(
        F.zip_with("eq", "ec", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    rer = (
        cand.join(F.broadcast(qvec), "query_id")
        .join(corpus, "neighbor_id")
        .withColumn("cosine", dot / (F.col("nq") * F.col("nc")))
    )
    wk = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        rer.withColumn("rank", F.row_number().over(wk).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "hamming", "cosine", "rank")
    )


def bq_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    screen_m: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Binary-quantized ANN: screen by Hamming distance over 63-bit
    sign signatures (XOR + popcount — the 8-bytes-per-vector scan that
    is ~64x smaller and integer-speed vs the float corpus), keep the
    ``screen_m`` closest candidates per query, then EXACT-cosine rerank
    only those and emit top ``k``. This is the modern BQ serving
    pattern (e.g. 1-bit matryoshka-style compression): the float
    vectors are touched for screen_m rows per query, not the corpus.

    Everything is deterministic and engine-replayable: sign bits are
    exact, popcount is integer, ties break on neighbor id at both
    stages, and the rerank reuses the repo's sequential-fold dot
    product. Pigeonhole banding (hamming_join) is the right screen for
    SMALL radii; at the BQ regime (radius ~ dims/2) banding degenerates
    and the linear XOR scan IS the intended plan — that contrast is
    documented here deliberately.
    """
    sigs = emb.select(
        F.col(id_col).alias("neighbor_id"),
        bq_signature_expr(vec_col).alias("nsig"),
    )
    return _bq_screen_rerank(emb, queries, sigs, k, screen_m, id_col, vec_col)

def build_bq_index(
    emb: DataFrame,
    location: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the binary-quantization index: one (id, 63-bit sig) row
    per vector, parquet at ``location`` — 8 bytes of signature per
    vector, the index you keep hot while the float corpus stays cold.
    Rebuild cost is one scan (signatures are per-row maps); appends are
    plain parquet appends of newly signed batches."""
    emb.select(
        F.col(id_col).alias("vec_id"),
        bq_signature_expr(vec_col).alias("sig"),
    ).write.mode("overwrite").parquet(location)


def bq_index_topk(
    emb: DataFrame,
    location: str,
    queries: DataFrame,
    k: int = 5,
    screen_m: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Serve BQ ANN from the PERSISTED index: the Hamming screen scans
    the 8-byte/vector signature table from disk (never touching the
    float corpus), and only the screen_m survivors per query fetch
    their float vectors for the exact-cosine rerank. Identical results
    to the transient ``bq_topk`` (same signatures, same tie-breaks) —
    pinned by sharing its oracle."""
    spark = emb.sparkSession
    sigs = spark.read.parquet(location).select(
        F.col("vec_id").alias("neighbor_id"), F.col("sig").alias("nsig")
    )
    return _bq_screen_rerank(emb, queries, sigs, k, screen_m, id_col, vec_col)


def build_ivf_pq_index(
    emb: DataFrame,
    location: str,
    n_centroids: int = 16,
    m: int = 4,
    k_codes: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine_iters: int = 0,
):
    """Persist an IVF-PQ index AS TABLES — completing the index
    lifecycle set (LSH / IVF / BQ / now PQ): the transient
    ``ivf_pq_topk`` recomputes cell assignments AND PQ codes per query,
    which at 100 TB means re-encoding the corpus every probe. Here the
    m-small-int codes land in a ``PartitionedTable`` partitioned BY
    CELL (probing reads only ``nprobe`` partition directories of
    m ints per row — both IVF pruning and PQ compression hit the I/O
    path), the coarse centroids persist at ``_ivfpq_centroids``, and
    the PQ codebooks at ``_ivfpq_codebooks`` (subspace, codeword,
    components — metadata-sized).

    Same deterministic seeding as the transient path (centroids and
    codebooks from the first vectors by id), so a probe through the
    persisted index returns IDENTICAL rows to ``ivf_pq_topk`` on the
    same corpus — which is what lets the index path share its exact
    DuckDB oracle. Returns the codes ``PartitionedTable``.
    """
    from ..sources.partitioned import PartitionedTable

    spark = emb.sparkSession
    assigned, centroids = ivf_assign(
        emb, n_centroids, id_col, vec_col, refine_iters
    )
    codes, codebooks = pq_encode(emb, m, k_codes, dim, id_col, vec_col)
    data = codes.drop("e").join(assigned, id_col)
    pt = PartitionedTable(spark, location, "cell")
    pt.overwrite(data)
    centroids.write.mode("overwrite").parquet(
        location + "/_ivfpq_centroids"
    )
    cb_rows = [
        (j, c, list(map(float, cw)))
        for j, cb in enumerate(codebooks)
        for c, cw in enumerate(cb)
    ]
    spark.createDataFrame(
        cb_rows, "subspace int, codeword int, components array<double>"
    ).write.mode("overwrite").parquet(location + "/_ivfpq_codebooks")
    return pt


def _load_ivf_pq_sidecars(spark, location: str):
    """(centroids DataFrame, codebooks nested lists) from a persisted
    IVF-PQ index — codebooks are metadata-sized (m x k_codes x dim/m
    doubles), the same driver footprint as the transient encoder's."""
    centroids = spark.read.parquet(location + "/_ivfpq_centroids")
    cb = spark.read.parquet(location + "/_ivfpq_codebooks").collect()
    by_sub: dict = {}
    for r in cb:
        by_sub.setdefault(r["subspace"], {})[r["codeword"]] = list(
            r["components"]
        )
    codebooks = [
        [by_sub[j][c] for c in sorted(by_sub[j])] for j in sorted(by_sub)
    ]
    return centroids, codebooks


def ivf_pq_index_append(
    emb_batch: DataFrame,
    location: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Append a batch to a persisted IVF-PQ index: the batch is
    assigned against the STORED centroids and encoded against the
    STORED codebooks (re-encoding only the batch — never the corpus;
    the quantizers stay frozen, the FAISS ``add`` contract), then
    partition-scoped-upserted into the codes table — only the touched
    cells' directories rewrite. Returns the ``PartitionedTable``."""
    from ..sources.partitioned import PartitionedTable

    spark = emb_batch.sparkSession
    centroids, codebooks = _load_ivf_pq_sidecars(spark, location)
    e = _with_double_vec(emb_batch, id_col, vec_col)
    dist = F.aggregate(
        F.zip_with("e", "ce", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy(id_col).orderBy("dist", "cell")
    assigned = (
        e.crossJoin(F.broadcast(centroids))
        .withColumn("dist", dist)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(F.col(id_col), F.col("cell"))
    )
    data = (
        _pq_encode_with(e, codebooks, id_col)
        .drop("e")
        .join(assigned, id_col)
    )
    pt = PartitionedTable(spark, location, "cell")
    pt.upsert(data, [id_col], precombine_col=id_col)
    return pt


def ivf_pq_index_topk(
    emb: DataFrame,
    location: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Serve IVF-PQ ANN from the PERSISTED index: rank cells per query
    against the stored centroid codebook (broadcast), read ONLY the
    probed cells' partition directories of the codes table (m ints per
    candidate — the float corpus is never read at all; ADC scores
    against codebook reconstructions), and emit the asymmetric-distance
    top-k. Operation order mirrors ``ivf_pq_topk`` exactly, so results
    are identical row-for-row on the build corpus (pinned by sharing
    its oracle)."""
    from ..sources.partitioned import PartitionedTable

    spark = emb.sparkSession
    centroids, codebooks = _load_ivf_pq_sidecars(spark, location)
    qv = _with_double_vec(queries, id_col, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("e").alias("eq")
    )
    cdist = F.aggregate(
        F.zip_with("eq", "ce", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    wq = Window.partitionBy("query_id").orderBy("dist", "cell")
    probes = (
        qv.crossJoin(F.broadcast(centroids))
        .withColumn("dist", cdist)
        .withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= nprobe)
        .select("query_id", "cell")
    )
    # metadata-sized collect: the pruned partition set
    probe_cells = {
        str(r["cell"]) for r in probes.select("cell").distinct().collect()
    }
    pt = PartitionedTable(spark, location, "cell")
    data = pt.read_partitions_where(lambda v: v in probe_cells)
    corpus = data.select(
        F.col(id_col).alias("neighbor_id"),
        pq_reconstruct_expr(codebooks).alias("r"),
    )
    members = data.select(F.col(id_col).alias("neighbor_id"), "cell")
    cand = (
        F.broadcast(probes)
        .join(members, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    adc = F.aggregate(
        F.zip_with("eq", "r", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
    return (
        cand.join(F.broadcast(qv), "query_id")
        .join(corpus, "neighbor_id")
        .withColumn("adc_dist", adc)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc_dist", "rank")
    )
