"""Deduplication operators for training-data pipelines.

Exact dedup, MinHash+LSH near-dup, n-gram Jaccard verification, SimHash —
each designed for the 100 TB regime:

* exact dedup is one hash-groupBy (single shuffle on the digest);
* MinHash signatures are per-row maps (no shuffle); LSH banding turns the
  O(n^2) pair problem into a shuffle on band keys, so cost is driven by
  bucket sizes, not corpus size;
* Jaccard verification runs only on LSH candidate pairs;
* SimHash is a vectorized Arrow/pandas UDF (the one operator where 64-bit
  bit-twiddling beats nested SQL).

Hashes are md5-derived (functions/hashing.py) so Spark results hash-match
the DuckDB oracles exactly; swap in ``F.xxhash64`` for raw speed when
cross-engine reproducibility is not required.
"""

from __future__ import annotations

import hashlib
import os

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import shingle_expr
from .similarity import DEFAULT_MAX_BUCKET_SIZE
from .text import tokens_expr


def _ensure_parallelism(df: DataFrame) -> DataFrame:
    """Per-row-heavy operators (md5 shingling, signatures) need all cores
    even when the input is one small parquet file (single split). At scale
    input splits >> cores and this is a no-op; locally it trades one tiny
    shuffle for full parallelism."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def exact_dedup(df: DataFrame, content_cols: list[str], id_col: str) -> DataFrame:
    """Exact dedup: group by content digest, keep the lowest id as the
    canonical row. Returns (digest, keep_id, dup_count)."""
    digest = F.md5(F.concat_ws("\x1f", *content_cols))
    return (
        df.withColumn("digest", digest)
        .groupBy("digest")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").cast("bigint").alias("dup_count"),
        )
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash signature per document: token ``shingle_n``-gram shingles,
    ``num_hashes`` seeded min-hashes as columns h0..h{k-1}.

    Pure column expressions (split -> transform/slice shingles -> array_min
    over seeded hashes): per-row map, scan-speed, no shuffle. Documents with
    fewer than ``shingle_n`` tokens are dropped (no signature).
    """
    df = _ensure_parallelism(df)
    df = df.withColumn("__tokens", tokens_expr(text_col)).filter(
        F.size("__tokens") >= shingle_n
    )
    df = df.withColumn("__shingles", shingle_expr("__tokens", shingle_n))
    # Carter-Wegman family: two md5-derived base hashes per shingle, then
    # h_i = (a + i*b) mod p — 2 md5 calls per shingle instead of num_hashes.
    # p = 2^31-1 keeps a + i*b well inside int64.
    p = (1 << 31) - 1
    df = df.withColumn(
        "__ab",
        F.expr(
            "transform(__shingles, s -> struct("
            f"cast(conv(substr(md5(s), 1, 15), 16, 10) as bigint) % {p} as a, "
            f"cast(conv(substr(md5(concat('b:', s)), 1, 15), 16, 10) as bigint) % {p} as b))"
        ),
    )
    for i in range(num_hashes):
        df = df.withColumn(
            f"h{i}",
            F.array_min(F.expr(f"transform(__ab, x -> (x.a + {i} * x.b) % {p})")),
        )
    return df.select(id_col, *[f"h{i}" for i in range(num_hashes)])


def lsh_band_buckets(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
) -> DataFrame:
    """Band-bucket rows (id, band, key) from a MinHash signature frame:
    the signature splits into ``bands`` bands of ``num_hashes/bands``
    hashes, each digested to a bucket key. Pure per-row map (explode of a
    literal-size array) — the shared front half of the self-join and
    cross-corpus LSH paths."""
    rows_per_band = num_hashes // bands
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws("_", *cols)).alias("key"))
        )
    return signatures.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
) -> DataFrame:
    """LSH banding: split the signature into ``bands`` bands, bucket by the
    band digest, emit distinct candidate pairs (a < b) sharing any bucket.

    The explode+self-join shuffles on (band index, band digest) — this is
    the step that makes near-dup detection sub-quadratic at 100 TB. Skew
    in the *shuffle* is handled by AQE skew-join, but a degenerate bucket
    (boilerplate corpus: thousands of identical band digests) still
    produces O(b^2) pairs inside one bucket — buckets above
    ``max_bucket_size`` are dropped (similarity.cap_buckets; oversized
    buckets carry near-zero dedup signal, and similarity.lsh_bucket_stats
    reports what a cap drops).
    """
    from .similarity import cap_buckets

    buckets = cap_buckets(
        lsh_band_buckets(signatures, id_col, num_hashes, bands), max_bucket_size
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


def ngram_jaccard_pairs(
    df: DataFrame,
    candidates: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard verification over candidate pairs: the
    verify stage after LSH. Returns (id_a, id_b, jaccard) above threshold.

    Shingle sets are small relative to documents, so the pair join carries
    only (id, shingle_set) — broadcast-able when the candidate set is small.
    """
    shingles = (
        df.withColumn("__tokens", tokens_expr(text_col))
        .filter(F.size("__tokens") >= shingle_n)
        .select(
            F.col(id_col),
            F.array_distinct(shingle_expr("__tokens", shingle_n)).alias("sh"),
        )
    )
    j = (
        candidates.join(
            shingles.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a")),
            "id_a",
        )
        .join(
            shingles.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b")),
            "id_b",
        )
        .withColumn("__inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.col("__inter")
            / (F.size("sh_a") + F.size("sh_b") - F.col("__inter")),
        )
    )
    return j.filter(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64
) -> DataFrame:
    """SimHash document fingerprints via a vectorized Arrow UDF.

    Per token: a stable 64-bit hash (md5-derived, matching
    functions/hashing.py); per document: sign of the per-bit weighted sum.
    Near-dups differ in few bits (Hamming distance). mapInPandas keeps the
    Python hop Arrow-batched; deterministic across runs and partitionings.

    The batch body is numpy-vectorized (measured 7× over the former
    per-row loop at 10k docs / 540k tokens, and the gap widens with batch
    size): md5 runs once per *distinct* token per batch (hash-based
    ``pd.factorize`` dedup — no object-array sort), the ±1 bit expansion is
    bit-sliced via ``np.unpackbits`` on the gathered 64-bit hashes (T×64
    **uint8**, the only token-sized matrix), and per-document accumulation
    is one ``np.add.reduceat`` over doc boundaries — no per-row/per-token/
    per-bit Python loop and O(tokens) memory regardless of vocabulary size.
    The digest math is unchanged, so the DuckDB oracle is unaffected.
    """
    import numpy as np

    out_schema = f"{id_col} bigint, simhash bigint"

    def compute(batches):
        weights = np.uint64(1) << np.arange(bits, dtype=np.uint64)
        for pdf in batches:
            n = len(pdf)
            token_lists = [str(t).split() for t in pdf[text_col]]
            counts = np.fromiter((len(t) for t in token_lists), dtype=np.int64, count=n)
            flat = [tok for toks in token_lists for tok in toks]
            acc = np.zeros((n, bits), dtype=np.int64)
            if flat:
                inv, uniq = pd.factorize(np.asarray(flat, dtype=object), sort=False)
                hv = np.fromiter(
                    (
                        int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
                        for t in uniq
                    ),
                    dtype=np.uint64,
                    count=len(uniq),
                )
                # bit-slice the per-token hashes: T x 64 uint8 of h's bits
                # (little-endian view => column j == bit j of the uint64)
                bits01 = np.unpackbits(
                    hv[inv].view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
                )
                ends = np.cumsum(counts)
                starts = ends - counts
                nz = counts > 0
                # reduceat over non-empty docs only: empty docs contribute
                # no rows, so consecutive non-empty starts bound each doc
                S0 = np.add.reduceat(bits01, starts[nz], axis=0, dtype=np.int64)
                S64 = np.zeros((n, 64), dtype=np.int64)
                S64[nz] = S0
                S = S64[:, np.arange(bits) % 60]  # acc bit b uses (h >> (b % 60)) & 1
                acc = 2 * S - counts[:, None]  # (+1 per set bit, -1 per clear)
            sig_u = ((acc > 0).astype(np.uint64) * weights[None, :]).sum(
                axis=1, dtype=np.uint64
            )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "simhash": sig_u.view(np.int64),  # two's-complement int64
                }
            )

    return df.select(id_col, text_col).mapInPandas(compute, schema=out_schema)


def embedding_near_dup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.35,
) -> DataFrame:
    """Exact embedding near-dup: all pairs with cosine >= threshold.

    Brute-force O(n^2) — the correctness baseline. The scale path is
    similarity.lsh_ann_pairs (random-hyperplane bucketing). Cosine is
    decomposed as dot/(sqrt(dot_aa)*sqrt(dot_bb)) with left-to-right double
    folds, bit-identical to the DuckDB oracle's list_dot_product.
    """
    from .similarity import _with_double_vec

    e = _with_double_vec(emb, id_col, vec_col)
    a = e.select(F.col(id_col).alias("id_a"), F.col("e").alias("ea"), F.col("nrm").alias("na"))
    b = e.select(F.col(id_col).alias("id_b"), F.col("e").alias("eb"), F.col("nrm").alias("nb"))
    dot = F.aggregate(
        F.zip_with("ea", "eb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    pairs = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", dot / (F.col("na") * F.col("nb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
    return pairs


def connected_components(
    pairs: DataFrame, all_ids: DataFrame, id_col: str, max_iters: int = 50
) -> DataFrame:
    """Connected components over near-dup pairs by iterative min-label
    propagation: every node repeatedly adopts the minimum label among
    itself and its neighbors until fixpoint. Returns (id, component) where
    component = the cluster's minimum id — the EXACT canonicalization that
    ``dedup_keep_canonical``'s single pass approximates (that pass keeps
    every local minimum; this keeps one representative per transitive
    cluster).

    Scale shape: one shuffle per iteration (join on the edge key), and
    iterations = graph diameter — near-dup clusters are shallow (dozens of
    hops at worst), so this converges in a handful of rounds at 100 TB.
    ``localCheckpoint`` truncates the growing loop lineage each round; the
    convergence check is one count per round. (GraphFrames' alternating
    large-star/small-star halves the rounds; plain propagation keeps this
    dependency-free.)
    """
    edges = pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    und = edges.union(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    labels = all_ids.select(F.col(id_col).alias("id"), F.col(id_col).alias("label"))
    for _ in range(max_iters):
        neighbor_min = (
            und.join(labels, und.a == labels.id)
            .groupBy(und.b.alias("nid"))
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == F.col("nid"), "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias(
                    "label"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("id").alias(id_col), F.col("label").alias("component"))


def dedup_keep_canonical(pairs: DataFrame, all_ids: DataFrame, id_col: str) -> DataFrame:
    """Given near-dup pairs (id_a < id_b), drop every id that appears as the
    higher member of a pair — single-pass canonicalization (the lowest id of
    each dup cluster survives; transitive chains collapse to their min via
    repeated application or a connected-components pass for exactness)."""
    dropped = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return all_ids.join(dropped, id_col, "left_anti")


def dedup_against_corpus(
    new_batch: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
) -> DataFrame:
    """Incremental dedup: filter a NEW ingestion batch against an EXISTING
    corpus — the shape continuous corpus building actually runs (the
    historical corpus is never re-deduplicated; each batch is screened
    against it). Ids must be distinct across the two inputs.

    Two screens, same find->verify discipline as the batch pipeline:

    1. exact: the batch row's content digest already exists in the corpus
       (anti-join on md5(text) — one shuffle on the digest);
    2. near: an LSH candidate pairing with ANY corpus doc verifies at
       n-gram Jaccard >= ``threshold``. Buckets are computed over the
       union (so the cap sees true bucket sizes) but only NEW x OLD pairs
       are generated and verified — within-batch and within-corpus pairs
       are other operators' jobs.

    Returns the surviving new-batch rows, all columns intact.

    Scale: corpus-side signatures/digests are O(corpus) per batch as
    written; a production loop persists them once (they are pure per-row
    maps, so the stored form is identical) and the per-batch cost drops to
    O(batch + matched buckets) — the plumbing here is unchanged either
    way. The bucket join shuffles on (band, key); the verify stage touches
    candidates only.
    """
    from .similarity import cap_buckets

    dg = F.md5(F.col(text_col))
    old_digests = corpus.select(dg.alias("__dg")).distinct()
    bn = lsh_band_buckets(
        minhash_signatures(new_batch, text_col, id_col, num_hashes, shingle_n),
        id_col, num_hashes, bands,
    ).withColumn("__side", F.lit("new"))
    bo = lsh_band_buckets(
        minhash_signatures(corpus, text_col, id_col, num_hashes, shingle_n),
        id_col, num_hashes, bands,
    ).withColumn("__side", F.lit("old"))
    buckets = cap_buckets(bn.unionByName(bo), max_bucket_size)
    pairs = (
        buckets.filter(F.col("__side") == "new")
        .select(F.col(id_col).alias("id_a"), "band", "key")
        .join(
            buckets.filter(F.col("__side") == "old").select(
                F.col(id_col).alias("id_b"), "band", "key"
            ),
            ["band", "key"],
        )
        .select("id_a", "id_b")
        .distinct()
    )
    near = ngram_jaccard_pairs(
        new_batch.unionByName(corpus), pairs, text_col, id_col, shingle_n, threshold
    )
    near_ids = near.select(F.col("id_a").alias(id_col)).distinct()
    return (
        new_batch.withColumn("__dg", dg)
        .join(old_digests, "__dg", "left_anti")
        .drop("__dg")
        .join(near_ids, id_col, "left_anti")
    )


def cross_source_duplication(
    df: DataFrame,
    slice_col: str = "source",
    text_col: str = "text",
    fingerprint=None,
) -> DataFrame:
    """Inter-source exact-duplication matrix: for every ordered source
    pair (a, b), how many of a's documents have a byte-identical twin in
    b — the corpus-curation diagnostic for "which feeds re-host which"
    (and, on the diagonal, each source's internal duplication). Rates are
    per-document, duplicates counted with multiplicity on the a side.
    ``fingerprint`` overrides the identity criterion (default exact
    ``md5(text)``): pass e.g. an n-token-prefix fingerprint to catch
    templated boilerplate that varies only in its tail.

    Diagonal semantics: a document counts as self-source-duplicated only
    when its source holds at least one OTHER copy (n >= 2).

    Scale: one hash aggregate on (digest, source) collapses the corpus to
    distinct-digest granularity BEFORE the digest self-join — the join
    touches one row per (digest, source), never per document, so exact-dup
    clusters cost their distinct size. One more shuffle on the digest for
    the join; the output is |sources|^2 rows. The closing rate division is
    the single IEEE op (same exactness convention as the corpus operators).
    """
    fp = F.md5(F.col(text_col)) if fingerprint is None else fingerprint
    d = df.select(F.col(slice_col).alias("src"), fp.alias("__dg"))
    per = d.groupBy("__dg", "src").agg(F.count(F.lit(1)).alias("n"))
    totals = d.groupBy("src").agg(F.count(F.lit(1)).alias("total_docs"))
    a = per.select(
        F.col("__dg"), F.col("src").alias("src_a"), F.col("n").alias("n_a")
    )
    b = per.select(
        F.col("__dg"), F.col("src").alias("src_b"), F.col("n").alias("n_b")
    )
    pairs = a.join(b, "__dg").filter(
        (F.col("src_a") != F.col("src_b")) | (F.col("n_a") >= 2)
    )
    matrix = pairs.groupBy("src_a", "src_b").agg(
        F.sum("n_a").alias("dup_docs")
    )
    return matrix.join(
        F.broadcast(totals.withColumnRenamed("src", "src_a")), "src_a"
    ).select(
        "src_a",
        "src_b",
        "dup_docs",
        "total_docs",
        (
            F.col("dup_docs").cast("double") / F.col("total_docs").cast("double")
        ).alias("dup_rate"),
    )


def semantic_dedup(
    emb: DataFrame,
    n_centroids: int = 16,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    persist: bool = False,
    assign: str = "window",
    max_cell_size: int | None = None,
) -> DataFrame:
    """Embedding-space semantic deduplication (the SemDeDup recipe,
    Abbas et al. 2023, arXiv:2303.09540): cluster the corpus with a
    coarse quantizer, then WITHIN each cluster drop every vector that has
    a higher-cosine-than-``threshold`` neighbor with a lower id — near-
    duplicate *meanings* (paraphrases, re-crawls with template changes)
    that no lexical dedup (MinHash/SimHash) can see, caught at
    O(cluster^2) instead of O(corpus^2) pairwise cost.

    Keep rule: lowest id per semantic neighborhood survives ("keep first"
    — deterministic, and id order is ingestion order so the earliest copy
    wins, the same canonical-keep convention as ``keep_canonical``).
    Returns (id, cell, is_kept) for every vector, so callers can either
    filter to kept rows or audit the drop rate per cluster.

    Determinism/oracle: clusters come from ``ivf_assign`` at
    refine_iters=0 (seed centroids = first ``n_centroids`` vectors by
    id), cosine uses the sequential-fold convention — the whole pipeline
    replays exactly in SQL, like the IVF/LSH/PQ oracles.

    Scale: one shuffle on the cell key; the within-cell self-join is
    quadratic in CLUSTER size, which n_centroids controls (production:
    size n_centroids ~ corpus/1000). ``max_cell_size`` ENFORCES the cap
    (the ``cap_buckets`` discipline, implemented rather than advised):
    cells over the cap are geometrically subdivided (a second IVF level
    with per-cell seed centroids, ceil(size/cap) sub-cells each), and
    any cell STILL over the cap — a cluster the quantizer cannot
    separate — is hash-split on the vector bytes. Identical vectors hash
    together, so EXACT duplicates always stay co-bucketed; near- (not
    identical-) dup recall inside such degenerate cells is the
    documented trade (identical-heavy cells are exact dedup's job — run
    ``dedup_exact`` first). Only (id, cell, vector-norm) rows shuffle
    beyond the scan. In one lazy plan the assignment subtree is
    referenced THREE times (both self-join sides + the final output),
    and Catalyst does not reuse the exchange — ``persist=True`` caches
    the assigned relation so the IVF window runs once (the same knob as
    ``tfidf_top_terms(persist_tf=...)``); at production scale always
    set it. With ``max_cell_size`` the assignment is persisted
    unconditionally (the subdivision pass re-reads it).
    """
    from .similarity import ivf_assign, ivf_assign_blas

    # assign="blas" swaps the clustering pass for the zero-shuffle gemm
    # path (ivf_assign_blas) — the production choice; the default window
    # path keeps exact SQL-oracle replay
    assigned, _ = (
        ivf_assign_blas(emb, n_centroids, id_col, vec_col)
        if assign == "blas"
        else ivf_assign(emb, n_centroids, id_col, vec_col)
    )
    if persist or max_cell_size:
        assigned = assigned.persist()
    if max_cell_size:
        assigned = _subdivide_cells(
            emb, assigned, int(max_cell_size), id_col, vec_col
        ).persist()
    e = F.col(vec_col).cast("array<double>")
    nrm = F.sqrt(
        F.aggregate(
            F.transform(e, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )
    vecs = emb.select(F.col(id_col), e.alias("v"), nrm.alias("nrm")).join(
        assigned, id_col
    )
    a = vecs.select(
        F.col("cell"),
        F.col(id_col).alias("id_a"),
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = vecs.select(
        F.col("cell"),
        F.col(id_col).alias("id_b"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # a lower-id neighbor above the threshold marks id_b as a duplicate
    dropped = (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", dot / (F.col("na") * F.col("nb")))
        .filter(F.col("cosine") > threshold)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return (
        vecs.select(id_col, "cell")
        .join(dropped.withColumn("__drop", F.lit(1)), id_col, "left")
        .select(
            id_col,
            "cell",
            F.col("__drop").isNull().alias("is_kept"),
        )
    )


def _subdivide_cells(
    emb: DataFrame,
    assigned: DataFrame,
    cap: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Enforce ``semantic_dedup``'s cell cap: cells over ``cap`` get a
    SECOND IVF level (per-cell deterministic seeds = the cell's first
    ceil(size/cap) members by id, L2 argmin assignment), and any
    sub-cell still over the cap — a direction the quantizer cannot
    separate — is hash-split on the raw vector (identical vectors hash
    together, so exact duplicates never separate). Returns (id, cell)
    with STRING cell keys (``"<cell>"``, ``"<cell>/<sub>"``, or
    ``"<cell>/<sub>#<h>"``).

    Scale: the oversized-cell list is driver-side but bounded by
    n_centroids; the seed broadcast is (sub-cells x dim) — size the cap
    and n_centroids so that stays broadcastable (the same sizing rule
    as IVF codebooks)."""
    sizes = assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("__sz"))
    big = [r["cell"] for r in sizes.filter(F.col("__sz") > cap).collect()]
    base = assigned.select(
        F.col(id_col), F.col("cell").cast("string").alias("cell")
    )
    if not big:
        return base

    members = (
        assigned.filter(F.col("cell").isin(big))
        .join(
            emb.select(
                F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
            ),
            id_col,
        )
        .join(F.broadcast(sizes), "cell")
        .withColumn("__m", F.ceil(F.col("__sz") / F.lit(cap)).cast("int"))
    )
    w = Window.partitionBy("cell").orderBy(id_col)
    seeds = (
        members.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= F.col("__m"))
        .select(
            "cell",
            (F.col("__rk") - 1).alias("__sub"),
            F.col("__v").alias("__cv"),
        )
    )
    d2 = F.aggregate(
        F.zip_with("__v", "__cv", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    aw = Window.partitionBy(id_col).orderBy(
        F.col("__d2").asc(), F.col("__sub").asc()
    )
    sub1 = (
        members.join(F.broadcast(seeds), "cell")
        .withColumn("__d2", d2)
        .withColumn("__r", F.row_number().over(aw))
        .filter(F.col("__r") == 1)
        .select(
            F.col(id_col),
            F.concat(
                F.col("cell").cast("string"), F.lit("/"), F.col("__sub")
            ).alias("cell2"),
            "__v",
        )
    )
    sizes2 = sub1.groupBy("cell2").agg(F.count(F.lit(1)).alias("__sz2"))
    splits = sizes2.filter(F.col("__sz2") > cap).withColumn(
        "__ns", F.ceil(F.col("__sz2") / F.lit(cap)).cast("bigint")
    )
    final_big = (
        sub1.join(F.broadcast(splits.select("cell2", "__ns")), "cell2", "left")
        .select(
            F.col(id_col),
            F.when(F.col("__ns").isNull(), F.col("cell2"))
            .otherwise(
                F.concat(
                    F.col("cell2"),
                    F.lit("#"),
                    F.pmod(F.xxhash64("__v"), F.col("__ns")),
                )
            )
            .alias("cell"),
        )
    )
    return base.filter(~F.col("cell").isin([str(c) for c in big])).unionByName(
        final_big
    )


def fuzzy_match_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_distance: int = 2,
    block_expr: str | None = None,
    exclude_identical: bool = False,
    max_block_size: int | None = None,
) -> DataFrame:
    """Edit-distance entity resolution with blocking: candidate pairs
    share a blocking key (default: the first whitespace token) and are
    verified by Levenshtein distance ≤ ``max_distance`` — the classic
    blocked fuzzy-match/dedup recipe (record linkage, product matching,
    near-identical title collapse).

    ``exclude_identical=True`` drops exact-equal strings (distance 0),
    leaving true NEAR matches — the dedup-review view.

    Scale: the self-join shuffles both sides on the blocking key only;
    Levenshtein (quadratic per pair) runs as a residual on candidates,
    never all-pairs. Block sizing is the operator's contract, exactly as
    in LSH (``cap_buckets``) — and ``max_block_size`` now ENFORCES it:
    blocks above the cap drop whole before the self-join (the hot-bucket
    guard; a dropped block is the signal to pick a finer
    ``block_expr``). Both engines implement classic Levenshtein, so
    results are exactly replayable.
    """
    blk = (
        F.expr(block_expr)
        if block_expr is not None
        else F.split_part(F.col(text_col), F.lit(" "), F.lit(1))
    )
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(text_col).alias("text_a"),
        blk.alias("__blk"),
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(text_col).alias("text_b"),
        blk.alias("__blk"),
    )
    if max_block_size is not None:
        # the cap_buckets discipline applied to blocking keys: a
        # degenerate block (every record sharing one leading token)
        # causes the same O(b^2) blow-up as a hot LSH bucket — capped
        # blocks drop WHOLE (they carry little linkage signal; pick a
        # finer block_expr to recover them), and the window count rides
        # the block exchange the self-join needs anyway
        from .similarity import cap_buckets

        a = cap_buckets(a, max_block_size, keys=("__blk",))
        b = cap_buckets(b, max_block_size, keys=("__blk",))
    pairs = a.join(b, "__blk").filter(F.col("id_a") < F.col("id_b"))
    if exclude_identical:
        pairs = pairs.filter(F.col("text_a") != F.col("text_b"))
    return (
        pairs.withColumn(
            "distance", F.levenshtein(F.col("text_a"), F.col("text_b"))
        )
        .filter(F.col("distance") <= int(max_distance))
        .select("id_a", "id_b", "text_a", "text_b", "distance")
    )


def levenshtein_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_text: str,
    right_id: str,
    right_text: str,
    max_distance: int,
) -> DataFrame:
    """LOSSLESS edit-distance ε-join via length banding — the exact
    counterpart to ``fuzzy_match_pairs``: blocking on a leading token
    trades recall for speed (a pair whose first word differs is simply
    lost), while the length band is a TRUE Levenshtein invariant —
    ``|len(a) − len(b)| <= d`` for every pair within distance ``d`` —
    so banding prunes with ZERO false negatives.

    Plan shape: each left row replicates to the ``2d+1`` lengths its
    matches can have (``explode(sequence(len−d, len+d))``), the right
    side keys by its actual length, and the candidate space becomes a
    plain EQUI-join on the band — shuffle-partitionable, broadcastable,
    AQE-skew-splittable — instead of the O(|L|·|R|) nested-loop cross
    join a naive ``levenshtein(a,b) <= d`` theta-join plans as. The
    quadratic-per-pair Levenshtein runs only on band survivors. Fan-out
    is a fixed ``2d+1`` factor (d is 1-3 in linkage practice), and at
    100 TB the band key composes with any equality blocking key the
    caller bakes into ``left_text``/``right_text`` upstream.

    Returns ``(left_id, right_id, left_text, right_text, distance)``
    aliased to the given column names — exactly the pairs the cross-join
    definition yields, which is what the oracle replays.
    """
    d = int(max_distance)
    lo = left.select(
        F.col(left_id).alias("__lid"),
        F.col(left_text).alias("__ltext"),
        F.explode(
            F.sequence(
                F.greatest(F.length(left_text) - d, F.lit(0)),
                F.length(left_text) + d,
            )
        ).alias("__band"),
    )
    ro = right.select(
        F.col(right_id).alias("__rid"),
        F.col(right_text).alias("__rtext"),
        F.length(right_text).alias("__band"),
    )
    return (
        lo.join(ro, "__band")
        .withColumn(
            "distance", F.levenshtein(F.col("__ltext"), F.col("__rtext"))
        )
        .filter(F.col("distance") <= d)
        .select(
            F.col("__lid").alias(left_id),
            F.col("__rid").alias(right_id),
            F.col("__ltext").alias(left_text),
            F.col("__rtext").alias(right_text),
            "distance",
        )
    )


def build_lsh_index(
    corpus: DataFrame,
    location: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_n: int = 3,
    bands: int = 4,
):
    """Persist the corpus's dedup state as a ``VersionedTable`` — the
    production loop ``dedup_incremental_batch``'s docstring promises:
    signatures/digests are pure per-row maps, so their stored form is
    identical to recomputation, and persisting them drops the per-batch
    cost from O(corpus + batch) to O(batch + matched buckets).

    One row per (doc, band): ``(doc_id, band, key)``; the exact-dup
    screen rides along as ``band = -1`` rows whose key is the full-text
    md5 digest. LSH parameters are recorded as table properties and
    validated on query — a batch hashed under different parameters
    joins garbage, so mismatches refuse loudly. Index maintenance is
    table maintenance: ``append`` surviving batches' rows (see
    ``lsh_index_append``), vacuum/compact/time-travel for free.
    """
    from ..sources.tables import VersionedTable

    sig = minhash_signatures(corpus, text_col, id_col, num_hashes, shingle_n)
    band_rows = lsh_band_buckets(sig, id_col, num_hashes, bands)
    digest_rows = corpus.select(
        F.col(id_col),
        F.lit(-1).alias("band"),
        F.md5(F.col(text_col)).alias("key"),
    )
    vt = VersionedTable(corpus.sparkSession, location)
    vt.overwrite(band_rows.unionByName(digest_rows))
    for k, v in (
        ("lsh.num_hashes", num_hashes),
        ("lsh.shingle_n", shingle_n),
        ("lsh.bands", bands),
        ("lsh.text_col", text_col),
        ("lsh.id_col", id_col),
    ):
        vt.set_property(k, str(v))
    return vt


def _lsh_index_params(vt) -> tuple[str, str, int, int, int]:
    p = vt.properties()
    try:
        return (
            p["lsh.text_col"],
            p["lsh.id_col"],
            int(p["lsh.num_hashes"]),
            int(p["lsh.shingle_n"]),
            int(p["lsh.bands"]),
        )
    except KeyError as e:
        raise ValueError(
            f"{vt.location} is not an LSH index (missing property {e})"
        ) from None


def lsh_index_dedup_batch(
    vt,
    new_batch: DataFrame,
    corpus_text: DataFrame | None = None,
    threshold: float = 0.7,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
) -> DataFrame:
    """Screen ``new_batch`` against a PERSISTED LSH index
    (``build_lsh_index``) — the daily-ingest flavor of
    ``dedup_incremental_batch`` whose corpus-side work is an index READ,
    not a recompute. Same two screens, same semantics:

    1. exact — batch digests semi-join the index's ``band = -1`` rows;
    2. near — batch band keys join the index's band rows (bucket cap
       over the union, NEW x OLD pairs only); candidates verify at
       n-gram Jaccard >= ``threshold`` against ``corpus_text`` (the
       docs table holding the corpus text — the index stores hashes,
       not text; omit it to skip verification and treat every LSH
       candidate as a duplicate, the recall-maximal screen).

    Returns surviving batch rows, all columns intact.
    """
    from .similarity import cap_buckets

    text_col, id_col, num_hashes, shingle_n, bands = _lsh_index_params(vt)
    idx = vt.read()
    old_digests = (
        idx.filter(F.col("band") == -1).select(F.col("key").alias("__dg")).distinct()
    )
    bn = lsh_band_buckets(
        minhash_signatures(new_batch, text_col, id_col, num_hashes, shingle_n),
        id_col, num_hashes, bands,
    ).withColumn("__side", F.lit("new"))
    bo = idx.filter(F.col("band") >= 0).withColumn("__side", F.lit("old"))
    buckets = cap_buckets(bn.unionByName(bo), max_bucket_size)
    pairs = (
        buckets.filter(F.col("__side") == "new")
        .select(F.col(id_col).alias("id_a"), "band", "key")
        .join(
            buckets.filter(F.col("__side") == "old").select(
                F.col(id_col).alias("id_b"), "band", "key"
            ),
            ["band", "key"],
        )
        .select("id_a", "id_b")
        .distinct()
    )
    if corpus_text is not None:
        near = ngram_jaccard_pairs(
            new_batch.unionByName(corpus_text),
            pairs, text_col, id_col, shingle_n, threshold,
        )
        near_ids = near.select(F.col("id_a").alias(id_col)).distinct()
    else:
        near_ids = pairs.select(F.col("id_a").alias(id_col)).distinct()
    dg = F.md5(F.col(text_col))
    return (
        new_batch.withColumn("__dg", dg)
        .join(old_digests, "__dg", "left_anti")
        .drop("__dg")
        .join(near_ids, id_col, "left_anti")
    )


def lsh_index_append(vt, accepted_batch: DataFrame) -> None:
    """Fold an ACCEPTED batch into the persisted index (one table
    append of its band + digest rows) — after this commit the next
    batch dedups against yesterday-plus-today. The index evolves by
    table commits: history shows every ingest, time travel replays any
    day's screen."""
    text_col, id_col, num_hashes, shingle_n, bands = _lsh_index_params(vt)
    sig = minhash_signatures(
        accepted_batch, text_col, id_col, num_hashes, shingle_n
    )
    band_rows = lsh_band_buckets(sig, id_col, num_hashes, bands)
    digest_rows = accepted_batch.select(
        F.col(id_col),
        F.lit(-1).alias("band"),
        F.md5(F.col(text_col)).alias("key"),
    )
    vt.append(band_rows.unionByName(digest_rows))


def boilerplate_span_scrub(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    min_docs: int = 3,
) -> DataFrame:
    """Span-level boilerplate removal — the CCNet/RefinedWeb
    line-level-dedup step re-expressed for token streams (the corpus has
    no newline structure, so the unit is the n-token span): any n-gram
    appearing in >= ``min_docs`` DISTINCT documents is boilerplate
    (headers, navigation chrome, legal footers), and every token covered
    by an occurrence of a boilerplate n-gram is scrubbed from its
    document. Unlike document-level dedup this cleans text INSIDE kept
    documents — the complement of novelty_scores' signal.

    Returns ``(id, clean_text, n_removed)`` for EVERY input document
    (fully-scrubbed docs return ``clean_text = ''``); surviving tokens
    keep their original order.

    Exactness: whitespace tokenization, integer document frequencies, a
    set union of covered positions, order-preserving reassembly — every
    step replays in SQL, so the oracle is exact.

    Scale: one shingle-keyed aggregate for document frequency (map-side
    combine; the shingle universe, not the corpus, bounds state), one
    semi-join back on the shingle to find occurrences (boilerplate rows
    only), one distinct on covered (doc, position) pairs, one doc-keyed
    reassembly — the novelty_scores cost family, no pair enumeration.
    The boilerplate table is vocabulary-sized and broadcastable when
    small; position explosion is bounded by n x boilerplate occurrences,
    not corpus size.
    """
    from ..functions.hashing import shingle_expr as _shingle

    n = int(shingle_n)
    toks = df.select(F.col(id_col), tokens_expr(text_col).alias("__toks"))
    sh = toks.select(
        F.col(id_col),
        F.posexplode(_shingle("__toks", n)).alias("__p0", "__s"),
    )
    dfreq = (
        sh.select("__s", id_col)
        .distinct()
        .groupBy("__s")
        .agg(F.count(F.lit(1)).alias("__df"))
    )
    boiler = dfreq.filter(F.col("__df") >= int(min_docs)).select("__s")
    covered = (
        sh.join(boiler, "__s")
        .select(
            F.col(id_col),
            F.explode(
                F.sequence(F.col("__p0") + 1, F.col("__p0") + n)
            ).alias("__pos"),
        )
        .distinct()
        .withColumn("__rm", F.lit(1))
    )
    pos = toks.select(
        F.col(id_col),
        F.posexplode("__toks").alias("__pos0", "__t"),
    ).select(
        F.col(id_col), (F.col("__pos0") + 1).alias("__pos"), "__t"
    )
    flagged = pos.join(covered, [id_col, "__pos"], "left")
    kept_arr = F.transform(
        F.filter(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("__pos").alias("p"),
                        F.col("__t").alias("t"),
                        F.col("__rm").alias("rm"),
                    )
                )
            ),
            lambda x: x["rm"].isNull(),
        ),
        lambda x: x["t"],
    )
    return flagged.groupBy(id_col).agg(
        F.array_join(kept_arr, " ").alias("clean_text"),
        F.sum(F.when(F.col("__rm").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_removed"),
    )


def hamming_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_sig: str,
    right_id: str,
    right_sig: str,
    max_distance: int,
    sig_bits: int = 60,
    bands: int | None = None,
) -> DataFrame:
    """LOSSLESS Hamming ε-join over fixed-width bit signatures (SimHash
    fingerprints, perceptual hashes, binary embeddings) via pigeonhole
    banding: split the ``sig_bits``-bit signature into ``b >= r+1``
    disjoint bands — any pair within Hamming distance ``r`` has at most
    ``r`` differing bits, so at least one band is bit-identical and the
    pair MUST meet on that band's equi-key. Zero false negatives, unlike
    probabilistic LSH banding (minhash_lsh_pairs) where a near-dup pair
    can lose every band lottery.

    Plan shape: each side fans out to its ``b`` ``(band_idx,
    band_value)`` keys (posexplode of a computed array — fixed b-way
    fan-out, codegen-side), the candidate space is a plain equi-join on
    that composite key, and the exact ``bit_count(l XOR r) <= r``
    predicate runs only on band survivors. Pairs that agree on several
    bands are emitted ONCE by the first-shared-band rule — a post-join
    filter on the two signatures (for every earlier band j < idx:
    band_j(l) != band_j(r)) — so no ``distinct`` shuffle is ever
    needed; the join's output is already duplicate-free. At 100 TB the
    composite key is shuffle-partitionable / AQE-skew-splittable, and a
    degenerate band value (e.g. the all-zeros band of sparse
    signatures) is exactly the skew AQE splits.

    Signatures must be non-negative and fit in ``sig_bits`` bits
    (md5_hash64 emits 60). Returns ``(left_id, right_id, distance)``.
    """
    r = int(max_distance)
    b = int(bands) if bands is not None else r + 1
    if b < r + 1:
        raise ValueError(
            f"bands={b} cannot be lossless for max_distance={r}: "
            f"pigeonhole needs at least r+1={r + 1} bands"
        )
    width = -(-sig_bits // b)  # ceil

    def band(col: str, j: int) -> Column:
        lo = j * width
        w = min(width, sig_bits - lo)
        return F.shiftrightunsigned(F.col(col), lo).bitwiseAND(
            F.lit((1 << w) - 1)
        )

    lo = left.select(
        F.col(left_id).alias("__lid"),
        F.col(left_sig).alias("__lsig"),
        F.posexplode(F.array(*[band(left_sig, j) for j in range(b)])).alias(
            "__bidx", "__bval"
        ),
    )
    ro = right.select(
        F.col(right_id).alias("__rid"),
        F.col(right_sig).alias("__rsig"),
        F.posexplode(F.array(*[band(right_sig, j) for j in range(b)])).alias(
            "__bidx", "__bval"
        ),
    )
    joined = lo.join(ro, ["__bidx", "__bval"])
    # first-shared-band dedup: band __bidx is the smallest agreeing band
    first_shared = F.lit(True)
    for j in range(b - 1):
        first_shared = first_shared & (
            (F.col("__bidx") <= j) | (band("__lsig", j) != band("__rsig", j))
        )
    return (
        joined.filter(first_shared)
        .withColumn(
            "distance",
            F.bit_count(F.col("__lsig").bitwiseXOR(F.col("__rsig"))).cast(
                "int"
            ),
        )
        .filter(F.col("distance") <= r)
        .select(
            F.col("__lid").alias(left_id),
            F.col("__rid").alias(right_id),
            "distance",
        )
    )


def containment_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_text: str,
    right_id: str,
    right_text: str,
    shingle_n: int = 3,
    min_containment: float = 0.9,
    max_shingle_df: int | None = 50,
) -> DataFrame:
    """Asymmetric CONTAINMENT join: pairs where
    ``|shingles(L) ∩ shingles(R)| / |shingles(L)| >= min_containment``
    — the quote/snippet/superset detector. This is the near-dup class
    Jaccard-based MinHash structurally misses: a 30-token quote inside
    a 3000-token article has Jaccard ~0.01 but containment 1.0, and
    quoted/excerpted training text is exactly how benchmark
    contamination hides.

    Candidate generation is the inverted shingle join: explode DISTINCT
    shingles on both sides, equi-join on the shingle, count
    intersections per pair. ``max_shingle_df`` drops shingles whose
    RIGHT-side document frequency exceeds the cap before the join —
    the boilerplate guard (a shingle in 10^5 documents generates 10^5
    fan-out and zero evidence). The df filter is part of the operator's
    SEMANTICS (intersections count only capped shingles), so results
    stay deterministic and oracle-replayable; a pair sharing ONLY
    boilerplate shingles is reported at its capped containment, the
    documented trade (set ``max_shingle_df=None`` for literal
    containment).

    Scale: one shingle-level equi-join (the cap bounds per-shingle
    fan-out, same discipline as LSH bucket caps), one (L,R) pair
    aggregate, one broadcastable |shingles(L)| join, one closing IEEE
    division. Never |L| x |R|.

    r13 (guide §2.4): the FILTERED left shingle set feeds two
    consumers (|shingles(L)| and the intersection join) — previously
    the whole left derivation (scan + tokenize + shingle + df join)
    ran once per consumer; a lazy localCheckpoint materializes it
    once, the same idiom already applied to the right side. Measured
    1.81 -> 1.66 s at sf0.1, identical rows. (An eager checkpoint +
    count-gated broadcast of the left side was tried and REJECTED:
    the serial count job cost more than the removed exchange saves —
    AQE already converts the intersection SMJ from runtime shuffle
    sizes when the left side is small.)
    """
    def shingles(df: DataFrame, id_col: str, text_col: str, out: str):
        return (
            df.withColumn("__tokens", tokens_expr(text_col))
            .select(
                F.col(id_col).alias(out),
                F.explode(
                    F.array_distinct(shingle_expr("__tokens", shingle_n))
                ).alias("__sh"),
            )
        )

    ls = shingles(left, left_id, left_text, "__lid")
    rs = shingles(right, right_id, right_text, "__rid")
    if max_shingle_df is not None:
        # the right-side shingle explode (the expensive full-corpus
        # pass) feeds BOTH the df census and the candidate join — a
        # lazy localCheckpoint materializes it once (~35% faster at
        # sf0.1, identical rows); df_ok likewise feeds two joins
        rs = rs.localCheckpoint(eager=False)
        df_ok = (
            rs.groupBy("__sh")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") <= int(max_shingle_df))
            .select("__sh")
        ).localCheckpoint(eager=False)
        rs = rs.join(df_ok, "__sh")
        ls = ls.join(df_ok, "__sh")
    # materialize the filtered left shingles once — they feed lsize
    # AND the intersection join
    ls = ls.localCheckpoint(eager=False)
    lsize = ls.groupBy("__lid").agg(
        F.count(F.lit(1)).cast("bigint").alias("__lsz")
    )
    inter = (
        ls.join(rs, "__sh")
        .groupBy("__lid", "__rid")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__inter"))
    )
    return (
        inter.join(lsize, "__lid")
        .withColumn(
            "containment",
            F.col("__inter").cast("double") / F.col("__lsz").cast("double"),
        )
        .filter(F.col("containment") >= float(min_containment))
        .select(
            F.col("__lid").alias(left_id),
            F.col("__rid").alias(right_id),
            F.col("__inter").alias("n_shared"),
            F.col("__lsz").alias("n_left"),
            "containment",
        )
    )