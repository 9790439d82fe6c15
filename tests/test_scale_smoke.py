"""Million-document dedup scale smoke (VERDICT r5 task 8): turn the
100 TB design claims of the minhash→band→cap→verify pipeline into a
measured invariant on a synthetic 10^6-doc corpus generated INSIDE
Spark (spark.range + column expressions — no driver-side data, no
fixture).

Corpus design:
- ids [0, 5000): one identical boilerplate text — a degenerate LSH
  bucket of 5000 docs that MUST be dropped by a cap of 1000 (the
  O(b^2) blow-up guard);
- ids [5000, 105000): 50_000 planted exact-duplicate PAIRS
  (group = (id-5000)//2) — the signal the pipeline must keep;
- ids [105000, 10^6): unique documents — must produce (almost) no
  candidate pairs.

Invariants measured, not assumed:
- after cap_buckets, no bucket exceeds the cap;
- the pre-distinct join cardinality Σ sz·(sz-1)/2 over capped buckets
  is linear in the planted duplicates (≤ bands × planted + slack),
  NOT quadratic in the corpus;
- candidate pairs ≈ planted pairs, none touching the boilerplate ids;
- the Jaccard verify stage confirms every planted pair at 1.0.
"""

import time

from pyspark.sql import functions as F

from emr_on_eks_hudi_iceberg_delta_spark.operators.dedup import (
    lsh_band_buckets,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
)
from emr_on_eks_hudi_iceberg_delta_spark.operators.similarity import cap_buckets

N = 1_000_000
BOILER = 5_000
PAIRS = 50_000
CAP = 1_000
BANDS = 4
NUM_HASHES = 8


def _corpus(spark):
    return spark.range(N).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") < BOILER,
            F.lit("spam header spam footer spam body spam tail"),
        )
        .when(
            F.col("id") < BOILER + 2 * PAIRS,
            # every token embeds the full group id -> shingle sets of
            # different groups are DISJOINT (no accidental overlap noise)
            F.format_string(
                "p%d a%d b%d c%d",
                ((F.col("id") - BOILER) / 2).cast("long"),
                ((F.col("id") - BOILER) / 2).cast("long"),
                ((F.col("id") - BOILER) / 2).cast("long"),
                ((F.col("id") - BOILER) / 2).cast("long"),
            ),
        )
        .otherwise(
            F.format_string(
                "u%d d%d e%d z%d",
                F.col("id"),
                F.col("id"),
                F.col("id"),
                F.col("id"),
            )
        )
        .alias("text"),
    )


def test_million_doc_dedup_pipeline_bounds_and_finds_dups(spark):
    t0 = time.monotonic()
    docs = _corpus(spark)
    sigs = minhash_signatures(
        docs, num_hashes=NUM_HASHES
    ).persist()  # signatures feed both the stats pass and the pair join
    try:
        capped = cap_buckets(
            lsh_band_buckets(sigs, num_hashes=NUM_HASHES, bands=BANDS), CAP
        )
        stats = (
            capped.groupBy("band", "key")
            .agg(F.count(F.lit(1)).alias("sz"))
            .agg(
                F.max("sz").alias("max_sz"),
                F.sum(F.col("sz") * (F.col("sz") - 1) / 2).alias("join_card"),
            )
            .first()
        )
        # cap holds for every surviving bucket
        assert stats["max_sz"] <= CAP, stats
        # pre-distinct join cardinality is linear in planted dups:
        # each planted pair collides in ≤ BANDS buckets; unique docs sit
        # in singleton buckets contributing 0. Quadratic behavior (the
        # uncapped boilerplate bucket alone would add ~12.5M) fails this.
        assert stats["join_card"] <= BANDS * PAIRS + 10_000, stats

        pairs = lsh_candidate_pairs(
            sigs, num_hashes=NUM_HASHES, bands=BANDS, max_bucket_size=CAP
        ).persist()
        try:
            n_pairs = pairs.count()
            assert PAIRS <= n_pairs <= PAIRS + 500, n_pairs
            # the degenerate boilerplate bucket was dropped whole: its ids
            # appear in no candidate pair
            assert pairs.filter(F.col("id_a") < BOILER).count() == 0

            # verify stage: every planted pair is an exact dup (J = 1.0)
            verified = ngram_jaccard_pairs(docs, pairs, threshold=0.5)
            planted = verified.filter(
                (F.col("id_b") - F.col("id_a") == 1)
                & (F.col("id_a") >= BOILER)
                & (F.col("id_b") < BOILER + 2 * PAIRS)
                & (((F.col("id_a") - BOILER) % 2) == 0)
            )
            agg = planted.agg(
                F.count(F.lit(1)).alias("n"), F.min("jaccard").alias("jmin")
            ).first()
            assert agg["n"] == PAIRS, agg
            assert agg["jmin"] == 1.0, agg
        finally:
            pairs.unpersist()
    finally:
        sigs.unpersist()
    # the scale claim includes wall-clock: the full pipeline over 10^6
    # docs must finish well inside the 2-minute budget on this box
    assert time.monotonic() - t0 < 120, f"took {time.monotonic() - t0:.0f}s"


def test_ivf_ann_cost_fraction_and_recall_at_scale(spark):
    """ANN scale smoke: IVF's cost claim — each query exact-scores only
    its nprobe probed cells, ~nprobe/n_centroids of brute force — made a
    MEASURED invariant on a 10^5-vector corpus generated inside Spark.
    Deterministic synthetic embeddings (periodic, so they cluster), so
    the recall figure is a pinned measurement, not a flaky threshold."""
    from pyspark.sql import functions as F

    from emr_on_eks_hudi_iceberg_delta_spark.operators.similarity import (
        cosine_topk,
        ivf_assign,
        ivf_topk,
    )

    t0 = time.monotonic()
    NV, DIM, NC, NP, K = 100_000, 16, 32, 4, 5
    emb = spark.range(NV).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {DIM - 1}), j -> "
            "cast(sin(id * 0.7 + j * 1.3) + 0.2 * sin(id * 0.013 * (j+1)) "
            "as double))"
        ).alias("embedding"),
    ).persist()
    try:
        queries = emb.limit(5)

        # cost fraction: candidates scanned per query are EXACTLY the
        # probed cells' populations — measured from the same assignment
        # the operator uses, and bounded well under brute force
        assigned, _ = ivf_assign(emb, NC)
        sizes = {r["cell"]: r["n"] for r in assigned.groupBy("cell").agg(
            F.count(F.lit(1)).alias("n")).collect()}
        assert len(sizes) == NC
        worst_probe = sum(sorted(sizes.values(), reverse=True)[:NP])
        assert worst_probe <= 0.5 * NV, (
            f"probing {NP}/{NC} cells would scan {worst_probe}/{NV} — "
            "cell imbalance defeats the IVF cost model"
        )

        ivf = ivf_topk(emb, queries, k=K, n_centroids=NC, nprobe=NP).collect()
        exact = cosine_topk(emb, queries, k=K).collect()
        iset = {(r["query_id"], r["neighbor_id"]) for r in ivf}
        eset = {(r["query_id"], r["neighbor_id"]) for r in exact}
        assert len(eset) == 5 * K
        recall = len(iset & eset) / len(eset)
        # measured 1.0 on this deterministic corpus; 0.8 floor absorbs
        # float-order wobble across partition layouts
        assert recall >= 0.8, recall
    finally:
        emb.unpersist()
    assert time.monotonic() - t0 < 120, "ANN smoke exceeded 2-minute budget"


def test_zorder_file_skipping_effectiveness_measured(spark, tmp_path):
    """The Z-order claim, measured: on an unclustered table every file's
    min/max admits any range predicate (zero skipping); after
    OPTIMIZE ZORDER on (x, y), a range filter on EITHER dimension
    prunes a majority of files — while lexicographic cluster_by only
    serves its first column. Results stay exactly equal throughout."""
    from pyspark.sql import functions as F

    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import VersionedTable

    n_files = 16
    base = spark.range(100_000).select(
        (F.col("id") % 1000).alias("x"),
        ((F.col("id") * 7919) % 1000).alias("y"),
        F.col("id").alias("payload"),
    )
    vt = VersionedTable(spark, str(tmp_path / "vt_zorder"))
    # round-robin partitioning: every file spans the full x/y domain
    vt.overwrite(base.repartition(n_files))
    vt.compute_stats(["x", "y"])

    y_filter = [("y", ">=", 0), ("y", "<", 100)]
    x_filter = [("x", ">=", 900), ("x", "<", 1000)]
    expect_y = vt.read().filter("y >= 0 AND y < 100").count()
    expect_x = vt.read().filter("x >= 900 AND x < 1000").count()

    unclustered_y = len(vt.pruned_files(y_filter))
    assert unclustered_y == n_files  # no layout -> no skipping

    # compact() auto-refreshes the recorded stats columns on the new
    # layout (plus its own clustering columns) — no manual re-collect
    vt.compact(target_partitions=n_files, cluster_by=["x"])
    lex_x = len(vt.pruned_files(x_filter))
    lex_y = len(vt.pruned_files(y_filter))
    assert lex_x <= n_files // 4          # first column: strong skipping
    assert lex_y == n_files               # second column: none

    vt.compact(target_partitions=n_files, zorder_by=["x", "y"])
    z_x = len(vt.pruned_files(x_filter))
    z_y = len(vt.pruned_files(y_filter))
    assert z_x <= n_files // 2, z_x       # both dimensions skip
    assert z_y <= n_files // 2, z_y
    # and the skipping scan is still exactly correct
    assert vt.read_pruned(y_filter).count() == expect_y
    assert vt.read_pruned(x_filter).count() == expect_x


def test_bloom_prefilter_join_cuts_probe_at_scale(spark):
    """10^6-row probe vs 10^4-key build (0.4% selective): the Bloom
    prefilter must cut the probe side BEFORE its shuffle to within a
    small false-positive factor of the true matches, and the final
    result must exactly equal the plain join — measured, not assumed."""
    from emr_on_eks_hudi_iceberg_delta_spark.operators.scale import (
        bloom_prefilter_join,
    )

    n_probe, n_build = 1_000_000, 10_000
    probe = spark.range(n_probe).select(
        (F.col("id") % 250_000).alias("k"), F.col("id").alias("payload")
    )
    # build keys: a 4%-dense slice of the probe key space
    build = spark.range(n_build).select((F.col("id") * 25).alias("k"))

    bits = 1 << 17
    t0 = time.time()
    # survivors of ONLY the prefilter (exact join omitted): measures the
    # shuffle volume the full operator would exchange
    from pyspark.sql import functions as FF

    def _pos(col, seed):
        return FF.abs(FF.xxhash64(col, FF.lit(seed))) % bits

    positions = build.select(
        FF.explode(FF.array(_pos(FF.col("k"), 0), _pos(FF.col("k"), 1))).alias(
            "__pos"
        )
    ).distinct()
    surv = probe
    for s in range(2):
        surv = surv.join(
            FF.broadcast(positions), _pos(FF.col("k"), s) == FF.col("__pos"),
            "left_semi",
        )
    n_surv = surv.count()
    true_matches = probe.join(build, "k").count()
    # every true match survives; false positives stay under 3x the
    # 10^4/2^17-occupancy expectation (loose, deterministic seeds)
    n_true_keys = 4 * n_probe // 100
    assert n_surv >= n_true_keys
    assert n_surv <= n_probe // 3  # >:= 67% of the probe never shuffles
    got = bloom_prefilter_join(probe, build, "k").count()
    elapsed = time.time() - t0
    assert got == true_matches
    assert elapsed < 120, f"bloom scale smoke took {elapsed:.0f}s"


def test_semantic_dedup_scale_smoke(spark):
    """Round-7 task 7: SemDeDup's 100 TB claims measured at 10^5
    embeddings generated in-Spark. Invariants:
    - identical planted pairs land in ONE cell and the higher id drops;
    - coincidental drops ~ 0 (hash-random d=24 vectors: cross-group
      cosine > 0.95 has ~e^-27 probability per pair);
    - cell sizes stay near uniform (no degenerate cell), so the within-
      cell join cardinality Sigma sz*(sz-1)/2 — measured from the actual
      assignment, not assumed — is orders of magnitude below n^2/2.
    """
    import time as _t

    from emr_on_eks_hudi_iceberg_delta_spark.operators.dedup import (
        semantic_dedup,
    )

    n, pairs, dim, k = 100_000, 2_000, 24, 128
    t0 = _t.time()

    # corpus with CONTROLLED cluster structure (the production contract:
    # n_centroids sized to the data — a first version of this test used
    # hash-random vectors and MEASURED the resulting Voronoi skew of
    # random centroids: max-cell join cardinality 3.6x the uniform
    # expectation; the operator's docstring says to split such cells):
    # - ids [0, 128): exact 2-hot cluster centers 4*(e_i + e_j) with
    #   pairwise distance^2 >= 32 — ivf_assign seeds centroids from the
    #   first k vectors by id, so cells == planted clusters;
    # - ids [128, 4128): 2000 identical PAIRS (g = (id-128)//2), vector
    #   = center(g % 128) + noise(g);
    # - ids [4128, n): uniques, center(id % 128) + noise(id).
    # noise is TANGENTIAL (zero on the center's hot dims — radial noise
    # keeps points parallel to the center and a first draft measured 48
    # false near-dups from exactly that) and normalized to |n| = 2
    # (< dist/2 = 2.83, so assignment is provably exact). Same-cluster
    # non-identical cosine = (32 + n1.n2)/36 <= (32 + 4cos phi)/36 with
    # phi a random 22-dim angle: exceeding 0.99 needs cos phi > 0.91,
    # ~7e-9 per pair — expected false drops ~0. Planted pairs are
    # identical (cosine 1.0).
    ids = F.col("id")
    cluster = (
        F.when(ids < 128, ids)
        .when(ids < 128 + 2 * pairs, ((ids - 128) / 2).cast("long") % k)
        .otherwise(ids % k)
    )
    seed = (
        F.when(ids < 128, F.lit("center"))
        .when(
            ids < 128 + 2 * pairs,
            F.concat(F.lit("g"), ((ids - 128) / 2).cast("long").cast("string")),
        )
        .otherwise(F.concat(F.lit("u"), ids.cast("string")))
    )
    ci = cluster % dim
    cj = (ci + 1 + (cluster / dim).cast("long")) % dim

    hot = F.array(
        *[
            F.when((F.lit(d) == ci) | (F.lit(d) == cj), F.lit(4.0)).otherwise(
                F.lit(0.0)
            )
            for d in range(dim)
        ]
    )
    raw = F.array(
        *[
            F.when((F.lit(d) == ci) | (F.lit(d) == cj), F.lit(0.0)).otherwise(
                F.pmod(F.xxhash64(seed, F.lit(d)), F.lit(1001)).cast("double")
                / 1000.0
                - 0.5
            )
            for d in range(dim)
        ]
    )
    nrm = F.sqrt(
        F.aggregate(
            F.transform(raw, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
        )
    )
    scale = F.when(ids < 128, F.lit(0.0)).otherwise(2.0 / (nrm + F.lit(1e-12)))

    emb = spark.range(n).select(
        ids.alias("vec_id"),
        F.zip_with(hot, raw, lambda h, r: h + r * scale)
        .cast("array<float>")
        .alias("embedding"),
    )

    out = semantic_dedup(emb, n_centroids=k, threshold=0.99, persist=True)
    rows = out.select("vec_id", "cell", "is_kept").collect()
    kept = {r["vec_id"] for r in rows if r["is_kept"]}
    dropped = {r["vec_id"] for r in rows if not r["is_kept"]}
    assert len(rows) == n

    # every planted higher id dropped, every planted lower id kept
    planted_drops = {128 + 2 * g + 1 for g in range(pairs)}
    assert planted_drops <= dropped
    assert {128 + 2 * g for g in range(pairs)} <= kept
    # coincidental drops essentially zero
    assert len(dropped - planted_drops) <= 20

    # cell-size distribution: measured, bounded, and the implied join
    # cardinality is per-cell, not all-pairs
    sizes = [r["n"] for r in out.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n")).collect()]
    assert max(sizes) <= 10 * (n // k), f"degenerate cell: {max(sizes)}"
    join_pairs = sum(s * (s - 1) // 2 for s in sizes)
    allpairs = n * (n - 1) // 2
    assert join_pairs * 50 < allpairs, (
        f"join cardinality {join_pairs} not sublinear vs n^2 {allpairs}"
    )
    assert _t.time() - t0 < 240


def test_hard_negative_topk_scale_smoke(spark):
    """Round-7 task 7: hard-negative mining at 10^5 corpus / 32 queries —
    broadcast queries, ONE corpus scan, one window shuffle; results
    host-verified for one query against numpy brute force."""
    import time as _t

    import numpy as np

    from emr_on_eks_hudi_iceberg_delta_spark.operators.similarity import (
        hard_negative_topk,
    )
    from emr_on_eks_hudi_iceberg_delta_spark.plans import (
        broadcast_join_count,
        shuffle_count,
    )

    n, dim, n_labels, topk = 100_000, 16, 7, 5
    t0 = _t.time()
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                (
                    F.pmod(F.xxhash64(F.col("id"), F.lit(j)), F.lit(2001))
                    .cast("double")
                    / 1000.0
                    - 1.0
                )
                for j in range(dim)
            ]
        ).cast("array<float>").alias("embedding"),
        (F.col("id") % n_labels).alias("label"),
    )
    queries = emb.filter(F.col("vec_id") < 32)

    out = hard_negative_topk(emb, queries, k=topk)
    # plan shape: queries broadcast, bounded shuffles
    assert broadcast_join_count(out) >= 1
    assert shuffle_count(out) <= 2
    res = out.collect()
    assert len(res) == 32 * topk
    by_q = {}
    for r in res:
        assert r["query_label"] != r["neighbor_label"]
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(range(32))
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, topk + 1))
        cosines = [r["cosine"] for r in rs]
        assert cosines == sorted(cosines, reverse=True)

    # host-exact: query 0's top hard negative matches numpy brute force
    mat = np.array(
        [r["embedding"] for r in emb.select("embedding").orderBy("vec_id").collect()],
        dtype=np.float64,
    )
    labels = np.arange(n) % n_labels
    qv = mat[0]
    cos = (mat @ qv) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(qv))
    cos[labels == labels[0]] = -2.0  # exclude same-label (and self)
    best = int(np.argmax(cos))
    got = by_q[0][0]
    assert got["neighbor_id"] == best
    assert abs(got["cosine"] - cos[best]) < 1e-9
    assert _t.time() - t0 < 150


def test_sequential_fold_engine_million_events(spark):
    """Round-7: the constant-memory streaming fold at 10^6 events —
    10^4 uniform keys plus ONE key carrying 5x10^5 events (the hot-key
    profile that OOMed the r6 collect_list design). Host-exact on a
    sampled uniform key AND on the full hot key; totals conserved;
    bounded wall-clock."""
    import time as _t

    from emr_on_eks_hudi_iceberg_delta_spark.operators.sequence import (
        cusum_scores,
    )

    n, n_keys, hot_key = 1_000_000, 10_000, 777_777
    t0 = _t.time()
    ev = spark.range(n).select(
        F.when(F.col("id") < n // 2, F.col("id") % n_keys)
        .otherwise(F.lit(hot_key))
        .alias("user_id"),
        F.expr(
            "timestampadd(SECOND, id, TIMESTAMP_NTZ '2024-01-01 00:00:00')"
        ).alias("ts"),
        F.col("id").alias("event_id"),
        (F.pmod(F.col("id") * 97 + 13, F.lit(131)).cast("double")).alias("value"),
    )
    out = cusum_scores(ev, latched=True)
    rows = {r["user_id"]: r for r in out.collect()}
    elapsed = _t.time() - t0

    assert len(rows) == n_keys + 1
    assert sum(r["n_events"] for r in rows.values()) == n
    assert rows[hot_key]["n_events"] == n // 2

    def host(ids):
        s, smax = 0.0, 0.0
        for i in ids:
            s = s + float((i * 97 + 13) % 131) - 55.0
            if s < 0.0:
                s = 0.0
            if s > smax:
                smax = s
        return s, smax

    s42, m42 = host(range(42, n // 2, n_keys))
    assert rows[42]["cusum_final"] == s42
    assert rows[42]["cusum_max"] == m42
    sh, mh = host(range(n // 2, n))
    assert rows[hot_key]["cusum_final"] == sh
    assert rows[hot_key]["cusum_max"] == mh
    assert elapsed < 240, f"{elapsed:.0f}s"


def test_interval_overlap_join_fanout_is_bounded(spark):
    """The binned overlap join's measured cost model: exploded row count
    is rows x (interval_len/bin + 1) — never |L| x |R| — and the output
    needs no dedup (first-shared-bin rule), pinned at 10^5 intervals."""
    from pyspark.sql import functions as F

    from emr_on_eks_hudi_iceberg_delta_spark.operators.temporal import (
        interval_overlap_join,
    )

    n = 100_000
    # 2-hour intervals on an hourly bin grid -> exactly 2 or 3 bins each
    base = spark.range(n).select(
        (F.col("id") % 50).alias("key"),
        F.col("id").alias("lid"),
        F.timestamp_seconds(1700000000 + F.col("id") * 7).alias("ls"),
        F.timestamp_seconds(1700000000 + F.col("id") * 7 + 7200).alias("le"),
    )
    right = base.select(
        "key",
        F.col("lid").alias("rid"),
        F.col("ls").alias("rs"),
        F.col("le").alias("re"),
    )
    us = 3_600_000_000
    exploded = base.select(
        F.col("ls"),
        F.explode(
            F.sequence(
                (F.unix_micros(F.col("ls")) / us).cast("bigint"),
                ((F.unix_micros(F.col("le")) - 1) / us).cast("bigint"),
            )
        ).alias("b"),
    ).count()
    assert n * 2 <= exploded <= n * 3  # fan-out = len/bin + boundary, not n^2
    out = interval_overlap_join(
        base, right, ["key"], "ls", "le", "rs", "re"
    ).select("lid", "rid")
    total = out.count()
    distinct = out.distinct().count()
    assert total == distinct  # first-shared-bin: duplicate-free without dedup
    assert total >= n  # every interval at least overlaps its own twin


def test_hamming_join_candidate_cardinality_at_scale(spark):
    """hamming_join's 100 TB claim, measured at 2*10^5 x 2*10^4
    signatures: the banded equi-join's candidate cardinality is
    sum-over-(band,value) |L_bv| x |R_bv| — five orders below the cross
    product — and the join returns exactly the planted near-dups.

    Left: 2*10^5 random 60-bit md5 signatures. Right: 2*10^4
    candidates derived from lefts 0..19999 by flipping (id % 4)
    contiguous bits (distances 0..3; threshold 2 keeps id % 4 <= 2).
    """
    from emr_on_eks_hudi_iceberg_delta_spark.functions.hashing import (
        md5_hash64,
    )
    from emr_on_eks_hudi_iceberg_delta_spark.operators.dedup import (
        hamming_join,
    )

    n_l, n_r = 200_000, 20_000
    left = spark.range(n_l).select(
        F.col("id").alias("lid"),
        md5_hash64(F.concat(F.lit("hs:"), F.col("id").cast("string"))).alias(
            "sig"
        ),
    )
    right = spark.range(n_r).select(
        (F.col("id") + 10_000_000).alias("rid"),
        md5_hash64(F.concat(F.lit("hs:"), F.col("id").cast("string")))
        .bitwiseXOR(
            F.expr(
                "shiftleft(cast(shiftleft(1L, cast(id % 4 as int)) - 1 "
                "as bigint), cast(id % 57 as int))"
            )
        )
        .alias("csig"),
    )

    # measured candidate cardinality of the 3-band (20-bit) equi-join
    def bands(df, sig):
        return df.select(
            F.posexplode(
                F.array(
                    *[
                        F.shiftrightunsigned(F.col(sig), j * 20).bitwiseAND(
                            F.lit((1 << 20) - 1)
                        )
                        for j in range(3)
                    ]
                )
            ).alias("bidx", "bval")
        )

    lc = bands(left, "sig").groupBy("bidx", "bval").count()
    rc = bands(right, "csig").groupBy("bidx", "bval").count()
    cand = (
        lc.join(rc.withColumnRenamed("count", "rn"), ["bidx", "bval"])
        .agg(F.sum(F.col("count") * F.col("rn")))
        .collect()[0][0]
    )
    cross = n_l * n_r
    # planted collisions (~20k) + random 20-bit band collisions
    # (3 * |L||R| / 2^20 ~ 11k) — must sit 5 orders below the cross product
    assert cand < cross / 10_000, f"candidates {cand} vs cross {cross}"

    t0 = time.time()
    got = hamming_join(
        left, right, "lid", "sig", "rid", "csig", max_distance=2,
        sig_bits=60,
    )
    matched = got.filter(F.col("rid") - 10_000_000 == F.col("lid"))
    n_planted = matched.count()
    elapsed = time.time() - t0
    # ids with id % 4 in {0,1,2} -> 15000 planted pairs within threshold
    assert n_planted == 15_000
    assert elapsed < 90, f"banded join took {elapsed:.1f}s"


def test_reconcile_tables_at_scale(spark):
    """reconcile_tables at 10^6 rows: the changeset is exactly the
    planted drift (1000 updates, 500 deletes, 500 spurious inserts) and
    the full-outer join's inputs are digest-width, not payload-width
    (plan-checked: the wide payload column never crosses the
    aggregate)."""
    from emr_on_eks_hudi_iceberg_delta_spark.operators.validate import (
        reconcile_tables,
    )

    n = 1_000_000
    src = spark.range(n).select(
        F.col("id").alias("k"),
        F.concat(F.lit("payload-"), F.repeat(F.lit("x"), 100),
                 F.col("id").cast("string")).alias("v"),
    )
    tgt = (
        spark.range(n)
        .filter(F.col("id") % 2000 != 7)  # 500 deletes
        .select(
            F.col("id").alias("k"),
            F.concat(
                F.lit("payload-"), F.repeat(F.lit("x"), 100),
                F.when(F.col("id") % 1000 == 3, F.lit("MUTATED"))
                .otherwise(F.col("id").cast("string")),
            ).alias("v"),
        )
        .unionAll(
            spark.range(500).select(
                (F.col("id") + 10_000_000).alias("k"),
                F.lit("spurious").alias("v"),
            )
        )
    )
    t0 = time.time()
    diff = reconcile_tables(src, tgt, ["k"], ["v"])
    counts = {
        r["change_type"]: r["n"]
        for r in diff.groupBy("change_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    elapsed = time.time() - t0
    # id%2000==7 deletes overlap id%1000==3 mutations never (7 != 3 mod 1000)
    assert counts == {"insert": 500, "delete": 500, "update": 1000}, counts
    assert elapsed < 120, f"reconcile took {elapsed:.1f}s"
    # digest-width shuffle: the payload column is consumed by the hash
    # inside the partial aggregate — it must not appear in the join keys
    plan = diff._jdf.queryExecution().executedPlan().toString()
    assert "src_sum" in plan and "tgt_sum" in plan


def test_salted_join_flattens_hot_key_partitions_measured(spark):
    """Salting's 100 TB claim, MEASURED: with AQE's skew splitter off,
    a 50%-hot key funnels half the probe side through one shuffle
    partition, while salted_join spreads it across the salt buckets —
    per-partition row counts of the joined output prove it. Result
    equality to the plain join is asserted on the same data."""
    n = 400_000
    probe = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit(1))
        .otherwise(F.col("id") % 1000)
        .alias("k"),
        F.col("id").alias("payload"),
    )
    build = spark.range(1000).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("dim")
    )

    from emr_on_eks_hudi_iceberg_delta_spark.operators.scale import (
        salted_join,
    )

    def partition_rows(df):
        return df.rdd.mapPartitions(
            lambda it: [sum(1 for _ in it)]
        ).collect()

    aqe_before = spark.conf.get("spark.sql.adaptive.enabled")
    auto_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        # force a shuffle join — a broadcast join has no skewed exchange
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plain = probe.join(build, "k")
        salted = salted_join(probe, build, "k", salt_buckets=32)
        p_rows = partition_rows(plain)
        s_rows = partition_rows(salted)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", auto_bc)

    hot = n // 2
    assert max(p_rows) >= hot  # the hot key IS one partition unsalted
    # balance ratio (max/mean): the unsalted hot partition dominates its
    # peers; salted partitions each hold a handful of the 32 salt groups,
    # so the ratio collapses toward uniform (binomial wobble allowed)
    p_ratio = max(p_rows) / (sum(p_rows) / len(p_rows))
    s_ratio = max(s_rows) / (sum(s_rows) / len(s_rows))
    assert p_ratio >= 3, (p_rows,)
    assert s_ratio < 2, (s_rows,)
    assert max(s_rows) < max(p_rows) / 2
    assert sum(p_rows) == sum(s_rows) == plain.count()


def test_dv_delete_scale_smoke(spark, tmp_path):
    """Deletion vectors at 2x10^5 rows / 2x10^4 deleted positions:
    the whole MoR delete cycle (position scan, roaring serialization,
    descriptor commit, anti-join read) measured end-to-end, plus the
    codec alone at 10^6 indexes — the driver-side cost the design
    claims is 'bitmap-sized' has to actually behave like one."""
    from emr_on_eks_hudi_iceberg_delta_spark.sources import (
        DeltaLogTable,
        roaring,
    )

    n = 200_000
    dt = DeltaLogTable(spark, str(tmp_path / "dvscale"))
    dt.overwrite(
        spark.range(n)
        .selectExpr("id AS k", "id % 100 AS g")
        .repartition(8)
    )
    t0 = time.time()
    rep = dt.delete("g < 10", mode="dv")
    dv_delete_sec = time.time() - t0
    assert rep["rows_deleted"] == n // 10
    t0 = time.time()
    assert dt.read().count() == n - n // 10
    dv_read_sec = time.time() - t0
    # the bitmaps on disk are KB-scale for 20k scattered positions
    live, _, _ = dt._replay()
    total_dv_bytes = sum(
        a["deletionVector"]["sizeInBytes"]
        for a in live.values()
        if a.get("deletionVector")
    )
    assert total_dv_bytes < 600_000, total_dv_bytes
    # codec alone: 10^6 indexes round-trip in interactive time
    idx = list(range(0, 2_000_000, 2))
    t0 = time.time()
    blob = roaring.serialize(idx)
    assert roaring.deserialize(blob) == idx
    codec_sec = time.time() - t0
    assert codec_sec < 30, codec_sec
    assert len(blob) < 4_000_000, len(blob)
    print(
        f"dv_delete={dv_delete_sec:.1f}s read={dv_read_sec:.1f}s "
        f"codec_1M={codec_sec:.1f}s dv_bytes={total_dv_bytes}"
    )


def test_million_row_dv_delete_executor_side(spark, tmp_path):
    """r10: a DELETE matching 10^6 rows builds its deletion vectors
    entirely executor-side — the driver holds only per-file
    descriptors. 4x10^6-row table, every 4th row deleted, then a
    second overlapping delete to exercise the executor-side prior-DV
    merge, then an exact read-back."""
    from emr_on_eks_hudi_iceberg_delta_spark.sources import DeltaLogTable

    n = 4_000_000
    dt = DeltaLogTable(spark, str(tmp_path / "dvmillion"))
    dt.overwrite(
        spark.range(n).selectExpr("id AS k", "id % 4 AS g").repartition(16)
    )
    t0 = time.time()
    rep = dt.delete("g = 0", mode="dv")
    del1_sec = time.time() - t0
    assert rep["rows_deleted"] == n // 4
    assert rep["files_touched"] == 16
    # overlapping second delete: workers merge the existing bitmaps
    rep2 = dt.delete("k < 1000000", mode="dv")
    assert rep2["rows_deleted"] == 750_000  # g=0 rows already gone
    t0 = time.time()
    assert dt.read().count() == n - 1_000_000 - 750_000
    read_sec = time.time() - t0
    # commit metadata stays O(files): 16 descriptors, each bitmap-sized
    live, _, _ = dt._replay()
    descs = [a["deletionVector"] for a in live.values()
             if a.get("deletionVector")]
    assert len(descs) == 16
    assert sum(d["cardinality"] for d in descs) == 1_750_000
    print(f"dv_1M_delete={del1_sec:.1f}s read={read_sec:.1f}s")


def test_million_row_iceberg_delete_executor_side(spark, tmp_path):
    """r10: an Iceberg MoR DELETE matching 10^6 rows writes its
    position-delete parquets executor-side; driver holds descriptors
    only. Exercises prior-delete carry too."""
    from emr_on_eks_hudi_iceberg_delta_spark.sources import IcebergTable

    n = 4_000_000
    t = IcebergTable(spark, str(tmp_path / "icemillion"))
    t.overwrite(
        spark.range(n).selectExpr("id AS k", "id % 4 AS g").repartition(16)
    )
    t0 = time.time()
    rep = t.delete("g = 0")
    del_sec = time.time() - t0
    assert rep["rows_deleted"] == n // 4
    rep2 = t.delete("k < 1000000")
    assert rep2["rows_deleted"] == 750_000
    t0 = time.time()
    assert t.read().count() == n - 1_750_000
    read_sec = time.time() - t0
    dels = t._live_delete_files()
    assert sum(d["record_count"] for d in dels) == 1_750_000
    print(f"ice_1M_delete={del_sec:.1f}s read={read_sec:.1f}s "
          f"delete_files={len(dels)}")


def test_iceberg_streaming_upsert_scale_smoke(spark, tmp_path):
    """r10: the one-snapshot equality-delete upsert at 2x10^6 base
    rows / 2x10^5-row batch — write cost must be O(batch): no
    pre-existing data file is read or rewritten, and the read after
    converges to latest-per-key."""
    from emr_on_eks_hudi_iceberg_delta_spark.sources import IcebergTable

    n = 2_000_000
    t = IcebergTable(spark, str(tmp_path / "upscale"))
    t.overwrite(
        spark.range(n).selectExpr("id AS k", "0 AS gen").repartition(8)
    )
    files0 = {e["data_file"]["file_path"] for e in t._entries()}
    batch = spark.range(0, 200_000).selectExpr("id * 10 AS k", "1 AS gen")
    t0 = time.time()
    rep = t.upsert_by_key(batch, ["k"])
    up_sec = time.time() - t0
    assert rep["keys"] == 200_000
    assert files0 <= {
        e["data_file"]["file_path"] for e in t._entries()
    }
    t0 = time.time()
    assert t.read().count() == n  # keys 0..1999990 step10 replaced
    read_sec = time.time() - t0
    assert t.read().filter("gen = 1").count() == 200_000
    print(f"ice_upsert={up_sec:.1f}s read={read_sec:.1f}s")


def test_hidden_partition_million_rows(spark, tmp_path):
    """r10 tranche 4: hidden partitioning at 10^6 rows — the murmur3
    bucket + day-ordinal write projections run as JVM expressions
    inside the write's own job, and a source-predicate read prunes to
    a strict file subset before scheduling anything."""
    import datetime as dt

    from emr_on_eks_hudi_iceberg_delta_spark.sources import IcebergTable

    n = 1_000_000
    df = spark.range(n).selectExpr(
        "id",
        "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id % 864000) AS ts",
        "CAST(id % 1000 AS BIGINT) AS uid",
    )
    t = IcebergTable(spark, str(tmp_path / "hidden1m"))
    t0 = time.time()
    t.append(df, partition_by=["day(ts)", "bucket(8, uid)"])
    write_sec = time.time() - t0
    total_files = len(t.read().inputFiles())
    t0 = time.time()
    pruned = t.read_hidden(
        [
            ("ts", ">=", dt.datetime(2024, 1, 3)),
            ("ts", "<", dt.datetime(2024, 1, 5)),
            ("uid", "=", 7),
        ]
    )
    got = pruned.count()
    read_sec = time.time() - t0
    n_files = len(pruned.inputFiles())
    # 2 of 10 days x 1 of 8 buckets: ~1/40 of the files
    assert 0 < n_files <= total_files // 8
    assert got == df.filter(
        "ts >= timestamp'2024-01-03' AND ts < timestamp'2024-01-05' "
        "AND uid = 7"
    ).count()
    print(
        f"hidden_1M write={write_sec:.1f}s pruned_read={read_sec:.1f}s "
        f"files={n_files}/{total_files}"
    )


def test_identity_allocation_million_rows(spark, tmp_path):
    """r10 tranche 4: identity allocation at 10^6 rows across 32
    partitions — the count pass collects O(partitions) ints, values
    come out dense and unique, and the watermark lands in the same
    commit."""
    from emr_on_eks_hudi_iceberg_delta_spark.sources import DeltaLogTable
    from emr_on_eks_hudi_iceberg_delta_spark.sources.delta_gen import (
        identity_cols,
    )

    n = 1_000_000
    df = spark.range(n).selectExpr("CAST(id AS STRING) AS name").repartition(32)
    t = DeltaLogTable(spark, str(tmp_path / "id1m"))
    t0 = time.time()
    t.overwrite_identity(df, identity={"rid": {}})
    write_sec = time.time() - t0
    agg = t.read().selectExpr(
        "count(*) AS n", "count(DISTINCT rid) AS d",
        "min(rid) AS lo", "max(rid) AS hi",
    ).first()
    assert (agg["n"], agg["d"], agg["lo"], agg["hi"]) == (n, n, 1, n)
    _, meta, _ = t._replay()
    assert identity_cols(meta)["rid"]["highWaterMark"] == n
    print(f"identity_1M write={write_sec:.1f}s")
