

def test_lsh_index_two_day_loop(spark, tmp_path):
    """The daily-ingest loop: build the index from day-0 corpus, screen
    day-1 (equivalence with the recompute path), fold accepted rows in,
    then screen day-2 — an exact day-1 duplicate must now be caught by
    the UPDATED index, not just the original corpus."""
    import pytest
    from pyspark.sql import functions as F

    from emr_on_eks_hudi_iceberg_delta_spark.operators.dedup import (
        build_lsh_index,
        dedup_against_corpus,
        lsh_index_append,
        lsh_index_dedup_batch,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    day1 = docs.filter(F.col("doc_id") % 3 == 0)

    vt = build_lsh_index(corpus, str(tmp_path / "lsh_idx"))
    got = lsh_index_dedup_batch(vt, day1, corpus_text=corpus, threshold=0.5)
    want = dedup_against_corpus(day1, corpus)
    assert sorted(r["doc_id"] for r in got.collect()) == sorted(
        r["doc_id"] for r in want.collect()
    )

    # fold day-1 survivors in; day-2 re-ingests one surviving day-1 doc
    survivors = got
    lsh_index_append(vt, survivors)
    one = survivors.limit(1).collect()[0]
    day2 = spark.createDataFrame(
        [(999999, one["text"], one["lang"], one["source"], one["n_chars"])],
        docs.schema,
    )
    kept = lsh_index_dedup_batch(vt, day2, corpus_text=None)
    assert kept.count() == 0  # exact digest now IN the index

    # parameter mismatch refuses loudly
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import (
        VersionedTable,
    )

    plain = VersionedTable(spark, str(tmp_path / "not_an_index"))
    plain.overwrite(spark.range(3).select("id"))
    with pytest.raises(ValueError, match="not an LSH index"):
        lsh_index_dedup_batch(plain, day2)


def test_boilerplate_span_scrub_hand_example(spark):
    """Sliding-window scrub: a 3-gram shared by >= 3 docs is cut at ANY
    offset (including straddling what a 4-block splitter would keep);
    unique text survives in order; a fully-boilerplate doc returns ''."""
    from emr_on_eks_hudi_iceberg_delta_spark.operators.dedup import (
        boilerplate_span_scrub,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta legal foot er gamma"),
            (2, "x legal foot er y z"),
            (3, "legal foot er"),
            (4, "unique words only here now"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in boilerplate_span_scrub(
            docs, shingle_n=3, min_docs=3
        ).collect()
    }
    # 'legal foot er' appears in 3 docs -> boilerplate; covered tokens
    # scrubbed wherever they sit (offsets 3, 2, 1 respectively)
    assert out[1] == ("alpha beta gamma", 3)
    assert out[2] == ("x y z", 3)
    assert out[3] == ("", 3)          # fully scrubbed doc still present
    assert out[4] == ("unique words only here now", 0)


def test_semantic_dedup_max_cell_size_enforced(spark):
    """max_cell_size: an oversized cell (all 600 vectors in one coarse
    cell) is geometrically subdivided and, where geometry cannot
    separate, hash-split - final cells near the cap, planted IDENTICAL
    pairs always stay co-bucketed (identical vectors hash together) and
    still dedup."""
    from pyspark.sql import functions as F

    from emr_on_eks_hudi_iceberg_delta_spark.operators.dedup import (
        semantic_dedup,
    )

    n, pairs, dim, cap = 600, 50, 8, 100

    def vec(seed):
        return F.array(
            *[
                (
                    F.pmod(F.xxhash64(seed, F.lit(j)), F.lit(2001))
                    .cast("double")
                    / 1000.0
                    - 1.0
                )
                for j in range(dim)
            ]
        )

    ids = F.col("id")
    seed = F.when(
        ids < 2 * pairs,
        F.concat(F.lit("g"), (ids / 2).cast("long").cast("string")),
    ).otherwise(F.concat(F.lit("u"), ids.cast("string")))
    emb = spark.range(n).select(
        ids.alias("vec_id"), vec(seed).alias("embedding")
    )

    out = semantic_dedup(
        emb, n_centroids=1, threshold=0.999, max_cell_size=cap
    )
    rows = out.collect()
    assert len(rows) == n
    cell_of = {r["vec_id"]: r["cell"] for r in rows}
    dropped = {r["vec_id"] for r in rows if not r["is_kept"]}

    # identical pairs never separate, and the higher id drops
    for g in range(pairs):
        assert cell_of[2 * g] == cell_of[2 * g + 1], g
        assert 2 * g + 1 in dropped, g
        assert 2 * g not in dropped, g
    # the cap holds (hash split is probabilistic: allow 2x)
    from collections import Counter

    sizes = Counter(cell_of.values())
    assert max(sizes.values()) <= 2 * cap, sizes.most_common(3)
    assert len(sizes) >= n // (2 * cap)
    # no coincidental drops at threshold 0.999 with random directions
    assert len(dropped) == pairs


def test_fuzzy_match_max_block_size_caps_degenerate_blocks(spark):
    """max_block_size: a degenerate block (everything shares the leading
    token) drops whole before the self-join; normal blocks still match."""
    from emr_on_eks_hudi_iceberg_delta_spark.operators.dedup import (
        fuzzy_match_pairs,
    )

    rows = [(i, f"spam item{i:04d}") for i in range(50)]  # degenerate block
    rows += [(100, "acme corp"), (101, "acme c0rp")]       # near pair
    df = spark.createDataFrame(rows, "id long, name string")

    capped = fuzzy_match_pairs(
        df, "id", "name", max_distance=2, max_block_size=10
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in capped} == {(100, 101)}

    # without the cap the degenerate block floods the candidate join
    uncapped = fuzzy_match_pairs(df, "id", "name", max_distance=2).collect()
    assert len(uncapped) > 1


def test_levenshtein_join_is_lossless_vs_cross_join(spark):
    from emr_on_eks_hudi_iceberg_delta_spark.operators.dedup import (
        levenshtein_join,
    )

    left = spark.createDataFrame(
        [(1, "kitten"), (2, "apple"), (3, "a")], "lid int, ltext string"
    )
    right = spark.createDataFrame(
        [(10, "sitting"), (11, "aple"), (12, ""), (13, "apples"),
         (14, "kitten")],
        "rid int, rtext string",
    )
    for d in (0, 1, 2, 3):
        got = sorted(
            (r["lid"], r["rid"], r["distance"])
            for r in levenshtein_join(
                left, right, "lid", "ltext", "rid", "rtext", d
            ).collect()
        )
        from pyspark.sql import functions as F

        expect = sorted(
            (r["lid"], r["rid"], r["distance"])
            for r in left.crossJoin(right)
            .withColumn("distance", F.levenshtein("ltext", "rtext"))
            .filter(F.col("distance") <= d)
            .collect()
        )
        assert got == expect, f"d={d}"


def test_levenshtein_join_band_is_equi_join_not_cross(spark):
    from emr_on_eks_hudi_iceberg_delta_spark.operators.dedup import (
        levenshtein_join,
    )

    left = spark.createDataFrame([(1, "abc")], "lid int, ltext string")
    right = spark.createDataFrame([(2, "abcd")], "rid int, rtext string")
    plan = levenshtein_join(
        left, right, "lid", "ltext", "rid", "rtext", 1
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


# ----------------------------- hamming_join ---------------------------------

def test_hamming_join_matches_brute_force(spark):
    """Banded join == brute-force cross join on seeded random 60-bit
    signatures with planted near-dups (lossless claim, measured)."""
    import random

    from emr_on_eks_hudi_iceberg_delta_spark.operators.dedup import (
        hamming_join,
    )

    rng = random.Random(8)
    base = [(i, rng.getrandbits(60)) for i in range(80)]
    cand = []
    for i, sig in base[:40]:
        flips = rng.sample(range(60), i % 5)  # distances 0..4
        mask = 0
        for p in flips:
            mask |= 1 << p
        cand.append((i + 1000, sig ^ mask))
    for i in range(40, 70):
        cand.append((i + 1000, rng.getrandbits(60)))
    ldf = spark.createDataFrame(base, "id bigint, sig bigint")
    rdf = spark.createDataFrame(cand, "cid bigint, csig bigint")
    got = {
        (r["id"], r["cid"], r["distance"])
        for r in hamming_join(
            ldf, rdf, "id", "sig", "cid", "csig", max_distance=3
        ).collect()
    }
    want = {
        (i, ci, bin(s ^ cs).count("1"))
        for i, s in base
        for ci, cs in cand
        if bin(s ^ cs).count("1") <= 3
    }
    assert got == want and len(want) >= 30  # planted 0..3 pairs present


def test_hamming_join_emits_each_pair_once(spark):
    """A distance-0 pair agrees on EVERY band; first-shared-band dedup
    must still emit it exactly once (no distinct in the plan)."""
    from emr_on_eks_hudi_iceberg_delta_spark.operators.dedup import (
        hamming_join,
    )

    ldf = spark.createDataFrame([(1, 12345)], "id bigint, sig bigint")
    rdf = spark.createDataFrame([(2, 12345)], "cid bigint, csig bigint")
    out = hamming_join(
        ldf, rdf, "id", "sig", "cid", "csig", max_distance=2
    )
    assert out.count() == 1
    assert "Deduplicate" not in out._jdf.queryExecution().executedPlan().toString()


def test_hamming_join_refuses_lossy_band_count(spark):
    import pytest

    from emr_on_eks_hudi_iceberg_delta_spark.operators.dedup import (
        hamming_join,
    )

    df = spark.createDataFrame([(1, 1)], "id bigint, sig bigint")
    with pytest.raises(ValueError, match="pigeonhole"):
        hamming_join(df, df, "id", "sig", "id", "sig",
                     max_distance=3, bands=3)


# ---------------------------- containment_join ------------------------------

def test_containment_finds_snippet_jaccard_misses(spark):
    """The motivating case: a short quote inside a long article has low
    Jaccard but containment 1.0."""
    from emr_on_eks_hudi_iceberg_delta_spark.operators.dedup import (
        containment_join,
    )

    article_tokens = [f"w{i}" for i in range(200)]
    quote = " ".join(article_tokens[50:60])  # 10 tokens inside
    docs = spark.createDataFrame(
        [(1, " ".join(article_tokens)), (2, "totally different text here ok")],
        "doc_id bigint, text string",
    )
    snips = spark.createDataFrame(
        [(100, quote)], "sid bigint, stext string"
    )
    rows = containment_join(
        snips, docs, "sid", "stext", "doc_id", "text",
        shingle_n=3, min_containment=0.99, max_shingle_df=None,
    ).collect()
    assert [(r["sid"], r["doc_id"], r["containment"]) for r in rows] == [
        (100, 1, 1.0)
    ]
    # jaccard of the same pair is tiny: 8 shared shingles / 198 total
    assert 8 / 198 < 0.05


def test_containment_df_cap_drops_boilerplate_evidence(spark):
    """A snippet made ONLY of boilerplate shared by every doc scores 0
    under the cap (its shingles exceed max_shingle_df) — the documented
    trade that keeps fan-out bounded."""
    from emr_on_eks_hudi_iceberg_delta_spark.operators.dedup import (
        containment_join,
    )

    boiler = "all rights reserved contact us today"
    docs = spark.createDataFrame(
        [(i, f"doc {i} body text number {i} " + boiler) for i in range(10)],
        "doc_id bigint, text string",
    )
    snips = spark.createDataFrame([(100, boiler)], "sid bigint, stext string")
    capped = containment_join(
        snips, docs, "sid", "stext", "doc_id", "text",
        shingle_n=3, min_containment=0.5, max_shingle_df=5,
    )
    assert capped.count() == 0
    uncapped = containment_join(
        snips, docs, "sid", "stext", "doc_id", "text",
        shingle_n=3, min_containment=0.5, max_shingle_df=None,
    )
    assert uncapped.count() == 10
