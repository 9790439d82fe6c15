"""Production-dim ANN path (BLAS band keys) + the cross-engine fold
canary the literal-path oracles depend on."""

import io
import contextlib

import duckdb
import pytest
from pyspark.sql import functions as F

from emr_on_eks_hudi_iceberg_delta_spark.operators.similarity import (
    DEFAULT_MAX_BUCKET_SIZE,
    hyperplane_band_keys_blas,
    hyperplane_signatures,
    lsh_ann_pairs,
    lsh_ann_pairs_blas,
    recommended_lsh_params,
    signature_sql,
)
from emr_on_eks_hudi_iceberg_delta_spark.sources.parquet import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_duckdb_fold_order_canary(spark):
    """The LSH/IVF exact oracles assume DuckDB's list_dot_product is a
    left-to-right non-FMA sequential fold — an empirical property of the
    current DuckDB build. This canary compares Spark's literal-fold
    signature against the DuckDB replay on real vectors so a DuckDB
    upgrade that changes fold order fails HERE with a clear message, not
    deep inside an oracle hash mismatch."""
    emb = load_table(spark, SF_DIR, "embeddings").filter(F.col("vec_id") < 8)
    got_spark = {
        r["vec_id"]: r["signature"]
        for r in hyperplane_signatures(emb).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/embeddings.parquet') WHERE vec_id < 8"
    )
    got_duck = dict(
        con.execute(
            "SELECT vec_id, "
            + signature_sql("CAST(embedding AS DOUBLE[])")
            + " FROM embeddings"
        ).fetchall()
    )
    assert got_spark == got_duck, (
        "DuckDB list_dot_product no longer replays Spark's sequential "
        "zip_with+aggregate fold bit-for-bit (fold order or FMA change in "
        "this DuckDB build?). The embedding_ann_lsh_* and "
        "embedding_ann_ivf_topk exact oracles rest on this property — "
        f"duckdb version: {duckdb.__version__}"
    )


def test_blas_band_keys_match_literal_fold(spark):
    """At test dims the BLAS matmul and the sequential fold agree on every
    sign bit for these embeddings (dots are far from zero), so the two
    paths produce identical buckets — the structural guarantee that
    swapping in the production path changes performance, not semantics."""
    emb = load_table(spark, SF_DIR, "embeddings").filter(F.col("vec_id") < 200)
    n_planes, bands = 16, 4
    bpb = n_planes // bands

    sig = hyperplane_signatures(emb, n_planes=n_planes)
    literal = {
        (r["vec_id"], b): (r["signature"] >> (b * bpb)) & ((1 << bpb) - 1)
        for r in sig.collect()
        for b in range(bands)
    }
    blas = {
        (r["vec_id"], r["band"]): r["key"]
        for r in hyperplane_band_keys_blas(
            emb, n_planes=n_planes, bands=bands
        ).collect()
    }
    assert blas == literal

    # and therefore identical candidate pairs end-to-end
    p_lit = {
        (r["id_a"], r["id_b"])
        for r in lsh_ann_pairs(emb, n_planes=n_planes, bands=bands).collect()
    }
    p_blas = {
        (r["id_a"], r["id_b"])
        for r in lsh_ann_pairs_blas(
            emb, n_planes=n_planes, bands=bands
        ).collect()
    }
    assert p_blas == p_lit


def test_blas_plan_size_bounded_at_production_dims(spark):
    """The point of the BLAS path: plan size is O(1) in (n_planes, dim).
    At 128 planes x 256 dims the literal-fold path would embed ~33k
    literal nodes; the BLAS plan must stay small and contain NO
    higher-order aggregate folds (CodegenFallback) at all."""
    emb = load_table(spark, SF_DIR, "embeddings")
    e = F.col("embedding").cast("array<double>")
    wide = emb.select(
        "vec_id",
        F.flatten(F.array(e, F.reverse(e), e, F.reverse(e))).alias("embedding"),
    )
    keys = hyperplane_band_keys_blas(wide, n_planes=128, bands=16)

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        keys.explain(True)
    plan = buf.getvalue()
    assert len(plan) < 20_000, (
        f"BLAS band-key plan grew to {len(plan)} chars — plane literals "
        "leaking into the plan?"
    )
    assert "aggregate(" not in plan  # no interpreted higher-order folds

    # and it actually runs at those parameters
    rows = keys.limit(64).collect()
    assert {r["band"] for r in rows} <= set(range(16))
    assert all(0 <= r["key"] < (1 << 8) for r in rows)


def test_recommended_lsh_params_scales_with_corpus():
    """Band-key width must grow with the corpus: 4-bit keys (16 buckets)
    collapse past ~10^5 vectors under a 10k cap."""
    small = recommended_lsh_params(10_000)
    big = recommended_lsh_params(1_000_000_000)
    assert small["bits_per_band"] == 4  # floor keeps test-dim defaults
    assert big["bits_per_band"] == 20
    assert big["n_planes"] == 8 * 20
    assert big["expected_bucket_size"] < DEFAULT_MAX_BUCKET_SIZE
    with pytest.raises(ValueError):
        hyperplane_band_keys_blas(None, n_planes=63, bands=8)


# -- product quantization ---------------------------------------------------


def test_pq_seed_vectors_encode_to_themselves(spark):
    """A codebook seed's subvector IS a codeword, so each of the first 16
    vectors must encode to its own codebook position in every subspace —
    and its ADC reconstruction error must be exactly zero."""
    from emr_on_eks_hudi_iceberg_delta_spark.operators.similarity import pq_encode
    from emr_on_eks_hudi_iceberg_delta_spark.sources.parquet import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    codes, codebooks = pq_encode(emb)
    rows = {r["vec_id"]: r for r in codes.filter(F.col("vec_id") < 16).collect()}
    ids = sorted(rows)
    for pos, vid in enumerate(ids, start=1):
        r = rows[vid]
        for j in range(4):
            assert r[f"code_{j}"] == pos, (vid, j, r[f"code_{j}"])
        # reconstruction from its own codewords is the vector itself
        rec = sum((codebooks[j][pos - 1] for j in range(4)), [])
        assert list(r["e"]) == rec


def test_pq_blas_codes_match_literal_path(spark):
    """VERDICT r4 item 1: at test dims the BLAS gemm distances and the
    literal sequential-fold distances agree on every argmin for these
    embeddings (no float-precision ties), so both paths emit identical
    codes — swapping in the production encoder changes performance, not
    semantics. The pq analog of test_blas_band_keys_match_literal_fold."""
    from emr_on_eks_hudi_iceberg_delta_spark.operators.similarity import (
        pq_encode,
        pq_encode_blas,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    lit_codes, lit_cb = pq_encode(emb)
    blas_codes, blas_cb = pq_encode_blas(emb)
    assert blas_cb == lit_cb  # same deterministic seeding
    m = 4
    lit = {
        r["vec_id"]: tuple(r[f"code_{j}"] for j in range(m))
        for r in lit_codes.collect()
    }
    blas = {
        r["vec_id"]: tuple(r[f"code_{j}"] for j in range(m))
        for r in blas_codes.collect()
    }
    assert blas == lit


def test_pq_blas_plan_size_bounded_at_production_dims(spark):
    """The point of the BLAS encoder: plan size is O(1) in
    (m, k_codes, dim). At m=8 x 64 codes x 768 dims the literal path
    would embed ~49k literal nodes (and interpreted folds); the BLAS
    plan must stay small with NO higher-order aggregate folds — and
    actually run at those parameters."""
    from emr_on_eks_hudi_iceberg_delta_spark.operators.similarity import (
        pq_encode_blas,
    )

    emb = load_table(spark, SF_DIR, "embeddings").filter(F.col("vec_id") < 300)
    e = F.col("embedding").cast("array<double>")
    # 64 -> 768 dims: 12 deterministic variants concatenated
    wide = emb.select(
        "vec_id",
        F.flatten(
            F.array(*([e, F.reverse(e)] * 6))
        ).alias("embedding"),
    )
    codes, cbs = pq_encode_blas(wide, m=8, k_codes=64, dim=768)

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        codes.explain(True)
    plan = buf.getvalue()
    assert len(plan) < 20_000, (
        f"BLAS pq-encode plan grew to {len(plan)} chars — codebook "
        "literals leaking into the plan?"
    )
    assert "aggregate(" not in plan  # no interpreted higher-order folds

    rows = codes.limit(64).collect()
    assert len(cbs) == 8 and all(len(cb) == 64 for cb in cbs)
    for r in rows:
        for j in range(8):
            assert 1 <= r[f"code_{j}"] <= 64


def test_pq_codes_in_range_and_recall_sane(spark):
    from emr_on_eks_hudi_iceberg_delta_spark.operators.similarity import (
        cosine_topk,
        pq_topk,
    )
    from emr_on_eks_hudi_iceberg_delta_spark.sources.parquet import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    approx = pq_topk(emb, q, k=5).collect()
    assert len(approx) == 50
    # sanity recall: PQ@5 should recover a decent share of the exact top-5
    exact = {
        (r["query_id"], r["neighbor_id"]) for r in cosine_topk(emb, q, k=5).collect()
    }
    hits = sum((r["query_id"], r["neighbor_id"]) in exact for r in approx)
    assert hits >= 10  # >=20% overlap — loose, catches a broken encode


def test_pq_topk_blas_matches_literal_neighbors(spark):
    """The ADC-table query path must return the same ranked neighbors as
    the oracle-exact literal pq_topk at test dims (distances well away
    from float-precision ties on these embeddings)."""
    from emr_on_eks_hudi_iceberg_delta_spark.operators.similarity import (
        pq_topk,
        pq_topk_blas,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    lit = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in pq_topk(emb, q, k=5).collect()
    }
    blas = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in pq_topk_blas(emb, q, k=5).collect()
    }
    assert blas == lit


def test_ivf_assign_blas_matches_window_path(spark):
    """The third literal-to-BLAS swap: zero-shuffle gemm assignment must
    agree cell-for-cell with ivf_assign's crossJoin+window argmin at test
    dims (same deterministic seeds, same first-minimum tie-break) — and
    the BLAS plan must contain NO exchange at all, where the window path
    multiplies the corpus by n_centroids and then shuffles it."""
    from emr_on_eks_hudi_iceberg_delta_spark.operators.similarity import (
        ivf_assign,
        ivf_assign_blas,
    )
    from emr_on_eks_hudi_iceberg_delta_spark.plans.explain import shuffle_count

    emb = load_table(spark, SF_DIR, "embeddings")
    win, _ = ivf_assign(emb, n_centroids=8)
    blas, cents = ivf_assign_blas(emb, n_centroids=8)
    assert {(r["vec_id"], r["cell"]) for r in blas.collect()} == {
        (r["vec_id"], r["cell"]) for r in win.collect()
    }
    assert shuffle_count(blas) == 0
    assert cents.count() == 8

    # and the semantic_dedup composition returns identical verdicts on
    # either assignment path
    from emr_on_eks_hudi_iceberg_delta_spark.operators.dedup import semantic_dedup

    a = {
        (r["vec_id"], r["is_kept"])
        for r in semantic_dedup(emb, n_centroids=8, threshold=0.35).collect()
    }
    b = {
        (r["vec_id"], r["is_kept"])
        for r in semantic_dedup(
            emb, n_centroids=8, threshold=0.35, assign="blas"
        ).collect()
    }
    assert a == b
