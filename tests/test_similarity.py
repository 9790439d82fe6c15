

def test_persisted_ivf_index_matches_transient_and_prunes(spark, tmp_path):
    """build_ivf_index + ivf_index_topk must (a) return row-identical
    results to the transient ivf_topk and (b) physically read ONLY the
    probed cells' partition directories."""
    from pyspark.sql import functions as F

    from emr_on_eks_hudi_iceberg_delta_spark.operators.similarity import (
        build_ivf_index,
        ivf_index_topk,
        ivf_topk,
    )
    from emr_on_eks_hudi_iceberg_delta_spark.sources.partitioned import (
        PartitionedTable,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 6)
    loc = str(tmp_path / "ivf_idx")
    build_ivf_index(emb, loc, n_centroids=16)

    got = ivf_index_topk(spark, loc, queries, k=5, nprobe=2)
    want = ivf_topk(emb, queries, k=5, n_centroids=16, nprobe=2)
    as_rows = lambda df: sorted(
        (r["query_id"], r["neighbor_id"], r["cosine"], r["rank"])
        for r in df.collect()
    )
    assert as_rows(got) == as_rows(want)

    # pruning: the candidate read touches at most nprobe*|queries| cells
    # out of 16 — check the actual files under the probed read
    pt = PartitionedTable(spark, loc, "cell")
    all_cells = {r["cell"] for r in pt.read().select("cell").distinct().collect()}
    assert len(all_cells) == 16
    probed = pt.read_partitions_where(lambda v: v in {"0", "1"})
    files = probed.inputFiles()
    assert files and all("cell=0" in f or "cell=1" in f for f in files)


# --------------------------------- bq_topk ----------------------------------

def test_bq_signature_matches_host_sign_bits(spark):
    import numpy as np

    from emr_on_eks_hudi_iceberg_delta_spark.operators.similarity import (
        BQ_BITS,
        bq_signature_expr,
    )

    rng = np.random.RandomState(5)
    vecs = [(i, [float(x) for x in rng.randn(64)]) for i in range(20)]
    df = spark.createDataFrame(vecs, "vec_id bigint, embedding array<double>")
    got = {
        r["vec_id"]: r["sig"]
        for r in df.select(
            "vec_id", bq_signature_expr("embedding").alias("sig")
        ).collect()
    }
    for i, v in vecs:
        want = sum(1 << j for j in range(BQ_BITS) if v[j] > 0)
        assert got[i] == want


def test_bq_screen_recall_on_clustered_corpus(spark):
    """On a corpus with planted near-duplicates, the BQ screen + exact
    rerank must place each query's planted twin at rank 1 — the
    correlated-data case BQ exists for."""
    import numpy as np

    from emr_on_eks_hudi_iceberg_delta_spark.operators.similarity import (
        bq_topk,
    )

    rng = np.random.RandomState(11)
    base = rng.randn(10, 64)
    rows = []
    for i in range(10):
        rows.append((i, [float(x) for x in base[i]]))
        # twin: tiny perturbation -> same sign pattern almost everywhere
        rows.append((100 + i, [float(x) for x in base[i] + 0.01 * rng.randn(64)]))
    for i in range(300):
        rows.append((1000 + i, [float(x) for x in rng.randn(64)]))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = bq_topk(df, df.filter("vec_id < 10"), k=3, screen_m=30).collect()
    top1 = {r["query_id"]: r["neighbor_id"] for r in out if r["rank"] == 1}
    assert top1 == {i: 100 + i for i in range(10)}


def test_bq_small_dim_vectors_sign_available_dims(spark):
    """ADVICE r8: embeddings with fewer than BQ_BITS dims must sign
    their real dims, not throw INVALID_ARRAY_INDEX_IN_ELEMENT_AT."""
    import numpy as np

    from emr_on_eks_hudi_iceberg_delta_spark.operators.similarity import (
        bq_signature_expr,
        bq_topk,
    )

    rng = np.random.RandomState(3)
    vecs = [(i, [float(x) for x in rng.randn(8)]) for i in range(30)]
    df = spark.createDataFrame(vecs, "vec_id bigint, embedding array<double>")
    got = {
        r["vec_id"]: r["sig"]
        for r in df.select(
            "vec_id", bq_signature_expr("embedding").alias("sig")
        ).collect()
    }
    for i, v in vecs:
        want = sum(1 << j for j in range(8) if v[j] > 0)
        assert got[i] == want
    # end-to-end: screen + rerank on 8-dim vectors works
    out = bq_topk(df, df.filter("vec_id < 3"), k=2, screen_m=10).collect()
    assert {r["query_id"] for r in out} == {0, 1, 2}
    assert all(r["neighbor_id"] != r["query_id"] for r in out)


def test_bq_empty_vector_signs_to_zero(spark):
    from emr_on_eks_hudi_iceberg_delta_spark.operators.similarity import (
        bq_signature_expr,
    )

    df = spark.createDataFrame(
        [(1, []), (2, [1.0, -1.0])], "vec_id bigint, embedding array<double>"
    )
    got = {
        r["vec_id"]: r["sig"]
        for r in df.select(
            "vec_id", bq_signature_expr("embedding").alias("sig")
        ).collect()
    }
    assert got == {1: 0, 2: 1}


# ------------------------- persisted IVF-PQ index ---------------------------

def test_ivfpq_index_matches_transient(spark, tmp_path):
    """The persisted-index hop must change nothing: identical rows to
    ivf_pq_topk on the build corpus (the established index-parity
    pattern: LSH, IVF, BQ, now PQ)."""
    import numpy as np

    from emr_on_eks_hudi_iceberg_delta_spark.operators.similarity import (
        build_ivf_pq_index,
        ivf_pq_index_topk,
        ivf_pq_topk,
    )

    rng = np.random.RandomState(7)
    rows = [(i, [float(x) for x in rng.randn(64)]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    q = df.filter("vec_id < 6")
    want = sorted(map(tuple, ivf_pq_topk(df, q, k=4).collect()))
    loc = str(tmp_path / "ivfpq")
    build_ivf_pq_index(df, loc)
    got = sorted(map(tuple, ivf_pq_index_topk(df, loc, q, k=4).collect()))
    assert got == want


def test_ivfpq_index_lifecycle_build_append_probe(spark, tmp_path):
    """build -> append -> probe: the appended batch is assigned and
    encoded against the FROZEN stored quantizers, so when the original
    corpus contains all seeds, the appended index serves exactly what a
    transient run over the full corpus computes."""
    import numpy as np

    from emr_on_eks_hudi_iceberg_delta_spark.operators.similarity import (
        build_ivf_pq_index,
        ivf_pq_index_append,
        ivf_pq_index_topk,
        ivf_pq_topk,
    )

    rng = np.random.RandomState(13)
    rows = [(i, [float(x) for x in rng.randn(64)]) for i in range(160)]
    schema = "vec_id bigint, embedding array<double>"
    full = spark.createDataFrame(rows, schema)
    # first 120 ids cover all seeds (centroids = first 16, codes = first 16)
    base = spark.createDataFrame(rows[:120], schema)
    batch = spark.createDataFrame(rows[120:], schema)

    loc = str(tmp_path / "ivfpq_l")
    pt = build_ivf_pq_index(base, loc)
    n_versions_before = len(pt._versions())
    ivf_pq_index_append(batch, loc)

    q = full.filter("vec_id < 6")
    got = sorted(map(tuple, ivf_pq_index_topk(full, loc, q, k=4).collect()))
    want = sorted(map(tuple, ivf_pq_topk(full, q, k=4).collect()))
    assert got == want
    # append was one more commit on the codes table
    from emr_on_eks_hudi_iceberg_delta_spark.sources.partitioned import (
        PartitionedTable,
    )

    pt2 = PartitionedTable(spark, loc, "cell")
    assert len(pt2._versions()) == n_versions_before + 1


def test_ivfpq_append_rewrites_only_touched_cells(spark, tmp_path):
    import numpy as np

    from emr_on_eks_hudi_iceberg_delta_spark.operators.similarity import (
        build_ivf_pq_index,
        ivf_pq_index_append,
    )
    from emr_on_eks_hudi_iceberg_delta_spark.sources.partitioned import (
        PartitionedTable,
    )

    rng = np.random.RandomState(29)
    rows = [(i, [float(x) for x in rng.randn(64)]) for i in range(150)]
    schema = "vec_id bigint, embedding array<double>"
    base = spark.createDataFrame(rows, schema)
    loc = str(tmp_path / "ivfpq_c")
    build_ivf_pq_index(base, loc)
    # a single appended vector touches exactly one cell
    one = spark.createDataFrame(
        [(999, [float(x) for x in rng.randn(64)])], schema
    )
    ivf_pq_index_append(one, loc)
    pt = PartitionedTable(spark, loc, "cell")
    versions = pt._versions()
    latest = versions[-1]
    moved = [
        p for p, cid in latest["partitions"].items()
        if cid == latest["version"]
    ]
    assert len(moved) == 1  # partition-scoped rewrite, not a full rewrite
