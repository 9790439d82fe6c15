

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
