"""Greedy k-center diversity sampling: exact host-reference replay (same
IEEE op order as the Spark fold) + coverage-radius monotonicity."""

from emr_on_eks_hudi_iceberg_delta_spark.operators.similarity import kcenter_sample
from emr_on_eks_hudi_iceberg_delta_spark.sources.parquet import load_table

SF_DIR = "/root/testdata/sf0.001"


def _ref_kcenter(vecs: dict, k: int):
    """Same op order as the Spark plan: sequential (x-y)^2 left fold,
    least() update, farthest with lowest-id tie-break."""

    def sqd(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + (x - y) * (x - y)
        return acc

    first = min(vecs)
    chosen = [(first, 1, 0.0)]
    mind = {i: sqd(v, vecs[first]) for i, v in vecs.items() if i != first}
    for step in range(2, k + 1):
        if not mind:
            break
        best = max(mind.values())
        far = min(i for i, d in mind.items() if d == best)
        chosen.append((far, step, mind[far]))
        fv = vecs[far]
        del mind[far]
        for i in list(mind):
            mind[i] = min(mind[i], sqd(vecs[i], fv))
    return chosen


def test_kcenter_matches_host_reference_exactly(spark):
    emb = load_table(spark, SF_DIR, "embeddings").limit(120)
    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]] for r in emb.collect()
    }
    out = sorted(
        (r["vec_id"], r["selection_order"], r["dist_sq"])
        for r in kcenter_sample(emb, k=8).collect()
    )
    ref = sorted(_ref_kcenter(vecs, 8))
    assert out == ref  # bit-exact: same fold order on both sides


def test_kcenter_coverage_radius_non_increasing(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    rows = sorted(
        kcenter_sample(emb, k=6).collect(), key=lambda r: r["selection_order"]
    )
    dists = [r["dist_sq"] for r in rows[1:]]
    assert all(a >= b for a, b in zip(dists, dists[1:]))
    assert len({r["vec_id"] for r in rows}) == 6


def test_kcenter_small_corpus_stops_early(spark):
    emb = load_table(spark, SF_DIR, "embeddings").limit(3)
    rows = kcenter_sample(emb, k=10).collect()
    assert len(rows) == 3
    assert sorted(r["selection_order"] for r in rows) == [1, 2, 3]


def test_grouped_top_eigen_matches_numpy(spark):
    import numpy as np

    from emr_on_eks_hudi_iceberg_delta_spark.operators.similarity import (
        grouped_top_eigen,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    out = {r["label"]: r for r in grouped_top_eigen(emb).collect()}
    host = {}
    for r in emb.collect():
        host.setdefault(r["label"], []).append([float(x) for x in r["embedding"]])
    assert set(out) == set(host)
    for lbl, vecs in host.items():
        mat = np.asarray(vecs)
        cov = np.cov(mat, rowvar=False)
        top = float(np.linalg.eigvalsh(cov)[-1])
        assert abs(out[lbl]["top_eigenvalue"] - top) < 1e-9 * max(1.0, abs(top))
        assert abs(out[lbl]["explained_ratio"] - top / float(np.trace(cov))) < 1e-9
        assert out[lbl]["n"] == len(vecs)
    assert all(0 < r["explained_ratio"] <= 1 for r in out.values())


def test_grouped_top_eigen_degenerate_group(spark):
    from emr_on_eks_hudi_iceberg_delta_spark.operators.similarity import (
        grouped_top_eigen,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (1, [2.0, 1.0]), (2, [5.0, 5.0])],
        "label bigint, embedding array<double>",
    )
    out = {r["label"]: r for r in grouped_top_eigen(df).collect()}
    assert out[2]["n"] == 1 and out[2]["top_eigenvalue"] is None
    assert out[1]["top_eigenvalue"] is not None


def test_gram_spectrum_matches_grouped_map_twin(spark):
    """grouped_gram_spectrum (associative partials, constant task
    memory) == grouped_top_eigen (whole-group grouped-map) at 1e-9 —
    the same decomposition-vs-sequential parity contract as the
    segmented CUSUM twins, including under forced tiny Arrow batches."""
    from emr_on_eks_hudi_iceberg_delta_spark.operators.similarity import (
        grouped_gram_spectrum,
        grouped_top_eigen,
    )
    from emr_on_eks_hudi_iceberg_delta_spark.sources.parquet import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "17")
    try:
        got = {r["label"]: r for r in grouped_gram_spectrum(emb).collect()}
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    want = {r["label"]: r for r in grouped_top_eigen(emb).collect()}
    assert set(got) == set(want)
    for lab, w in want.items():
        g = got[lab]
        assert g["n"] == w["n"], lab
        if w["top_eigenvalue"] is None:
            assert g["top_eigenvalue"] is None
            continue
        assert abs(g["top_eigenvalue"] - w["top_eigenvalue"]) <= 1e-9 * max(
            1.0, abs(w["top_eigenvalue"])
        ), lab
        assert abs(g["explained_ratio"] - w["explained_ratio"]) <= 1e-9, lab


def test_gram_spectrum_distributed_epilogue_is_bit_identical(spark):
    """Forcing the applyInPandas epilogue (max_driver_labels=0) must
    produce exactly what the driver epilogue produces — same combined
    moments, same float sequence."""
    from emr_on_eks_hudi_iceberg_delta_spark.operators.similarity import (
        grouped_gram_spectrum,
    )
    from emr_on_eks_hudi_iceberg_delta_spark.sources.parquet import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    driver = {r["label"]: r for r in grouped_gram_spectrum(emb).collect()}
    dist = {
        r["label"]: r
        for r in grouped_gram_spectrum(emb, max_driver_labels=0).collect()
    }
    assert set(driver) == set(dist)
    for lab, w in driver.items():
        g = dist[lab]
        assert g["n"] == w["n"]
        assert g["top_eigenvalue"] == w["top_eigenvalue"]  # bit-equal
        assert g["explained_ratio"] == w["explained_ratio"]


def test_gram_spectrum_high_cardinality_smoke(spark):
    """labels=10^4 smoke on the distributed epilogue: result is
    O(labels) rows, computation never collects the moment table."""
    import numpy as np

    from emr_on_eks_hudi_iceberg_delta_spark.operators.similarity import (
        grouped_gram_spectrum,
    )

    n_labels, per, d = 10_000, 3, 4
    rng = np.random.RandomState(3)
    base = spark.range(n_labels * per).selectExpr(
        "id % 10000 AS label",
        # deterministic pseudo-vector from the row id (JVM-side)
        """transform(sequence(0, 3), j ->
             CAST(pmod(id * 2654435761 + j * 40503, 997) AS DOUBLE) / 997.0
           ) AS embedding""",
    )
    out = grouped_gram_spectrum(base, max_driver_labels=1000)
    assert out.count() == n_labels
    sample = out.filter("label = 123").collect()[0]
    assert sample["n"] == per and sample["top_eigenvalue"] is not None
