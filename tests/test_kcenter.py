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
