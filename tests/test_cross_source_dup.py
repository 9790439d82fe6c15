"""Semantic tests for cross_source_duplication's default exact-digest
path (the registry gate query uses the prefix-fingerprint variant on the
synthetic corpus, which has no byte-identical pairs — so the diagonal and
cross-pair semantics are pinned here on hand-built data)."""

from emr_on_eks_hudi_iceberg_delta_spark.operators.dedup import (
    cross_source_duplication,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, text, "en", src, len(text)) for i, (src, text) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_cross_source_matrix_exact_digests(spark):
    docs = _docs(
        spark,
        [
            ("a", "shared one"),   # in a and b
            ("b", "shared one"),
            ("a", "a internal"),   # duplicated within a only
            ("a", "a internal"),
            ("a", "a unique"),
            ("b", "b unique"),
            ("c", "c unique"),     # c shares nothing
        ],
    )
    out = {
        (r["src_a"], r["src_b"]): (r["dup_docs"], r["total_docs"], r["dup_rate"])
        for r in cross_source_duplication(docs).collect()
    }
    # a->b and b->a: only "shared one"; a's diagonal: the two "a internal"
    # copies; no row involves c, and no (b,b) diagonal exists
    assert out == {
        ("a", "b"): (1, 4, 0.25),
        ("b", "a"): (1, 2, 0.5),
        ("a", "a"): (2, 4, 0.5),
    }


def test_no_duplicates_yields_empty_matrix(spark):
    docs = _docs(spark, [("a", "x"), ("b", "y"), ("c", "z")])
    assert cross_source_duplication(docs).count() == 0
