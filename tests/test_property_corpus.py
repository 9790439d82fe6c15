"""Property-based invariants for the corpus distribution operators:
each is checked against a plain-Python brute-force reference on randomized
tiny corpora (token values drawn from a 4-word vocabulary so collisions,
single-slice, and missing-token cases all occur naturally)."""

import math
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from emr_on_eks_hudi_iceberg_delta_spark.operators.dedup import (
    cross_source_duplication,
)
from emr_on_eks_hudi_iceberg_delta_spark.operators.text import (
    slice_token_divergence,
    with_commonness_score,
)

WORDS = ["alpha", "beta", "gamma", "delta"]

docs_strategy = st.lists(
    st.tuples(
        st.sampled_from(["s0", "s1", "s2"]),
        st.lists(st.sampled_from(WORDS), min_size=1, max_size=6),
    ),
    min_size=1,
    max_size=12,
)


def _df(spark, rows):
    return spark.createDataFrame(
        [
            (i, " ".join(toks), "en", src, len(" ".join(toks)))
            for i, (src, toks) in enumerate(rows)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(rows=docs_strategy)
def test_tvd_matches_bruteforce_and_bounds(spark, rows):
    got = {
        r["slice"]: (r["n_tokens"], r["tv_distance"])
        for r in slice_token_divergence(_df(spark, rows)).collect()
    }
    corpus = Counter()
    per_slice = {}
    for src, toks in rows:
        corpus.update(toks)
        per_slice.setdefault(src, Counter()).update(toks)
    t_g = sum(corpus.values())
    for src, cnt in per_slice.items():
        t_s = sum(cnt.values())
        expect = sum(
            abs(cnt.get(tok, 0) / t_s - corpus[tok] / t_g) for tok in corpus
        ) / 2
        n_tokens, tvd = got[src]
        assert n_tokens == t_s
        assert 0.0 <= tvd <= 1.0
        assert math.isclose(tvd, expect, rel_tol=0, abs_tol=1e-12), (src, tvd, expect)
    # a corpus with one slice is identical to itself: TVD exactly 0
    if len(per_slice) == 1:
        assert next(iter(got.values()))[1] == 0.0


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(rows=docs_strategy)
def test_commonness_matches_bruteforce(spark, rows):
    got = {
        r["doc_id"]: (r["n_tokens"], r["commonness"])
        for r in with_commonness_score(_df(spark, rows)).collect()
    }
    n_docs = len(rows)
    dfreq = Counter()
    for _, toks in rows:
        dfreq.update(set(toks))
    for i, (_, toks) in enumerate(rows):
        expect = sum(dfreq[t] for t in toks) / (len(toks) * n_docs)
        n_tokens, score = got[i]
        assert n_tokens == len(toks)
        assert 0.0 < score <= 1.0  # every token appears in >= its own doc
        assert math.isclose(score, expect, rel_tol=0, abs_tol=1e-12), (i, score, expect)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(rows=docs_strategy)
def test_duplication_matrix_matches_bruteforce(spark, rows):
    got = {
        (r["src_a"], r["src_b"]): (r["dup_docs"], r["total_docs"])
        for r in cross_source_duplication(_df(spark, rows)).collect()
    }
    texts = [(src, " ".join(toks)) for src, toks in rows]
    srcs = sorted({s for s, _ in texts})
    expect = {}
    for a in srcs:
        a_docs = [t for s, t in texts if s == a]
        for b in srcs:
            b_texts = {t for s, t in texts if s == b}
            if a == b:
                counts = Counter(a_docs)
                dup = sum(c for c in counts.values() if c >= 2)
            else:
                dup = sum(1 for t in a_docs if t in b_texts)
            if dup:
                expect[(a, b)] = (dup, len(a_docs))
    assert got == expect
