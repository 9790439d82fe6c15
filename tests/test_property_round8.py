"""Hypothesis properties for the round-8 operators: banded Hamming join
vs brute force (lossless claim under random signatures, thresholds, and
band counts), reconciliation repair as a fixed point (applying the
changeset makes the tables digest-equal, including duplicate keys), and
containment vs a host-side set computation."""

import os
import sys

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emr_on_eks_hudi_iceberg_delta_spark.operators.dedup import (
    containment_join,
    hamming_join,
)
from emr_on_eks_hudi_iceberg_delta_spark.operators.validate import (
    reconcile_tables,
    tables_equal,
)

COMMON = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**COMMON)
@given(
    data=st.data(),
    r=st.integers(min_value=0, max_value=4),
    extra_bands=st.integers(min_value=0, max_value=2),
)
def test_hamming_join_equals_brute_force(spark, data, r, extra_bands):
    n_l = data.draw(st.integers(min_value=1, max_value=12))
    n_r = data.draw(st.integers(min_value=1, max_value=12))
    sig = st.integers(min_value=0, max_value=(1 << 60) - 1)
    left = [(i, data.draw(sig)) for i in range(n_l)]
    # bias the right side toward near-duplicates of the left
    right = []
    for j in range(n_r):
        if left and data.draw(st.booleans()):
            base = left[j % len(left)][1]
            flips = data.draw(
                st.sets(st.integers(min_value=0, max_value=59), max_size=r + 1)
            )
            m = 0
            for p in flips:
                m |= 1 << p
            right.append((100 + j, base ^ m))
        else:
            right.append((100 + j, data.draw(sig)))
    ldf = spark.createDataFrame(left, "id bigint, sig bigint")
    rdf = spark.createDataFrame(right, "rid bigint, rsig bigint")
    got = {
        (row["id"], row["rid"], row["distance"])
        for row in hamming_join(
            ldf, rdf, "id", "sig", "rid", "rsig",
            max_distance=r, bands=r + 1 + extra_bands,
        ).collect()
    }
    want = {
        (i, j, bin(a ^ b).count("1"))
        for i, a in left
        for j, b in right
        if bin(a ^ b).count("1") <= r
    }
    assert got == want


@settings(**COMMON)
@given(
    src_rows=st.lists(
        st.tuples(st.integers(0, 6), st.sampled_from("abc")),
        min_size=0, max_size=12,
    ),
    tgt_rows=st.lists(
        st.tuples(st.integers(0, 6), st.sampled_from("abc")),
        min_size=0, max_size=12,
    ),
)
def test_reconcile_repair_reaches_fixed_point(spark, src_rows, tgt_rows):
    """For ARBITRARY multisets (duplicate keys included): delete every
    flagged key from tgt, copy src's rows for flagged keys in — the
    repaired table must be digest-equal to src, and re-reconciling
    must return empty."""
    src = spark.createDataFrame(
        [(k, v) for k, v in src_rows] or [(99, "z")], "k int, v string"
    )
    tgt = spark.createDataFrame(
        [(k, v) for k, v in tgt_rows] or [(99, "z")], "k int, v string"
    )
    diff = reconcile_tables(src, tgt, ["k"], ["v"])
    keys = diff.select("k")
    repaired = tgt.join(keys, "k", "left_anti").unionAll(
        src.join(keys, "k", "left_semi")
    )
    assert tables_equal(src, repaired, ["k", "v"])
    assert reconcile_tables(src, repaired, ["k"], ["v"]).count() == 0


@settings(**COMMON)
@given(data=st.data())
def test_containment_matches_host_sets(spark, data):
    """Uncapped containment == host-side shingle-set arithmetic."""
    token = st.sampled_from(["a", "b", "c", "d", "e", "f"])
    docs = []
    for i in range(data.draw(st.integers(1, 6))):
        toks = data.draw(st.lists(token, min_size=0, max_size=10))
        docs.append((i, " ".join(toks)))
    snips = []
    for j in range(data.draw(st.integers(1, 4))):
        toks = data.draw(st.lists(token, min_size=3, max_size=6))
        snips.append((100 + j, " ".join(toks)))

    def sh(text):
        t = text.split()
        return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}

    want = set()
    for sid, stext in snips:
        ls = sh(stext)
        if not ls:
            continue
        for did, dtext in docs:
            inter = len(ls & sh(dtext))
            if inter / len(ls) >= 0.75:
                want.add((sid, did, inter, len(ls)))
    got = {
        (r["sid"], r["doc_id"], r["n_shared"], r["n_left"])
        for r in containment_join(
            spark.createDataFrame(snips, "sid bigint, stext string"),
            spark.createDataFrame(docs, "doc_id bigint, text string"),
            "sid", "stext", "doc_id", "text",
            shingle_n=3, min_containment=0.75, max_shingle_df=None,
        ).collect()
    }
    assert got == want
