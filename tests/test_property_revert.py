"""Property-based invariants for commit revert / cherry-pick (round 6):
for ANY sequence of append/delete commits and any chosen commit v,

1. revert(v) followed by cherry_pick(v) yields exactly
   ``(C ∖ A) ⊎ A`` where C is the pre-revert state and A the rows v
   added — the precise law of the documented SATURATING multiset
   algebra (``exceptAll`` subtracts nothing for rows a later commit
   already deleted, so the round-trip resurrects them; it is the
   identity iff A ⊆ C, which a hypothesis counterexample proved is NOT
   always the case: append then ``delete_where`` hitting an appended
   row);
2. reverting every commit newest-to-oldest returns the empty table
   (each step is an immediate revert of the head's producing commit,
   which is exact — no saturation can bite);
3. neither operation ever rewrites history (version list only grows).
"""

from collections import Counter

import os
import sys
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import VersionedTable


def _rows(vt):
    return sorted((r["id"], r["tag"]) for r in vt.read().collect())


@st.composite
def commit_programs(draw):
    n_commits = draw(st.integers(min_value=2, max_value=4))
    ops = []
    for i in range(n_commits):
        kind = draw(st.sampled_from(["append", "delete"]))
        if kind == "append":
            lo = draw(st.integers(0, 30))
            n = draw(st.integers(1, 5))
            ops.append(("append", lo, n, f"b{i}"))
        else:
            mod = draw(st.integers(2, 5))
            ops.append(("delete", mod))
    pick = draw(st.integers(min_value=1, max_value=n_commits))
    return ops, pick


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
@given(prog=commit_programs())
def test_revert_cherry_pick_algebra(spark, prog):
    ops, pick = prog
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_prop_rev_"))
    vt.overwrite(
        spark.range(8).select("id", F.lit("base").alias("tag"))
    )  # v0
    for op in ops:
        if op[0] == "append":
            _, lo, n, tag = op
            vt.append(
                spark.range(lo, lo + n).select("id", F.lit(tag).alias("tag"))
            )
        else:
            vt.delete_where(f"id % {op[1]} = 1")

    before = _rows(vt)
    history_before = [s["version"] for s in vt.history()]
    added_df, _removed_df = vt._commit_delta(pick)
    added = Counter((r["id"], r["tag"]) for r in added_df.collect())

    # (1) revert then cherry-pick the same commit = (C \ A) ⊎ A exactly
    # (identity iff every row the commit added is still live in C)
    vt.revert(pick)
    vt.cherry_pick(pick)
    expected = Counter(before) - added + added
    assert Counter(_rows(vt)) == expected
    if not (added - Counter(before)):  # A ⊆ C → the round-trip IS identity
        assert _rows(vt) == before

    # (3) history only grew — no rewrite
    history_after = [s["version"] for s in vt.history()]
    assert history_after[: len(history_before)] == history_before
    assert len(history_after) == len(history_before) + 2

    # (2) reverting every original commit newest-to-oldest (plus the
    # identity pair we just appended, which cancels itself) empties the
    # table back past the base: revert the pair first, then originals
    vt.revert(history_after[-1])   # undo the cherry-pick
    vt.revert(history_after[-2])   # undo the revert (no-op net, but a commit)
    for v in sorted(history_before, reverse=True):
        vt.revert(v)
    assert _rows(vt) == []
