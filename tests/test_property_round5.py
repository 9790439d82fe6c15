"""Round-5 property tests: the partition-scoped CoW upsert against a
brute-force reference fold.

PartitionedTable is the designated 100 TB write path, so its keyed-upsert
semantics (max-precombine wins, ties to the incoming writer, untouched
partitions keep their old commit dirs) get the same hypothesis treatment
the SCD2 merges and corpus operators already have.
"""

import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from emr_on_eks_hudi_iceberg_delta_spark.sources.partitioned import (
    PartitionedTable,
)

KEYS = list(range(8))
PARTS = ["a", "b", "c"]


@st.composite
def upsert_sequences(draw):
    # non-global index: a key's partition is fixed for the table lifetime
    key_part = {k: draw(st.sampled_from(PARTS)) for k in KEYS}
    n_batches = draw(st.integers(1, 4))
    batches = []
    for _ in range(n_batches):
        ks = draw(
            st.lists(st.sampled_from(KEYS), min_size=1, max_size=6, unique=True)
        )
        batches.append(
            [(k, key_part[k], draw(st.integers(0, 9))) for k in sorted(ks)]
        )
    return batches


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=upsert_sequences())
def test_partitioned_upsert_matches_reference_fold(spark, batches):
    pt = PartitionedTable(
        spark, tempfile.mkdtemp(prefix="pt_prop_"), partition_col="p"
    )
    state: dict[int, tuple] = {}
    for i, batch in enumerate(batches):
        df = spark.createDataFrame(batch, "id long, p string, v long")
        if i == 0:
            pt.overwrite(df)
            state = {k: (p, v) for k, p, v in batch}
        else:
            pt.upsert(df, key_cols=["id"], precombine_col="v")
            for k, p, v in batch:
                # max-precombine wins; ties resolve to the incoming writer
                if k not in state or v >= state[k][1]:
                    state[k] = (p, v)
        got = {
            r["id"]: (r["p"], r["v"]) for r in pt.read().collect()
        }
        assert got == state, f"divergence after batch {i}"
    # untouched partitions never rewrite: every commit touches only the
    # partitions present in its batch
    touched = dict(pt.touched_partition_counts())
    for i, batch in enumerate(batches):
        assert touched[i] <= len({p for _, p, _ in batch})


@st.composite
def moving_upsert_sequences(draw):
    # global index: a key MAY move partitions between batches
    n_batches = draw(st.integers(2, 4))
    batches = []
    for _ in range(n_batches):
        ks = draw(
            st.lists(st.sampled_from(KEYS), min_size=1, max_size=6, unique=True)
        )
        batches.append(
            [
                (k, draw(st.sampled_from(PARTS)), draw(st.integers(0, 9)))
                for k in sorted(ks)
            ]
        )
    return batches


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=moving_upsert_sequences())
def test_global_index_upsert_handles_partition_moves(spark, batches):
    """global_index=True (Hudi GLOBAL_SIMPLE): a winning update that moves
    a key drops the old-partition row; a LOSING update (lower precombine)
    leaves the key in its old partition untouched — exactly the reference
    fold, under arbitrary move sequences."""
    pt = PartitionedTable(
        spark, tempfile.mkdtemp(prefix="pt_gprop_"), partition_col="p"
    )
    state: dict[int, tuple] = {}
    for i, batch in enumerate(batches):
        df = spark.createDataFrame(batch, "id long, p string, v long")
        if i == 0:
            pt.overwrite(df)
            pt.build_index(["id"])
            state = {k: (p, v) for k, p, v in batch}
        else:
            pt.upsert(df, key_cols=["id"], precombine_col="v", global_index=True)
            for k, p, v in batch:
                if k not in state or v >= state[k][1]:
                    state[k] = (p, v)
        got = {r["id"]: (r["p"], r["v"]) for r in pt.read().collect()}
        assert got == state, f"divergence after batch {i}"
