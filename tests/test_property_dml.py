"""Hypothesis properties for the round-9 tranche-3 surfaces: the
RoaringBitmapArray codec and the Delta-protocol DML state machine.

The DML property is the strongest correctness statement in this file:
ANY interleaving of overwrite / CoW delete / DV delete / UPDATE /
MERGE must leave the table equal to a plain in-memory dict model at
EVERY historical version — deletion vectors, copy-on-write rewrites,
and merge clause order all have to agree with naive semantics or the
replay diverges somewhere.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from emr_on_eks_hudi_iceberg_delta_spark.sources import roaring

COMMON = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# --------------------------- roaring codec ---------------------------


@given(
    vals=st.lists(
        st.one_of(
            st.integers(0, 1 << 17),           # array/bitmap containers
            st.integers(65_530, 65_542),       # container boundary
            st.integers(0, 1 << 33),           # multi high-32 keys
        ),
        max_size=600,
    )
)
@settings(max_examples=200, deadline=None)
def test_roaring_roundtrip_property(vals):
    assert roaring.deserialize(roaring.serialize(vals)) == sorted(
        set(vals)
    )


@given(data=st.binary(min_size=4, max_size=64))
@settings(max_examples=200, deadline=None)
def test_z85_roundtrip_property(data):
    data = data[: len(data) - (len(data) % 4)]
    assert roaring.z85_decode(roaring.z85_encode(data)) == data


# ------------------------ DML state machine -------------------------

_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("del_cow"), st.integers(2, 5), st.integers(0, 4)),
        st.tuples(st.just("del_dv"), st.integers(2, 5), st.integers(0, 4)),
        st.tuples(st.just("update"), st.integers(2, 5), st.integers(0, 4)),
        st.tuples(st.just("merge"), st.integers(0, 30), st.integers(1, 8)),
        st.tuples(st.just("optimize"), st.just(0), st.just(0)),
    ),
    min_size=1,
    max_size=4,
)


@given(ops=_OPS)
@settings(**COMMON)
def test_dml_replays_like_a_model(spark, tmp_path_factory, ops):
    from emr_on_eks_hudi_iceberg_delta_spark.sources.delta_log import (
        DeltaLogTable,
    )

    tmp = tmp_path_factory.mktemp("dmlprop")
    dt = DeltaLogTable(spark, str(tmp / "t"))
    state = {k: k * 10 for k in range(30)}  # key -> value
    dt.overwrite(
        spark.createDataFrame(
            [(k, v) for k, v in state.items()], "k int, v int"
        ).repartition(3)
    )
    history = [dict(state)]
    for op, m, r in ops:
        if op in ("del_cow", "del_dv"):
            doomed = [k for k in state if k % m == r]
            rep = dt.delete(
                f"k % {m} = {r}",
                mode="dv" if op == "del_dv" else "cow",
            )
            for k in doomed:
                del state[k]
            assert rep["rows_deleted"] == len(doomed)
            if rep["version"] is None:
                continue  # no commit happened: no new version
        elif op == "update":
            hit = [k for k in state if k % m == r]
            rep = dt.update(f"k % {m} = {r}", {"v": "v + 1"})
            for k in hit:
                state[k] += 1
            assert rep["rows_updated"] == len(hit)
            if rep["version"] is None:
                continue
        elif op == "merge":
            # dedupe keys: duplicate source keys are a MERGE refusal
            # (covered separately), not a model step
            src = [(k, k + 1000) for k in sorted({r, r + m, 77 + r})]
            rep = dt.merge_into(
                spark.createDataFrame(src, "k int, v int"),
                ["k"],
                when_matched_update={"v": "s.v"},
            )
            for k, v in src:
                state[k] = v
            if rep["version"] is None:
                continue
        else:
            dt.optimize(target_files=1)
        history.append(dict(state))
    # every historical version equals the model's state at that step
    for version, want in enumerate(history):
        got = {
            r["k"]: r["v"]
            for r in dt.read(version=version).collect()
        }
        assert got == want, (version, ops)
