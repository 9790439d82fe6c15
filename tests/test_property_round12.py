"""Round-12 property tests: (1) Hudi persisted CDC equals a pure
model of the event semantics for ANY bounded op sequence — and equals
inference mode, file-for-file attribution included; (2) an Iceberg
append/DML/rewrite_manifests lifecycle always reads back the model
state, with manifest compaction inserted at arbitrary points."""

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from emr_on_eks_hudi_iceberg_delta_spark.sources import hudi_cdc  # noqa: F401
from emr_on_eks_hudi_iceberg_delta_spark.sources import hudi_maintenance  # noqa: F401
from emr_on_eks_hudi_iceberg_delta_spark.sources import iceberg_deletes  # noqa: F401
from emr_on_eks_hudi_iceberg_delta_spark.sources.hudi_layout import (
    HudiCowTable,
)
from emr_on_eks_hudi_iceberg_delta_spark.sources.iceberg_layout import (
    IcebergTable,
)

# bounded op programs: upsert a key subset, delete by residue, cluster
hudi_ops = st.lists(
    st.one_of(
        st.tuples(
            st.just("upsert"),
            st.lists(st.integers(0, 11), min_size=1, max_size=4),
        ),
        st.tuples(st.just("delete"), st.integers(2, 5)),
        st.tuples(st.just("cluster"), st.integers(1, 3)),
    ),
    min_size=1,
    max_size=4,
)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=hudi_ops)
def test_persisted_cdc_matches_model_for_any_program(
    spark, tmp_path_factory, ops
):
    """Model: dict state evolved per commit; expected events derive
    from the state transition alone. The engine must agree in BOTH
    modes (persisted files and timeline inference), per commit."""
    loc = str(tmp_path_factory.mktemp("cdcprop"))
    t = HudiCowTable(
        spark, loc, record_key="k", precombine_field="v",
        n_file_groups=2, cdc_enabled=True,
    )
    state = {k: float(k) for k in range(12)}
    i0 = t.bulk_insert(
        spark.createDataFrame(
            [(k, v) for k, v in state.items()], "k long, v double"
        )
    )
    expected: Counter = Counter()
    ctr = 100.0  # strictly increasing precombine: batches always win
    for op in ops:
        if op[0] == "upsert":
            keys = sorted(set(op[1]))
            ctr += 1.0
            batch = [(k, ctr + k) for k in keys]
            t.upsert(
                spark.createDataFrame(batch, "k long, v double")
            )
            for k, v in batch:
                if k in state:
                    expected[(k, state[k], "update_before")] += 1
                    expected[(k, v, "update_after")] += 1
                else:
                    expected[(k, v, "insert")] += 1
                state[k] = v
        elif op[0] == "delete":
            m = op[1]
            doomed = [k for k in state if k % m == 0]
            inst = t.delete(f"k % {m} = 0")
            if inst is None:
                assert not doomed
            for k in doomed:
                expected[(k, state.pop(k), "delete")] += 1
        else:
            t.cluster(op[1])  # no logical change, no events
    for use_persisted in (True, False):
        got = Counter(
            (r["k"], r["v"], r["_change_type"])
            for r in t.cdc_scan(
                i0, use_persisted=use_persisted
            ).collect()
        )
        assert got == expected, (use_persisted, ops)
    # final state agrees too
    assert {
        r["k"]: r["v"] for r in t.read().select("k", "v").collect()
    } == state


ice_ops = st.lists(
    st.one_of(
        st.tuples(
            st.just("append"),
            st.integers(0, 2),  # batch selector
        ),
        st.tuples(st.just("delete"), st.integers(2, 5)),
        st.tuples(st.just("rewrite"), st.integers(1, 3)),
    ),
    min_size=1,
    max_size=4,
)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=ice_ops)
def test_iceberg_lifecycle_reads_model_state(
    spark, tmp_path_factory, ops
):
    """Appends (manifest reuse), MoR deletes (DML manifest reuse),
    and rewrite_manifests at ARBITRARY points: the snapshot read must
    always equal the model multiset."""
    loc = str(tmp_path_factory.mktemp("iceprop"))
    t = IcebergTable(spark, loc)
    t.append(
        spark.createDataFrame(
            [(k, k * 2) for k in range(10)], "k long, v long"
        )
    )
    model: Counter = Counter((k, k * 2) for k in range(10))
    nxt = 100
    for op in ops:
        if op[0] == "append":
            n = 2 + op[1]
            batch = [(nxt + i, i) for i in range(n)]
            nxt += n
            t.append(
                spark.createDataFrame(batch, "k long, v long")
            )
            model.update(batch)
        elif op[0] == "delete":
            m = op[1]
            t.delete(f"k % {m} = 1")
            model = Counter(
                {kv: c for kv, c in model.items() if kv[0] % m != 1}
            )
        else:
            stats = t.rewrite_manifests(target_entries=op[1] * 4)
            assert stats["entries"] >= 0
    got = Counter(
        (r["k"], r["v"]) for r in t.read().select("k", "v").collect()
    )
    assert got == model, ops
