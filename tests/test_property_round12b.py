"""Round-12 second-session property tests: (1) partial compaction and
position-delete cleanup inserted at ARBITRARY points in an Iceberg
DML program never change the logical read; (2) the UniForm mirror
equals the Delta read after EVERY commit of any bounded DV-delete
program (translation, batch reuse, purge)."""

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from emr_on_eks_hudi_iceberg_delta_spark.sources import delta_dml  # noqa: F401
from emr_on_eks_hudi_iceberg_delta_spark.sources import iceberg_deletes  # noqa: F401
from emr_on_eks_hudi_iceberg_delta_spark.sources import uniform  # noqa: F401
from emr_on_eks_hudi_iceberg_delta_spark.sources.delta_log import (
    DeltaLogTable,
)
from emr_on_eks_hudi_iceberg_delta_spark.sources.iceberg_layout import (
    IcebergTable,
)

ice_ops = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.integers(0, 1),
                  st.integers(2, 4)),
        st.tuples(st.just("delete"), st.integers(2, 5)),
        st.tuples(st.just("eqdel"),
                  st.lists(st.integers(0, 9), min_size=1, max_size=3)),
        st.tuples(st.just("compact"), st.integers(0, 1)),
        st.tuples(st.just("rpd"),),
    ),
    min_size=1,
    max_size=5,
)

PARTS = ("a", "b")


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=ice_ops)
def test_partial_compaction_program_preserves_reads(
    spark, tmp_path_factory, ops
):
    """Appends, MoR deletes, equality deletes, PARTIAL compactions of
    either partition and rewrite_position_deletes in any order: the
    read must always equal the model multiset."""
    loc = str(tmp_path_factory.mktemp("pcprop"))
    t = IcebergTable(spark, loc)
    model: Counter = Counter()
    nxt = 0
    for p in PARTS:  # seed two small files per partition
        for _ in range(2):
            batch = [(nxt + i, p) for i in range(3)]
            nxt += 3
            t.append(
                spark.createDataFrame(batch, "k long, p string"),
                partition_by=["p"],
            )
            model.update(batch)
    for op in ops:
        if op[0] == "append":
            p, n = PARTS[op[1]], op[2]
            batch = [(nxt + i, p) for i in range(n)]
            nxt += n
            t.append(
                spark.createDataFrame(batch, "k long, p string"),
                partition_by=["p"],
            )
            model.update(batch)
        elif op[0] == "delete":
            m = op[1]
            t.delete(f"k % {m} = 1")
            model = Counter(
                {kv: c for kv, c in model.items() if kv[0] % m != 1}
            )
        elif op[0] == "eqdel":
            keys = sorted(set(op[1]))
            t.equality_delete(
                spark.createDataFrame([(k,) for k in keys], "k bigint")
            )
            model = Counter(
                {kv: c for kv, c in model.items() if kv[0] not in keys}
            )
        elif op[0] == "compact":
            t.rewrite_data_files(
                where=f"p = '{PARTS[op[1]]}'", min_input_files=2
            )
        else:
            t.rewrite_position_deletes()
        got = Counter(
            (r["k"], r["p"]) for r in t.read().collect()
        )
        assert got == model, (op, ops)


delta_ops = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.integers(2, 4)),
        st.tuples(st.just("dv"), st.integers(2, 5)),
        st.tuples(st.just("cow"), st.integers(6, 9)),
        st.tuples(st.just("purge"),),
    ),
    min_size=1,
    max_size=4,
)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=delta_ops)
def test_uniform_dv_mirror_equals_delta_for_any_program(
    spark, tmp_path_factory, ops
):
    """DV deletes, CoW deletes, appends and PURGE in any order: after
    every sync the Iceberg mirror serves exactly the Delta rows (DV
    translation + digest-ledger reuse + GC all composing)."""
    loc = str(tmp_path_factory.mktemp("dvprop"))
    dt = DeltaLogTable(spark, loc)
    dt.overwrite(
        spark.range(20).selectExpr("id AS k", "id * 2 AS v")
        .repartition(3)
    )
    dt.enable_uniform()
    ice = IcebergTable(spark, loc)
    nxt = 1000
    for op in ops:
        if op[0] == "append":
            n = op[1]
            dt.append(
                spark.createDataFrame(
                    [(nxt + i, 0) for i in range(n)],
                    "k long, v long",
                )
            )
            nxt += n
        elif op[0] == "dv":
            dt.delete(f"k % {op[1]} = 0", mode="dv")
        elif op[0] == "cow":
            dt.delete(f"k % {op[1]} = 1", mode="cow")
        else:
            dt.optimize()
        dt.sync_uniform()
        assert sorted(map(tuple, ice.read().collect())) == sorted(
            map(tuple, dt.read().collect())
        ), (op, ops)
