"""Hypothesis properties for the round-9 surfaces: the Avro codec
round-trips arbitrary values under recursively generated schemas (the
encode/decode pair must be inverse for ANY spec-shaped schema, not just
the Iceberg ones), the MV containment rewrite is SOUND (whenever it
fires, the rewritten query's result equals direct execution on the base
table), and the Delta-protocol log replays a random command sequence
identically to a plain in-memory model."""

import io
import os
import sys

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emr_on_eks_hudi_iceberg_delta_spark.sources.avro_io import (
    decode_value,
    encode_value,
)

COMMON = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ------------------------- avro codec roundtrip -----------------------------

_PRIMS = ["null", "boolean", "int", "long", "double", "string", "bytes"]


def _value_for(schema, draw):
    if isinstance(schema, list):
        branch = draw(st.sampled_from(schema))
        return _value_for(branch, draw)
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return None
    if t == "boolean":
        return draw(st.booleans())
    if t in ("int", "long"):
        lo = -(2**31) if t == "int" else -(2**62)
        hi = 2**31 - 1 if t == "int" else 2**62
        return draw(st.integers(min_value=lo, max_value=hi))
    if t == "double":
        return draw(st.floats(allow_nan=False, width=64))
    if t == "string":
        return draw(st.text(max_size=20))
    if t == "bytes":
        return bytes(draw(st.binary(max_size=20)))
    if t == "record":
        return {
            f["name"]: _value_for(f["type"], draw)
            for f in schema["fields"]
        }
    if t == "array":
        return [
            _value_for(schema["items"], draw)
            for _ in range(draw(st.integers(0, 4)))
        ]
    if t == "map":
        return {
            draw(st.text(min_size=1, max_size=8)): _value_for(
                schema["values"], draw
            )
            for _ in range(draw(st.integers(0, 3)))
        }
    raise AssertionError(t)


@st.composite
def schema_and_value(draw, depth=0):
    kinds = list(_PRIMS)
    if depth < 2:
        kinds += ["record", "array", "map", "union"]
    kind = draw(st.sampled_from(kinds))
    if kind in _PRIMS:
        schema = kind
    elif kind == "union":
        other = draw(st.sampled_from([p for p in _PRIMS if p != "null"]))
        schema = ["null", other]
    elif kind == "record":
        n = draw(st.integers(1, 4))
        fields = []
        for i in range(n):
            sub, _ = draw(schema_and_value(depth=depth + 1))
            fields.append({"name": f"f{i}", "type": sub})
        schema = {
            "type": "record",
            "name": f"rec_d{depth}_{draw(st.integers(0, 999))}",
            "fields": fields,
        }
    elif kind == "array":
        sub, _ = draw(schema_and_value(depth=depth + 1))
        schema = {"type": "array", "items": sub}
    else:
        sub, _ = draw(schema_and_value(depth=depth + 1))
        schema = {"type": "map", "values": sub}
    return schema, _value_for(schema, draw)


@given(sv=schema_and_value())
@settings(max_examples=60, deadline=None)
def test_avro_codec_roundtrips_any_schema(sv):
    schema, value = sv
    enc = encode_value(value, schema)
    buf = io.BytesIO(enc)
    got = decode_value(buf, schema)
    assert got == value
    assert buf.read() == b""  # decoder consumed exactly the encoding


# --------------------- MV containment rewrite soundness ---------------------

@given(
    q_keys=st.sets(st.sampled_from(["a", "b"]), max_size=2),
    measures=st.lists(
        st.sampled_from(
            ["SUM(v) AS s", "COUNT(*) AS n", "MIN(v) AS lo",
             "MAX(v) AS hi", "AVG(v) AS m"]
        ),
        min_size=1,
        max_size=3,
        unique=True,
    ),
    where_b=st.sampled_from([None, "b = 1", "b = 2 AND a = 0"]),
)
@settings(**COMMON)
def test_mv_containment_rewrite_is_sound(
    spark, tmp_path_factory, q_keys, measures, where_b
):
    """Whenever the containment tier fires, serving from the MV must
    equal direct execution on the base table — for any key subset,
    measure mix, and view-key predicate hypothesis throws at it."""
    from emr_on_eks_hudi_iceberg_delta_spark.sources.catalog import (
        LakeCatalog,
    )

    tmp = tmp_path_factory.mktemp("mvprop")
    cat = LakeCatalog(spark, str(tmp / "cat"))
    base = spark.range(200).selectExpr(
        "CAST(id % 4 AS INT) AS a",
        "CAST(id % 3 AS INT) AS b",
        "CAST(id AS DECIMAL(18,4)) AS v",
    )
    cat.create_table("base_p", base)
    cat.create_materialized_view(
        "mv_p",
        "SELECT a, b, COUNT(*) AS n, SUM(v) AS s, MIN(v) AS lo,"
        " MAX(v) AS hi, COUNT(v) AS nv FROM base_p GROUP BY a, b",
    )
    keys = sorted(q_keys) or ["a"]
    sql = (
        f"SELECT {', '.join(keys + measures)} FROM base_p"
        + (f" WHERE {where_b}" if where_b else "")
        + f" GROUP BY {', '.join(keys)}"
    )
    rewritten, used = cat.rewrite_with_materialized_views(sql)
    assert used == "mv_p", sql  # all these shapes are derivable
    cat.sync()
    served = {
        tuple(r): None for r in cat.serve(sql).collect()
    }
    direct = {tuple(r): None for r in spark.sql(sql).collect()}
    assert served.keys() == direct.keys(), sql


# ----------------------- delta log model conformance ------------------------

@given(
    cmds=st.lists(
        st.one_of(
            st.tuples(st.just("overwrite"), st.integers(0, 30)),
            st.tuples(st.just("append"), st.integers(0, 30)),
            st.tuples(st.just("optimize"), st.just(0)),
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(**COMMON)
def test_delta_log_replays_like_a_model(spark, tmp_path_factory, cmds):
    """Random overwrite/append/optimize sequences: every historical
    version's read must equal a plain in-memory model's state at that
    step (optimize is a contents no-op)."""
    from emr_on_eks_hudi_iceberg_delta_spark.sources.delta_log import (
        DeltaLogTable,
    )

    tmp = tmp_path_factory.mktemp("dlprop")
    dt = DeltaLogTable(spark, str(tmp / "t"))
    model: list[list[int]] = []  # state after each version
    state: list[int] = []
    nxt = 0
    for op, n in cmds:
        vals = list(range(nxt, nxt + n))
        nxt += n
        if op == "overwrite":
            dt.overwrite(
                spark.createDataFrame([(v,) for v in vals] or [(None,)],
                                      "id int").filter("id IS NOT NULL")
            )
            state = vals
        elif op == "append":
            if not model:  # first commit must be overwrite-shaped
                dt.overwrite(
                    spark.createDataFrame([(v,) for v in vals] or [(None,)],
                                          "id int").filter("id IS NOT NULL")
                )
                state = vals
            else:
                dt.append(
                    spark.createDataFrame([(v,) for v in vals] or [(None,)],
                                          "id int").filter("id IS NOT NULL")
                )
                state = state + vals
        else:
            if not model:
                continue  # nothing to compact yet
            dt.optimize(target_files=1)
        model.append(sorted(state))
    for version, want in enumerate(model):
        got = sorted(r["id"] for r in dt.read(version=version).collect())
        assert got == want, (version, cmds)
