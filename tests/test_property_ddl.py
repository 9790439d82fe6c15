"""Property-based catalog-DDL front-end test (VERDICT r5 task 7, the
model of round-5's MERGE property test): hypothesis generates random
valid DDL programs over the supported grammar — CTAS, DROP TABLE,
ALTER TABLE RENAME TO, ADD/RENAME/DROP COLUMN, SET/UNSET TBLPROPERTIES
— and each program is applied twice: once through the regex SQL
front-end (``run_dml``) and once through the programmatic
LakeCatalog/VersionedTable API, against two independent catalog roots.

Invariant: the two catalogs end bit-equal (table names, schemas,
properties, SHOW CREATE output, row data), and both agree with a pure
Python model of the DDL semantics — so a front-end mis-parse, a wrong
lowering, or a semantic drift in either surface fails the property.
"""

import os
import shutil
import sys
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emr_on_eks_hudi_iceberg_delta_spark.operators.merge_sql import run_dml
from emr_on_eks_hudi_iceberg_delta_spark.sources.catalog import LakeCatalog

TABLE_POOL = ["t1", "t2", "t3"]
VIEW_POOL = ["v1", "v2"]
COL_POOL = ["c1", "c2", "c3", "c4"]
KEY_POOL = ["k1", "k2", "k3"]
VAL_POOL = ["red", "blue", "7"]


def _creatable(model):
    """Names free for CTAS with a DEFAULT location: not live, and their
    managed path not occupied by a live (renamed-away) table."""
    owned = {m["loc_name"] for m in model.values()}
    return [t for t in TABLE_POOL if t not in model and t not in owned]


def _valid_ops(model, views):
    """Op kinds legal in the current model state."""
    ops = []
    if _creatable(model):
        ops.append("create")
        if model:
            ops.append("rename_table")
    if model:
        ops += ["drop_table", "set_prop", "unset_prop", "add_col"]
        if any(len(m["cols"]) >= 2 for m in model.values()):
            ops += ["drop_col", "rename_col"]
    if [v for v in VIEW_POOL if v not in views]:
        ops.append("create_view")
    if views:
        ops.append("drop_view")
    return ops


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
@given(data=st.data())
def test_sql_frontend_matches_programmatic_api(spark, data):
    root_a = tempfile.mkdtemp(prefix="ddl_sql_")
    root_b = tempfile.mkdtemp(prefix="ddl_api_")
    try:
        cat_a = LakeCatalog(spark, root_a)   # driven via run_dml
        cat_b = LakeCatalog(spark, root_b)   # driven programmatically
        # model: name -> {"cols": [(name, type)...], "props": {},
        #                 "loc_name": the managed-path name it occupies}
        # graveyard: loc_name -> leftover props of a dropped-not-purged
        # table directory (re-CREATE re-attaches them: external "undrop")
        model = {}
        graveyard = {}
        views = {}   # name -> literal seed the view selects

        n_ops = data.draw(st.integers(min_value=3, max_value=6), label="n_ops")
        for _ in range(n_ops):
            ops = _valid_ops(model, views)
            op = data.draw(st.sampled_from(ops), label="op")
            if op == "create":
                t = data.draw(st.sampled_from(_creatable(model)), label="t")
                seed = data.draw(st.integers(1, 5), label="seed")
                q = f"SELECT id, id * {seed} AS v FROM range(5)"
                run_dml(spark, f"CREATE TABLE {t} AS {q}", catalog=cat_a)
                cat_b.create_table(t, spark.sql(q))
                model[t] = {
                    "cols": [("id", "bigint"), ("v", "bigint")],
                    # drop-without-purge leaves table metadata in the
                    # directory; re-creating the name re-attaches it
                    "props": dict(graveyard.pop(t, {})),
                    "loc_name": t,
                }
            elif op == "drop_table":
                t = data.draw(st.sampled_from(sorted(model)), label="t")
                purge = data.draw(st.booleans(), label="purge")
                run_dml(
                    spark,
                    f"DROP TABLE {t}" + (" PURGE" if purge else ""),
                    catalog=cat_a,
                )
                cat_b.drop_table(t, purge=purge)
                if purge:
                    graveyard.pop(model[t]["loc_name"], None)
                else:
                    graveyard[model[t]["loc_name"]] = dict(model[t]["props"])
                del model[t]
            elif op == "rename_table":
                old = data.draw(st.sampled_from(sorted(model)), label="old")
                new = data.draw(
                    st.sampled_from([x for x in TABLE_POOL if x not in model]),
                    label="new",
                )
                run_dml(spark, f"ALTER TABLE {old} RENAME TO {new}", catalog=cat_a)
                cat_b.rename_table(old, new)
                model[new] = model.pop(old)
            elif op == "add_col":
                t = data.draw(st.sampled_from(sorted(model)), label="t")
                have = [c for c, _ in model[t]["cols"]]
                free = [c for c in COL_POOL if c not in have]
                if not free:
                    continue
                c = data.draw(st.sampled_from(free), label="c")
                run_dml(
                    spark, f"ALTER TABLE {t} ADD COLUMN {c} int", catalog=cat_a
                )
                cat_b.table(t).add_column(c, "int")
                model[t]["cols"].append((c, "int"))
            elif op == "drop_col":
                cands = sorted(
                    t for t, m in model.items() if len(m["cols"]) >= 2
                )
                t = data.draw(st.sampled_from(cands), label="t")
                c, _ = data.draw(
                    st.sampled_from(model[t]["cols"]), label="c"
                )
                run_dml(spark, f"ALTER TABLE {t} DROP COLUMN {c}", catalog=cat_a)
                cat_b.table(t).drop_column(c)
                model[t]["cols"] = [x for x in model[t]["cols"] if x[0] != c]
            elif op == "rename_col":
                cands = sorted(
                    t for t, m in model.items() if len(m["cols"]) >= 2
                )
                t = data.draw(st.sampled_from(cands), label="t")
                (old, ty) = data.draw(
                    st.sampled_from(model[t]["cols"]), label="old"
                )
                have = [c for c, _ in model[t]["cols"]]
                free = [c for c in COL_POOL if c not in have]
                if not free:
                    continue
                new = data.draw(st.sampled_from(free), label="new")
                run_dml(
                    spark,
                    f"ALTER TABLE {t} RENAME COLUMN {old} TO {new}",
                    catalog=cat_a,
                )
                cat_b.table(t).rename_column(old, new)
                model[t]["cols"] = [
                    (new, ty) if c == old else (c, cty)
                    for c, cty in model[t]["cols"]
                ]
            elif op == "set_prop":
                t = data.draw(st.sampled_from(sorted(model)), label="t")
                k = data.draw(st.sampled_from(KEY_POOL), label="k")
                v = data.draw(st.sampled_from(VAL_POOL), label="v")
                run_dml(
                    spark,
                    f"ALTER TABLE {t} SET TBLPROPERTIES ('{k}' = '{v}')",
                    catalog=cat_a,
                )
                cat_b.table(t).set_property(k, v)
                model[t]["props"][k] = v
            elif op == "create_view":
                v = data.draw(
                    st.sampled_from([x for x in VIEW_POOL if x not in views]),
                    label="v",
                )
                seed = data.draw(st.integers(0, 9), label="vseed")
                q = f"SELECT {seed} AS x"
                run_dml(spark, f"CREATE VIEW {v} AS {q}", catalog=cat_a)
                cat_b.create_view(v, q)
                views[v] = seed
            elif op == "drop_view":
                v = data.draw(st.sampled_from(sorted(views)), label="v")
                run_dml(spark, f"DROP VIEW {v}", catalog=cat_a)
                cat_b.drop_view(v)
                del views[v]
            elif op == "unset_prop":
                t = data.draw(st.sampled_from(sorted(model)), label="t")
                k = data.draw(st.sampled_from(KEY_POOL), label="k")
                run_dml(
                    spark,
                    f"ALTER TABLE {t} UNSET TBLPROPERTIES ('{k}')",
                    catalog=cat_a,
                )
                cat_b.table(t).unset_property(k)
                model[t]["props"].pop(k, None)

        # ---- end-state: front-end == programmatic == model ------------
        names = sorted(model)
        assert cat_a.list_tables() == names
        assert cat_b.list_tables() == names
        assert cat_a.list_views() == sorted(views)
        assert cat_b.list_views() == sorted(views)
        for v, seed in views.items():
            assert cat_a.view(v).first()["x"] == seed
            assert cat_b.view(v).first()["x"] == seed
        for t in names:
            desc = [
                (r["col_name"], r["data_type"])
                for r in run_dml(
                    spark, f"DESCRIBE TABLE {t}", catalog=cat_a
                ).collect()
            ]
            api_schema = [
                (f.name, f.dataType.simpleString())
                for f in cat_b.table(t).read().schema
            ]
            assert desc == model[t]["cols"], (t, desc)
            assert api_schema == model[t]["cols"], (t, api_schema)

            props_a = {
                r["key"]: r["value"]
                for r in run_dml(
                    spark, f"SHOW TBLPROPERTIES {t}", catalog=cat_a
                ).collect()
            }
            assert props_a == model[t]["props"], (t, props_a)
            assert cat_b.table(t).properties() == model[t]["props"]

            ddl_a = run_dml(
                spark, f"SHOW CREATE TABLE {t}", catalog=cat_a
            ).first()["createtab_stmt"]
            ddl_b = cat_b.show_create_table(t)
            # locations differ by root; everything else must match
            assert ddl_a.replace(root_a, "<root>") == ddl_b.replace(
                root_b, "<root>"
            ), (ddl_a, ddl_b)

            rows_a = sorted(
                tuple(r) for r in cat_a.table(t).read().collect()
            )
            rows_b = sorted(
                tuple(r) for r in cat_b.table(t).read().collect()
            )
            assert rows_a == rows_b, t
    finally:
        shutil.rmtree(root_a, ignore_errors=True)
        shutil.rmtree(root_b, ignore_errors=True)
