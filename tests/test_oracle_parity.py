"""Local replica of the driver's correctness gate: run every registered
query through Spark AND its DuckDB oracle over the same parquet tables,
compare row count + sorted-column schema + exact values.

Stricter than the driver in one way: values are compared exactly (floats
bit-for-bit after normalization) — if this passes, any reasonable hash
comparison passes too.
"""

import math
import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod
from emr_on_eks_hudi_iceberg_delta_spark.queries import REGISTRY
from emr_on_eks_hudi_iceberg_delta_spark.sources.parquet import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if s.dtype == object and s.map(
            lambda x: isinstance(x, (list, tuple)) or hasattr(x, "tolist")
        ).any():
            df[c] = s.map(
                lambda x: tuple(x.tolist() if hasattr(x, "tolist") else x)
                if x is not None
                else None
            )
            continue
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(s) or s.dtype == object and s.map(
            lambda x: isinstance(x, int) or x is None
        ).all():
            try:
                df[c] = s.astype("Int64")
            except (TypeError, ValueError):
                pass
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
    return df.sort_values(list(df.columns), na_position="last").reset_index(drop=True)


def _compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame):
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} != oracle {len(duck_pdf)}"
    )
    a, b = _normalize(spark_pdf), _normalize(duck_pdf)
    assert list(a.columns) == list(b.columns), (
        f"{name}: columns {list(a.columns)} != {list(b.columns)}"
    )
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av):
            ok = ((av == bv) | (av.isna() & bv.isna())).all()
        else:
            ok = av.where(av.notna(), None).equals(bv.where(bv.notna(), None))
        assert ok, f"{name}: column {c} differs\nspark:\n{av.head(20)}\noracle:\n{bv.head(20)}"


@pytest.mark.parametrize("name", sorted(REGISTRY.keys()))
def test_query_matches_oracle(spark, duck, name):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, SF_DIR)
    spark_pdf = sdf.toPandas()
    if spec.oracle is None:
        assert len(spark_pdf) >= 0  # rows-only check, mirrors the driver
        return
    duck_pdf = duck.execute(spec.oracle).df()
    _compare(name, spark_pdf, duck_pdf)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert len(df.schema) > 0
    assert set(entry_mod.oracle_sql()).issubset(set(entry_mod.queries()))
