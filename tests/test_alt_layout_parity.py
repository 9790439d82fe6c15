"""Alternate-layout parity sweep (VERDICT r6 task 6) — env-gated:

    SPARK_GRAFT_ALT_LAYOUT=1 python -m pytest tests/test_alt_layout_parity.py

Round 6 proved layout-independence manually (a full parity pass under
SPARK_GRAFT_TEST_CORES=5 / SHUFFLE=7); this promotes a stratified ~30-query
subset of that run into the suite. The alternate layout runs in a
``spark.newSession()`` with
- ``spark.sql.shuffle.partitions = 7`` (prime, != the core count), and
- ``spark.sql.files.maxPartitionBytes = 1m`` (fragments every scan into
  many small splits),
so every shuffle boundary, scan split, and partial-aggregation tree
differs from the default run — results must not. The subset is
stratified by each query's first tag (round-robin across tag families)
so every operator family is represented; membership is deterministic.

Skipped by default (the full default-layout parity over all queries
already runs in test_oracle_parity.py); enable per round for the
closing run — see NOTES.md "Alternate-layout parity marker".
"""

import os

import duckdb
import pytest

from emr_on_eks_hudi_iceberg_delta_spark import session as session_mod
from emr_on_eks_hudi_iceberg_delta_spark.queries import REGISTRY
from emr_on_eks_hudi_iceberg_delta_spark.sources.parquet import TABLES

from test_oracle_parity import SF_DIR, _compare

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_ALT_LAYOUT") != "1",
    reason="alternate-layout sweep is opt-in: SPARK_GRAFT_ALT_LAYOUT=1",
)


def _stratified_subset(target: int = 30) -> list[str]:
    by_family: dict[str, list[str]] = {}
    for name in sorted(REGISTRY):
        tags = REGISTRY[name].tags
        by_family.setdefault(tags[0] if tags else "", []).append(name)
    picked: list[str] = []
    i = 0
    while len(picked) < target:
        advanced = False
        for fam in sorted(by_family):
            names = by_family[fam]
            if i < len(names):
                picked.append(names[i])
                advanced = True
                if len(picked) >= target:
                    break
        if not advanced:
            break
        i += 1
    return sorted(picked)


SUBSET = _stratified_subset()


@pytest.fixture(scope="module")
def alt_spark(spark):
    """A sibling session with a deliberately different physical layout.
    ``configure`` (run inside every registered query) re-applies
    RUNTIME_CONFS, so the scan-split override goes through that dict and
    is restored afterwards."""
    alt = spark.newSession()
    alt.conf.set("spark.sql.shuffle.partitions", "7")
    key = "spark.sql.files.maxPartitionBytes"
    old = session_mod.RUNTIME_CONFS[key]
    session_mod.RUNTIME_CONFS[key] = "1m"
    try:
        yield alt
    finally:
        session_mod.RUNTIME_CONFS[key] = old


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", SUBSET)
def test_alt_layout_matches_oracle(alt_spark, duck, name):
    spec = REGISTRY[name]
    sdf = spec.fn(alt_spark, SF_DIR)
    assert alt_spark.conf.get("spark.sql.shuffle.partitions") == "7"
    spark_pdf = sdf.toPandas()
    if spec.oracle is None:
        assert len(spark_pdf) >= 0
        return
    _compare(name, spark_pdf, duck.execute(spec.oracle).df())
