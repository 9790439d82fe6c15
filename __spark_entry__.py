"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's SCD2 incremental
merge, hudi variant) on sf0.001. ``queries()`` / ``oracle_sql()`` expose the
full operator registry from ``emr_on_eks_hudi_iceberg_delta_spark.queries``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from emr_on_eks_hudi_iceberg_delta_spark.queries import REGISTRY
from emr_on_eks_hudi_iceberg_delta_spark.session import configure


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: SCD2 incremental merge (hudi variant) on sf0.001."""
    configure(spark)
    return REGISTRY["scd2_merge_hudi"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }
