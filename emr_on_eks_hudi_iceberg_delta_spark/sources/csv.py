"""Schema-declared CSV source (SURVEY.md S1).

The reference reads headerless comma-delimited CSV with an explicit
StructType in all three pipelines (hudi/hudi_scd_script.py:55-58,
iceberg/iceberg_scd_script.py:26-28, delta/delta_scd_script.py:29-32).
Explicit schemas skip the inference pass (one full extra scan at 100 TB)
and pin column nullability/types for downstream merge operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv_with_schema(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = False,
    delimiter: str = ",",
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .format("csv")
        .options(header=str(header).lower(), delimiter=delimiter)
        .load(path)
    )
