"""Parquet table loaders for the test star schema (TESTDATA.md).

Loads are plain ``spark.read.parquet`` — scans stay fully vectorized and
Catalyst handles predicate pushdown + column pruning. The one quirk is the
``events`` table: its ``ts`` column is parquet TIMESTAMP(NANOS), which the
Spark 4 reader rejects unless ``spark.sql.legacy.parquet.nanosAsLong=true``;
we read the raw nanos and rebuild a TIMESTAMP_NTZ (microsecond truncation —
identical to DuckDB's ns->us cast, so oracles agree).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

_EPOCH_NTZ = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts",
                F.expr(f"timestampadd(MICROSECOND, ts div 1000, {_EPOCH_NTZ})"),
            )
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Temp-view registration (SURVEY.md S5) for the whole star schema."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
