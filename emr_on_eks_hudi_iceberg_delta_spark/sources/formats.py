"""Columnar/row format breadth beyond the reference's CSV+parquet surface.

The reference's only file source is headerless CSV (S1); its sinks are the
three lake formats over parquet. A complete engine also speaks the other
formats Spark ships in-box — ORC (the other splittable columnar format,
with the same predicate-pushdown/column-pruning path as parquet) and
JSON-lines (the interchange format most raw crawl/training dumps arrive
in; schema-declared so the reader skips the inference scan).

Everything here is the stock DataFrameReader/Writer — the point of these
helpers is pinning the scale discipline (explicit schema, no inference
pass, timestamp handling) and giving the round-trips a test surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink — splittable, predicate-pushdown-capable, zlib by default."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    """ORC scan; pass the schema to skip footer merging across many files."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_json_lines(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink (one object per line — the splittable JSON layout;
    never write a single JSON array, it cannot be split across executors)."""
    df.write.mode(mode).json(path)


def read_json_lines(
    spark: SparkSession,
    path: str,
    schema: StructType,
    mode: str = "FAILFAST",
    corrupt_col: str | None = None,
) -> DataFrame:
    """Schema-declared JSON-lines scan. The explicit schema matters twice at
    100 TB: it skips the inference pre-scan, and it makes absent keys typed
    NULLs instead of schema-merge conflicts.

    ``mode`` is FAILFAST by default — at pipeline scale a silent NULL from a
    malformed record is worse than a failed job. For quarantine flows pass
    ``mode="PERMISSIVE"`` with ``corrupt_col``: malformed lines land intact
    in that column (all data fields NULL) so they can be filtered into a
    dead-letter sink instead of corrupting the batch."""
    if corrupt_col is not None:
        from pyspark.sql.types import StringType, StructField

        schema = StructType(
            list(schema.fields) + [StructField(corrupt_col, StringType(), True)]
        )
        return (
            spark.read.schema(schema)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", corrupt_col)
            .json(path)
        )
    return spark.read.schema(schema).option("mode", mode).json(path)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """``binaryFile`` scan — Spark's in-box source for raw image/audio/
    video/document payloads (the ingest edge of the multimodal pipeline,
    operators/multimodal.py): one row per file with ``path``,
    ``modificationTime``, ``length`` and the whole ``content`` as a binary
    column.

    Scale discipline: files are the split unit (one file = one task input —
    the source cannot split inside a file), so shard collections into many
    objects and lean on ``pathGlobFilter`` + partition-directory layout for
    pruning; cap per-task memory via
    ``spark.sql.sources.binaryFile.maxLength``. Decode happens AFTER this
    scan in Arrow-batched mapInPandas (multimodal.decode_image_stub), never
    in the source."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)
