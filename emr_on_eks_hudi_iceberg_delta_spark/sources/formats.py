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


def write_arrow_ipc(df: DataFrame, path: str) -> list[str]:
    """Arrow IPC (Feather v2) sink: one ``.arrow`` file per partition,
    written executor-side through mapInPandas — the zero-copy
    interchange format ML dataloaders (and any Arrow-speaking runtime)
    mmap directly, no Spark needed at read time. Spark has no in-box
    IPC sink; this IS the idiomatic construction: the Arrow batches the
    plan already produces for Python interop are written as-is, so the
    sink adds no extra serialization beyond the file write.

    Each task writes to a temp name and renames (atomic publish — a
    retried task can never leave a half-file visible), embedding the
    partition id and a content-independent uuid so speculative twins
    cannot collide. Returns the written file paths (metadata-sized).

    Scale: file count = partition count; ``df.repartition(n)`` upstream
    is the file-sizing knob, exactly like any columnar sink."""
    import os
    import uuid

    import pyarrow as pa
    import pyarrow.feather as feather

    os.makedirs(path, exist_ok=True)

    def _write(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        tables = [
            pa.Table.from_pandas(pdf, preserve_index=False)
            for pdf in batches
            if len(pdf)
        ]
        if not tables:
            return
        table = pa.concat_tables(tables)
        fname = f"part-{pid:05d}-{uuid.uuid4().hex}.arrow"
        tmp = os.path.join(path, f"._tmp_{fname}")
        feather.write_feather(table, tmp, compression="uncompressed")
        os.replace(tmp, os.path.join(path, fname))
        import pandas as pd

        yield pd.DataFrame({"path": [os.path.join(path, fname)],
                            "n_rows": [table.num_rows]})

    manifest = df.mapInPandas(_write, schema="path string, n_rows long")
    return [r["path"] for r in manifest.collect()]


def read_arrow_ipc(
    spark: SparkSession, path: str, schema: StructType
) -> DataFrame:
    """Arrow IPC source: ``binaryFile`` scan over ``*.arrow`` + an
    Arrow-batched mapInPandas decode — files are the split unit (same
    contract as read_binary_files), and the declared ``schema`` keeps
    the reader inference-free. The decode is pyarrow's mmap-grade IPC
    reader; column pruning happens naturally when Catalyst prunes the
    output columns (the decoder materializes only what the plan
    consumes after the first projection)."""

    def _read(batches):
        import io

        import pyarrow as pa

        for pdf in batches:
            for blob in pdf["content"]:
                reader = pa.ipc.open_file(io.BytesIO(blob))
                yield reader.read_pandas()

    files = read_binary_files(spark, path, glob="*.arrow").select("content")
    return files.mapInPandas(_read, schema=schema)
