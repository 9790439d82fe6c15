"""SCD2 envelope column derivation (SURVEY.md §1.1, P1, F1-F10).

The reference adds the same five envelope columns in every pipeline
(hudi/hudi_scd_script.py:59-63, iceberg/iceberg_scd_script.py:29-33,
delta/delta_scd_script.py:33-36):

    ts          = lit(current_timestamp()).cast(TimestampType())
    valid_from  = lit(current_timestamp()).cast(TimestampType())
    valid_to    = lit("").cast(TimestampType())   # -> NULL
    iscurrent   = lit(1).cast("int")
    checksum    = md5(concat(<business columns>))

Differences here, on purpose:

* the load timestamp is injectable (``as_of``) so tests and DuckDB oracles
  are deterministic — SURVEY.md §7 "What's hard" #2. When not injected we
  use ``localtimestamp()`` (constant-folded once per query, same as the
  reference's ``current_timestamp`` — one timestamp per batch).
* timestamps are TIMESTAMP_NTZ: timezone-free, so results hash identically
  across any session timezone.
* the reference's ``lit("").cast(TimestampType())`` NULL idiom would raise
  under Spark 4 ANSI mode; ``null_timestamp()`` keeps the semantics (NULL)
  with an explicit typed NULL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SCD2_ENVELOPE_COLS = ("ts", "valid_from", "valid_to", "iscurrent", "checksum")


def checksum_expr(cols: list[str]) -> Column:
    """Row checksum: md5 over concatenated business columns (F1+F2).

    ``concat`` is null-propagating in Spark (a NULL column NULLs the
    checksum) — matches the reference exactly (hudi/hudi_scd_script.py:63).
    """
    return F.md5(F.concat(*[F.col(c) for c in cols]))


def null_timestamp() -> Column:
    """The reference's empty-string->timestamp NULL (F5), ANSI-safe."""
    return F.lit(None).cast("timestamp_ntz")


def load_timestamp(as_of: str | None) -> Column:
    if as_of is None:
        return F.expr("localtimestamp()")  # NTZ current_timestamp (F3)
    return F.lit(as_of).cast("timestamp_ntz")


def with_scd2_columns(
    df: DataFrame,
    checksum_cols: list[str],
    as_of: str | None = None,
    include_ts: bool = True,
) -> DataFrame:
    """Add the SCD2 envelope. ``include_ts=False`` mirrors the Delta
    pipeline's 8-column variant (delta/delta_scd_script.py:33-36)."""
    ts = load_timestamp(as_of)
    if include_ts:
        df = df.withColumn("ts", ts)
    return (
        df.withColumn("valid_from", ts)
        .withColumn("valid_to", null_timestamp())
        .withColumn("iscurrent", F.lit(1).cast("int"))
        .withColumn("checksum", checksum_expr(checksum_cols))
    )
