"""Optional Delta Lake backend (SURVEY.md §7: "use Delta locally where the
jar is available, pure-DataFrame fallback otherwise").

This container ships no ``delta-spark`` jar, so every entry point degrades
explicitly: ``delta_available()`` gates, and ``scd2_merge_delta_native``
raises a clear error telling the caller to use the DataFrame decomposition
(operators.merge.scd2_merge_delta_style) instead. When the jar IS present
(e.g. the reference's EMR image, delta/delta_submit.sh:27-32), the native
path runs the exact MERGE from delta/delta_scd_script.py:88-95.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def delta_available() -> bool:
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


def scd2_merge_delta_native(
    spark: SparkSession,
    table_path: str,
    staged_updates: DataFrame,
    key_col: str = "id",
) -> None:
    """Native DeltaTable.merge with the reference's NULL-mergeKey dual-row
    source (delta/delta_scd_script.py:76-95). Requires delta-spark."""
    if not delta_available():
        raise ModuleNotFoundError(
            "delta-spark is not installed; use "
            "operators.merge.scd2_merge_delta_style (pure-DataFrame, same "
            "semantics, verified against the same golden invariant)."
        )
    from delta.tables import DeltaTable
    from pyspark.sql import functions as F

    target = DeltaTable.forPath(spark, table_path)
    tgt_df = target.toDF()
    changed = (
        staged_updates.alias("u")
        .join(tgt_df.alias("t"), key_col)
        .filter("t.checksum <> u.checksum AND t.iscurrent = 1")
        .selectExpr("NULL AS mergeKey", "u.*")
    )
    src = staged_updates.withColumn("mergeKey", F.col(key_col)).unionByName(
        changed, allowMissingColumns=True
    )
    (
        target.alias("tgt")
        .merge(src.alias("src"), f"tgt.{key_col} = src.mergeKey")
        .whenMatchedUpdate(
            condition="src.checksum <> tgt.checksum AND tgt.iscurrent = 1",
            set={"valid_to": "src.valid_from", "iscurrent": "0"},
        )
        .whenNotMatchedInsertAll()
        .execute()
    )
