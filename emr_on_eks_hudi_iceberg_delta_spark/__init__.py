"""PySpark-native analytics engine with the capabilities of
``BogaPavanKalyan/emr-on-eks-hudi-iceberg-delta``.

The reference repo implements SCD2 (Slowly Changing Dimension Type 2)
incremental ETL three times — over Hudi, Iceberg and Delta Lake
(``hudi/hudi_scd_script.py``, ``iceberg/iceberg_scd_script.py``,
``delta/delta_scd_script.py``). This package re-expresses those
capabilities as first-class, idiomatic PySpark operators over plain
parquet, plus the large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing,
event-time streaming) a 100 TB deployment needs.

Layout:
    session     SparkSession factory + runtime conf for foreign sessions
    sources     schema-declared CSV/parquet readers, versioned table store
    functions   column-expression helpers (SCD2 envelope, hashing, text, vectors)
    operators   composite operators (SCD2 merges, merge-into, dedup, similarity)
    streaming   Structured Streaming event-time operators + batch equivalents
    plans       physical-plan assertions (pushdown / broadcast checks)
    queries     the query registry driving __spark_entry__ and bench.py
"""

__version__ = "0.1.0"
