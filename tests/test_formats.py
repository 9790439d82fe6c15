"""Source-format breadth: ORC and JSON-lines round-trips preserve values
exactly; malformed JSON is quarantined, not silently nulled into the batch.
"""

import os
import tempfile

from pyspark.sql import functions as F

from emr_on_eks_hudi_iceberg_delta_spark.sources.formats import (
    read_json_lines,
    read_orc,
    write_json_lines,
    write_orc,
)
from emr_on_eks_hudi_iceberg_delta_spark.sources.parquet import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_orc_roundtrip_exact(spark):
    o = load_table(spark, SF_DIR, "orders")
    path = tempfile.mkdtemp(prefix="orc_t_")
    write_orc(o, path)
    back = read_orc(spark, path, o.schema)
    assert back.schema == o.schema
    assert back.exceptAll(o).count() == 0 and o.exceptAll(back).count() == 0


def test_json_roundtrip_exact(spark):
    d = load_table(spark, SF_DIR, "documents")
    path = tempfile.mkdtemp(prefix="jsonl_t_")
    write_json_lines(d, path)
    back = read_json_lines(spark, path, d.schema)
    assert back.exceptAll(d).count() == 0 and d.exceptAll(back).count() == 0


def test_json_corrupt_records_quarantined(spark):
    d = load_table(spark, SF_DIR, "nation")
    path = tempfile.mkdtemp(prefix="jsonl_bad_")
    write_json_lines(d, path)
    # inject a malformed line as its own file (appending to a part file
    # would invalidate its Hadoop .crc sidecar)
    with open(os.path.join(path, "part-99999-bad.json"), "w") as fh:
        fh.write('{"n_nationkey": "not-a-number", "n_name": broken\n')
    # Spark disallows referencing ONLY the corrupt column from a raw file
    # scan (the parser would never be asked to fail); cache materializes
    # the parse so the quarantine filter is queryable
    back = read_json_lines(spark, path, d.schema, corrupt_col="_corrupt").cache()
    bad = back.filter(F.col("_corrupt").isNotNull())
    good = back.filter(F.col("_corrupt").isNull())
    assert bad.count() == 1
    assert good.count() == d.count()
    # the malformed line is preserved verbatim for the dead-letter sink
    assert "not-a-number" in bad.collect()[0]["_corrupt"]
