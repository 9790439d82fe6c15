"""table_digest / tables_equal (operators/validate.py): order and
layout independence, tamper detection (value flip, row drop, duplicate
row — the even-multiplicity case xor alone would miss), and the NULL
sentinel keeping ('a', NULL) distinct from concat-collapsed shapes."""

import os
import sys

from pyspark.sql import Row
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emr_on_eks_hudi_iceberg_delta_spark.operators.validate import (
    table_digest,
    tables_equal,
)

SF = "/root/testdata/sf0.001"
COLS = ["o_orderkey", "o_orderstatus"]


def _orders(spark):
    return spark.read.parquet(f"{SF}/orders.parquet").select(*COLS)


def test_layout_independence(spark):
    o = _orders(spark)
    assert tables_equal(o, o.repartition(13).orderBy(F.rand(7)), COLS)


def test_detects_value_flip_and_row_drop(spark):
    o = _orders(spark)
    flipped = o.withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") == 7, F.lit("X")).otherwise(
            F.col("o_orderstatus")
        ),
    )
    assert not tables_equal(o, flipped, COLS)
    assert not tables_equal(o, o.filter("o_orderkey != 7"), COLS)


def test_detects_even_multiplicity_duplicate(spark):
    # duplicating a row twice keeps xor unchanged; count+sum catch it
    o = _orders(spark)
    dup2 = o.unionAll(o.filter("o_orderkey = 7")).unionAll(
        o.filter("o_orderkey = 7")
    )
    da = table_digest(o, COLS).collect()[0]
    db = table_digest(dup2, COLS).collect()[0]
    assert da["hash_xor"] == db["hash_xor"]  # xor blind here, by design
    assert da["n_rows"] != db["n_rows"] and da["hash_sum"] != db["hash_sum"]


def test_null_sentinel_distinguishes(spark):
    a = spark.createDataFrame([Row(x="a", y=None)], "x string, y string")
    b = spark.createDataFrame([Row(x="a", y="")], "x string, y string")
    assert not tables_equal(a, b, ["x", "y"])
