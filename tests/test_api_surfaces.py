"""Spark 4 API-surface pins beyond the oracle gate: the Observation
metrics API and the Arrow-optimized Python UDF (pinned row-identical to
its JVM-native twin, same rule as the UDTF)."""

from pyspark.sql import Observation
from pyspark.sql import functions as F

from emr_on_eks_hudi_iceberg_delta_spark.sources.parquet import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_observation_metrics_ride_the_action(spark):
    """df.observe: named metrics computed during the SAME action that
    produced the result — free pipeline telemetry (row counts, sums)
    without a second scan."""
    cust = load_table(spark, SF_DIR, "customer")
    obs = Observation("profile")
    observed = cust.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)")).alias("bal_sum"),
    )
    out = observed.filter(F.col("c_acctbal") > 0).count()
    got = obs.get
    assert got["n_rows"] == cust.count()
    expect = cust.agg(
        F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
    ).first()[0]
    assert got["bal_sum"] == expect
    assert out <= got["n_rows"]


def test_arrow_udf_matches_native_expression(spark):
    """The Arrow-optimized Python UDF surface exists and agrees
    row-for-row with the JVM-native expression — honest API coverage;
    the native column is the production path (UDFs are the slow path)."""
    docs = load_table(spark, SF_DIR, "documents").limit(50)
    arrow_upper = F.udf(
        lambda s: s.upper() if s is not None else None, "string", useArrow=True
    )
    both = docs.select(
        arrow_upper(F.col("lang")).alias("u_py"),
        F.upper(F.col("lang")).alias("u_jvm"),
    )
    assert both.filter(F.col("u_py") != F.col("u_jvm")).count() == 0
    assert both.count() == 50
