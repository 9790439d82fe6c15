import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emr_on_eks_hudi_iceberg_delta_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # cores/shuffle-partitions are env-tunable so the suite can prove
    # results are partitioning-independent (decimal sums, tie-broken ranks)
    cores = int(os.environ.get("SPARK_GRAFT_TEST_CORES", "8"))
    shuffle = int(os.environ.get("SPARK_GRAFT_TEST_SHUFFLE", str(cores)))
    spark = get_spark("tests", master=f"local[{cores}]", shuffle_partitions=shuffle)
    yield spark
    spark.stop()
