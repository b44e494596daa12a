import pytest

from spark_sorted_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # Mirrors the reference's shared test session (SparkSuite.scala:10-19):
    # small local master, few shuffle partitions so multi-partition
    # invariants (key disjointness) are actually exercised.
    s = get_spark("spark_sorted_spark-tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
