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


def plan_of(df, mode: str = "formatted") -> str:
    """Physical-plan string for assertions. NB: "formatted" prints each
    node twice (tree + detail) — use mode="simple" when counting node
    occurrences. Single wrapper over the private PySpark surface so a
    PySpark upgrade breaks one call site, not one per test file."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )
