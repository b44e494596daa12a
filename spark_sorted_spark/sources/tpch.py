"""Parquet sources for the driver's TPC-H-ish tables (TESTDATA.md).

The reference has no sources of its own (any ``RDD[(K, V)]`` is input
— SURVEY §2.1); ours are parquet scans, which give Catalyst predicate
pushdown, column pruning and partition pruning for free. At 100 TB
these would be partitioned/bucketed table paths; the API is the same.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    sf_dir = sf_dir or DEFAULT_SF_DIR
    # Worker closures (mapInPandas etc.) reference this package by
    # module path; ship it so any driver session resolves it (no-op
    # after the first call per context).
    from ..shipping import ensure_workers_can_import

    ensure_workers_can_import(spark)
    # The driver's parquet carries nanosecond timestamps (pyarrow
    # default), which Spark's vectorized reader rejects; read them as
    # epoch-nanos longs instead. DuckDB oracles use epoch_ns(col) so
    # both sides see identical int64 values.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(
    spark: SparkSession, sf_dir: str | None = None, names=TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, n, sf_dir) for n in names}


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register all tables as temp views for the spark.sql entry point."""
    for n in TABLES:
        load_table(spark, n, sf_dir).createOrReplaceTempView(n)
