"""Parquet sources for the driver's TPC-H-ish tables (TESTDATA.md).

The reference has no sources of its own (any ``RDD[(K, V)]`` is input
— SURVEY §2.1); ours are parquet scans, which give Catalyst predicate
pushdown, column pruning and partition pruning for free. At 100 TB
these would be partitioned/bucketed table paths; the API is the same.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

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
    # Event-time portability: the driver's parquet has carried `ts` as
    # nanosecond timestamps (surfaced as epoch-nanos int64 via
    # nanosAsLong) in some rounds and as plain timestamp[us]
    # (TIMESTAMP_NTZ to Spark) in others. Keep the nanos shim for the
    # historical layout — it is a no-op on us-precision files — and pin
    # the session timezone to UTC so TIMESTAMP_NTZ→TIMESTAMP casts are
    # value-preserving, matching DuckDB's naive-as-UTC epoch_us(ts).
    # Never hardcode arithmetic on `ts`; go through event_ts_us /
    # event_ts below, which dispatch on the actual column type.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def event_ts_us(df: DataFrame, col: str = "ts") -> Column:
    """Epoch-microseconds for an event-time column, whatever physical
    type this round's parquet presents:

    - TIMESTAMP / TIMESTAMP_NTZ (parquet timestamp[us]) →
      ``unix_micros(cast)`` (session tz is pinned UTC, so the cast is
      value-preserving and matches DuckDB ``epoch_us(ts)``);
    - epoch-nanos int64 (historical nanosAsLong layout) → ``div 1000``
      (integer div — float division loses sub-ms precision).
    """
    dt = df.schema[col].dataType
    if isinstance(dt, (TimestampType, TimestampNTZType)):
        return F.unix_micros(F.col(col).cast("timestamp"))
    if isinstance(dt, LongType):
        return F.expr(f"`{col}` div 1000")
    raise TypeError(
        f"column {col!r} has unsupported event-time type {dt}; "
        "teach sources.tpch.event_ts_us about it"
    )


def event_ts(df: DataFrame, col: str = "ts") -> Column:
    """The event-time column as a proper TIMESTAMP (for watermarks,
    F.window / F.session_window). Same type dispatch as event_ts_us."""
    dt = df.schema[col].dataType
    if isinstance(dt, TimestampType):
        return F.col(col)
    if isinstance(dt, TimestampNTZType):
        return F.col(col).cast("timestamp")
    if isinstance(dt, LongType):
        return F.timestamp_micros(F.expr(f"`{col}` div 1000"))
    raise TypeError(
        f"column {col!r} has unsupported event-time type {dt}; "
        "teach sources.tpch.event_ts about it"
    )


def load_tables(
    spark: SparkSession, sf_dir: str | None = None, names=TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, n, sf_dir) for n in names}


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register all tables as temp views for the spark.sql entry point."""
    for n in TABLES:
        load_table(spark, n, sf_dir).createOrReplaceTempView(n)
