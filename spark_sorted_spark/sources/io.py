"""Format-agnostic sources/sinks.

The reference takes any ``RDD[(K, V)]`` as input (SURVEY §2.1) — its
"source support" is the caller's problem. Our analogue: any format
Spark can scan becomes engine input, with the schema contract made
explicit. Parquet/ORC carry their own types; CSV/JSON do NOT — reading
them without a schema silently infers strings/bigints and breaks the
type contracts the operators assume (see tests/test_schema_probe.py),
so for those formats a schema is REQUIRED here, never inferred.

At scale the format choice is a scan-cost choice: parquet/ORC give
column pruning + predicate pushdown + partition pruning; CSV/JSON are
row-major full scans Spark must parse per record (use them as landing
formats, convert once, query columnar). ``write_sink`` is the
conversion step: ``partition_by`` lays out directory partitions
(partition pruning on read), and bucketed layouts live in
``sources.bucketed`` (zero-Exchange joins).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_SELF_DESCRIBING = {"parquet", "orc"}
_SCHEMA_REQUIRED = {"csv", "json"}

# Text formats default to millisecond timestamp patterns, silently
# truncating the microsecond precision parquet carries (and the
# oracle compares). Pin full-precision patterns on both ends.
_TEXT_TS_OPTS = {
    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    "timestampNTZFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
}


def _apply_text_defaults(fmt: str, options: dict) -> None:
    if fmt == "csv":
        options.setdefault("header", "true")
    if fmt in _SCHEMA_REQUIRED:
        for k, v in _TEXT_TS_OPTS.items():
            options.setdefault(k, v)


def read_source(
    spark: SparkSession,
    path: str,
    format: str = "parquet",
    schema: StructType | str | None = None,
    **options,
) -> DataFrame:
    """Read ``path`` as ``format``. CSV/JSON require ``schema`` (a
    StructType or DDL string) — type inference is banned because it
    samples the data and can flip types between runs/partitions.
    CSV defaults to ``header=true`` to match ``write_sink``."""
    fmt = format.lower()
    if fmt in _SCHEMA_REQUIRED and schema is None:
        raise ValueError(
            f"{fmt} is not self-describing; pass schema= (StructType or "
            "DDL string) — inference is disabled by design"
        )
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    _apply_text_defaults(fmt, options)
    return reader.options(**options).load(path)


def write_sink(
    df: DataFrame,
    path: str,
    format: str = "parquet",
    mode: str = "overwrite",
    partition_by: Sequence[str] | str | None = None,
    **options,
) -> None:
    """Write ``df`` to ``path`` as ``format``. ``partition_by`` builds
    a directory-partitioned layout (partition-pruned on read)."""
    fmt = format.lower()
    writer = df.write.format(fmt).mode(mode)
    _apply_text_defaults(fmt, options)
    if partition_by:
        cols = [partition_by] if isinstance(partition_by, str) else partition_by
        writer = writer.partitionBy(*cols)
    writer.options(**options).save(path)
