"""Z-order (Morton curve) data layout: multi-column clustering so
parquet min/max statistics prune scans on ANY of the clustered
columns, not just the leading sort key.

The problem at 100 TB: a table sorted by ``user_id`` answers
``user_id = ?`` with tight file pruning, but a filter on ``ts`` (or
``value``) reads every file — each file's min/max on the non-leading
column spans the whole domain. Engines solve this with space-filling
curves (Delta ``OPTIMIZE ZORDER BY``, Databricks liquid clustering):
interleave the bits of the clustered columns into one integer and
range-partition + sort by it, so every file covers a small HYPERCUBE
of the key space — per-file ranges on EVERY clustered column are
~``domain / files^(1/n_cols)`` instead of tight-on-one /
full-domain-on-the-rest.

Spark-first implementation, pure integer ops end to end:

1. quantize each column to ``bits`` bits by integer linear scaling
   against its global min/max (one bounded 1-row aggregate; integer
   div — no float rounding, so the z-values are engine-reproducible
   and oracle-checkable);
2. interleave bits (literal shift amounts — the expression
   constant-folds into one whole-stage-codegen span, no UDF);
3. ``repartitionByRange`` + ``sortWithinPartitions`` on the z-value
   (one range shuffle — the same cost a plain sort-by-one-column
   layout pays).

Skew note: ``repartitionByRange`` samples the z-distribution, so
heavily-skewed composites still split evenly across files; the curve
only decides WHICH rows co-locate, not how many per file.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zvalue", "zorder_layout"]


def zvalue(quantized: list[Column], bits: int) -> Column:
    """Morton-interleave ``len(quantized)`` integer columns (each
    already in ``[0, 2^bits)``) into one bigint: output bit
    ``b * n + i`` is input ``i``'s bit ``b``. Total bits must fit a
    signed 64-bit value. All shift amounts are Python literals, so
    the whole expression folds into native codegen."""
    n = len(quantized)
    if n < 1:
        raise ValueError("zvalue needs at least one column")
    if n * bits > 62:
        raise ValueError(
            f"{n} columns x {bits} bits = {n * bits} interleaved bits "
            "does not fit a signed 64-bit z-value; lower bits"
        )
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        for i, c in enumerate(quantized):
            bit = F.shiftright(c.cast("bigint"), b).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, b * n + i)
    return z


def quantize_expr(c: Column, lo: int, hi: int, bits: int) -> Column:
    """Quantize ``c`` from [lo, hi] into at most ``bits`` bits by a
    PURE SHIFT: ``(v - lo) >> s`` with ``s = max(bitlen(hi - lo) -
    bits, 0)`` computed driver-side from the collected min/max. No
    division, no float anywhere — exact, engine-reproducible integer
    math (the trade vs a linear scale: between 2^(bits-1) and 2^bits
    buckets are actually used depending on the span's leading bit —
    irrelevant for layout locality). A constant column maps to 0."""
    span = hi - lo
    if span <= 0:
        return F.lit(0).cast("bigint")
    s = max(span.bit_length() - bits, 0)
    shifted = c.cast("bigint") - F.lit(lo)
    return F.shiftright(shifted, s) if s else shifted


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    bits: int = 12,
    n_partitions: int | None = None,
    z_col: str | None = None,
) -> DataFrame:
    """Re-layout ``df`` along the Morton curve of ``cols`` (integer
    or timestamp-free numeric columns): quantize each against its
    global min/max, interleave, range-partition and sort by the
    z-value. Write the result with any sink — every output file then
    holds a hypercube of the key space, and parquet min/max pruning
    works for predicates on ANY of ``cols``
    (tests/test_pipeline_ops.py measures per-partition range
    shrinkage vs a plain single-column sort).

    ``z_col`` keeps the z-value as a named output column (for
    inspection/oracles); default drops it. The min/max aggregate is
    one bounded job — at 100 TB that is a metadata-sized cost, same
    as the write itself computes statistics."""
    if not cols:
        raise ValueError("zorder_layout needs at least one column")
    # bounded-collect: 2*len(cols) min/max scalars (1 row), the
    # quantization bounds metadata
    mm = df.agg(
        *[F.min(c).cast("bigint").alias(f"lo_{i}") for i, c in enumerate(cols)],
        *[F.max(c).cast("bigint").alias(f"hi_{i}") for i, c in enumerate(cols)],
    ).collect()[0]
    for i, c in enumerate(cols):
        if mm[f"lo_{i}"] is None:
            raise ValueError(
                f"zorder_layout column {c!r} has no non-null values "
                "(empty relation or all-null column) — nothing to quantize"
            )
    quantized = [
        quantize_expr(
            F.col(c), mm[f"lo_{i}"], mm[f"hi_{i}"], bits
        )
        for i, c in enumerate(cols)
    ]
    name = z_col or "__z"
    out = df.withColumn(name, zvalue(quantized, bits))
    if n_partitions:
        out = out.repartitionByRange(n_partitions, name)
    else:
        out = out.repartitionByRange(name)
    out = out.sortWithinPartitions(name)
    return out if z_col else out.drop(name)
