"""Time-series resampling: fixed-interval rollup with gap filling —
the hypertable/downsample shape (per-key metric grids for dashboards,
feature snapshots at regular intervals, training-data time alignment).

Spark aggregates sparse buckets natively but has no native "emit the
EMPTY buckets too" — and most downstream consumers (charting,
windowed models, as-of feature joins) need the dense grid with
carried-forward values. This module fills the gaps relationally:
per-key bucket span -> sequence explode -> left join -> running
``last(ignorenulls)`` carry. Everything is native Catalyst.

Scale design (100 TB of events):
* the expensive input collapses FIRST (groupBy keys+bucket with
  map-side partial aggregation) — the grid machinery only ever sees
  one row per (key, bucket);
* the dense grid is bounded by sum(per-key span / interval), which is
  a deliberate choice the caller makes via ``interval``; a key whose
  span explodes into more than ``max_buckets`` grid cells fails
  loudly (``raise_error``) instead of silently amplifying;
* the carry is one window per key over the already-small grid.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["resample_with_gap_fill", "assign_sessions"]


def assign_sessions(
    df: DataFrame,
    time_col: str,
    gap: int,
    keys,
    order_cols=(),
    session_col: str = "session_id",
) -> DataFrame:
    """Gap-based sessionization, fully native: rows more than ``gap``
    (in ``time_col`` units) after their key's previous row start a
    new session. Adds ``session_col`` (1-based per key) to every
    row — the NATIVE tier of the session family (the map-stream tier
    drives the gated ``sessionize_stream``; ``streaming.sessionize``
    is the watermark tier; this is the one you want for batch at
    100 TB: one shuffle + one sort, lag + running conditional sum,
    whole-stage codegen end to end).

    ``order_cols`` breaks timestamp ties deterministically (e.g. an
    event id); the gap compare itself uses only ``time_col``. A gap
    exactly equal to ``gap`` stays in the SAME session (<=, matching
    ``F.session_window``'s merge rule — pinned by test).
    """
    from pyspark.sql import Window

    keys = [keys] if isinstance(keys, str) else list(keys)
    if not keys:
        raise ValueError("assign_sessions needs at least one key")
    if gap <= 0:
        raise ValueError(f"gap must be positive, got {gap}")
    w = Window.partitionBy(*keys).orderBy(time_col, *order_cols)
    run = Window.partitionBy(*keys).orderBy(time_col, *order_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    prev = F.lag(time_col).over(w)
    new_session = F.when(
        prev.isNull() | (F.col(time_col) - prev > gap), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn(
        session_col, F.sum(new_session).over(run).cast("bigint")
    )


def resample_with_gap_fill(
    df: DataFrame,
    time_col: str,
    interval: int,
    aggs: dict[str, Column],
    keys,
    fill: tuple[str, ...] = (),
    max_buckets: int = 100_000,
) -> DataFrame:
    """Aggregate ``df`` into fixed ``interval``-sized time buckets per
    key and emit the DENSE per-key grid from each key's first bucket
    to its last — empty buckets included.

    Output columns: ``keys...``, ``bucket_ts`` (bucket start, in
    ``time_col`` units), one column per ``aggs`` entry (null in empty
    buckets unless listed in ``fill``), and ``is_gap`` (true for
    buckets with no input rows). Columns named in ``fill`` are
    carried forward into gaps with a running ``last(ignorenulls)``
    per key (the "last known value" semantic); leading gaps before a
    key's first value stay null — but by construction the grid starts
    at a non-empty bucket, so leading gaps cannot occur.

    ``time_col`` must be integral (epoch-micros via
    ``sources.tpch.event_ts_us``); bucket arithmetic uses the same
    exact decimal floor-division as ``merge_join_range``, safe at any
    int64 magnitude. ``interval`` must be positive.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    if not keys:
        raise ValueError("resample_with_gap_fill needs at least one key")
    if interval <= 0:
        raise ValueError(f"interval must be positive, got {interval}")
    if not aggs:
        raise ValueError("pass at least one aggregate in aggs")
    for c in fill:
        if c not in aggs:
            raise ValueError(
                f"fill column {c!r} is not an aggs entry {sorted(aggs)}"
            )
    dt = df.schema[time_col].dataType.simpleString()
    if dt not in ("bigint", "int", "smallint", "tinyint"):
        raise ValueError(
            f"time column {time_col!r} is {dt}; pass an integral time "
            "(e.g. epoch-micros via event_ts_us)"
        )
    from pyspark.sql import Window

    dec = F.col(time_col).cast("decimal(38,0)")
    bucket = ((dec - F.pmod(dec, F.lit(interval))) / F.lit(interval)).cast(
        "long"
    )
    per = df.groupBy(*keys, bucket.alias("__bkt")).agg(
        *[c.alias(n) for n, c in aggs.items()],
        F.lit(1).alias("__present"),
    )
    span = F.col("__hi") - F.col("__lo") + 1
    grid = (
        per.groupBy(*keys)
        .agg(F.min("__bkt").alias("__lo"), F.max("__bkt").alias("__hi"))
        .select(
            *keys,
            F.explode(
                F.when(
                    span > F.lit(max_buckets),
                    F.raise_error(
                        F.format_string(
                            "resample_with_gap_fill: a key spans %s buckets "
                            + f"(max_buckets={max_buckets}); widen the "
                            "interval or raise the cap",
                            span.cast("string"),
                        )
                    ).cast("array<bigint>"),
                ).otherwise(F.sequence("__lo", "__hi"))
            ).alias("__bkt"),
        )
    )
    out = grid.join(per, on=[*keys, "__bkt"], how="left")
    w = (
        Window.partitionBy(*keys)
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in fill:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out.select(
        *keys,
        (F.col("__bkt") * F.lit(interval)).alias("bucket_ts"),
        *aggs.keys(),
        F.col("__present").isNull().alias("is_gap"),
    )
