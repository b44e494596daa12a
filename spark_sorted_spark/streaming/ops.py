"""Declarative streaming operators: event-time windows, session
windows, watermark-bounded dedup.

All three compile to native Catalyst streaming plans (stateful
aggregation / dedup exec nodes) — no Python in the hot path, state
kept in the executor state store, watermark bounds state size. These
are the Structured-Streaming re-expressions of the per-key batch
operators: a watermarked window agg is ``fold_left_by_key`` with an
associative merge and a time-bucketed key; ``F.session_window`` is the
native form of the gap-based sessionization the batch tier does with
``map_stream_by_key`` (SURVEY §2.3).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def windowed_agg(
    sdf: DataFrame,
    time_col: str,
    window: str,
    aggs: Mapping[str, Column],
    *,
    keys: Sequence[str] = (),
    slide: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling (or, with ``slide``, sliding/hopping) event-time window
    aggregation. ``watermark`` (e.g. ``"10 minutes"``) tells the state
    store how long to wait for late data before a window can be
    finalized and its state dropped — without it, state grows without
    bound on an unbounded stream."""
    if watermark is not None:
        sdf = sdf.withWatermark(time_col, watermark)
    win = F.window(time_col, window, slide) if slide else F.window(time_col, window)
    out = sdf.groupBy(win.alias("window"), *keys).agg(
        *[c.alias(a) for a, c in aggs.items()]
    )
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *keys,
        *aggs.keys(),
    )


def sessionize(
    sdf: DataFrame,
    time_col: str,
    gap: str,
    aggs: Mapping[str, Column],
    *,
    keys: Sequence[str] = (),
    watermark: str | None = None,
) -> DataFrame:
    """Gap-based session windows via native ``F.session_window``:
    events closer than ``gap`` merge into one session per key; session
    end = last event + gap. State-store-backed and mergeable across
    micro-batches — the streaming analogue of the batch sessionization
    in ``operators.map_stream`` (lag/cumsum over the group-sorted
    layout)."""
    if watermark is not None:
        sdf = sdf.withWatermark(time_col, watermark)
    sw = F.session_window(time_col, gap)
    out = sdf.groupBy(sw.alias("session"), *keys).agg(
        *[c.alias(a) for a, c in aggs.items()]
    )
    return out.select(
        F.col("session.start").alias("session_start"),
        F.col("session.end").alias("session_end"),
        *keys,
        *aggs.keys(),
    )


def stream_dedup(
    sdf: DataFrame,
    cols: Sequence[str],
    *,
    time_col: str | None = None,
    watermark: str | None = None,
    within_watermark: bool = False,
) -> DataFrame:
    """Streaming exact dedup on ``cols``. With ``within_watermark``,
    uses ``dropDuplicatesWithinWatermark`` so the dedup state for a key
    is dropped once the watermark passes it — the only way dedup state
    stays bounded on an unbounded stream (the batch north-star
    ``dedup_exact`` has no such concern)."""
    if watermark is not None:
        assert time_col is not None, "watermark needs a time_col"
        sdf = sdf.withWatermark(time_col, watermark)
    if within_watermark:
        return sdf.dropDuplicatesWithinWatermark(list(cols))
    return sdf.dropDuplicates(list(cols))


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    *,
    time_col: str,
    watermark: str,
    within: str,
    how: str = "inner",
    suffix: str = "_r",
) -> DataFrame:
    """Watermarked stream-stream equi-join with a time-bound: right
    rows join left rows with the same keys whose event time is within
    ``within`` (e.g. ``"1 hour"``) at or before the left time. The
    time bound + watermark are what make unbounded stream-stream joins
    feasible — they let the engine discard buffered state older than
    the watermark instead of holding both streams forever.

    The batch analogue is a range-predicate equi-join; the streaming
    plan is StreamingSymmetricHashJoin with watermark-based state
    eviction.
    """
    lw = left.withWatermark(time_col, watermark)
    rcols = {c: c + suffix if c in left.columns else c for c in right.columns}
    r = right
    for old, new in rcols.items():
        if new != old:
            r = r.withColumnRenamed(old, new)
    rw = r.withWatermark(time_col + suffix, watermark)
    tcond = (
        (F.col(time_col + suffix) <= F.col(time_col))
        & (F.col(time_col + suffix) >= F.col(time_col) - F.expr(f"INTERVAL {within}"))
    )
    cond = tcond
    for k in keys:
        cond = (F.col(k) == F.col(rcols[k])) & cond
    return lw.join(rw, cond, how)
