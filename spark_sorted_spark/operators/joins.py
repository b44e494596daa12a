"""Sort-merge joins on co-partitioned group-sorted frames (J1-J5).

The reference implements a hand-rolled streaming sort-merge join
(``mergeJoinIterators``, ``package.scala:87-143``: pick smaller head
key, build per-key sub-iterators, per-key cartesian with one side
buffered — ``package.scala:61-79``) over co-partitioned inputs
(``GroupSorted.scala:63-72``, ``zipPartitions``).

Catalyst's ``SortMergeJoinExec`` IS that algorithm — stream one side,
buffer the other per key, spill the buffered side when needed — so the
equality-join flavors (J2-J5) compile to native joins and inherit
whole-stage codegen, AQE skew-join splitting, and broadcast promotion
for small sides. Co-partitioning is honored by ``EnsureRequirements``:
when both inputs already hash-partition on the join key with the same
partition count, no new Exchange is planned (tested in
tests/test_joins.py). That is the moral equivalent of the reference's
shuffle-free ``zipPartitions`` path.

J1 (custom per-key combine of the two value streams) maps to
``cogroup().applyInPandas`` — the exact PySpark analogue of
``f: (Iterator[V], Iterator[W]) => TraversableOnce[U]``.

Semi/anti joins are free extras the reference lacks (SURVEY §2.4).
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..core import GroupSortedFrame, assume_group_sorted

__all__ = [
    "merge_join",
    "merge_join_custom",
    "merge_join_asof",
    "merge_join_range",
    "interval_overlap_join",
]

_HOWS = {"inner", "left", "right", "full", "left_semi", "left_anti"}


def _check_keys(left: GroupSortedFrame, right: GroupSortedFrame) -> list[str]:
    if left.key_cols != right.key_cols:
        raise ValueError(
            f"merge_join requires identical key columns: "
            f"{left.key_cols} vs {right.key_cols}"
        )
    return list(left.key_cols)


def merge_join(
    left: GroupSortedFrame,
    right: GroupSortedFrame | DataFrame,
    how: str = "full",
    suffix: str = "_r",
    broadcast: bool = False,
) -> GroupSortedFrame:
    """Equality join on the shared key columns. ``how='full'`` mirrors
    the reference's default ``mergeJoin`` (``GroupSorted.scala:76-79``
    — per-key cartesian with None-padding); inner/left/right mirror
    J3-J5; semi/anti are extras. Non-key column name collisions on the
    right are renamed with ``suffix``.

    The reference's ``bufferLeft`` flag (which side buffers per key)
    has no user-facing analogue: Catalyst/AQE pick the build side.
    """
    if how not in _HOWS:
        raise ValueError(f"how must be one of {_HOWS}")
    if isinstance(right, DataFrame):
        right = assume_group_sorted(right, left.key_cols)
    keys = _check_keys(left, right)

    # hidden expression-order columns are layout metadata, not part of
    # the relation — and value order across joined rows is undefined
    # anyway (below), so they are dropped, never joined through
    ldf = left.df.drop(*left.hidden_cols) if left.hidden_cols else left.df
    rdf = right.df.drop(*right.hidden_cols) if right.hidden_cols else right.df
    if how not in ("left_semi", "left_anti"):
        # collisions against the POST-drop left columns: a right-side
        # visible column that merely shares a left HIDDEN column's name
        # (e.g. __gs_order_0) needs no suffix — the left copy is gone
        collisions = (set(ldf.columns) & set(rdf.columns)) - set(keys)
        for c in collisions:
            rdf = rdf.withColumnRenamed(c, c + suffix)

    if broadcast:
        # small right side: hash-broadcast it and skip the shuffle/sort
        # of the left side entirely (BroadcastHashJoinExec). At 100 TB
        # this is the difference between a full exchange of the fact
        # table and a map-side join. AQE also auto-promotes when the
        # built side is under spark.sql.autoBroadcastJoinThreshold.
        rdf = F.broadcast(rdf)
    joined = ldf.join(rdf, on=keys, how=how)
    # result stays partitioned by key; key-sorted within partitions for
    # the SMJ path. Value ordering across the combined row is undefined.
    return assume_group_sorted(joined, left.key_cols)


def merge_join_custom(
    left: GroupSortedFrame,
    right: GroupSortedFrame | DataFrame,
    func: Callable,
    schema: str,
    tier: str = "pandas",
) -> DataFrame:
    """J1: full-control per-key co-processing of both value streams
    (``mergeJoin`` with ``f``, ``GroupSorted.scala:57-74``; test
    ``packageSpec.scala:60-83``) via ``cogroup().applyInPandas`` /
    ``applyInArrow``.

    pandas tier: ``func(key, left_pdf, right_pdf) -> pdf``; arrow tier:
    ``func(key, left_tab, right_tab) -> pyarrow.Table`` (no pandas
    conversion — Arrow buffers straight from the JVM). Either way
    ``func`` sees each side's rows in its declared value order
    (re-sorted per group — cogroup does not guarantee intra-group
    order) and emits 0..n full output rows. Keys present on only one
    side get an empty frame/table for the missing side (full-outer
    semantics, like the reference).
    """
    if isinstance(right, DataFrame):
        right = assume_group_sorted(right, left.key_cols)
    keys = _check_keys(left, right)

    lsort = [(s.col, s.ascending) for s in left.order_specs]
    rsort = [(s.col, s.ascending) for s in right.order_specs]

    if tier == "pandas":

        def apply(key: tuple, lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
            if lsort and len(lpdf):
                lpdf = lpdf.sort_values(
                    [c for c, _ in lsort], ascending=[a for _, a in lsort], kind="stable"
                )
            if rsort and len(rpdf):
                rpdf = rpdf.sort_values(
                    [c for c, _ in rsort], ascending=[a for _, a in rsort], kind="stable"
                )
            out = func(key, lpdf, rpdf)
            return out if out is not None else lpdf.iloc[0:0]

        return (
            left.df.groupby(*keys)
            .cogroup(right.df.groupby(*keys))
            .applyInPandas(apply, schema)
        )

    if tier == "arrow":
        lsort_a = [(c, "ascending" if a else "descending") for c, a in lsort]
        rsort_a = [(c, "ascending" if a else "descending") for c, a in rsort]

        def apply_arrow(key: tuple, ltab, rtab):
            if lsort_a and ltab.num_rows:
                ltab = ltab.sort_by(lsort_a)
            if rsort_a and rtab.num_rows:
                rtab = rtab.sort_by(rsort_a)
            out = func(key, ltab, rtab)
            return out if out is not None else ltab.slice(0, 0)

        return (
            left.df.groupby(*keys)
            .cogroup(right.df.groupby(*keys))
            .applyInArrow(apply_arrow, schema)
        )

    raise ValueError(f"unknown tier {tier!r}")


def merge_join_asof(
    left: GroupSortedFrame,
    right: GroupSortedFrame | DataFrame,
    time_col: str,
    *,
    direction: str = "backward",
    tolerance=None,
    suffix: str = "_r",
) -> DataFrame:
    """Point-in-time (as-of) join: for each left row, attach the right
    row with the greatest ``time_col`` <= the left row's (direction
    ``"backward"``, inclusive; ``"forward"`` = smallest >=). Left
    outer: unmatched left rows keep nulls. An operator the reference
    lacks (SURVEY §2.4 "not implemented: ... as-of joins") but a
    training-data pipeline needs (feature lookup at label time without
    leakage).

    Implementation is native and skew-safe at scale: union both sides
    tagged, one hash shuffle on the keys, one partition-local sort by
    ``(time, side)``, then ``last(ignorenulls)`` running windows carry
    the most recent right values onto each left row. No per-key
    cartesian, no range-join explosion; cost is the same one
    shuffle+sort as ``group_sort``. ``tolerance`` (in ``time_col``
    units) voids matches older than ``left.time - tolerance``.

    ``direction="nearest"`` attaches whichever of the backward and
    forward candidates is temporally closer (ties prefer backward,
    matching pandas ``merge_asof``); ``tolerance`` bounds BOTH sides.
    Same single shuffle — the two candidates come from two window
    passes (ascending and descending) over the identical partitioning,
    so Catalyst plans one Exchange and two partition-local sorts.

    Among several right rows sharing one timestamp the carried payload
    is the partition-sort last — deterministic per plan, but pick a
    unique (key, time) right relation when you need a pinned payload
    (all directions share this caveat).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            "direction must be 'backward', 'forward', or 'nearest'"
        )
    if isinstance(right, DataFrame):
        right = assume_group_sorted(right, left.key_cols)
    keys = _check_keys(left, right)
    for side, gsf in (("left", left), ("right", right)):
        if time_col not in gsf.df.columns:
            raise ValueError(f"{side} side lacks time column {time_col!r}")

    from pyspark.sql.window import Window

    lvals = [c for c in left.df.columns if c not in keys and c != time_col]
    rvals = [c for c in right.df.columns if c not in keys and c != time_col]
    carried = {c: (c + suffix if c in left.df.columns else c) for c in rvals}
    carried[time_col] = time_col + suffix

    # both sides keep their event time in `time_col` (it drives the
    # sort); the right side ALSO mirrors it into the carried column so
    # the running last() can report the matched time
    ldf = left.df.select(
        *keys,
        F.col(time_col),
        *lvals,
        *[F.lit(None).cast(right.df.schema[c].dataType).alias(carried[c]) for c in rvals],
        F.lit(None).cast(right.df.schema[time_col].dataType).alias(carried[time_col]),
        F.lit(1).alias("__side"),
    )
    rdf = right.df.select(
        *keys,
        F.col(time_col),
        *[F.lit(None).cast(left.df.schema[c].dataType).alias(c) for c in lvals],
        *[F.col(c).alias(carried[c]) for c in rvals],
        F.col(time_col).alias(carried[time_col]),
        F.lit(0).alias("__side"),
    )
    unioned = ldf.unionByName(rdf)
    if direction == "nearest":
        # both candidates from the SAME partitioning: ascending
        # running-last = most recent at-or-before, descending
        # running-last = earliest at-or-after. One Exchange, two
        # partition-local sorts.
        wb = (
            Window.partitionBy(*keys)
            .orderBy(F.col(time_col).asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wf = (
            Window.partitionBy(*keys)
            .orderBy(F.col(time_col).desc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        both = unioned.select(
            *keys,
            *lvals,
            F.col(time_col),
            *[
                F.last(carried[c], ignorenulls=True).over(wb).alias(f"__b_{c}")
                for c in [*rvals, time_col]
            ],
            *[
                F.last(carried[c], ignorenulls=True).over(wf).alias(f"__f_{c}")
                for c in [*rvals, time_col]
            ],
            F.col("__side"),
        ).filter(F.col("__side") == 1)
        lt = F.col(time_col)
        bt = F.col(f"__b_{time_col}")
        ft = F.col(f"__f_{time_col}")
        back_ok = bt.isNotNull()
        fwd_ok = ft.isNotNull()
        if tolerance is not None:
            back_ok = back_ok & (lt - bt <= F.lit(tolerance))
            fwd_ok = fwd_ok & (ft - lt <= F.lit(tolerance))
        use_back = back_ok & (~fwd_ok | ((lt - bt) <= (ft - lt)))
        return both.select(
            *keys,
            *lvals,
            time_col,
            *[
                F.when(use_back, F.col(f"__b_{c}"))
                .when(fwd_ok, F.col(f"__f_{c}"))
                .alias(carried[c])
                for c in [*rvals, time_col]
            ],
        )
    # at equal time the right row must sort before the left row so the
    # running window sees it (inclusive match)
    tcol = F.col(time_col) if direction == "backward" else F.col(time_col).desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(tcol, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # left rows carry their own time in time_col; right rows carry null
    # in left cols — last(ignorenulls) pulls the latest right payload
    out = unioned.select(
        *keys,
        *lvals,
        F.col(time_col),
        *[F.last(carried[c], ignorenulls=True).over(w).alias(carried[c]) for c in rvals],
        F.last(carried[time_col], ignorenulls=True).over(w).alias(carried[time_col]),
        F.col("__side"),
    ).filter(F.col("__side") == 1).drop("__side")
    if tolerance is not None:
        mt, lt = F.col(carried[time_col]), F.col(time_col)
        in_tol = (
            (lt - mt <= F.lit(tolerance))
            if direction == "backward"
            else (mt - lt <= F.lit(tolerance))
        )
        out = out.select(
            *keys,
            *lvals,
            time_col,
            *[
                F.when(in_tol, F.col(carried[c])).alias(carried[c])
                for c in [*rvals, time_col]
            ],
        )
    return out


def merge_join_range(
    left: GroupSortedFrame | DataFrame,
    right: GroupSortedFrame | DataFrame,
    time_col: str,
    *,
    low,
    high,
    keys=None,
    bucket_width=None,
    suffix: str = "_r",
) -> DataFrame:
    """Interval (range) join: all same-key pairs where
    ``low <= r.time - l.time <= high`` (inclusive; ``low <= high``,
    signs free — ``low=-3600, high=0`` is "right events up to an hour
    BEFORE each left event", the batch twin of
    ``streaming.stream_stream_join``'s time bound). Another operator
    the reference lacks (SURVEY §2.4 scopes joins to equality) but
    event pipelines need constantly (windowed feature joins,
    exposure↔outcome attribution).

    Scale design: never a cartesian and never a per-key range
    explosion. Left rows are bucketed by ``floor(time / w)`` with
    ``w >= high - low`` (default: the tightest such ``w``); each right
    row's admissible left-time interval ``[r.time - high,
    r.time - low]`` then overlaps at most TWO buckets, so the right
    side is exploded into exactly those (≤2, deduped) bucket keys and
    the join is a plain equi-join on ``(keys..., bucket)`` — native
    SortMergeJoin/broadcast under Catalyst+AQE, with the exact bound
    applied as a post-filter. Shuffle volume is ≤2× the right side
    plus 1× the left; candidate pairs are bounded by true temporal
    density (rows within ``2w`` of each other), not key cardinality.
    ``bucket_width`` widens buckets to trade fewer duplicate right
    rows for more candidate pairs (tune to data density at scale).

    Skew: a burst of traffic on one ``(key, bucket)`` cell has no
    ``max_bucket``-style cap here by design — a JOIN that silently
    drops matching pairs is wrong, unlike the LSH families where a cap
    only prunes *candidates* re-checked exactly. The designated
    mitigation is AQE skew-join (``spark.sql.adaptive.skewJoin``, on
    by default in this repo's sessions): the bucket equi-join is a
    standard SortMergeJoin, so a hot cell is just an oversized shuffle
    partition, and AQE splits those by map-output blocks — which works
    even when ALL the weight sits on a single join key. Pinned by
    ``test_merge_join_range_hot_bucket_skew`` (10x skew, exact count).
    Note the output for a genuinely dense cell is quadratic in its row
    count because those pairs truly match the predicate — that is the
    query's semantics, not a plan defect; widen ``low``/``high``
    responsibility rests with the caller.

    ``time_col`` must be numeric on both sides (epoch-micros via
    ``sources.tpch.event_ts_us`` in this repo) — bucket arithmetic on
    raw TIMESTAMP would silently depend on the session timezone.

    Unlike the equality merge joins, a key-only group-sorted layout
    does NOT co-partition this join (it shuffles on ``(keys...,
    bucket)``), so plain DataFrames + explicit ``keys=`` is the
    natural call — passing GroupSortedFrames works but their layout
    Exchange buys nothing here.
    """
    if isinstance(keys, str):
        keys = [keys]  # a bare string means ONE key, never its chars
    if isinstance(left, DataFrame):
        if keys is None:
            raise ValueError("pass keys= when joining plain DataFrames")
        left = assume_group_sorted(left, keys)
    elif keys is not None and list(keys) != list(left.key_cols):
        # silently preferring left.key_cols over an explicit keys= hid
        # caller bugs (ADVICE r5); conflicting instructions fail loudly
        raise ValueError(
            f"keys= {list(keys)} conflicts with the group-sorted left's "
            f"key columns {left.key_cols}; drop keys= or regroup"
        )
    if isinstance(right, DataFrame):
        right = assume_group_sorted(right, left.key_cols)
    keys = _check_keys(left, right)
    if low > high:
        raise ValueError(f"low ({low}) must be <= high ({high})")
    if time_col in keys:
        raise ValueError(
            f"time column {time_col!r} cannot also be a join key"
        )
    for side, gsf in (("left", left), ("right", right)):
        if time_col not in gsf.df.columns:
            raise ValueError(f"{side} side lacks time column {time_col!r}")
        dt = gsf.df.schema[time_col].dataType.simpleString()
        if dt not in ("bigint", "int", "smallint", "tinyint", "double", "float"):
            raise ValueError(
                f"{side} side time column {time_col!r} is {dt}; pass a "
                "numeric time (e.g. epoch-micros via event_ts_us)"
            )
    w = bucket_width if bucket_width is not None else max(high - low, 1)
    # w <= 0 would floor-divide by zero → NULL buckets → silently empty
    # join output under non-ANSI division; fail loudly instead
    if w <= 0 or w < high - low:
        raise ValueError(
            f"bucket_width ({w}) must be positive and >= high - low "
            f"({high - low})"
        )

    rvals = [c for c in right.df.columns if c not in keys]
    carried = {c: (c + suffix if c in left.df.columns else c) for c in rvals}

    # working-column name that cannot collide with user data
    taken = set(left.df.columns) | set(carried.values()) | set(keys)
    bucket = "__bucket"
    while bucket in taken:
        bucket += "_"

    integral = left.df.schema[time_col].dataType.simpleString() in (
        "bigint", "int", "smallint", "tinyint",
    ) and right.df.schema[time_col].dataType.simpleString() in (
        "bigint", "int", "smallint", "tinyint",
    )

    def bucket_of(col: Column) -> Column:
        # F.floor(col / w) routes int64 through double: above 2^53
        # (epoch-nanos territory) the quotient can flip near bucket
        # boundaries and silently drop matching pairs (ADVICE r5). For
        # integral times stay exact: pmod is non-negative, so
        # col - pmod(col, w) is the floor multiple of w, and dividing
        # that exact multiple in decimal(38,0) has zero fractional
        # part — no rounding to go wrong at any int64 magnitude.
        if integral:
            dec = col.cast("decimal(38,0)")
            return ((dec - F.pmod(dec, F.lit(w))) / F.lit(w)).cast("long")
        return F.floor(col / F.lit(w))

    if not integral and w >= (1 << 53):
        raise ValueError(
            f"bucket_width {w} exceeds 2^53; floating-point time columns "
            "cannot bucket exactly at that magnitude — cast to bigint"
        )

    ldf = left.df.withColumn(bucket, bucket_of(F.col(time_col)))
    b_lo = bucket_of(F.col(time_col) - F.lit(high))
    b_hi = bucket_of(F.col(time_col) - F.lit(low))
    rdf = (
        right.df.select(
            *keys,
            *[F.col(c).alias(carried[c]) for c in rvals],
            F.explode(F.array_distinct(F.array(b_lo, b_hi))).alias(bucket),
        )
    )
    rt = F.col(carried[time_col])
    return (
        ldf.join(rdf, on=[*keys, bucket], how="inner")
        .filter((rt - F.col(time_col) >= F.lit(low)) & (rt - F.col(time_col) <= F.lit(high)))
        .drop(bucket)
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    start_col: str,
    end_col: str,
    keys,
    bucket_width: int,
    right_start: str | None = None,
    right_end: str | None = None,
    suffix: str = "_r",
    max_span_buckets: int = 1024,
) -> DataFrame:
    """Interval-overlap join: all same-key pairs whose CLOSED intervals
    intersect — ``l.start <= r.end AND r.start <= l.end``. The
    two-sided sibling of :func:`merge_join_range` (point vs interval);
    this one joins interval to interval (session overlap, ad exposure
    vs outage windows, speaker-turn alignment).

    Scale design: both sides explode into the ``bucket_width``-sized
    time buckets their interval covers, and the join is a plain
    equi-join on ``(keys..., bucket)`` with the exact overlap predicate
    as a post-filter — never a per-key cartesian. A pair that shares
    several buckets is emitted ONCE without any distinct-shuffle: the
    join keeps a pair only in the bucket containing
    ``greatest(l.start, r.start)``, a point that provably lies in both
    intervals, so exactly one bucket passes. Shuffle volume is
    sum(interval span / bucket_width) per side — pick ``bucket_width``
    near the typical interval length so most intervals explode into
    1-2 buckets. An interval spanning more than ``max_span_buckets``
    buckets fails loudly at runtime (raise_error, not silent
    truncation): widen ``bucket_width`` rather than amplify one row
    thousands of times.

    Rows whose start exceeds their end are EMPTY intervals under
    closed-interval semantics: they can overlap nothing and are
    dropped (documented, not an error — feeds with open-ended or
    corrupted spans shouldn't kill the job).

    Column carrying matches the merge joins: right-side non-key
    columns that collide with left names get ``suffix``. Time columns
    must be numeric (epoch-micros via ``sources.tpch.event_ts_us``);
    integral times use exact decimal floor-division, safe at any int64
    magnitude. Skew: same story as :func:`merge_join_range` — the
    equi-join is a standard shuffle join, so AQE skew-join splits hot
    ``(key, bucket)`` cells.
    """
    # a bare string must mean ONE key, matching group_sort's contract
    # (list("user_id") silently splitting into characters is the trap)
    keys = [keys] if isinstance(keys, str) else (list(keys) if keys else [])
    if not keys:
        raise ValueError(
            "interval_overlap_join needs at least one equality key; a "
            "global interval join is all-pairs-dense at scale — add a "
            "partitioning key (or a constant column if you truly mean it)"
        )
    rs = right_start or start_col
    re_ = right_end or end_col
    for c in {start_col, end_col, rs, re_} & set(keys):
        raise ValueError(
            f"interval column {c!r} cannot also be a join key"
        )
    if bucket_width is None or bucket_width <= 0:
        raise ValueError(f"bucket_width ({bucket_width}) must be positive")
    for side, df, cols in (("left", left, (start_col, end_col)),
                           ("right", right, (rs, re_))):
        for c in cols:
            if c not in df.columns:
                raise ValueError(f"{side} side lacks interval column {c!r}")
            dt = df.schema[c].dataType.simpleString()
            if dt not in ("bigint", "int", "smallint", "tinyint",
                          "double", "float"):
                raise ValueError(
                    f"{side} side interval column {c!r} is {dt}; pass "
                    "numeric times (e.g. epoch-micros via event_ts_us)"
                )
        for k in keys:
            if k not in df.columns:
                raise ValueError(f"{side} side lacks key column {k!r}")

    integral = all(
        df.schema[c].dataType.simpleString()
        in ("bigint", "int", "smallint", "tinyint")
        for df, c in ((left, start_col), (left, end_col),
                      (right, rs), (right, re_))
    )
    if not integral and bucket_width >= (1 << 53):
        raise ValueError(
            f"bucket_width {bucket_width} exceeds 2^53; floating-point "
            "interval columns cannot bucket exactly at that magnitude"
        )
    w = bucket_width

    def bucket_of(col: Column) -> Column:
        # same exact integral floor-division as merge_join_range
        if integral:
            dec = col.cast("decimal(38,0)")
            return ((dec - F.pmod(dec, F.lit(w))) / F.lit(w)).cast("long")
        return F.floor(col / F.lit(w))

    rvals = [c for c in right.columns if c not in keys]
    carried = {c: (c + suffix if c in left.columns else c) for c in rvals}

    taken = set(left.columns) | set(carried.values()) | set(keys)
    bucket = "__bucket"
    while bucket in taken:
        bucket += "_"

    def exploded(df, s, e, rename=None):
        b_s, b_e = bucket_of(F.col(s)), bucket_of(F.col(e))
        span = b_e - b_s + 1
        seq = F.when(
            span > F.lit(max_span_buckets),
            F.raise_error(
                F.format_string(
                    "interval_overlap_join: an interval spans %s buckets "
                    + f"(max_span_buckets={max_span_buckets}); widen "
                    "bucket_width or raise the cap",
                    span.cast("string"),
                )
            ).cast("array<bigint>"),
        ).otherwise(F.sequence(b_s, b_e))
        cols = (
            [*keys, *[F.col(c).alias(rename[c]) for c in rvals]]
            if rename
            else [F.col(c) for c in df.columns]
        )
        return df.filter(F.col(s) <= F.col(e)).select(
            *cols, F.explode(seq).alias(bucket)
        )

    ldf = exploded(left, start_col, end_col)
    rdf = exploded(right, rs, re_, rename=carried)
    l_s, l_e = F.col(start_col), F.col(end_col)
    r_s, r_e = F.col(carried[rs]), F.col(carried[re_])
    return (
        ldf.join(rdf, on=[*keys, bucket], how="inner")
        .filter(
            (l_s <= r_e)
            & (r_s <= l_e)
            # single-bucket emission: greatest(starts) lies in both
            # intervals, so exactly one shared bucket passes this
            & (F.col(bucket) == bucket_of(F.greatest(l_s, r_s)))
        )
        .drop(bucket)
    )
