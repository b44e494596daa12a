"""GroupSortedFrame: the engine's core abstraction.

A PySpark-native re-expression of the reference's ``GroupSorted[K, V]``
(``/root/reference/src/main/scala/com/tresata/spark/sorted/GroupSorted.scala:13-14``):
a key-value collection that is

1. hash-partitioned by its key columns,
2. sorted by key within each partition (keys consecutive), and
3. optionally sorted by value columns *within* each key run
   (secondary sort).

Instead of a 2-column ``(K, V)`` RDD we generalize to a DataFrame with
designated ``key_cols``; all remaining columns are the "value". The
physical layout is built exactly the way the reference's Dataset API
builds it (``sql/GroupSortedDataset.scala:18``):

    df.repartition([n,] *keys).sortWithinPartitions(*keys, *value_order)

which Catalyst plans as ``Exchange(hashpartitioning(keys))`` +
``Sort(global=false)``. At 100 TB this is one sort-based shuffle; the
ExternalSorter spills, AQE coalesces/splits skewed partitions, and
every downstream per-key operator is a narrow, single-pass task.

Layout metadata (which the reference keeps on the RDD —
``GroupSorted.scala:13,19`` — and we keep on this wrapper) lets chained
operations reuse the one shuffle: Catalyst tracks outputPartitioning
across native ops, but loses it across Python UDF nodes, so the wrapper
re-asserts it (SURVEY §2.7, §4).
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Callable, Iterable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["OrderSpec", "GroupSortedFrame", "group_sort", "assume_group_sorted"]


@dataclass(frozen=True)
class OrderSpec:
    """One value-sort column: name + direction (nulls first on asc,
    last on desc — Spark's defaults, matching the reference's reliance
    on Spark SQL natural ordering, ``sql/GroupSortedDataset.scala:14-17``)."""

    col: str
    ascending: bool = True

    def expr(self) -> Column:
        c = F.col(self.col)
        return c.asc() if self.ascending else c.desc()

    def flipped(self) -> "OrderSpec":
        return OrderSpec(self.col, not self.ascending)


def _normalize_order(
    order_by: str | OrderSpec | Column | Sequence | None,
    reverse: bool,
) -> tuple[tuple[OrderSpec, ...], tuple[tuple[str, Column], ...]]:
    """Normalize the order_by argument to ``(specs, derived)``.

    A pyspark ``Column`` element (or ``(Column, asc)`` tuple) is the
    expression-valued secondary sort of the reference's ``sortBy``
    (``sql/GroupSortedDataset.scala:14-17``; exercised by
    ``GroupSortedDatasetSpec.scala:182-193`` sorting by a value derived
    from a Map column). The expression is assigned a hidden
    ``__gs_order_{i}`` column the caller materializes before the
    layout sort; downstream tiers then re-assert order by NAME exactly
    as for plain columns, and the frame's ``hidden_cols`` metadata
    keeps the helper column out of ``value_cols`` and out of
    ``to_df()``."""
    derived: list[tuple[str, Column]] = []
    if order_by is None:
        specs: list[OrderSpec] = []
    else:
        if isinstance(order_by, (str, OrderSpec, tuple, Column)):
            order_by = [order_by]
        specs = []
        for o in order_by:
            if isinstance(o, OrderSpec):
                specs.append(o)
            elif isinstance(o, str):
                specs.append(OrderSpec(o, True))
            elif isinstance(o, Column):
                name = f"__gs_order_{len(derived)}"
                derived.append((name, o))
                specs.append(OrderSpec(name, True))
            elif isinstance(o, tuple):
                name, asc = o
                if isinstance(name, Column):
                    hid = f"__gs_order_{len(derived)}"
                    derived.append((hid, name))
                    specs.append(OrderSpec(hid, bool(asc)))
                else:
                    specs.append(OrderSpec(name, bool(asc)))
            else:
                raise TypeError(f"bad order_by element: {o!r}")
    if reverse:
        specs = [s.flipped() for s in specs]
    return tuple(specs), tuple(derived)


@dataclass(frozen=True)
class GroupSortedFrame:
    """DataFrame + layout metadata. Immutable; every operator returns a
    new wrapper (or a plain DataFrame when the layout is destroyed)."""

    df: DataFrame
    key_cols: tuple[str, ...]
    order_specs: tuple[OrderSpec, ...] = ()
    num_partitions: int | None = None
    # hidden __gs_order_{i} columns materialized for expression-valued
    # order_by: part of the carried df (downstream tiers re-sort by
    # them by name) but never part of the user-visible relation
    hidden_cols: tuple[str, ...] = ()
    # which Catalyst partitioning laid the frame out: "hash" (default)
    # or "range" (global key order across partitions). Both satisfy
    # ClusteredDistribution, so every per-key operator runs shuffle-
    # free on either; co_layout replicates the scheme.
    partitioning: str = "hash"

    # -- basic plumbing -------------------------------------------------

    @property
    def value_cols(self) -> tuple[str, ...]:
        ks = set(self.key_cols) | set(self.hidden_cols)
        return tuple(c for c in self.df.columns if c not in ks)

    def to_df(self) -> DataFrame:
        if self.hidden_cols:
            return self.df.drop(*self.hidden_cols)
        return self.df

    def _rewrap(self, df: DataFrame, *, keep_order: bool) -> "GroupSortedFrame":
        return replace(
            self, df=df, order_specs=self.order_specs if keep_order else ()
        )

    def _sort_exprs(self) -> list[Column]:
        return [F.col(k).asc() for k in self.key_cols] + [
            s.expr() for s in self.order_specs
        ]

    # -- P1-P4: layout-preserving narrow ops (GroupSorted.scala:29-39) --

    def filter(self, cond: Column | str) -> "GroupSortedFrame":
        """Row predicate. Narrow; preserves partitioning, key order AND
        value order (the only op that keeps value ordering in the
        reference — ``GroupSorted.scala:29``)."""
        return self._rewrap(self.df.filter(cond), keep_order=True)

    where = filter

    def map_values(self, **exprs: Column) -> "GroupSortedFrame":
        """Add/replace value columns via native expressions
        (``mapValues``, ``GroupSorted.scala:35``). Keeps partitioning +
        key order. Value ordering survives only if no order column is
        overwritten (the reference drops it because the value *type*
        changes; column-wise we can be finer-grained)."""
        df = self.df
        for name, e in exprs.items():
            if name in self.key_cols:
                raise ValueError(f"map_values may not overwrite key column {name!r}")
            df = df.withColumn(name, e)
        touched = set(exprs) & {s.col for s in self.order_specs}
        return self._rewrap(df, keep_order=not touched)

    def select_values(self, *cols: str | Column) -> "GroupSortedFrame":
        """Project to keys + the given value columns (column pruning —
        reaches the parquet scan when applied before the shuffle)."""
        df = self.df.select(*self.key_cols, *cols)
        kept = set(df.columns)
        keep_order = all(s.col in kept for s in self.order_specs)
        return self._rewrap(df, keep_order=keep_order)

    def flat_map_values(
        self, expr: Column, alias: str, outer: bool = False
    ) -> "GroupSortedFrame":
        """0..n output rows per input row via explode of an array/map
        expression (``flatMapValues``, ``GroupSorted.scala:33``). Keeps
        key layout; drops value ordering (row multiplicity changed)."""
        fn = F.explode_outer if outer else F.explode
        df = self.df.select(*self.key_cols, fn(expr).alias(alias))
        return self._rewrap(df, keep_order=False)

    def map_key_values_to_values(
        self, *exprs: Column, keep: Sequence[str] = ()
    ) -> "GroupSortedFrame":
        """Compute new value columns that may reference the key
        (``mapKeyValuesToValues``, ``GroupSorted.scala:39``)."""
        df = self.df.select(*self.key_cols, *keep, *exprs)
        kept = set(df.columns)
        keep_order = all(s.col in kept for s in self.order_specs)
        return self._rewrap(df, keep_order=keep_order)

    # -- per-key streaming ops (operators/) -----------------------------

    def map_stream_by_key(self, func, schema, tier: str = "auto", context=None):
        from .operators.map_stream import map_stream_by_key

        return map_stream_by_key(self, func, schema, tier=tier, context=context)

    def fold_left_by_key(self, zero, merge, **kw):
        from .operators.folds import fold_left_by_key

        return fold_left_by_key(self, zero, merge, **kw)

    def reduce_left_by_key(self, merge, **kw):
        from .operators.folds import reduce_left_by_key

        return reduce_left_by_key(self, merge, **kw)

    def scan_left_by_key(self, zero, merge, **kw):
        from .operators.folds import scan_left_by_key

        return scan_left_by_key(self, zero, merge, **kw)

    def take_by_key(self, n: int, tier: str = "native"):
        from .operators.map_stream import take_by_key

        return take_by_key(self, n, tier=tier)

    def co_layout(self, df: DataFrame, order_by=None) -> "GroupSortedFrame":
        """C5 (``groupSort(other)``, ``PairRDDFunctions.scala:31``):
        lay out another DataFrame with THIS frame's keys and partition
        count, so a subsequent join/zip plans no re-shuffle of either
        side (Catalyst ``EnsureRequirements`` sees matching
        ``HashPartitioning``)."""
        return group_sort(
            df,
            self.key_cols,
            order_by=order_by,
            num_partitions=self.num_partitions,
            partition_by=self.partitioning,
        )

    def combine_by_key(self, *aggs: Column) -> DataFrame:
        """C3/C4 combiner path (``groupSort(createCombiner, mergeValue,
        mergeCombiners)``, ``PairRDDFunctions.scala:33-42``): a native
        aggregation over the keys. Catalyst plans partial + final
        HashAggregate — the exact analogue of the reference's
        ``setMapSideCombine(true)`` (``GroupSorted.scala:140-144``).
        Pass ordinary agg Columns (``F.sum(...).alias(...)``, ...);
        for skewed keys see ``operators.skew.salted_agg``."""
        return self.df.groupBy(*self.key_cols).agg(*aggs)

    # -- joins / set ops ------------------------------------------------

    def merge_join_inner(self, other, **kw):
        from .operators.joins import merge_join

        return merge_join(self, other, how="inner", **kw)

    def merge_join_left_outer(self, other, **kw):
        from .operators.joins import merge_join

        return merge_join(self, other, how="left", **kw)

    def merge_join_right_outer(self, other, **kw):
        from .operators.joins import merge_join

        return merge_join(self, other, how="right", **kw)

    def merge_join(self, other, **kw):
        from .operators.joins import merge_join

        return merge_join(self, other, how="full", **kw)

    def merge_join_semi(self, other, **kw):
        from .operators.joins import merge_join

        return merge_join(self, other, how="left_semi", **kw)

    def merge_join_anti(self, other, **kw):
        from .operators.joins import merge_join

        return merge_join(self, other, how="left_anti", **kw)

    def merge_join_asof(self, other, time_col, **kw):
        from .operators.joins import merge_join_asof

        return merge_join_asof(self, other, time_col, **kw)

    def merge_join_range(self, other, time_col, **kw):
        from .operators.joins import merge_join_range

        return merge_join_range(self, other, time_col, **kw)

    def merge_join_custom(self, other, func, schema, tier: str = "pandas"):
        from .operators.joins import merge_join_custom

        return merge_join_custom(self, other, func, schema, tier=tier)

    def merge_union(self, other):
        from .operators.union import merge_union

        return merge_union(self, other)

    def merge_intersect(self, other, distinct: bool = True):
        from .operators.union import merge_intersect

        return merge_intersect(self, other, distinct)

    def merge_except(self, other, distinct: bool = False):
        from .operators.union import merge_except

        return merge_except(self, other, distinct)

    # -- reuse ----------------------------------------------------------

    def persist(self, storage_level=None) -> "GroupSortedFrame":
        """Cache the laid-out frame for reuse across several per-key
        operators (pays the shuffle once, reads it many times — the
        idiom the reference enables via RDD lineage reuse,
        ``README.md:37``)."""
        if storage_level is not None:
            self.df.persist(storage_level)
        else:
            self.df.persist()
        return self

    def unpersist(self) -> "GroupSortedFrame":
        self.df.unpersist()
        return self

    # -- introspection --------------------------------------------------

    def explain(self, mode: str = "formatted") -> None:
        self.df.explain(mode)


def group_sort(
    df: DataFrame,
    keys: str | Sequence[str],
    order_by: str | OrderSpec | Sequence | None = None,
    num_partitions: int | None = None,
    reverse: bool = False,
    partition_by: str = "hash",
) -> GroupSortedFrame:
    """Build the group-sorted layout: one hash shuffle on ``keys`` plus
    a partition-local sort on ``(keys, order_by)``.

    Mirrors the reference's construction for every ``groupSort``
    overload (``PairRDDFunctions.scala:14-29`` for the RDD path — where
    the secondary sort is pushed into the shuffle,
    ``GroupSorted.scala:111-124`` — and ``sql/GroupSortedDataset.scala:18``
    for the Dataset path, which accepts the same post-shuffle local
    sort trade-off we do, per ``README.md:45``). Spark's sort-based
    shuffle + ExternalSorter spill to disk, so this scales to groups
    and partitions far larger than executor memory.

    ``order_by`` also accepts pyspark ``Column`` expressions (the
    reference's expression-valued ``sortBy``,
    ``sql/GroupSortedDataset.scala:14-17``) — each is materialized as
    a hidden ``__gs_order_{i}`` column (a narrow projection, computed
    once, sorted like any named column) that rides the frame for the
    downstream tiers' re-sorts but never appears in ``value_cols`` or
    ``to_df()``. NB: per-group UDF tiers (map_stream / merge_join_
    custom) see the hidden column in their input frames.

    ``partition_by`` maps the reference's custom-``Partitioner``
    overloads (``PairRDDFunctions.scala:14-29``) onto the TWO
    partitionings Catalyst recognizes: ``"hash"`` (default — the
    co-partitioned-join / AQE-skew workhorse) and ``"range"``
    (``repartitionByRange``: sampled boundaries give GLOBAL key order
    across partitions — the classic use of a custom RangePartitioner,
    e.g. producing a totally-ordered/sorted-file layout). Both satisfy
    ``ClusteredDistribution`` (equal keys share a partition), so every
    per-key operator runs shuffle-free on either layout; range's
    boundaries are sample-derived, so two separately range-laid frames
    are NOT co-partitioned for joins — keep hash for join-prep.
    Deliberate non-goal: OPAQUE user partition functions. In the
    DataFrame world the optimizer owns partitioning —
    EnsureRequirements/AQE match, coalesce, and split exchanges by
    recognizing the standard partitionings; an opaque custom
    partitioner would forfeit exactly those properties.
    Multi-column locality layouts are served by
    ``functions.layout.zorder_layout``."""
    if isinstance(keys, str):
        keys = [keys]
    keys = tuple(keys)
    if not keys:
        raise ValueError("group_sort requires at least one key column")
    missing = [k for k in keys if k not in df.columns]
    if missing:
        raise ValueError(f"key columns not in DataFrame: {missing}")
    specs, derived = _normalize_order(order_by, reverse)
    for name, expr in derived:
        if name in df.columns:
            raise ValueError(f"column {name!r} collides with a hidden sort column")
        df = df.withColumn(name, expr)
    hidden = tuple(name for name, _ in derived)
    missing_order = [s.col for s in specs if s.col not in df.columns]
    if missing_order:
        raise ValueError(f"order_by columns not in DataFrame: {missing_order}")
    key_exprs = [F.col(k) for k in keys]
    if partition_by == "hash":
        laid = (
            df.repartition(num_partitions, *key_exprs)
            if num_partitions
            else df.repartition(*key_exprs)
        )
    elif partition_by == "range":
        laid = (
            df.repartitionByRange(num_partitions, *key_exprs)
            if num_partitions
            else df.repartitionByRange(*key_exprs)
        )
    else:
        raise ValueError(
            f"partition_by must be 'hash' or 'range', got {partition_by!r}"
        )
    sort_exprs = [F.col(k).asc() for k in keys] + [s.expr() for s in specs]
    laid = laid.sortWithinPartitions(*sort_exprs)
    return GroupSortedFrame(laid, keys, specs, num_partitions, hidden, partition_by)


def assume_group_sorted(
    df: DataFrame,
    keys: str | Sequence[str],
    order_by=None,
    num_partitions: int | None = None,
    reverse: bool = False,
    partition_by: str = "hash",
) -> GroupSortedFrame:
    """Wrap a DataFrame already known to satisfy the layout invariants
    WITHOUT planning a shuffle (the analogue of the reference trusting
    ``preservesPartitioning=true`` chains, ``GroupSorted.scala:39-43``).
    Use when a layout-preserving op (e.g. mapInPandas over group-sorted
    partitions) produced ``df`` — Catalyst can't see that, we can."""
    if isinstance(keys, str):
        keys = [keys]
    if partition_by not in ("hash", "range"):
        raise ValueError(
            f"partition_by must be 'hash' or 'range', got {partition_by!r}"
        )
    specs, derived = _normalize_order(order_by, reverse)
    # Column-valued order: materialize the hidden sort column (narrow,
    # no shuffle — consistent with this function's no-layout contract;
    # the DATA must already be ordered by the expression, we just give
    # the tiers a named column to re-assert it with)
    for name, expr in derived:
        df = df.withColumn(name, expr)
    return GroupSortedFrame(
        df,
        tuple(keys),
        specs,
        num_partitions,
        tuple(name for name, _ in derived),
        partition_by,
    )
