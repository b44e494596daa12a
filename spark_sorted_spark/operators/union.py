"""merge_union (S1) and the trivial set ops the reference omits.

The reference's ``mergeUnion`` (``GroupSorted.scala:100-103``, engine
``package.scala:147-173``) bag-unions two co-partitioned group-sorted
RDDs by zipping partitions pairwise and merging the two sorted runs —
no shuffle, result stays group-sorted.

DataFrame Spark cannot express a partition-wise zip (``zipPartitions``
is RDD-only, and round-tripping PySpark rows through RDD serde would
cost more than the shuffle it saves). Two honest alternatives:

* ``merge_union`` (default) — ``unionByName`` + full re-layout
  (``group_sort``). One shuffle; duplicate-preserving; invariants hold.
  A plain ``unionByName`` would silently break key-disjointness — the
  union's partition list is the concatenation of both inputs', so
  every shared key would live in two partitions.
* ``merge_union_cogroup`` — exchange-free when both sides are already
  co-partitioned on the key with equal partition counts:
  ``cogroup().applyInPandas`` concatenates each key's two (sorted)
  halves. Catalyst plans no new Exchange (EnsureRequirements sees both
  children hash-partitioned), at the price of an Arrow round-trip and
  per-key materialization. Worth it only when shuffling the combined
  data would dominate — e.g. union of two already-laid-out 50 TB
  inputs feeding a narrow per-key op.
"""

from __future__ import annotations

from dataclasses import replace

import pandas as pd

from ..core import GroupSortedFrame, assume_group_sorted, group_sort

__all__ = ["merge_union", "merge_union_cogroup"]


def _check(left: GroupSortedFrame, right: GroupSortedFrame) -> None:
    if left.key_cols != right.key_cols:
        raise ValueError(
            f"merge_union requires identical key columns: "
            f"{left.key_cols} vs {right.key_cols}"
        )
    if set(left.df.columns) != set(right.df.columns):
        raise ValueError("merge_union requires identical column sets")


def _aligned(left: GroupSortedFrame, right: GroupSortedFrame):
    """Shared order/hidden handling for the union family: when the two
    sides agree on order specs, the (already identically named) hidden
    expression-order columns ride through and stay layout metadata on
    the result; when they disagree, order is dropped and the hidden
    columns are dropped WITH it (they exist only to carry the order)."""
    if left.order_specs == right.order_specs:
        return left, right, left.order_specs, left.hidden_cols
    ldrop = (
        replace(left, df=left.df.drop(*left.hidden_cols), hidden_cols=())
        if left.hidden_cols
        else left
    )
    rdrop = (
        replace(right, df=right.df.drop(*right.hidden_cols), hidden_cols=())
        if right.hidden_cols
        else right
    )
    return ldrop, rdrop, (), ()


def merge_union(left: GroupSortedFrame, right: GroupSortedFrame) -> GroupSortedFrame:
    left, right, specs, hidden = _aligned(left, right)
    _check(left, right)
    out = group_sort(
        left.df.unionByName(right.df),
        left.key_cols,
        order_by=[(s.col, s.ascending) for s in specs],
        num_partitions=left.num_partitions,
    )
    return replace(out, hidden_cols=hidden)


def merge_union_cogroup(
    left: GroupSortedFrame, right: GroupSortedFrame
) -> GroupSortedFrame:
    left, right, specs, hidden = _aligned(left, right)
    _check(left, right)
    keys = list(left.key_cols)
    cols = left.df.columns
    sort_cols = [s.col for s in specs]
    sort_asc = [s.ascending for s in specs]
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in left.df.schema.fields
    )

    def apply(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        out = pd.concat([lpdf, rpdf[lpdf.columns]], ignore_index=True)
        if sort_cols:
            out = out.sort_values(sort_cols, ascending=sort_asc, kind="stable")
        return out

    merged = (
        left.df.groupby(*keys)
        .cogroup(right.df.select(*cols).groupby(*keys))
        .applyInPandas(apply, schema)
    )
    out = assume_group_sorted(
        merged, left.key_cols, order_by=[(s.col, s.ascending) for s in specs]
    )
    return replace(out, hidden_cols=hidden)


def merge_intersect(
    left: GroupSortedFrame, right: GroupSortedFrame, distinct: bool = True
) -> GroupSortedFrame:
    """Set intersection on full rows (reference omits it, SURVEY §2.5).
    Distinct semantics use Catalyst's native ``Intersect`` (planned as
    an aggregate + join — one shuffle on all columns); ``distinct=False``
    gives bag semantics (``intersectAll``). Result is re-wrapped on the
    same keys; value ordering is gone (hash layout on all cols).

    Hidden expression-order columns are dropped from BOTH sides before
    comparing: set ops compare full rows, and a layout-metadata column
    must not participate in row equality (it is a deterministic
    function of the visible row, so dropping it never changes the
    result set — it only keeps the comparison honest)."""
    left = replace(left, df=left.df.drop(*left.hidden_cols), hidden_cols=())
    right = replace(right, df=right.df.drop(*right.hidden_cols), hidden_cols=())
    _check(left, right)
    df = (
        left.df.intersect(right.df) if distinct else left.df.intersectAll(right.df)
    )
    return assume_group_sorted(df, left.key_cols)


def merge_except(
    left: GroupSortedFrame, right: GroupSortedFrame, distinct: bool = False
) -> GroupSortedFrame:
    """Set difference (bag semantics by default — ``exceptAll`` keeps
    surplus duplicates, matching multiset subtraction). Hidden
    expression-order columns are dropped first (see merge_intersect)."""
    left = replace(left, df=left.df.drop(*left.hidden_cols), hidden_cols=())
    right = replace(right, df=right.df.drop(*right.hidden_cols), hidden_cols=())
    _check(left, right)
    df = left.df.exceptAll(right.df) if not distinct else left.df.subtract(right.df)
    return assume_group_sorted(df, left.key_cols)
