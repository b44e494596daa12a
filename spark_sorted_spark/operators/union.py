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


def merge_union(left: GroupSortedFrame, right: GroupSortedFrame) -> GroupSortedFrame:
    _check(left, right)
    specs = left.order_specs if left.order_specs == right.order_specs else ()
    return group_sort(
        left.df.unionByName(right.df),
        left.key_cols,
        order_by=[(s.col, s.ascending) for s in specs],
        num_partitions=left.num_partitions,
    )


def merge_union_cogroup(
    left: GroupSortedFrame, right: GroupSortedFrame
) -> GroupSortedFrame:
    _check(left, right)
    keys = list(left.key_cols)
    cols = left.df.columns
    specs = left.order_specs if left.order_specs == right.order_specs else ()
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
    return assume_group_sorted(
        merged, left.key_cols, order_by=[(s.col, s.ascending) for s in specs]
    )


def merge_intersect(
    left: GroupSortedFrame, right: GroupSortedFrame, distinct: bool = True
) -> GroupSortedFrame:
    """Set intersection on full rows (reference omits it, SURVEY §2.5).
    Distinct semantics use Catalyst's native ``Intersect`` (planned as
    an aggregate + join — one shuffle on all columns); ``distinct=False``
    gives bag semantics (``intersectAll``). Result is re-wrapped on the
    same keys; value ordering is gone (hash layout on all cols)."""
    _check(left, right)
    df = (
        left.df.intersect(right.df) if distinct else left.df.intersectAll(right.df)
    )
    return assume_group_sorted(df, left.key_cols)


def merge_except(
    left: GroupSortedFrame, right: GroupSortedFrame, distinct: bool = False
) -> GroupSortedFrame:
    """Set difference (bag semantics by default — ``exceptAll`` keeps
    surplus duplicates, matching multiset subtraction)."""
    _check(left, right)
    df = left.df.exceptAll(right.df) if not distinct else left.df.subtract(right.df)
    return assume_group_sorted(df, left.key_cols)
