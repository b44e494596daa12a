"""Skew-aware aggregation: salted two-stage partial aggregation.

At 100 TB a handful of hot keys (one user with 10^9 events, one
order with 10^6 lines) turn a single reducer into the job's critical
path. AQE's skew-join splitting handles *joins*; for aggregations the
classic fix is salting: spray each hot key across ``salt`` sub-keys,
partially aggregate, then merge the partials in a second (tiny)
aggregation. Valid whenever the merge is associative+commutative —
exactly the contract of the reference's combiner path
(``groupSort(createCombiner, mergeValue, mergeCombiners)``,
``PairRDDFunctions.scala:33-42``); order-sensitive folds can NOT be
salted (their order crosses salt boundaries) and keep the
group-sorted path.

Note Spark already does map-side partial aggregation (HashAggregate
partial/final), which removes most skew pressure when the map-side
reduction is effective. Salting matters when it isn't: high-cardinality
accumulators (collect_set, approx distinct sketches) or extreme
single-key skew where even the *final* per-key state is hot. We salt
the final aggregation itself.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class SaltedAgg:
    """One aggregate expressed as (partial expr, merge expr). The
    partial runs per (key, salt); the merge combines the ``salt``
    partial rows per key."""

    def __init__(self, partial: Column, merge):
        self.partial = partial
        self.merge = merge  # Callable[[str], Column]: partial col name -> Column


def _builtin(name: str, col: str) -> SaltedAgg:
    fns = {
        "sum": (F.sum, F.sum),
        "count": (F.count, F.sum),
        "min": (F.min, F.min),
        "max": (F.max, F.max),
    }
    if name not in fns:
        raise ValueError(
            f"salted_agg supports {sorted(fns)} (associative+commutative); "
            f"got {name!r}"
        )
    p, m = fns[name]
    return SaltedAgg(p(col), lambda c: m(c))


def salted_agg(
    df: DataFrame,
    keys: str | Sequence[str],
    aggs: Mapping[str, tuple[str, str] | SaltedAgg],
    salt: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``aggs`` maps output column name to either ``("sum"|"count"|"min"|
    "max", col)`` or a custom :class:`SaltedAgg`. Stage 1 sprays each
    row to one of ``salt`` sub-keys via
    ``monotonically_increasing_id() % salt`` — deterministic per task
    layout, uniform within a partition, and salt-invariant for the
    associative+commutative aggregates supported here — and aggregates
    by ``(keys, __salt)``. Stage 2 merges the ≤ ``salt`` partial rows
    per key — trivially small regardless of how hot the key was.
    """
    if isinstance(keys, str):
        keys = [keys]
    keys = list(keys)
    specs = {
        out: (a if isinstance(a, SaltedAgg) else _builtin(*a))
        for out, a in aggs.items()
    }
    salted = df.withColumn(
        "__salt", (F.monotonically_increasing_id() % salt).cast("int")
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        *[s.partial.alias(f"__p_{out}") for out, s in specs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[s.merge(f"__p_{out}").alias(out) for out, s in specs.items()]
    )
