"""Custom stateful streaming operator: per-key incremental left fold.

This is ``fold_left_by_key`` (the reference's ``foldLeftByKey``,
``GroupSorted.scala:45-48``) lifted to an unbounded stream: the
accumulator lives in the executor state store keyed by the group key,
each micro-batch folds its new rows in (in event-time order *within*
the batch), and the updated per-key value is emitted every batch.

Ordering contract (the honest streaming version of the batch
order-sensitivity guarantee): rows are folded in ``order_by`` order
within each micro-batch, and micro-batches fold in arrival order. For
a bounded source drained in one ``availableNow`` batch this is exactly
the batch fold; on a live stream it is fold-by-arrival with per-batch
event-time ordering — late rows fold late. An order-insensitive
(commutative) ``step`` is exact regardless.

Implementation: ``applyInPandasWithState`` — Arrow-batched, state is a
single-row tuple, no per-row Python dispatch beyond the fold itself.
"""

from __future__ import annotations

import pickle
from collections.abc import Callable, Sequence
from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_SCALAR_DDL = {float: "double", int: "bigint", str: "string", bool: "boolean"}


def stream_fold_by_key(
    sdf: DataFrame,
    keys: str | Sequence[str],
    zero: Any,
    step: Callable[[Any, Any], Any],
    *,
    value_col: str,
    alias: str = "fold",
    order_by: Sequence = (),
    state_ddl: str | None = None,
    step_vec: Callable | None = None,
) -> DataFrame:
    """Streaming per-key left fold. Returns an update-mode streaming
    DataFrame ``(keys..., alias)`` with one row per key per micro-batch
    in which the key saw data.

    ``state_ddl`` overrides the state-store column type for the
    accumulator (e.g. ``"array<double>"`` keeps a typed column all the
    way through); accumulators that aren't Spark scalars and have no
    ``state_ddl`` round-trip through pickle — in that case the output
    column is named ``{alias}_pickled`` (type ``binary``) so callers
    can't mistake the bytes for a value. ``step_vec(acc, series)``
    is the vectorized per-batch fast path (e.g. running sum:
    ``lambda a, s: a + s.sum()``).

    ``order_by`` takes the same forms as ``group_sort``: column
    names, ``(name, ascending)`` pairs, or pyspark ``Column``
    expressions (materialized as hidden columns on the stream; they
    feed the within-batch sort and never reach the output)."""
    if isinstance(keys, str):
        keys = [keys]
    keys = list(keys)
    from ..core import _normalize_order

    specs, derived = _normalize_order(list(order_by), reverse=False)
    for name, expr in derived:
        sdf = sdf.withColumn(name, expr)
    fields = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
    missing = [
        c
        for c in [*keys, value_col, *[s.col for s in specs]]
        if c not in fields
    ]
    if missing:
        raise ValueError(f"columns not in stream: {missing}")

    ddl = state_ddl or _SCALAR_DDL.get(type(zero), "binary")
    pickled = ddl == "binary"
    if pickled:
        alias = f"{alias}_pickled"
    out_schema = ", ".join(
        [f"{k} {fields[k]}" for k in keys] + [f"{alias} {ddl if not pickled else 'binary'}"]
    )
    state_schema = f"acc {ddl}"
    sort_cols = [s.col for s in specs]
    sort_asc = [s.ascending for s in specs]

    def fold_key(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            (raw,) = state.get
            acc = pickle.loads(raw) if pickled else raw
        else:
            acc = pickle.loads(pickle.dumps(zero)) if pickled else zero
        batch = pd.concat(list(pdfs), ignore_index=True)
        if sort_cols:
            batch = batch.sort_values(
                sort_cols, ascending=sort_asc, kind="mergesort"
            )
        if step_vec is not None:
            acc = step_vec(acc, batch[value_col])
        else:
            for v in batch[value_col]:
                acc = step(acc, v)
        stored = pickle.dumps(acc) if pickled else acc
        state.update((stored,))
        yield pd.DataFrame(
            {**{k: [key[i]] for i, k in enumerate(keys)}, alias: [stored]}
        )

    return sdf.groupBy(*keys).applyInPandasWithState(
        fold_key,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
