"""Order-sensitive per-key folds: fold_left / reduce_left / scan_left.

Reference semantics (``GroupSorted.scala:45-55`` +
``sql/GroupSortedDataset.scala:35-46``):

* ``foldLeftByKey(w)(f)``  — left fold over each key's value stream in
  value order, exactly 1 output row per key; the zero ``w`` is
  re-created fresh per key so mutable zeros are safe
  (``newWCreate``, ``package.scala:175-182``).
* ``reduceLeftByKey(f)``   — same but the first value seeds the fold.
* ``scanLeftByKey(w)(f)``  — per-key prefix scan emitting **n+1 rows
  including the leading zero row** (pinned by the reference tests
  ``GroupSortedSpec.scala:169-186``). We add an explicit ``i`` column
  (0 for the zero row, 1..n after) so results are well-defined
  relations rather than order-dependent streams.

Each operator has up to three physical tiers:

* ``native``  — pure Catalyst: ``groupBy(keys).agg(F.aggregate(
  F.array_sort(F.collect_list(struct(order..., value))), zero, merge))``.
  Whole-stage codegen, partial aggregation of the list builds, no
  Python. Materializes each group as an in-memory array, so it's the
  fast path for bounded group sizes (the common case).
* ``pandas``  — ``applyInPandas``: materializes each group as a pandas
  DataFrame. For arbitrary Python ``merge``.
* ``stream``  — ``mapInPandas`` over the group-sorted partitions via
  the streaming engine: O(chunk) memory per key regardless of group
  size — the faithful port of the reference's never-materialize design
  (``README.md:4``) and the only tier that survives a single key with
  10^9 rows at 100 TB scale.

A merge given as a Column-lambda ``(acc: Column, v: Column) -> Column``
selects the native tier under ``tier="auto"``; a plain Python callable
selects ``stream``.
"""

from __future__ import annotations

import copy
from typing import Any, Callable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..core import GroupSortedFrame
from .streaming_engine import iter_key_runs, run_fold_partition

__all__ = ["fold_left_by_key", "reduce_left_by_key", "scan_left_by_key"]


def _is_column_lambda(merge: Callable) -> bool:
    try:
        res = merge(F.lit(0), F.lit(0))
        return isinstance(res, Column)
    except Exception:
        return False


def _python_type_ddl(zero: Any) -> str:
    if isinstance(zero, bool):
        return "boolean"
    if isinstance(zero, int):
        return "bigint"
    if isinstance(zero, float):
        return "double"
    if isinstance(zero, str):
        return "string"
    if isinstance(zero, (list, tuple)):
        return "array<string>"
    raise TypeError(
        f"cannot infer result type for zero {zero!r}; pass result_type="
    )


def _sorted_value_array(gsf: GroupSortedFrame, value_col: str) -> tuple[Column, str]:
    """``array_sort(collect_list(struct(order..., value)))`` — the
    native re-creation of per-key value order after the groupBy (which
    Catalyst is free to not preserve). All-ascending or all-descending
    order specs only; mixed directions take the pandas/stream tier."""
    specs = gsf.order_specs
    ascs = {s.ascending for s in specs}
    if len(ascs) > 1:
        raise ValueError("mixed asc/desc order not supported in native tier")
    fields = [F.col(s.col).alias(f"__o{i}") for i, s in enumerate(specs)]
    fields.append(F.col(value_col).alias("__v"))
    arr = F.array_sort(F.collect_list(F.struct(*fields)))
    if specs and not specs[0].ascending:
        arr = F.reverse(arr)
    return arr, "__v"


def _keys_struct_df(keys: tuple, key_cols: tuple[str, ...]) -> dict:
    return {k: v for k, v in zip(key_cols, keys)}


def _key_schema_ddl(df: DataFrame, key_cols: tuple[str, ...]) -> str:
    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    return ", ".join(f"{k} {fields[k]}" for k in key_cols)


def fold_left_by_key(
    gsf: GroupSortedFrame,
    zero: Any,
    merge: Callable,
    value_col: str | None = None,
    alias: str = "fold",
    tier: str = "auto",
    result_type: str | None = None,
) -> DataFrame:
    value_col = value_col or gsf.value_cols[-1]
    if tier == "auto":
        tier = "native" if _is_column_lambda(merge) else "stream"

    if tier == "native":
        arr, vfield = _sorted_value_array(gsf, value_col)
        zero_col = zero if isinstance(zero, Column) else F.lit(zero)
        agg = F.aggregate(arr, zero_col, lambda acc, s: merge(acc, s[vfield]))
        return gsf.df.groupBy(*gsf.key_cols).agg(agg.alias(alias))

    rtype = result_type or _python_type_ddl(zero)
    out_schema = f"{_key_schema_ddl(gsf.df, gsf.key_cols)}, {alias} {rtype}"
    key_cols, kc = gsf.key_cols, list(gsf.key_cols)

    if tier == "pandas":
        sort_cols = [s.col for s in gsf.order_specs]
        sort_asc = [s.ascending for s in gsf.order_specs]

        def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
            if sort_cols:
                pdf = pdf.sort_values(sort_cols, ascending=sort_asc, kind="stable")
            acc = copy.deepcopy(zero)
            for v in pdf[value_col]:
                acc = merge(acc, v)
            head = pdf.iloc[0]
            row = {k: [head[k]] for k in kc}
            row[alias] = [acc]
            return pd.DataFrame(row)

        return gsf.df.groupBy(*kc).applyInPandas(per_group, out_schema)

    if tier == "stream":

        def part(batches):
            def step(acc, chunk: pd.DataFrame):
                for v in chunk[value_col]:
                    acc = merge(acc, v)
                return acc

            def emit(key, acc):
                row = _keys_struct_df(key, key_cols)
                row[alias] = acc
                return pd.DataFrame({k: [v] for k, v in row.items()})

            yield from run_fold_partition(
                batches, key_cols, lambda _k: copy.deepcopy(zero), step, emit
            )

        return gsf.df.mapInPandas(part, out_schema)

    raise ValueError(f"unknown tier {tier!r}")


def reduce_left_by_key(
    gsf: GroupSortedFrame,
    merge: Callable,
    value_col: str | None = None,
    alias: str = "reduce",
    tier: str = "auto",
    result_type: str | None = None,
) -> DataFrame:
    """Left reduce: the first value (in value order) seeds the fold
    (``GroupSorted.scala:50``). Every key has >= 1 row, so no empty-group
    case exists (same argument as the reference)."""
    value_col = value_col or gsf.value_cols[-1]
    if tier == "auto":
        tier = "native" if _is_column_lambda(merge) else "stream"

    if tier == "native":
        arr, vfield = _sorted_value_array(gsf, value_col)
        agg = F.aggregate(
            F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))),
            F.element_at(arr, 1)[vfield],
            lambda acc, s: merge(acc, s[vfield]),
        )
        return gsf.df.groupBy(*gsf.key_cols).agg(agg.alias(alias))

    vtype = {f.name: f.dataType.simpleString() for f in gsf.df.schema.fields}[
        value_col
    ]
    rtype = result_type or vtype
    out_schema = f"{_key_schema_ddl(gsf.df, gsf.key_cols)}, {alias} {rtype}"
    key_cols, kc = gsf.key_cols, list(gsf.key_cols)
    _SENTINEL = object()

    if tier == "pandas":
        sort_cols = [s.col for s in gsf.order_specs]
        sort_asc = [s.ascending for s in gsf.order_specs]

        def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
            if sort_cols:
                pdf = pdf.sort_values(sort_cols, ascending=sort_asc, kind="stable")
            acc = _SENTINEL
            for v in pdf[value_col]:
                acc = v if acc is _SENTINEL else merge(acc, v)
            head = pdf.iloc[0]
            row = {k: [head[k]] for k in kc}
            row[alias] = [acc]
            return pd.DataFrame(row)

        return gsf.df.groupBy(*kc).applyInPandas(per_group, out_schema)

    if tier == "stream":

        def part(batches):
            def step(acc, chunk: pd.DataFrame):
                for v in chunk[value_col]:
                    acc = v if acc is _SENTINEL else merge(acc, v)
                return acc

            def emit(key, acc):
                row = _keys_struct_df(key, key_cols)
                row[alias] = acc
                return pd.DataFrame({k: [v] for k, v in row.items()})

            yield from run_fold_partition(
                batches, key_cols, lambda _k: _SENTINEL, step, emit
            )

        return gsf.df.mapInPandas(part, out_schema)

    raise ValueError(f"unknown tier {tier!r}")


def scan_left_by_key(
    gsf: GroupSortedFrame,
    zero: Any,
    merge: Callable,
    value_col: str | None = None,
    alias: str = "scan",
    tier: str = "auto",
    result_type: str | None = None,
    index_col: str = "i",
) -> DataFrame:
    """Per-key prefix scan, n+1 rows per key INCLUDING the leading zero
    row (Scala ``scanLeft`` semantics, ``GroupSorted.scala:52-55``;
    pinned by ``GroupSortedSpec.scala:169-186``). ``index_col`` holds
    0 for the zero row, then 1..n in value order, making the output a
    well-defined relation. No native tier: Spark has no scan HOF and
    window functions can't emit the synthetic zero row — this is
    exactly the "hard part (b)" called out in SURVEY §7."""
    value_col = value_col or gsf.value_cols[-1]
    if tier in ("auto", "native"):
        tier = "stream"
    rtype = result_type or _python_type_ddl(zero)
    out_schema = (
        f"{_key_schema_ddl(gsf.df, gsf.key_cols)}, {index_col} bigint, {alias} {rtype}"
    )
    key_cols, kc = gsf.key_cols, list(gsf.key_cols)

    if tier == "pandas":
        sort_cols = [s.col for s in gsf.order_specs]
        sort_asc = [s.ascending for s in gsf.order_specs]

        def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
            if sort_cols:
                pdf = pdf.sort_values(sort_cols, ascending=sort_asc, kind="stable")
            acc = copy.deepcopy(zero)
            accs, idxs = [acc], [0]
            for i, v in enumerate(pdf[value_col], start=1):
                acc = merge(acc, v)
                accs.append(acc)
                idxs.append(i)
            head = pdf.iloc[0]
            row = {k: [head[k]] * len(accs) for k in kc}
            row[index_col] = idxs
            row[alias] = accs
            return pd.DataFrame(row)

        return gsf.df.groupBy(*kc).applyInPandas(per_group, out_schema)

    if tier == "stream":
        # Emits per input chunk (not per key), so a key with 10^9 rows
        # streams through in O(chunk) memory — rows are never buffered
        # for the whole key. `merge` must return a fresh accumulator
        # rather than mutating in place (same contract as Scala's fold).

        def part(batches):
            for key, chunks in iter_key_runs(batches, key_cols):
                acc = copy.deepcopy(zero)
                i = 0
                for chunk in chunks:
                    idxs, accs = [], []
                    if i == 0:  # leading zero row, once per key
                        idxs.append(0)
                        accs.append(acc)
                    for v in chunk[value_col]:
                        i += 1
                        acc = merge(acc, v)
                        idxs.append(i)
                        accs.append(acc)
                    out = {k: [key[j]] * len(idxs) for j, k in enumerate(key_cols)}
                    out[index_col] = idxs
                    out[alias] = accs
                    yield pd.DataFrame(out)

        return gsf.df.mapInPandas(part, out_schema)

    raise ValueError(f"unknown tier {tier!r}")
