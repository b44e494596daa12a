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

Each operator has up to three physical tiers — with DIFFERENT memory
models; the distinction is the whole point of the reference
(``README.md:4``: never materialize the group):

* ``native``  — pure Catalyst: ``groupBy(keys).agg(F.aggregate(
  F.array_sort(F.collect_list(struct(order..., value))), zero, merge))``.
  Whole-stage codegen, partial aggregation of the list builds, no
  Python — the fastest tier at bounded group sizes (BASELINE §5). BUT
  it holds each key's ENTIRE value array in one aggregation buffer:
  memory is O(largest group) per in-flight key, and a 10^8-row hot key
  is an executor OOM no spill can save (a single agg buffer can't
  spill mid-merge).
* ``pandas``  — ``applyInPandas``: materializes each group as a pandas
  DataFrame — also O(group) memory, Python-side. For arbitrary Python
  ``merge`` that wants the whole group at once.
* ``stream``  — ``mapInPandas`` over the group-sorted partitions via
  the streaming engine: O(Arrow batch) memory regardless of group
  size — the faithful port of the reference's never-materialize design
  and the only tier that survives a single key with 10^9 rows at
  100 TB scale.

A merge given as a Column-lambda ``(acc: Column, v: Column) -> Column``
selects the native tier under ``tier="auto"``; a plain Python callable
selects ``stream``. Because native's O(group) buffer is a silent
scale trap, ``tier="auto"`` additionally applies a GROUP-SIZE GUARD
(``max_group_rows``, default :data:`DEFAULT_MAX_GROUP_ROWS`): a cheap
sampled estimate of the largest group's row count (skippable via
``group_rows_hint`` when the caller knows the bound) demotes auto to
the stream tier past the bound — dual-use merge lambdas built from
operators (``acc * 0.9 + v * 0.1``) execute identically on scalars,
bitwise-equal results. An explicit ``tier="native"`` is never
second-guessed.
"""

from __future__ import annotations

import copy
from typing import Any, Callable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..core import GroupSortedFrame
from .streaming_engine import iter_key_runs, run_fold_partition

__all__ = [
    "fold_left_by_key",
    "reduce_left_by_key",
    "scan_left_by_key",
    "DEFAULT_MAX_GROUP_ROWS",
]

# Auto-tier group-size bound: past this, the native tier's per-key
# collect_list aggregation buffer (~48 bytes/row of struct overhead on
# top of the values) is hundreds of MB inside ONE buffer — the regime
# where a hot key becomes an executor OOM rather than a spill. Chosen
# so ordinary groups (sessions, per-user event streams: 10^2..10^6
# rows) stay native and only genuine skew demotes.
DEFAULT_MAX_GROUP_ROWS = 8_000_000

# Fraction for the sampled largest-group estimate: at 0.001 a
# guard-relevant group (>= 8M rows) shows ~8k sampled rows — far above
# sampling noise — while the estimate job reads only the key columns.
GUARD_SAMPLE_FRACTION = 0.001


def _is_column_lambda(merge: Callable) -> bool:
    try:
        res = merge(F.lit(0), F.lit(0))
        return isinstance(res, Column)
    except Exception:
        return False


def _works_on_scalars(merge: Callable) -> bool:
    """True if the merge lambda ALSO executes on plain Python scalars
    (operator-built lambdas like ``acc * 0.9 + v * 0.1`` do; lambdas
    calling ``F.*`` functions do not) — the prerequisite for demoting a
    Column-lambda fold to the stream tier."""
    for probe in (0, 0.0, ""):
        try:
            res = merge(probe, probe)
        except Exception:
            continue
        if not isinstance(res, Column):
            return True
    return False


def _estimate_max_group_rows(gsf: GroupSortedFrame, sample_fraction: float) -> int:
    """Sampled estimate of the largest group's row count: count keys in
    a ``sample_fraction`` sample of the KEY COLUMNS ONLY (column-pruned
    scan; the shuffled sample is fraction-sized) and scale the max back
    up. A guard-relevant hot key (>> bound) is impossible to miss at
    the default fraction; small groups under-resolve to ~1/fraction,
    far below any sane bound."""
    sampled = gsf.df.select(*gsf.key_cols).sample(
        fraction=sample_fraction, seed=42
    )
    row = (
        sampled.groupBy(*gsf.key_cols)
        .agg(F.count(F.lit(1)).alias("__c"))
        .agg(F.max("__c").alias("__m"))
        .first()
    )
    m = row["__m"] if row is not None else None
    return int((m or 0) / sample_fraction)


def _guarded_native_tier(
    gsf: GroupSortedFrame,
    merge: Callable,
    max_group_rows: int | None,
    group_rows_hint: int | None,
    sample_fraction: float,
    op: str,
) -> str:
    """Resolve ``tier="auto"`` for a Column-lambda merge: native unless
    the (hinted or sampled) largest group exceeds ``max_group_rows``,
    in which case the stream tier's O(batch) memory wins — provided the
    lambda also runs on scalars. A Column-only lambda past the bound
    keeps native with a loud warning (the caller must rewrite the merge
    or raise the bound consciously)."""
    if max_group_rows is None:
        return "native"
    est = (
        group_rows_hint
        if group_rows_hint is not None
        else _estimate_max_group_rows(gsf, sample_fraction)
    )
    if est <= max_group_rows:
        return "native"
    import warnings

    if _works_on_scalars(merge):
        warnings.warn(
            f"{op}: estimated largest group ~{est} rows exceeds "
            f"max_group_rows={max_group_rows}; auto tier demoted from "
            "native (O(group) aggregation buffer) to stream (O(batch)). "
            "Pass tier='native' or a larger max_group_rows to override.",
            stacklevel=3,
        )
        return "stream"
    warnings.warn(
        f"{op}: estimated largest group ~{est} rows exceeds "
        f"max_group_rows={max_group_rows}, but the merge lambda only "
        "executes on Columns — keeping the native tier, whose per-key "
        "aggregation buffer holds the WHOLE group (executor OOM risk at "
        "this size). Rewrite the merge with plain operators (runs on "
        "scalars too) or pass an explicit tier.",
        stacklevel=3,
    )
    return "native"


def _catalyst_result_ddl(gsf: GroupSortedFrame, agg_col: Column) -> str:
    """Catalyst-inferred result type of a native-tier aggregate
    expression (analysis only — touches the schema, launches no job).
    Used when ``tier="auto"`` demotes a Column-lambda fold/reduce to the
    stream tier: the stream tier's declared output type must be the
    SAME type the native tier would have produced, not one re-derived
    from ``zero``/the value column — otherwise the demotion (which only
    triggers past the group-size bound, i.e. exactly in large-scale
    runs) silently changes the output schema: int values with ``zero=0``
    are ``int`` under native but ``bigint`` under a zero-derived stream
    schema, and ``acc * 0.9 + v * 0.1`` with an integer zero is a
    native-tier AnalysisException (Catalyst's ``aggregate`` requires
    merge-result type == zero type) that the pre-fix stream path
    silently swallowed into a truncating bigint run. Deriving the type
    here also re-raises that same error on the demoted side — behavior
    is identical on both sides of the bound by construction. An
    explicit ``result_type=`` (or ``tier=``) bypasses this probe."""
    schema = gsf.df.groupBy(*gsf.key_cols).agg(agg_col.alias("__r")).schema
    return schema["__r"].dataType.simpleString()


def _native_fold_agg(gsf: GroupSortedFrame, zero: Any, merge: Callable, value_col: str) -> Column:
    arr, vfield = _sorted_value_array(gsf, value_col)
    zero_col = zero if isinstance(zero, Column) else F.lit(zero)
    return F.aggregate(arr, zero_col, lambda acc, s: merge(acc, s[vfield]))


def _native_reduce_agg(gsf: GroupSortedFrame, merge: Callable, value_col: str) -> Column:
    arr, vfield = _sorted_value_array(gsf, value_col)
    return F.aggregate(
        F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))),
        F.element_at(arr, 1)[vfield],
        lambda acc, s: merge(acc, s[vfield]),
    )


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
        # Element type inferred from the elements so e.g. a
        # ``zero=[0.0]`` fold gets ``array<double>`` without the caller
        # remembering result_type=. NB (since 0.4): an EMPTY container
        # zero raises instead of silently defaulting to array<string>
        # as pre-0.4 releases did — pass result_type= explicitly.
        if not zero:
            raise TypeError(
                "cannot infer element type for an empty container zero; "
                "pass result_type= (e.g. 'array<double>')"
            )
        elem_types = {_python_type_ddl(e) for e in zero}
        if len(elem_types) > 1:
            raise TypeError(
                f"container zero {zero!r} mixes element types "
                f"{sorted(elem_types)}; pass result_type= "
                "(e.g. 'array<double>')"
            )
        return f"array<{elem_types.pop()}>"
    raise TypeError(
        f"cannot infer result type for zero {zero!r}; pass result_type="
    )


def _mixed_order_comparator(specs) -> Callable[[Column, Column], Column]:
    """Comparator for ``array_sort(arr, cmp)`` realizing an arbitrary
    per-field asc/desc mix (the reference supports any ``Ordering[V]``,
    ``GroupSorted.scala:13``). Null placement matches Spark's sort
    defaults: asc → nulls first, desc → nulls last — the same layout
    ``sortWithinPartitions`` produced, so native and stream tiers
    agree. Still a Catalyst higher-order function: no Python."""

    def cmp(left: Column, right: Column) -> Column:
        result = F.lit(0)
        for i in reversed(range(len(specs))):
            f = f"__o{i}"
            lo, hi = (-1, 1) if specs[i].ascending else (1, -1)
            lf, rf = left[f], right[f]
            ci = (
                F.when(lf.isNull() & rf.isNull(), 0)
                .when(lf.isNull(), lo)
                .when(rf.isNull(), hi)
                .when(lf < rf, lo)
                .when(lf > rf, hi)
                .otherwise(0)
            )
            result = F.when(ci != 0, ci).otherwise(result)
        return result

    return cmp


def _sorted_value_array(gsf: GroupSortedFrame, value_col: str) -> tuple[Column, str]:
    """``array_sort(collect_list(struct(order..., value)))`` — the
    native re-creation of per-key value order after the groupBy (which
    Catalyst is free to not preserve). Uniform direction uses the
    default struct sort (+ reverse for desc); a mixed asc/desc spec
    sorts with a custom comparator — still pure Catalyst."""
    specs = gsf.order_specs
    fields = [F.col(s.col).alias(f"__o{i}") for i, s in enumerate(specs)]
    fields.append(F.col(value_col).alias("__v"))
    collected = F.collect_list(F.struct(*fields))
    ascs = {s.ascending for s in specs}
    if len(ascs) > 1:
        return F.array_sort(collected, _mixed_order_comparator(specs)), "__v"
    arr = F.array_sort(collected)
    if specs and not specs[0].ascending:
        arr = F.reverse(arr)
    return arr, "__v"


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
    merge_vec: Callable | None = None,
    max_group_rows: int | None = DEFAULT_MAX_GROUP_ROWS,
    group_rows_hint: int | None = None,
    sample_fraction: float = GUARD_SAMPLE_FRACTION,
) -> DataFrame:
    """Left fold per key in value order (see module docstring for the
    tier memory models). ``tier="auto"``: Column-lambda merge → native,
    guarded by ``max_group_rows`` (a sampled largest-group estimate —
    or ``group_rows_hint``, which skips the estimate job — past the
    bound demotes to the O(batch) stream tier); Python merge → stream.
    ``max_group_rows=None`` disables the guard (and the estimate job).
    """
    value_col = value_col or gsf.value_cols[-1]
    if tier == "auto":
        if _is_column_lambda(merge):
            tier = _guarded_native_tier(
                gsf, merge, max_group_rows, group_rows_hint,
                sample_fraction, "fold_left_by_key",
            )
            if tier == "stream" and result_type is None:
                # demotion must not change the output schema: type the
                # stream output exactly as native would have (see
                # _catalyst_result_ddl)
                result_type = _catalyst_result_ddl(
                    gsf, _native_fold_agg(gsf, zero, merge, value_col)
                )
        else:
            tier = "stream"

    if tier == "native":
        agg = _native_fold_agg(gsf, zero, merge, value_col)
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
        out_cols = list(key_cols) + [alias]

        def part(batches):
            def step(acc, chunk: pd.DataFrame):
                if merge_vec is not None:
                    return merge_vec(acc, chunk[value_col])
                for v in chunk[value_col]:
                    acc = merge(acc, v)
                return acc

            def emit_row(key, acc):
                return key + (acc,)

            yield from run_fold_partition(
                batches,
                key_cols,
                lambda _k: copy.deepcopy(zero),
                step,
                emit_row,
                out_cols,
            )

        return gsf.df.mapInPandas(part, out_schema)

    if tier == "arrow":
        # zero-copy input: per-key runs arrive as RecordBatch slices;
        # only the value column is pulled to numpy per batch. Output
        # rows buffer as tuples, one Arrow batch per 8192 keys.
        out_cols = list(key_cols) + [alias]

        def part_arrow(batches):
            import pyarrow as pa

            from .streaming_engine import iter_key_runs_arrow

            def flush(rows):
                cols = list(zip(*rows))
                return pa.RecordBatch.from_pydict(
                    {c: list(v) for c, v in zip(out_cols, cols)}
                )

            rows: list[tuple] = []
            for key, rbs in iter_key_runs_arrow(batches, key_cols):
                acc = copy.deepcopy(zero)
                for rb in rbs:
                    vals = rb.column(
                        rb.schema.get_field_index(value_col)
                    ).to_numpy(zero_copy_only=False)
                    if merge_vec is not None:
                        acc = merge_vec(acc, vals)
                    else:
                        for v in vals:
                            acc = merge(acc, v)
                rows.append(key + (acc,))
                if len(rows) >= 8192:
                    yield flush(rows)
                    rows = []
            if rows:
                yield flush(rows)

        return gsf.df.mapInArrow(part_arrow, out_schema)

    raise ValueError(f"unknown tier {tier!r}")


def reduce_left_by_key(
    gsf: GroupSortedFrame,
    merge: Callable,
    value_col: str | None = None,
    alias: str = "reduce",
    tier: str = "auto",
    result_type: str | None = None,
    max_group_rows: int | None = DEFAULT_MAX_GROUP_ROWS,
    group_rows_hint: int | None = None,
    sample_fraction: float = GUARD_SAMPLE_FRACTION,
) -> DataFrame:
    """Left reduce: the first value (in value order) seeds the fold
    (``GroupSorted.scala:50``). Every key has >= 1 row, so no empty-group
    case exists (same argument as the reference). ``tier="auto"``
    applies the same group-size guard as :func:`fold_left_by_key` (the
    native tier buffers the whole group's value array per key)."""
    value_col = value_col or gsf.value_cols[-1]
    if tier == "auto":
        if _is_column_lambda(merge):
            tier = _guarded_native_tier(
                gsf, merge, max_group_rows, group_rows_hint,
                sample_fraction, "reduce_left_by_key",
            )
            if tier == "stream" and result_type is None:
                # same schema-stability contract as fold_left_by_key:
                # native's type is Catalyst-inferred from the merge
                # expression, which need not equal the value column's
                # type (e.g. acc * 0.5 + v over bigint v -> double)
                result_type = _catalyst_result_ddl(
                    gsf, _native_reduce_agg(gsf, merge, value_col)
                )
        else:
            tier = "stream"

    if tier == "native":
        agg = _native_reduce_agg(gsf, merge, value_col)
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
        out_cols = list(key_cols) + [alias]

        def part(batches):
            def step(acc, chunk: pd.DataFrame):
                for v in chunk[value_col]:
                    acc = v if acc is _SENTINEL else merge(acc, v)
                return acc

            def emit_row(key, acc):
                return key + (acc,)

            yield from run_fold_partition(
                batches, key_cols, lambda _k: _SENTINEL, step, emit_row, out_cols
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
    merge_vec: Callable | None = None,
    agg: str | Callable | None = None,
) -> DataFrame:
    """Per-key prefix scan, n+1 rows per key INCLUDING the leading zero
    row (Scala ``scanLeft`` semantics, ``GroupSorted.scala:52-55``;
    pinned by ``GroupSortedSpec.scala:169-186``). ``index_col`` holds
    0 for the zero row, then 1..n in value order, making the output a
    well-defined relation.

    Tiers: when ``agg`` names a builtin aggregate ("sum"/"min"/"max"/
    "count"/"avg" or a Column-producing callable), the native tier
    compiles to a cumulative window over the existing layout (no new
    exchange or sort) unioned with one zero row per key — the window
    can't emit the synthetic zero row by itself (SURVEY §7 hard part
    (b)), the union supplies it. Arbitrary Python ``merge`` takes the
    pandas/stream tiers.

    Memory model note (why the fold/reduce group-size guard does NOT
    apply here): the window path buffers each key's rows in
    WindowExec's ``ExternalAppendOnlyUnsafeRowArray``, which SPILLS to
    disk past ``spark.sql.windowExec.buffer.spill.threshold`` — a hot
    key degrades to disk throughput instead of an executor OOM, unlike
    the fold's single in-heap aggregation buffer. Auto without ``agg``
    already routes to the O(batch) stream tier (below), so scan has no
    unguarded O(group)-heap path."""
    value_col = value_col or gsf.value_cols[-1]
    if tier in ("auto", "native") and agg is not None:
        # contract: `zero` must be the identity of `agg` (0 for
        # sum/count, inf for min, ...) — the running window then equals
        # the fold, and the zero row is a plain literal.
        from pyspark.sql.window import Window

        agg_fn = getattr(F, agg) if isinstance(agg, str) else agg
        wb = Window.partitionBy(*gsf.key_cols).orderBy(
            *[s.expr() for s in gsf.order_specs]
        )
        w = wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        rows = gsf.df.select(
            *gsf.key_cols,
            F.row_number().over(wb).cast("bigint").alias(index_col),
            agg_fn(F.col(value_col)).over(w).alias(alias),
        )
        zeros = (
            gsf.df.select(*gsf.key_cols)
            .distinct()
            .withColumn(index_col, F.lit(0).cast("bigint"))
            .withColumn(alias, F.lit(zero).cast(rows.schema[alias].dataType))
        )
        return rows.unionByName(zeros)
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
        # One output yield per INPUT Arrow batch (not per key): with
        # many tiny groups (e.g. ~4-row lineitem orders) a per-key
        # yield would push ~n_keys micro-batches through Arrow — the
        # dominant cost. Memory stays O(batch) regardless of group
        # size; only (key, acc, index) carries across batches.
        #
        # `merge_vec(acc, values: pd.Series) -> sequence` is the
        # vectorized fast path: the prefix-scan of one run given the
        # carried accumulator (e.g. running sum:
        # ``lambda acc, s: acc + s.cumsum()``). Falls back to the
        # row-at-a-time `merge` loop when not supplied.

        def part(batches):
            import numpy as np

            carry_key, carry_acc, carry_i = None, None, 0
            for pdf in batches:
                n = len(pdf)
                if n == 0:
                    continue
                # vectorized run detection: change-mask over key cols
                karrs = [pdf[k].to_numpy() for k in key_cols]
                changed = np.zeros(n, dtype=bool)
                changed[0] = True
                for a in karrs:
                    neq = a[1:] != a[:-1]
                    if a.dtype == object or np.issubdtype(a.dtype, np.floating):
                        both_na = pd.isna(a[1:]) & pd.isna(a[:-1])
                        neq &= ~both_na
                    changed[1:] |= neq
                starts = np.flatnonzero(changed)
                ends = np.append(starts[1:], n)
                first_key = tuple(
                    None if pd.isna(a[0]) else a[0] for a in karrs
                )
                cont = first_key == carry_key  # run 0 continues the carry

                vals = pdf[value_col].to_numpy()
                # zero row for every run except a carried-over run 0
                fresh = np.ones(len(starts), dtype=bool)
                fresh[0] = not cont
                sizes = (ends - starts) + fresh
                offs = np.concatenate(([0], np.cumsum(sizes)))
                total = int(offs[-1])

                out_acc = np.empty(total, dtype=object)
                out_idx = np.empty(total, dtype=np.int64)
                for r, (s, e) in enumerate(zip(starts, ends)):
                    if r == 0 and cont:
                        acc, i0 = carry_acc, carry_i
                    else:
                        acc, i0 = copy.deepcopy(zero), 0
                    o = offs[r]
                    if fresh[r]:  # leading zero row (scanLeft n+1 contract)
                        out_acc[o] = copy.deepcopy(zero)
                        out_idx[o] = 0
                        o += 1
                    cnt = e - s
                    if merge_vec is not None:
                        prefix = np.asarray(merge_vec(acc, vals[s:e]))
                        if cnt:
                            acc = prefix[-1]
                        out_acc[o : o + cnt] = prefix
                    else:
                        for j in range(cnt):
                            acc = merge(acc, vals[s + j])
                            out_acc[o + j] = acc
                    out_idx[o : o + cnt] = np.arange(i0 + 1, i0 + 1 + cnt)
                    carry_acc, carry_i = acc, i0 + cnt
                carry_key = tuple(
                    None if pd.isna(a[starts[-1]]) else a[starts[-1]] for a in karrs
                )
                out = {
                    k: np.repeat(a[starts], sizes) for k, a in zip(key_cols, karrs)
                }
                out[index_col] = out_idx
                out[alias] = out_acc
                yield pd.DataFrame(out)

        return gsf.df.mapInPandas(part, out_schema)

    raise ValueError(f"unknown tier {tier!r}")
