"""Layout-invariant checker — the test-side contract of the engine.

Port of the reference's ``validGroupSorted`` helpers
(``GroupSortedSpec.scala:12-29`` for the RDD layout,
``GroupSortedDatasetSpec.scala:22-40`` for the Dataset layout): verify
that a GroupSortedFrame's physical layout actually satisfies

1. key-disjointness across partitions (each key's rows live in exactly
   one partition — the Dataset-level check; we don't pin *which*
   partition, matching the Dataset spec rather than the RDD spec,
   since Catalyst owns the hash function),
2. keys consecutive within each partition,
3. values sorted per key by the declared order specs.

Used by tests, and available as a debug assertion in production
pipelines (cheap single pass, same spirit as the runtime asserts at
``package.scala:128,163,168``).
"""

from __future__ import annotations

import pandas as pd

from ..core import GroupSortedFrame
from ..operators.streaming_engine import split_runs

__all__ = ["check_group_sorted", "InvariantViolation"]


class InvariantViolation(AssertionError):
    pass


def check_group_sorted(gsf: GroupSortedFrame) -> None:
    """Collect per-partition contents and verify the three invariants.
    Test-sized data only (driver-side collect by design)."""
    key_cols = list(gsf.key_cols)
    specs = gsf.order_specs

    def tag(it):
        import pandas as _pd  # re-import inside executor

        for pdf in it:
            yield pdf

    parts: dict[int, pd.DataFrame] = {}
    # bounded-collect: TEST-ONLY invariant checker — materializes the
    # whole frame by design; never called on a production data path
    rows = gsf.df.rdd.glom().collect()
    cols = gsf.df.columns
    for pid, part_rows in enumerate(rows):
        parts[pid] = pd.DataFrame([r.asDict() for r in part_rows], columns=cols)

    seen_keys: dict[tuple, int] = {}
    for pid, pdf in parts.items():
        if len(pdf) == 0:
            continue
        run_keys = []
        for run in split_runs(pdf, tuple(key_cols)):
            key = tuple(
                None if pd.isna(v) else v for v in (run[k].iloc[0] for k in key_cols)
            )
            run_keys.append(key)
            # invariant 3: values sorted per key
            for s in specs:
                vals = run[s.col].tolist()
                ordered = sorted(vals, reverse=not s.ascending)
                if vals != ordered:
                    raise InvariantViolation(
                        f"partition {pid} key {key}: column {s.col} not "
                        f"{'asc' if s.ascending else 'desc'}-sorted: {vals}"
                    )
        # invariant 2: keys consecutive — each key appears in exactly one run
        if len(run_keys) != len(set(run_keys)):
            raise InvariantViolation(
                f"partition {pid}: keys not consecutive: {run_keys}"
            )
        # invariant 1: keys disjoint across partitions
        for key in run_keys:
            if key in seen_keys and seen_keys[key] != pid:
                raise InvariantViolation(
                    f"key {key} present in partitions {seen_keys[key]} and {pid}"
                )
            seen_keys[key] = pid
