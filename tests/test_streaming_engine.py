"""Pure-Python tests of the chunk-level iterator engine — the analogue
of the reference's Spark-free packageSpec.scala:7-100, with hypothesis
standing in for ScalaCheck.
"""

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from spark_sorted_spark.operators.streaming_engine import (
    iter_key_runs,
    key_of,
    split_runs,
)


def chunked(pdf: pd.DataFrame, sizes):
    """Split pdf into chunks of the given sizes (cycled)."""
    out, i, si = [], 0, 0
    while i < len(pdf):
        n = max(1, sizes[si % len(sizes)])
        out.append(pdf.iloc[i : i + n].reset_index(drop=True))
        i += n
        si += 1
    return out


pairs_strategy = st.lists(
    st.tuples(st.integers(0, 5), st.integers(-100, 100)), min_size=0, max_size=60
)
sizes_strategy = st.lists(st.integers(1, 7), min_size=1, max_size=4)


@given(pairs=pairs_strategy, sizes=sizes_strategy)
@settings(max_examples=200, deadline=None)
def test_iter_key_runs_reconstructs_groups(pairs, sizes):
    pairs = sorted(pairs)  # group-sorted input
    pdf = pd.DataFrame(pairs, columns=["k", "v"]) if pairs else pd.DataFrame(
        {"k": pd.Series(dtype="int64"), "v": pd.Series(dtype="int64")}
    )
    got = {}
    for key, chunks in iter_key_runs(chunked(pdf, sizes), ("k",)):
        vals = [v for c in chunks for v in c["v"]]
        assert key not in got, "key yielded twice"
        got[key] = vals
    expected = {}
    for k, v in pairs:
        expected.setdefault((k,), []).append(v)
    assert got == expected


@given(pairs=pairs_strategy, sizes=sizes_strategy, take=st.integers(0, 3))
@settings(max_examples=100, deadline=None)
def test_non_exhausting_consumer_is_drained(pairs, sizes, take):
    # GroupSortedSpec.scala:137-145: f need not exhaust the iterator
    pairs = sorted(pairs)
    if not pairs:
        return
    pdf = pd.DataFrame(pairs, columns=["k", "v"])
    seen_keys = []
    for key, chunks in iter_key_runs(chunked(pdf, sizes), ("k",)):
        seen_keys.append(key)
        for i, _c in enumerate(chunks):
            if i + 1 >= take:
                break  # stop early; engine must drain and move on
    expected_keys = sorted({(k,) for k, _ in pairs})
    assert sorted(seen_keys) == expected_keys


def test_split_runs_vectorized_boundaries():
    pdf = pd.DataFrame({"k": [1, 1, 2, 2, 2, 3], "v": range(6)})
    runs = list(split_runs(pdf, ("k",)))
    assert [r["k"].iloc[0] for r in runs] == [1, 2, 3]
    assert [len(r) for r in runs] == [2, 3, 1]


def test_null_keys_group_together():
    pdf = pd.DataFrame({"k": [None, None, "a"], "v": [1, 2, 3]})
    runs = list(split_runs(pdf, ("k",)))
    assert len(runs) == 2
    assert key_of(runs[0], ("k",)) == (None,)
    got = dict(
        (key, [v for c in chunks for v in c["v"]])
        for key, chunks in iter_key_runs([pdf], ("k",))
    )
    assert got == {(None,): [1, 2], ("a",): [3]}


def test_composite_keys():
    # composite tuple keys (GroupSortedSpec.scala:242-248)
    pdf = pd.DataFrame(
        {"a": [1, 1, 1, 2], "b": ["x", "x", "y", "y"], "v": [1, 2, 3, 4]}
    )
    got = {
        key: [v for c in chunks for v in c["v"]]
        for key, chunks in iter_key_runs(chunked(pdf, [2]), ("a", "b"))
    }
    assert got == {(1, "x"): [1, 2], (1, "y"): [3], (2, "y"): [4]}


def test_verify_sorted_trips_on_reappearing_key():
    # analogue of packageSpec.scala:55-58,97-99 (mis-sorted input detected)
    pdf = pd.DataFrame({"k": [1, 2, 1], "v": [1, 2, 3]})
    with pytest.raises(AssertionError, match="not group-sorted"):
        for _ in iter_key_runs([pdf], ("k",), verify_sorted=True):
            pass


def test_run_spanning_many_chunks():
    pdf = pd.DataFrame({"k": [7] * 10 + [8] * 3, "v": range(13)})
    got = {
        key: [v for c in chunks for v in c["v"]]
        for key, chunks in iter_key_runs(chunked(pdf, [1]), ("k",))
    }
    assert got == {(7,): list(range(10)), (8,): [10, 11, 12]}
