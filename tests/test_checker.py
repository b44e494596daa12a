"""The correctness harness's compare must itself be trustworthy: if
normalize() collapsed genuinely different relations (or crashed on the
values our queries emit), every PASS in the gate would be meaningless.
"""

import datetime
import sys

sys.path.insert(0, "/root/repo/tools")

from check_correctness import normalize  # noqa: E402


def test_normalize_distinguishes_different_relations():
    a = normalize([{"x": 1, "y": 2.0}, {"x": 2, "y": 3.0}], ["x", "y"])
    b = normalize([{"x": 1, "y": 2.0}, {"x": 2, "y": 3.5}], ["x", "y"])
    assert a != b


def test_normalize_is_row_order_insensitive():
    rows = [{"x": 1, "y": "b"}, {"x": 2, "y": "a"}]
    assert normalize(rows, ["x", "y"]) == normalize(rows[::-1], ["x", "y"])


def test_normalize_handles_nan_null_and_mixed_sort():
    # NaN != NaN would make two identical relations compare unequal;
    # None must sort stably against ints without TypeError
    rows = [{"x": None, "y": float("nan")}, {"x": 1, "y": 0.0}]
    n1 = normalize(rows, ["x", "y"])
    n2 = normalize(list(rows), ["x", "y"])
    assert n1 == n2
    assert any("__nan__" in r for r in n1)


def test_normalize_timestamps_compare_equal_across_engines():
    # Spark returns datetime, DuckDB returns tz-aware datetime for some
    # types — isoformat with the +00:00 suffix stripped must collapse
    naive = datetime.datetime(2024, 1, 1, 12, 0, 0, 123456)
    aware = naive.replace(tzinfo=datetime.timezone.utc)
    a = normalize([{"t": naive}], ["t"])
    b = normalize([{"t": aware}], ["t"])
    assert a == b


def test_normalize_float_exactness():
    # the gate compares floats EXACTLY (our queries are written for
    # bitwise-equal folds) — 1 ulp difference must be a mismatch
    x = 0.1 + 0.2
    y = 0.3
    assert x != y  # the classic
    assert normalize([{"v": x}], ["v"]) != normalize([{"v": y}], ["v"])


def test_normalize_lists_hashable():
    # array-valued columns (embeddings, shingle arrays) must not crash
    # the sort and must compare by content
    a = normalize([{"v": [1.0, 2.0]}], ["v"])
    b = normalize([{"v": (1.0, 2.0)}], ["v"])
    assert a == b
