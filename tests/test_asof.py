"""merge_join_asof: point-in-time join semantics vs a pandas oracle."""

import pandas as pd
import pytest

from spark_sorted_spark import group_sort


@pytest.fixture()
def sides(spark):
    trades = spark.createDataFrame(
        [
            ("a", 10, 1.0),
            ("a", 20, 2.0),
            ("a", 25, 2.5),
            ("b", 5, 9.0),
            ("c", 7, 7.0),  # key with no quotes at all
        ],
        ["k", "t", "px"],
    )
    quotes = spark.createDataFrame(
        [
            ("a", 8, 100),
            ("a", 20, 200),  # exactly at trade time -> inclusive match
            ("a", 24, 240),
            ("b", 9, 900),  # after the only b trade
        ],
        ["k", "t", "bid"],
    )
    return group_sort(trades, "k", order_by="t"), group_sort(quotes, "k", order_by="t")


def _by_key(df):
    return {(r["k"], r["t"]): (r["t_r"], r["bid"]) for r in df.collect()}


def test_asof_backward(sides):
    left, right = sides
    got = _by_key(left.merge_join_asof(right, "t"))
    assert got == {
        ("a", 10): (8, 100),
        ("a", 20): (20, 200),  # tie is inclusive
        ("a", 25): (24, 240),
        ("b", 5): (None, None),  # quote only after
        ("c", 7): (None, None),  # no quotes for key
    }


def test_asof_forward(sides):
    left, right = sides
    got = _by_key(left.merge_join_asof(right, "t", direction="forward"))
    assert got == {
        ("a", 10): (20, 200),
        ("a", 20): (20, 200),
        ("a", 25): (None, None),
        ("b", 5): (9, 900),
        ("c", 7): (None, None),
    }


def test_asof_tolerance(sides):
    left, right = sides
    got = _by_key(left.merge_join_asof(right, "t", tolerance=2))
    assert got == {
        ("a", 10): (8, 100),  # 10-8 = 2, at the tolerance edge: kept
        ("a", 20): (20, 200),
        ("a", 25): (24, 240),
        ("b", 5): (None, None),
        ("c", 7): (None, None),
    }
    tight = _by_key(left.merge_join_asof(right, "t", tolerance=1))
    assert tight[("a", 10)] == (None, None)  # 10-8 = 2 > 1: voided


def test_asof_matches_pandas_merge_asof(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    lt = pd.DataFrame(
        {
            "k": rng.randint(0, 5, 200),
            "t": rng.randint(0, 1000, 200),
            "x": rng.randn(200),
        }
    ).drop_duplicates(["k", "t"])
    rt = pd.DataFrame(
        {
            "k": rng.randint(0, 5, 150),
            "t": rng.randint(0, 1000, 150),
            "y": rng.randn(150),
        }
    ).drop_duplicates(["k", "t"])
    left = group_sort(spark.createDataFrame(lt), "k", order_by="t")
    right = group_sort(spark.createDataFrame(rt), "k", order_by="t")
    got = (
        left.merge_join_asof(right, "t")
        .toPandas()
        .sort_values(["k", "t"])
        .reset_index(drop=True)
    )
    exp = pd.merge_asof(
        lt.sort_values("t"),
        rt.sort_values("t").rename(columns={"t": "t_r"}),
        left_on="t",
        right_on="t_r",
        by="k",
        direction="backward",
    ).sort_values(["k", "t"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["k", "t", "x", "t_r", "y"]],
        exp[["k", "t", "x", "t_r", "y"]].astype({"t_r": "float64"}),
        check_dtype=False,
    )


def test_asof_tolerance_matches_pandas_merge_asof(spark):
    import numpy as np

    rng = np.random.RandomState(11)
    lt = pd.DataFrame(
        {"k": rng.randint(0, 4, 120), "t": rng.randint(0, 500, 120)}
    ).drop_duplicates(["k", "t"])
    lt["x"] = np.arange(len(lt), dtype=float)
    rt = pd.DataFrame(
        {"k": rng.randint(0, 4, 90), "t": rng.randint(0, 500, 90)}
    ).drop_duplicates(["k", "t"])
    rt["y"] = np.arange(len(rt), dtype=float)
    from spark_sorted_spark import group_sort

    left = group_sort(spark.createDataFrame(lt), "k", order_by="t")
    right = group_sort(spark.createDataFrame(rt), "k", order_by="t")
    got = (
        left.merge_join_asof(right, "t", tolerance=25)
        .toPandas()
        .sort_values(["k", "t"])
        .reset_index(drop=True)
    )
    exp = pd.merge_asof(
        lt.sort_values("t"),
        rt.sort_values("t").rename(columns={"t": "t_r"}),
        left_on="t",
        right_on="t_r",
        by="k",
        direction="backward",
        tolerance=25,
    ).sort_values(["k", "t"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["k", "t", "x", "t_r", "y"]],
        exp[["k", "t", "x", "t_r", "y"]].astype({"t_r": "float64"}),
        check_dtype=False,
    )


def test_asof_nearest(sides):
    left, right = sides
    got = _by_key(left.merge_join_asof(right, "t", direction="nearest"))
    assert got == {
        ("a", 10): (8, 100),      # |10-8|=2 beats |20-10|=10
        ("a", 20): (20, 200),     # exact match
        ("a", 25): (24, 240),     # |25-24|=1, no forward quote
        ("b", 5): (9, 900),       # only a forward quote exists
        ("c", 7): (None, None),   # no quotes for key
    }


def test_asof_nearest_tie_prefers_backward(spark):
    l = group_sort(
        spark.createDataFrame([("a", 10, 1.0)], ["k", "t", "px"]),
        "k", order_by="t",
    )
    r = group_sort(
        spark.createDataFrame([("a", 8, 80), ("a", 12, 120)], ["k", "t", "bid"]),
        "k", order_by="t",
    )
    row = l.merge_join_asof(r, "t", direction="nearest").collect()[0]
    assert (row["t_r"], row["bid"]) == (8, 80)  # equidistant -> backward


def test_asof_nearest_tolerance_bounds_both_sides(sides):
    left, right = sides
    got = _by_key(
        left.merge_join_asof(right, "t", direction="nearest", tolerance=2)
    )
    assert got == {
        ("a", 10): (8, 100),     # delta 2 within tolerance
        ("a", 20): (20, 200),
        ("a", 25): (24, 240),
        ("b", 5): (None, None),  # forward delta 4 exceeds tolerance
        ("c", 7): (None, None),
    }


def test_asof_nearest_matches_pandas_merge_asof(spark):
    import numpy as np

    rng = np.random.RandomState(11)
    lt = pd.DataFrame(
        {
            "k": rng.randint(0, 5, 200),
            "t": rng.randint(0, 1000, 200),
            "x": rng.randn(200),
        }
    ).drop_duplicates(["k", "t"])
    rt = pd.DataFrame(
        {
            "k": rng.randint(0, 5, 150),
            "t": rng.randint(0, 1000, 150),
            "y": rng.randn(150),
        }
    ).drop_duplicates(["k", "t"])
    left = group_sort(spark.createDataFrame(lt), "k", order_by="t")
    right = group_sort(spark.createDataFrame(rt), "k", order_by="t")
    got = (
        left.merge_join_asof(right, "t", direction="nearest")
        .toPandas()
        .sort_values(["k", "t"])
        .reset_index(drop=True)
    )
    exp = pd.merge_asof(
        lt.sort_values("t"),
        rt.sort_values("t").rename(columns={"t": "t_r"}),
        left_on="t",
        right_on="t_r",
        by="k",
        direction="nearest",
    ).sort_values(["k", "t"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["k", "t", "x", "t_r", "y"]],
        exp[["k", "t", "x", "t_r", "y"]].astype({"t_r": "float64"}),
        check_dtype=False,
    )


def test_asof_nearest_no_extra_exchange(sides):
    # nearest pays ONE extra partition-local sort over backward —
    # never an extra shuffle (both candidates ride the same
    # partitioning)
    left, right = sides

    def counts(direction):
        out = left.merge_join_asof(right, "t", direction=direction)
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "simple"
        )
        return (
            plan.count("Exchange") - plan.count("BroadcastExchange"),
            plan.count("Sort "),
        )

    b_ex, b_sort = counts("backward")
    n_ex, n_sort = counts("nearest")
    assert n_ex == b_ex
    assert n_sort == b_sort + 1
