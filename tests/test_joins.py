"""Join + union semantics and plan economics — mirrors
GroupSortedSpec.scala:234-303 (all join flavors vs a collections
oracle, merge-union vs shuffle-union) and the co-partitioning
reuse claim (GroupSorted.scala:63-72).
"""

import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from spark_sorted_spark import group_sort
from spark_sorted_spark.operators.joins import merge_join, merge_join_custom
from spark_sorted_spark.operators.union import merge_union, merge_union_cogroup
from spark_sorted_spark.plans.invariants import check_group_sorted

from conftest import plan_of

L = [("a", 1), ("a", 2), ("b", 3), ("d", 4)]
R = [("a", 10), ("b", 20), ("b", 30), ("c", 40)]


def oracle_join(left, right, how):
    lk = {k for k, _ in left}
    rk = {k for k, _ in right}
    out = []
    for k in lk | rk:
        lv = [v for kk, v in left if kk == k]
        rv = [v for kk, v in right if kk == k]
        if lv and rv:
            out += [(k, a, b) for a in lv for b in rv]
        elif lv and not rv and how in ("left", "full"):
            out += [(k, a, None) for a in lv]
        elif rv and not lv and how in ("right", "full"):
            out += [(k, None, b) for b in rv]
    return sorted(out, key=str)


@pytest.fixture(scope="module")
def lr(spark):
    ldf = spark.createDataFrame(L, ["k", "v"])
    rdf = spark.createDataFrame(R, ["k", "w"])
    return (
        group_sort(ldf, "k", order_by="v", num_partitions=2),
        group_sort(rdf, "k", order_by="w", num_partitions=2),
    )


@pytest.mark.parametrize("how", ["inner", "left", "right", "full"])
def test_join_flavors_vs_oracle(spark, lr, how):
    lgs, rgs = lr
    out = merge_join(lgs, rgs, how=how)
    got = sorted(((r.k, r.v, r.w) for r in out.to_df().collect()), key=str)
    assert got == oracle_join(L, R, how)


def test_semi_anti(spark, lr):
    lgs, rgs = lr
    semi = sorted(map(tuple, merge_join(lgs, rgs, how="left_semi").to_df().collect()))
    anti = sorted(map(tuple, merge_join(lgs, rgs, how="left_anti").to_df().collect()))
    assert semi == [("a", 1), ("a", 2), ("b", 3)]
    assert anti == [("d", 4)]


def test_co_partitioned_join_no_extra_exchange(spark, lr):
    # the reference's zipPartitions economics: both sides laid out on k
    # with equal partition counts -> the join plans exactly the two
    # input Exchanges and no more
    lgs, rgs = lr
    plan = (
        merge_join(lgs, rgs, how="inner")
        .to_df()
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 2, plan


def test_join_key_mismatch_raises(spark, lr):
    lgs, _ = lr
    other = group_sort(spark.createDataFrame(R, ["kk", "w"]), "kk")
    with pytest.raises(ValueError, match="identical key columns"):
        merge_join(lgs, other)


def test_custom_merge_join(spark, lr):
    # J1 analogue of packageSpec.scala:60-83: custom per-key combine —
    # here: sum(left values) paired with count(right values)
    lgs, rgs = lr

    def fn(key, lpdf, rpdf):
        return pd.DataFrame(
            {"k": [key[0]], "lsum": [int(lpdf["v"].sum())], "rcnt": [len(rpdf)]}
        )

    out = merge_join_custom(lgs, rgs, fn, "k string, lsum bigint, rcnt bigint")
    got = {(r.k): (r.lsum, r.rcnt) for r in out.collect()}
    assert got == {"a": (3, 1), "b": (3, 2), "c": (0, 1), "d": (4, 0)}


def test_custom_join_sees_value_order(spark):
    # right side ordered desc; custom f reads first row of each side
    ldf = spark.createDataFrame([("a", 2), ("a", 1)], ["k", "v"])
    rdf = spark.createDataFrame([("a", 5), ("a", 9)], ["k", "v"])
    lgs = group_sort(ldf, "k", order_by="v", num_partitions=2)
    rgs = group_sort(rdf, "k", order_by=[("v", False)], num_partitions=2)

    def fn(key, lpdf, rpdf):
        return pd.DataFrame(
            {"k": [key[0]], "lfirst": [lpdf["v"].iloc[0]], "rfirst": [rpdf["v"].iloc[0]]}
        )

    out = merge_join_custom(lgs, rgs, fn, "k string, lfirst bigint, rfirst bigint")
    assert [(r.lfirst, r.rfirst) for r in out.collect()] == [(1, 9)]


def test_custom_join_arrow_tier_matches_pandas(spark, lr):
    # same custom combine through cogroup().applyInArrow — no pandas on
    # the hot path; results must match the pandas tier exactly
    import pyarrow as pa

    lgs, rgs = lr

    def fn_pd(key, lpdf, rpdf):
        return pd.DataFrame(
            {"k": [key[0]], "lsum": [int(lpdf["v"].sum())], "rcnt": [len(rpdf)]}
        )

    def fn_arrow(key, ltab, rtab):
        lsum = pa.compute.sum(ltab["v"]).as_py() if ltab.num_rows else 0
        return pa.Table.from_pydict(
            {"k": [key[0].as_py()], "lsum": [int(lsum or 0)], "rcnt": [rtab.num_rows]}
        )

    schema = "k string, lsum bigint, rcnt bigint"
    got_pd = {
        r.k: (r.lsum, r.rcnt)
        for r in merge_join_custom(lgs, rgs, fn_pd, schema).collect()
    }
    got_ar = {
        r.k: (r.lsum, r.rcnt)
        for r in merge_join_custom(lgs, rgs, fn_arrow, schema, tier="arrow").collect()
    }
    assert got_ar == got_pd


def test_custom_join_arrow_sees_value_order(spark):
    import pyarrow as pa

    ldf = spark.createDataFrame([("a", 2), ("a", 1)], ["k", "v"])
    rdf = spark.createDataFrame([("a", 5), ("a", 9)], ["k", "v"])
    lgs = group_sort(ldf, "k", order_by="v", num_partitions=2)
    rgs = group_sort(rdf, "k", order_by=[("v", False)], num_partitions=2)

    def fn(key, ltab, rtab):
        return pa.Table.from_pydict(
            {
                "k": [key[0].as_py()],
                "lfirst": [ltab["v"][0].as_py()],
                "rfirst": [rtab["v"][0].as_py()],
            }
        )

    out = merge_join_custom(
        lgs, rgs, fn, "k string, lfirst bigint, rfirst bigint", tier="arrow"
    )
    assert [(r.lfirst, r.rfirst) for r in out.collect()] == [(1, 9)]


@pytest.mark.parametrize("impl", [merge_union, merge_union_cogroup])
def test_merge_union_bag_semantics_and_layout(spark, impl):
    # GroupSortedSpec.scala:294-303: merge-union == bag union; result
    # must still satisfy the full group-sorted layout contract
    ldf = spark.createDataFrame(L, ["k", "v"])
    rdf = spark.createDataFrame([(k, v) for k, v in R], ["k", "v"])
    lgs = group_sort(ldf, "k", order_by="v", num_partitions=2)
    rgs = group_sort(rdf, "k", order_by="v", num_partitions=2)
    out = impl(lgs, rgs)
    assert sorted(map(tuple, out.to_df().collect())) == sorted(L + R)
    check_group_sorted(out)


def test_merge_union_cogroup_no_extra_exchange(spark):
    ldf = spark.createDataFrame(L, ["k", "v"])
    rdf = spark.createDataFrame(R, ["k", "v"])
    lgs = group_sort(ldf, "k", order_by="v", num_partitions=2)
    rgs = group_sort(rdf, "k", order_by="v", num_partitions=2)
    plan = (
        merge_union_cogroup(lgs, rgs)
        .to_df()
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 2, plan


def test_random_joins_property(spark):
    rng = random.Random(7)
    keys = "abcdefgh"
    lpairs = [(rng.choice(keys), rng.randint(0, 9)) for _ in range(40)]
    rpairs = [(rng.choice(keys), rng.randint(0, 9)) for _ in range(40)]
    lgs = group_sort(spark.createDataFrame(lpairs, ["k", "v"]), "k", num_partitions=3)
    rgs = group_sort(
        spark.createDataFrame(rpairs, ["k", "w"]), "k", num_partitions=3
    )
    for how in ("inner", "left", "right", "full"):
        got = sorted(
            ((r.k, r.v, r.w) for r in merge_join(lgs, rgs, how=how).to_df().collect()),
            key=str,
        )
        assert got == oracle_join(lpairs, rpairs, how), how


# --- merge_join_range (bucketed interval join) ---------------------------


def _naive_range(spark, ldata, rdata, low, high):
    exp = []
    for lk, lid, lt in ldata:
        for rk, rid, rt in rdata:
            if lk == rk and low <= rt - lt <= high:
                exp.append((lk, lid, lt, rid, rt))
    return sorted(exp)


@pytest.mark.parametrize("low,high,width", [
    (-100, 100, None),   # symmetric window, tightest buckets
    (0, 50, None),       # past-only window
    (-30, -10, None),    # strictly-before window
    (7, 7, None),        # exact offset (width clamps to 1)
    (-100, 100, 500),    # explicit wider bucket
])
def test_merge_join_range_matches_naive(spark, low, high, width):
    from spark_sorted_spark.operators.joins import merge_join_range

    import random

    rng = random.Random(42)
    ldata = [(f"k{i % 3}", i, rng.randrange(-200, 200)) for i in range(60)]
    rdata = [(f"k{i % 4}", 1000 + i, rng.randrange(-200, 200)) for i in range(80)]
    l = spark.createDataFrame(ldata, ["k", "event_id", "t"])
    r = spark.createDataFrame(rdata, ["k", "event_id", "t"])
    out = merge_join_range(
        l, r, "t", low=low, high=high, keys=["k"], bucket_width=width
    )
    assert sorted(out.columns) == sorted(["k", "event_id", "t", "event_id_r", "t_r"])
    got = sorted(
        (row["k"], row["event_id"], row["t"], row["event_id_r"], row["t_r"])
        for row in out.collect()
    )
    assert got == _naive_range(spark, ldata, rdata, low, high)


def test_merge_join_range_boundary_inclusive(spark):
    from spark_sorted_spark.operators.joins import merge_join_range

    l = spark.createDataFrame([("a", 1, 0)], ["k", "event_id", "t"])
    r = spark.createDataFrame(
        [("a", 10, -5), ("a", 11, -4), ("a", 12, 5), ("a", 13, 6)],
        ["k", "event_id", "t"],
    )
    out = merge_join_range(l, r, "t", low=-5, high=5, keys=["k"])
    assert sorted(row["event_id_r"] for row in out.collect()) == [10, 11, 12]


def test_merge_join_range_plan_no_cartesian(spark, sf_dir):
    from spark_sorted_spark.operators.joins import merge_join_range
    from spark_sorted_spark.sources.tpch import event_ts_us, load_table

    ev = load_table(spark, "events", sf_dir)
    ev = ev.withColumn("ts_us", event_ts_us(ev, "ts"))
    p = ev.filter(F.col("event_type") == "purchase").select("user_id", "event_id", "ts_us")
    c = ev.filter(F.col("event_type") == "click").select("user_id", "event_id", "ts_us")
    out = merge_join_range(p, c, "ts_us", low=-10**9, high=10**9, keys=["user_id"])
    plan = plan_of(out, "simple")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # equi-join on (key, bucket): a hash-based join node, not a range scan
    assert "Join" in plan


def test_merge_join_range_errors(spark):
    from spark_sorted_spark.operators.joins import merge_join_range

    l = spark.createDataFrame([("a", 0)], ["k", "t"])
    with pytest.raises(ValueError, match="keys="):
        merge_join_range(l, l, "t", low=0, high=1)
    with pytest.raises(ValueError, match="low"):
        merge_join_range(l, l, "t", low=5, high=1, keys=["k"])
    with pytest.raises(ValueError, match="bucket_width"):
        merge_join_range(l, l, "t", low=0, high=100, keys=["k"], bucket_width=10)
    ts = spark.createDataFrame([("a", "2024-01-01")], ["k", "t"]).select(
        "k", F.col("t").cast("timestamp").alias("t")
    )
    with pytest.raises(ValueError, match="numeric"):
        merge_join_range(ts, ts, "t", low=0, high=1, keys=["k"])


def test_merge_join_range_rejects_degenerate_inputs(spark):
    # code-review r5 findings: zero-width buckets (silent NULL-bucket
    # empty output) and time_col doubling as a key (opaque KeyError)
    from spark_sorted_spark.operators.joins import merge_join_range

    l = spark.createDataFrame([("a", 0)], ["k", "t"])
    with pytest.raises(ValueError, match="positive"):
        merge_join_range(l, l, "t", low=7, high=7, keys=["k"], bucket_width=0)
    with pytest.raises(ValueError, match="join key"):
        merge_join_range(l, l, "t", low=0, high=1, keys=["k", "t"])


def test_merge_join_range_property_matches_naive(spark):
    # hypothesis ≈ ScalaCheck (the reference's packageSpec strategy):
    # random key'd timelines + random window bounds vs the quadratic
    # naive join, including degenerate windows and negative times
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from spark_sorted_spark.operators.joins import merge_join_range

    rows = st.lists(
        st.tuples(st.integers(0, 2), st.integers(-40, 40)),
        min_size=1,
        max_size=25,
    )
    bounds = st.tuples(st.integers(-25, 25), st.integers(0, 30)).map(
        lambda t: (t[0], t[0] + t[1])  # low <= high by construction
    )

    @given(ldata=rows, rdata=rows, b=bounds)
    @settings(max_examples=10, deadline=None)
    def run(ldata, rdata, b):
        low, high = b
        lrows = [(f"k{k}", i, t) for i, (k, t) in enumerate(ldata)]
        rrows = [(f"k{k}", 100 + i, t) for i, (k, t) in enumerate(rdata)]
        l = spark.createDataFrame(lrows, ["k", "event_id", "t"])
        r = spark.createDataFrame(rrows, ["k", "event_id", "t"])
        out = merge_join_range(l, r, "t", low=low, high=high, keys=["k"])
        got = sorted(
            (row["k"], row["event_id"], row["t"], row["event_id_r"], row["t_r"])
            for row in out.collect()
        )
        assert got == _naive_range(spark, lrows, rrows, low, high)

    run()


def test_merge_join_range_exact_above_2_53(spark):
    # ADVICE r5: floor(col / w) via double flips near bucket edges for
    # |t| > 2^53 (epoch-nanos magnitude). These pairs sit exactly at a
    # bucket boundary at ~2.6e18; the double path mis-buckets and drops
    # them, the exact integral path must keep them.
    from spark_sorted_spark.operators.joins import merge_join_range

    base = 2_600_000_000_000_000_001  # > 2^53, not a multiple of w
    l = spark.createDataFrame(
        [("a", 1, base), ("a", 2, base + 10**9 - 1)], ["k", "event_id", "t"]
    )
    r = spark.createDataFrame(
        [("a", 10, base + 1), ("a", 11, base + 10**9)], ["k", "event_id", "t"]
    )
    out = merge_join_range(l, r, "t", low=-2, high=2, keys=["k"])
    got = sorted((row["event_id"], row["event_id_r"]) for row in out.collect())
    assert got == [(1, 10), (2, 11)]


def test_merge_join_range_negative_times_exact(spark):
    # pmod-based floor division must behave as floor (not truncation)
    # for negative times
    from spark_sorted_spark.operators.joins import merge_join_range

    l = spark.createDataFrame([("a", 1, -7)], ["k", "event_id", "t"])
    r = spark.createDataFrame(
        [("a", 10, -9), ("a", 11, -5), ("a", 12, -1)], ["k", "event_id", "t"]
    )
    out = merge_join_range(l, r, "t", low=-3, high=3, keys=["k"])
    assert sorted(row["event_id_r"] for row in out.collect()) == [10, 11]


def test_merge_join_range_keys_conflict_raises(spark):
    # ADVICE r5: keys= alongside a group-sorted left with different key
    # columns used to be silently ignored
    from spark_sorted_spark.operators.joins import merge_join_range

    l = spark.createDataFrame([("a", "x", 0)], ["k", "k2", "t"])
    gs = group_sort(l, "k")
    with pytest.raises(ValueError, match="conflicts"):
        merge_join_range(gs, l, "t", low=0, high=1, keys=["k2"])
    # matching keys= is fine (redundant, not conflicting)
    merge_join_range(gs, l, "t", low=0, high=1, keys=["k"]).collect()


def test_merge_join_range_bucket_column_collision(spark):
    # ADVICE r5: a user column literally named __bucket must survive
    from spark_sorted_spark.operators.joins import merge_join_range

    l = spark.createDataFrame([("a", 5, 0)], ["k", "__bucket", "t"])
    r = spark.createDataFrame([("a", 7, 1)], ["k", "__bucket", "t"])
    out = merge_join_range(l, r, "t", low=0, high=2, keys=["k"])
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["__bucket"] == 5 and rows[0]["__bucket_r"] == 7


def test_merge_join_range_hot_bucket_skew(spark):
    # 10x skew: one key concentrates 2000 rows in a single (key,
    # bucket) cell while 10 normal keys hold 20 rows each. AQE
    # skew-join (the documented mitigation — the bucket join is a
    # plain SortMergeJoin, so the hot cell is a splittable oversized
    # shuffle partition) must deliver the exact pair count; the dense
    # cell's quadratic output is the query's true semantics.
    import random

    from spark_sorted_spark.operators.joins import merge_join_range

    rng = random.Random(7)
    times = {f"k{i}": [rng.randrange(0, 1000) for _ in range(20)] for i in range(10)}
    times["hot"] = [500] * 2000
    rows = [(k, t) for k, ts in times.items() for t in ts]
    low, high = -5, 5
    expected = sum(
        sum(1 for lt in ts for rt in ts if low <= rt - lt <= high)
        for ts in times.values()
    )
    df = spark.createDataFrame(rows, ["k", "t"]).repartition(32)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        out = merge_join_range(df, df, "t", low=low, high=high, keys=["k"])
        plan = plan_of(out, "simple")
        assert "SortMergeJoin" in plan and "CartesianProduct" not in plan
        assert out.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def _naive_overlap(spark, ldata, rdata):
    out = []
    for lk, lid, ls, le in ldata:
        if ls > le:
            continue
        for rk, rid, rs, re_ in rdata:
            if rs > re_ or rk != lk:
                continue
            if ls <= re_ and rs <= le:
                out.append((lk, lid, ls, le, rid, rs, re_))
    return sorted(out)


@pytest.mark.parametrize("width", [1, 7, 50, 1000])
def test_interval_overlap_join_matches_naive(spark, width):
    # random intervals of wildly mixed lengths across shared and
    # unshared keys; every bucket width must produce the same exact
    # pair set, each pair exactly once
    import random

    from spark_sorted_spark.operators.joins import interval_overlap_join

    rng = random.Random(11)

    def mk(n, base):
        rows = []
        for i in range(n):
            s = rng.randrange(-300, 300)
            rows.append((f"k{i % 4}", base + i, s, s + rng.randrange(0, 80)))
        return rows

    ldata, rdata = mk(60, 0), mk(70, 1000)
    l = spark.createDataFrame(ldata, ["k", "iid", "s", "e"])
    r = spark.createDataFrame(rdata, ["k", "iid", "s", "e"])
    out = interval_overlap_join(
        l, r, start_col="s", end_col="e", keys=["k"], bucket_width=width
    )
    assert sorted(out.columns) == sorted(
        ["k", "iid", "s", "e", "iid_r", "s_r", "e_r"]
    )
    got = sorted(
        (row["k"], row["iid"], row["s"], row["e"], row["iid_r"], row["s_r"], row["e_r"])
        for row in out.collect()
    )
    assert got == _naive_overlap(spark, ldata, rdata)


def test_interval_overlap_join_boundary_and_empty_intervals(spark):
    from spark_sorted_spark.operators.joins import interval_overlap_join

    l = spark.createDataFrame([("a", 1, 0, 10), ("a", 2, 30, 20)], ["k", "iid", "s", "e"])
    r = spark.createDataFrame(
        [("a", 10, 10, 15), ("a", 11, 11, 15), ("a", 12, 25, 28)],
        ["k", "iid", "s", "e"],
    )
    out = interval_overlap_join(
        l, r, start_col="s", end_col="e", keys=["k"], bucket_width=8
    )
    rows = out.collect()
    # closed intervals touch at 10; 11 misses; interval 2 (s>e) is
    # empty and overlaps nothing even though [20,30] would hit 25-28
    assert sorted(row["iid_r"] for row in rows) == [10]
    assert all(row["iid"] == 1 for row in rows)


def test_interval_overlap_join_span_guard_and_errors(spark):
    from spark_sorted_spark.operators.joins import interval_overlap_join

    l = spark.createDataFrame([("a", 1, 0, 10)], ["k", "iid", "s", "e"])
    r = spark.createDataFrame([("a", 2, 0, 100000)], ["k", "iid", "s", "e"])
    with pytest.raises(Exception, match="spans"):
        interval_overlap_join(
            l, r, start_col="s", end_col="e", keys=["k"],
            bucket_width=10, max_span_buckets=100,
        ).collect()
    with pytest.raises(ValueError, match="at least one equality key"):
        interval_overlap_join(l, r, start_col="s", end_col="e", keys=[], bucket_width=10)
    with pytest.raises(ValueError, match="must be positive"):
        interval_overlap_join(l, r, start_col="s", end_col="e", keys=["k"], bucket_width=0)
    with pytest.raises(ValueError, match="lacks interval column"):
        interval_overlap_join(l, r, start_col="nope", end_col="e", keys=["k"], bucket_width=10)
    with pytest.raises(ValueError, match="cannot also be a join key"):
        interval_overlap_join(l, r, start_col="s", end_col="e", keys=["s"], bucket_width=10)
    bad = l.withColumn("s", F.col("s").cast("string"))
    with pytest.raises(ValueError, match="pass"):
        interval_overlap_join(bad, r, start_col="s", end_col="e", keys=["k"], bucket_width=10)


def test_interval_overlap_join_plan_no_cartesian_no_distinct(spark):
    from spark_sorted_spark.operators.joins import interval_overlap_join

    l = spark.createDataFrame([("a", 1, 0, 10)], ["k", "iid", "s", "e"])
    r = spark.createDataFrame([("a", 2, 5, 15)], ["k", "iid", "s", "e"])
    out = interval_overlap_join(
        l, r, start_col="s", end_col="e", keys=["k"], bucket_width=10
    )
    plan = plan_of(out, "simple")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    # single-bucket emission means NO dedup aggregate in the plan
    assert "HashAggregate" not in plan


def test_string_keys_mean_one_key_not_chars(spark):
    # keys="user_id" must behave as ["user_id"] in both bucketed joins
    from spark_sorted_spark.operators.joins import (
        interval_overlap_join,
        merge_join_range,
    )

    l = spark.createDataFrame([("a", 1, 0, 10)], ["kid", "iid", "s", "e"])
    r = spark.createDataFrame([("a", 2, 5, 15)], ["kid", "iid", "s", "e"])
    out = interval_overlap_join(
        l, r, start_col="s", end_col="e", keys="kid", bucket_width=10
    )
    assert out.count() == 1
    out2 = merge_join_range(
        l.select("kid", F.col("s").alias("t")),
        r.select("kid", F.col("s").alias("t")),
        "t", low=-10, high=10, keys="kid",
    )
    assert out2.count() == 1


def test_interval_overlap_join_property_matches_naive(spark):
    # hypothesis sweep: arbitrary interval shapes (empty, point,
    # long, negative-coordinate) and bucket widths — always exactly
    # the naive pair set, each pair once
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from spark_sorted_spark.operators.joins import interval_overlap_join

    iv = st.tuples(
        st.integers(0, 2),            # key
        st.integers(-50, 50),         # start
        st.integers(-10, 60),         # length (negative => empty)
    )

    @given(
        ldata=st.lists(iv, min_size=1, max_size=12),
        rdata=st.lists(iv, min_size=1, max_size=12),
        width=st.integers(1, 40),
    )
    @settings(max_examples=12, deadline=None)
    def run(ldata, rdata, width):
        lrows = [
            (f"k{k}", i, s, s + ln) for i, (k, s, ln) in enumerate(ldata)
        ]
        rrows = [
            (f"k{k}", 100 + i, s, s + ln)
            for i, (k, s, ln) in enumerate(rdata)
        ]
        l = spark.createDataFrame(lrows, ["k", "iid", "s", "e"])
        r = spark.createDataFrame(rrows, ["k", "iid", "s", "e"])
        out = interval_overlap_join(
            l, r, start_col="s", end_col="e", keys=["k"], bucket_width=width
        )
        got = sorted(
            (row["k"], row["iid"], row["s"], row["e"],
             row["iid_r"], row["s_r"], row["e_r"])
            for row in out.collect()
        )
        assert got == _naive_overlap(spark, lrows, rrows)

    run()


def test_merge_join_right_column_named_like_left_hidden_col(spark):
    """A right-side VISIBLE column that merely shares a left HIDDEN
    column's name (__gs_order_0, from an expression-valued order_by)
    must not be suffixed: the left copy is dropped before the join, so
    there is no collision (ADVICE r8)."""
    ldf = spark.createDataFrame([(1, 5), (1, 3), (2, 7)], ["k", "v"])
    rdf = spark.createDataFrame(
        [(1, "x"), (2, "y")], ["k", "__gs_order_0"]
    )
    lgs = group_sort(ldf, "k", order_by=[(F.col("v") * -1, True)])
    assert lgs.hidden_cols == ("__gs_order_0",)
    out = merge_join(lgs, group_sort(rdf, "k"), how="inner").to_df()
    assert out.columns == ["k", "v", "__gs_order_0"]
    got = sorted((r["k"], r["v"], r["__gs_order_0"]) for r in out.collect())
    assert got == [(1, 3, "x"), (1, 5, "x"), (2, 7, "y")]
