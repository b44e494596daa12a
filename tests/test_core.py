"""Layout construction + invariants + narrow-op metadata bookkeeping.

Mirrors the reference's layout contract tests
(GroupSortedSpec.scala:12-40, GroupSortedDatasetSpec.scala:22-53).
"""

import pytest
from pyspark.sql import functions as F

from spark_sorted_spark import group_sort
from spark_sorted_spark.plans.invariants import InvariantViolation, check_group_sorted

from conftest import plan_of

# F1 canonical literal (GroupSortedSpec.scala:94)
F1 = [("c", "x"), ("a", "b"), ("a", "c"), ("b", "e"), ("b", "d")]
# F2 canonical literal (GroupSortedSpec.scala:55)
F2 = [("a", 1), ("b", 10), ("a", 3), ("b", 1), ("c", 5)]


def test_group_sort_roundtrip_preserves_rows(spark):
    df = spark.createDataFrame(F1, ["k", "v"])
    gs = group_sort(df, "k", num_partitions=2)
    assert sorted(map(tuple, gs.to_df().collect())) == sorted(F1)
    check_group_sorted(gs)


def test_group_sort_value_order_asc_desc(spark):
    df = spark.createDataFrame(F2, ["k", "v"])
    for reverse in (False, True):
        gs = group_sort(df, "k", order_by="v", num_partitions=2, reverse=reverse)
        check_group_sorted(gs)
        assert sorted(map(tuple, gs.to_df().collect())) == sorted(F2)


def test_empty_input(spark):
    # GroupSortedDatasetSpec.scala:43-53
    df = spark.createDataFrame([], "k string, v int")
    gs = group_sort(df, "k", order_by="v", num_partitions=2)
    assert gs.to_df().count() == 0
    check_group_sorted(gs)


def test_invariant_checker_catches_unsorted(spark):
    df = spark.createDataFrame(F2, ["k", "v"])
    # claim a value ordering we did not establish -> checker must trip
    gs = group_sort(df, "k", num_partitions=1)
    bad = type(gs)(gs.df, gs.key_cols, group_sort(df, "k", order_by="v").order_specs, 1)
    with pytest.raises(InvariantViolation):
        check_group_sorted(bad)


def test_filter_preserves_order_metadata(spark):
    df = spark.createDataFrame(F2, ["k", "v"])
    gs = group_sort(df, "k", order_by="v", num_partitions=2)
    filtered = gs.filter(F.col("v") > 1)
    assert filtered.order_specs == gs.order_specs  # P1 keeps value ordering
    check_group_sorted(filtered)
    assert sorted(map(tuple, filtered.to_df().collect())) == sorted(
        [t for t in F2 if t[1] > 1]
    )


def test_map_values_drops_order_only_when_touched(spark):
    df = spark.createDataFrame(F2, ["k", "v"])
    gs = group_sort(df, "k", order_by="v", num_partitions=2)
    kept = gs.map_values(w=F.col("v") * 2)
    assert kept.order_specs == gs.order_specs  # v untouched
    dropped = gs.map_values(v=F.col("v") * -1)
    assert dropped.order_specs == ()  # order column overwritten


def test_flat_map_values(spark):
    df = spark.createDataFrame([("a", [1, 2]), ("b", []), ("c", [3])], ["k", "vs"])
    gs = group_sort(df, "k", num_partitions=2)
    out = gs.flat_map_values(F.col("vs"), "v")
    assert sorted(map(tuple, out.to_df().collect())) == [("a", 1), ("a", 2), ("c", 3)]
    assert out.order_specs == ()


def test_map_key_values_to_values(spark):
    df = spark.createDataFrame(F2, ["k", "v"])
    gs = group_sort(df, "k", num_partitions=2)
    out = gs.map_key_values_to_values(F.concat(F.col("k"), F.col("v")).alias("kv"))
    assert sorted(r.kv for r in out.to_df().collect()) == [
        "a1",
        "a3",
        "b1",
        "b10",
        "c5",
    ]


def test_chaining_single_shuffle(spark):
    # README.md:37 / GroupSortedSpec.scala:219-232 — chained ops reuse
    # the one shuffle: exactly one Exchange in the physical plan.
    df = spark.createDataFrame(F2, ["k", "v"])
    out = (
        group_sort(df, "k", order_by="v", num_partitions=2)
        .filter(F.col("v") > 0)
        .map_values(w=F.col("v") + 1)
    )
    plan = out.to_df()._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_salted_agg_matches_plain_groupby(spark, sf_dir):
    from pyspark.sql import functions as F

    from spark_sorted_spark.operators.skew import salted_agg
    from spark_sorted_spark.sources.tpch import load_table

    li = load_table(spark, "lineitem", sf_dir).withColumn(
        "q", F.col("l_quantity").cast("bigint")
    )
    got = salted_agg(
        li, "l_orderkey", {"s": ("sum", "q"), "mn": ("min", "q"), "n": ("count", "q")}
    )
    exp = li.groupBy("l_orderkey").agg(
        F.sum("q").alias("s"), F.min("q").alias("mn"), F.count("q").alias("n")
    )
    # two-stage: exactly two Exchanges (key+salt, then key). Read the
    # plan BEFORE executing — after collect, AQE's explain string
    # repeats the tree (Final + Initial plan sections).
    plan = plan_of(got, "simple")
    assert plan.count("Exchange") == 2, plan
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))


def test_null_keys_group_together(spark):
    from pyspark.sql import functions as F

    from spark_sorted_spark import group_sort

    df = spark.createDataFrame(
        [(None, 1), (None, 2), ("a", 3), (None, 4), ("a", 5)],
        "k string, v int",
    )
    gs = group_sort(df, "k", order_by="v", num_partitions=2)
    # native fold: null key is one group (Spark groups nulls together)
    out = gs.fold_left_by_key(
        0, lambda a, v: a + v, value_col="v", alias="s", tier="native"
    )
    got = {r["k"]: r["s"] for r in out.collect()}
    assert got == {None: 7, "a": 8}
    # stream tier must agree (null-equality in the run detector)
    out2 = gs.fold_left_by_key(
        0, lambda a, v: a + v, value_col="v", alias="s", tier="stream",
        result_type="bigint",
    )
    assert {r["k"]: r["s"] for r in out2.collect()} == {None: 7, "a": 8}


def test_error_paths(spark):
    import pytest as _pt
    from pyspark.sql import functions as F

    from spark_sorted_spark import group_sort

    df = spark.createDataFrame([("a", 1)], ["k", "v"])
    with _pt.raises(ValueError, match="key columns not in"):
        group_sort(df, "nope")
    with _pt.raises(ValueError, match="at least one key"):
        group_sort(df, [])
    with _pt.raises(TypeError, match="bad order_by"):
        group_sort(df, "k", order_by=[1.5])
    gs = group_sort(df, "k", order_by="v")
    with _pt.raises(ValueError, match="tier"):
        gs.fold_left_by_key(0, lambda a, v: a, value_col="v", tier="warp")


def test_pandas_tier_works_with_arrow_disabled(spark):
    # Arrow off -> applyInPandas falls back to the slow serializer but
    # must stay correct
    from spark_sorted_spark import group_sort

    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "false")
    try:
        df = spark.createDataFrame([("a", 1), ("a", 2), ("b", 5)], ["k", "v"])
        out = group_sort(df, "k", order_by="v").fold_left_by_key(
            0, lambda a, v: a + v, value_col="v", alias="s", tier="pandas",
            result_type="bigint",
        )
        assert {r["k"]: r["s"] for r in out.collect()} == {"a": 3, "b": 5}
    finally:
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")


def test_co_layout_reuses_partition_count(spark):
    from pyspark.sql import functions as F

    from spark_sorted_spark import group_sort

    a = spark.createDataFrame([("a", 1), ("b", 2)], ["k", "v"])
    b = spark.createDataFrame([("a", 9)], ["k", "w"])
    ga = group_sort(a, "k", num_partitions=3)
    gb = ga.co_layout(b)
    assert gb.key_cols == ga.key_cols and gb.num_partitions == 3
    j = ga.merge_join_inner(gb).to_df()
    assert sorted(map(tuple, j.collect())) == [("a", 1, 9)]


def test_range_layout_gives_global_key_order(spark):
    # partition_by="range" (the reference's RangePartitioner use case,
    # PairRDDFunctions.scala:14-29): partitions hold disjoint,
    # ordered key ranges, so partition-major read order IS global
    # key order — while equal keys still share one partition
    rows = [(k, v) for k in range(50) for v in range(3)]
    df = spark.createDataFrame(rows, ["k", "v"])
    gs = group_sort(df, "k", order_by="v", num_partitions=4, partition_by="range")
    assert gs.partitioning == "range"
    check_group_sorted(gs)
    got = gs.df.select(
        F.spark_partition_id().alias("pid"), "k", "v"
    ).collect()
    # within-partition key/value sort + disjoint ascending pid ranges
    by_pid = {}
    for r in got:
        by_pid.setdefault(r.pid, []).append((r.k, r.v))
    for pid, kv in by_pid.items():
        assert kv == sorted(kv), pid
    spans = sorted(
        (min(k for k, _ in kv), max(k for k, _ in kv), pid)
        for pid, kv in by_pid.items()
    )
    assert len(spans) > 1  # the layout actually spread partitions
    for (_, hi_prev, _), (lo_next, _, _) in zip(spans, spans[1:]):
        assert hi_prev < lo_next
    # global order: concatenating partitions in pid order is sorted
    flat = [kv for _, _, pid in spans for kv in by_pid[pid]]
    assert flat == sorted(flat)


def test_range_layout_per_key_ops_shuffle_free_and_equal(spark):
    # RangePartitioning satisfies ClusteredDistribution, so the fold
    # runs on the layout shuffle alone (one Exchange) and matches the
    # hash layout's result exactly
    df = spark.createDataFrame(F2, ["k", "v"])
    outs = {}
    for scheme in ("hash", "range"):
        gs = group_sort(df, "k", order_by="v", num_partitions=2, partition_by=scheme)
        out = gs.fold_left_by_key(
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
            value_col="v",
            alias="total",
            tier="native",
        )
        plan = plan_of(out, mode="simple")
        assert plan.count("Exchange") == 1, (scheme, plan)
        outs[scheme] = sorted(map(tuple, out.collect()))
    assert outs["hash"] == outs["range"]


def test_co_layout_replicates_range_scheme(spark):
    a = spark.createDataFrame([("a", 1), ("b", 2)], ["k", "v"])
    b = spark.createDataFrame([("a", 9)], ["k", "w"])
    ga = group_sort(a, "k", num_partitions=3, partition_by="range")
    gb = ga.co_layout(b)
    assert gb.partitioning == "range" and gb.num_partitions == 3


def test_partition_by_validation_is_loud(spark):
    df = spark.createDataFrame(F2, ["k", "v"])
    with pytest.raises(ValueError, match="partition_by"):
        group_sort(df, "k", partition_by="zorder")
    from spark_sorted_spark.core import assume_group_sorted

    with pytest.raises(ValueError, match="partition_by"):
        assume_group_sorted(df, "k", partition_by="modulo")


def test_approx_aggregates_within_tolerance(spark, sf_dir):
    # the 100 TB staples: HLL++ distinct and GK-sketch percentile. No
    # oracle row (DuckDB's approx algorithms differ); pinned here
    # against the exact answers with their documented error bounds.
    import pyspark.sql.functions as F

    from spark_sorted_spark.sources.tpch import load_table

    ev = load_table(spark, "events", sf_dir)
    exact = ev.select(F.countDistinct("event_id")).head()[0]
    approx = ev.select(F.approx_count_distinct("event_id", rsd=0.02)).head()[0]
    assert abs(approx - exact) <= 0.1 * exact  # 2% rsd, 10% test margin

    exact_med = ev.select(F.median("value")).head()[0]
    approx_med = ev.select(
        F.percentile_approx("value", 0.5, accuracy=10000)
    ).head()[0]
    spread = ev.select(F.max("value") - F.min("value")).head()[0]
    assert abs(approx_med - exact_med) <= 0.01 * spread


def test_expression_valued_order_by(spark):
    # the reference's sortBy takes a FUNCTION of the value
    # (sql/GroupSortedDataset.scala:14-17; GroupSortedDatasetSpec.
    # scala:182-193 sorts by a struct field, reverse, with a Map
    # column riding along). order_by accepts pyspark Columns: the
    # expression is materialized as a hidden __gs_order_{i} column
    # that never reaches the user-visible relation.
    rows = [
        ("a", ("b", {"b": 1})),
        ("a", ("a", {"a": 1})),
        ("k", ("z", {"z": 9})),
        ("k", ("m", {"m": 9})),
    ]
    df = spark.createDataFrame(
        rows, "k string, v struct<tag:string, m:map<string,int>>"
    )
    gs = group_sort(
        df, "k", order_by=F.col("v")["tag"], num_partitions=2, reverse=True
    )
    check_group_sorted(gs)
    # hidden column is layout metadata: invisible to value_cols/to_df
    assert gs.value_cols == ("v",)
    assert gs.to_df().columns == ["k", "v"]
    assert "__gs_order_0" in gs.df.columns

    # stream tier: identity map_stream sees rows in expression order
    import pandas as pd

    def tags(key, chunks):
        for c in chunks:
            yield pd.DataFrame(
                {"tag": [v["tag"] for v in c["v"]], "k": key[0]}
            )

    out = gs.map_stream_by_key(
        tags, "tag string, k string", tier="stream"
    ).collect()
    by_k = {}
    for r in out:
        by_k.setdefault(r.k, []).append(r.tag)
    assert by_k == {"a": ["b", "a"], "k": ["z", "m"]}

    # native tier: fold concat follows the same expression order
    gs2 = group_sort(
        df.select("k", F.col("v")["tag"].alias("tag"), "v"),
        "k",
        order_by=[(F.col("tag"), False)],
    )
    folded = {
        r.k: r.fold
        for r in gs2.fold_left_by_key(
            F.lit(""), lambda acc, v: F.concat(acc, v), value_col="tag",
            tier="native", alias="fold",
        ).collect()
    }
    assert folded == {"a": "ba", "k": "zm"}

    # take_by_key (native + stream): top-1 by expression order, no
    # hidden-column leak in either tier's output
    from spark_sorted_spark.operators.map_stream import take_by_key

    for tier in ("native", "stream"):
        top = take_by_key(gs, 1, tier=tier)
        assert set(top.columns) == {"k", "v"}, tier
        got = {r.k: r.v.tag for r in top.collect()}
        assert got == {"a": "b", "k": "z"}, tier


def test_expression_order_by_name_collision_is_loud(spark):
    df = spark.createDataFrame([("a", 1)], ["k", "__gs_order_0"])
    with pytest.raises(ValueError, match="hidden sort column"):
        group_sort(df, "k", order_by=F.col("__gs_order_0") + 1)


def test_expression_order_through_union_and_set_ops(spark):
    # hidden expression-order columns must stay layout metadata
    # through the union family: propagated when specs agree, dropped
    # with the order when they don't, and never part of set-op row
    # equality or any user-visible output
    from spark_sorted_spark.operators.union import (
        merge_except,
        merge_intersect,
        merge_union,
    )

    df1 = spark.createDataFrame([("a", 5), ("a", 2)], ["k", "v"])
    df2 = spark.createDataFrame([("a", 9), ("b", 1)], ["k", "v"])
    g1 = group_sort(df1, "k", order_by=F.col("v") % 3)
    g2 = group_sort(df2, "k", order_by=F.col("v") % 3)

    u = merge_union(g1, g2)
    assert u.hidden_cols == ("__gs_order_0",)
    assert u.to_df().columns == ["k", "v"]
    assert sorted((r.k, r.v) for r in u.to_df().collect()) == [
        ("a", 2), ("a", 5), ("a", 9), ("b", 1),
    ]
    check_group_sorted(u)

    i = merge_intersect(g1, g2)
    assert i.to_df().columns == ["k", "v"]
    assert i.to_df().count() == 0
    e = merge_except(g1, g1)
    assert e.to_df().columns == ["k", "v"]
    assert e.to_df().count() == 0

    # disagreeing specs: order AND hidden columns drop together
    g3 = group_sort(df2, "k", order_by="v")
    u2 = merge_union(g1, g3)
    assert u2.order_specs == ()
    assert u2.hidden_cols == ()
    assert u2.to_df().columns == ["k", "v"]


def test_expression_order_equals_materialized_column_property(spark):
    # property: group_sort(df, k, order_by=EXPR) must order values
    # exactly like materializing EXPR as a column first and ordering
    # by name — across random multisets with ties (ties fall back to
    # Spark's partition-internal order in BOTH layouts, so compare
    # the sort KEY sequence, which is total)
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        rows=st.lists(
            st.tuples(st.integers(0, 3), st.integers(-50, 50)),
            min_size=1,
            max_size=30,
        )
    )
    @settings(max_examples=10, deadline=None)
    def run(rows):
        df = spark.createDataFrame(rows, "k int, v int")
        expr_gs = group_sort(df, "k", order_by=F.abs(F.col("v")) % 7)
        mat_gs = group_sort(
            df.withColumn("sk", F.abs(F.col("v")) % 7), "k", order_by="sk"
        )
        out_e = expr_gs.fold_left_by_key(
            [],
            lambda acc, v: acc + [int(v)],
            value_col="v",
            alias="seq",
            tier="pandas",
            result_type="array<bigint>",
        ).collect()
        out_m = mat_gs.fold_left_by_key(
            [],
            lambda acc, v: acc + [int(v)],
            value_col="v",
            alias="seq",
            tier="pandas",
            result_type="array<bigint>",
        ).collect()
        key_e = {r.k: [abs(v) % 7 for v in r.seq] for r in out_e}
        key_m = {r.k: [abs(v) % 7 for v in r.seq] for r in out_m}
        assert key_e == key_m
        for ks in key_e.values():
            assert ks == sorted(ks)

    run()
