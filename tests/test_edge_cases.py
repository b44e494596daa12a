"""Edge-case probes for the round-3 surfaces: empty relations,
degenerate inputs, and parameter validation on the dedup/ANN/join
paths (the reference pins empty-input behavior at
GroupSortedDatasetSpec.scala:43-53; these extend the same discipline
to the extension operators).
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from spark_sorted_spark import group_sort


def test_merge_join_right_empty_left(spark):
    left = spark.createDataFrame([], "k string, v int")
    right = spark.createDataFrame([("a", 1), ("b", 2)], ["k", "w"])
    lgs = group_sort(left, "k", num_partitions=2)
    rgs = group_sort(right, "k", num_partitions=2)
    out = lgs.merge_join_right_outer(rgs).to_df()
    got = {(r.k, r.v, r.w) for r in out.collect()}
    assert got == {("a", None, 1), ("b", None, 2)}


def test_ngram_jaccard_empty_and_short_docs(spark):
    from spark_sorted_spark.functions.dedup import ngram_jaccard_pairs

    # empty table and sub-n-token docs must both yield zero pairs, not
    # errors (shingles() guards the descending-sequence pitfall)
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert ngram_jaccard_pairs(empty).count() == 0
    short = spark.createDataFrame([(1, "one two"), (2, "one two")], ["doc_id", "text"])
    assert ngram_jaccard_pairs(short).count() == 0


def test_minhash_lsh_empty(spark):
    from spark_sorted_spark.functions.dedup import minhash_lsh_pairs

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert minhash_lsh_pairs(empty).count() == 0


def test_embedding_lsh_explicit_planes_empty(spark):
    from spark_sorted_spark.functions.similarity import cosine_neardup_pairs_lsh

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    # auto-sizing counts the (empty) input and must not crash on log2
    assert cosine_neardup_pairs_lsh(empty, 0.5).count() == 0


def test_map_stream_context_with_empty_partition(spark):
    # a context factory must be safe on partitions that hold no groups
    df = spark.createDataFrame([("a", 1)], ["k", "v"])
    gs = group_sort(df, "k", order_by="v", num_partitions=4)  # 3 empty parts

    def fn(ctx, key, chunks):
        for c in chunks:
            ctx.append(len(c))
        yield pd.DataFrame({"k": [key[0]], "n": [sum(ctx)]})

    out = gs.map_stream_by_key(fn, "k string, n bigint", tier="stream", context=list)
    assert [(r.k, r.n) for r in out.collect()] == [("a", 1)]


def test_group_sort_bad_order_column_fails_fast(spark):
    df = spark.createDataFrame([("a", 1)], ["k", "v"])
    with pytest.raises(ValueError, match="order_by columns not in DataFrame"):
        group_sort(df, "k", order_by="nope")


def test_merge_join_custom_unknown_tier(spark):
    from spark_sorted_spark.operators.joins import merge_join_custom

    df = spark.createDataFrame([("a", 1)], ["k", "v"])
    gs = group_sort(df, "k", num_partitions=2)
    with pytest.raises(ValueError, match="unknown tier"):
        merge_join_custom(gs, gs, lambda *a: None, "k string", tier="nope")


def test_composite_keys_end_to_end(spark):
    # composite tuple keys (GroupSortedSpec.scala:242-248) through the
    # Spark layer: two-column key through fold, map_stream, and a
    # merge join on both key columns
    rows = [
        ("us", 1, 1, 10.0),
        ("us", 1, 2, 20.0),
        ("us", 2, 1, 5.0),
        ("eu", 1, 1, 7.0),
    ]
    df = spark.createDataFrame(rows, ["region", "uid", "seq", "v"])
    gs = group_sort(df, ["region", "uid"], order_by="seq", num_partitions=2)

    fold = gs.fold_left_by_key(
        0.0, lambda acc, v: acc + v, value_col="v", alias="s", tier="native"
    )
    got = {(r.region, r.uid): r.s for r in fold.collect()}
    assert got == {("us", 1): 30.0, ("us", 2): 5.0, ("eu", 1): 7.0}

    def fn(key, pdf):
        return pd.DataFrame(
            {"region": [key[0]], "uid": [key[1]], "n": [len(pdf)]}
        )

    ms = gs.map_stream_by_key(fn, "region string, uid bigint, n bigint")
    assert {(r.region, r.uid): r.n for r in ms.collect()} == {
        ("us", 1): 2,
        ("us", 2): 1,
        ("eu", 1): 1,
    }

    dim = spark.createDataFrame(
        [("us", 1, "gold"), ("eu", 1, "silver")], ["region", "uid", "tier_name"]
    )
    joined = gs.merge_join_inner(
        group_sort(dim, ["region", "uid"], num_partitions=2)
    ).to_df()
    assert joined.count() == 3  # (us,1) x2 rows + (eu,1) x1


def test_spread_small_input_noop_on_wide_input(spark):
    from spark_sorted_spark.functions.dedup import spread_small_input

    sc = spark.sparkContext
    wide = spark.range(1000).repartition(sc.defaultParallelism)
    assert spread_small_input(wide) is wide  # no extra shuffle planned


def test_fold_mixed_order_single_row_groups(spark):
    # comparator path degenerate case: every group has one row
    df = spark.createDataFrame([("a", 1, 2, 1.0), ("b", 5, 1, 2.0)], ["k", "x", "y", "v"])
    gs = group_sort(df, "k", order_by=[("x", True), ("y", False)])
    out = gs.fold_left_by_key(
        0.0, lambda acc, v: acc + v, value_col="v", alias="s", tier="native"
    )
    assert {(r.k, r.s) for r in out.collect()} == {("a", 1.0), ("b", 2.0)}


def test_ts_epoch_ns_normalization_all_dtypes():
    # ADVICE r5: tz-aware pandas input used to bypass the kind=='M'
    # branch; anything unexpected must fail loudly, not mis-convert
    import numpy as np
    import pandas as pd
    import pytest

    from spark_sorted_spark.queries import _ts_epoch_ns

    naive = pd.Series(pd.to_datetime(["2024-01-01 00:00:00", "2024-01-01 00:00:01"]))
    expect = naive.astype("int64").tolist()
    assert _ts_epoch_ns(naive).tolist() == expect
    # tz-aware, non-UTC zone: same instants → same epoch-ns
    aware = naive.dt.tz_localize("UTC").dt.tz_convert("America/New_York")
    assert _ts_epoch_ns(aware).tolist() == expect
    # historical epoch-nanos int64 layout passes through
    ints = pd.Series(np.array(expect, dtype="int64"))
    assert _ts_epoch_ns(ints).tolist() == expect
    # strings are a bug upstream, not something to coerce
    with pytest.raises(TypeError, match="unexpected ts dtype"):
        _ts_epoch_ns(pd.Series(["2024-01-01"]))
