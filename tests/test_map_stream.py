"""map_stream_by_key semantics on Spark (both tiers) — mirrors
GroupSortedSpec.scala:64-76 (max broadcast), :137-145 (non-exhausted
iterator / first row per key), :147-156 (empty-output keys, issue #5),
:188-204 (take-n-per-key).
"""

import pandas as pd
from pyspark.sql import functions as F
import pytest

from spark_sorted_spark import group_sort
from spark_sorted_spark.operators.map_stream import map_stream_by_key, take_by_key

F2 = [("a", 1), ("b", 10), ("a", 3), ("b", 1), ("c", 5)]


@pytest.fixture(scope="module")
def f2(spark):
    return spark.createDataFrame(F2, ["k", "v"])


@pytest.mark.parametrize("tier", ["pandas", "stream"])
def test_identity_map_stream(spark, f2, tier):
    gs = group_sort(f2, "k", order_by="v", num_partitions=2)
    if tier == "pandas":
        fn = lambda key, pdf: pdf
    else:
        fn = lambda key, chunks: chunks
    out = map_stream_by_key(gs, fn, "k string, v bigint", tier=tier)
    assert sorted(map(tuple, out.collect())) == sorted(F2)


@pytest.mark.parametrize("tier", ["pandas", "stream"])
def test_empty_output_keys_skipped(spark, f2, tier):
    # issue #5: keys producing no output must simply vanish
    if tier == "pandas":
        fn = lambda key, pdf: pdf[pdf["k"] != "a"]
    else:
        def fn(key, chunks):
            for c in chunks:
                yield c[c["k"] != "a"]
    gs = group_sort(f2, "k", order_by="v", num_partitions=2)
    out = map_stream_by_key(gs, fn, "k string, v bigint", tier=tier)
    assert sorted(map(tuple, out.collect())) == sorted(
        [t for t in F2 if t[0] != "a"]
    )


def test_max_broadcast_per_key(spark, f2):
    # GroupSortedSpec.scala:64-76: attach per-key max to every row
    gs = group_sort(f2, "k", order_by=[("v", False)], num_partitions=2)

    def fn(key, chunks):
        mx = None
        for c in chunks:
            if mx is None:
                mx = c["v"].iloc[0]  # first row = max (desc order)
            yield c.assign(mx=mx)

    out = map_stream_by_key(gs, fn, "k string, v bigint, mx bigint", tier="stream")
    got = sorted(map(tuple, out.collect()))
    assert got == sorted([("a", 1, 3), ("a", 3, 3), ("b", 1, 10), ("b", 10, 10), ("c", 5, 5)])


@pytest.mark.parametrize("tier", ["native", "stream", "arrow"])
def test_take_by_key(spark, f2, tier):
    gs = group_sort(f2, "k", order_by="v", num_partitions=2)
    out = take_by_key(gs, 1, tier=tier)
    assert sorted(map(tuple, out.collect())) == [("a", 1), ("b", 1), ("c", 5)]


def test_take_native_no_extra_exchange_or_sort(spark, f2):
    # layout reuse: window over the group-sorted frame must not add a
    # second Exchange (one shuffle total, README.md:37 economics)
    gs = group_sort(f2, "k", order_by="v", num_partitions=2)
    plan = take_by_key(gs, 2, tier="native")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_per_partition_context_closure_idiom(spark, f2):
    # A2 (mapStreamByKey with context): context allocated once per
    # partition in the enclosing closure
    gs = group_sort(f2, "k", order_by="v", num_partitions=2)
    schema = "k string, n bigint"

    def part_fn(key, chunks):
        # reusable buffer lives in the generator's enclosing scope via
        # map_stream stream tier — emulate counting rows per key
        n = 0
        for c in chunks:
            n += len(c)
        yield pd.DataFrame({"k": [key[0]], "n": [n]})

    out = map_stream_by_key(gs, part_fn, schema, tier="stream")
    assert {(r.k, r.n) for r in out.collect()} == {("a", 2), ("b", 2), ("c", 1)}


@pytest.mark.parametrize("tier", ["pandas", "stream"])
def test_context_reusable_buffer(spark, f2, tier):
    # A2 first-class API, mirroring GroupSortedSpec.scala:78-91: a
    # mutable buffer created once per partition by `context=`, cleared
    # and refilled per key; max (first value under desc order)
    # broadcast to every row of the key.
    gs = group_sort(f2, "k", order_by=[("v", False)], num_partitions=2)

    if tier == "pandas":
        def fn(buf, key, pdf):
            buf.clear()
            buf.extend(pdf["v"].tolist())
            mx = buf[0]
            return pd.DataFrame({"k": [key[0]] * len(buf), "v": [mx] * len(buf)})
    else:
        def fn(buf, key, chunks):
            buf.clear()
            for c in chunks:
                buf.extend(c["v"].tolist())
            mx = buf[0]
            yield pd.DataFrame({"k": [key[0]] * len(buf), "v": [mx] * len(buf)})

    out = map_stream_by_key(gs, fn, "k string, v bigint", tier=tier, context=list)
    assert sorted(map(tuple, out.collect())) == sorted(
        [("a", 3), ("a", 3), ("b", 10), ("b", 10), ("c", 5)]
    )


@pytest.mark.parametrize("tier", ["stream", "arrow"])
def test_context_created_once_per_partition(spark, f2, tier):
    # The factory runs once per partition and the SAME object is passed
    # to every key (package.scala:13): a per-context counter must rise
    # strictly across the keys of a single partition.
    import pyarrow as pa

    gs = group_sort(f2, "k", order_by="v", num_partitions=1)

    if tier == "stream":
        def fn(ctx, key, chunks):
            for _ in chunks:
                pass
            ctx["n"] += 1
            yield pd.DataFrame({"k": [key[0]], "seq": [ctx["n"]]})
    else:
        def fn(ctx, key, rbs):
            for _ in rbs:
                pass
            ctx["n"] += 1
            yield pa.RecordBatch.from_pydict({"k": [key[0]], "seq": [ctx["n"]]})

    out = map_stream_by_key(
        gs, fn, "k string, seq bigint", tier=tier, context=lambda: {"n": 0}
    )
    rows = {(r.k, r.seq) for r in out.collect()}
    # one partition, three keys → the shared context counted 1, 2, 3
    assert {s for _, s in rows} == {1, 2, 3} and len(rows) == 3


def test_context_via_frame_method(spark, f2):
    # GroupSortedFrame.map_stream_by_key forwards context=
    gs = group_sort(f2, "k", order_by="v", num_partitions=2)

    def fn(buf, key, pdf):
        buf.clear()
        buf.extend(pdf["v"].tolist())
        return pd.DataFrame({"k": [key[0]], "n": [len(buf)]})

    out = gs.map_stream_by_key(fn, "k string, n bigint", tier="pandas", context=list)
    assert {(r.k, r.n) for r in out.collect()} == {("a", 2), ("b", 2), ("c", 1)}


def test_single_huge_group_streams_in_bounded_memory(spark):
    # The reference's core claim (README.md:4): one key, many rows —
    # the stream tier must never materialize the group. 200k rows
    # through mapInPandas with a per-chunk running aggregate; peak
    # per-callback allocation is O(arrow batch), asserted by observing
    # chunk sizes rather than rss (stable across environments).
    import pandas as pd

    from spark_sorted_spark import group_sort
    from spark_sorted_spark.operators.map_stream import map_stream_by_key

    n = 200_000
    df = spark.range(n).select(
        F.lit("hot").alias("k"), F.col("id").alias("v")
    )
    gs = group_sort(df, "k", order_by="v", num_partitions=2)

    def fn(key, chunks):
        total, count, max_chunk = 0, 0, 0
        for c in chunks:
            max_chunk = max(max_chunk, len(c))
            total += int(c["v"].sum())
            count += len(c)
        yield pd.DataFrame(
            {"k": [key[0]], "s": [total], "n": [count], "mx": [max_chunk]}
        )

    rows = map_stream_by_key(
        gs, fn, "k string, s bigint, n bigint, mx bigint", tier="stream"
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["s"], r["n"]) == (n * (n - 1) // 2, n)
    # the group arrived as many bounded chunks, not one giant frame
    assert r["mx"] < n, "group was materialized in a single chunk"


def test_arrow_tier_matches_stream_tier(spark):
    import pyarrow as pa

    df = spark.createDataFrame(F2 * 50, ["k", "v"])
    gs = group_sort(df, "k", order_by="v", num_partitions=2)

    def fn_arrow(key, rbs):
        n, s = 0, 0
        for rb in rbs:
            col = rb.column(rb.schema.get_field_index("v"))
            n += rb.num_rows
            s += sum(col.to_pylist())
        yield pa.RecordBatch.from_pydict({"k": [key[0]], "n": [n], "s": [s]})

    import pandas as pd

    def fn_pandas(key, chunks):
        n, s = 0, 0
        for c in chunks:
            n += len(c)
            s += int(c["v"].sum())
        yield pd.DataFrame({"k": [key[0]], "n": [n], "s": [s]})

    schema = "k string, n bigint, s bigint"
    got_a = sorted(map(tuple, map_stream_by_key(gs, fn_arrow, schema, tier="arrow").collect()))
    got_p = sorted(map(tuple, map_stream_by_key(gs, fn_pandas, schema, tier="stream").collect()))
    assert got_a == got_p and len(got_a) == 3
