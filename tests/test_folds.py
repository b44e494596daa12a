"""fold/reduce/scan per-key semantics across all tiers.

Golden values from the reference's tests: EMA fold
(GroupSortedSpec.scala:103-115, README.md:18-28), string-concat reduce
(GroupSortedSpec.scala:127-135), scanLeft n+1 rows incl. zero row
(GroupSortedSpec.scala:169-186), mutable zero safety
(GroupSortedSpec.scala:158-167).
"""

import math

import pytest
from pyspark.sql import functions as F

from spark_sorted_spark import group_sort

# FIXTURES F3 ticker/quotes analogue: (k, time, value)
F3 = [(5, 2, 0.5), (5, 1, 1.0), (1, 1, 1.2), (1, 2, 2.0), (1, 3, 3.0)]
F3_EMA = {1: 1.0736, 5: 0.26}  # golden fold result, zero=0.0, acc'=.8*acc+.2*v

TIERS_FOLD = ["native", "pandas", "stream"]


@pytest.fixture(scope="module")
def f3(spark):
    return spark.createDataFrame(F3, ["k", "t", "v"])


@pytest.mark.parametrize("tier", TIERS_FOLD)
def test_ema_fold(spark, f3, tier):
    gs = group_sort(f3, "k", order_by="t", num_partitions=2)
    if tier == "native":
        merge = lambda acc, v: acc * F.lit(0.8) + F.lit(0.2) * v
    else:
        merge = lambda acc, v: 0.8 * acc + 0.2 * v
    out = gs.fold_left_by_key(0.0, merge, value_col="v", alias="ema", tier=tier)
    got = {r.k: r.ema for r in out.collect()}
    assert set(got) == set(F3_EMA)
    for k, v in F3_EMA.items():
        assert math.isclose(got[k], v, rel_tol=1e-12), (k, got[k], v)


@pytest.mark.parametrize("tier", TIERS_FOLD)
def test_reduce_left_string_concat_order_sensitive(spark, tier):
    # GroupSortedSpec.scala:127-135: concat in value order
    data = [("a", "3"), ("a", "1"), ("a", "2"), ("b", "9"), ("b", "8")]
    df = spark.createDataFrame(data, ["k", "v"])
    gs = group_sort(df, "k", order_by="v", num_partitions=2)
    if tier == "native":
        merge = lambda acc, v: F.concat(acc, v)
    else:
        merge = lambda acc, v: acc + v
    out = gs.reduce_left_by_key(merge, value_col="v", alias="cat", tier=tier)
    got = {r.k: r.cat for r in out.collect()}
    assert got == {"a": "123", "b": "89"}


@pytest.mark.parametrize("tier", TIERS_FOLD)
def test_reduce_desc_order(spark, tier):
    data = [("a", "3"), ("a", "1"), ("a", "2")]
    df = spark.createDataFrame(data, ["k", "v"])
    gs = group_sort(df, "k", order_by="v", num_partitions=2, reverse=True)
    if tier == "native":
        merge = lambda acc, v: F.concat(acc, v)
    else:
        merge = lambda acc, v: acc + v
    out = gs.reduce_left_by_key(merge, value_col="v", alias="cat", tier=tier)
    assert {r.k: r.cat for r in out.collect()} == {"a": "321"}


@pytest.mark.parametrize("tier", ["pandas", "stream"])
def test_scan_left_emits_n_plus_1_rows_with_zero(spark, tier):
    # GroupSortedSpec.scala:169-186: scanLeft includes the initial zero
    data = [("a", 1), ("a", 2), ("b", 5)]
    df = spark.createDataFrame(data, ["k", "v"])
    gs = group_sort(df, "k", order_by="v", num_partitions=2)
    out = gs.scan_left_by_key(
        0, lambda acc, v: acc + v, value_col="v", alias="s", tier=tier
    )
    rows = sorted((r.k, r.i, r.s) for r in out.collect())
    assert rows == [("a", 0, 0), ("a", 1, 1), ("a", 2, 3), ("b", 0, 0), ("b", 1, 5)]


def test_fold_mixed_asc_desc_native(spark):
    # Mixed per-field order (the reference allows any Ordering[V]): sort
    # by (a asc, b desc) and concat — native tier uses the comparator
    # array_sort; stream tier must agree.
    rows = [
        ("k1", 1, 2, "w"),
        ("k1", 1, 9, "x"),
        ("k1", 0, 1, "y"),
        ("k2", 3, 3, "z"),
        ("k2", 3, 7, "q"),
    ]
    df = spark.createDataFrame(rows, ["k", "a", "b", "s"])
    gs = group_sort(df, "k", order_by=[("a", True), ("b", False)], num_partitions=2)
    out = gs.fold_left_by_key(
        "",
        lambda acc, v: F.concat(acc, v),
        value_col="s",
        alias="cat",
        tier="native",
    )
    got = {r.k: r.cat for r in out.collect()}
    # k1: (0,1,y) < (1,9,x) < (1,2,w); k2: (3,7,q) < (3,3,z)
    assert got == {"k1": "yxw", "k2": "qz"}
    # stream tier on the same layout agrees
    out_s = gs.fold_left_by_key(
        "", lambda acc, v: acc + v, value_col="s", alias="cat", tier="stream"
    )
    assert {r.k: r.cat for r in out_s.collect()} == got


def test_fold_mixed_order_nulls_match_spark_sort(spark):
    # asc -> nulls first, desc -> nulls last (Spark sort defaults): the
    # comparator path must place the null exactly where
    # sortWithinPartitions did so tiers agree.
    rows = [("k", 1, None, "a"), ("k", 1, 5, "b"), ("k", 0, 9, "c")]
    df = spark.createDataFrame(rows, "k string, a int, b int, s string")
    gs = group_sort(df, "k", order_by=[("a", True), ("b", False)])
    out = gs.fold_left_by_key(
        "",
        lambda acc, v: F.concat(acc, v),
        value_col="s",
        alias="cat",
        tier="native",
    )
    # (0,9,c) < (1,5,b) < (1,null,a)  — null LAST under b desc
    assert out.collect()[0].cat == "cba"


def test_scan_vectorized_matches_row_path(spark):
    data = [("a", i, float(i)) for i in range(25)] + [("b", i, 2.0) for i in range(7)]
    df = spark.createDataFrame(data, ["k", "t", "v"])
    gs = group_sort(df, "k", order_by="t", num_partitions=2)
    row = gs.scan_left_by_key(
        0.0, lambda a, v: a + v, value_col="v", alias="s", tier="stream"
    )
    vec = gs.scan_left_by_key(
        0.0,
        lambda a, v: a + v,
        value_col="v",
        alias="s",
        tier="stream",
        merge_vec=lambda acc, s: acc + s.cumsum(),
    )
    assert sorted(map(tuple, row.collect())) == sorted(map(tuple, vec.collect()))


@pytest.mark.parametrize("tier", ["pandas", "stream"])
def test_fold_mutable_zero_fresh_per_key(spark, tier):
    # GroupSortedSpec.scala:158-167: mutable zero must be deep-copied
    # per key (newWCreate, package.scala:175-182)
    data = [("a", "x"), ("a", "y"), ("b", "z")]
    df = spark.createDataFrame(data, ["k", "v"])
    gs = group_sort(df, "k", order_by="v", num_partitions=1)

    def merge(acc, v):
        acc = list(acc)
        acc.append(v)
        return acc

    out = gs.fold_left_by_key(
        [], merge, value_col="v", alias="vs", tier=tier, result_type="array<string>"
    )
    got = {r.k: list(r.vs) for r in out.collect()}
    assert got == {"a": ["x", "y"], "b": ["z"]}


@pytest.mark.parametrize("tier", TIERS_FOLD)
def test_fold_matches_collections_oracle_random(spark, tier):
    # property-style check vs a Python-collections oracle
    # (GroupSortedSpec.scala:32-50 pattern, fixed seed)
    import random

    rng = random.Random(42)
    data = [
        (rng.randint(0, 9), rng.randint(0, 99), float(rng.randint(-50, 50)))
        for _ in range(500)
    ]
    # make (k, t) unique so value order is deterministic
    data = list({(k, t): (k, t, v) for k, t, v in data}.values())
    df = spark.createDataFrame(data, ["k", "t", "v"])
    gs = group_sort(df, "k", order_by="t", num_partitions=3)
    if tier == "native":
        merge = lambda acc, v: acc * F.lit(0.5) + v
    else:
        merge = lambda acc, v: acc * 0.5 + v
    out = gs.fold_left_by_key(0.0, merge, value_col="v", alias="r", tier=tier)
    got = {r.k: r.r for r in out.collect()}

    expected = {}
    for k, t, v in sorted(data, key=lambda x: (x[0], x[1])):
        expected[k] = expected.get(k, 0.0) * 0.5 + v
    assert set(got) == set(expected)
    for k in expected:
        assert math.isclose(got[k], expected[k], rel_tol=1e-9), k


def test_scan_left_hypothesis_vs_accumulate(spark):
    import itertools

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from spark_sorted_spark import group_sort

    @given(
        pairs=st.lists(
            st.tuples(st.integers(0, 3), st.integers(-50, 50)),
            min_size=0,
            max_size=30,
        )
    )
    @settings(max_examples=12, deadline=None)
    def run(pairs):
        if not pairs:
            return
        rows = [(k, i, v) for i, (k, v) in enumerate(pairs)]
        df = spark.createDataFrame(rows, ["k", "i", "v"])
        gs = group_sort(df, "k", order_by="i", num_partitions=2)
        got = sorted(
            map(
                tuple,
                gs.scan_left_by_key(
                    0, lambda a, v: a + v, value_col="v", alias="s", tier="stream"
                ).collect(),
            )
        )
        expected = []
        by_key = {}
        for k, i, v in sorted(rows):
            by_key.setdefault(k, []).append(v)
        for k, vs in by_key.items():
            accs = list(itertools.accumulate(vs, initial=0))
            expected += [(k, j, a) for j, a in enumerate(accs)]
        assert got == sorted(expected)

    run()


def test_fold_mixed_order_hypothesis_vs_sorted_oracle(spark):
    # comparator-array_sort path vs a plain-Python sorted() oracle over
    # random rows, random per-field directions, and nullable second
    # field (asc -> nulls first, desc -> nulls last, Spark semantics)
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from spark_sorted_spark import group_sort

    @given(
        rows=st.lists(
            st.tuples(
                st.integers(0, 2),  # key
                st.integers(0, 3),  # a
                st.one_of(st.none(), st.integers(0, 3)),  # b (nullable)
            ),
            min_size=1,
            max_size=25,
        ),
        asc_a=st.booleans(),
        asc_b=st.booleans(),
    )
    @settings(max_examples=10, deadline=None)
    def run(rows, asc_a, asc_b):
        # order-sensitive fold: ties in (k, a, b) would make the fold
        # order unspecified on both sides — dedupe them away
        rows = list(dict.fromkeys(rows))
        data = [(k, a, b, f"s{i}") for i, (k, a, b) in enumerate(rows)]
        df = spark.createDataFrame(data, "k int, a int, b int, s string")
        gs = group_sort(df, "k", order_by=[("a", asc_a), ("b", asc_b)])
        got = {
            r.k: r.cat
            for r in gs.fold_left_by_key(
                "",
                lambda acc, v: F.concat(acc, v),
                value_col="s",
                alias="cat",
                tier="native",
            ).collect()
        }

        def keyfn(t):
            _, a, b, _ = t
            ka = a if asc_a else -a
            # Spark: asc -> nulls first, desc -> nulls last
            kb = (
                (0 if b is None else 1, 0 if b is None else (b if asc_b else -b))
                if asc_b
                else (0 if b is not None else 1, 0 if b is None else -b)
            )
            return (ka, kb)

        expected = {}
        for t in sorted(data, key=keyfn):
            expected[t[0]] = expected.get(t[0], "") + t[3]
        assert got == expected, (asc_a, asc_b, data)

    run()


def test_combine_by_key_parity(spark):
    from pyspark.sql import functions as F

    from spark_sorted_spark import group_sort

    df = spark.createDataFrame(
        [("a", 1), ("a", 5), ("b", 2), ("b", 3), ("b", 4)], ["k", "v"]
    )
    out = group_sort(df, "k").combine_by_key(
        F.sum("v").alias("s"), F.max("v").alias("mx")
    )
    assert sorted(map(tuple, out.collect())) == [("a", 6, 5), ("b", 9, 4)]


def test_fold_arrow_tier_matches_stream(spark):
    from spark_sorted_spark import group_sort

    data = [("u%d" % (i % 5), i, float(i)) for i in range(200)]
    df = spark.createDataFrame(data, ["k", "t", "v"])
    gs = group_sort(df, "k", order_by="t", num_partitions=3)
    kw = dict(value_col="v", alias="ema", result_type="double")
    mrg = lambda a, v: a * 0.9 + 0.1 * v
    got_s = sorted(map(tuple, gs.fold_left_by_key(0.0, mrg, tier="stream", **kw).collect()))
    got_a = sorted(map(tuple, gs.fold_left_by_key(0.0, mrg, tier="arrow", **kw).collect()))
    assert got_a == got_s and len(got_a) == 5


def test_zero_type_inference_rules():
    # documented inference: scalars, homogeneous containers; loud
    # TypeError (naming result_type=) for empty or mixed containers
    from spark_sorted_spark.operators.folds import _python_type_ddl

    assert _python_type_ddl(0) == "bigint"
    assert _python_type_ddl(0.0) == "double"
    assert _python_type_ddl(True) == "boolean"
    assert _python_type_ddl([0.0]) == "array<double>"
    assert _python_type_ddl(("a", "b")) == "array<string>"
    for bad in ([], (), [0, 1.5], [1, "x"]):
        with pytest.raises(TypeError, match="result_type="):
            _python_type_ddl(bad)


# ---------------------------------------------------------------------------
# auto-tier group-size guard (VERDICT r8 item 1)
# ---------------------------------------------------------------------------


def _hot_cold_frame(spark, n_hot=20_000, n_cold=5):
    # int values: the native tier requires the zero literal's type (int
    # for 0) to match the merge result type exactly
    hot = spark.range(n_hot).select(
        F.lit("hot").alias("k"), F.col("id").cast("int").alias("v")
    )
    cold = spark.range(n_cold).select(
        F.lit("cold").alias("k"), F.col("id").cast("int").alias("v")
    )
    return group_sort(hot.unionByName(cold), "k", order_by="v")


def test_fold_auto_guard_demotes_hot_key_to_stream(spark):
    """auto + Column-lambda: below the bound -> native (agg plan); past
    the bound -> stream (MapInPandas plan) with a loud warning; results
    identical both sides (dual-use lambda, same IEEE double ops)."""
    import warnings

    gsf = _hot_cold_frame(spark)
    merge = lambda acc, v: acc * 1 + v  # noqa: E731 — dual-use on scalars

    native = gsf.fold_left_by_key(0, merge, value_col="v", max_group_rows=10**6)
    assert "MapInPandas" not in native._jdf.queryExecution().executedPlan().toString()

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        demoted = gsf.fold_left_by_key(
            0, merge, value_col="v", max_group_rows=1000, group_rows_hint=20_000
        )
    assert any("demoted" in str(w.message) for w in caught)
    assert "MapInPandas" in demoted._jdf.queryExecution().executedPlan().toString()

    want = sorted((r.k, r.fold) for r in native.collect())
    assert sorted((r.k, r.fold) for r in demoted.collect()) == want
    assert want == [("cold", 10), ("hot", 20_000 * 19_999 // 2)]


def test_fold_auto_guard_sampled_estimate_finds_hot_key(spark):
    """No hint: the sampled largest-group estimate itself must catch
    the hot key (seeded sample — deterministic)."""
    import warnings

    gsf = _hot_cold_frame(spark)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = gsf.fold_left_by_key(
            0,
            lambda acc, v: acc + v,
            value_col="v",
            max_group_rows=1000,
            sample_fraction=0.05,
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
    assert any("demoted" in str(w.message) for w in caught)
    assert "MapInPandas" in plan


def test_fold_auto_guard_column_only_lambda_keeps_native_loudly(spark):
    """A Column-only merge (calls F.*) cannot run on the stream tier:
    past the bound, auto keeps native but WARNS about the O(group)
    buffer instead of silently choosing it."""
    import warnings

    gsf = _hot_cold_frame(spark, n_hot=50)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = gsf.fold_left_by_key(
            0,
            lambda acc, v: F.greatest(acc, v),
            value_col="v",
            max_group_rows=10,
            group_rows_hint=50,
        )
        rows = {r.k: r.fold for r in out.collect()}
    assert any("only" in str(w.message) and "Column" in str(w.message) for w in caught)
    assert rows == {"hot": 49, "cold": 4}


def test_reduce_auto_guard_demotes(spark):
    """Same guard on reduce_left_by_key."""
    gsf = _hot_cold_frame(spark, n_hot=200)
    native = gsf.reduce_left_by_key(
        lambda acc, v: acc + v, value_col="v", max_group_rows=None
    )
    demoted = gsf.reduce_left_by_key(
        lambda acc, v: acc + v,
        value_col="v",
        max_group_rows=100,
        group_rows_hint=200,
    )
    assert "MapInPandas" in demoted._jdf.queryExecution().executedPlan().toString()
    assert sorted((r.k, r.reduce) for r in demoted.collect()) == sorted(
        (r.k, r.reduce) for r in native.collect()
    )


def test_fold_auto_demotion_keeps_native_result_type(spark):
    """ADVICE r9 (medium): demotion must not change the output schema.
    With int values and ``zero=0`` the native tier's Catalyst-inferred
    output is ``int``; pre-fix the demoted stream tier typed it from
    ``zero`` via ``_python_type_ddl`` -> ``bigint`` — a silent schema
    change triggered only past the group-size bound, i.e. exactly at
    scale. Pin: demoted schema == native schema, values equal."""
    gsf = _hot_cold_frame(spark, n_hot=50, n_cold=5)
    merge = lambda acc, v: acc * 1 + v  # noqa: E731 — dual-use, int-typed

    native = gsf.fold_left_by_key(0, merge, value_col="v", max_group_rows=None)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        demoted = gsf.fold_left_by_key(
            0, merge, value_col="v", max_group_rows=10, group_rows_hint=50
        )
    assert "MapInPandas" in demoted._jdf.queryExecution().executedPlan().toString()
    assert demoted.schema["fold"].dataType == native.schema["fold"].dataType
    assert demoted.schema["fold"].dataType.simpleString() == "int"
    want = sorted((r.k, r.fold) for r in native.collect())
    assert sorted((r.k, r.fold) for r in demoted.collect()) == want


def test_fold_auto_demotion_raises_where_native_would(spark):
    """The module's advertised dual-use example ``acc * 0.9 + v * 0.1``
    with an INTEGER zero does not type-check under native (Catalyst's
    ``aggregate`` requires the merge result type to equal the zero's
    type). Pre-fix, the demoted stream tier silently ran it with a
    zero-derived bigint schema — truncating every EMA, and only past
    the bound. Post-fix both sides of the bound raise the same
    AnalysisException; ``zero=0.0`` fixes it on both."""
    from pyspark.errors import AnalysisException

    gsf = _hot_cold_frame(spark, n_hot=50, n_cold=5)
    merge = lambda acc, v: acc * 0.9 + v * 0.1  # noqa: E731

    with pytest.raises(AnalysisException):
        gsf.fold_left_by_key(0, merge, value_col="v", max_group_rows=None)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        with pytest.raises(AnalysisException):
            gsf.fold_left_by_key(
                0, merge, value_col="v", max_group_rows=10, group_rows_hint=50
            )
    # the documented fix works identically on both sides of the bound
    native = gsf.fold_left_by_key(0.0, merge, value_col="v", max_group_rows=None)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        demoted = gsf.fold_left_by_key(
            0.0, merge, value_col="v", max_group_rows=10, group_rows_hint=50
        )
    assert demoted.schema["fold"].dataType == native.schema["fold"].dataType
    want = {r.k: r.fold for r in native.collect()}
    got = {r.k: r.fold for r in demoted.collect()}
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12)


def test_reduce_auto_demotion_raises_where_native_would(spark):
    """Same contract on reduce: ``(acc + v) / 2`` over int values is a
    native-tier type error (merge result double != seed int); pre-fix
    the demoted stream tier silently ran it with the value column's int
    type. Post-fix: same AnalysisException both sides of the bound;
    explicit result_type= restores the stream run."""
    from pyspark.errors import AnalysisException

    gsf = _hot_cold_frame(spark, n_hot=50, n_cold=5)
    merge = lambda acc, v: (acc + v) / 2  # noqa: E731

    with pytest.raises(AnalysisException):
        gsf.reduce_left_by_key(merge, value_col="v", max_group_rows=None)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        with pytest.raises(AnalysisException):
            gsf.reduce_left_by_key(
                merge, value_col="v", max_group_rows=10, group_rows_hint=50
            )
        # explicit result_type bypasses the native probe (documented out)
        out = gsf.reduce_left_by_key(
            merge,
            value_col="v",
            result_type="double",
            max_group_rows=10,
            group_rows_hint=50,
        )
    assert out.schema["reduce"].dataType.simpleString() == "double"
    rows = {r.k: r.reduce for r in out.collect()}
    assert set(rows) == {"hot", "cold"}


def test_fold_guard_disabled_runs_no_estimate_job(spark):
    """max_group_rows=None must not launch the sampling job (bench/
    known-bounded paths): assert by plan construction being pure native
    even for the hot frame."""
    gsf = _hot_cold_frame(spark)
    out = gsf.fold_left_by_key(
        0, lambda acc, v: acc + v, value_col="v", max_group_rows=None
    )
    assert "MapInPandas" not in out._jdf.queryExecution().executedPlan().toString()
