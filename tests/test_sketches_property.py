"""Property tests: the relational sketch implementations vs
independent pure-Python replicas using the same md5-derived hashes —
the collections-oracle strategy (SURVEY §5) applied to the sketch
family. Agreement here is bit-level for HLL (same IEEE fold order)
and exact for CMS counters."""

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from spark_sorted_spark.functions.sketches import (
    _alpha_const,
    cms_build,
    cms_estimate,
    hll_distinct,
)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _h60b(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[15:30], 16)


def _py_hll(values, b=8):
    m = 1 << b
    window = 60 - b
    regs = [0] * m
    for v in values:
        h = _h60(v)
        reg = h % m
        rest = h >> b
        rho = (window + 1) - rest.bit_length() if rest > 0 else window + 1
        regs[reg] = max(regs[reg], rho)
    # fixed register order, strict left fold — same IEEE sequence as
    # the Spark F.aggregate and the DuckDB list_reduce
    hsum = 0.0
    for r in regs:
        hsum = hsum + 1.0 / (1 << r)
    zero = sum(1 for r in regs if r == 0)
    return zero, hsum, _alpha_const(m) / hsum


def _py_cms(values, width=1 << 10, depth=4):
    cells = {}
    for v in values:
        h1, h2 = _h60(v), _h60b(v)
        for i in range(depth):
            key = (i, (h1 + i * h2) % width)
            cells[key] = cells.get(key, 0) + 1
    def est(v):
        h1, h2 = _h60(v), _h60b(v)
        return min(
            cells.get((i, (h1 + i * h2) % width), 0) for i in range(depth)
        )
    return est


def test_hll_matches_python_replica_bitwise(spark):
    @given(
        values=st.lists(
            st.text(
                alphabet=st.characters(min_codepoint=97, max_codepoint=122),
                min_size=1,
                max_size=8,
            ),
            min_size=1,
            max_size=60,
        )
    )
    @settings(max_examples=6, deadline=None)
    def run(values):
        df = spark.createDataFrame([(v,) for v in values], "v string")
        got = hll_distinct(df, "v", b=8).collect()[0]
        zero, hsum, estimate = _py_hll(values)
        assert got.zero_registers == zero
        assert got.harmonic_sum == hsum  # bitwise: same fold order
        assert got.estimate == estimate
        assert got.exact_distinct == len(set(values))

    run()


def test_cms_matches_python_replica_exactly(spark):
    @given(
        values=st.lists(
            st.sampled_from([f"k{i}" for i in range(12)]),
            min_size=1,
            max_size=80,
        )
    )
    @settings(max_examples=6, deadline=None)
    def run(values):
        df = spark.createDataFrame([(v,) for v in values], "v string")
        cms = cms_build(df, "v", width=1 << 10, depth=4)
        got = {
            r.v: r.est_count
            for r in cms_estimate(
                df.distinct(), "v", cms, width=1 << 10, depth=4
            ).collect()
        }
        est = _py_cms(values)
        assert got == {v: est(v) for v in set(values)}
        # CMS invariant: never under the true count
        from collections import Counter

        true = Counter(values)
        assert all(got[v] >= true[v] for v in true)

    run()


def test_histogram_sketch_vs_python_oracle(spark):
    # bucket function and quantile walk vs a pure-Python replica —
    # same collections-oracle strategy as the HLL/CMS properties
    from spark_sorted_spark.functions.sketches import (
        histogram_quantiles,
        histogram_sketch,
    )

    @given(
        vals=st.lists(st.integers(0, 2**40), min_size=1, max_size=60),
        sub_bits=st.integers(2, 6),
    )
    @settings(max_examples=8, deadline=None)
    def run(vals, sub_bits):
        def py_bucket(v):
            s = max(v.bit_length() - 1 - sub_bits, 0)
            return (v >> s) << s

        expected = {}
        for v in vals:
            b = py_bucket(v)
            expected[b] = expected.get(b, 0) + 1

        df = spark.createDataFrame([(v,) for v in vals], "v bigint")
        sk = histogram_sketch(df, "v", sub_bits=sub_bits)
        got = {r.bucket: r.cnt for r in sk.collect()}
        assert got == expected

        # quantile walk: smallest bucket with cum*den >= tot*num
        n = sum(expected.values())
        order = sorted(expected)
        for num, den in ((1, 2), (9, 10)):
            cum = 0
            want = None
            for b in order:
                cum += expected[b]
                if cum * den >= n * num:
                    want = b
                    break
            q = histogram_quantiles(sk, [(num, den, "q")]).collect()[0].q
            assert q == want, (num, den, q, want)

    run()


def test_histogram_sketch_rejects_nulls_loudly(spark):
    # ADVICE r7: F.when(v < 0, raise).otherwise(v) passes NULLs into
    # the otherwise branch — they'd land in a null bucket that
    # inflates histogram_quantiles' denominator and silently skews
    # every quantile downward. The guard must fail the job instead.
    import pytest
    from pyspark.errors import SparkRuntimeException

    from spark_sorted_spark.functions.sketches import histogram_sketch

    df = spark.createDataFrame([(1,), (None,), (7,)], "v bigint")
    with pytest.raises(SparkRuntimeException, match="non-NULL"):
        histogram_sketch(df, "v").collect()


def test_histogram_sketch_rejects_negative_loudly(spark):
    import pytest
    from pyspark.errors import SparkRuntimeException

    from spark_sorted_spark.functions.sketches import histogram_sketch

    df = spark.createDataFrame([(1,), (-3,)], "v bigint")
    with pytest.raises(SparkRuntimeException, match="non-NULL v >= 0"):
        histogram_sketch(df, "v").collect()


def _py_kmv(values, k):
    hs = sorted({_h60(v) for v in values})
    return hs[:k]


def _py_kmv_est(kmv, k):
    if len(kmv) < k:
        return float(len(kmv))
    return float((k - 1) * (1 << 60)) / float(kmv[k - 1])


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.text(min_size=1, max_size=6), min_size=1, max_size=120),
    st.lists(st.text(min_size=1, max_size=6), min_size=1, max_size=120),
)
def test_kmv_matches_python_replica_bitwise(spark, va, vb):
    """KMV sketch, merge, estimate, and overlap vs a pure-Python
    replica on the same md5-h60 hashes: hash lists identical, merge ==
    sketching the union (row-identical), every estimate bitwise."""
    from spark_sorted_spark.functions.sketches import (
        kmv_estimate,
        kmv_merge,
        kmv_overlap,
        kmv_sketch,
    )

    k = 16
    da = spark.createDataFrame([(v,) for v in va], "v string")
    db = spark.createDataFrame([(v,) for v in vb], "v string")
    sa, sb = kmv_sketch(da, "v", k=k), kmv_sketch(db, "v", k=k)
    pa, pb = _py_kmv(va, k), _py_kmv(vb, k)
    assert list(sa.head().kmv) == pa
    assert list(sb.head().kmv) == pb
    assert kmv_estimate(sa, k).head().est == _py_kmv_est(pa, k)
    # merge == sketch of the union, bitwise
    m = kmv_merge(sa, sb, k=k).head().kmv
    assert list(m) == _py_kmv(va + vb, k)
    # overlap estimators vs replica arithmetic
    u = sorted(set(pa) | set(pb))[:k]
    matched = len([h for h in u if h in set(pa) and h in set(pb)])
    jacc = float(matched) / float(len(u))
    row = kmv_overlap(sa, sb, k=k).head()
    assert row.est_a == _py_kmv_est(pa, k)
    assert row.est_b == _py_kmv_est(pb, k)
    assert row.est_union == _py_kmv_est(u, k)
    assert row.est_jaccard == jacc
    assert row.est_intersection == jacc * _py_kmv_est(u, k)


def test_kmv_grouped_and_validation(spark):
    from spark_sorted_spark.functions.sketches import (
        kmv_estimate,
        kmv_merge,
        kmv_sketch,
    )

    import pytest as _pytest

    rows = [(i % 3, str(i)) for i in range(90)]
    df = spark.createDataFrame(rows, "g int, v string")
    sk = kmv_sketch(df, "v", k=8, keys=("g",))
    assert sk.count() == 3
    for r in sk.collect():
        assert len(r.kmv) == 8 and list(r.kmv) == sorted(r.kmv)
    est = {r.g: r.est for r in kmv_estimate(sk, 8, keys=("g",)).collect()}
    # 30 distinct per group; k=8 estimate should land within 3x
    assert all(8 <= e <= 120 for e in est.values())
    # below-k groups are EXACT
    small = spark.createDataFrame([(0, "a"), (0, "b")], "g int, v string")
    ssk = kmv_sketch(small, "v", k=8, keys=("g",))
    assert kmv_estimate(ssk, 8, keys=("g",)).head().est == 2.0
    with _pytest.raises(ValueError, match="k must be >= 2"):
        kmv_sketch(df, "v", k=1)
    # NULL values are not set members: they never enter the sketch
    # (Spark would otherwise sort the NULL hash FIRST and poison
    # every estimate; DuckDB sorts NULLs last — divergence either way)
    withnull = spark.createDataFrame(
        [(0, "a"), (0, None), (0, "b")], "g int, v string"
    )
    nsk = kmv_sketch(withnull, "v", k=8, keys=("g",)).head()
    assert len(nsk.kmv) == 2 and all(h is not None for h in nsk.kmv)
    with _pytest.raises(ValueError, match="at least one sketch"):
        kmv_merge(k=8)


def test_kmv_overlap_matrix_matches_pairwise_overlap(spark):
    """The grouped overlap matrix is row-for-row the pairwise
    kmv_overlap of the per-group sketches (pinned identity — same
    estimators, same arithmetic), one row per unordered pair."""
    from spark_sorted_spark.functions.sketches import (
        kmv_overlap,
        kmv_overlap_matrix,
        kmv_sketch,
    )

    rows = [(f"s{i % 3}", str(i)) for i in range(300)]
    rows += [(f"s{(i % 2) + 1}", str(i)) for i in range(0, 300, 2)]
    df = spark.createDataFrame(rows, "source string, v string")
    k = 16
    from pyspark.sql import functions as F

    sk = kmv_sketch(df, "v", k=k, keys=("source",))
    mat = {
        (r.source_a, r.source_b): (
            r.est_a, r.est_b, r.est_union, r.est_jaccard,
            r.est_intersection,
        )
        for r in kmv_overlap_matrix(sk, k, "source").collect()
    }
    assert set(mat) == {("s0", "s1"), ("s0", "s2"), ("s1", "s2")}
    for ga, gb in mat:
        a = sk.filter(F.col("source") == ga).drop("source")
        b = sk.filter(F.col("source") == gb).drop("source")
        r = kmv_overlap(a, b, k=k).head()
        assert mat[(ga, gb)] == (
            r.est_a, r.est_b, r.est_union, r.est_jaccard,
            r.est_intersection,
        )
