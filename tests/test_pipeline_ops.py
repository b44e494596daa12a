"""Tests for the round-6 pipeline operators: duplicate-cluster
connected components, PII redaction, and sequence packing."""

import pytest
from pyspark.sql import functions as F

from spark_sorted_spark.functions.clusters import canonical_docs, connected_components
from spark_sorted_spark.functions.packing import pack_sequences
from spark_sorted_spark.functions.text import build_vocab, redact_pii


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "doc_a bigint, doc_b bigint")


class TestConnectedComponents:
    def test_two_components_and_transitivity(self, spark):
        # {1,2,3} via 1-2, 2-3 (1 and 3 never directly linked); {7,9}
        cc = connected_components(_edges(spark, [(1, 2), (2, 3), (9, 7)]))
        got = {(r.doc_id, r.cluster_id) for r in cc.collect()}
        assert got == {(1, 1), (2, 1), (3, 1), (7, 7), (9, 7)}

    def test_chain_needs_multiple_rounds(self, spark):
        # a 12-node path: min label must walk the whole diameter
        chain = [(i, i + 1) for i in range(12)]
        cc = connected_components(_edges(spark, chain))
        got = {(r.doc_id, r.cluster_id) for r in cc.collect()}
        assert got == {(i, 0) for i in range(13)}

    def test_iteration_cap_is_loud(self, spark):
        chain = [(i, i + 1) for i in range(12)]
        with pytest.raises(RuntimeError, match="did not converge"):
            connected_components(_edges(spark, chain), max_iters=2)

    def test_diameter_exactly_max_iters_converges(self, spark):
        # max_iters bounds CHANGE rounds, not total rounds: a path of
        # diameter D converges with max_iters == D (the detection
        # round is free)
        chain = [(i, i + 1) for i in range(5)]
        cc = connected_components(_edges(spark, chain), max_iters=5)
        assert {(r.doc_id, r.cluster_id) for r in cc.collect()} == {
            (i, 0) for i in range(6)
        }

    def test_empty_edges(self, spark):
        cc = connected_components(_edges(spark, []))
        assert cc.count() == 0
        assert cc.columns == ["doc_id", "cluster_id"]

    def test_star_matches_propagation_on_basics(self, spark):
        pairs = [(1, 2), (2, 3), (9, 7), (10, 10), (5, 4)]
        prop = connected_components(_edges(spark, pairs))
        star = connected_components(_edges(spark, pairs), algorithm="star")
        assert {(r.doc_id, r.cluster_id) for r in star.collect()} == {
            (r.doc_id, r.cluster_id) for r in prop.collect()
        }

    def test_star_converges_logarithmically_on_chains(self, spark):
        # a 64-node path has diameter 63: propagation needs 63 change
        # rounds and must trip a 10-round cap, while star finishes in
        # O(log n) rounds under the same cap — the exact regime the
        # algorithm option exists for
        chain = [(i, i + 1) for i in range(63)]
        with pytest.raises(RuntimeError, match="did not converge"):
            connected_components(_edges(spark, chain), max_iters=10)
        star = connected_components(
            _edges(spark, chain), max_iters=10, algorithm="star"
        )
        assert {(r.doc_id, r.cluster_id) for r in star.collect()} == {
            (i, 0) for i in range(64)
        }

    def test_star_empty_edges_and_self_loops(self, spark):
        assert (
            connected_components(_edges(spark, []), algorithm="star").count()
            == 0
        )
        # a self-loop-only node is a singleton cluster, same as the
        # propagation path emits
        cc = connected_components(
            _edges(spark, [(4, 4), (1, 2)]), algorithm="star"
        )
        assert {(r.doc_id, r.cluster_id) for r in cc.collect()} == {
            (4, 4),
            (1, 1),
            (2, 1),
        }

    def test_unknown_algorithm_is_loud(self, spark):
        with pytest.raises(ValueError, match="unknown algorithm"):
            connected_components(
                _edges(spark, [(1, 2)]), algorithm="bfs"
            )

    def test_canonical_docs_keeps_one_per_cluster(self, spark):
        docs = spark.createDataFrame(
            [(i, f"d{i}") for i in range(6)], "doc_id bigint, text string"
        )
        cc = connected_components(_edges(spark, [(1, 2), (2, 3), (4, 5)]))
        kept = sorted(r.doc_id for r in canonical_docs(docs, cc).collect())
        # 0 untouched; {1,2,3} -> 1; {4,5} -> 4
        assert kept == [0, 1, 4]


class TestRedactPii:
    def test_redacts_and_counts(self, spark):
        df = spark.createDataFrame(
            [
                (1, "write to a@b.io or c.d+x@e.org now"),
                (2, "host 192.168.0.1 and 10.0.0.255 up"),
                (3, "call 555-0192-1234 today"),
                (4, "clean text with no pii at all"),
            ],
            "doc_id bigint, text string",
        )
        out = {r.doc_id: r for r in redact_pii(df).collect()}
        assert out[1].text == "write to <EMAIL> or <EMAIL> now"
        assert (out[1].n_email, out[1].n_ip, out[1].n_phone) == (2, 0, 0)
        assert out[2].text == "host <IP> and <IP> up"
        assert out[2].n_ip == 2
        assert out[3].text == "call <PHONE> today"
        assert out[3].n_phone == 1
        assert out[4].text == "clean text with no pii at all"
        assert (out[4].n_email, out[4].n_ip, out[4].n_phone) == (0, 0, 0)

    def test_email_domain_not_double_counted_as_ip(self, spark):
        # the email pass swallows dotted-digit domains BEFORE the ip
        # pass runs — sequential counts never overlap
        df = spark.createDataFrame(
            [(1, "x@1.2.3.44.io then 5.6.7.8")], "doc_id bigint, text string"
        )
        r = redact_pii(df).collect()[0]
        assert r.text == "<EMAIL> then <IP>"
        assert (r.n_email, r.n_ip) == (1, 1)

    def test_digit_tld_address_falls_through_to_ip(self, spark):
        # "x@1.2.3.44" is NOT an email by the pattern (TLD must be
        # letters); the dotted quad still gets scrubbed by the ip pass
        df = spark.createDataFrame(
            [(1, "x@1.2.3.44 end")], "doc_id bigint, text string"
        )
        r = redact_pii(df).collect()[0]
        assert r.text == "x@<IP> end"
        assert (r.n_email, r.n_ip) == (0, 1)


def test_connected_components_hypothesis_vs_union_find(spark):
    # property check vs a pure-Python union-find oracle (the
    # reference's ScalaCheck-vs-collections test strategy, SURVEY §5)
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        edges=st.lists(
            st.tuples(st.integers(0, 9), st.integers(0, 9)),
            min_size=1,
            max_size=20,
        )
    )
    @settings(max_examples=10, deadline=None)
    def run(edges):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        expected = {x: find(x) for x in parent}
        cc = connected_components(_edges(spark, edges))
        got = {r.doc_id: r.cluster_id for r in cc.collect()}
        assert got == expected
        star = connected_components(_edges(spark, edges), algorithm="star")
        assert {r.doc_id: r.cluster_id for r in star.collect()} == expected

    run()


def test_pack_sequences_hypothesis_vs_python_accounting(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        sizes=st.lists(st.integers(1, 30), min_size=1, max_size=15),
        budget=st.integers(1, 40),
    )
    @settings(max_examples=10, deadline=None)
    def run(sizes, budget):
        rows = [(i, " ".join(["w"] * n), "s") for i, n in enumerate(sizes)]
        df = spark.createDataFrame(
            rows, "doc_id bigint, text string, source string"
        )
        got = {
            r.doc_id: (r.n_tokens, r.pack_first, r.pack_last, r.n_packs)
            for r in pack_sequences(df, budget=budget).collect()
        }
        cum = 0
        for i, n in enumerate(sizes):
            first, last = cum // budget, (cum + n - 1) // budget
            assert got[i] == (n, first, last, last - first + 1)
            cum += n

    run()


class TestBuildVocab:
    def test_counts_rank_and_tie_break(self, spark):
        df = spark.createDataFrame(
            [(1, "b a b c"), (2, "a b"), (3, "c a")],
            "doc_id bigint, text string",
        )
        rows = build_vocab(df, max_vocab=2).orderBy("rank").collect()
        # a: 3 occ / 3 docs; b: 3 occ / 2 docs; c: 2 occ / 2 docs —
        # a beats b on the token tie-break, c falls below the cut
        assert [(r.token, r.n_occurrences, r.n_docs, r.rank) for r in rows] == [
            ("a", 3, 3, 1),
            ("b", 3, 2, 2),
        ]

    def test_topk_is_take_ordered_not_global_sort(self, spark):
        from tests.conftest import plan_of

        df = spark.createDataFrame([(1, "x y z")], "doc_id bigint, text string")
        plan = plan_of(build_vocab(df, max_vocab=5), mode="simple")
        assert "TakeOrderedAndProject" in plan

    def test_rejects_bad_max_vocab(self, spark):
        df = spark.createDataFrame([(1, "a")], "doc_id bigint, text string")
        with pytest.raises(ValueError, match="max_vocab"):
            build_vocab(df, max_vocab=0)


class TestPackSequences:
    def test_chunk_accounting(self, spark):
        # budget 10; stream: 4 + 4 + 5 + 9 tokens
        rows = [
            (1, "a " * 4, "s"),
            (2, "b " * 4, "s"),
            (3, "c " * 5, "s"),
            (4, "d " * 9, "s"),
        ]
        df = spark.createDataFrame(
            [(i, t.strip(), s) for i, t, s in rows],
            "doc_id bigint, text string, source string",
        )
        out = {r.doc_id: r for r in pack_sequences(df, budget=10).collect()}
        # offsets: [0,4) [4,8) [8,13) [13,22)
        assert (out[1].pack_first, out[1].pack_last, out[1].n_packs) == (0, 0, 1)
        assert (out[2].pack_first, out[2].pack_last, out[2].n_packs) == (0, 0, 1)
        assert (out[3].pack_first, out[3].pack_last, out[3].n_packs) == (0, 1, 2)
        assert (out[4].pack_first, out[4].pack_last, out[4].n_packs) == (1, 2, 2)

    def test_bestfit_no_split_known_example(self, spark):
        # sizes 9,5,4,4 into budget 10: BFD sorts 9,5,4,4 -> packs
        # {9},{5,4},{4}... best-fit: 9 opens p0 (rem 1); 5 opens p1
        # (rem 5); 4 fits p1 (rem 1); 4 opens p2. 3 packs (optimal:
        # {9},{5,4},{4} is also 3 — {9+?}, nothing fits with 9)
        from spark_sorted_spark.functions.packing import pack_sequences_bestfit

        rows = [
            (1, "a " * 4, "s"),
            (2, "b " * 4, "s"),
            (3, "c " * 5, "s"),
            (4, "d " * 9, "s"),
        ]
        df = spark.createDataFrame(
            [(i, t.strip(), s) for i, t, s in rows],
            "doc_id bigint, text string, source string",
        )
        out = {r.doc_id: r.pack_id for r in pack_sequences_bestfit(df, 10).collect()}
        assert out == {4: 0, 3: 1, 1: 1, 2: 2}

    def test_bestfit_properties_and_determinism(self, spark):
        # every pack's token sum <= budget; every doc exactly once;
        # identical assignment across re-runs and repartitioning
        import random

        from spark_sorted_spark.functions.packing import pack_sequences_bestfit

        rng = random.Random(5)
        rows = [
            (i, "w " * rng.randrange(1, 40), f"s{i % 2}") for i in range(120)
        ]
        df = spark.createDataFrame(
            [(i, t.strip(), s) for i, t, s in rows],
            "doc_id bigint, text string, source string",
        )
        a = pack_sequences_bestfit(df, 64, n_shards=3).collect()
        sums: dict = {}
        seen = set()
        for r in a:
            assert r.doc_id not in seen
            seen.add(r.doc_id)
            key = (r.source, r.shard, r.pack_id)
            sums[key] = sums.get(key, 0) + r.n_tokens
        assert len(seen) == 120
        assert all(v <= 64 for v in sums.values()), max(sums.values())
        b = pack_sequences_bestfit(df.repartition(7), 64, n_shards=3).collect()
        key_of = lambda r: (r.source, r.shard, r.doc_id, r.pack_id)  # noqa: E731
        assert sorted(map(key_of, a)) == sorted(map(key_of, b))

    def test_bestfit_hypothesis_vs_python_replica(self, spark):
        # the Spark assignment must equal a pure-Python best-fit-
        # decreasing replica on random size multisets (the same
        # collections-oracle strategy the sketches use)
        import bisect

        from hypothesis import given, settings
        from hypothesis import strategies as st

        from spark_sorted_spark.functions.packing import pack_sequences_bestfit

        def py_bfd(sizes_by_id, budget):
            order = sorted(sizes_by_id.items(), key=lambda kv: (-kv[1], kv[0]))
            open_packs = []
            next_id = 0
            out = {}
            for did, s in order:
                i = bisect.bisect_left(open_packs, (s, -1))
                if i < len(open_packs):
                    rem, pid = open_packs.pop(i)
                    rem -= s
                    if rem > 0:
                        bisect.insort(open_packs, (rem, pid))
                else:
                    pid = next_id
                    next_id += 1
                    if budget - s > 0:
                        bisect.insort(open_packs, (budget - s, pid))
                out[did] = pid
            return out

        @given(
            sizes=st.lists(st.integers(1, 16), min_size=1, max_size=40),
            budget=st.integers(16, 48),
        )
        @settings(max_examples=8, deadline=None)
        def run(sizes, budget):
            rows = [(i, "w " * s, "s") for i, s in enumerate(sizes)]
            df = spark.createDataFrame(
                [(i, t.strip(), s) for i, t, s in rows],
                "doc_id bigint, text string, source string",
            )
            got = {
                r.doc_id: r.pack_id
                for r in pack_sequences_bestfit(df, budget).collect()
            }
            want = py_bfd(dict(enumerate(sizes)), budget)
            assert got == want

        run()

    def test_bestfit_oversized_doc_is_loud(self, spark):
        from spark_sorted_spark.functions.packing import pack_sequences_bestfit

        df = spark.createDataFrame(
            [(1, "x " * 20, "s")], "doc_id bigint, text string, source string"
        )
        with pytest.raises(Exception, match="exceeds the pack budget"):
            pack_sequences_bestfit(df, 10).collect()

    def test_groups_pack_independently(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c", "x"), (2, "d e f", "y")],
            "doc_id bigint, text string, source string",
        )
        out = {r.doc_id: r for r in pack_sequences(df, budget=10).collect()}
        assert out[1].pack_first == 0 and out[2].pack_first == 0

    def test_sharded_packing_parallelizes_pack_space(self, spark):
        df = spark.createDataFrame(
            [(i, "t " * 7, "s") for i in range(8)],
            "doc_id bigint, text string, source string",
        )
        out = pack_sequences(df, budget=16, n_shards=4)
        assert "shard" in out.columns
        rows = out.collect()
        # 2 docs x 8 tokens per shard => every shard fills pack 0
        by_shard = {}
        for r in rows:
            by_shard.setdefault(r.shard, []).append(r)
        assert set(by_shard) == {0, 1, 2, 3}
        for docs in by_shard.values():
            assert sorted((d.pack_first, d.pack_last) for d in docs) == [
                (0, 0),
                (0, 0),
            ]

    def test_rejects_bad_budget(self, spark):
        df = spark.createDataFrame(
            [(1, "a", "s")], "doc_id bigint, text string, source string"
        )
        with pytest.raises(ValueError, match="budget"):
            pack_sequences(df, budget=0)
        with pytest.raises(ValueError, match="n_shards"):
            pack_sequences(df, budget=8, n_shards=0)


class TestKnnJoin:
    def test_topk_rank_semantics(self, spark):
        from spark_sorted_spark.functions.similarity import knn_join_lsh

        # axis-aligned-ish vectors in 4 dims: left doc should rank
        # right neighbors by exact cosine among bucket collisions
        import random

        rng = random.Random(7)
        dim = 8
        rows = [(i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(40)]
        emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
        left = emb.filter("vec_id % 2 = 1")
        right = emb.filter("vec_id % 2 = 0")
        out = knn_join_lsh(left, right, k=2, n_planes=2, n_tables=4, dim=dim)
        rows_out = out.collect()
        assert rows_out, "no collisions at 2 planes / 4 tables is implausible"
        by_left = {}
        for r in rows_out:
            by_left.setdefault(r.left_id, []).append(r)
        for lid, rs in by_left.items():
            rs.sort(key=lambda r: r.rank)
            assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
            assert len(rs) <= 2
            # ranks ordered by non-increasing cosine
            assert all(
                rs[i].cos >= rs[i + 1].cos for i in range(len(rs) - 1)
            )

    def test_rejects_bad_k(self, spark):
        from spark_sorted_spark.functions.similarity import knn_join_lsh

        emb = spark.createDataFrame(
            [(1, [0.1, 0.2])], "vec_id bigint, embedding array<float>"
        )
        with pytest.raises(ValueError, match="k must be"):
            knn_join_lsh(emb, emb, k=0, dim=2)

    def test_auto_banding_depth_scales_with_corpus(self, spark):
        # VERDICT r7 item 4: a fixed banding default is a 100 TB
        # scale-killer (measured 11.1x wall at 10x corpus, fixed
        # depth 4). The default must derive depth from corpus count
        # with no manual argument.
        from spark_sorted_spark.functions.similarity import auto_planes

        assert auto_planes(0) == 4  # floor holds on empty/tiny corpora
        assert auto_planes(1_000) == 5
        assert auto_planes(10_000) == 9  # the measured 10x recovery regime
        assert auto_planes(10**9) == 16  # ceiling: recall stays recoverable
        # monotone non-decreasing — occupancy can only shrink with n
        depths = [auto_planes(n) for n in (10, 10**3, 10**5, 10**7, 10**9)]
        assert depths == sorted(depths)

    def test_default_depth_is_auto_and_correct(self, spark):
        # knn_join_lsh with NO depth argument must auto-size (clamps to
        # the floor of 4 on a small corpus) and still return exact-
        # cosine-verified ranks
        import random

        from spark_sorted_spark.functions.similarity import knn_join_lsh

        rng = random.Random(11)
        dim = 8
        rows = [(i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(60)]
        emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
        out = knn_join_lsh(
            emb.filter("vec_id % 2 = 1"),
            emb.filter("vec_id % 2 = 0"),
            k=2,
            n_tables=4,
            dim=dim,
        ).collect()
        assert out, "auto depth on 30 vectors must not empty the buckets"
        for r in out:
            assert r.rank in (1, 2)

    def test_exact_fallback_makes_join_total(self, spark):
        # deep single-table banding (8 planes, 1 table, 256 buckets
        # for 20 rights) leaves most lefts with no collision; with
        # exact_fallback=True every non-zero left must still get its
        # full top-k, and ranked rows must match the brute-force
        # cosine order
        import random

        from spark_sorted_spark.functions.similarity import knn_join_lsh

        rng = random.Random(23)
        dim = 8
        rows = [(i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(40)]
        emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
        left = emb.filter("vec_id % 2 = 1")
        right = emb.filter("vec_id % 2 = 0")
        kw = dict(k=2, n_planes=8, n_tables=1, dim=dim)
        partial = knn_join_lsh(left, right, **kw).collect()
        total = knn_join_lsh(left, right, exact_fallback=True, **kw).collect()
        covered = {r.left_id for r in partial}
        assert len(covered) < 20, "expected misses at 8 planes / 1 table"
        got = {}
        for r in total:
            got.setdefault(r.left_id, []).append(r)
        assert set(got) == {i for i in range(40) if i % 2 == 1}
        # miss rows agree with brute-force cosine top-k
        import math

        vecs = dict(rows)

        def cos(a, b):
            num = sum(float(x) * float(y) for x, y in zip(a, b))
            na = math.sqrt(sum(float(x) ** 2 for x in a))
            nb = math.sqrt(sum(float(x) ** 2 for x in b))
            return num / (na * nb)

        for lid in set(got) - covered:
            want = sorted(
                ((cos(vecs[lid], vecs[rid]), rid) for rid in vecs if rid % 2 == 0),
                key=lambda t: (-t[0], t[1]),
            )[:2]
            rs = sorted(got[lid], key=lambda r: r.rank)
            assert [r.right_id for r in rs] == [rid for _, rid in want]

    def test_engine_multiprobe_matches_driver_heuristic(self, spark):
        # the engine-side least-confident flip expansion must emit
        # EXACTLY the buckets the driver-side _multiprobe_buckets
        # heuristic computes (same |dot| ranking, same tie-break) —
        # dot_py and _dot_dbl are bitwise-identical folds, so the two
        # paths must agree bucket for bucket
        import random

        from spark_sorted_spark.functions.similarity import (
            _hyperplane,
            _multi_table_buckets,
            _multiprobe_buckets,
        )

        rng = random.Random(31)
        dim, n_planes, m = 8, 5, 2
        rows = [(i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(6)]
        emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
        got = _multi_table_buckets(
            emb, n_planes, 1, dim, "embedding", "vec_id", probe_bits=m
        ).collect()
        by_id = {}
        for r in got:
            by_id.setdefault(r.vec_id, set()).add(r.bucket)
        planes = [_hyperplane(p, dim) for p in range(n_planes)]
        for vid, vec in rows:
            # driver heuristic uses float64 of the float32-cast values
            v64 = [float(__import__("numpy").float32(x)) for x in vec]
            want = set(_multiprobe_buckets(v64, planes, m))
            assert by_id[vid] == want, vid

    def test_probe_bits_only_grows_candidates(self, spark):
        # probing more buckets can only improve each left's top-k
        # (same exact verify over a superset of candidates)
        import random

        from spark_sorted_spark.functions.similarity import knn_join_lsh

        rng = random.Random(37)
        dim = 8
        rows = [(i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(40)]
        emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
        left = emb.filter("vec_id % 2 = 1")
        right = emb.filter("vec_id % 2 = 0")
        kw = dict(k=1, n_planes=6, n_tables=1, dim=dim)
        base = {r.left_id: r.cos for r in knn_join_lsh(left, right, **kw).collect()}
        probed = {
            r.left_id: r.cos
            for r in knn_join_lsh(left, right, probe_bits=3, **kw).collect()
        }
        assert set(base) <= set(probed)
        for lid, c in base.items():
            assert probed[lid] >= c

    def test_zero_norm_vectors_are_skipped_not_fatal(self, spark):
        # an all-zero embedding collides readily (sign bit 1 on every
        # plane) and its cosine divides by zero — under ANSI mode that
        # aborted the whole job; now zero-norm vectors are excluded
        from spark_sorted_spark.functions.similarity import knn_join_lsh

        left = spark.createDataFrame(
            [(1, [0.0, 0.0, 0.0, 0.0]), (3, [1.0, 0.5, 0.2, 0.1])],
            "vec_id bigint, embedding array<float>",
        )
        right = spark.createDataFrame(
            [(2, [0.0, 0.0, 0.0, 0.0]), (4, [0.9, 0.4, 0.3, 0.2])],
            "vec_id bigint, embedding array<float>",
        )
        rows = knn_join_lsh(left, right, k=2, n_planes=2, n_tables=2, dim=4).collect()
        ids = {(r.left_id, r.right_id) for r in rows}
        assert all(1 not in pair and 2 not in pair for pair in ids)


class TestHllDistinct:
    def test_partition_invariance_and_accuracy(self, spark):
        from spark_sorted_spark.functions.sketches import hll_distinct

        rows = [(i, f"value_{i % 700}") for i in range(5000)]
        df = spark.createDataFrame(rows, "i bigint, v string")
        r1 = hll_distinct(df.repartition(1), "v").collect()[0]
        r8 = hll_distinct(df.repartition(8), "v").collect()[0]
        # the sketch is a max-aggregate + fixed-order fold: identical
        # bits regardless of partitioning
        assert r1 == r8
        assert r1.exact_distinct == 700
        # 256 registers -> ~6.5% standard error; allow 3 sigma
        assert abs(r1.estimate - 700) / 700 < 0.2

    def test_rejects_bad_b(self, spark):
        from spark_sorted_spark.functions.sketches import hll_distinct

        df = spark.createDataFrame([(1, "a")], "i bigint, v string")
        with pytest.raises(ValueError, match="b must be"):
            hll_distinct(df, "v", b=2)

    def test_small_cardinality_raw_vs_linear_counting(self, spark):
        # PINS the small-n contract (module docstring): at n << m the
        # RAW estimate is known-biased; corrected=True applies the
        # linear-counting branch m * ln(m / zero_registers) IN-ENGINE
        # through exactmath.ln_libm — bitwise the value DuckDB's ln
        # (same glibc libm) computes, pinned below per n.
        import math

        import duckdb

        from spark_sorted_spark.functions.sketches import hll_distinct

        m = 256
        for n in (5, 20, 60):
            rows = [(i, f"small_{i % n}") for i in range(3 * n)]
            df = spark.createDataFrame(rows, "i bigint, v string")
            r = hll_distinct(df, "v", corrected=True).collect()[0]
            assert r.exact_distinct == n
            # the zero-register count is exact state, not an estimate
            assert r.zero_registers >= m - n
            # the branch fires here (n << m): bitwise vs the oracle's
            # CASE arm AND vs driver-side math.log (same libm)
            assert r.estimate <= 2.5 * m
            want = duckdb.sql(
                f"SELECT 256.0 * ln(256.0::DOUBLE / {int(r.zero_registers)})"
            ).fetchone()[0]
            assert r.corrected_estimate == want
            assert r.corrected_estimate == m * math.log(
                m / r.zero_registers
            )
            # linear counting is tight at n << m (std err ~ sqrt(m)/m)
            assert abs(r.corrected_estimate - n) <= max(3, 0.15 * n), (
                n, r.corrected_estimate,
            )
            # and the raw estimate at n=5 is visibly biased — the
            # reason the correction branch exists at all
            if n == 5:
                assert abs(r.estimate - n) > abs(r.corrected_estimate - n)

    def test_corrected_estimate_passthrough_at_large_n(self, spark):
        # zero empty registers (or raw estimate above 2.5m) => the
        # corrected column IS the raw estimate, and the schema without
        # corrected=True is unchanged (no surprise column)
        from spark_sorted_spark.functions.sketches import hll_distinct

        rows = [(i, f"value_{i}") for i in range(20000)]
        df = spark.createDataFrame(rows, "i bigint, v string")
        r = hll_distinct(df, "v", corrected=True).collect()[0]
        assert r.estimate > 2.5 * 256
        assert r.corrected_estimate == r.estimate
        plain = hll_distinct(df, "v").columns
        assert "corrected_estimate" not in plain


class TestBloom:
    def test_no_false_negatives_and_membership(self, spark):
        from spark_sorted_spark.functions.sketches import bloom_build, bloom_members

        inserted = [(f"member_{i}",) for i in range(300)]
        df = spark.createDataFrame(inserted, "v string")
        bloom = bloom_build(df, "v", m_bits=1 << 12, k=4)
        probe = spark.createDataFrame(
            inserted + [(f"absent_{i}",) for i in range(300)], "v string"
        )
        got = {r.v for r in bloom_members(probe, "v", bloom, m_bits=1 << 12, k=4).collect()}
        # every inserted value MUST be found (no false negatives)
        assert {v for (v,) in inserted} <= got
        # false positives bounded: 300 keys in 4096 bits, k=4 ->
        # fp ~ (1-e^{-0.29})^4 ~ 0.4%; allow a generous margin
        extras = got - {v for (v,) in inserted}
        assert len(extras) < 30

    def test_duplicate_probe_rows_collapse(self, spark):
        from spark_sorted_spark.functions.sketches import bloom_build, bloom_members

        df = spark.createDataFrame([("x",)], "v string")
        bloom = bloom_build(df, "v")
        probe = spark.createDataFrame([("x",), ("x",), ("y",)], "v string")
        rows = bloom_members(probe, "v", bloom).collect()
        assert [r.v for r in rows].count("x") == 1

    def test_exact_decontamination_is_subset_of_bloom_prefilter(self, spark, sf_dir):
        from spark_sorted_spark.queries import QUERIES

        exact = {
            r.doc_id
            for r in QUERIES["decontaminate"](spark, sf_dir).collect()
        }
        bloomed = {
            r.doc_id
            for r in QUERIES["decontaminate_bloom"](spark, sf_dir).collect()
        }
        assert exact <= bloomed

    def test_rejects_bad_params(self, spark):
        from spark_sorted_spark.functions.sketches import bloom_build

        df = spark.createDataFrame([("a",)], "v string")
        with pytest.raises(ValueError, match="power of two"):
            bloom_build(df, "v", m_bits=1000)
        with pytest.raises(ValueError, match="k must be"):
            bloom_build(df, "v", k=9)

    def test_probe_param_mismatch_is_loud(self, spark):
        # a probe with different m_bits/k computes positions in a
        # different bit space -> silent false negatives; the filter
        # carries its build params and the probe must match them
        from spark_sorted_spark.functions.sketches import bloom_build, bloom_members

        df = spark.createDataFrame([("x",)], "v string")
        bloom = bloom_build(df, "v", m_bits=1 << 12, k=4)
        with pytest.raises(ValueError, match="false negatives"):
            bloom_members(df, "v", bloom, m_bits=1 << 15, k=4)
        with pytest.raises(ValueError, match="false negatives"):
            bloom_members(df, "v", bloom, m_bits=1 << 12, k=2)


class TestCountMin:
    def test_never_undercounts_and_exact_at_low_load(self, spark):
        from spark_sorted_spark.functions.sketches import cms_build, cms_estimate

        rows = [(f"t{i % 50}",) for i in range(5000)]
        df = spark.createDataFrame(rows, "v string")
        cms = cms_build(df, "v", width=1 << 10, depth=4)
        est = {
            r.v: r.est_count
            for r in cms_estimate(
                df.distinct(), "v", cms, width=1 << 10, depth=4
            ).collect()
        }
        # every token occurs 100x; 50 keys in 1024 columns -> exact
        assert est == {f"t{i}": 100 for i in range(50)}

    def test_param_mismatch_is_loud(self, spark):
        from spark_sorted_spark.functions.sketches import cms_build, cms_estimate

        df = spark.createDataFrame([("x",)], "v string")
        cms = cms_build(df, "v", width=1 << 10, depth=4)
        with pytest.raises(ValueError, match="wrong counters"):
            cms_estimate(df, "v", cms, width=1 << 12, depth=4)

    def test_rejects_bad_params(self, spark):
        from spark_sorted_spark.functions.sketches import cms_build

        df = spark.createDataFrame([("x",)], "v string")
        with pytest.raises(ValueError, match="power of two"):
            cms_build(df, "v", width=1000)
        with pytest.raises(ValueError, match="depth must be"):
            cms_build(df, "v", depth=5)


class TestDocKeywords:
    def _docs(self, spark):
        return spark.createDataFrame(
            [
                (1, "apple apple apple banana common common"),
                (2, "banana banana cherry common common common"),
                (3, "common common common common date date"),
            ],
            "doc_id bigint, text string",
        )

    def test_rare_frequent_selection_and_rank(self, spark):
        from spark_sorted_spark.functions.text import doc_keywords

        # df: apple 1, banana 2, cherry 1, date 1, common 3
        out = doc_keywords(self._docs(spark), k=2, max_df=2)
        got = {
            (r.doc_id, r.token, r.tf, r.df, r.rank) for r in out.collect()
        }
        # 'common' (df=3) is never a keyword; rank by tf desc, token asc
        assert got == {
            (1, "apple", 3, 1, 1),
            (1, "banana", 1, 2, 2),
            (2, "banana", 2, 2, 1),
            (2, "cherry", 1, 1, 2),
            (3, "date", 2, 1, 1),
        }

    def test_k_caps_per_doc_not_globally(self, spark):
        from spark_sorted_spark.functions.text import doc_keywords

        out = doc_keywords(self._docs(spark), k=1, max_df=2)
        rows = out.collect()
        assert len(rows) == 3 and all(r.rank == 1 for r in rows)

    def test_rejects_bad_params(self, spark):
        import pytest as _pytest

        from spark_sorted_spark.functions.text import doc_keywords

        with _pytest.raises(ValueError, match="k must be positive"):
            doc_keywords(self._docs(spark), k=0, max_df=2)
        with _pytest.raises(ValueError, match="max_df must be positive"):
            doc_keywords(self._docs(spark), k=2, max_df=0)


class TestCmsHeavyHitters:
    def _vals(self, spark):
        rows = (
            [("heavy1",)] * 30 + [("heavy2",)] * 25 + [("mid",)] * 10
            + [(f"light{i}",) for i in range(40)]
        )
        return spark.createDataFrame(rows, "v string")

    def test_exact_and_equals_plain_having(self, spark):
        from spark_sorted_spark.functions.sketches import cms_heavy_hitters

        out = cms_heavy_hitters(self._vals(spark), "v", min_count=20)
        got = {(r.v, r.n_occurrences) for r in out.collect()}
        assert got == {("heavy1", 30), ("heavy2", 25)}

    def test_collisions_cannot_fake_or_lose_heavy_hitters(self, spark):
        # width=2, depth=1: massive collisions — light values WILL
        # clear the sketch prefilter, but the exact pass removes them;
        # true heavy hitters can never be lost (CMS never undercounts)
        from spark_sorted_spark.functions.sketches import cms_heavy_hitters

        out = cms_heavy_hitters(
            self._vals(spark), "v", min_count=20, width=2, depth=1
        )
        got = {(r.v, r.n_occurrences) for r in out.collect()}
        assert got == {("heavy1", 30), ("heavy2", 25)}

    def test_rejects_bad_min_count(self, spark):
        from spark_sorted_spark.functions.sketches import cms_heavy_hitters

        with pytest.raises(ValueError, match="min_count must be positive"):
            cms_heavy_hitters(self._vals(spark), "v", min_count=0)


class TestNormalizeText:
    def test_normalizes_and_flags(self, spark):
        from spark_sorted_spark.functions.text import normalize_text

        df = spark.createDataFrame(
            [
                (1, "  Hello,   WORLD!  (test) "),
                (2, "already clean text"),
                (3, "Tabs\tand\nnewlines  too"),
            ],
            "doc_id bigint, text string",
        )
        out = {r.doc_id: (r.text, r.changed) for r in normalize_text(df).collect()}
        assert out[1] == ("hello world test", True)
        assert out[2] == ("already clean text", False)
        assert out[3] == ("tabs and newlines too", True)

    def test_cosmetic_variants_become_exact_duplicates(self, spark):
        # the reason this op exists: case/punct/whitespace variants
        # must collapse into ONE exact-dedup group after normalization
        from spark_sorted_spark.functions.dedup import exact_dedup
        from spark_sorted_spark.functions.text import normalize_text

        df = spark.createDataFrame(
            [
                (1, "The quick brown fox."),
                (2, "the  QUICK brown (fox)"),
                (3, "something else entirely"),
            ],
            "doc_id bigint, text string",
        )
        groups = exact_dedup(normalize_text(df)).collect()
        by_n = sorted((r.n_copies, r.keep_id) for r in groups)
        assert by_n == [(1, 3), (2, 1)]

    def test_non_latin_scripts_survive(self, spark):
        # script-preserving: \p{L}\p{N} keeps CJK/Cyrillic/Arabic/
        # accented text intact. An ASCII-only strip would normalize
        # ALL of these to '' and dedup would collapse + delete them
        # as one duplicate group (the failure this test pins out).
        from spark_sorted_spark.functions.text import normalize_text

        df = spark.createDataFrame(
            [
                (1, "日本語のテキスト。"),
                (2, "Привет, мир!"),
                (3, "mélange de café"),
                (4, "نص عربي"),
                (5, "...!!!"),  # pure punctuation -> genuinely empty
            ],
            "doc_id bigint, text string",
        )
        out = {r.doc_id: r.text for r in normalize_text(df).collect()}
        assert out[1] == "日本語のテキスト"
        assert out[2] == "привет мир"
        assert out[3] == "mélange de café"
        assert out[4] == "نص عربي"
        assert out[5] == ""
        # distinct scripts must NOT have collapsed to a common form
        assert len({v for k, v in out.items() if k != 5}) == 4


class TestNegativePairs:
    def test_counts_determinism_no_self_no_dups(self, spark):
        import collections

        from spark_sorted_spark.functions.sampling import negative_pairs

        df = spark.createDataFrame([(i,) for i in range(60)], "doc_id bigint")
        out = negative_pairs(df, m=3, n_buckets=4).collect()
        per_anchor = collections.Counter(r.doc_id for r in out)
        assert len(per_anchor) == 60 and set(per_anchor.values()) == {3}
        assert all(r.doc_id != r.neg_doc_id for r in out)
        pairs = collections.Counter((r.doc_id, r.neg_doc_id) for r in out)
        assert max(pairs.values()) == 1
        again = negative_pairs(df, m=3, n_buckets=4).collect()
        assert sorted(map(tuple, out)) == sorted(map(tuple, again))

    def test_small_buckets_cap_negatives_not_fabricate(self, spark):
        from spark_sorted_spark.functions.sampling import negative_pairs

        # 3 docs, 1 bucket: each anchor can get at most 2 negatives
        # even though m=5; a singleton corpus yields none at all
        df = spark.createDataFrame([(1,), (2,), (3,)], "doc_id bigint")
        out = negative_pairs(df, m=5, n_buckets=1).collect()
        assert len(out) == 6  # 3 anchors x 2 ring neighbors
        one = spark.createDataFrame([(9,)], "doc_id bigint")
        assert negative_pairs(one, m=5, n_buckets=1).count() == 0

    def test_rejects_bad_params(self, spark):
        from spark_sorted_spark.functions.sampling import negative_pairs

        df = spark.createDataFrame([(1,)], "doc_id bigint")
        with pytest.raises(ValueError, match="m must be positive"):
            negative_pairs(df, m=0)
        with pytest.raises(ValueError, match="n_buckets must be positive"):
            negative_pairs(df, m=1, n_buckets=0)


class TestChunkDocuments:
    def _ref(self, text, chunk, overlap):
        import re

        toks = re.split(r"\s+", text.strip())  # tokens() contract
        stride = chunk - overlap
        out, i = [], 0
        while True:
            c = toks[i : i + chunk]
            out.append((" ".join(c), len(c)))
            if i + chunk >= len(toks):
                break
            i += stride
        return out

    @pytest.mark.parametrize("chunk,overlap", [(4, 0), (4, 2), (5, 1), (1, 0)])
    def test_matches_reference_walk(self, spark, chunk, overlap):
        from spark_sorted_spark.functions.packing import chunk_documents

        docs = [
            (1, "a b c d e f g h i j"),
            (2, "x y z"),
            (3, ""),
            (4, "one"),
            (5, " ".join(f"t{k}" for k in range(23))),
        ]
        df = spark.createDataFrame(docs, "doc_id bigint, text string")
        got = {}
        for r in chunk_documents(df, chunk, overlap).collect():
            got.setdefault(r.doc_id, []).append(
                (r.chunk_idx, r.chunk_text, r.n_chunk_tokens)
            )
        for did, text in docs:
            exp = self._ref(text, chunk, overlap)
            g = sorted(got[did])
            assert [(t, n) for _, t, n in g] == exp
            assert [i for i, _, _ in g] == list(range(len(exp)))

    def test_overlap_reconstructs_original(self, spark):
        # zero-overlap chunks concatenate back to the tokenized doc
        from spark_sorted_spark.functions.packing import chunk_documents

        text = " ".join(f"w{k}" for k in range(50))
        df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
        rows = sorted(
            (r.chunk_idx, r.chunk_text)
            for r in chunk_documents(df, 7, 0).collect()
        )
        assert " ".join(t for _, t in rows) == text

    def test_rejects_bad_params(self, spark):
        from spark_sorted_spark.functions.packing import chunk_documents

        df = spark.createDataFrame([(1, "a")], "doc_id bigint, text string")
        with pytest.raises(ValueError, match="chunk_tokens must be positive"):
            chunk_documents(df, 0)
        with pytest.raises(ValueError, match="overlap must be in"):
            chunk_documents(df, 4, overlap=4)
        with pytest.raises(ValueError, match="overlap must be in"):
            chunk_documents(df, 4, overlap=-1)


class TestResampleWithGapFill:
    def test_dense_grid_carry_and_gaps(self, spark):
        from spark_sorted_spark.functions.timeseries import (
            resample_with_gap_fill,
        )

        df = spark.createDataFrame(
            [("a", 5, 10), ("a", 7, 20), ("a", 35, 30), ("b", 12, 5)],
            "k string, t bigint, v bigint",
        )
        out = resample_with_gap_fill(
            df, "t", 10,
            {"n": F.count(F.lit(1)), "s": F.sum("v")},
            keys="k", fill=("s",),
        )
        got = sorted(map(tuple, out.collect()))
        assert got == [
            ("a", 0, 2, 30, False),   # bucket with 2 events
            ("a", 10, None, 30, True),  # gap: n null, s carried
            ("a", 20, None, 30, True),
            ("a", 30, 1, 30, False),
            ("b", 10, 1, 5, False),   # key spans exactly one bucket
        ]

    def test_no_fill_leaves_gaps_null(self, spark):
        from spark_sorted_spark.functions.timeseries import (
            resample_with_gap_fill,
        )

        df = spark.createDataFrame(
            [("a", 0, 1), ("a", 25, 2)], "k string, t bigint, v bigint"
        )
        out = resample_with_gap_fill(
            df, "t", 10, {"s": F.sum("v")}, keys="k"
        )
        rows = {r.bucket_ts: (r.s, r.is_gap) for r in out.collect()}
        assert rows == {0: (1, False), 10: (None, True), 20: (2, False)}

    def test_span_guard_and_validation(self, spark):
        from spark_sorted_spark.functions.timeseries import (
            resample_with_gap_fill,
        )

        df = spark.createDataFrame(
            [("a", 0, 1), ("a", 10**6, 2)], "k string, t bigint, v bigint"
        )
        with pytest.raises(Exception, match="spans"):
            resample_with_gap_fill(
                df, "t", 10, {"s": F.sum("v")}, keys="k", max_buckets=100
            ).collect()
        with pytest.raises(ValueError, match="interval must be positive"):
            resample_with_gap_fill(df, "t", 0, {"s": F.sum("v")}, keys="k")
        with pytest.raises(ValueError, match="at least one key"):
            resample_with_gap_fill(df, "t", 10, {"s": F.sum("v")}, keys=[])
        with pytest.raises(ValueError, match="at least one aggregate"):
            resample_with_gap_fill(df, "t", 10, {}, keys="k")
        with pytest.raises(ValueError, match="not an aggs entry"):
            resample_with_gap_fill(
                df, "t", 10, {"s": F.sum("v")}, keys="k", fill=("x",)
            )
        bad = df.withColumn("t", F.col("t").cast("double"))
        with pytest.raises(ValueError, match="integral time"):
            resample_with_gap_fill(bad, "t", 10, {"s": F.sum("v")}, keys="k")


class TestSketchMerge:
    """Mergeability identities: sketch(A) ⊕ sketch(B) must be
    ROW-IDENTICAL to sketch(A ∪ B) — the property that lets 100 TB
    pipelines keep one sketch per day/shard and answer any range."""

    def _ab(self, spark):
        a = spark.createDataFrame([(f"a{i}",) for i in range(300)], "v string")
        b = spark.createDataFrame(
            [(f"a{i}",) for i in range(150, 400)], "v string"  # overlap
        )
        return a, b

    def test_hll_merge_equals_union_sketch(self, spark):
        from spark_sorted_spark.functions.sketches import (
            hll_estimate,
            hll_merge,
            hll_register_table,
        )

        a, b = self._ab(spark)
        merged = hll_merge(
            hll_register_table(a, "v"), hll_register_table(b, "v")
        )
        union = hll_register_table(a.unionByName(b), "v")
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, union.collect())
        )
        em = hll_estimate(merged).collect()[0]
        eu = hll_estimate(union).collect()[0]
        assert tuple(em) == tuple(eu)  # bitwise: same registers in

    def test_hll_distinct_unchanged_by_refactor(self, spark):
        # hll_distinct is oracle-gated: the compose-from-parts
        # refactor must keep its estimate formula intact (~450
        # distinct, b=8 => within the 1.04/sqrt(256) error band)
        from spark_sorted_spark.functions.sketches import hll_distinct

        a, b = self._ab(spark)
        r = hll_distinct(a.unionByName(b), "v").collect()[0]
        assert r.exact_distinct == 400
        assert abs(r.estimate - 400) / 400 < 0.2

    def test_bloom_merge_equals_union_filter(self, spark):
        from spark_sorted_spark.functions.sketches import (
            bloom_build,
            bloom_merge,
        )

        a, b = self._ab(spark)
        merged = bloom_merge(bloom_build(a, "v"), bloom_build(b, "v"))
        union = bloom_build(a.unionByName(b), "v")
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, union.collect())
        )

    def test_cms_merge_equals_union_sketch(self, spark):
        from spark_sorted_spark.functions.sketches import cms_build, cms_merge

        a, b = self._ab(spark)
        merged = cms_merge(cms_build(a, "v"), cms_build(b, "v"))
        union = cms_build(a.unionByName(b), "v")
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, union.collect())
        )

    def test_merge_param_mismatch_is_loud(self, spark):
        from spark_sorted_spark.functions.sketches import (
            bloom_build,
            bloom_merge,
            cms_build,
            cms_merge,
        )

        a, b = self._ab(spark)
        with pytest.raises(ValueError, match="mismatched parameters"):
            bloom_merge(
                bloom_build(a, "v", m_bits=1 << 15),
                bloom_build(b, "v", m_bits=1 << 14),
            )
        with pytest.raises(ValueError, match="mismatched parameters"):
            cms_merge(
                cms_build(a, "v", width=1 << 12),
                cms_build(b, "v", width=1 << 10),
            )
        with pytest.raises(ValueError, match="at least one"):
            cms_merge()

    def test_merge_of_all_empty_sketches_keeps_param_schema(self, spark):
        # an all-empty merge must NOT degrade the schema by dropping
        # the parameter columns — downstream probes and future merges
        # key on m_bits/k (bloom) and width/depth (cms)
        from spark_sorted_spark.functions.sketches import (
            bloom_build,
            bloom_merge,
            cms_build,
            cms_merge,
        )

        empty = spark.createDataFrame([], "doc_id bigint, v string")
        be = bloom_build(empty, "v")
        bm = bloom_merge(be, bloom_build(empty, "v"))
        assert bm.columns == be.columns and bm.count() == 0
        ce = cms_build(empty, "v")
        cm = cms_merge(ce, cms_build(empty, "v"))
        assert cm.columns == ce.columns and cm.count() == 0
        # and a later merge with a NON-empty sketch still works
        a, _ = self._ab(spark)
        again = bloom_merge(bm, bloom_build(a, "v"))
        assert sorted(map(tuple, again.collect())) == sorted(
            map(tuple, bloom_build(a, "v").collect())
        )

    def test_register_key_named_batch_col_is_rejected(self, spark):
        # 'ingest_batch_id' is the streaming store's partition column;
        # a user key with that name would slip past the forgotten-keys
        # guard and merge across groups — reject it at build time
        from spark_sorted_spark.functions.sketches import (
            hll_merge,
            hll_register_table,
        )

        df = spark.createDataFrame(
            [(1, "x")], "ingest_batch_id bigint, v string"
        )
        with pytest.raises(ValueError, match="reserved"):
            hll_register_table(df, "v", keys=["ingest_batch_id"])
        # and the generic guard no longer tolerates the column
        regs = hll_register_table(
            df.withColumnRenamed("ingest_batch_id", "grp"), "v", keys=["grp"]
        ).withColumnRenamed("grp", "ingest_batch_id")
        with pytest.raises(ValueError, match="key columns"):
            hll_merge(regs)


def test_hll_grouped_merge_equals_union_sketch(spark):
    from spark_sorted_spark.functions.sketches import (
        hll_estimate,
        hll_merge,
        hll_register_table,
    )

    a = spark.createDataFrame(
        [(f"g{i % 3}", f"v{i}") for i in range(200)], "g string, v string"
    )
    b = spark.createDataFrame(
        [(f"g{i % 3}", f"v{i}") for i in range(100, 350)], "g string, v string"
    )
    merged = hll_merge(
        hll_register_table(a, "v", keys="g"),
        hll_register_table(b, "v", keys="g"),
        keys="g",
    )
    union = hll_register_table(a.unionByName(b), "v", keys="g")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, union.collect())
    )
    em = sorted(map(tuple, hll_estimate(merged, keys="g").collect()))
    eu = sorted(map(tuple, hll_estimate(union, keys="g").collect()))
    assert em == eu and len(em) == 3


def test_grouped_hll_forgotten_keys_is_loud(spark):
    # a grouped register table processed without keys= would silently
    # merge registers across key groups — must raise instead
    from spark_sorted_spark.functions.sketches import (
        hll_estimate,
        hll_merge,
        hll_register_table,
    )

    df = spark.createDataFrame(
        [("g1", "a"), ("g2", "b")], "g string, v string"
    )
    regs = hll_register_table(df, "v", keys="g")
    with pytest.raises(ValueError, match="key columns"):
        hll_estimate(regs)
    with pytest.raises(ValueError, match="key columns"):
        hll_merge(regs, regs)
    # correct usage still fine
    assert hll_estimate(regs, keys="g").count() == 2


def test_keyed_histogram_forgotten_keys_is_loud(spark, tmp_path):
    # ADVICE r7: the histogram family needed the same guard as HLL —
    # a keyed bucket table merged/walked without keys= would return a
    # silently-global answer where the caller meant per-key
    from spark_sorted_spark.functions.sketches import (
        histogram_merge,
        histogram_quantiles,
        histogram_sketch,
    )
    from spark_sorted_spark.streaming.sketches import read_histogram

    df = spark.createDataFrame(
        [("g1", 5), ("g2", 900)], "g string, v bigint"
    )
    sk = histogram_sketch(df, "v", keys="g")
    with pytest.raises(ValueError, match="key columns"):
        histogram_quantiles(sk, [(1, 2, "med")])
    with pytest.raises(ValueError, match="key columns"):
        histogram_merge(sk, sk)
    # keyed store read: omitted keys raise; the batch partition column
    # alone stays tolerated
    store = str(tmp_path / "hist_store")
    sk.write.parquet(f"{store}/ingest_batch_id=0")
    with pytest.raises(ValueError, match="key columns"):
        read_histogram(spark, store)
    assert read_histogram(spark, store, keys="g").count() == 2
    # correct usage still fine
    assert histogram_quantiles(sk, [(1, 2, "med")], keys="g").count() == 2


def test_resample_negative_times_floor_exactly(spark):
    # epoch-relative negative times: buckets must FLOOR (-25 -> -30),
    # not truncate toward zero — the same exact decimal floor-division
    # contract as merge_join_range
    from spark_sorted_spark.functions.timeseries import resample_with_gap_fill

    df = spark.createDataFrame(
        [("a", -25, 1), ("a", 5, 2)], "k string, t bigint, v bigint"
    )
    out = resample_with_gap_fill(df, "t", 10, {"s": F.sum("v")}, keys="k")
    got = {r.bucket_ts: (r.s, r.is_gap) for r in out.collect()}
    assert got == {
        -30: (1, False),
        -20: (None, True),
        -10: (None, True),
        0: (2, False),
    }


def test_resample_hypothesis_vs_python_grid_walk(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from spark_sorted_spark.functions.timeseries import resample_with_gap_fill

    @given(
        rows=st.lists(
            st.tuples(
                st.integers(0, 2),      # key
                st.integers(-50, 50),   # time
                st.integers(-5, 5),     # value
            ),
            min_size=1,
            max_size=25,
        ),
        interval=st.integers(1, 20),
    )
    @settings(max_examples=10, deadline=None)
    def run(rows, interval):
        data = [(f"k{k}", t, v) for k, t, v in rows]
        out = resample_with_gap_fill(
            spark.createDataFrame(data, "k string, t bigint, v bigint"),
            "t", interval, {"s": F.sum("v")}, keys="k", fill=("s",),
        )
        got = sorted((r.k, r.bucket_ts, r.s, r.is_gap) for r in out.collect())

        # pure-python replica
        import collections

        per = collections.defaultdict(dict)
        for k, t, v in data:
            b = (t - (t % interval)) // interval  # python % is pmod
            per[k][b] = per[k].get(b, 0) + v
        exp = []
        for k, buckets in per.items():
            lo, hi = min(buckets), max(buckets)
            carry = None
            for b in range(lo, hi + 1):
                if b in buckets:
                    carry = buckets[b]
                    exp.append((k, b * interval, carry, False))
                else:
                    exp.append((k, b * interval, carry, True))
        assert got == sorted(exp)

    run()


def test_chunk_documents_hypothesis_random_texts(spark):
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from spark_sorted_spark.functions.packing import chunk_documents

    word = st.text(alphabet="abcXYZ09", min_size=1, max_size=4)

    @given(
        texts=st.lists(
            st.lists(word, min_size=0, max_size=30).map(" ".join),
            min_size=1,
            max_size=6,
        ),
        chunk=st.integers(1, 8),
        overlap=st.integers(0, 7),
    )
    @settings(max_examples=10, deadline=None)
    def run(texts, chunk, overlap):
        overlap = min(overlap, chunk - 1)
        docs = list(enumerate(texts))
        df = spark.createDataFrame(docs, "doc_id bigint, text string")
        got = {}
        for r in chunk_documents(df, chunk, overlap).collect():
            got.setdefault(r.doc_id, []).append(
                (r.chunk_idx, r.chunk_text, r.n_chunk_tokens)
            )
        stride = chunk - overlap
        for did, text in docs:
            toks = re.split(r"\s+", text.strip())
            exp, i = [], 0
            while True:
                c = toks[i : i + chunk]
                exp.append((" ".join(c), len(c)))
                if i + chunk >= len(toks):
                    break
                i += stride
            g = sorted(got[did])
            assert [(t, n) for _, t, n in g] == exp

    run()


def test_negative_pairs_hypothesis_vs_python_ring(spark):
    import hashlib

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from spark_sorted_spark.functions.sampling import negative_pairs

    @given(
        ids=st.sets(st.integers(0, 10_000), min_size=1, max_size=40),
        m=st.integers(1, 4),
        n_buckets=st.integers(1, 8),
    )
    @settings(max_examples=10, deadline=None)
    def run(ids, m, n_buckets):
        df = spark.createDataFrame([(i,) for i in ids], "doc_id bigint")
        got = sorted(
            (r.doc_id, r.neg_doc_id, r.j)
            for r in negative_pairs(
                df, m=m, n_buckets=n_buckets
            ).collect()
        )

        # pure-python replica of the md5 ring
        def h(i):
            return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)

        import collections

        buckets = collections.defaultdict(list)
        for i in ids:
            buckets[h(i) % n_buckets].append(i)
        exp = []
        for _, members in buckets.items():
            ring = sorted(members, key=lambda i: (h(i), i))
            n = len(ring)
            for pos, anchor in enumerate(ring):
                for j in range(1, min(m, n - 1) + 1):
                    exp.append((anchor, ring[(pos + j) % n], j))
        assert got == sorted(exp)

    run()


class TestAssignSessions:
    def test_gap_boundary_inclusive_and_numbering(self, spark):
        from spark_sorted_spark.functions.timeseries import assign_sessions

        df = spark.createDataFrame(
            [("a", 0), ("a", 10), ("a", 20), ("a", 31), ("b", 5)],
            "k string, t bigint",
        )
        out = {(r.k, r.t): r.session_id for r in
               assign_sessions(df, "t", 10, keys="k").collect()}
        # gap exactly 10 stays in session (<=); 11 starts a new one
        assert out == {
            ("a", 0): 1, ("a", 10): 1, ("a", 20): 1,
            ("a", 31): 2, ("b", 5): 1,
        }

    def test_matches_session_window_merge_rule(self, spark, sf_dir):
        # all three session tiers must agree on the session STRUCTURE:
        # the native lag+cumsum sessions and F.session_window produce
        # the same per-user session count and sizes on real data
        from spark_sorted_spark.functions.timeseries import assign_sessions
        from spark_sorted_spark.sources.tpch import event_ts_us, load_table

        ev = load_table(spark, "events", sf_dir)
        ev = ev.select(
            "user_id", event_ts_us(ev, "ts").alias("t"), "event_id", "ts"
        )
        native = (
            assign_sessions(
                ev, "t", 1_800_000_000, keys="user_id",
                order_cols=("event_id",),
            )
            .groupBy("user_id", "session_id")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        sw = (
            ev.groupBy(
                F.session_window(
                    F.col("ts").cast("timestamp"), "30 minutes"
                ),
                "user_id",
            )
            .agg(F.count(F.lit(1)).alias("n"))
        )
        a = sorted((r.user_id, r.n) for r in native.collect())
        b = sorted((r.user_id, r.n) for r in sw.collect())
        assert a == b

    def test_validation(self, spark):
        from spark_sorted_spark.functions.timeseries import assign_sessions

        df = spark.createDataFrame([("a", 1)], "k string, t bigint")
        with pytest.raises(ValueError, match="gap must be positive"):
            assign_sessions(df, "t", 0, keys="k")
        with pytest.raises(ValueError, match="at least one key"):
            assign_sessions(df, "t", 10, keys=[])


class TestHistogramSketch:
    def _vals(self, spark):
        rows = [(i % 7, (i * 37) % 5000) for i in range(4000)]
        return spark.createDataFrame(rows, "grp bigint, v bigint")

    def test_merge_equals_union_build(self, spark):
        from spark_sorted_spark.functions.sketches import (
            histogram_merge,
            histogram_sketch,
        )

        df = self._vals(spark)
        a = df.filter("v % 2 = 0")
        b = df.filter("v % 2 = 1")
        merged = histogram_merge(
            histogram_sketch(a, "v", keys=["grp"]),
            histogram_sketch(b, "v", keys=["grp"]),
            keys=["grp"],
        )
        union = histogram_sketch(a.unionByName(b), "v", keys=["grp"])
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, union.collect())
        )

    def test_partition_invariance(self, spark):
        from spark_sorted_spark.functions.sketches import histogram_sketch

        df = self._vals(spark)
        r1 = sorted(map(tuple, histogram_sketch(df.repartition(1), "v").collect()))
        r8 = sorted(map(tuple, histogram_sketch(df.repartition(8), "v").collect()))
        assert r1 == r8

    def test_quantile_accuracy_bound(self, spark):
        # answer is the bucket lower bound: exact <= answer * (1 + 2^-sub_bits)
        # and answer <= exact (sub_bits=4 -> 6.25% relative ceiling)
        from spark_sorted_spark.functions.sketches import (
            histogram_quantiles,
            histogram_sketch,
        )

        df = self._vals(spark)
        sk = histogram_sketch(df, "v", sub_bits=4)
        got = histogram_quantiles(
            sk, [(1, 2, "p50"), (99, 100, "p99")]
        ).collect()[0]
        vals = sorted(r.v for r in df.collect())

        def exact(num, den):
            # smallest v with rank-coverage cum*den >= n*num — the same
            # integer definition the sketch walk uses
            n = len(vals)
            for i, v in enumerate(vals, start=1):
                if i * den >= n * num:
                    return v

        for alias, (num, den) in (("p50", (1, 2)), ("p99", (99, 100))):
            ans, ex = getattr(got, alias), exact(num, den)
            assert ans <= ex <= ans * (1 + 2 ** -4) + 1, (alias, ans, ex)

    def test_small_values_exact(self, spark):
        # below 2^(sub_bits+1) the bucket IS the value: quantiles exact
        from spark_sorted_spark.functions.sketches import (
            histogram_quantiles,
            histogram_sketch,
        )

        df = spark.createDataFrame([(v,) for v in range(32)], "v bigint")
        sk = histogram_sketch(df, "v", sub_bits=4)
        assert sk.count() == 32  # every small value its own bucket
        got = histogram_quantiles(sk, [(1, 2, "p50")]).collect()[0]
        assert got.p50 == 15

    def test_guards(self, spark):
        from spark_sorted_spark.functions.sketches import (
            histogram_quantiles,
            histogram_sketch,
        )

        df = spark.createDataFrame([(1,), (-5,)], "v bigint")
        with pytest.raises(Exception, match="requires non-NULL v >= 0"):
            histogram_sketch(df, "v").collect()
        with pytest.raises(ValueError, match="sub_bits"):
            histogram_sketch(df, "v", sub_bits=0)
        with pytest.raises(ValueError, match="reserved"):
            histogram_sketch(
                df.withColumnRenamed("v", "bucket"), "bucket", keys=["bucket"]
            )
        with pytest.raises(ValueError, match="at least one"):
            histogram_quantiles(df, [])


class TestZorderLayout:
    def test_layout_bounds_ranges_on_both_columns(self, spark):
        # 64x64 grid -> 16 partitions. A single-column range sort makes
        # x tight but leaves y spanning the full domain in EVERY
        # partition; the Morton layout gives every partition a small
        # hypercube: BOTH per-partition ranges shrink to ~domain/4.
        from spark_sorted_spark.functions.layout import zorder_layout

        rows = [(x, y) for x in range(64) for y in range(64)]
        df = spark.createDataFrame(rows, "x bigint, y bigint")

        def ranges(laid):
            import pyspark.sql.functions as F

            per = (
                laid.withColumn("p", F.spark_partition_id())
                .groupBy("p")
                .agg(
                    (F.max("x") - F.min("x")).alias("rx"),
                    (F.max("y") - F.min("y")).alias("ry"),
                )
                .collect()
            )
            n = len(per)
            return sum(r.rx for r in per) / n, sum(r.ry for r in per) / n

        laid = zorder_layout(df, ["x", "y"], bits=6, n_partitions=16)
        zx, zy = ranges(laid)
        naive = df.repartitionByRange(16, "x").sortWithinPartitions("x")
        nx, ny = ranges(naive)
        # naive: x tight (~4), y full domain (63)
        assert ny > 55, (nx, ny)
        # z-order: BOTH bounded near the hypercube edge (16 for a
        # 16-way split of a 64x64 grid; allow slack for partition-
        # boundary cells that straddle two curve squares)
        assert zy <= 32, (zx, zy)
        assert zx <= 32, (zx, zy)
        # and the relation is preserved exactly
        assert laid.count() == 4096
        assert sorted(map(tuple, laid.collect())) == sorted(rows)

    def test_zvalue_guards(self, spark):
        from spark_sorted_spark.functions.layout import zorder_layout, zvalue

        with pytest.raises(ValueError, match="does not fit"):
            zvalue([F.lit(1)] * 8, bits=8)
        with pytest.raises(ValueError, match="at least one"):
            zvalue([], bits=4)
        df = spark.createDataFrame([(1, 2)], "x bigint, y bigint")
        with pytest.raises(ValueError, match="at least one"):
            zorder_layout(df, [])
        # all-null / empty column must be a clean error, not a
        # TypeError on a None min
        nulls = spark.createDataFrame(
            [(1, None), (2, None)], "x bigint, y bigint"
        )
        with pytest.raises(ValueError, match="no non-null values"):
            zorder_layout(nulls, ["x", "y"])

    def test_constant_column_and_single_column(self, spark):
        from spark_sorted_spark.functions.layout import zorder_layout

        df = spark.createDataFrame(
            [(i, 7) for i in range(100)], "x bigint, c bigint"
        )
        laid = zorder_layout(df, ["x", "c"], bits=5, n_partitions=4)
        assert laid.count() == 100
        one = zorder_layout(df, ["x"], bits=5, n_partitions=4)
        assert sorted(r.x for r in one.collect()) == list(range(100))

    def test_zvalue_interleave_roundtrip_property(self, spark):
        # deinterleaving the Morton value must recover the exact
        # quantized inputs (bit-level round trip vs a python oracle)
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from spark_sorted_spark.functions.layout import zvalue

        @given(
            pairs=st.lists(
                st.tuples(st.integers(0, 2**12 - 1), st.integers(0, 2**12 - 1)),
                min_size=1,
                max_size=30,
            )
        )
        @settings(max_examples=6, deadline=None)
        def run(pairs):
            df = spark.createDataFrame(pairs, "x bigint, y bigint")
            out = df.select(
                "x", "y", zvalue([F.col("x"), F.col("y")], 12).alias("z")
            ).collect()
            for r in out:
                zx = zy = 0
                for b in range(12):
                    zx |= ((r.z >> (2 * b)) & 1) << b
                    zy |= ((r.z >> (2 * b + 1)) & 1) << b
                assert (zx, zy) == (r.x, r.y), (r.x, r.y, r.z)

        run()


class TestMergeClusters:
    def test_bridge_merges_two_prior_components(self, spark):
        from spark_sorted_spark.functions.clusters import merge_clusters

        prior = connected_components(_edges(spark, [(1, 2), (5, 6)]))
        assert {(r.doc_id, r.cluster_id) for r in prior.collect()} == {
            (1, 1), (2, 1), (5, 5), (6, 5),
        }
        # the new edge bridges both old components and adds a new node
        merged = merge_clusters(prior, _edges(spark, [(2, 5), (8, 9)]))
        assert {(r.doc_id, r.cluster_id) for r in merged.collect()} == {
            (1, 1), (2, 1), (5, 1), (6, 1), (8, 8), (9, 8),
        }

    def test_equals_one_shot_on_random_splits(self, spark):
        import random

        from spark_sorted_spark.functions.clusters import merge_clusters

        rng = random.Random(20260815)
        nodes = list(range(60))
        edges = [
            (rng.choice(nodes), rng.choice(nodes)) for _ in range(80)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        for seed in (1, 2, 3):
            r = random.Random(seed)
            first = [e for e in edges if r.random() < 0.5]
            second = [e for e in edges if e not in first]
            one_shot = {
                (x.doc_id, x.cluster_id)
                for x in connected_components(_edges(spark, edges)).collect()
            }
            prior = connected_components(_edges(spark, first))
            merged = {
                (x.doc_id, x.cluster_id)
                for x in merge_clusters(prior, _edges(spark, second)).collect()
            }
            assert merged == one_shot, f"seed {seed}"


class TestUnigramLogprob:
    def test_matches_python_replica_cross_corpus(self, spark):
        """Score a batch against a SEPARATE corpus LM — unseen tokens
        take the smoothed c=0 path — and compare against a pure-Python
        replica (same libm, same fold order, so exact equality)."""
        import math

        from spark_sorted_spark.functions.text import unigram_logprob

        corpus_rows = [
            (1, "the cat sat on the mat"),
            (2, "the dog sat"),
        ]
        batch_rows = [
            (10, "the cat"),
            (11, "zebra quark the"),  # two unseen tokens
        ]
        corpus = spark.createDataFrame(corpus_rows, ["doc_id", "text"])
        batch = spark.createDataFrame(batch_rows, ["doc_id", "text"])

        from collections import Counter

        cnt = Counter(t for _i, s in corpus_rows for t in s.split())
        n, v = sum(cnt.values()), len(cnt)
        denom = float(n + v)

        def ref(text):
            acc = 0.0
            toks = text.split()
            for t in toks:
                acc = acc + math.log((cnt.get(t, 0) + 1) / denom)
            return len(toks), acc / len(toks)

        got = {
            r.doc_id: (r.n_tokens, r.logprob_per_token)
            for r in unigram_logprob(batch, corpus=corpus).collect()
        }
        assert got == {i: ref(s) for i, s in batch_rows}
        # unseen-token doc scores strictly lower than the all-seen doc
        assert got[11][1] < got[10][1]

    def test_self_scoring_flags_rare_docs_low(self, spark):
        from spark_sorted_spark.functions.text import unigram_logprob

        df = spark.createDataFrame(
            [
                (1, "common common common common"),
                (2, "common common common rare"),
            ],
            ["doc_id", "text"],
        )
        got = {
            r.doc_id: r.logprob_per_token
            for r in unigram_logprob(df).collect()
        }
        assert got[2] < got[1]

    def test_alpha_validation(self, spark):
        import pytest as _pytest

        from spark_sorted_spark.functions.text import unigram_logprob

        df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
        with _pytest.raises(ValueError, match="alpha"):
            unigram_logprob(df, alpha=0)


class TestDsirSelect:
    """DSIR importance resampling (functions/sampling.py dsir_select,
    Xie et al. 2023)."""

    @staticmethod
    def _dsir_ref(raw, target, k, n_buckets):
        """Pure-Python replica: hashed unigram+bigram buckets, add-1
        bucket LMs, position-ordered ln-ratio fold, derandomized
        Gumbel-max top-k."""
        import hashlib
        import math

        def feats(text):
            toks = text.strip().split()
            return toks + [
                f"{a} {b}" for a, b in zip(toks, toks[1:])
            ]

        def bkt(f):
            return int(hashlib.md5(f.encode()).hexdigest()[:8], 16) % n_buckets

        cr, ct = {}, {}
        for _i, t in raw:
            for f in feats(t):
                cr[bkt(f)] = cr.get(bkt(f), 0) + 1
        for _i, t in target:
            for f in feats(t):
                ct[bkt(f)] = ct.get(bkt(f), 0) + 1
        nr, nt = sum(cr.values()), sum(ct.values())
        keyed = []
        for i, t in raw:
            lw = 0.0
            for f in feats(t):
                b = bkt(f)
                lw += math.log((ct.get(b, 0) + 1) / float(nt + n_buckets))
                lw -= math.log((cr[b] + 1) / float(nr + n_buckets))
            h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
            u = (h + 0.5) / 4294967296.0
            keyed.append((i, lw, lw - math.log(-math.log(u))))
        keyed.sort(key=lambda r: (-r[2], r[0]))
        return keyed[:k]

    def test_matches_python_replica(self, spark):
        import random

        from spark_sorted_spark.functions.sampling import dsir_select

        rng = random.Random(20260815)
        voc_a = ["alpha", "beta", "gamma", "delta"]
        voc_b = ["red", "green", "blue", "cyan"]
        raw = [
            (i, " ".join(rng.choices(voc_a if i % 3 == 0 else voc_b, k=12)))
            for i in range(90)
        ]
        target = [(1000 + i, " ".join(rng.choices(voc_a, k=12))) for i in range(30)]
        raw_df = spark.createDataFrame(raw, "doc_id long, text string")
        tgt_df = spark.createDataFrame(target, "doc_id long, text string")
        got = [
            (r.doc_id, r.logw, r.sel_key)
            for r in dsir_select(raw_df, tgt_df, k=15, n_buckets=64).collect()
        ]
        want = self._dsir_ref(raw, target, 15, 64)
        assert [g[0] for g in got] == [w[0] for w in want]
        for g, w in zip(got, want):
            assert g[1] == pytest.approx(w[1], rel=1e-12)
            assert g[2] == pytest.approx(w[2], rel=1e-12)

    def test_selects_target_like_documents(self, spark):
        """The point of the op: with a target drawn from vocabulary A,
        the selected raw docs are overwhelmingly the A-like ones."""
        import random

        from spark_sorted_spark.functions.sampling import dsir_select

        rng = random.Random(7)
        voc_a = ["alpha", "beta", "gamma", "delta"]
        voc_b = ["red", "green", "blue", "cyan"]
        raw = [
            (i, " ".join(rng.choices(voc_a if i < 40 else voc_b, k=15)))
            for i in range(200)
        ]
        target = [(9000 + i, " ".join(rng.choices(voc_a, k=15))) for i in range(50)]
        raw_df = spark.createDataFrame(raw, "doc_id long, text string")
        tgt_df = spark.createDataFrame(target, "doc_id long, text string")
        sel = {r.doc_id for r in dsir_select(raw_df, tgt_df, k=30).collect()}
        a_like = sum(1 for i in sel if i < 40)
        assert a_like >= 27  # gumbel noise may admit a stray B doc

    def test_plan_shape(self, spark):
        """Scale pins: the log-ratio table joins by BROADCAST, and the
        final take is TakeOrderedAndProject — no global sort, no
        shuffle of the lambda join's big side."""
        from spark_sorted_spark.functions.sampling import dsir_select

        raw_df = spark.createDataFrame(
            [(i, "a b c") for i in range(10)], "doc_id long, text string"
        )
        out = dsir_select(raw_df, raw_df, k=3, n_buckets=16)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
        assert "BroadcastHashJoin" in plan

    def test_validation(self, spark):
        from spark_sorted_spark.functions.sampling import dsir_select

        df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        with pytest.raises(ValueError, match="k must"):
            dsir_select(df, df, k=0)
        with pytest.raises(ValueError, match="n_buckets"):
            dsir_select(df, df, k=1, n_buckets=1)


class TestTemperatureMix:
    """Temperature-scaled corpus mix (functions/sampling.py
    temperature_mix / temperature_quotas — the Pile/LLaMA data-mix
    recipe)."""

    def test_quotas_shift_toward_uniform_with_temperature(self):
        from spark_sorted_spark.functions.sampling import temperature_quotas

        counts = {"big": 9000, "mid": 900, "small": 100}
        nat = temperature_quotas(counts, 1000, 1.0)
        t2 = temperature_quotas(counts, 1000, 2.0)
        hot = temperature_quotas(counts, 1000, 100.0)
        # T=1 reproduces the natural mix (floor rounding)
        assert nat == {"big": 900, "mid": 90, "small": 10}
        # higher temperature flattens: small gains share monotonically
        assert nat["small"] < t2["small"] < hot["small"]
        assert nat["big"] > t2["big"] > hot["big"]
        # near-uniform at high T
        assert max(hot.values()) - min(hot.values()) <= 60

    def test_mix_is_deterministic_and_quota_exact(self, spark):
        import random

        from spark_sorted_spark.functions.sampling import (
            temperature_mix,
            temperature_quotas,
        )

        rng = random.Random(3)
        rows = [(i, "a" if i < 700 else ("b" if i < 900 else "c"))
                for i in range(1000)]
        rng.shuffle(rows)
        df = spark.createDataFrame(rows, "doc_id long, source string")
        out1 = temperature_mix(df, 300, 2.0).collect()
        out2 = temperature_mix(
            df.repartition(7), 300, 2.0
        ).collect()  # partitioning must not matter
        assert sorted((r.doc_id, r.source, r.rank) for r in out1) == sorted(
            (r.doc_id, r.source, r.rank) for r in out2
        )
        got = {}
        for r in out1:
            got[r.source] = got.get(r.source, 0) + 1
        want = temperature_quotas({"a": 700, "b": 200, "c": 100}, 300, 2.0)
        assert got == {s: q for s, q in want.items() if q > 0}

    def test_validation_and_empty(self, spark):
        from spark_sorted_spark.functions.sampling import (
            temperature_mix,
            temperature_quotas,
        )

        with pytest.raises(ValueError, match="temperature"):
            temperature_quotas({"a": 1}, 10, 0.0)
        with pytest.raises(ValueError, match="total"):
            temperature_quotas({"a": 1}, -1, 2.0)
        df = spark.createDataFrame([], "doc_id long, source string")
        assert temperature_mix(df, 10).count() == 0


class TestSemanticMix:
    """Cluster-balanced corpus mix (functions/sampling.py
    semantic_mix — temperature_mix at embedding-cluster
    granularity)."""

    @staticmethod
    def _toy(spark):
        # two well-separated directions: ~90 ids point along +x (the
        # over-represented "topic"), ~10 along +y. The +y group is
        # placed on the id with the SECOND-smallest (md5(id), id) so
        # the two seeded centroids deterministically land one per
        # topic (the same seeded pick rule the operator uses).
        import hashlib

        order = sorted(
            range(100), key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
        )
        y_ids = {order[1]} | set(order[-9:])
        rows = [
            (i, [0.0, 1.0] if i in y_ids else [1.0, 0.02 * (i % 7)])
            for i in range(100)
        ]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        docs = spark.createDataFrame(
            [(i,) for i in range(100)], "doc_id long"
        )
        return docs, emb

    def test_flattens_heavy_cluster_and_is_deterministic(self, spark):
        from spark_sorted_spark.functions.sampling import semantic_mix

        docs, emb = self._toy(spark)
        out1 = semantic_mix(docs, emb, total=40, n_clusters=2).collect()
        out2 = semantic_mix(
            docs.repartition(7), emb.repartition(5), total=40, n_clusters=2
        ).collect()
        assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
        by_cluster: dict[int, int] = {}
        for r in out1:
            by_cluster[r.cluster] = by_cluster.get(r.cluster, 0) + 1
        sizes = sorted(by_cluster.values())
        # T=2 flattening: the 90/10 natural mix must NOT survive —
        # sqrt weights give the small topic ~25% of the take, far
        # above its 10% natural share
        assert len(sizes) == 2
        assert sizes[0] / sum(sizes) > 0.15
        # ranks are 1..quota dense within each cluster
        for c in by_cluster:
            ranks = sorted(r.rank for r in out1 if r.cluster == c)
            assert ranks == list(range(1, len(ranks) + 1))

    def test_quotas_describe_the_mixed_frame(self, spark):
        """Quotas must come from the frame BEING MIXED (df joined to
        assignments), not the embedding universe — mixing the
        survivors of an upstream filter re-balances on the surviving
        counts (the review-caught universe-count bug gave the
        minority topic a 7-doc quota from the 90/10 universe and left
        the majority's quota unfillable)."""
        import hashlib

        from spark_sorted_spark.functions.sampling import semantic_mix

        docs, emb = self._toy(spark)
        order = sorted(
            range(100),
            key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i),
        )
        y_ids = {order[1]} | set(order[-9:])
        keep = y_ids | set(sorted(set(range(100)) - y_ids)[:3])
        survivors = docs.filter(
            F.col("doc_id").isin([int(i) for i in keep])
        )
        out = semantic_mix(survivors, emb, total=30, n_clusters=2).collect()
        by_c: dict[int, int] = {}
        for r in out:
            by_c[r.cluster] = by_c.get(r.cluster, 0) + 1
        # survivor counts {3, 10} at T=2 -> quotas {10, 19}: the
        # 3-doc cluster fills all 3, the 10-doc cluster all 10
        # (universe counts {90, 10} would have capped the minority
        # at 7)
        assert sorted(by_c.values()) == [3, 10]

    def test_docs_without_embeddings_drop_and_validation(self, spark):
        from spark_sorted_spark.functions.sampling import semantic_mix

        docs, emb = self._toy(spark)
        extra = docs.union(
            spark.createDataFrame([(999,)], "doc_id long")
        )
        out = semantic_mix(extra, emb, total=1000, n_clusters=2).collect()
        assert {r.doc_id for r in out} <= set(range(100))
        # duplicate (id, vector) embedding rows collapse
        # deterministically (the distinct) — counts/quotas unchanged
        dup = semantic_mix(docs, emb.union(emb), total=40, n_clusters=2)
        base = semantic_mix(docs, emb, total=40, n_clusters=2)
        assert sorted(map(tuple, dup.collect())) == sorted(
            map(tuple, base.collect())
        )
        with pytest.raises(ValueError, match="n_clusters"):
            semantic_mix(docs, emb, total=10, n_clusters=0)
        with pytest.raises(ValueError, match="temperature"):
            semantic_mix(docs, emb, total=10, temperature=0.0)
        with pytest.raises(ValueError, match="total"):
            semantic_mix(docs, emb, total=-1)
        # empty embeddings: empty OUTPUT with the input's id type
        empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
        out_e = semantic_mix(docs, empty, total=10)
        assert out_e.count() == 0
        assert out_e.schema["doc_id"].dataType == docs.schema["doc_id"].dataType
        sdocs = spark.createDataFrame([("a",), ("b",)], "doc_id string")
        out_s = semantic_mix(sdocs, empty, total=10)
        assert out_s.schema["doc_id"].dataType.simpleString() == "string"

    def test_oracle_matches_operator_on_duplicate_input(
        self, spark, sf_dir, tmp_path
    ):
        """VERDICT r13 #2: the gate oracle must replay the operator's
        dedupe-first construction on NON-unique (vec_id, embedding)
        input — a duplicated row must neither occupy two of the
        oracle's 8 seed slots nor double-count a cluster. Runs the
        union-with-itself fixture through the same compare the
        check_correctness harness applies (both engines read the SAME
        duplicated parquet)."""
        import duckdb

        import __spark_entry__ as e
        from spark_sorted_spark.functions.sampling import semantic_mix
        from spark_sorted_spark.sources.tpch import load_table

        dup_dir = str(tmp_path / "emb_dup")
        load_table(spark, "embeddings", sf_dir).unionByName(
            load_table(spark, "embeddings", sf_dir)
        ).write.parquet(dup_dir)

        got = semantic_mix(
            load_table(spark, "documents", sf_dir),
            spark.read.parquet(dup_dir),
            total=200,
            temperature=2.0,
            n_clusters=8,
        ).collect()

        con = duckdb.connect()
        con.sql(
            "CREATE VIEW documents AS "
            f"SELECT * FROM '{sf_dir}/documents.parquet'"
        )
        con.sql(
            f"CREATE VIEW embeddings AS SELECT * FROM '{dup_dir}/*.parquet'"
        )
        want = con.sql(e.oracle_sql()["semantic_mix"]).fetchall()
        assert sorted((r.doc_id, r.cluster, r.rank) for r in got) == sorted(
            (int(a), int(b), int(c)) for a, b, c in want
        )
        # and the duplicated input selects the same rows as the clean
        # one — the dedupe-first contract, end to end
        clean = semantic_mix(
            load_table(spark, "documents", sf_dir),
            load_table(spark, "embeddings", sf_dir),
            total=200,
            temperature=2.0,
            n_clusters=8,
        ).collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, clean))


def test_dsir_fuzz_vs_replica(spark):
    """Hypothesis fuzz for dsir_select: random raw/target corpora from
    a tiny vocabulary — full selected ordering equals the pure-Python
    replica's (ids exactly; weights to rel 1e-12)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from spark_sorted_spark.functions.sampling import dsir_select
    from tests.test_pipeline_ops import TestDsirSelect

    vocab = ["aa", "bb", "cc", "dd"]
    doc = st.lists(st.sampled_from(vocab), min_size=1, max_size=6)

    @given(
        raw=st.lists(doc, min_size=2, max_size=10),
        tgt=st.lists(doc, min_size=1, max_size=5),
    )
    @settings(max_examples=8, deadline=None)
    def check(raw, tgt):
        raw_rows = [(i, " ".join(ws)) for i, ws in enumerate(raw)]
        tgt_rows = [(100 + i, " ".join(ws)) for i, ws in enumerate(tgt)]
        rdf = spark.createDataFrame(raw_rows, "doc_id long, text string")
        tdf = spark.createDataFrame(tgt_rows, "doc_id long, text string")
        k = max(1, len(raw) // 2)
        got = [
            (r.doc_id, r.logw, r.sel_key)
            for r in dsir_select(rdf, tdf, k=k, n_buckets=32).collect()
        ]
        want = TestDsirSelect._dsir_ref(raw_rows, tgt_rows, k, 32)
        assert [g[0] for g in got] == [w[0] for w in want]
        for g, w in zip(got, want):
            assert g[1] == pytest.approx(w[1], rel=1e-12)

    check()


def test_quantize_embeddings_roundtrip_bound(spark):
    """SQ8 quantization: codes land in [-127, 127] with no clamp (the
    scale rule guarantees it), round-trip error per dimension is
    <= scale/2 (the floor(x+0.5) rule), zero vectors quantize to
    all-zero codes with scale 0, and dequantize inverts exactly as
    code * scale."""
    import math

    from pyspark.sql import functions as F

    from spark_sorted_spark.functions.similarity import (
        dequantize_embeddings,
        quantize_embeddings,
    )
    from spark_sorted_spark.sources.tpch import load_table

    emb = load_table(spark, "embeddings", "/root/testdata/sf0.001")
    zero = spark.createDataFrame(
        [(999_999, [0.0] * 64)], "vec_id long, embedding array<float>"
    )
    both = emb.select("vec_id", "embedding").unionByName(zero)
    q = quantize_embeddings(both)
    rows = {r.vec_id: (r.scale, list(r.codes)) for r in q.collect()}
    orig = {
        r.vec_id: [float(x) for x in r.embedding] for r in both.collect()
    }
    assert rows[999_999][0] == 0.0
    assert rows[999_999][1] == [0] * 64
    for vid, (scale, codes) in rows.items():
        vec = orig[vid]
        assert len(codes) == len(vec)
        if scale == 0.0:
            continue
        assert max(abs(c) for c in codes) <= 127
        # the python replay of the documented rule, bit-for-bit
        want = [math.floor(x / scale + 0.5) for x in vec]
        assert codes == want
        # round-trip error bound: |x - c*scale| <= scale/2
        for x, c in zip(vec, codes):
            assert abs(x - c * scale) <= scale / 2 + 1e-15
    # dequantize is exactly code * scale
    d = {
        r.vec_id: list(r.embedding)
        for r in dequantize_embeddings(q).collect()
    }
    for vid, (scale, codes) in rows.items():
        assert d[vid] == [c * scale for c in codes]
    # dequantized cosine stays close to the exact cosine (SQ8's point)
    from spark_sorted_spark.functions.similarity import cosine_topk

    qvec = orig[3]
    exact = {
        r.vec_id: r.rank
        for r in cosine_topk(emb, qvec, k=5).collect()
    }
    approx = {
        r.vec_id: r.rank
        for r in cosine_topk(
            dequantize_embeddings(quantize_embeddings(emb)), qvec, k=5
        ).collect()
    }
    # top-1 must survive 8-bit quantization on this corpus
    top1 = [v for v, rk in exact.items() if rk == 1][0]
    assert approx.get(top1) is not None and approx[top1] <= 2


def test_select_representatives_hand_built(spark):
    """Quality-argmax survivor per cluster with (quality DESC, id ASC)
    tie-break; unclustered docs survive as singletons (own id,
    n_members 1)."""
    from spark_sorted_spark.functions.clusters import select_representatives

    docs = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 4, 5, 9)], "doc_id long"
    )
    clusters = spark.createDataFrame(
        # cluster 1 = {1,2,3}; cluster 4 = {4,5}
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4)],
        "doc_id long, cluster_id long",
    )
    quality = spark.createDataFrame(
        # cluster 1: doc 2 wins on quality; cluster 4: tie -> lower id
        [(1, 10), (2, 30), (3, 20), (4, 7), (5, 7), (9, 1)],
        "doc_id long, quality long",
    )
    got = {
        r.doc_id: (r.cluster_id, r.n_members, r.quality)
        for r in select_representatives(docs, clusters, quality).collect()
    }
    assert got == {
        2: (1, 3, 30),   # highest quality in cluster 1
        4: (4, 2, 7),    # tie with doc 5 -> lower id wins
        9: (9, 1, 1),    # unclustered singleton survives as itself
    }
