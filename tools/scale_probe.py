"""10x scaling probe for the heavyweight dedup/similarity operators
(PARITY.md "Scaling observations"): measure b14 (simhash banded),
b16 (dedup clusters), b17 (knn join), b28 (lossless prefix Jaccard
self-join), b29 (lossless R-S decontamination join) at sf0.1 and at a
10x replica, so cluster-scale extrapolation claims rest on measured
slopes.

Replication preserves each workload's WITHIN-replica duplicate
structure while keeping replicas disjoint from each other:

* documents: per-replica bijective character translation (a rolled
  alphabet via ``F.translate``). A bijection preserves every shingle
  equality inside a replica — the near-dup pair set per replica is
  exactly the base pair set — while any shingle containing a
  translated character differs across replicas, so pair counts scale
  ~10x (NOT the ~45x explosion of replicating identical text, which
  would measure pair-explosion, not the operator).
* embeddings: per-replica dimension roll (``i * 7`` positions). A
  coordinate permutation preserves all within-replica cosines
  exactly; rolled copies of isotropic vectors are decorrelated
  across replicas.

knn_join is the one with a REAL quadratic term at fixed parameters:
candidates per bucket ~ |L||R| / n_buckets, so 10x both sides at the
same n_planes is ~100x candidate pairs. Since round 8 the DEFAULT
(n_planes=None) derives depth from the corpus count, so the probe
measures the no-argument default at both scales (the round-7 rule is
now automatic) plus the old fixed-4 at 10x as the regression
contrast.

Usage: python tools/scale_probe.py [--only NAME] [--replicas N] \
           [sf_dir] [workdir]

``--replicas N`` (default 10) sets the replica count — the round-14
30x rows (VERDICT r13 item 8) run the same harness at N=30 so the
100 TB story rests on a second measured point past 10x.
"""

from __future__ import annotations

import os
import shutil
import string
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

ALPHA = string.ascii_lowercase + string.ascii_uppercase


def _rolled(i: int) -> str:
    n = (i * 3) % len(ALPHA)
    return ALPHA[n:] + ALPHA[:n]


def replicate_docs(docs, n: int = 10):
    # `source` rides through unchanged (b29 splits corpus vs benchmark
    # on it) — each replica keeps the base corpus's source mix
    extra = [c for c in ("source",) if c in docs.columns]
    parts = []
    for i in range(n):
        d = docs.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            (
                F.translate(F.col("text"), ALPHA, _rolled(i))
                if i
                else F.col("text")
            ).alias("text"),
            *extra,
        )
        parts.append(d)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def replicate_embeddings(emb, n: int = 10, dim: int = 64):
    parts = []
    for i in range(n):
        roll = (i * 7) % dim
        vec = (
            F.concat(
                F.slice("embedding", roll + 1, dim - roll),
                F.slice("embedding", 1, roll),
            )
            if roll
            else F.col("embedding")
        )
        parts.append(
            emb.select(
                (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
                vec.alias("embedding"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def timed(fn, runs: int = 2) -> tuple[float, int]:
    fn()  # warmup
    best, n = None, 0
    for _ in range(runs):
        t0 = time.monotonic()
        n = fn()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    return best, n


def main():
    from spark_sorted_spark.functions.clusters import connected_components
    from spark_sorted_spark.functions.dedup import (
        minhash_lsh_pairs,
        simhash_pairs_banded,
    )
    from spark_sorted_spark.functions.similarity import knn_join_lsh
    from spark_sorted_spark.session import get_spark
    from spark_sorted_spark.sources.tpch import load_table

    args = list(sys.argv[1:])
    only = None
    if "--only" in args:
        i = args.index("--only")
        if i + 1 >= len(args):
            sys.exit(
                "usage: scale_probe.py [--only NAME] [--replicas N] "
                "[SF_DIR] [WORKDIR]"
            )
        only = args[i + 1]
        del args[i : i + 2]
    replicas = 10
    if "--replicas" in args:
        i = args.index("--replicas")
        if i + 1 >= len(args):
            sys.exit(
                "usage: scale_probe.py [--only NAME] [--replicas N] "
                "[SF_DIR] [WORKDIR]"
            )
        replicas = int(args[i + 1])
        if replicas < 2:
            sys.exit("--replicas must be >= 2")
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    work = args[1] if len(args) > 1 else "/tmp/scale_probe"
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, "documents", sf_dir)
    emb = load_table(spark, "embeddings", sf_dir)
    shutil.rmtree(work, ignore_errors=True)
    nx = f"{replicas}x"
    replicate_docs(docs, replicas).write.parquet(f"{work}/documents{nx}")
    replicate_embeddings(emb, replicas).write.parquet(f"{work}/embeddings{nx}")
    docs10 = spark.read.parquet(f"{work}/documents{nx}")
    emb10 = spark.read.parquet(f"{work}/embeddings{nx}")
    print(f"docs {docs.count()} -> {docs10.count()}; "
          f"emb {emb.count()} -> {emb10.count()}")

    def b14(d):
        return lambda: simhash_pairs_banded(d).count()

    def b16(d):
        return lambda: connected_components(minhash_lsh_pairs(d)).count()

    def b17(e, n_planes=None):
        left = e.filter(F.col("vec_id") % 2 == 1)
        right = e.filter(F.col("vec_id") % 2 == 0)
        return lambda: knn_join_lsh(left, right, k=3, n_planes=n_planes).count()

    def b27(e, tag, n_planes):
        # incremental embedding dedup: index the odd half once (outside
        # the timed body — index builds are amortized over many
        # batches), then time the per-batch bucket-join + exact verify.
        # n_planes=None auto-sizes the index depth at build; 8 is the
        # fixed constant default.
        from spark_sorted_spark.functions.similarity import (
            build_ann_lsh_index,
            cosine_neardup_against_index,
        )

        path = f"{work}/dedup_idx_{tag}"
        build_ann_lsh_index(
            e.filter(F.col("vec_id") % 2 == 1).select("vec_id", "embedding"),
            path,
            n_planes=n_planes,
        )
        batch = e.filter(F.col("vec_id") % 2 == 0).select("vec_id", "embedding")
        return lambda: cosine_neardup_against_index(batch, path, 0.4).count()

    def b55(e, tag):
        # IVF-index-backed incremental dedup (round-13 gated row):
        # index the odd half once (amortized; auto-sized cells), time
        # the per-batch two-cell probe join + exact verify. Cell
        # occupancy is corpus/nlist, so the auto-sized build keeps
        # per-batch cost ~flat like the other indexed probes.
        from spark_sorted_spark.functions.similarity import (
            build_ann_ivf_index,
            cosine_neardup_against_ivf_index,
        )

        path = f"{work}/dedup_ivf_{tag}"
        build_ann_ivf_index(
            e.filter(F.col("vec_id") % 2 == 1).select("vec_id", "embedding"),
            path,
            nlist=None,
        )
        batch = e.filter(F.col("vec_id") % 2 == 0).select("vec_id", "embedding")
        return lambda: cosine_neardup_against_ivf_index(
            batch, path, 0.4, nprobe=2
        ).count()

    def b28(d):
        from spark_sorted_spark.functions.dedup import jaccard_prefix_pairs

        return lambda: jaccard_prefix_pairs(
            d, n=3, tau_num=1, tau_den=2
        ).count()

    def b29(d, hot_salt=8):
        from spark_sorted_spark.functions.dedup import jaccard_prefix_join

        corpus = d.filter(F.col("source") != "src0")
        benchmark = d.filter(F.col("source") == "src0")
        return lambda: jaccard_prefix_join(
            corpus, benchmark, n=3, tau_num=1, tau_den=5, hot_salt=hot_salt
        ).count()

    def b33(d):
        # counts the documents the cut actually touched — the filter
        # reads join-output columns, so Catalyst cannot eliminate the
        # outer join the way a bare count() can
        from spark_sorted_spark.functions.dedup import remove_repeated_spans

        return lambda: (
            remove_repeated_spans(d)
            .filter(F.col("n_tokens_kept") < F.col("n_tokens"))
            .count()
        )

    def b34(e, nlist=None):
        from spark_sorted_spark.functions.similarity import semantic_dedup

        return lambda: (
            semantic_dedup(e, tau=0.4, nlist=nlist)
            .filter(F.col("is_kept") == 0)
            .count()
        )

    def b36(d):
        # full collect of the k-row result (count() on a LIMIT plan
        # could shortcut; the 20-row collect forces the scoring)
        from spark_sorted_spark.functions.retrieval import bm25_topk

        return lambda: len(
            bm25_topk(d, "spark join window filter", k=20).collect()
        )

    def b37(d):
        from spark_sorted_spark.functions.sampling import dsir_select

        tgt = d.filter(F.col("source") == "src0")
        return lambda: len(
            dsir_select(d, tgt, k=200, n_buckets=512).collect()
        )

    def b38(d):
        from spark_sorted_spark.functions.retrieval import bm25_join

        toks = F.split(F.trim(F.col("text")), r"\s+")
        q = d.filter(F.col("doc_id").isin([3, 7, 11, 19, 23])).select(
            F.col("doc_id").alias("query_id"),
            F.array_join(F.slice(toks, 1, 4), " ").alias("text"),
        )
        return lambda: bm25_join(d, q, k=5).count()

    def b40(d, tag, n_buckets=64):
        # indexed BM25 probe: build amortized (untimed), probe reads
        # only the query terms' postings buckets — the pruning IS the
        # scale story, so the probe cost should stay near-flat.
        # n_buckets=None auto-sizes the bucket count with the corpus
        # (round-12: the b40 flattening knob VERDICT r11 item 5 asked
        # for); 64 is the fixed constant default.
        from spark_sorted_spark.functions.retrieval import (
            bm25_topk_indexed,
            build_bm25_index,
        )

        path = f"{work}/bm25_idx_{tag}"
        build_bm25_index(d, path, n_buckets=n_buckets)
        return lambda: len(
            bm25_topk_indexed(spark, path, "batch data order", k=15).collect()
        )

    _hyb_cache: dict[str, tuple[str, str]] = {}

    def _hyb_paths(d, e, tag):
        # shared amortized indexes for the hybrid probes (built once
        # per scale, outside every timed body)
        from spark_sorted_spark.functions.retrieval import build_bm25_index
        from spark_sorted_spark.functions.similarity import build_ann_ivf_index

        if tag not in _hyb_cache:
            bp, ip = f"{work}/hyb_bm25_{tag}", f"{work}/hyb_ivf_{tag}"
            build_bm25_index(d, bp)
            build_ann_ivf_index(e.filter(F.col("vec_id") != 0), ip)
            _hyb_cache[tag] = (bp, ip)
        return _hyb_cache[tag]

    def b42(d, e, tag):
        # indexed hybrid probe: BOTH sides pruned (postings buckets +
        # IVF cells) — the scale claim is a near-flat probe cost
        from spark_sorted_spark.functions.retrieval import hybrid_topk_indexed

        bp, ip = _hyb_paths(d, e, tag)
        qvec = [
            float(x)
            for x in e.filter(F.col("vec_id") == 0).select("embedding").head()[0]
        ]
        return lambda: len(
            hybrid_topk_indexed(
                spark, bp, ip, "merge sort stream table", qvec,
                k=12, n_candidates=40,
            ).collect()
        )

    def b44(d, e, tag):
        # batch indexed hybrid: 5-query workload against the same
        # shared indexes
        from spark_sorted_spark.functions.retrieval import hybrid_join_indexed

        bp, ip = _hyb_paths(d, e, tag)
        toks = F.split(F.trim(F.col("text")), r"\s+")
        q = (
            d.filter(F.col("doc_id").isin([3, 7, 11, 19, 23]))
            .select(
                F.col("doc_id").alias("query_id"),
                F.array_join(F.slice(toks, 1, 4), " ").alias("text"),
            )
            .join(
                e.select(
                    F.col("vec_id").alias("query_id"),
                    F.col("embedding").cast("array<double>").alias("query_vec"),
                ),
                "query_id",
            )
        )
        return lambda: hybrid_join_indexed(
            spark, bp, ip, q, k=6, n_candidates=20
        ).count()

    def b45(e, tag):
        # batch IVF-PQ probe: union-of-cells directory pruning plus
        # code-column-only reads — near-flat probe cost is the claim
        from spark_sorted_spark.functions.similarity import (
            ann_ivfpq_join_indexed,
            build_ann_ivfpq_index,
        )

        path = f"{work}/ivfpq_{tag}"
        build_ann_ivfpq_index(e.filter(F.col("vec_id") != 0), path)
        q = e.filter(F.col("vec_id").isin([0, 3, 7, 11, 19])).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").cast("array<double>").alias("query_vec"),
        )
        return lambda: ann_ivfpq_join_indexed(
            spark, path, q, k=10, nprobe=4
        ).count()

    def b47(d):
        # batch RM3: per-query weights from each query's own feedback,
        # one weighted batch rescore — corpus passes fixed at 3 + the
        # id-pruned feedback count regardless of |Q|, so the slope
        # should track bm25_join's (the scan-twin constant)
        from spark_sorted_spark.functions.retrieval import bm25_join_rm3

        toks = F.split(F.trim(F.col("text")), r"\s+")
        q = d.filter(F.col("doc_id").isin([3, 7, 11, 19, 23])).select(
            F.col("doc_id").alias("query_id"),
            F.array_join(F.slice(toks, 1, 4), " ").alias("text"),
        )
        return lambda: bm25_join_rm3(
            d, q, k=5, fb_docs=3, fb_terms=5, lam=0.5
        ).count()

    def b49(d, tag):
        # batch RM3 against the PERSISTED index (build amortized,
        # untimed): every pass bucket-pruned, feedback counts from one
        # pruned postings read — the serving twin of b47, expected
        # near-flat like the other indexed probes
        from spark_sorted_spark.functions.retrieval import (
            bm25_join_rm3_indexed,
            build_bm25_index,
        )

        path = f"{work}/rm3_idx_{tag}"
        build_bm25_index(d, path, n_buckets=None)
        toks = F.split(F.trim(F.col("text")), r"\s+")
        q = d.filter(F.col("doc_id").isin([3, 7, 11, 19, 23])).select(
            F.col("doc_id").alias("query_id"),
            F.array_join(F.slice(toks, 1, 4), " ").alias("text"),
        )
        return lambda: bm25_join_rm3_indexed(
            spark, path, q, k=5, fb_docs=3, fb_terms=5, lam=0.5
        ).count()

    def b53(d, tag):
        # batch PRF against the PERSISTED index (round-13 gated row,
        # bench key b53_bm25_join_prf_indexed):
        # same pass structure as b49 with binary-weight expansion —
        # expected the same near-flat indexed-probe slope
        from spark_sorted_spark.functions.retrieval import (
            bm25_join_prf_indexed,
            build_bm25_index,
        )

        path = f"{work}/prf_idx_{tag}"
        build_bm25_index(d, path, n_buckets=None)
        toks = F.split(F.trim(F.col("text")), r"\s+")
        q = d.filter(F.col("doc_id").isin([3, 7, 11, 19, 23])).select(
            F.col("doc_id").alias("query_id"),
            F.array_join(F.slice(toks, 1, 4), " ").alias("text"),
        )
        return lambda: bm25_join_prf_indexed(
            spark, path, q, k=6, fb_docs=3, fb_terms=5
        ).count()

    def b57(d):
        # diversity-aware second stage (round-15 gated row): stage one
        # is the bm25_join scan (grows with the corpus like b38);
        # stage two is the candidate-bounded greedy MMR — |Q| x
        # n_candidates^2 token-set work, corpus-size-free, so the
        # slope should track the b38 scan class, not exceed it
        from spark_sorted_spark.functions.retrieval import (
            bm25_join,
            rerank_mmr,
        )

        toks = F.split(F.trim(F.col("text")), r"\s+")
        q = d.filter(F.col("doc_id").isin([3, 7, 11, 19, 23])).select(
            F.col("doc_id").alias("query_id"),
            F.array_join(F.slice(toks, 1, 4), " ").alias("text"),
        )
        return lambda: rerank_mmr(
            bm25_join(d, q, k=20), d, k=3, lam=0.5
        ).count()

    def b50(e, tag):
        # batch IVF-SQ8 probe: union-of-cells directory pruning with
        # (scale, codes)-only reads — the near-flat claim of the
        # indexed probes at 4x less IO than the raw-float IVF scan
        from spark_sorted_spark.functions.similarity import (
            ann_ivfsq8_join_indexed,
            build_ann_ivfsq8_index,
        )

        path = f"{work}/ivfsq8_{tag}"
        build_ann_ivfsq8_index(e.filter(F.col("vec_id") != 0), path)
        q = e.filter(F.col("vec_id").isin([0, 3, 7, 11, 19])).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").cast("array<double>").alias("query_vec"),
        )
        return lambda: ann_ivfsq8_join_indexed(
            spark, path, q, k=10, nprobe=4
        ).count()

    def b51(d):
        # KMV overlap: distinct-shingle aggregate + per-group bounded
        # window — the grouped-HLL cost class; slope should track the
        # shingle volume (linear), state fixed at k int64s per side
        from spark_sorted_spark.functions.dedup import shingles
        from spark_sorted_spark.functions.sketches import (
            kmv_overlap,
            kmv_sketch,
        )

        ex = d.select(
            "source", F.explode(shingles("text", 3)).alias("sh")
        )
        def run():
            a = kmv_sketch(
                ex.filter(F.col("source") == "src0"), "sh", k=128
            )
            b = kmv_sketch(
                ex.filter(F.col("source") != "src0"), "sh", k=128
            )
            return kmv_overlap(a, b, k=128).count()
        return run

    def b56(d, e):
        # cluster-balanced mix (round-13 gated row): seeded pick +
        # native argmax assignment + ONE window over the cluster
        # partitioning + broadcast quota join. The watch item at 10x
        # is the window: few clusters => few window partitions, so the
        # quota take's rank is the potential hot-partition stage
        # (VERDICT r13 item 5)
        from spark_sorted_spark.functions.sampling import semantic_mix

        return lambda: semantic_mix(
            d, e, total=200, temperature=2.0, n_clusters=8
        ).count()

    def b48(e):
        # SQ8 quantization: a 0-shuffle pure map — the slope IS the
        # data volume (10x rows = 10x work), flat per row
        from spark_sorted_spark.functions.similarity import (
            quantize_embeddings,
        )

        return lambda: quantize_embeddings(e).count()

    # entries are (name, maker) with maker LAZY — index builds inside
    # b27/b40/b42/b44/b45 only run for entries --only selects
    specs = [
        ("b14_simhash_banded", lambda: (b14(docs), b14(docs10))),
        ("b16_dedup_clusters", lambda: (b16(docs), b16(docs10))),
        ("b17_knn_join (auto depth)", lambda: (b17(emb), b17(emb10))),
        (
            f"b17_knn_join {nx} fixed n_planes=4",
            lambda: (None, b17(emb10, n_planes=4)),
        ),
        ("b28_jaccard_prefix", lambda: (b28(docs), b28(docs10))),
        ("b29_decontaminate_exact (salt 8)", lambda: (b29(docs), b29(docs10))),
        (
            f"b29_decontaminate_exact {nx} unsalted",
            lambda: (None, b29(docs10, hot_salt=1)),
        ),
        (
            "b27_embed_dedup (auto-depth index)",
            lambda: (b27(emb, "1x", None), b27(emb10, nx, None)),
        ),
        (
            f"b27_embed_dedup {nx} fixed-8 index",
            lambda: (None, b27(emb10, f"{replicas}f", 8)),
        ),
        ("b33_repeated_spans", lambda: (b33(docs), b33(docs10))),
        ("b34_semantic_dedup (auto nlist)", lambda: (b34(emb), b34(emb10))),
        (
            "b34_semantic_dedup 10x fixed nlist=16",
            lambda: (None, b34(emb10, nlist=16)),
        ),
        ("b36_bm25_topk", lambda: (b36(docs), b36(docs10))),
        ("b37_dsir_select", lambda: (b37(docs), b37(docs10))),
        ("b38_bm25_join", lambda: (b38(docs), b38(docs10))),
        ("b40_bm25_indexed", lambda: (b40(docs, "1x"), b40(docs10, nx))),
        (
            "b40_bm25_indexed (auto-buckets)",
            lambda: (b40(docs, "1a", None), b40(docs10, f"{replicas}a", None)),
        ),
        (
            "b42_hybrid_indexed",
            lambda: (b42(docs, emb, "1x"), b42(docs10, emb10, nx)),
        ),
        (
            "b44_hybrid_join_indexed",
            lambda: (b44(docs, emb, "1x"), b44(docs10, emb10, nx)),
        ),
        ("b45_ivfpq_join_indexed", lambda: (b45(emb, "1x"), b45(emb10, nx))),
        ("b47_bm25_join_rm3", lambda: (b47(docs), b47(docs10))),
        ("b48_embedding_quantize", lambda: (b48(emb), b48(emb10))),
        (
            "b50_ivfsq8_join_indexed",
            lambda: (b50(emb, "1x"), b50(emb10, nx)),
        ),
        ("b51_kmv_overlap", lambda: (b51(docs), b51(docs10))),
        (
            "b49_bm25_join_rm3_indexed",
            lambda: (b49(docs, "1x"), b49(docs10, nx)),
        ),
        (
            "b53_bm25_join_prf_indexed",
            lambda: (b53(docs, "1x"), b53(docs10, nx)),
        ),
        ("b57_rerank_mmr", lambda: (b57(docs), b57(docs10))),
        (
            "b55_embed_dedup_ivf (auto nlist)",
            lambda: (b55(emb, "1x"), b55(emb10, nx)),
        ),
        (
            "b56_semantic_mix",
            lambda: (b56(docs, emb), b56(docs10, emb10)),
        ),
    ]
    rows = []
    for name, make in specs:
        if only and only not in name:
            continue
        f1, f10 = make()
        t1, n1 = timed(f1) if f1 else (None, None)
        t10, n10 = timed(f10)
        ratio = f"{t10 / t1:.1f}x" if t1 else "—"
        base = f"{t1:.2f} s ({n1} rows)" if t1 else "—"
        rows.append((name, base, f"{t10:.2f} s ({n10} rows)", ratio))
    print(f"| workload | 1x (sf0.1) | {nx} | ratio |")
    print("|---|---|---|---|")
    for r in rows:
        print("| " + " | ".join(r) + " |")
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
