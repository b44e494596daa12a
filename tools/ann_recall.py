"""Measure ANN recall@k against the exact top-k — the quality side of
the approximate-similarity trade-off (speed is in bench.py; without
this number a "fast" ANN could silently be returning junk).

For the shipped defaults AND the knob settings around them:
* ``ann_lsh_topk`` (8 sign planes) at probe_bits 0/1/2,
* ``ann_ivf_topk`` (nlist=16) at nprobe 2/4/8,
* ``knn_join_lsh`` (catalog shape: odd queries x even index, k=3,
  n_planes=4, 8 tables) — plus its coverage (fraction of left ids
  that got any neighbor at all; LSH joins can miss a left entirely
  when no bucket collides).

Recall@k = |ANN top-k ∩ exact top-k| / k, averaged over queries.
Exact truth comes from ``cosine_topk`` (brute force, the declared
oracle baseline). Queries are the ``n_queries`` smallest vec_ids —
deterministic, no RNG.

Usage: python tools/ann_recall.py [sf_dir] [n_queries]
Prints a markdown table (paste into PARITY.md) + one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def clustered_df(
    spark,
    n_clusters: int = 16,
    per_cluster: int = 125,
    dim: int = 64,
    sigma: float = 0.05,
    seed: int = 7,
):
    """Deterministic clustered embedding table — the geometry real
    embedding corpora have (tight clusters around topic directions),
    vs the driver testdata's isotropic vectors where recall ~= scanned
    fraction is the theoretical ceiling for any sublinear ANN."""
    import numpy as np

    rng = np.random.RandomState(seed)
    centers = rng.randn(n_clusters, dim)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    X = np.repeat(centers, per_cluster, axis=0) + sigma * rng.randn(
        n_clusters * per_cluster, dim
    )
    rows = [(int(i), [float(x) for x in X[i]]) for i in range(len(X))]
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )


def measure(
    spark, sf_dir: str | None, n_queries: int = 20, k: int = 10, emb=None
) -> dict:
    from spark_sorted_spark.functions.similarity import (
        ann_ivf_topk,
        ann_lsh_topk,
        cosine_topk,
        knn_join_lsh,
    )

    if emb is None:
        from spark_sorted_spark.sources.tpch import load_table

        emb = load_table(spark, "embeddings", sf_dir)
    emb = emb.persist()
    queries = [
        (r.vec_id, list(r.embedding))
        for r in emb.orderBy("vec_id").limit(n_queries).collect()
    ]

    exact = {
        qid: {r.vec_id for r in cosine_topk(emb, qvec, k=k).collect()}
        for qid, qvec in queries
    }

    def mean_recall(fn) -> float:
        total = 0.0
        for qid, qvec in queries:
            got = {r.vec_id for r in fn(qvec).collect()}
            total += len(got & exact[qid]) / k
        return total / len(queries)

    out: dict = {"sf_dir": sf_dir, "n_queries": n_queries, "k": k}
    for pb in (0, 1, 2):
        out[f"lsh_probe_bits_{pb}"] = mean_recall(
            lambda q, pb=pb: ann_lsh_topk(emb, q, k=k, probe_bits=pb)
        )
    out["lsh_probe_bits_6_hamming2"] = mean_recall(
        lambda q: ann_lsh_topk(emb, q, k=k, probe_bits=6, probe_hamming=2)
    )
    for np_ in (2, 4, 8):
        out[f"ivf_nprobe_{np_}"] = mean_recall(
            lambda q, np_=np_: ann_ivf_topk(emb, q, k=k, nprobe=np_)
        )
    out["ivf_nprobe_4_lloyd3"] = mean_recall(
        lambda q: ann_ivf_topk(emb, q, k=k, nprobe=4, lloyd_iters=3)
    )

    # PQ: raw ADC and the ADC->exact-rerank tail (codebooks computed
    # once — the build-time cost, amortized over queries)
    from spark_sorted_spark.functions.similarity import (
        ann_pq_topk,
        pq_codebooks,
    )

    cbs = pq_codebooks(emb)
    cbs_trained = pq_codebooks(emb, lloyd_iters=3)

    def pq_rerank(q, cb, R=50):
        cand = [
            r.vec_id
            for r in ann_pq_topk(emb, q, k=R, codebooks=cb).collect()
        ]
        return cosine_topk(emb.filter(F.col("vec_id").isin(cand)), q, k=k)

    out["pq_adc_seeded"] = mean_recall(
        lambda q: ann_pq_topk(emb, q, k=k, codebooks=cbs)
    )
    out["pq_adc50_rerank_seeded"] = mean_recall(lambda q: pq_rerank(q, cbs))
    out["pq_adc_lloyd3"] = mean_recall(
        lambda q: ann_pq_topk(emb, q, k=k, codebooks=cbs_trained)
    )
    out["pq_adc50_rerank_lloyd3"] = mean_recall(
        lambda q: pq_rerank(q, cbs_trained)
    )
    # R must exceed the ADC tie-set: trained codewords sit on cluster
    # centers, so every same-cluster member shares one code and ADC
    # ranks CLUSTERS — rerank with R >= cluster size recovers the
    # exact within-cluster order (measured 1.000 here)
    out["pq_adc150_rerank_lloyd3"] = mean_recall(
        lambda q: pq_rerank(q, cbs_trained, R=150)
    )

    # IVF-SQ8: the persisted scalar-quantized index — nprobe=nlist
    # (full probe) isolates the QUANTIZATION-only recall loss (rank
    # inversions where reconstructed cosines cross near ties); the
    # serving nprobe adds the same cell-pruning loss as plain IVF
    # (identical cell assignment — it runs on the raw vectors);
    # rerank=50 closes the quantization part of the tail
    import shutil
    import tempfile

    from spark_sorted_spark.functions.similarity import (
        ANN_NLIST,
        ann_ivfsq8_topk_indexed,
        build_ann_ivfsq8_index,
    )

    sq8_root = tempfile.mkdtemp(prefix="ann_recall_sq8_")
    sq8 = f"{sq8_root}/idx"
    build_ann_ivfsq8_index(emb, sq8)
    out["ivfsq8_fullprobe_quantonly"] = mean_recall(
        lambda q: ann_ivfsq8_topk_indexed(
            spark, sq8, q, k=k, nprobe=ANN_NLIST
        )
    )
    out["ivfsq8_nprobe_4"] = mean_recall(
        lambda q: ann_ivfsq8_topk_indexed(spark, sq8, q, k=k, nprobe=4)
    )
    out["ivfsq8_nprobe_4_rerank50"] = mean_recall(
        lambda q: ann_ivfsq8_topk_indexed(
            spark, sq8, q, k=k, nprobe=4, rerank=50
        )
    )
    shutil.rmtree(sq8_root, ignore_errors=True)

    # knn_join, catalog shape (odd queries x even index, k=3)
    kj = 3
    left = emb.filter(F.col("vec_id") % 2 == 1)
    right = emb.filter(F.col("vec_id") % 2 == 0)
    got = knn_join_lsh(left, right, k=kj, n_planes=4).collect()
    got_by_left: dict[int, set] = {}
    for r in got:
        got_by_left.setdefault(r.left_id, set()).add(r.right_id)
    # exact truth: brute-force window (measurement only — the shipped
    # path never does this cross join)
    from spark_sorted_spark.functions.similarity import cosine
    from pyspark.sql import Window

    l_ = left.select(
        F.col("vec_id").alias("lid"), F.col("embedding").alias("lv")
    )
    r_ = right.select(
        F.col("vec_id").alias("rid"), F.col("embedding").alias("rv")
    )
    w = Window.partitionBy("lid").orderBy(
        F.col("cos").desc(), F.col("rid").asc()
    )
    truth_rows = (
        l_.crossJoin(r_)
        .select("lid", "rid", cosine(F.col("lv"), F.col("rv")).alias("cos"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= kj)
        .collect()
    )
    truth_by_left: dict[int, set] = {}
    for r in truth_rows:
        truth_by_left.setdefault(r.lid, set()).add(r.rid)
    n_left = len(truth_by_left)
    out["knn_join_recall"] = (
        sum(
            len(got_by_left.get(lid, set()) & hits) / kj
            for lid, hits in truth_by_left.items()
        )
        / n_left
    )
    out["knn_join_coverage"] = len(got_by_left) / n_left
    emb.unpersist()
    return out


def main():
    from spark_sorted_spark.session import get_spark

    args = [a for a in sys.argv[1:] if a != "--clustered"]
    clustered = "--clustered" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    n_queries = int(args[1]) if len(args) > 1 else 20
    spark = get_spark("ann-recall")
    if clustered:
        out = measure(spark, None, n_queries, emb=clustered_df(spark))
        out["sf_dir"] = "synthetic-clustered(16x125,d=64,sigma=0.05)"
    else:
        out = measure(spark, sf_dir, n_queries)
    print("| metric | recall@k |")
    print("|---|---|")
    for key, val in out.items():
        if isinstance(val, float):
            print(f"| {key} | {val:.3f} |")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
